"""Physical-plan regression gate: the load-bearing plan shapes from
PLANS.md must not silently degrade (e.g. a broadcast turning into a
sort-merge join, a pushed filter disappearing, top-k becoming a global
sort)."""

from __future__ import annotations

import pytest

import aeuc_vector_db_spark.queries as Q

SF01 = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = Q.queries()[name](spark, SF01)
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString() + qe.toString()


@pytest.mark.parametrize(
    "name,required",
    [
        ("knn_cosine_topk", ["BroadcastExchange", "Window"]),
        ("rel_top_revenue_orders",
         ["BroadcastHashJoin", "TakeOrderedAndProject", "HashAggregate"]),
        ("rel_pricing_summary", ["HashAggregate"]),
        ("point_lookup", ["PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,42)]"]),
        ("rel_parts_never_ordered", ["LeftAnti"]),
        ("rel_late_order_priority", ["LeftSemi"]),
        ("knn_cosine_filtered", ["BroadcastHashJoin"]),
    ],
)
def test_plan_shape(spark, name, required):
    plan = _plan(spark, name)
    missing = [r for r in required if r not in plan]
    assert not missing, f"{name}: missing plan shapes {missing}"


def test_knn_corpus_never_shuffles_before_scoring(spark):
    """The corpus side of batch k-NN must reach the scorer without an
    Exchange caused by a join (broadcast nested loop / broadcast join
    only); the only shuffle allowed is the top-k window by query_id and
    the explicit under-parallelism repartition."""
    plan = _plan(spark, "knn_cosine_topk")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan  # broadcast NLJ, not cartesian


def test_pruned_projection_reaches_scan(spark):
    """Column pruning: dataset_digest touches only vec_id — the 64-float
    embedding column must not be read from parquet."""
    df = Q.queries()["dataset_digest"](spark, SF01)
    qe = df._jdf.queryExecution().toString()
    scan_lines = [l for l in qe.splitlines() if "ReadSchema" in l]
    assert scan_lines
    read_schema = scan_lines[0].split("ReadSchema")[1]
    assert "embedding" not in read_schema and "vec_id" in read_schema
