"""Exact two-phase heavy hitters (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.sketch import (
    heavy_hitter_candidates,
    heavy_hitter_terms,
)
from aeuc_vector_db_spark.operators.text import tokens_col


def _naive(docs, min_count):
    return {
        (r["term"], r["term_count"])
        for r in docs.select(F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .filter(F.col("term_count") >= min_count)
        .collect()
    }


def test_matches_naive_groupby_on_fixture(documents):
    for t in (5, 20, 60):
        got = {
            (r["term"], r["term_count"])
            for r in heavy_hitter_terms(documents, t).collect()
        }
        assert got == _naive(documents, t)


def test_candidates_are_superset_under_adversarial_partitioning(spark):
    """A term spread thin across partitions (never locally dominant) must
    still be found — the pigeonhole guarantee, exercised by repartitioning
    the corpus many ways."""
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common filler words here plus rare"),
            (F.col("id") % 399).cast("string"),
        ).alias("text"),
    )
    # 'common' etc. appear 400×; each 'rareN' ≤ 2×
    for n_parts in (1, 7, 32):
        re_docs = docs.repartition(n_parts)
        cands = {r["term"] for r in heavy_hitter_candidates(re_docs, 400).collect()}
        assert {"common", "filler", "words", "here", "plus"} <= cands
        got = {(r["term"], r["term_count"]) for r in heavy_hitter_terms(re_docs, 400).collect()}
        assert got == {(t, 400) for t in ("common", "filler", "words", "here", "plus")}


def test_false_candidates_die_in_recount(spark):
    """A term locally dominant in one partition but globally below the
    threshold must NOT survive phase 2."""
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 3, F.lit("skewed skewed skewed skewed"))
        .otherwise(F.concat(F.lit("unique"), F.col("id").cast("string")))
        .alias("text"),
    ).repartition(50)
    # 'skewed' count = 12 total; threshold 50 → phase 1 may propose it
    # (local count up to 12 ≥ ceil(50/50)=1) but phase 2 must reject
    assert heavy_hitter_terms(docs, 50).count() == 0


def test_pigeonhole_violation_raises_not_miss(spark):
    """If the job executes with more non-empty partitions than the
    pigeonhole threshold assumed, the operator must fail loudly — a
    silently incomplete candidate set would drop true heavy hitters.
    The bound is checked against spark_partition_id() observed in the
    SAME execution, so a plan-time/executed-plan mismatch (AQE replan,
    caller-inserted repartition) cannot slip through."""
    import pytest

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("spread thin everywhere").alias("text"),
    ).repartition(8)
    with pytest.raises(RuntimeError, match="non-empty"):
        heavy_hitter_candidates(docs, 100, _assumed_partitions=2)


def test_small_threshold_falls_back_to_plain_aggregate(spark):
    """min_count ≤ assumed partitions ⇒ local threshold 1 ⇒ phase 1
    would nominate every term; the operator must use the plain exact
    aggregate instead (no semi-join in the plan)."""
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("x y x").alias("text")
    )
    df = heavy_hitter_terms(docs, 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan
    assert {(r["term"], r["term_count"]) for r in df.collect()} == {
        ("x", 100), ("y", 50)
    }


def test_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a a a")], "doc_id long, text string"
    )
    got = {(r["term"], r["term_count"]) for r in heavy_hitter_terms(docs, 3).collect()}
    assert got == {("a", 3)}


def test_candidate_join_is_broadcast(documents):
    plan = heavy_hitter_terms(documents, 50)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
