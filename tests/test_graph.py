"""integer_pagerank: exact integer PageRank (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.graph import integer_pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


STAR = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]


def test_pagerank_hand_computed_two_iters(spark):
    """Undirected star a—b, a—c at scale=1000, damping 85/100:
    r0 = 1000 each; iter1: a = 150 + 2·floor(85000/100) = 1850,
    b = c = 150 + floor(85000/200) = 575; iter2:
    a = 150 + 2·floor(85·575/100) = 1126,
    b = c = 150 + floor(85·1850/200) = 936."""
    got = {
        r["node"]: r["rank"]
        for r in integer_pagerank(
            _edges(spark, STAR), iters=2, scale=1000
        ).collect()
    }
    assert got == {"a": 1126, "b": 936, "c": 936}


def test_pagerank_order_independent(spark):
    """Integer arithmetic makes the result identical under any
    partitioning/arrival order (the determinism contract)."""
    e = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100) if i != (i * 7) % 23]
    und = e + [(b, a) for a, b in e]
    a = sorted(
        map(tuple, integer_pagerank(_edges(spark, und), iters=3).collect())
    )
    b = sorted(
        map(
            tuple,
            integer_pagerank(
                _edges(spark, und[::-1]).repartition(13), iters=3
            ).collect(),
        )
    )
    assert a == b


def test_pagerank_validates_args(spark):
    with pytest.raises(ValueError):
        integer_pagerank(_edges(spark, STAR), iters=0)
    with pytest.raises(ValueError):
        integer_pagerank(_edges(spark, STAR), damp_num=100, damp_den=100)


def test_pagerank_no_incoming_gets_base_only(spark):
    """A pure source node (directed) holds base mass after one iter;
    duplicate edges collapse (distinct) so they don't double-count."""
    got = {
        r["node"]: r["rank"]
        for r in integer_pagerank(
            _edges(spark, [("x", "y"), ("x", "y")]), iters=1, scale=1000
        ).collect()
    }
    # x: no incoming -> 150; y: 150 + floor(85*1000/100) = 1000
    assert got == {"x": 150, "y": 1000}


def test_pagerank_weighted_hand_computed(spark):
    """Weighted star: x→y weight 3, x→z weight 1 (W(x)=4), y→x, z→x
    weight 1. scale=1000, one iteration:
    y gets floor(85·1000·3/(100·4)) = 637, z floor(85000/400) = 212,
    x gets 850 + 850 = 1700; all plus base 150."""
    from aeuc_vector_db_spark.operators.graph import integer_pagerank

    e = spark.createDataFrame(
        [("x", "y", 3), ("x", "z", 1), ("y", "x", 1), ("z", "x", 1)],
        "src string, dst string, weight int",
    )
    got = {
        r["node"]: r["rank"]
        for r in integer_pagerank(e, iters=1, scale=1000).collect()
    }
    assert got == {"x": 1850, "y": 787, "z": 362}


def test_pagerank_weighted_duplicate_edges_sum(spark):
    """Duplicate (src, dst) rows sum their weights (3 = 2+1), unlike the
    unweighted form where duplicates collapse."""
    from aeuc_vector_db_spark.operators.graph import integer_pagerank

    e = spark.createDataFrame(
        [("x", "y", 2), ("x", "y", 1), ("x", "z", 1), ("y", "x", 1), ("z", "x", 1)],
        "src string, dst string, weight int",
    )
    got = {
        r["node"]: r["rank"]
        for r in integer_pagerank(e, iters=1, scale=1000).collect()
    }
    assert got == {"x": 1850, "y": 787, "z": 362}


def test_trade_components_matches_union_find_and_round_bound(spark):
    """rel_trade_components (round 11): the declared star-contraction
    query's size histogram must equal a driver-side union-find over the
    SAME edge set (independent algorithm, exhaustive at sf0.001), and
    the contraction must converge within its documented
    2*ceil(log2 n) + 8 bound (floor 16)."""
    import math

    import aeuc_vector_db_spark.queries as Q
    from aeuc_vector_db_spark.operators.dedup import connected_components
    from aeuc_vector_db_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, "lineitem", sf)
        .filter(F.col("l_quantity") >= 49)
        .select("l_orderkey", "l_suppkey")
    )
    orders = (
        load_table(spark, "orders", sf)
        .filter(F.year("o_orderdate") == 1995)
        .select("o_orderkey", "o_custkey")
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a_id"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b_id"),
        )
        .distinct()
    )
    edge_rows = [(r["a_id"], r["b_id"]) for r in pairs.collect()]
    assert edge_rows, "sparsifier must leave a non-empty sf0.001 graph"

    # independent reference: union-find with path compression
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    from collections import Counter

    comp_sizes = Counter(Counter(find(n) for n in parent).values())
    expected = sorted((int(s), int(c)) for s, c in comp_sizes.items())

    got = sorted(
        (r["component_size"], r["n_components"])
        for r in Q.queries()["rel_trade_components"](spark, sf).collect()
    )
    assert got == expected

    # convergence-round bound on the same graph
    rounds: list[int] = []
    n_nodes = len({n for e in edge_rows for n in e})
    comp = connected_components(pairs, _rounds_out=rounds)
    bound = max(16, 2 * math.ceil(math.log2(max(n_nodes, 2))) + 8)
    assert rounds and rounds[0] <= bound, (rounds, bound)

    # plan gate (VERDICT r10 #3): the loop invariants are eagerly
    # localCheckpoint-ed, so the final component assignment reads from
    # materialized RDDs (no lineage re-derivation of the whole join
    # tree per reference) and never degenerates to a cartesian product
    plan = comp._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 2, plan
    assert "CartesianProduct" not in plan
