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
