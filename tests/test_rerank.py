"""MMR diversity re-rank: hand-computed selection, the λ extremes,
tie-breaks, and partitioning invariance. Cross-engine bit-parity of
scores is pinned by the emb_mmr_rerank recursive-CTE oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.rerank import _seq_cosine, mmr_rerank


def _cand(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, rel double, embedding array<double>"
    )


def test_hand_computed_selection(spark):
    """q=1: A(rel .9) picked first; B is nearly identical to A, C is
    orthogonal with lower rel — MMR at λ=0.5 must pick C second."""
    a, b, c = [1.0, 0.0], [0.999, 0.01], [0.0, 1.0]
    df = _cand(
        spark,
        [(1, 10, 0.9, a), (1, 11, 0.85, b), (1, 12, 0.5, c)],
    )
    got = {r["rank"]: (r["vec_id"], r["score"]) for r in
           mmr_rerank(df, lam=0.5, top_k=3).collect()}
    assert got[1][0] == 10 and got[1][1] == 0.9
    assert got[2][0] == 12  # diverse beats near-duplicate
    assert got[3][0] == 11
    # second pick's score: 0.5*0.5 − 0.5*cos(c, a)
    expect = (0.5 * 0.5) - (0.5 * _seq_cosine(c, a))
    assert got[2][1] == expect


def test_lambda_one_is_relevance_order(spark):
    rows = [(1, i, 1.0 - i / 10.0, [float(i), 1.0]) for i in range(6)]
    got = [r["vec_id"] for r in
           mmr_rerank(_cand(spark, rows), lam=1.0, top_k=6)
           .orderBy("rank").collect()]
    assert got == [0, 1, 2, 3, 4, 5]


def test_first_pick_tie_breaks_to_lowest_id(spark):
    rows = [(1, 7, 0.5, [1.0, 0.0]), (1, 3, 0.5, [0.0, 1.0])]
    got = [r["vec_id"] for r in
           mmr_rerank(_cand(spark, rows), top_k=1).collect()]
    assert got == [3]


def test_small_group_returns_all_and_guards(spark):
    df = _cand(spark, [(1, 1, 0.9, [1.0]), (1, 2, 0.1, [0.5])])
    assert mmr_rerank(df, top_k=10).count() == 2
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, lam=1.5)
    with pytest.raises(ValueError, match="top_k"):
        mmr_rerank(df, top_k=0)


def test_partitioning_invariance_and_group_isolation(spark):
    """Two queries, candidates scattered over many partitions — each
    group's selection must match the single-partition run exactly."""
    import random

    rng = random.Random(11)
    rows = []
    for q in (1, 2):
        for i in range(25):
            rows.append(
                (q, i, rng.random(), [rng.uniform(-1, 1) for _ in range(8)])
            )
    df = _cand(spark, rows)
    a = sorted(tuple(r) for r in mmr_rerank(df.coalesce(1), lam=0.6).collect())
    b = sorted(tuple(r) for r in mmr_rerank(df.repartition(16), lam=0.6).collect())
    assert a == b and len(a) == 20
