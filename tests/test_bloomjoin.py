"""Bloom semi-join reduction: result parity with the plain join, the
no-false-negative guarantee, the reduction actually biting, and the
probe staying a pure-codegen filter below the join.

Reference analog: the inverted-index candidate pre-filter before
scoring (reference vector_field.py:316-322), generalized to
distributed equi-joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.bloomjoin import (
    bloom_build,
    bloom_probe_col,
    bloom_reduced_join,
)


def _fact(spark, n=5000):
    return spark.range(n).select(
        F.col("id").alias("key"), (F.col("id") * 3 % 97).alias("v")
    )


def _build(spark, n=80, span=5000):
    # deterministic scattered subset of the fact key space
    return spark.range(n).select((F.col("id") * 61 % span).alias("key")).distinct()


def test_reduced_join_matches_plain_join(spark):
    fact, build = _fact(spark), _build(spark)
    got = sorted(tuple(r) for r in bloom_reduced_join(fact, build, "key").collect())
    want = sorted(tuple(r) for r in fact.join(build, "key").collect())
    assert got == want and len(got) == build.count()


def test_semi_variant_matches_plain_semi(spark):
    fact, build = _fact(spark), _build(spark)
    got = sorted(
        r["key"]
        for r in bloom_reduced_join(fact, build, "key", how="left_semi").collect()
    )
    want = sorted(r["key"] for r in fact.join(build, "key", "left_semi").collect())
    assert got == want


def test_no_false_negatives_every_build_key_probes_true(spark):
    build = _build(spark, n=500, span=100000)
    bf = bloom_build(build, "key")
    assert build.filter(~bloom_probe_col(F.col("key"), bf)).count() == 0


def test_reduction_bites_before_the_join(spark):
    """With a selective build side, the pre-filter must discard the
    overwhelming majority of fact rows (fp rate at m=2^18, k=3,
    n=80 keys is ~1e-12 — the kept count is deterministic given the
    fixed xxhash64 seeds, and far below the fact count)."""
    fact, build = _fact(spark), _build(spark)
    bf = bloom_build(build, "key")
    kept = fact.filter(bloom_probe_col(F.col("key"), bf)).count()
    n_build = build.count()
    assert n_build <= kept < 200  # matches + (near-zero) false positives


def test_null_keys_never_survive(spark):
    fact = spark.createDataFrame(
        [(None, 1), (2, 2)], "key bigint, v bigint"
    )
    build = spark.createDataFrame([(2,), (None,)], "key bigint")
    got = [tuple(r) for r in bloom_reduced_join(fact, build.distinct(), "key").collect()]
    assert got == [(2, 2)]


def test_words_df_matches_driver_build(spark):
    """The distributed word table and the driver-collected filter are
    the same bits — bloom_words_df is bloom_build minus the collect."""
    from aeuc_vector_db_spark.operators.bloomjoin import bloom_words_df

    build = _build(spark, n=200, span=20000)
    bf = bloom_build(build, "key", m_bits=1 << 14)
    dense = [0] * (1 << 8)
    for r in bloom_words_df(build, "key", m_bits=1 << 14).collect():
        dense[r["w"]] = r["word"]
    assert dense == bf["words"]


def test_reduced_join_probes_are_broadcast_joins(spark):
    """The join formulation's contract: k broadcast probes + the final
    join, no Python evaluator — and no giant literal in the plan (the
    CreateArray-in-a-join-plan compile blowup this formulation avoids)."""
    fact, build = _fact(spark), _build(spark)
    plan = (
        bloom_reduced_join(fact, build, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "xxhash64" in plan and "BatchEvalPython" not in plan


def test_probe_is_codegen_filter_below_the_join(spark):
    """The 100 TB contract: the probe is a plain Filter inside the fact
    side's WholeStageCodegen, BELOW any exchange/join — no Python
    evaluator, no extra shuffle introduced by the reduction."""
    fact, build = _fact(spark), _build(spark)
    bf = bloom_build(build, "key")
    pre = fact.filter(bloom_probe_col(F.col("key"), bf))
    pre_plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in pre_plan and "xxhash64" in pre_plan
    assert "BatchEvalPython" not in pre_plan and "Exchange" not in pre_plan
    joined_plan = (
        bloom_reduced_join(fact, build, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in joined_plan and "BatchEvalPython" not in joined_plan


def test_parameter_validation(spark):
    build = _build(spark)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(build, "key", m_bits=100)
    with pytest.raises(ValueError, match="k must"):
        bloom_build(build, "key", k=0)
    with pytest.raises(ValueError, match="how"):
        bloom_reduced_join(_fact(spark), build, "key", how="left")


def test_partitioning_invariance(spark):
    """The filter words are a commutative bit_or fold — repartitioning
    the build side must produce the identical filter."""
    build = _build(spark, n=300, span=50000)
    a = bloom_build(build.repartition(1), "key")
    b = bloom_build(build.repartition(13), "key")
    assert a == b
