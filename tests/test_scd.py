"""SCD Type-2 history + point-in-time join (operators/scd.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.scd import point_in_time_join, scd2_from_changes


def _t(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )


def _facts(spark, rows):
    return spark.createDataFrame(rows, "fact_id long, user_id long, ts timestamp")


CH = [
    (1, "2024-01-01 00:00:00", 10, 1.0),
    (1, "2024-01-03 00:00:00", 11, 2.0),
    (2, "2024-01-02 00:00:00", 12, 9.0),
]


def test_scd2_validity_ranges_hand_computed(spark):
    dim = scd2_from_changes(
        _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in CH]),
        key_col="user_id", ts_col="ts", attr_cols=["value"], tie_col="event_id",
    )
    rows = {(r["user_id"], r["eff_from"]): (r["eff_to"], r["value"])
            for r in dim.collect()}
    assert rows[(1, _t("2024-01-01 00:00:00"))] == (_t("2024-01-03 00:00:00"), 1.0)
    assert rows[(1, _t("2024-01-03 00:00:00"))] == (None, 2.0)  # open version
    assert rows[(2, _t("2024-01-02 00:00:00"))] == (None, 9.0)
    assert len(rows) == 3


def test_scd2_same_instant_last_wins_by_tie(spark):
    """Two changes at the same (key, ts): the greater tie_col wins —
    deterministically, regardless of input partitioning."""
    ch = CH + [(1, "2024-01-03 00:00:00", 99, 7.0)]  # event 99 beats 11
    for n_parts in (1, 7):
        dim = scd2_from_changes(
            _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in ch])
            .repartition(n_parts),
            key_col="user_id", ts_col="ts", attr_cols=["value"],
            tie_col="event_id",
        )
        got = {(r["user_id"], r["eff_from"]): r["value"] for r in dim.collect()}
        assert got[(1, _t("2024-01-03 00:00:00"))] == 7.0
        assert len(got) == 3


def test_scd2_same_instant_without_tie_raises(spark):
    ch = CH + [(1, "2024-01-03 00:00:00", 99, 7.0)]
    dim = scd2_from_changes(
        _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in ch]),
        key_col="user_id", ts_col="ts", attr_cols=["value"],
    )
    with pytest.raises(Exception, match="same-instant duplicate"):
        dim.collect()


def test_scd2_same_instant_raises_even_under_column_pruning(spark):
    """The dup guard lives in a FILTER, so Catalyst column pruning cannot
    eliminate it: a consumer that never reads eff_from (or reads nothing
    but the key) must still hit the error instead of silently getting
    overlapping duplicate versions (ADVICE r7)."""
    ch = CH + [(1, "2024-01-03 00:00:00", 99, 7.0)]
    dim = scd2_from_changes(
        _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in ch]),
        key_col="user_id", ts_col="ts", attr_cols=["value"],
    )
    with pytest.raises(Exception, match="same-instant duplicate"):
        dim.select("user_id").collect()
    with pytest.raises(Exception, match="same-instant duplicate"):
        dim.count()


def test_scd2_clean_stream_without_tie_is_fine(spark):
    dim = scd2_from_changes(
        _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in CH]),
        key_col="user_id", ts_col="ts", attr_cols=["value"],
    )
    assert dim.count() == 3


def test_point_in_time_boundaries(spark):
    """Half-open [eff_from, eff_to): a fact at exactly eff_from sees the
    NEW version; a fact before the first version keeps NULLs (left)."""
    dim = scd2_from_changes(
        _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in CH]),
        key_col="user_id", ts_col="ts", attr_cols=["value"], tie_col="event_id",
    )
    facts = _facts(spark, [
        (100, 1, _t("2023-12-31 00:00:00")),  # before first → NULL
        (101, 1, _t("2024-01-01 00:00:00")),  # exactly eff_from → v1
        (102, 1, _t("2024-01-02 23:59:59")),  # inside v1
        (103, 1, _t("2024-01-03 00:00:00")),  # exactly boundary → v2
        (104, 1, _t("2024-12-01 00:00:00")),  # open version → v2
        (105, 3, _t("2024-06-01 00:00:00")),  # unknown key → NULL
    ])
    got = {r["fact_id"]: r["value"]
           for r in point_in_time_join(facts, dim, "user_id", "ts").collect()}
    assert got == {100: None, 101: 1.0, 102: 1.0, 103: 2.0, 104: 2.0, 105: None}
    inner = point_in_time_join(facts, dim, "user_id", "ts", how="inner")
    assert sorted(r["fact_id"] for r in inner.collect()) == [101, 102, 103, 104]


def test_point_in_time_output_is_fact_sized(spark):
    """Disjoint intervals ⇒ exactly one match per fact: the join output
    equals |facts| even with many versions per key."""
    ch = [(1, _t(f"2024-01-{d:02d} 00:00:00"), d, float(d)) for d in range(1, 29)]
    dim = scd2_from_changes(
        _changes(spark, ch), "user_id", "ts", ["value"], tie_col="event_id")
    facts = _facts(spark, [
        (i, 1, _t(f"2024-01-{d:02d} 12:00:00")) for i, d in enumerate(range(1, 29))
    ])
    j = point_in_time_join(facts, dim, "user_id", "ts")
    assert j.count() == facts.count()
    assert j.filter(F.col("value") != F.dayofmonth("ts")).count() == 0


def test_point_in_time_plan_is_equi_join(spark):
    """The interval predicate must ride as a filter on an EQUI join on
    the key — never a cartesian/pure-range join."""
    dim = scd2_from_changes(
        _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in CH]),
        "user_id", "ts", ["value"], tie_col="event_id")
    facts = _facts(spark, [(100, 1, _t("2024-01-02 00:00:00"))])
    plan = point_in_time_join(facts, dim, "user_id", "ts")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_point_in_time_bucketed_parity(spark):
    """bucket_seconds chunking must return byte-identical results to the
    plain plan — including the half-open boundary facts, facts before
    the first version (left NULLs), unknown keys, open versions past
    the horizon derivation, and an eff_to landing EXACTLY on a bucket
    boundary."""
    # version boundaries at 00:00 each day; bucket = 12h so closed
    # versions span 4 buckets and one eff_to hits a bucket edge exactly
    ch = [
        (1, "2024-01-01 00:00:00", 10, 1.0),
        (1, "2024-01-03 00:00:00", 11, 2.0),
        (1, "2024-01-05 12:00:00", 12, 3.0),
        (2, "2024-01-02 06:30:00", 13, 9.0),
    ]
    dim = scd2_from_changes(
        _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in ch]),
        "user_id", "ts", ["value"], tie_col="event_id",
    )
    facts = _facts(spark, [
        (100, 1, _t("2023-12-31 23:59:59")),
        (101, 1, _t("2024-01-01 00:00:00")),
        (102, 1, _t("2024-01-02 23:59:59")),
        (103, 1, _t("2024-01-03 00:00:00")),   # boundary == bucket edge
        (104, 1, _t("2024-01-05 11:59:59")),
        (105, 1, _t("2024-01-05 12:00:00")),
        (106, 1, _t("2024-09-01 00:00:00")),   # deep in the open version
        (107, 2, _t("2024-01-02 06:30:00")),
        (108, 3, _t("2024-06-01 00:00:00")),   # unknown key
    ])
    for how in ("left", "inner"):
        plain = point_in_time_join(facts, dim, "user_id", "ts", how=how)
        for kwargs in (
            {"bucket_seconds": 43_200},
            {"bucket_seconds": 43_200, "horizon_ts": _t("2025-01-01 00:00:00")},
        ):
            bucketed = point_in_time_join(
                facts, dim, "user_id", "ts", how=how, **kwargs
            )
            key = ["fact_id"]
            a = sorted(map(tuple, plain.select("fact_id", "value").collect()))
            b = sorted(map(tuple, bucketed.select("fact_id", "value").collect()))
            assert a == b, f"parity broke for how={how} kwargs={kwargs}"
            assert sorted(plain.columns) == sorted(bucketed.columns)
    with pytest.raises(ValueError, match="bucket_seconds"):
        point_in_time_join(facts, dim, "user_id", "ts", bucket_seconds=0)


def test_scd2_hot_key_skew(spark):
    """The classic SCD skew wall: ONE entity holding the bulk of the
    versions (the window over a single partition key serializes into a
    single task). Correctness must hold — the hot entity's intervals
    chain exactly (each eff_to = next eff_from, one open version) while
    cold entities are untouched — and the build must stay in the same
    cost regime as a uniform stream (soak numbers in PLANS.md round-8
    notes; mitigation notes in operators/scd.py docstring)."""
    hot_n, cold_n = 20_000, 5_000
    hot = spark.range(hot_n).select(
        F.lit(0).alias("user_id"),
        (F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 60)).alias("ts"),
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("value"),
    )
    cold = spark.range(cold_n).select(
        (F.col("id") + 1).alias("user_id"),
        F.timestamp_seconds(F.lit(1704067200)).alias("ts"),
        (F.col("id") + hot_n).alias("event_id"),
        F.lit(-1.0).alias("value"),
    )
    dim = scd2_from_changes(
        hot.unionByName(cold).repartition(32),
        "user_id", "ts", ["value"], tie_col="event_id",
    )
    # interval chaining on the hot key, verified distributed (no collect
    # of the 20k versions): eff_to == lead(eff_from) by construction ⇒
    # assert closed-version count and the open tail, plus monotone
    # non-overlap via an aggregate
    hot_dim = dim.filter(F.col("user_id") == 0)
    assert hot_dim.count() == hot_n
    assert hot_dim.filter(F.col("eff_to").isNull()).count() == 1
    bad = hot_dim.filter(
        F.col("eff_to").isNotNull() & (F.col("eff_to") <= F.col("eff_from"))
    ).count()
    assert bad == 0
    # every closed interval is exactly 60s (the generation step) — a
    # wrong lead() under skew would show as gaps/overlaps
    off = hot_dim.filter(
        F.col("eff_to").isNotNull()
        & (F.unix_timestamp("eff_to") - F.unix_timestamp("eff_from") != 60)
    ).count()
    assert off == 0
    assert dim.filter(F.col("user_id") > 0).count() == cold_n


def test_validation_errors(spark):
    df = _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in CH])
    with pytest.raises(ValueError, match="no column"):
        scd2_from_changes(df, "nope", "ts", ["value"])
    dim = scd2_from_changes(df, "user_id", "ts", ["value"], tie_col="event_id")
    facts = _facts(spark, [(1, 1, _t("2024-01-02 00:00:00"))])
    with pytest.raises(ValueError, match="how must be"):
        point_in_time_join(facts, dim, "user_id", "ts", how="full")
    with pytest.raises(ValueError, match="dim lacks"):
        point_in_time_join(facts, dim.drop("eff_to"), "user_id", "ts")
    # a misspelled tie_col is the operator's ValueError, not a raw Spark
    # analysis error (ADVICE r7)
    with pytest.raises(ValueError, match="no column 'event_idd'"):
        scd2_from_changes(df, "user_id", "ts", ["value"], tie_col="event_idd")
    # overlapping non-key columns between facts and dim would emit
    # duplicate column names — rejected loudly (ADVICE r7)
    facts_clash = facts.withColumn("value", F.lit(0.0))
    with pytest.raises(ValueError, match="share non-key columns"):
        point_in_time_join(facts_clash, dim, "user_id", "ts")


def test_point_in_time_bucketed_too_small_horizon_raises(spark):
    """A user-supplied horizon_ts below the max fact timestamp must fail
    LOUDLY: the bucketed plan's open versions only explode up to the
    horizon bucket, so facts beyond it would silently unmatch against
    open versions — diverging from the unbucketed plan the docstring
    promises parity with (ADVICE r8). The guard is a filter predicate,
    so column pruning cannot eliminate it either."""
    dim = scd2_from_changes(
        _changes(spark, [(u, _t(ts), e, v) for u, ts, e, v in CH]),
        "user_id", "ts", ["value"], tie_col="event_id",
    )
    facts = _facts(spark, [
        (100, 1, _t("2024-01-02 00:00:00")),
        (101, 1, _t("2024-09-01 00:00:00")),  # beyond the supplied horizon
    ])
    j = point_in_time_join(
        facts, dim, "user_id", "ts",
        bucket_seconds=43_200, horizon_ts=_t("2024-02-01 00:00:00"),
    )
    with pytest.raises(Exception, match="exceeds the supplied horizon_ts"):
        j.collect()
    with pytest.raises(Exception, match="exceeds the supplied horizon_ts"):
        j.select("fact_id").collect()  # survives column pruning
    # a horizon >= max fact ts stays clean and matches the plain plan
    ok = point_in_time_join(
        facts, dim, "user_id", "ts",
        bucket_seconds=43_200, horizon_ts=_t("2024-12-31 00:00:00"),
    )
    plain = point_in_time_join(facts, dim, "user_id", "ts")
    assert sorted(map(tuple, ok.select("fact_id", "value").collect())) == \
        sorted(map(tuple, plain.select("fact_id", "value").collect()))
