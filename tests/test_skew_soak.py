"""Adversarial-skew soak for the sessionized/windowed family (VERDICT
r8 #5): ONE user holding half of all events — the classic straggler
wall for per-user windowed analytics that the uniform events fixture
never exercises.

Measured at 1M events on local[32] (recorded in PLANS.md round-9
notes): the hot-user run is NOT slower than the uniform run for any of
sessionize / funnel / cohort — `session_window` is a partial-mergeable
aggregation (map-side session fragments merge like any partial agg),
the funnel stages are per-user MIN aggregates (map-side combine), and
cohort dedups (user, day) BEFORE joining. Straggler ratio < 1.5× in
every case, far under the 4× mitigation threshold, so no salting /
chunking mitigation is required; these tests pin the CORRECTNESS of
the hot key's output plus a loose wall-clock bound so a future plan
regression (e.g. session merging collapsing into a single-task sort)
surfaces as a test failure, mirroring test_scd.py's hot-key case.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from aeuc_vector_db_spark.streaming.ingest import running_counts_stateful, user_sessions

N = 200_000
HOT_N = N // 2
UNIFORM_USERS = 5_000
BASE = 1_700_000_000


def _skewed_events(spark):
    """user 0 holds N/2 events; the rest spread over 5k users. Hot-user
    timestamps run at 13 s spacing with a 1-hour jump every 1,000
    events → exactly HOT_N/1000 sessions of exactly 1,000 events.
    Cold-user consecutive events are >30 min apart → all singletons."""
    hot = spark.range(HOT_N).select(
        F.lit(0).alias("user_id"),
        F.timestamp_seconds(
            F.lit(BASE)
            + F.col("id") * 13
            + (F.col("id") / 1000).cast("long") * 3600
        ).alias("ts"),
    )
    cold = spark.range(HOT_N).select(
        (F.col("id") % UNIFORM_USERS + 1).alias("user_id"),
        F.timestamp_seconds(
            F.lit(BASE) + (F.col("id") / UNIFORM_USERS).cast("long") * 3600
        ).alias("ts"),
    )
    return hot.unionByName(cold)


def _uniform_events(spark):
    return spark.range(N).select(
        (F.col("id") % UNIFORM_USERS).alias("user_id"),
        F.timestamp_seconds(
            F.lit(BASE) + (F.col("id") / UNIFORM_USERS).cast("long") * 3600
        ).alias("ts"),
    )


def test_sessionize_hot_user_exact_and_no_straggler_wall(spark):
    skewed = _skewed_events(spark).cache()
    uniform = _uniform_events(spark).cache()
    skewed.count(), uniform.count()
    try:
        t0 = time.time()
        uni_sessions = user_sessions(uniform).count()
        t_uniform = time.time() - t0
        t0 = time.time()
        out = user_sessions(skewed).cache()
        n_sessions = out.count()
        t_hot = time.time() - t0

        # exact session structure for the hot user: HOT_N/1000 sessions
        # of exactly 1000 events, starts at the post-jump timestamps
        hot_sessions = out.filter(F.col("user_id") == 0)
        assert hot_sessions.count() == HOT_N // 1000
        assert hot_sessions.filter(F.col("n_events") != 1000).count() == 0
        # cold users: one singleton session per event (1 h spacing)
        assert n_sessions - HOT_N // 1000 == HOT_N
        # uniform corpus: hourly spacing > 30-min gap everywhere → every
        # event is its own session
        assert uni_sessions == N
        out.unpersist()
    finally:
        skewed.unpersist()
        uniform.unpersist()

    # straggler bound: measured ~0.4× at 1M rows (PLANS.md); 4× is the
    # mitigation threshold from the verdict — fail well before that
    assert t_hot < 4 * max(t_uniform, 0.5), (t_hot, t_uniform)


def test_funnel_min_aggregates_under_hot_user(spark):
    """Funnel stages are per-user MIN aggregates + bounded equi joins;
    the hot user must produce exactly one row per stage with the
    earliest qualifying timestamps."""
    ev = (
        _skewed_events(spark)
        .withColumn(
            "event_type",
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.monotonically_increasing_id() % 3 + 1).cast("int"),
            ),
        )
        .cache()
    )
    ev.count()
    try:
        views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
            F.min("ts").alias("t_view")
        )
        clicks_e = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("u"), F.col("ts").alias("ets")
        )
        cond = (
            (views["user_id"] == clicks_e["u"])
            & (clicks_e["ets"] > views["t_view"])
            & (clicks_e["ets"] <= views["t_view"] + F.expr("INTERVAL 72 HOURS"))
        )
        clicks = views.join(clicks_e, cond).groupBy("user_id", "t_view").agg(
            F.min("ets").alias("t_click")
        )
        hot = clicks.filter(F.col("user_id") == 0).collect()
        assert len(hot) == 1
        assert hot[0]["t_click"] > hot[0]["t_view"]
    finally:
        ev.unpersist()


def test_cohort_distinct_before_join_under_hot_user(spark):
    """Cohort retention dedups (user, day) BEFORE the join, so the hot
    user contributes |active days| rows to the join, not |events|."""
    ev = _skewed_events(spark).cache()
    ev.count()
    try:
        first = ev.groupBy("user_id").agg(
            F.date_trunc("day", F.min("ts")).alias("cohort_day")
        )
        active = ev.select(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        ).distinct()
        hot_active = active.filter(F.col("user_id") == 0).count()
        # 100k hot events span 100k*13s + 100 h of jumps ≈ 51 days —
        # the join input for the hot user is ~51 rows, not 100,000
        assert hot_active < 100
        joined = active.join(first, "user_id")
        per_cohort = joined.groupBy("cohort_day").count()
        assert per_cohort.count() >= 1
    finally:
        ev.unpersist()


def test_stateful_running_counts_hot_key_live(spark, tmp_path):
    """The live stateful path (applyInPandasWithState): one hot key's
    rows all flow through a single pandas group per micro-batch — the
    state update must stay O(1) per batch and the final running total
    exact. 60k rows, half on one key, availableNow micro-batches."""
    src = f"{tmp_path}/src"
    n = 60_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 500).alias(
            "glyph_id"
        ),
        F.timestamp_seconds(F.lit(BASE) + F.col("id")).alias("ts"),
    )
    df.write.parquet(src)
    stream = spark.readStream.schema("glyph_id long, ts timestamp").parquet(src)
    q = (
        running_counts_stateful(stream, key_col="glyph_id")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("skew_state")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "select key, max(total_count) as total from skew_state group by key"
    ).collect()
    got = {r["key"]: r["total"] for r in rows}
    # evens all land on key 7 (n/2); ids ≡ 7 (mod 500) are all odd
    # (500 even, 7 odd) and add n/500 more
    assert got[7] == n // 2 + n // 500
    # a cold key: ids ≡ 9 (mod 500), all odd → n/500 rows
    assert got[9] == n // 500


def test_rfm_refinement_fires_on_planted_tie_run(spark, tmp_path):
    """VERDICT r11 #2 (adaptive RFM): a frequency tie-run bigger than
    _RFM_SLIVER_MAX must route that metric's boundary buckets through
    the two-level refinement (the debug hook reports it), the spread
    metrics must stay on the direct path, and the output must still
    hash-match the canonical NTILE oracle on the same parquet — both
    branches feeding one result. 20k customers × 1 order each: the
    f-metric boundary bucket is one 20k-row tie-run (> 16384); dates
    and prices spread, so r/m boundary buckets stay tiny."""
    import duckdb

    from aeuc_vector_db_spark.queries.relational import (
        _RFM_ORACLE,
        _RFM_SLIVER_MAX,
        _rfm_segments,
    )

    n = _RFM_SLIVER_MAX + 4000
    orders = spark.range(1, n + 1).select(
        F.col("id").alias("o_custkey"),
        F.timestamp_seconds(F.lit(BASE) + F.col("id") * 90_000).alias(
            "o_orderdate"
        ),
        (F.round((F.col("id") * 977 % 100_000) + F.lit(0.13), 2)).cast(
            "double"
        ).alias("o_totalprice"),
    )
    orders.write.parquet(f"{tmp_path}/orders.parquet")

    out: list = []
    sdf = _rfm_segments(spark, str(tmp_path), _refine_out=out).toPandas()
    # all three f boundaries sit in the single freq=1 tie-run bucket
    assert out == [("f", 1), ("f", 2), ("f", 3)], out
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    odf = con.execute(_RFM_ORACLE).fetchdf()
    scan = sorted(map(tuple, sdf[sorted(sdf.columns)].itertuples(index=False)))
    ocan = sorted(map(tuple, odf[sorted(odf.columns)].itertuples(index=False)))
    assert scan == ocan and len(scan) > 0
