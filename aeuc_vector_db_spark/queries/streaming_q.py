"""Declared queries for streaming-semantics operators, run in batch mode
over the `events` fixture (batch ≡ streaming for these plans — same
windowing semantics Structured Streaming executes incrementally; the
incremental/watermark behavior itself is covered by
tests/test_streaming.py, which drives a real readStream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aeuc_vector_db_spark.sources.tables import load_table
from aeuc_vector_db_spark.streaming.ingest import hourly_window_counts, user_sessions


def _events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return hourly_window_counts(ev)


_HOURLY_ORACLE = """
SELECT CAST(epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
         AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY window_start_us, event_type
"""


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return user_sessions(ev, gap="30 minutes")


# Session windows = gaps-and-islands: a new session starts when the gap
# from the previous event of the same user EXCEEDS 30 minutes. The strict
# > is deliberate and empirically verified: Spark's session_window merges
# an event at exactly prev+gap into the SAME session (touching windows
# merge), matching `gap > interval` here — a >= would diverge on
# round-timestamped data.
_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id,
       CAST(epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT) AS session_start_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM numbered GROUP BY user_id, session_no
"""


def _events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON access over the props column (meta-map analog)."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


_JSON_PROPS_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INTEGER) AS max_k
FROM events GROUP BY event_type
"""


def _events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→view attribution through the stream-stream join plan
    (`streaming/ingest.py attribute_clicks`): every (view, click) pair
    per user within 1 hour, aggregated per user cohort. Batch ≡
    streaming — the watermark is a no-op here, and the live watermarked
    run (state eviction, late-drop) is pinned in
    tests/test_streaming.py::test_stream_stream_join_attribution_and_late_drop.
    The synthetic ad_id (user_id % 7, derived identically on both
    sides) keeps the two-column equi-join path exercised without
    changing the matched set."""
    from aeuc_vector_db_spark.streaming import ingest as SI

    ev = load_table(spark, "events", sf_dir)
    ad = (F.col("user_id") % 7).alias("ad_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id", ad, "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", ad, "ts")
    pairs = SI.attribute_clicks(views, clicks, max_delay="1 hour")
    return (
        pairs.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("delay_us").alias("sum_delay_us"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_ATTRIBUTION_ORACLE = """
SELECT CAST(i.user_id % 10 AS BIGINT) AS cohort,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(epoch_us(c.ts) - epoch_us(i.ts)) AS BIGINT) AS sum_delay_us,
       CAST(COUNT(DISTINCT i.user_id) AS BIGINT) AS n_users
FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') i
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON i.user_id = c.user_id AND c.ts >= i.ts AND c.ts <= i.ts + INTERVAL 1 HOUR
GROUP BY cohort
"""


def _events_windowed_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour approximate distinct users (streaming-shaped HLL,
    streaming/ingest.py windowed_hll_distinct) joined with the exact
    per-window distinct for the accuracy twin — the exact side exists
    only in this batch query; the streamable operator is sketch-only
    (COUNT DISTINCT state grows with cardinality, register state never
    does)."""
    from aeuc_vector_db_spark.streaming.ingest import windowed_hll_distinct

    ev = load_table(spark, "events", sf_dir)
    hll = windowed_hll_distinct(ev)
    exact = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_distinct_exact"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_distinct_exact",
        )
    )
    return hll.join(exact, "window_start_us").select(
        "window_start_us",
        F.round("hll_estimate", 2).alias("hll_estimate"),
        "n_zero_registers",
        "s_scaled",
        "n_distinct_exact",
    )


def _windowed_hll_oracle() -> str:
    from aeuc_vector_db_spark.operators.sketch import (
        HLL_ALPHA,
        HLL_M,
        HLL_P,
        HLL_W,
    )
    from aeuc_vector_db_spark.queries.textops import _dk_hex32

    shift = HLL_W + 1
    num = HLL_ALPHA * HLL_M * HLL_M * float(1 << shift)
    return f"""
WITH hv AS (
  SELECT CAST(epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
           AS window_start_us,
         user_id,
         {_dk_hex32("sha256(CAST(user_id AS VARCHAR))")} AS h
  FROM events
),
rr AS (
  SELECT window_start_us, h % {HLL_M} AS register,
         CASE WHEN (h >> {HLL_P}) = 0 THEN {shift}
              ELSE {shift} - length(format('{{:b}}', h >> {HLL_P})) END AS rho
  FROM hv
),
regs AS (
  SELECT window_start_us, register, MAX(rho) AS maxrho
  FROM rr GROUP BY 1, 2
),
agg AS (
  SELECT window_start_us, COUNT(*) AS n_present,
         SUM(CAST(1 AS BIGINT) << CAST({shift} - maxrho AS INT)) AS s_present
  FROM regs GROUP BY 1
),
est AS (
  SELECT window_start_us, ({HLL_M} - n_present) AS v_zero,
         s_present + ({HLL_M} - n_present) * (CAST(1 AS BIGINT) << {shift}) AS s_scaled
  FROM agg
),
fin AS (
  SELECT window_start_us,
         CASE WHEN ({num!r} / CAST(s_scaled AS DOUBLE)) <= {2.5 * HLL_M!r} AND v_zero > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(v_zero AS DOUBLE))
              ELSE ({num!r} / CAST(s_scaled AS DOUBLE)) END AS hll_estimate,
         v_zero, s_scaled
  FROM est
),
ex AS (
  SELECT window_start_us, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
  FROM hv GROUP BY 1
)
SELECT fin.window_start_us, ROUND(hll_estimate, 2) AS hll_estimate,
       CAST(v_zero AS BIGINT) AS n_zero_registers,
       CAST(s_scaled AS BIGINT) AS s_scaled,
       ex.n_distinct_exact
FROM fin JOIN ex ON fin.window_start_us = ex.window_start_us
"""


_WINDOWED_HLL_ORACLE = _windowed_hll_oracle()


_RESAMPLE_STEP_US = 6 * 3_600_000_000  # 6 hours


def _events_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular event stream → fixed 6-hour grid per user with LOCF
    gap fill (operators/timeseries.py). No float arithmetic anywhere —
    observed values are carried verbatim — so the fill is hash-exact
    cross-engine."""
    from aeuc_vector_db_spark.operators.timeseries import resample_locf

    ev = load_table(spark, "events", sf_dir)
    return resample_locf(ev, step="6 hours")


_RESAMPLE_ORACLE = f"""
WITH obs0 AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // {_RESAMPLE_STEP_US} AS bucket,
         ts, event_id, value
  FROM events
),
last AS (
  SELECT user_id, bucket, value AS obs
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC
    ) AS rn
    FROM obs0
  )
  WHERE rn = 1
),
grid AS (
  SELECT user_id, unnest(range(lo, hi + 1)) AS bucket
  FROM (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM last GROUP BY 1)
),
j AS (
  SELECT g.user_id, g.bucket, l.obs
  FROM grid g LEFT JOIN last l ON g.user_id = l.user_id AND g.bucket = l.bucket
)
SELECT user_id,
       CAST(bucket * {_RESAMPLE_STEP_US} AS BIGINT) AS bucket_start_us,
       last_value(obs IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_locf,
       obs IS NOT NULL AS is_observed
FROM j
"""


def _events_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 + point-in-time join (operators/scd.py): purchases form a
    per-user change stream (value = the attribute); every click is then
    joined to the purchase-version valid AT the click's timestamp —
    the feature-store leak-proof join. Clicks before a user's first
    purchase keep NULLs (left join) rather than silently dropping.
    Oracle: the same SCD2 construction in DuckDB SQL — a cross-engine
    check of the half-open [eff_from, eff_to) interval semantics,
    including the ts-tie last-wins and the boundary-inclusive eff_from."""
    from aeuc_vector_db_spark.operators.scd import (
        point_in_time_join,
        scd2_from_changes,
    )

    ev = load_table(spark, "events", sf_dir)
    dim = scd2_from_changes(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        ),
        key_col="user_id",
        ts_col="ts",
        attr_cols=["value"],
        tie_col="event_id",
    ).withColumnRenamed("value", "purchase_value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = point_in_time_join(clicks, dim, key_col="user_id", fact_ts_col="ts")
    return j.select(
        "event_id",
        "user_id",
        F.col("purchase_value"),
        F.col("eff_from").isNotNull().alias("has_version"),
    )


_SCD2_PIT_ORACLE = """
WITH ch AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
),
dim AS (
  SELECT user_id, ts AS eff_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS eff_to,
         value AS purchase_value
  FROM ch WHERE rn = 1
)
SELECT f.event_id, f.user_id, d.purchase_value,
       d.eff_from IS NOT NULL AS has_version
FROM events f
LEFT JOIN dim d
  ON f.user_id = d.user_id
 AND f.ts >= d.eff_from
 AND (d.eff_to IS NULL OR f.ts < d.eff_to)
WHERE f.event_type = 'click'
"""


def _events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion: view → click (≤72h later) → purchase
    (≤72h after the click), earliest-qualifying-event semantics per
    user. Each stage is a per-user MIN aggregate joined to the next
    event type on the USER key with the time bound as a join filter —
    three equi hash joins on the same key (co-partitioned; one logical
    shuffle per stage, reusable), never a cartesian or a window over
    the whole event stream. Output: one row of stage counts."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")

    def stage(prev: DataFrame, etype: str, out: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).select(
            F.col("user_id").alias("u"), F.col("ts").alias("ets")
        )
        cond = (
            (prev["user_id"] == e["u"])
            & (e["ets"] > prev[prev.columns[-1]])
            & (e["ets"] <= prev[prev.columns[-1]] + F.expr("INTERVAL 72 HOURS"))
        )
        return (
            prev.join(e, cond)
            .groupBy("user_id", *prev.columns[1:])
            .agg(F.min("ets").alias(out))
        )

    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    clicks = stage(views, "click", "t_click")
    purchases = stage(clicks, "purchase", "t_purchase")
    return (
        views.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(clicks.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(purchases.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT v.user_id, MIN(e.ts) AS t_click
  FROM v JOIN events e ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
    AND e.ts <= v.t_view + INTERVAL 72 HOUR
  GROUP BY v.user_id
), p AS (
  SELECT c.user_id, MIN(e.ts) AS t_purchase
  FROM c JOIN events e ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    AND e.ts <= c.t_click + INTERVAL 72 HOUR
  GROUP BY c.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_full_funnel
"""


def _events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen DAY, counted by
    how many distinct days after signup they were active. Two grouped
    aggregates plus one equi join on the user key; the (user, day)
    dedup happens BEFORE the join, so the join input is bounded by
    users × active-days, not raw events. Output: (cohort_day_us,
    offset_days, n_users)."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    return (
        active.join(first, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("offset_days"),
            "user_id",
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.unix_micros("cohort_day").alias("cohort_day_us"),
            F.col("offset_days").cast("long").alias("offset_days"),
            "n_users",
        )
    )


_COHORT_ORACLE = """
WITH first AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
)
SELECT CAST(epoch_us(CAST(cohort_day AS TIMESTAMP)) AS BIGINT) AS cohort_day_us,
       CAST(date_diff('day', cohort_day, day) AS BIGINT) AS offset_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY cohort_day, day
"""


def _events_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection with median/MAD (the data-quality gate a
    mean/stddev z-score cannot provide — one extreme value drags the
    mean, never the median): events whose value deviates from the
    median by more than 3.5 robust sigmas (MAD · 1.4826). Two EXACT
    interpolating percentiles (one-row aggregates broadcast back — the
    scalar never shuffles the fact table) and a map-side filter; the
    float expression is identical left-to-right on both engines, so
    the boundary is hash-exact."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", F.col("value").cast("double").alias("x")
    )
    med = ev.agg(F.expr("percentile(x, 0.5D)").alias("med"))
    dev = ev.crossJoin(F.broadcast(med)).select(
        "event_id", "x", (F.abs(F.col("x") - F.col("med"))).alias("d")
    )
    mad = dev.agg(F.expr("percentile(d, 0.5D)").alias("mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .filter(F.col("d") > F.lit(3.5) * F.lit(1.4826) * F.col("mad"))
        .select(
            "event_id",
            F.round("x", 2).alias("value"),
            F.round(F.col("d") / (F.lit(1.4826) * F.col("mad")), 6).alias(
                "robust_z"
            ),
        )
        .orderBy("event_id")
    )


_MAD_OUTLIERS_ORACLE = """
WITH p AS (SELECT event_id, CAST(value AS DOUBLE) AS x FROM events),
m AS (SELECT quantile_cont(x, 0.5) AS med FROM p),
d AS (SELECT event_id, x, abs(x - med) AS d FROM p CROSS JOIN m),
md AS (SELECT quantile_cont(d, 0.5) AS mad FROM d)
SELECT event_id, ROUND(x, 2) AS value, ROUND(d / (1.4826 * mad), 6) AS robust_z
FROM d CROSS JOIN md
WHERE d > 3.5 * 1.4826 * mad
ORDER BY event_id
"""


def _events_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, user bucket) value trend: closed-form OLS slope
    of value against hours since the fixture epoch (2024-01-01), via
    `operators.timeseries.grouped_ols` — exact decimal sufficient
    statistics (order-independent), one fixed-shape double division at
    the end, so the oracle hash-matches. x is integer hours (exact
    floor division of epoch micros on both engines); y is the 2-decimal
    value column cast to DECIMAL(10,2) (exact, FIXTURES.md)."""
    from aeuc_vector_db_spark.operators.timeseries import grouped_ols

    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        (F.col("user_id") % 8).cast("long").alias("user_bucket"),
        # 473352 = 1704067200 s / 3600 — hours from 1970 to 2024-01-01
        (F.expr("unix_micros(ts) div 3600000000") - F.lit(473352))
        .cast("decimal(10,0)")
        .alias("x"),
        F.col("value").cast("decimal(10,2)").alias("y"),
    )
    res = grouped_ols(ev, ("event_type", "user_bucket"), "x", "y")
    return res.select(
        "event_type",
        "user_bucket",
        "n",
        F.round("slope", 9).alias("slope_per_hour"),
        F.round("intercept", 6).alias("intercept"),
    ).orderBy("event_type", "user_bucket")


_TREND_OLS_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST(user_id % 8 AS BIGINT) AS user_bucket,
         CAST((epoch_us(ts) // 3600000000) - 473352 AS DECIMAL(10,0)) AS x,
         CAST(value AS DECIMAL(10,2)) AS y
  FROM events
), s AS (
  SELECT event_type, user_bucket,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
  FROM b GROUP BY event_type, user_bucket
), f AS (
  SELECT event_type, user_bucket, n, sx, sxx,
         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
         CAST(sxx AS DOUBLE) AS sxxd
  FROM s
), g AS (
  SELECT event_type, user_bucket, n, syd, sxd, nd,
         (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope
  FROM f
  -- zero-variance drop on the EXACT decimal statistics, mirroring
  -- operators/timeseries.py grouped_ols (the double-cast den can be a
  -- one-ulp nonzero for a constant-x group); the double-den guard is
  -- ALSO mirrored — a cancellation-to-0.0 double den divides by zero,
  -- where Spark yields NULL but DuckDB yields ±Inf
  WHERE n >= 2 AND (n * sxx - sx * sx) <> 0
    AND (nd * sxxd - sxd * sxd) <> 0.0
)
SELECT event_type, user_bucket, CAST(n AS BIGINT) AS n,
       ROUND(slope, 9) AS slope_per_hour,
       ROUND((syd - slope * sxd) / nd, 6) AS intercept
FROM g
ORDER BY event_type, user_bucket
"""


def _events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user one-sided CUSUM drift alarms (round 11 —
    `operators/timeseries.py cusum_alarms`): drift allowance k = $50,
    alarm threshold h = $200, values as exact cents, events ordered by
    the total (ts, event_id) order. A sequential recurrence (running
    max with reset) — NOT window-expressible — run since round 16 as an
    exact-integer JVM fold over each user's sorted event array
    (`operators/timeseries.py cusum_alarms`; the r11-r15 applyInPandas
    kernel paid one Python call per user — 98% of the query's
    full-recompute cost at fixture group cardinality); the DuckDB
    oracle unrolls the SAME recurrence as a recursive CTE stepping
    rn → rn+1 per user, so the hash match proves every step of the
    stateful computation, the same standard the PageRank/components
    oracles set for iterative ops."""
    from aeuc_vector_db_spark.operators.timeseries import cusum_alarms

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id",
        (F.col("value").cast("decimal(10,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    res = cusum_alarms(
        ev, "user_id", ("ts", "event_id"), "v", "event_id",
        k=5000, h=20000,
    )
    return (
        res.filter(F.col("n_alarms") > 0)
        .select("user_id", "n_events", "n_alarms", "first_alarm_id")
        .orderBy("user_id")
    )


_CUSUM_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
),
rec AS (
  SELECT user_id, rn, n_events,
         CASE WHEN GREATEST(0, v - 5000) >= 20000 THEN 0
              ELSE GREATEST(0, v - 5000) END AS s,
         CASE WHEN GREATEST(0, v - 5000) >= 20000 THEN 1 ELSE 0 END AS n_alarms,
         CASE WHEN GREATEST(0, v - 5000) >= 20000 THEN event_id END AS first_alarm_id
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.n_events,
         CASE WHEN GREATEST(0, r.s + e.v - 5000) >= 20000 THEN 0
              ELSE GREATEST(0, r.s + e.v - 5000) END,
         r.n_alarms + CASE WHEN GREATEST(0, r.s + e.v - 5000) >= 20000
                           THEN 1 ELSE 0 END,
         COALESCE(r.first_alarm_id,
                  CASE WHEN GREATEST(0, r.s + e.v - 5000) >= 20000
                       THEN e.event_id END)
  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_alarms AS BIGINT) AS n_alarms,
       CAST(first_alarm_id AS BIGINT) AS first_alarm_id
FROM rec WHERE rn = n_events AND n_alarms > 0
ORDER BY user_id
"""


def _events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session event-type transition counts (the Markov-chain /
    behavioral-sequence primitive a training-data pipeline uses to
    featurize clickstreams): sessionize per user with the same strict
    >30 min gap as `events_sessionize`, then count (event_type →
    next event_type) adjacencies WITHIN each session, ordered by
    (ts, event_id) — a total order, so lead() is deterministic.

    Plan shape: ONE hash exchange on user_id serves the session-mark
    window, the session-number running sum, and the lead() window (all
    partition on user_id or (user_id, session) — Spark reuses the sort
    since the keys share the prefix); the transition count is a tiny
    (src,dst)-keyed aggregate with map-side combine. No self-join —
    adjacency via lead, never ts-offset equi-joins."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    marked = ev.withColumn("prev_us", F.lag(us).over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev_us").isNull()
            | (us - F.col("prev_us") > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    adj = sess.withColumn("dst_type", F.lead("event_type").over(w2)).filter(
        F.col("dst_type").isNotNull()
    )
    return (
        adj.groupBy(
            F.col("event_type").alias("src_type"), "dst_type"
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("src_type", "dst_type")
    )


_TRANSITION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
), adj AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (PARTITION BY user_id, session_no
                                ORDER BY ts, event_id) AS dst_type
  FROM sess
)
SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM adj WHERE dst_type IS NOT NULL
GROUP BY src_type, dst_type
ORDER BY src_type, dst_type
"""


def _events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value` (the irregular-
    timeseries mean: each reading holds until the next one, so it is
    weighted by its holding duration — the kdb/TimescaleDB `twa`
    primitive, which a plain AVG gets wrong whenever sampling is
    bursty). Exact by construction: value is DECIMAL(10,2), the
    holding duration is integer epoch micros from lead(), so the
    Σ value·dt and Σ dt accumulators are exact integer/decimal sums
    (order-independent); the final division is one IEEE op, but the
    Σv·dt DECIMAL exceeds 2⁵³ so the decimal→double CAST itself is
    the nondeterminism (Java converts the exact value in one rounding,
    DuckDB converts the unscaled hugeint then divides by the scale —
    two roundings), hence the standard round(·, 9) on the result.

    Plan: one user_id exchange feeds the lead() window and the
    per-user aggregate (shared partitioning); users with < 2 events
    carry no interval and drop out. The last event per user has no
    successor and contributes no weight — the window is
    [first_ts, last_ts], the standard closed-interval TWA."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").cast("decimal(10,2)").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    dt = (F.lead(us).over(w) - us).alias("dt")
    seg = ev.select("user_id", "v", dt).filter(F.col("dt").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.sum(F.col("v") * F.col("dt").cast("decimal(20,0)")).alias("svdt"),
        F.sum("dt").alias("sdt"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
    return (
        agg.filter(F.col("sdt") > 0)
        .select(
            "user_id",
            F.col("n_intervals").cast("long").alias("n_intervals"),
            F.round(
                F.col("svdt").cast("double") / F.col("sdt").cast("double"), 9
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


_TWA_ORACLE = """
WITH seg AS (
  SELECT user_id,
         CAST(value AS DECIMAL(10,2)) AS v,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dt
  FROM events
), agg AS (
  SELECT user_id,
         SUM(v * CAST(dt AS DECIMAL(20,0))) AS svdt,
         SUM(dt) AS sdt,
         COUNT(*) AS n_intervals
  FROM seg WHERE dt IS NOT NULL GROUP BY user_id
)
SELECT user_id,
       CAST(n_intervals AS BIGINT) AS n_intervals,
       ROUND(CAST(svdt AS DOUBLE) / CAST(sdt AS DOUBLE), 9) AS twa_value
FROM agg WHERE sdt > 0 ORDER BY user_id
"""


QUERIES = {
    "events_transition_matrix": (_events_transition_matrix, _TRANSITION_ORACLE),
    "events_cusum_alarms": (_events_cusum_alarms, _CUSUM_ORACLE),
    "events_time_weighted_avg": (_events_time_weighted_avg, _TWA_ORACLE),
    "events_value_trend_ols": (_events_value_trend_ols, _TREND_OLS_ORACLE),
    "events_value_outliers_mad": (_events_value_outliers_mad, _MAD_OUTLIERS_ORACLE),
    "events_funnel_conversion": (_events_funnel_conversion, _FUNNEL_ORACLE),
    "events_cohort_retention": (_events_cohort_retention, _COHORT_ORACLE),
    "events_scd2_point_in_time": (_events_scd2_point_in_time, _SCD2_PIT_ORACLE),
    "events_resample_locf": (_events_resample_locf, _RESAMPLE_ORACLE),
    "events_windowed_hll": (_events_windowed_hll, _WINDOWED_HLL_ORACLE),
    "events_hourly_window": (_events_hourly_window, _HOURLY_ORACLE),
    "events_sessionize": (_events_sessionize, _SESSION_ORACLE),
    "events_json_props": (_events_json_props, _JSON_PROPS_ORACLE),
    "events_click_attribution": (_events_click_attribution, _ATTRIBUTION_ORACLE),
}
