"""Frequency-sketch-style operators built to stay EXACT at scale.

The 100 TB problem with `tokens → groupBy(term).count()` is not the
aggregation (partial/map-side combine already bounds the shuffle to
distinct terms per partition) — it is that the long tail of near-unique
terms still shuffles once each. For heavy-hitter mining (boilerplate
detection, stopword discovery, vocabulary pruning) the classic two-phase
design avoids shuffling the tail at all, while staying exact:

  Phase 1 — partition-local candidate generation (NO shuffle): count
     terms within each partition and keep those with local count ≥
     ceil(T / P).  Pigeonhole: a term with global count ≥ T across P
     partitions must reach ≥ ceil(T/P) in at least one partition, so the
     candidate set is a SUPERSET of the true answer for any partitioning
     of the rows. Only candidates (tiny) leave the executors.
  Phase 2 — exact recount of candidates only: broadcast the candidate
     set, semi-join it against the token stream, groupBy-count, filter
     ≥ T.  False candidates from phase 1 die here; counts are exact.

No approximation anywhere — the sketch-like trick is only in what gets
*pruned before the shuffle* (same philosophy as the engine's MinHash
banding: never materialize the quadratic/tail part).

Phase 1 uses mapInPandas as a per-partition accumulator: the generator
sees every Arrow batch of one partition in order, so it can fold counts
across batches and emit once at the end — partition-local aggregation
without RDDs. The Python-side tokenizer (`_py_tokens`) is the
bit-parity twin of the SQL `tokens_col` (tested in
test_text_dedup.py), and phase 2's SQL tokenizer decides the final
counts, so phase 1 only needs the superset property.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.text import _py_tokens, tokens_col


def heavy_hitter_candidates(
    docs: DataFrame,
    min_count: int,
    text_col: str = "text",
    _assumed_partitions: int | None = None,
) -> DataFrame:
    """Phase 1: terms whose count within ANY single partition reaches
    ceil(min_count / P). Output: term (distinct), no shuffle on the token
    stream. Superset of all terms with global count ≥ min_count — and the
    superset property is now *verified against the execution itself*, not
    assumed from a separate plan evaluation.

    Soundness needs P_assumed ≥ P_executed: over-assuming P only lowers
    the local threshold (wider superset — phase 2's exact recount kills
    the extras), while under-assuming could silently drop a true heavy
    hitter. The plan-time `getNumPartitions()` is a separate evaluation
    from the mapInPandas job that actually runs (AQE coalescing or a
    replan can change the executed partitioning), so this takes 2×
    plan-time headroom AND verifies: the kernel tags its output with
    `spark_partition_id()` computed in the same job and emits one marker
    row per non-empty partition; if the executed non-empty partition
    count exceeds the assumed bound, this raises RuntimeError instead of
    returning a possibly-incomplete candidate set. Loud failure, never a
    silently wrong answer. (`_assumed_partitions` exists so tests can
    force a violation.)
    """
    projected = docs.select(text_col)
    n_parts_assumed = (
        _assumed_partitions
        if _assumed_partitions is not None
        else 2 * max(1, projected.rdd.getNumPartitions())
    )
    local_threshold = math.ceil(min_count / n_parts_assumed)

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict[str, int] = {}
        pid = -1
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid__"].iloc[0])
            for text in pdf[text_col]:
                for tok in _py_tokens(text):
                    counts[tok] = counts.get(tok, 0) + 1
        if pid < 0:  # empty partition: no tokens, no marker needed
            yield pd.DataFrame(
                {"term": pd.Series(dtype=object), "pid": pd.Series(dtype="int32")}
            )
            return
        hits = [t for t, c in counts.items() if c >= local_threshold]
        # the trailing None row is this partition's marker
        yield pd.DataFrame({"term": hits + [None], "pid": pid})

    out = (
        projected.withColumn("__pid__", F.spark_partition_id())
        .mapInPandas(gen, "term string, pid int")
        .persist()
    )
    try:
        p_actual = out.agg(F.countDistinct("pid").alias("p")).first()["p"]
        if p_actual > n_parts_assumed:
            raise RuntimeError(
                f"heavy_hitter_candidates: job executed with {p_actual} non-empty "
                f"partitions but the pigeonhole threshold assumed ≤ "
                f"{n_parts_assumed}; the candidate set may miss true heavy "
                "hitters — re-run with a larger partition bound"
            )
        # cut lineage so the candidate set is not recomputed (phase 1 runs
        # exactly once) and the persist above can be released now
        cands = (
            out.filter(F.col("term").isNotNull())
            .select("term")
            .distinct()
            .localCheckpoint(eager=True)
        )
    finally:
        out.unpersist()
    return cands


# ---------------------------------------------------------------------------
# Cross-engine deterministic HyperLogLog (Flajolet et al., AMS 2007 §4;
# corrections from the original HLL paper — NOT HLL++ bias tables, which
# would be a 200-entry empirical constant block with nothing to verify
# against). Spark's own approx_count_distinct is HLL++ with an
# engine-private hash, so its estimates can never be oracle-checked;
# this implementation derives every bit from sha256 so DuckDB can
# reproduce the EXACT register state and estimate — an approximate
# algorithm with an exact cross-engine contract.
#
# Scale shape: per-row hashing is pure JVM expression work; the only
# shuffle is the register aggregate — partial max() per partition caps
# it at m=512 rows per map task regardless of input size. The register
# state is mergeable (max is associative/commutative), which is the
# whole point at 100 TB: distinct counts fold across partitions,
# files, and days without ever shuffling the raw keys.
# ---------------------------------------------------------------------------

HLL_P = 9  # register index bits
HLL_M = 1 << HLL_P  # 512 registers
HLL_W = 32 - HLL_P  # 23 suffix bits; rho in [1, 24]
#: alpha_m for m >= 128 (Flajolet et al. Fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def sha32_col(key, offset: int = 1):
    """Uniform 32-bit integer from 8 hex chars of sha256(key), starting
    at 1-based `offset`. Exact cross-engine: DuckDB mirrors with a
    strpos('0123456789abcdef', ...) fold over the same hex window —
    both engines emit lowercase hex, verified digit-for-digit."""
    k = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.sha2(k, 256), offset, 8), 16, 10).cast("long")


def hll_register_cols(key) -> tuple:
    """(register, rho) for one key: register = low p bits, rho = count of
    leading zeros in the 23-bit suffix + 1 (suffix 0 → w+1 = 24).

    bitlen(suffix) comes from length(conv(suffix, 10, 2)) — a STRING
    length, not floor(log2(x)), because log2 of an exact power of two is
    not guaranteed exactly representable post-libm and an off-by-one
    there silently halves/doubles a register's contribution. DuckDB
    mirror: length(format('{:b}', suffix))."""
    h = sha32_col(key)
    register = F.pmod(h, F.lit(HLL_M))
    suffix = F.shiftright(h, HLL_P)
    rho = F.when(suffix == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.conv(suffix, 10, 2))
    )
    return register, rho


def hll_distinct(df: DataFrame, key_col: str = "term") -> DataFrame:
    """One-row DataFrame: (hll_estimate double, n_zero_registers long,
    s_scaled long) — the HLL distinct-count estimate for `key_col`.

    The harmonic-mean denominator is held as an EXACT integer:
    S = Σ 2^(−maxrho) is accumulated as Σ 2^(24−maxrho) (maxrho ≤ 24 ⇒
    every term is an integer, total < m·2^24 ≪ 2^63), so the register
    fold is order-independent on both engines; floating point enters
    only in the final single division + the small-range ln branch.
    Small-range correction: E ≤ 2.5m with empty registers → linear
    counting m·ln(m/V)."""
    register, rho = hll_register_cols(key_col)
    regs = (
        df.select(register.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("maxrho"))
    )
    return hll_estimate_from_registers(regs)


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """Fold a (register, maxrho) register table into the one-row
    estimate frame — the reusable tail of `hll_distinct`, split out so
    composed sketches (per-group registers, element-wise-max unions)
    share the exact same estimate arithmetic bit-for-bit."""
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.coalesce(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - maxrho)")
            ),
            F.lit(0).cast("long"),
        ).alias("s_present"),  # empty register set (empty input) → pure
        # linear counting instead of a NULL estimate
    )
    v_zero = F.lit(HLL_M) - F.col("n_present")
    s_scaled = F.col("s_present") + v_zero.cast("long") * F.lit(1 << (HLL_W + 1)).cast(
        "long"
    )
    e_raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W + 1)))
        / s_scaled.cast("double")
    )
    estimate = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        estimate.alias("hll_estimate"),
        v_zero.cast("long").alias("n_zero_registers"),
        s_scaled.cast("long").alias("s_scaled"),
    )


def hll_intersection(
    df: DataFrame,
    key_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Approximate set-intersection cardinality between two groups' key
    sets via inclusion–exclusion over HLL registers:

        |A ∩ B| ≈ E(A) + E(B) − E(A ∪ B)

    The union sketch is the element-wise register MAX (the defining
    mergeability of HLL — Flajolet et al. 2007 §4), so one grouped
    register aggregate serves all three estimates; the shuffle is
    ≤ 2·512 register rows regardless of key cardinality. This is the
    cross-source overlap diagnostic of a dataset audit ("how much of
    src A's vocabulary/fingerprint set also appears in src B") at 100 TB
    — exact INTERSECT would shuffle both key sets.

    Returns one row: (est_a, est_b, est_union, est_intersection), the
    last clamped at 0 (I-E can go slightly negative on sketch error).
    Relative error grows with the disjoint mass: σ ≈ 1.04/√m on each
    term, so small true overlaps disappear into noise — the standard
    HLL inclusion–exclusion caveat, inherited deliberately.
    """
    register, rho = hll_register_cols(key_col)
    both = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("__g"), register.alias("register"), rho.alias("rho")
    )
    regs = both.groupBy("__g", "register").agg(F.max("rho").alias("maxrho"))
    ra = regs.filter(F.col("__g") == group_a).select("register", "maxrho")
    rb = regs.filter(F.col("__g") == group_b).select("register", "maxrho")
    ru = regs.groupBy("register").agg(F.max("maxrho").alias("maxrho"))
    ea = hll_estimate_from_registers(ra).select(
        F.col("hll_estimate").alias("est_a")
    )
    eb = hll_estimate_from_registers(rb).select(
        F.col("hll_estimate").alias("est_b")
    )
    eu = hll_estimate_from_registers(ru).select(
        F.col("hll_estimate").alias("est_union")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0.0),
                (F.col("est_a") + F.col("est_b")) - F.col("est_union"),
            ).alias("est_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-engine deterministic count–min sketch (Cormode & Muthukrishnan,
# J. Algorithms 2005). Same philosophy as the HLL above: the d=4 row
# hashes are disjoint 32-bit windows of sha256(key), so DuckDB rebuilds
# the identical (row, bucket) → count table and the identical min-over-
# rows estimates — approximate answers, exact contract.
#
# Scale shape: the sketch build is ONE aggregation whose output is at
# most d·w = 4096 cells (partial counts combine map-side; the shuffle
# is bounded by the sketch size per partition, never by the key
# cardinality) — the fixed-size summary a 100 TB token stream folds
# into. Estimation broadcasts the finished sketch against the probe
# set. Guarantee: estimate ≥ true count always; overshoot ≤ e/w·N with
# probability 1−e^−d.
# ---------------------------------------------------------------------------

CMS_W = 1024  # buckets per row
CMS_D = 4  # hash rows (disjoint sha256 windows)


def cms_bucket_cols(key) -> list:
    """The d bucket indices for one key: pmod of each 32-bit sha256
    window over the row's bucket count."""
    return [
        F.pmod(sha32_col(key, offset=1 + 8 * i), F.lit(CMS_W)) for i in range(CMS_D)
    ]


def cms_build(df: DataFrame, key_col: str = "term") -> DataFrame:
    """Build the sketch: (row, bucket, cnt) — one count per touched
    cell. Untouched cells are implicitly 0 (estimation coalesces)."""
    cells = df.select(
        F.posexplode(F.array(*cms_bucket_cols(key_col))).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_build_from_counts(
    counts: DataFrame, key_col: str = "term", count_col: str = "cnt"
) -> DataFrame:
    """Build the IDENTICAL sketch from pre-aggregated (key, count) rows
    (optimization round 16): a cell's count is the number of stream
    occurrences hashing to it ≡ the sum of the per-key counts of the
    keys hashing to it — exact integer equality, same bucket columns.
    A caller that already aggregated the token stream (e.g. for exact
    heavy-hitter probes) can derive the sketch from that one
    vocabulary-sized aggregate instead of re-exploding the corpus: the
    sketch-build input shrinks from occurrences to distinct keys and
    the extra corpus pass disappears."""
    cells = counts.select(
        F.col(count_col),
        F.posexplode(F.array(*cms_bucket_cols(key_col))).alias("row", "bucket"),
    )
    return (
        cells.groupBy("row", "bucket")
        .agg(F.sum(count_col).cast("long").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, key_col: str = "term") -> DataFrame:
    """Point-frequency estimates for each probe key: min over the d
    cells the key hashes to. Output: (key_col, cms_estimate long).

    The sketch side broadcasts (≤ d·w cells by construction) — probing
    never shuffles, so estimating frequencies for a candidate list at
    the end of a 100 TB pass is map-side work."""
    p = probes.select(
        key_col,
        F.posexplode(F.array(*cms_bucket_cols(key_col))).alias("row", "bucket"),
    )
    return (
        p.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_estimate"))
    )


def heavy_hitter_terms(
    docs: DataFrame, min_count: int, text_col: str = "text"
) -> DataFrame:
    """EXACT terms with global count ≥ min_count, via candidate pruning.

    Output: (term, term_count), the same rows `tokens → groupBy → HAVING`
    would produce — but only candidate tokens ever shuffle. Candidates
    broadcast (they number ≤ total_tokens/local_threshold per partition,
    i.e. bounded by construction, not by luck).

    Degenerate regime: when min_count ≤ the assumed partition bound the
    local threshold collapses to 1 and phase 1 would nominate every
    distinct term — pruning buys nothing. Fall back to the plain exact
    aggregate (map-side partial combine still applies).
    """
    tokens = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    n_parts_assumed = 2 * max(1, docs.select(text_col).rdd.getNumPartitions())
    if math.ceil(min_count / n_parts_assumed) <= 1:
        return (
            tokens.groupBy("term")
            .agg(F.count(F.lit(1)).alias("term_count"))
            .filter(F.col("term_count") >= F.lit(min_count))
        )
    cands = heavy_hitter_candidates(docs, min_count, text_col)
    return (
        tokens.join(F.broadcast(cands), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .filter(F.col("term_count") >= F.lit(min_count))
    )


# ---------------------------------------------------------------------------
# Deterministic histogram quantile sketch — the third of the engine's
# mergeable summaries (HLL = distinct, CMS = frequency, histogram =
# quantiles). Spark's approx_percentile (KLL-ish) and t-digest designs
# are randomized or merge-order-dependent; a fixed-bounds equi-width
# histogram is the deterministic alternative: bucket counts are exact
# integers, mergeable by addition in any order, and the quantile
# estimate interpolates inside one bucket — error bounded by bucket
# width, cross-engine reproducible to the last bit.
#
# Scale shape: one pass, map-side partial counts, shuffle ≤ `bins` rows
# per partition; the quantile extraction runs over the ≤ `bins`-row
# sketch (driver-scale). With data-derived bounds a cheap min/max agg
# runs first (broadcast back as a one-row join); pass explicit bounds
# to stay single-pass.
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    bins: int = 256,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """(bucket, cnt, lo, hi) — equi-width bucket counts of `value_col`
    over [lo, hi] (data-derived when not given; values outside clamp to
    the edge buckets, so merged sketches with common fixed bounds stay
    consistent). NULL values are dropped (SQL aggregate convention)."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        bounds = df.agg(
            F.min(v).alias("__lo__"), F.max(v).alias("__hi__")
        )
        src = df.join(F.broadcast(bounds))
        lo_c, hi_c = F.col("__lo__"), F.col("__hi__")
    else:
        src = df
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    raw = F.floor((v - lo_c) / (hi_c - lo_c) * F.lit(float(bins)))
    bucket = F.when(hi_c == lo_c, F.lit(0)).otherwise(
        F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    )
    return (
        src.filter(v.isNotNull())
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(lo_c).alias("lo"),
            F.min(hi_c).alias("hi"),
        )
    )


def histogram_quantiles(
    sketch: DataFrame, qs: "list[float]", bins: int = 256
) -> DataFrame:
    """(q, est) — quantile estimates from a histogram sketch: walk the
    cumulative counts to the bucket containing rank q·n, interpolate
    linearly inside it. est is exact to within one bucket width; the
    arithmetic (double mul/div in a fixed order) is engine-portable."""
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bucket", "cnt", "lo", "hi",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    qdf = cum.crossJoin(
        F.broadcast(
            cum.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
        )
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    target = F.col("q") * F.col("n").cast("double")
    hit = qdf.filter(
        (F.col("cum").cast("double") >= target)
        & ((F.col("cum") - F.col("cnt")).cast("double") < target)
    )
    est = F.col("lo") + (
        F.col("bucket").cast("double")
        + (target - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
    ) * width
    return hit.select("q", est.alias("est"), F.col("n").cast("long").alias("n"))
