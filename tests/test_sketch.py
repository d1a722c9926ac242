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


# ---------------------------------------------------------------------------
# HyperLogLog (cross-engine deterministic; operators/sketch.py)
# ---------------------------------------------------------------------------

from aeuc_vector_db_spark.operators.sketch import (  # noqa: E402
    HLL_M,
    cms_build,
    cms_estimate,
    hll_distinct,
)


def _hll_row(df):
    return hll_distinct(df, "k").first()


def test_hll_estimate_within_expected_error(spark):
    """Standard error for m=512 is 1.04/sqrt(512) ≈ 4.6%; assert a 3-σ
    band (±14%) at n=5000 — flakiness-free because the hash (and hence
    the estimate) is fully deterministic for a fixed key set."""
    df = spark.range(5000).select(F.concat(F.lit("key-"), F.col("id")).alias("k"))
    est = _hll_row(df)["hll_estimate"]
    assert abs(est - 5000) / 5000 < 0.14


def test_hll_ignores_duplicates(spark):
    """The estimate is a pure function of the distinct key set: register
    maxima are idempotent under re-insertion."""
    base = spark.range(800).select(F.concat(F.lit("d-"), F.col("id")).alias("k"))
    dup = base.union(base).union(base)
    assert _hll_row(base) == _hll_row(dup)


def test_hll_small_range_linear_counting(spark):
    """n ≪ m lands in the linear-counting branch, which is near-exact
    for tiny cardinalities (collisions over 512 registers are rare at
    n=20 — and deterministically absent-or-present, never flaky)."""
    df = spark.range(20).select(F.concat(F.lit("s-"), F.col("id")).alias("k"))
    row = _hll_row(df)
    assert row["n_zero_registers"] > 0
    assert abs(row["hll_estimate"] - 20) <= 2


def test_hll_register_state_merges(spark):
    """The register aggregate must be mergeable: the estimate of A ∪ B
    equals the estimate computed from element-wise max of A's and B's
    register vectors — the property that lets 100 TB fold per-partition
    / per-day sketches without re-reading data."""
    from aeuc_vector_db_spark.operators.sketch import hll_register_cols

    a = spark.range(0, 1500).select(F.concat(F.lit("m-"), F.col("id")).alias("k"))
    b = spark.range(1000, 2500).select(F.concat(F.lit("m-"), F.col("id")).alias("k"))
    union_row = _hll_row(a.union(b))

    def regs(df):
        register, rho = hll_register_cols("k")
        return (
            df.select(register.alias("register"), rho.alias("rho"))
            .groupBy("register")
            .agg(F.max("rho").alias("maxrho"))
        )

    merged = (
        regs(a)
        .union(regs(b))
        .groupBy("register")
        .agg(F.max("maxrho").alias("rho"))
        .select("register", "rho")
    )
    # merging means: recompute the estimate from the merged register table
    from aeuc_vector_db_spark.operators import sketch as SK

    agg = merged.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 24 - rho)")).alias("s_present"),
    ).first()
    v_zero = SK.HLL_M - agg["n_present"]
    s_scaled = agg["s_present"] + v_zero * (1 << 24)
    e_raw = SK.HLL_ALPHA * SK.HLL_M * SK.HLL_M * float(1 << 24) / s_scaled
    if e_raw <= 2.5 * SK.HLL_M and v_zero > 0:
        import math

        est = SK.HLL_M * math.log(SK.HLL_M / v_zero)
    else:
        est = e_raw
    assert abs(est - union_row["hll_estimate"]) < 1e-6
    assert s_scaled == union_row["s_scaled"]


def test_hll_partitioning_invariance(spark):
    """max() is order- and partitioning-independent and the denominator
    is exact integer arithmetic — the estimate must be bit-identical
    under any layout."""
    df = spark.range(3000).select(F.concat(F.lit("p-"), F.col("id")).alias("k"))
    rows = {tuple(_hll_row(df.repartition(n))) for n in (1, 7, 32)}
    assert len(rows) == 1


# ---------------------------------------------------------------------------
# Count–min sketch (cross-engine deterministic)
# ---------------------------------------------------------------------------


def _cms_pair(spark, rows):
    df = spark.createDataFrame([(k,) for k in rows], "k string")
    sketch = cms_build(df, "k")
    probes = df.select("k").distinct()
    return df, sketch, probes


def test_cms_never_underestimates(spark):
    rows = [f"t{i % 37}" for i in range(1000)] + ["hot"] * 500
    df, sketch, probes = _cms_pair(spark, rows)
    exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    for r in cms_estimate(sketch, probes, "k").collect():
        assert r["cms_estimate"] >= exact[r["k"]], r


def test_cms_exact_when_no_collisions(spark):
    """37 distinct keys over 4 rows of 1024 buckets: verify the estimate
    equals the exact count whenever the key's min-cell holds only that
    key — and that 'hot' (the deliberately skewed key) is exact, since a
    collision in all 4 of its cells is astronomically unlikely and, with
    this fixed key set, deterministically absent (asserted, not hoped)."""
    rows = [f"t{i % 37}" for i in range(1000)] + ["hot"] * 500
    df, sketch, probes = _cms_pair(spark, rows)
    got = {r["k"]: r["cms_estimate"] for r in cms_estimate(sketch, probes, "k").collect()}
    assert got["hot"] == 500


def test_cms_absent_key_and_determinism(spark):
    rows = ["a"] * 10 + ["b"] * 3
    df, sketch, _ = _cms_pair(spark, rows)
    probes = spark.createDataFrame([("never-seen-key",)], "k string")
    est = cms_estimate(sketch, probes, "k").first()["cms_estimate"]
    # absent key: min over its 4 cells — each either 0 (missing) or a
    # collision count; with 2 keys and 4096 cells it is deterministically 0
    assert est == 0
    # partitioning invariance of the whole sketch table
    s1 = sorted(map(tuple, cms_build(df.repartition(1), "k").collect()))
    s8 = sorted(map(tuple, cms_build(df.repartition(8), "k").collect()))
    assert s1 == s8


def test_cms_probe_side_broadcasts_sketch(spark):
    rows = ["a"] * 10
    df, sketch, probes = _cms_pair(spark, rows)
    plan = (
        cms_estimate(sketch, probes, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Histogram quantile sketch (cross-engine deterministic)
# ---------------------------------------------------------------------------

from aeuc_vector_db_spark.operators.sketch import (  # noqa: E402
    histogram_quantiles,
    histogram_sketch,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_histogram_quantiles_within_bucket_width(spark):
    import numpy as np

    xs = [((i * 37) % 1000) / 3.0 for i in range(1000)]
    df = _vals(spark, xs)
    sk = histogram_sketch(df, "v", bins=256)
    got = {r["q"]: r["est"] for r in histogram_quantiles(sk, [0.25, 0.5, 0.9]).collect()}
    lo, hi = min(xs), max(xs)
    width = (hi - lo) / 256
    for q in (0.25, 0.5, 0.9):
        exact = float(np.quantile(np.array(xs), q))
        assert abs(got[q] - exact) <= 2 * width, (q, got[q], exact)


def test_histogram_sketch_merges_by_addition(spark):
    """With common FIXED bounds, bucket counts from disjoint shards sum
    to the union's sketch — the mergeability contract (any order)."""
    a = _vals(spark, range(0, 500))
    b = _vals(spark, range(500, 1000))
    u = _vals(spark, range(0, 1000))
    kw = dict(bins=64, lo=0.0, hi=999.0)
    su = {(r["bucket"]): r["cnt"] for r in histogram_sketch(u, "v", **kw).collect()}
    sa = {(r["bucket"]): r["cnt"] for r in histogram_sketch(a, "v", **kw).collect()}
    sb = {(r["bucket"]): r["cnt"] for r in histogram_sketch(b, "v", **kw).collect()}
    merged = {k: sa.get(k, 0) + sb.get(k, 0) for k in set(sa) | set(sb)}
    assert merged == su


def test_histogram_sketch_clamps_out_of_bounds(spark):
    df = _vals(spark, [-100.0, 0.0, 5.0, 10.0, 999.0])
    sk = {r["bucket"]: r["cnt"] for r in
          histogram_sketch(df, "v", bins=10, lo=0.0, hi=10.0).collect()}
    assert sk[0] == 2  # -100 clamps down, 0.0 lands naturally
    assert sk[9] == 2  # 10.0 (== hi) and 999 clamp up
    assert sum(sk.values()) == 5


def test_histogram_sketch_degenerate_and_nulls(spark):
    df = spark.createDataFrame([(5.0,), (5.0,), (None,)], "v double")
    rows = histogram_sketch(df, "v", bins=16).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["cnt"] == 2
    est = histogram_quantiles(histogram_sketch(df, "v", bins=16), [0.5]).first()
    assert est["est"] == 5.0 and est["n"] == 2


def test_histogram_sketch_partitioning_invariance(spark):
    xs = [((i * 17) % 321) / 7.0 for i in range(2000)]
    outs = []
    for n_parts in (1, 16):
        df = _vals(spark, xs).repartition(n_parts)
        q = histogram_quantiles(histogram_sketch(df, "v", bins=128), [0.1, 0.5, 0.99])
        outs.append(sorted(map(tuple, q.collect())))
    assert outs[0] == outs[1]


def test_histogram_sketch_validates_bins(spark):
    import pytest

    with pytest.raises(ValueError, match="bins"):
        histogram_sketch(_vals(spark, [1.0]), "v", bins=0)


def test_hll_intersection_inclusion_exclusion(spark):
    """Known overlap: A = k0..k9999, B = k5000..k14999 → |A∩B| = 5000.
    Each HLL term carries ~4.6% σ at m=512; the I-E estimate compounds
    three of them, so a generous ±1500 band still catches any structural
    bug (wrong union merge, wrong clamp, group leakage)."""
    from aeuc_vector_db_spark.operators.sketch import hll_intersection

    a = spark.range(10_000).select(
        F.lit("a").alias("g"), F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    b = spark.range(5_000, 15_000).select(
        F.lit("b").alias("g"), F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    row = hll_intersection(a.unionByName(b), "k", "g", "a", "b").first()
    assert abs(row["est_intersection"] - 5000) < 1500
    assert abs(row["est_a"] - 10_000) < 1500 and abs(row["est_b"] - 10_000) < 1500
    assert abs(row["est_union"] - 15_000) < 2000


def test_hll_intersection_union_is_register_max(spark):
    """The union estimate must be BIT-IDENTICAL to hll_distinct over the
    concatenated key stream — element-wise register max is exactly the
    sketch of the union, not an approximation of it."""
    from aeuc_vector_db_spark.operators.sketch import (
        hll_distinct,
        hll_intersection,
    )

    a = spark.range(3_000).select(
        F.lit("a").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("k")
    )
    b = spark.range(1_500, 4_500).select(
        F.lit("b").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("k")
    )
    both = a.unionByName(b)
    est_u = hll_intersection(both, "k", "g", "a", "b").first()["est_union"]
    direct = hll_distinct(both.select("k"), "k").first()["hll_estimate"]
    assert est_u == direct


def test_hll_intersection_identical_and_disjoint_groups(spark):
    from aeuc_vector_db_spark.operators.sketch import hll_intersection

    base = spark.range(2_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    same = base.select(F.lit("a").alias("g"), "k").unionByName(
        base.select(F.lit("b").alias("g"), "k")
    )
    r = hll_intersection(same, "k", "g", "a", "b").first()
    # identical groups: union sketch == each group's sketch, so the
    # I-E arithmetic collapses exactly to est_a
    assert r["est_union"] == r["est_a"] == r["est_b"]
    assert r["est_intersection"] == r["est_a"]
    disj = spark.range(2_000).select(
        F.lit("a").alias("g"), F.concat(F.lit("p"), F.col("id")).alias("k")
    ).unionByName(
        spark.range(2_000).select(
            F.lit("b").alias("g"), F.concat(F.lit("q"), F.col("id")).alias("k")
        )
    )
    r2 = hll_intersection(disj, "k", "g", "a", "b").first()
    assert r2["est_intersection"] < 400  # sketch noise only, clamped >= 0


def test_hll_intersection_empty_group(spark):
    from aeuc_vector_db_spark.operators.sketch import hll_intersection

    a_only = spark.range(100).select(
        F.lit("a").alias("g"), F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    r = hll_intersection(a_only, "k", "g", "a", "b").first()
    assert r["est_b"] == 0.0 and r["est_intersection"] == 0.0
