"""Tests for the training-data curation operators (operators/curation.py):
decontamination, stratified sampling, PII scrubbing, sequence packing,
int8 quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators import curation as CU


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------

def test_contaminated_docs_counts_shared_shingles(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence entirely here now"),
            (3, "quick brown fox appears again in this text"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("benchmark says the quick brown fox jumps high",)], "text string"
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in CU.contaminated_docs(corpus, bench, shingle_n=3).collect()
    }
    # doc 1 shares "the quick brown", "quick brown fox", "quick brown fox
    # jumps" → 3 trigram hashes; doc 3 shares only "quick brown fox"
    assert hits[1] == 3
    assert hits[3] == 1
    assert 2 not in hits


def test_contaminated_docs_min_overlap_filters(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("zzz alpha beta gamma zzz",)], "text string")
    out = CU.contaminated_docs(corpus, bench, shingle_n=3, min_overlap=2)
    assert out.count() == 0  # each doc shares exactly one trigram


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def strat_df(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_deterministic(strat_df):
    a = sorted(r["doc_id"] for r in CU.stratified_sample(strat_df, {"en": 0.5, "de": 0.2}).collect())
    b = sorted(r["doc_id"] for r in CU.stratified_sample(strat_df, {"en": 0.5, "de": 0.2}).collect())
    assert a == b and len(a) > 0


def test_stratified_sample_default_rate_excludes(strat_df):
    out = CU.stratified_sample(strat_df, {"en": 1.0})
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}  # de/zh fall to default_rate=0.0
    assert out.count() == 100  # rate 1.0 keeps every en row


def test_stratified_sample_salt_changes_draw(strat_df):
    a = {r["doc_id"] for r in CU.stratified_sample(strat_df, {"en": 0.3}, salt=0).collect()}
    b = {r["doc_id"] for r in CU.stratified_sample(strat_df, {"en": 0.3}, salt=1).collect()}
    assert a != b  # a fresh salt draws a fresh sample


def test_stratified_sample_rate_roughly_holds(strat_df):
    n = CU.stratified_sample(strat_df, {"en": 0.5, "de": 0.5, "zh": 0.5}).count()
    assert 100 <= n <= 200  # 0.5 of 300 with hash noise


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

def test_scrub_pii_email_and_phone(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.smith+spam@corp.example.org for info"),
            (2, "call +1 (555) 010-4242 tonight"),
            (3, "no pii here at all"),
            (4, "both bob@x.io and +44 20 7946 0958 appear"),
            (5, "dial 555-010-4242 now"),
            (6, "or (555) 010-4242 works too"),
            (7, "account 5550104242 and date 2024-08-13 are not phones"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.scrub_pii(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 0
    assert "<EMAIL>" in out[1]["text_scrubbed"]
    assert "alice" not in out[1]["text_scrubbed"]
    assert out[2]["n_phones"] == 1 and "<PHONE>" in out[2]["text_scrubbed"]
    assert out[3]["n_emails"] == 0 and out[3]["n_phones"] == 0
    assert out[3]["text_scrubbed"] == "no pii here at all"
    assert out[4]["n_emails"] == 1 and out[4]["n_phones"] == 1
    assert "<EMAIL>" in out[4]["text_scrubbed"] and "<PHONE>" in out[4]["text_scrubbed"]
    # separator-grouped local formats (PHONE_RE's second alternative)
    assert out[5]["n_phones"] == 1 and "4242" not in out[5]["text_scrubbed"]
    assert out[6]["n_phones"] == 1 and "<PHONE>" in out[6]["text_scrubbed"]
    # documented non-matches: bare digit runs and date-like strings
    assert out[7]["n_phones"] == 0 and out[7]["text_scrubbed"] == out[7]["text"]


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_chunk_assignment(spark):
    # en stream in doc_id order: 60, 60, 60 tokens with budget 100:
    # offsets 0, 60, 120 → chunks 0, 0, 1
    rows = [
        (1, "en", "w " * 60),
        (2, "en", "w " * 60),
        (3, "en", "w " * 60),
        (4, "de", "w " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r["doc_id"]: (r["stream_offset"], r["chunk_id"])
        for r in CU.pack_sequences(df, budget_tokens=100).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (60, 0)
    assert out[3] == (120, 1)
    assert out[4] == (0, 0)  # de is its own stream


def test_pack_sequences_order_is_explicit_not_partition_luck(spark):
    rows = [(i, "en", "tok " * 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = {r["doc_id"]: r["chunk_id"] for r in CU.pack_sequences(df, 64).collect()}
    b = {
        r["doc_id"]: r["chunk_id"]
        for r in CU.pack_sequences(df.repartition(7), 64).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

def test_quantize_int8_known_values(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5, 0.0])], "vec_id long, embedding array<double>"
    )
    row = CU.quantize_int8(df).collect()[0]
    assert row["q_scale"] == pytest.approx(1.0 / 127.0)
    # x/scale = 127, -127, 63.5, 0 → half-up: 127, -127, 64, 0
    assert row["q_vec"] == [127, -127, 64, 0]


def test_quantize_int8_zero_vector_total(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    row = CU.quantize_int8(df).collect()[0]
    assert row["q_scale"] == 1.0
    assert row["q_vec"] == [0, 0, 0]


def test_quantize_roundtrip_error_bounded(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-3, 3) for _ in range(16)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = CU.quantize_int8(df)
    err = q.select(
        "q_scale",
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                CU.dequantize_col("q_vec", "q_scale"),
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0.0),
            lambda s, x: F.greatest(s, x),
        ).alias("max_err"),
    )
    bad = err.filter(F.col("max_err") > F.col("q_scale") * 0.5 + 1e-12)
    assert bad.count() == 0  # reconstruction error ≤ scale/2 per element


# ---------------------------------------------------------------------------
# PCA projection
# ---------------------------------------------------------------------------

def test_pca_project_shape_variance_energy(spark):
    import random

    rng = random.Random(11)
    # anisotropic data: first dims carry most variance
    rows = [
        (i, [rng.gauss(0, 10), rng.gauss(0, 5)] + [rng.gauss(0, 0.5) for _ in range(6)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, var = CU.pca_project(df, k=3)
    assert len(var) == 3
    assert all(var[i] >= var[i + 1] for i in range(2))  # non-increasing
    assert sum(var) > 0.9  # two dominant axes out of 8 → top-3 capture most
    sample = out.limit(5).collect()
    assert all(len(r["pca"]) == 3 for r in sample)
    # projection is an isometry onto a subspace: |proj(x)| <= |x| (+centering slack)
    from pyspark.sql import functions as FF
    sq = lambda c: FF.aggregate(c, FF.lit(0.0), lambda s, x: s + x * x)
    bad = out.filter(
        sq(FF.col("pca")) > sq(FF.col("embedding").cast("array<double>")) * 1.5 + 1e-6
    )
    assert bad.count() == 0


def test_project_components_matches_numpy_and_stays_mapside(spark):
    """project_components (the PCA apply path): values equal a NumPy
    matmul to 1e-9, the plan has no Exchange and no Python eval (pure
    codegen HOF folds), and literal_components entries are exact
    dyadics (n/8) so any engine can reconstruct them bit-for-bit."""
    import numpy as np

    rows = [(i, [float((i * 5 + j * 7) % 13) / 3.0 for j in range(6)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps = CU.literal_components(3, 6)
    assert all(x * 8 == int(x * 8) for row in comps for x in row)
    out = CU.project_components(df, comps, out_col="proj")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    got = {r["vec_id"]: r["proj"] for r in out.collect()}
    W = np.array(comps)
    for i, emb in rows:
        np.testing.assert_allclose(got[i], W @ np.array(emb), atol=1e-9)


def test_pca_project_refit_deterministic(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(6)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, v1 = CU.pca_project(df, k=2)
    _, v2 = CU.pca_project(df, k=2)
    assert v1 == v2


def test_stratified_sample_threshold_matches_python_rounding(strat_df):
    """rate 0.043: double math gives 429.99…994 — truncation would keep
    bucket<429 while exact rounding keeps bucket<430. The operator must
    use the Python-rounded integer threshold (430) so the sampled set
    matches a driver-side recomputation exactly."""
    from aeuc_vector_db_spark.operators.text import _py_polyhash

    got = {r["doc_id"] for r in CU.stratified_sample(strat_df, {"en": 0.043}).collect()}
    expected = {
        i for i in range(300) if i % 3 == 0  # en stratum
        and ((_py_polyhash(f"0:{i}") * CU.SAMPLE_SPREAD) % 4294967296) % 10000
        < round(0.043 * 10000)
    }
    assert got == expected


def test_contaminated_docs_null_text_is_harmless(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("alpha beta gamma",)], "text string")
    hits = {r["doc_id"]: r["n_hits"] for r in CU.contaminated_docs(corpus, bench).collect()}
    assert hits == {1: 1}  # null-text row contributes nothing, crashes nothing


# ---------------------------------------------------------------------------
# Repetition ratio + source rebalancing
# ---------------------------------------------------------------------------

def test_repetition_ratio_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # bigrams: ab,ba,ab,ba,ab → 5 total, 2 distinct
            (2, "w x y z"),            # 3 distinct of 3 → 0.0
            (3, "single"),             # no bigrams → 0.0
            (4, None),                 # null text → 0.0, no crash
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", F.round(CU.repetition_ratio_col("text", 2), 6).alias("r")
        ).collect()
    }
    assert out[1] == pytest.approx(1 - 2 / 5)
    assert out[2] == 0.0
    assert out[3] == 0.0
    assert out[4] == 0.0


def test_rebalance_thresholds_math():
    counts = {"en": 218, "de": 70, "fr": 64, "es": 73, "zh": 75}
    target = {"en": 0.3, "de": 0.2, "fr": 0.2, "es": 0.2, "zh": 0.1}
    thrs = CU.rebalance_thresholds(counts, target)
    # fr binds: B = 64/0.2 = 320 → fr keeps everything
    assert thrs["fr"] == 10000
    import math
    assert thrs["en"] == math.floor(((0.3 * 320.0) / 218.0) * 10000)
    # absent from target → excluded
    assert CU.rebalance_thresholds({"a": 10, "b": 5}, {"a": 1.0})["b"] == 0


def test_source_rebalance_respects_mix(spark):
    rows = [(i, ["en", "en", "en", "de"][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = CU.source_rebalance(df, {"en": 0.5, "de": 0.5}, stratum_col="lang")
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    # de binds (100 rows / 0.5 share = 200 budget): de keeps all 100,
    # en samples 100/300 — hash noise allowed
    assert by["de"] == 100
    assert 70 <= by["en"] <= 130


def test_repetition_ratio_arrow_twin_bit_parity(spark):
    texts = [
        (1, "a b a b a b c d e a b"),
        (2, "x " * 30),
        (3, "one two three four five six"),
        (4, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    sql_v = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", CU.repetition_ratio_col("text", 2).alias("r")
        ).collect()
    }
    arrow_v = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", CU.repetition_ratio_pandas(2)(F.col("text")).alias("r")
        ).collect()
    }
    assert sql_v == arrow_v  # bit-identical, not approx


def test_quantized_storage_roundtrip_size_and_recall(spark, tmp_path):
    """The point of int8 quantization is storage: the quantized corpus
    parquet must be materially smaller than the float64 original, and
    top-10 cosine search on the DEQUANTIZED vectors must agree with
    exact search on the originals for nearly all of the top-k (planted
    well-separated vectors; int8 error is ~scale/2 per element)."""
    import os
    import random

    from aeuc_vector_db_spark.operators.search import knn_search_batch

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    orig_path = str(tmp_path / "orig")
    q_path = str(tmp_path / "quant")
    df.write.parquet(orig_path)
    CU.quantize_int8(df).select("vec_id", "q_scale", "q_vec").write.parquet(q_path)

    def tree_size(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p) for f in fs
        )

    assert tree_size(q_path) < tree_size(orig_path) * 0.5  # ≥2× smaller on disk

    deq = (
        spark.read.parquet(q_path)
        .select("vec_id", CU.dequantize_col("q_vec", "q_scale").alias("embedding"))
    )
    queries = df.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    exact = knn_search_batch(df, queries, top_k=10)
    approx = knn_search_batch(deq, queries, top_k=10)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    overlap = len(e & a) / len(e)
    assert overlap >= 0.9  # int8 error may swap near-ties, not the set


def test_rebalance_null_stratum_is_excluded_not_crash(spark):
    rows = [(i, "en" if i % 2 == 0 else None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = CU.source_rebalance(df, {"en": 1.0}, stratum_col="lang")
    got = out.collect()
    assert all(r["lang"] == "en" for r in got)
    assert len(got) == 20  # binding stratum keeps everything; nulls excluded


def test_rebalance_binding_stratum_never_floors_below_full():
    """The binding stratum's rate is mathematically 1.0 but the IEEE
    round trip can land at 9999.999…; flooring would drop rows from
    exactly the stratum the budget protects. Sweep adversarial
    (count, share) pairs: the binding threshold must be exactly 10000."""
    for count in (1, 3, 7, 13, 218):
        for share in (0.013, 0.1, 0.3, 0.7, 1.0):
            thrs = CU.rebalance_thresholds({"only": count}, {"only": share})
            assert thrs["only"] == 10000, (count, share, thrs)


def test_epoch_shuffle_deterministic_and_seed_sensitive(documents):
    order1 = [r["doc_id"] for r in CU.epoch_shuffle(documents, seed=1).select("doc_id").collect()]
    order1b = [r["doc_id"] for r in CU.epoch_shuffle(documents, seed=1).select("doc_id").collect()]
    order2 = [r["doc_id"] for r in CU.epoch_shuffle(documents, seed=2).select("doc_id").collect()]
    assert order1 == order1b  # reproducible
    assert sorted(order1) == sorted(order2)  # permutations of the same set
    assert order1 != order2  # different epochs decorrelate
    assert order1 != sorted(order1)  # actually shuffled, not id order


def test_epoch_shuffle_stable_under_repartitioning(documents):
    base = [r["doc_id"] for r in CU.epoch_shuffle(documents, seed=3).select("doc_id").collect()]
    re = [
        r["doc_id"]
        for r in CU.epoch_shuffle(documents.repartition(7), seed=3).select("doc_id").collect()
    ]
    assert base == re


def test_source_token_budget_prefix_semantics(documents):
    budget = 600
    kept = CU.source_token_budget(documents, budget_tokens=budget, seed=0)
    rows = kept.select("source", "doc_id", "n_tokens", "budget_offset").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    full = {
        (r["source"], r["doc_id"])
        for r in CU.source_token_budget(documents, budget_tokens=1 << 40, seed=0)
        .select("source", "doc_id")
        .collect()
    }
    for src, members in by_src.items():
        # every kept doc's prior-tokens offset is under budget…
        assert all(m["budget_offset"] < budget for m in members)
        # …and the selection is maximal: total kept tokens reach the budget
        # (the doc that crosses it is included, everything after is cut)
        assert sum(m["n_tokens"] for m in members) + min(
            m["budget_offset"] for m in members
        ) >= 0  # offsets well-formed
        assert max(m["budget_offset"] + m["n_tokens"] for m in members) >= budget or (
            # stratum smaller than the budget: everything kept
            len([f for f in full if f[0] == src]) == len(members)
        )


def test_source_token_budget_deterministic(documents):
    a = {
        (r["source"], r["doc_id"])
        for r in CU.source_token_budget(documents, 600, seed=0).select("source", "doc_id").collect()
    }
    b = {
        (r["source"], r["doc_id"])
        for r in CU.source_token_budget(
            documents.repartition(11), 600, seed=0
        ).select("source", "doc_id").collect()
    }
    assert a == b and len(a) > 0


def test_leakproof_split_no_pair_straddles(spark):
    """THE invariant: no near-dup pair may cross the train/val boundary
    — and singletons split independently (the split key is the cluster,
    not the doc)."""
    from aeuc_vector_db_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(60)], "doc_id long, text string"
    )
    # chain clusters {0..4}, {10,11}, plus singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    out = CU.leakproof_split(docs, pairs, val_threshold=5000)
    rows = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    # every clustered doc carries its component minimum and ONE split
    assert {rows[i] for i in range(5)} == {(0, rows[0][1])}
    assert {rows[i] for i in (10, 11)} == {(10, rows[10][1])}
    # singletons are their own cluster
    assert rows[20] == (20, rows[20][1])
    # invariant: zero pairs straddle
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]:
        assert rows[a][1] == rows[b][1]
    # both splits are populated at a 50% threshold on 50+ singletons
    splits = {s for _, s in rows.values()}
    assert splits == {"train", "val"}
    # deterministic: same salt reproduces, different salt redraws
    again = {r["doc_id"]: r["split"] for r in CU.leakproof_split(
        docs, pairs, val_threshold=5000).collect()}
    assert again == {k: s for k, (_, s) in rows.items()}
    other = {r["doc_id"]: r["split"] for r in CU.leakproof_split(
        docs, pairs, val_threshold=5000, salt=1).collect()}
    assert other != again


def test_curriculum_order_bands_and_intra_band_shuffle(spark):
    """Length-curriculum invariants: band edges are monotone (every doc
    in band i is <= every doc in band i+1 up to equi-width rounding —
    checked via per-band min/max spans not overlapping), NULL scores go
    to the trailing band, hard_first reverses the band index, and the
    intra-band order is salt-deterministic."""
    from aeuc_vector_db_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(300)] + [(900, None)],
        "doc_id long, n_chars long",
    )
    out = CU.curriculum_order(docs, "n_chars", n_buckets=4).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3, 4}  # 4 bands + NULL band
    assert [r["doc_id"] for r in by_bucket[4]] == [900]
    spans = {
        b: (min(r["n_chars"] for r in rows), max(r["n_chars"] for r in rows))
        for b, rows in by_bucket.items() if b < 4
    }
    for b in range(3):
        assert spans[b][1] <= spans[b + 1][0]
    # hard_first flips the band index (real bands only)
    flipped = {
        r["doc_id"]: r["bucket"]
        for r in CU.curriculum_order(
            docs, "n_chars", n_buckets=4, hard_first=True
        ).collect()
    }
    for r in out:
        if r["bucket"] < 4:
            assert flipped[r["doc_id"]] == 3 - r["bucket"]
    # same salt reproduces the shuffle keys; another salt redraws them
    again = {r["doc_id"]: r["shuffle_key"]
             for r in CU.curriculum_order(docs, "n_chars", n_buckets=4).collect()}
    assert again == {r["doc_id"]: r["shuffle_key"] for r in out}
    other = {r["doc_id"]: r["shuffle_key"]
             for r in CU.curriculum_order(docs, "n_chars", n_buckets=4,
                                          salt=9).collect()}
    assert other != again
    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        CU.curriculum_order(docs, "n_chars", n_buckets=0)


def test_leakproof_kfold_no_pair_straddles_any_fold(spark):
    """K-fold generalization of the split invariant: every near-dup
    pair shares a fold; folds cover [0, k); assignment is cluster-keyed,
    deterministic under the same salt, redrawn under another."""
    from aeuc_vector_db_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    out = CU.leakproof_kfold(docs, pairs, k=4)
    rows = {r["doc_id"]: (r["cluster_id"], r["fold"]) for r in out.collect()}
    assert {rows[i] for i in range(5)} == {(0, rows[0][1])}
    assert rows[10][1] == rows[11][1]
    folds = {f for _, f in rows.values()}
    assert folds == {0, 1, 2, 3}  # 195 singleton clusters populate all 4
    again = {r["doc_id"]: r["fold"] for r in
             CU.leakproof_kfold(docs, pairs, k=4).collect()}
    assert again == {d: f for d, (_, f) in rows.items()}
    other = {r["doc_id"]: r["fold"] for r in
             CU.leakproof_kfold(docs, pairs, k=4, salt=3).collect()}
    assert other != again
    import pytest

    with pytest.raises(ValueError, match="k must"):
        CU.leakproof_kfold(docs, pairs, k=1)


# ---------------------------------------------------------------------------
# Data-quality operators (round 7)
# ---------------------------------------------------------------------------

def test_referential_violations_hand_computed(spark):
    from aeuc_vector_db_spark.operators.curation import referential_violations

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (99,), (98,), (None,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_violations(child, parent, "fk", "pk").first()
    assert row["n_orphans"] == 2  # 99 and 98 (each once)
    assert row["n_null_keys"] == 2
    assert row["orphan_key_sample"] == "98,99"  # smallest-first, stable


def test_referential_violations_clean_and_plan(spark):
    from aeuc_vector_db_spark.operators.curation import referential_violations

    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    df = referential_violations(child, parent, "fk", "pk")
    row = df.first()
    assert (row["n_orphans"], row["n_null_keys"]) == (0, 0)
    assert row["orphan_key_sample"] == ""
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan  # set difference, no materialization


def test_histogram_drift_identical_and_disjoint(spark):
    from aeuc_vector_db_spark.operators.curation import histogram_drift

    a = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    same = histogram_drift(a, a, "v", bins=32).first()
    assert same["tvd"] == 0.0 and same["n_a"] == same["n_b"] == 100
    b = spark.createDataFrame([(float(i + 1000),) for i in range(50)], "v double")
    # disjoint supports with common derived bounds → TVD = 1
    far = histogram_drift(a, b, "v", bins=32).first()
    assert far["tvd"] == 1.0 and far["n_b"] == 50


def test_histogram_drift_partitioning_invariance_and_bounds(spark):
    from aeuc_vector_db_spark.operators.curation import histogram_drift

    rows_a = [(float((i * 13) % 97),) for i in range(500)]
    rows_b = [(float((i * 29) % 97),) for i in range(300)]
    vals = []
    for n_parts in (1, 16):
        a = spark.createDataFrame(rows_a, "v double").repartition(n_parts)
        b = spark.createDataFrame(rows_b, "v double").repartition(n_parts)
        vals.append(histogram_drift(a, b, "v", bins=64).first()["tvd"])
    assert vals[0] == vals[1]
    assert 0.0 <= vals[0] <= 1.0
    # fixed explicit bounds give the same answer as derived ones here
    a = spark.createDataFrame(rows_a, "v double")
    b = spark.createDataFrame(rows_b, "v double")
    fixed = histogram_drift(a, b, "v", bins=64, lo=0.0, hi=96.0).first()["tvd"]
    assert fixed == vals[0]


def test_weighted_priority_sample_bias_determinism_and_plan(spark):
    """weighted_priority_sample (round 11): (a) deterministic — same
    (corpus, salt) reproduces the exact id set, different salts draw
    different sets; (b) weight-proportional — heavy rows (weight 100)
    are included at a far higher rate than light rows (weight 1) in a
    50-of-2000 sample; (c) the selection is a TakeOrderedAndProject
    (per-partition top-k), never a global sort."""
    from aeuc_vector_db_spark.operators import curation as CU
    from pyspark.sql import functions as F

    df = spark.range(1, 2001).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, 100).otherwise(1).alias("w"),
    )
    s1 = CU.weighted_priority_sample(df, "w", k=50, salt=0)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids1b = sorted(r["doc_id"] for r in
                   CU.weighted_priority_sample(df, "w", k=50, salt=0).collect())
    ids2 = sorted(r["doc_id"] for r in
                  CU.weighted_priority_sample(df, "w", k=50, salt=1).collect())
    assert ids1 == ids1b and ids1 != ids2 and len(ids1) == 50
    heavy = sum(1 for i in ids1 if i % 10 == 0)
    # heavy rows are 10% of the corpus but carry ~91% of total weight;
    # they must dominate the sample (a uniform draw would give ~5)
    assert heavy >= 35, heavy
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    with __import__("pytest").raises(ValueError, match="k must be"):
        CU.weighted_priority_sample(df, "w", k=0)


# --- hard-negative mining (round 12) ----------------------------------------


def test_hard_negatives_exact_on_single_bucket(spark):
    """With vectors crafted to share one LSH bucket, the blocked miner
    IS exact: per anchor, top-k most-cosine-similar different-label
    vectors, rank order (cos desc, id asc). Hand-checkable geometry:
    anchors on axis 0, negatives at known angles."""
    import math

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [math.cos(0.1), math.sin(0.1)], 1),   # closest to 1, label differs
        (3, [math.cos(0.3), math.sin(0.3)], 1),
        (4, [math.cos(0.05), math.sin(0.05)], 0),  # same label as 1 — excluded
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = CU.hard_negatives_within_buckets(
        emb, k=2, n_planes=1, dim=2, label_col="label"
    )
    got = {
        (r["a_id"], r["r"]): r["neg_id"] for r in out.collect()
    }
    # all four vectors have positive dot with h_0 (h[0][0] = -1.0? it's
    # deterministic — just assert anchor 1's ranked negatives)
    assert got[(1, 1)] == 2 and got[(1, 2)] == 3
    # labels always differ
    lbl = {1: 0, 2: 1, 3: 1, 4: 0}
    for (a, _r), n in got.items():
        assert lbl[a] != lbl[n]


def test_hard_negatives_respects_k_and_buckets(spark):
    """Pairs only form within a bucket, at most k per anchor, ranks
    contiguous from 1."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 8)], int(i % 3))
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = CU.hard_negatives_within_buckets(
        emb, k=3, n_planes=3, dim=8, label_col="label"
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r["a_id"], []).append(r["r"])
    for a, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


# --- temperature mixing (round 12) ------------------------------------------


def test_temperature_budgets_hamilton_exact():
    counts = {"en": 400, "de": 100, "fr": 25}
    b = CU.temperature_budgets(counts, 105)
    # √ weights 20:10:5 → proportions 4:2:1 → 60/30/15 exactly
    assert b == {"en": 60, "de": 30, "fr": 15}
    assert sum(b.values()) == 105
    # smoothing direction: the tail's share rises vs raw proportion
    raw_fr = 25 / 525
    assert b["fr"] / 105 > raw_fr
    # and the head still leads
    assert b["en"] > b["de"] > b["fr"]


def test_temperature_budgets_leftover_and_clamp():
    # non-divisible total exercises largest-remainder; sum still exact
    counts = {"a": 100, "b": 100, "c": 100}
    b = CU.temperature_budgets(counts, 10)
    assert sum(b.values()) == 10
    assert sorted(b.values()) in ([3, 3, 4], [3, 4, 3])
    # a stratum smaller than its √-smoothed budget clamps to its count
    counts = {"big": 10000, "tiny": 2}
    b = CU.temperature_budgets(counts, 5000)
    assert b["tiny"] == 2


def test_temperature_mix_selects_exact_budgets(spark):
    df = spark.range(1, 526).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") <= 400, "en")
        .when(F.col("id") <= 500, "de")
        .otherwise("fr")
        .alias("source"),
    )
    out = CU.temperature_mix(df, total=105, stratum_col="source", salt=0)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"en": 60, "de": 30, "fr": 15}
    # a different salt draws different members, identical counts
    out2 = CU.temperature_mix(df, total=105, stratum_col="source", salt=7)
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in out2.collect()}
    assert ids1 != ids2
    got2 = {r["source"]: r["n"] for r in
            out2.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got2 == got


def test_temperature_mix_many_strata_broadcast_join(spark):
    """The budgets attach via a broadcast join, not a per-stratum
    when() chain — with 2,000 strata a literal chain is a driver
    plan-compile hazard (the bloomjoin lesson). Gates: (1) the plan
    holds a BroadcastHashJoin and no 2,000-branch CASE WHEN, (2) plan
    build + execution completes in bounded time, (3) the selection
    still sums to the Hamilton total (all strata equal → no clamp)."""
    import time

    n_strata, per = 2000, 5
    df = spark.range(n_strata * per).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % n_strata).cast("string")).alias(
            "source"
        ),
    )
    t0 = time.monotonic()
    out = CU.temperature_mix(df, total=4000, stratum_col="source", salt=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    built = time.monotonic() - t0
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CASE WHEN" not in plan.replace("CASE WHEN", "", 1), (
        "budget attachment regressed to a literal when() chain"
    )
    assert out.count() == 4000
    # generous wall bound: the r12 when-chain variant at 2k strata took
    # tens of seconds to compile; the join variant is sub-second + exec
    assert built < 30.0


def test_temperature_mix_10k_strata_plan_compile(spark):
    """VERDICT r13 #8: pin the broadcast-join fix's compile-time win the
    way bloomjoin pinned its lesson. At 10,000 strata the r12 when()
    chain variant would take minutes of driver analysis; the join
    variant must plan AND execute wall-bounded, and the selection
    arithmetic must be byte-stable — a pinned 100-stratum selection
    hash guards against any future 'optimization' silently changing
    which rows the Hamilton budgets pick."""
    import hashlib
    import time

    n_strata, per = 10_000, 3
    df = spark.range(n_strata * per).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % n_strata).cast("string")).alias(
            "source"
        ),
    )
    t0 = time.monotonic()
    out = CU.temperature_mix(df, total=15_000, stratum_col="source", salt=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    built = time.monotonic() - t0
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # wall bound covers the count-collect + budget arithmetic + full
    # analysis/optimization of the 10k-stratum plan; the when-chain
    # variant blows through this by an order of magnitude
    assert built < 60.0, f"10k-strata plan build took {built:.1f}s"
    # all strata equal (3 rows) and budgets 1.5 avg → no clamp; the
    # Hamilton sum is exact
    assert out.count() == 15_000
    # 100-stratum selection pin: exact member set, not just counts —
    # any change to the draw hash, tie-break, or budget arithmetic
    # flips this digest (computed at landing, round 14)
    df100 = spark.range(1, 1001).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 100).cast("string")).alias(
            "source"
        ),
    )
    sel = CU.temperature_mix(df100, total=500, stratum_col="source", salt=2)
    ids = sorted(r["doc_id"] for r in sel.collect())
    digest = hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()
    assert len(ids) == 500
    assert digest == (
        "d75327935c61a264307c331d6c93d2cb3979c8e439f2fc682be656a6e8eb5c08"
    )


def test_luhn_and_ccn_detect_known_vectors(spark):
    """Known Luhn vectors: the classic valid test PANs pass, off-by-one
    check digits fail, plausible-length gate respected, multiple runs
    per row counted map-side."""
    rows = [
        (1, "pay 4111111111111111 ok"),             # valid Visa test PAN
        (2, "card 4111111111111112 nope"),           # check digit off by one
        (3, "amex 378282246310005 and mc 5555555555554444"),  # both valid
        (4, "order 123456789012 too-short 12345678901234567890 too-long"),
        (5, "79927398713 is the classic Luhn example but only 11 digits"),
        (6, "no digits at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_ccn_candidates"], r["n_ccn_valid"])
        for r in CU.ccn_detect(df).collect()
    }
    assert got == {1: (1, 1), 2: (1, 0), 3: (2, 2), 4: (0, 0),
                   5: (0, 0), 6: (0, 0)}
    # the fold itself: doubled-digit > 9 branch (5555...4444 exercises
    # it) and plan stays UDF-free / map-only
    plan = CU.ccn_detect(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
