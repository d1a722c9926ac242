"""Property-based tests (hypothesis) — SURVEY.md §5 item 3.

Algebraic invariants the engine must hold for ANY input, not just the
fixtures: metric symmetry/bounds, φ-band partition totality, digest
order-invariance, normalization idempotence, jaccard bounds, minhash
containment. Vectors go through one shared Spark round-trip per case
batch to keep runtime sane (hypothesis drives Python-side generation;
Spark evaluates the same expressions the queries use).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.similarity import (
    METRICS,
    cosine_col,
    euclidean_similarity_col,
    phi_weighted_col,
)
from aeuc_vector_db_spark.functions.vector import l2_norm_col, l2_normalize_col, lit_vector
from aeuc_vector_db_spark.operators.clustering import _phi_break_fracs
from aeuc_vector_db_spark.operators.text import _py_polyhash, _py_tokens

FINITE = st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False)
VEC = st.lists(FINITE, min_size=2, max_size=8)

SETTINGS = settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _eval(spark, cols: dict):
    row = spark.range(1).select(*[c.alias(k) for k, c in cols.items()]).collect()[0]
    return row


@SETTINGS
@given(a=VEC)
def test_metrics_self_similarity_and_bounds(spark, a):
    pairs = {
        name: fn(lit_vector(a), lit_vector(a)) for name, fn in METRICS.items()
    }
    row = _eval(spark, pairs)
    # cosine/φ self-similarity ≈ 1 for non-degenerate vectors; ∈ [-1, 1+ε] always
    norm = math.sqrt(sum(x * x for x in a))
    if norm > 1e-3:
        assert row["cosine"] == pytest.approx(1.0, abs=1e-6)
        assert row["phi_weighted"] == pytest.approx(1.0, abs=1e-6)
    assert -1.0 - 1e-9 <= row["cosine"] <= 1.0 + 1e-9
    # euclidean similarity of identical vectors is exactly 1/(1+0)
    assert row["euclidean"] == pytest.approx(1.0)


@SETTINGS
@given(a=VEC, b=VEC)
def test_metrics_symmetry(spark, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    cols = {}
    for name, fn in METRICS.items():
        cols[f"{name}_ab"] = fn(lit_vector(a), lit_vector(b))
        cols[f"{name}_ba"] = fn(lit_vector(b), lit_vector(a))
    row = _eval(spark, cols)
    for name in METRICS:
        assert row[f"{name}_ab"] == pytest.approx(row[f"{name}_ba"], rel=1e-12), name


@SETTINGS
@given(a=VEC)
def test_normalize_idempotent_and_unit(spark, a):
    v = lit_vector(a)
    row = _eval(
        spark,
        {
            "n1": l2_norm_col(l2_normalize_col(v)),
            "n2": l2_norm_col(l2_normalize_col(l2_normalize_col(v))),
        },
    )
    norm = math.sqrt(sum(x * x for x in a))
    if norm > 1e-6:
        assert row["n1"] == pytest.approx(1.0, abs=1e-6)
        assert row["n2"] == pytest.approx(1.0, abs=1e-6)
    else:
        assert row["n1"] <= 1.0  # zero vector stays near-zero, never NaN/inf


def test_phi_band_fracs_monotone_partition():
    for levels in range(2, 8):
        fracs = _phi_break_fracs(levels)
        assert len(fracs) == levels - 1
        assert all(0 < f < 1 for f in fracs)
        assert fracs == sorted(fracs)  # breakpoints strictly increasing
        assert all(b - a > 1e-9 for a, b in zip(fracs, fracs[1:]))


@SETTINGS
@given(
    norms=st.lists(
        st.floats(min_value=0.0, max_value=50.0, allow_nan=False), min_size=1, max_size=30
    ),
    levels=st.integers(min_value=2, max_value=5),
)
def test_phi_banding_is_total_partition(spark, norms, levels):
    """Every row lands in exactly one band ∈ [0, levels)."""
    from aeuc_vector_db_spark.operators.clustering import with_phi_band

    df = spark.createDataFrame(
        [(i, [float(n), 0.0]) for i, n in enumerate(norms)], "id long, embedding array<double>"
    )
    rows = with_phi_band(df, levels=levels).select("id", "band").collect()
    assert len(rows) == len(norms)  # no row lost or duplicated
    assert {r["id"] for r in rows} == set(range(len(norms)))
    assert all(0 <= r["band"] < levels for r in rows)


@SETTINGS
@given(ids=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=20, unique=True))
def test_digest_invariant_under_permutation(spark, ids):
    from aeuc_vector_db_spark.operators import crud

    fwd = spark.createDataFrame([(i,) for i in ids], "iglyph_id string")
    rev = spark.createDataFrame([(i,) for i in reversed(ids)], "iglyph_id string")
    assert crud.dataset_digest(fwd) == crud.dataset_digest(rev)
    assert crud.dataset_digest_scalable(fwd) == crud.dataset_digest_scalable(rev)


@given(s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=64))
@settings(max_examples=100, deadline=None)
def test_polyhash_range_and_determinism(s):
    h1, h2 = _py_polyhash(s), _py_polyhash(s)
    assert h1 == h2
    assert 0 <= h1 < 2_147_483_647


@given(s=st.text(alphabet="abc XYZ,.!123", max_size=60))
@settings(max_examples=100, deadline=None)
def test_tokens_lowercase_alnum_only(s):
    toks = _py_tokens(s)
    assert all(t and t == t.lower() for t in toks)
    assert all(all(c.isalnum() for c in t) for t in toks)


@SETTINGS
@given(
    a=st.sets(st.integers(min_value=0, max_value=1000), min_size=1, max_size=20),
    b=st.sets(st.integers(min_value=0, max_value=1000), min_size=1, max_size=20),
)
def test_jaccard_bounds_and_identity(spark, a, b):
    from aeuc_vector_db_spark.operators.text import jaccard_col

    mk = lambda s: F.array(*[F.lit(int(x)).cast("long") for x in sorted(s)])
    row = _eval(
        spark,
        {"jab": jaccard_col(mk(a), mk(b)), "jaa": jaccard_col(mk(a), mk(a))},
    )
    assert row["jaa"] == pytest.approx(1.0)
    assert 0.0 <= row["jab"] <= 1.0
    if a == b:
        assert row["jab"] == pytest.approx(1.0)
    if not (a & b):
        assert row["jab"] == 0.0


# ---------------------------------------------------------------------------
# Round-3 additions: curation + multimodal pure-Python kernels
# ---------------------------------------------------------------------------

@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
    ),
    target=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.floats(min_value=0.001, max_value=1.0, allow_nan=False),
        min_size=1,
    ),
)
@SETTINGS
def test_rebalance_thresholds_invariants(counts, target):
    from aeuc_vector_db_spark.operators.curation import rebalance_thresholds

    thrs = rebalance_thresholds(counts, target)
    assert set(thrs) == set(counts)
    assert all(0 <= t <= 10000 for t in thrs.values())
    shared = [s for s in counts if s in target and target[s] > 0]
    if shared:
        # at least one binding stratum keeps everything
        assert any(thrs[s] == 10000 for s in shared)
    for s in counts:
        if s not in target or target.get(s, 0) <= 0:
            assert thrs[s] == 0  # unlisted strata are excluded


@given(
    w=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    color=st.sampled_from([0, 2]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@SETTINGS
def test_png_encode_decode_roundtrip(w, h, color, seed):
    import random

    from aeuc_vector_db_spark.sources.multimodal import png_decode, png_encode

    rng = random.Random(seed)
    channels = 1 if color == 0 else 3
    pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
    got_w, got_h, got_c, got_px = png_decode(png_encode(pixels, w, h, color))
    assert (got_w, got_h, got_c) == (w, h, channels)
    assert bytes(got_px) == pixels


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@SETTINGS
def test_wav_encode_decode_roundtrip(samples, rate):
    import struct as _struct

    from aeuc_vector_db_spark.sources.multimodal import wav_decode, wav_encode

    ch, got_rate, bits, dur_ms, pcm = wav_decode(wav_encode(samples, rate))
    assert (ch, got_rate, bits) == (1, rate, 16)
    decoded = list(_struct.unpack(f"<{len(samples)}h", pcm))
    assert decoded == samples
    assert abs(dur_ms - len(samples) * 1000.0 / rate) < 1e-9


# ---------------------------------------------------------------------------
# Lossless codec round-trip properties (PNG / BMP / GIF / WAV)
# ---------------------------------------------------------------------------

@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_png_bmp_roundtrip_property(w, h, data):
    from aeuc_vector_db_spark.sources import multimodal as MM

    rgb = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3,
                           max_size=w * h * 3))
    )
    assert MM.png_decode(MM.png_encode(rgb, w, h, color_type=2))[3] == rgb
    assert MM.bmp_decode(MM.bmp_encode(rgb, w, h))[3] == rgb


@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    n_colors=st.integers(min_value=1, max_value=16),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_property(w, h, n_colors, data):
    from aeuc_vector_db_spark.sources import multimodal as MM

    palette = [
        tuple(data.draw(st.lists(st.integers(0, 255), min_size=3, max_size=3)))
        for _ in range(n_colors)
    ]
    idx = bytes(
        data.draw(st.lists(st.integers(0, n_colors - 1), min_size=w * h,
                           max_size=w * h))
    )
    got = MM.gif_decode(MM.gif_encode(idx, w, h, palette))
    assert got[:3] == (w, h, 3)
    assert got[3] == b"".join(bytes(palette[i]) for i in idx)


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    import struct as _struct

    from aeuc_vector_db_spark.sources import multimodal as MM

    ch, r, bits, _dur, pcm = MM.wav_decode(MM.wav_encode(samples, sample_rate=rate))
    assert (ch, r, bits) == (1, rate, 16)
    assert list(_struct.unpack(f"<{len(samples)}h", pcm)) == samples


# ---------------------------------------------------------------------------
# Round-7 kernels: pure-Python mirrors vs the Spark expressions — the
# cross-engine determinism claims reduced to per-example equality.
# ---------------------------------------------------------------------------

import hashlib

from aeuc_vector_db_spark.operators.binary import WORD_BITS, sign_pack_cols
from aeuc_vector_db_spark.operators.sketch import (
    CMS_D,
    CMS_W,
    HLL_M,
    HLL_P,
    HLL_W,
    cms_bucket_cols,
    hll_register_cols,
)


def _py_pack(vec):
    words = []
    for j in range(0, len(vec), WORD_BITS):
        w = 0
        for i, x in enumerate(vec[j : j + WORD_BITS]):
            if x > 0:
                w |= 1 << i
        words.append(w)
    return words


@SETTINGS
@given(a=VEC, b=VEC)
def test_sign_pack_matches_python_and_hamming_axioms(spark, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    pa, pb = _py_pack(a), _py_pack(b)
    cols = {}
    for j, w in enumerate(sign_pack_cols(lit_vector(a), n)):
        cols[f"a{j}"] = w
    for j, w in enumerate(sign_pack_cols(lit_vector(b), n)):
        cols[f"b{j}"] = w
    row = _eval(spark, cols)
    got_a = [row[f"a{j}"] for j in range(len(pa))]
    got_b = [row[f"b{j}"] for j in range(len(pb))]
    assert got_a == pa and got_b == pb
    d_ab = sum(bin(x ^ y).count("1") for x, y in zip(pa, pb))
    assert d_ab == sum(bin(x ^ y).count("1") for x, y in zip(got_a, got_b))
    assert sum(bin(x ^ x).count("1") for x in pa) == 0  # d(a,a)=0
    assert 0 <= d_ab <= n  # bounds


def _py_hll(key: str):
    h = int(hashlib.sha256(key.encode()).hexdigest()[:8], 16)
    reg = h % HLL_M
    suf = h >> HLL_P
    rho = (HLL_W + 1) if suf == 0 else (HLL_W + 1) - suf.bit_length()
    return reg, rho


def _py_cms(key: str):
    hx = hashlib.sha256(key.encode()).hexdigest()
    return [int(hx[8 * i : 8 * i + 8], 16) % CMS_W for i in range(CMS_D)]


KEY = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=24
)


@SETTINGS
@given(key=KEY)
def test_hll_and_cms_hash_derivations_match_python(spark, key):
    register, rho = hll_register_cols(F.lit(key))
    cols = {"register": register, "rho": rho}
    for i, b in enumerate(cms_bucket_cols(F.lit(key))):
        cols[f"b{i}"] = b
    row = _eval(spark, cols)
    want_reg, want_rho = _py_hll(key)
    assert (row["register"], row["rho"]) == (want_reg, want_rho)
    assert 1 <= row["rho"] <= HLL_W + 1
    assert [row[f"b{i}"] for i in range(CMS_D)] == _py_cms(key)


def _py_substr_spans(docs: dict, L: int):
    from collections import Counter

    occ: Counter = Counter()
    wins: dict = {}
    for d, t in docs.items():
        ws = [(p, t[p - 1 : p - 1 + L]) for p in range(1, len(t) - L + 2)]
        wins[d] = ws
        for _, w in ws:
            occ[w] += 1
    out = {}
    for d, ws in wins.items():
        dup = [p for p, w in ws if occ[w] > 1]
        if not dup:
            continue
        covered = set()
        for p in dup:
            covered.update(range(p, p + L))
        out[d] = (len(dup), len(covered), len(docs[d]))
    return out


DOC_TEXT = st.text(alphabet="ab", min_size=0, max_size=25)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=st.lists(DOC_TEXT, min_size=2, max_size=4))
def test_substring_dup_spans_matches_bruteforce(spark, texts):
    """Tiny alphabet forces natural duplicates; the operator must equal
    the brute-force window/occurrence/union computation for ANY corpus
    (span merging is the subtle part — the union length, not the sum
    of window lengths)."""
    from aeuc_vector_db_spark.operators.dedup import substring_dup_spans

    L = 5
    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["dup_chars"], r["n_chars"])
        for r in substring_dup_spans(df, min_len=L).collect()
    }
    assert got == _py_substr_spans(docs, L)


# ---------------------------------------------------------------------------
# SCD2 invariants (operators/scd.py): for ANY change stream, the version
# intervals partition each key's timeline — strictly increasing eff_from,
# each eff_to equal to the next eff_from, exactly one open version per key —
# and a point-in-time join matches every fact at most once.
# ---------------------------------------------------------------------------

CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=50),     # ts (seconds)
        st.integers(min_value=0, max_value=10**6),  # tie
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(CHANGES)
def test_scd2_intervals_partition_timeline(spark, changes):
    from datetime import datetime, timezone

    from aeuc_vector_db_spark.operators.scd import scd2_from_changes

    rows = [
        (k, datetime.fromtimestamp(1_700_000_000 + ts, tz=timezone.utc), tie, float(tie))
        for k, ts, tie in changes
    ]
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, tie long, attr double"
    )
    dim = scd2_from_changes(df, "key", "ts", ["attr"], tie_col="tie").collect()
    by_key: dict = {}
    for r in dim:
        by_key.setdefault(r["key"], []).append((r["eff_from"], r["eff_to"]))
    for key, ivs in by_key.items():
        ivs.sort(key=lambda t: t[0])
        froms = [f for f, _ in ivs]
        assert froms == sorted(set(froms)), "eff_from strictly increasing per key"
        for (f1, t1), (f2, _) in zip(ivs, ivs[1:]):
            assert t1 == f2, "no gap/overlap between consecutive versions"
        assert ivs[-1][1] is None, "exactly one open version per key"
        assert all(t is not None for _, t in ivs[:-1])
    # one version per distinct (key, ts)
    distinct_changes = {(k, ts) for k, ts, _ in changes}
    assert len(dim) == len(distinct_changes)


def _py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(vocab=st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=5), min_size=1, max_size=12
))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_edit_distance_one_blocking_is_complete(spark, vocab):
    """For ANY vocabulary, symmetric-delete blocking + exact verify
    returns exactly the brute-force Levenshtein≤1 pair set — the
    completeness theorem the operator's scale claim rests on. The
    tiny 'abcd' alphabet maximizes deletion-block collisions (the
    false-positive pressure the verify step must absorb)."""
    from aeuc_vector_db_spark.operators.dedup import edit_distance_one_pairs

    df = spark.createDataFrame([(v,) for v in vocab], "k string")
    got = {(r["k_a"], r["k_b"])
           for r in edit_distance_one_pairs(df, "k").collect()}
    distinct = sorted(set(vocab))
    expect = {(x, y) for i, x in enumerate(distinct)
              for y in distinct[i + 1:] if _py_lev(x, y) <= 1}
    assert got == expect
