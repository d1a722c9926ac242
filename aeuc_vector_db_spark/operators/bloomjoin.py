"""Bloom semi-join reduction — map-side pre-filtering for large⋈large joins.

The 100 TB shape this serves: a fact table too big to move joins a
build side too big to broadcast *as rows* but whose KEY SET compresses
into a few KB of bloom bits. Shuffling the fact table first and
discarding 99% of it at the join is the classic waste; instead:

  1. fold the build side's keys into an m-bit bloom filter with ONE
     partial+final aggregate (shuffle ≤ m/64 rows per partition),
  2. collect the m/64 words to the driver (bounded by `m_bits`, e.g.
     32 KB at the default 2^18 bits — the same footprint class as a
     broadcast dim),
  3. filter the fact side with a pure-codegen probe expression over the
     word array *before* its shuffle — false positives are removed by
     the real join that follows, so the result is bit-identical to the
     plain join while the shuffle carries only probable matches.

This is the "sideways information passing" / semi-join reduction of the
classic literature (Bernstein & Chiu 1981; bloomjoin: Mackert & Lohman
1986), the explicit-operator twin of Spark's own runtime row-level
filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`) — here
deterministic, tunable, and assertable in the plan.

Everything stays JVM-side: xxhash64 + shift/AND probes against two
constant array literals; no Python UDF, no extra shuffle, no driver
loop over rows.

Reference analog: the reference's only join-ish structure is the
inverted-index candidate pre-filter before scoring
(reference vector_field.py:316-322) — the same "cheap membership test
before expensive work" idea, generalized to distributed joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^bit as SIGNED 64-bit values (bit 63 wraps to long min) — lookup
# table because shiftleft()'s shift amount must be a Python int, not a
# Column; element_at over a constant array keeps the probe in codegen.
_POW2 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def bloom_build(
    df: DataFrame, key: str, m_bits: int = 1 << 18, k: int = 3
) -> dict:
    """Fold `df[key]`'s values into an m_bits-wide bloom filter.

    One aggregate job: k hashes per row → (word, bit) → per-word
    `bit_or` with map-side partial aggregation, so the shuffle carries
    at most m_bits/64 rows per partition regardless of build-side row
    count. Returns {"m": m_bits, "k": k, "words": [m_bits/64 longs]}
    — the driver-side footprint is m_bits/8 bytes (32 KB default),
    bounded by parameters, never by data.

    Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; the default
    m=2^18, k=3 holds ~1% at n≈30k distinct keys. FPs cost only wasted
    shuffle rows (the real join removes them), so undersizing degrades
    performance, never correctness.
    """
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not 1 <= k <= 8:
        raise ValueError(f"k must be in [1, 8], got {k}")
    hashes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )
    words = (
        df.filter(F.col(key).isNotNull())
        .select(F.explode(hashes).alias("h"))
        .select(
            F.shiftright(F.col("h"), 6).alias("w"),
            F.element_at(
                F.lit(_POW2), F.col("h").bitwiseAND(F.lit(63)).cast("int") + 1
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["w"]] = r["word"]
    return {"m": m_bits, "k": k, "words": dense}


def bloom_probe_col(key: Column, bf: dict) -> Column:
    """Pure-codegen membership probe: true iff every one of the k bits
    for `key` is set in the filter. No false negatives by construction;
    NULL keys probe NULL (filtered out — a NULL key cannot equi-join).
    """
    arr = F.lit(bf["words"])
    conds = []
    for i in range(bf["k"]):
        h = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(bf["m"]))
        word = F.element_at(arr, F.shiftright(h, 6).cast("int") + 1)
        mask = F.element_at(
            F.lit(_POW2), h.bitwiseAND(F.lit(63)).cast("int") + 1
        )
        conds.append(word.bitwiseAND(mask) != 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def bloom_words_df(
    df: DataFrame, key: str, m_bits: int = 1 << 18, k: int = 3
) -> DataFrame:
    """The distributed form of `bloom_build`: the same per-word `bit_or`
    aggregate, left as a (w INT, word LONG) DataFrame of ≤ m_bits/64
    rows instead of a driver collect — the filter never touches the
    driver, so `m_bits` can grow with the key count without a driver
    bottleneck (2^24 bits is still a 256k-row broadcast)."""
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not 1 <= k <= 8:
        raise ValueError(f"k must be in [1, 8], got {k}")
    hashes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )
    return (
        df.filter(F.col(key).isNotNull())
        .select(F.explode(hashes).alias("h"))
        .select(
            F.shiftright(F.col("h"), 6).cast("int").alias("w"),
            F.element_at(
                F.lit(_POW2), F.col("h").bitwiseAND(F.lit(63)).cast("int") + 1
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_reduced_join(
    fact: DataFrame,
    build: DataFrame,
    key: str,
    how: str = "inner",
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """`fact.join(build, key, how)` with the fact side pre-filtered by a
    bloom filter over `build[key]` — identical results (the join removes
    bloom false positives), but the fact shuffle carries only probable
    matches. Supported joins are the ones where dropping non-matching
    fact rows early is semantics-preserving: inner and left_semi.

    The probe is k BROADCAST HASH JOINS against the ≤ m_bits/64-row
    word table (one per hash function): each fact row looks its word up
    in the broadcast map and keeps going only if its bit is set — all
    map-side, one fact scan, no shuffle before the final join. A fact
    row whose word index is absent from the table (word == 0) is
    dropped by the inner join itself.

    Deliberately NOT the literal-array formulation of `bloom_probe_col`:
    inlining the words as an array literal plants a CreateArray with
    m_bits/64 children in the plan, and optimizer rules that copy
    predicates around a join (constraint inference, pushdown) walk and
    duplicate that tree — measured ~20 s of DRIVER plan-compile time at
    m=2^21 inside a join, vs milliseconds for the join formulation.
    The literal probe stays the right tool for small filters reused
    across many separate plans.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_reduced_join: how={how!r} — only inner/left_semi can "
            "drop unmatched fact rows before the join"
        )
    words = bloom_words_df(build.select(key), key, m_bits=m_bits, k=k)
    pre = fact
    for i in range(k):
        h = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
        wi = words.select(
            F.col("w").alias(f"__bw{i}"), F.col("word").alias(f"__bword{i}")
        )
        mask = F.element_at(
            F.lit(_POW2), h.bitwiseAND(F.lit(63)).cast("int") + 1
        )
        pre = (
            pre.withColumn(f"__bw{i}", F.shiftright(h, 6).cast("int"))
            .join(F.broadcast(wi), f"__bw{i}", "inner")
            .filter(F.col(f"__bword{i}").bitwiseAND(mask) != 0)
            .drop(f"__bw{i}", f"__bword{i}")
        )
    return pre.join(build, key, how)
