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
