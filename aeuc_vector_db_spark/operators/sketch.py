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
    docs: DataFrame, min_count: int, text_col: str = "text"
) -> DataFrame:
    """Phase 1: terms whose count within ANY single partition reaches
    ceil(min_count / num_partitions). Output: term (distinct), no shuffle
    on the token stream. Superset of all terms with global count ≥
    min_count, for any partitioning."""
    projected = docs.select(text_col)
    # Partition count of the EXACT plan the kernel runs over: the
    # pigeonhole bound needs P_assumed ≥ P_actual (a too-small P only
    # widens the candidate superset; a too-large one could miss).
    n_parts = max(1, projected.rdd.getNumPartitions())
    local_threshold = math.ceil(min_count / n_parts)

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                for tok in _py_tokens(text):
                    counts[tok] = counts.get(tok, 0) + 1
        hits = [t for t, c in counts.items() if c >= local_threshold]
        yield pd.DataFrame({"term": hits})

    return projected.mapInPandas(gen, "term string").distinct()


def heavy_hitter_terms(
    docs: DataFrame, min_count: int, text_col: str = "text"
) -> DataFrame:
    """EXACT terms with global count ≥ min_count, via candidate pruning.

    Output: (term, term_count), the same rows `tokens → groupBy → HAVING`
    would produce — but only candidate tokens ever shuffle. Candidates
    broadcast (they number ≤ total_tokens/local_threshold per partition,
    i.e. bounded by construction, not by luck).
    """
    cands = heavy_hitter_candidates(docs, min_count, text_col)
    tokens = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    return (
        tokens.join(F.broadcast(cands), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .filter(F.col("term_count") >= F.lit(min_count))
    )
