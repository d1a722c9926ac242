"""Binary (sign-bit) embedding quantization + Hamming search + exact
re-rank — the cheapest point on the engine's compression ladder
(float32 → PQ codes → single bits), charter extension alongside
operators/ann.py PQ/IVFADC. (The reference has no binary quantization;
this is the 32×-compression similarity-search mode its users ask of a
vector engine at corpus scales where even PQ codes are IO-bound.)

Design for 100 TB:

- A dim-d float corpus packs to ceil(d/32) BIGINT words per row — 32×
  less IO than the float scan, and the packing is a pure JVM expression
  (a sum of 32 `when` terms per word — whole-stage codegen, no HOF
  interpretation, no Python). At scale you materialize the packed table
  once (like `pq_encode`) and scan only it.
- The Hamming scan is `bit_count(xor(words))` — integer ALU work inside
  codegen; the query side broadcasts, the corpus NEVER shuffles, and the
  per-query top-R cut goes through the rank-window path whose
  WindowGroupLimit partial top-k is plan-gated (shuffle volume = R rows
  per query per partition, not N·Q).
- Re-rank: the R candidates per query (tiny) BROADCAST back onto the
  float corpus — exact cosine on Q·R rows only. Guarantees the final
  scores are exact; only candidate selection is approximate.

Cross-engine: packing, Hamming, and the cosine re-score are all exact
integer / sequential-fold arithmetic, so DuckDB mirrors the whole
pipeline bit-for-bit (oracle: `emb_binary_hamming_topk`).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.similarity import cosine_col
from aeuc_vector_db_spark.functions.vector import as_double

WORD_BITS = 32  # bits per packed word; 2^31 ≤ BIGINT so sums stay exact


def sign_pack_cols(vec: Column | str, dim: int) -> list[Column]:
    """ceil(dim/32) BIGINT words: bit i of word j = 1 iff vec[32j+i] > 0
    (strict — zeros and negatives map to 0, the conventional sign split).

    Each word is a sum of `when` literals (1 << i): integer-exact, pure
    codegen, order-independent."""
    v = F.col(vec) if isinstance(vec, str) else vec
    words = []
    for j in range(0, dim, WORD_BITS):
        n = min(WORD_BITS, dim - j)
        w: Column = F.lit(0).cast("long")
        for i in range(n):
            w = w + F.when(
                F.element_at(v, j + i + 1) > F.lit(0), F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        words.append(w)
    return words


def sign_pack(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prefix: str = "w",
) -> DataFrame:
    """(id, w0..w{k-1}) packed table — the 32×-smaller scan target."""
    words = sign_pack_cols(vec_col, dim)
    return df.select(
        id_col, *[w.alias(f"{prefix}{j}") for j, w in enumerate(words)]
    )


def hamming_col(n_words: int, a_prefix: str = "qw", b_prefix: str = "cw") -> Column:
    """Σ_j bit_count(xor(a_j, b_j)) — the Hamming distance between two
    packed vectors, as one codegen expression."""
    d: Column = F.lit(0)
    for j in range(n_words):
        d = d + F.bit_count(
            F.col(f"{a_prefix}{j}").bitwiseXOR(F.col(f"{b_prefix}{j}"))
        )
    return d


def binary_search_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    top_k: int = 10,
    refine_r: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_vec_col: str = "query_embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage search: Hamming top-R over sign bits, exact cosine
    top-k over the R survivors. Output: (query_id, vec_id, hamming,
    score, rank), rank ≤ top_k, ties broken by ascending id at BOTH
    stages (deterministic under any partitioning).

    refine_r is the recall knob: R = k recovers pure-Hamming ranking;
    R → N recovers exact search."""
    n_words = math.ceil(dim / WORD_BITS)
    cp = sign_pack(corpus, dim, vec_col, id_col, prefix="cw")
    qp = sign_pack(queries, dim, query_vec_col, query_id_col, prefix="qw")
    ham = cp.crossJoin(F.broadcast(qp)).select(
        query_id_col, id_col, hamming_col(n_words).alias("hamming")
    )
    w_h = Window.partitionBy(query_id_col).orderBy(
        F.col("hamming").asc(), F.col(id_col).asc()
    )
    cands = (
        ham.withColumn("hrank", F.row_number().over(w_h))
        .filter(F.col("hrank") <= refine_r)
        .select(query_id_col, id_col, "hamming")
    )
    # exact re-rank: candidates (Q·R rows) broadcast onto the float
    # corpus — the only stage that touches float vectors reads N·(R/N)
    # of them via the join, never shuffling the corpus
    exact = (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(cands), id_col)
        .join(F.broadcast(queries.select(query_id_col, query_vec_col)), query_id_col)
        .withColumn(
            "score", cosine_col(as_double(F.col(vec_col)), as_double(F.col(query_vec_col)))
        )
    )
    w_s = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_s))
        .filter(F.col("rank") <= top_k)
        .select(query_id_col, id_col, "hamming", "score", "rank")
    )


def binary_search_rerank_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    top_k: int = 10,
    refine_r: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_vec_col: str = "query_embedding",
    query_id_col: str = "query_id",
    packed: DataFrame | None = None,
) -> DataFrame:
    """Arrow twin of `binary_search_rerank` — same two-stage semantics,
    stage 1 vectorized: the packed words stream through mapInPandas as
    uint64 lanes, Hamming = 16-bit-LUT popcount of xor (NumPy, whole
    batch × all queries at once), per-partition top-R via the tie-aware
    lexsort cut (search.py:270 convention), then the same exact cosine
    re-rank. Rank-for-rank equal to the SQL twin (pinned in
    test_binary.py) — the SQL path carries the DuckDB oracle, this
    path carries the throughput.

    Pass `packed` (from `sign_pack(corpus, dim, prefix="cw")`, persisted)
    to scan the 16-byte/row packed table instead of re-packing floats —
    the materialized-index shape a 100 TB corpus would use."""
    import math as _math

    import numpy as np
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    n_words = _math.ceil(dim / WORD_BITS)
    cp = (
        packed
        if packed is not None
        else sign_pack(corpus, dim, vec_col, id_col, prefix="cw")
    )
    qp_rows = sorted(
        sign_pack(queries, dim, query_vec_col, query_id_col, prefix="qw").collect(),
        key=lambda r: r[query_id_col],
    )
    q_ids = [r[query_id_col] for r in qp_rows]
    q_words = np.asarray(
        [[r[f"qw{j}"] for j in range(n_words)] for r in qp_rows], dtype=np.uint64
    )  # (Q, W)

    qid_type = queries.schema[query_id_col].dataType.simpleString()
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id_col} {qid_type}, {id_col} {id_type}, hamming int"

    def partition_topr(batches):
        # 64 KB LUT built once per worker invocation: popcount of every
        # 16-bit lane value
        lut = np.array([bin(i).count("1") for i in range(65536)], dtype=np.uint16)
        best: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids_py = pdf[id_col].tolist()
            ids = np.asarray(ids_py)
            words = np.empty((len(pdf), n_words), dtype=np.uint64)
            for j in range(n_words):
                words[:, j] = pdf[f"cw{j}"].to_numpy(dtype=np.int64).astype(np.uint64)
            # (B, Q, W) xor → uint16 lanes → LUT → per-pair popcount sum
            x = words[:, None, :] ^ q_words[None, :, :]
            lanes = x.view(np.uint16).reshape(len(pdf), len(q_ids), n_words * 4)
            ham = lut[lanes].sum(axis=2, dtype=np.int64)  # (B, Q)
            for qi, qid in enumerate(q_ids):
                col = ham[:, qi]
                take = min(refine_r, len(col))
                # lexsort (id asc secondary, hamming asc primary): the
                # tie-aware cut — Hamming ties are the COMMON case
                order = np.lexsort((ids, col))[:take]
                cand = best.setdefault(qid, [])
                cand.extend((int(col[i]), ids_py[i]) for i in order)
                if len(cand) > 4 * refine_r:
                    cand.sort(key=lambda t: (t[0], t[1]))
                    del cand[refine_r:]
        import pandas as pd

        rows = []
        for qid, cand in best.items():
            cand.sort(key=lambda t: (t[0], t[1]))
            rows.extend((qid, vid, h) for h, vid in cand[:refine_r])
        yield pd.DataFrame(
            rows, columns=[query_id_col, id_col, "hamming"]
        ) if rows else pd.DataFrame(
            {query_id_col: [], id_col: [], "hamming": []}
        )

    from pyspark.sql import Window

    finalists = cp.mapInPandas(partition_topr, out_schema)
    w_h = Window.partitionBy(query_id_col).orderBy(
        F.col("hamming").asc(), F.col(id_col).asc()
    )
    cands = (
        finalists.withColumn("hrank", F.row_number().over(w_h))
        .filter(F.col("hrank") <= refine_r)
        .select(query_id_col, id_col, "hamming")
    )
    exact = (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(cands), id_col)
        .join(F.broadcast(queries.select(query_id_col, query_vec_col)), query_id_col)
        .withColumn(
            "score", cosine_col(as_double(F.col(vec_col)), as_double(F.col(query_vec_col)))
        )
    )
    w_s = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_s))
        .filter(F.col("rank") <= top_k)
        .select(query_id_col, id_col, "hamming", "score", "rank")
    )
