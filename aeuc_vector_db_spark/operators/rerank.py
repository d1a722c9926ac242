"""Diversity re-ranking — maximal marginal relevance over a candidate set.

MMR (Carbonell & Goldstein, SIGIR 1998 — the standard
relevance/diversity tradeoff): greedily build the result list, at each
step taking the candidate maximizing

    λ·rel(c)  −  (1−λ)·max_{s ∈ selected} sim(c, s)

λ=1 is plain relevance ranking; λ→0 maximizes pairwise diversity.

Execution shape: MMR is inherently sequential in k, so it is NOT a
corpus operator — it is a *re-rank of an already-retrieved candidate
set* (top-R from brute-force/IVF/BM25/binary search, R ≲ a few
hundred). The retrieval stage does the 100 TB work and hands each
query's R rows to one `applyInPandas` group; the kernel is O(R·k·d)
per query on a few-KB group — the same "broadcast the small, never
move the big" split as the exact re-rank stages in ann.py.

Determinism: candidates are processed in (rel DESC, id ASC) order,
pairwise cosines use an explicit left-to-right float64 fold (matching
the SQL/DuckDB `list_reduce` fold bit-for-bit — NOT np.dot, whose
pairwise summation differs in low-order bits), and every arithmetic
step mirrors the oracle's expression shape, so the selection AND the
scores are bit-identical cross-engine (pinned by the declared query's
recursive-CTE oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seq_cosine(a, b) -> float:
    """Left-to-right fold cosine — bit-identical to the SQL-lambda and
    DuckDB list_reduce formulations (s starts at 0.0; (0.0 + x) == x)."""
    num = 0.0
    for x, y in zip(a, b):
        num += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    return num / (math.sqrt(na) * math.sqrt(nb) + 1e-12)


def mmr_rerank(
    candidates: DataFrame,
    lam: float = 0.7,
    top_k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR selection per query over (query_id, id, rel, vector)
    candidate rows. Returns (query_id, id_col, score, rank): `score` is
    the MMR objective at the moment of selection (the first pick's
    score is its plain relevance — no diversity term exists yet), rank
    is the selection order. Ties break to the lowest id at every step.
    Groups smaller than top_k return all their rows."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    import pandas as pd

    one_minus_lam = 1.0 - lam  # computed ONCE, mirrored by the oracle's
    # (CAST(1 AS DOUBLE) - lam) — a DECIMAL-parsed SQL literal would be
    # exactly 0.3 where float64 1-0.7 is 0.30000000000000004

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        cands = []
        for qid, vid, rel, emb in zip(
            pdf[query_id_col], pdf[id_col], pdf[rel_col], pdf[vec_col]
        ):
            cands.append((int(vid), float(rel), [float(x) for x in emb]))
        qid = int(pdf[query_id_col].iloc[0])
        rem = sorted(cands, key=lambda t: (-t[1], t[0]))
        out = []
        chosen = []
        while rem and len(out) < top_k:
            if not chosen:
                best, best_score = rem[0], rem[0][1]
            else:
                best, best_score = None, None
                for c in rem:
                    ms = max(_seq_cosine(c[2], s[2]) for s in chosen)
                    mmr = (lam * c[1]) - (one_minus_lam * ms)
                    if best is None or mmr > best_score or (
                        mmr == best_score and c[0] < best[0]
                    ):
                        best, best_score = c, mmr
            chosen.append(best)
            out.append((qid, best[0], best_score, len(out) + 1))
            rem = [c for c in rem if c[0] != best[0]]
        return pd.DataFrame(
            out, columns=[query_id_col, id_col, "score", "rank"]
        )

    prepped = candidates.select(
        F.col(query_id_col).cast("long"),
        F.col(id_col).cast("long"),
        F.col(rel_col).cast("double"),
        F.col(vec_col).cast("array<double>"),
    )
    return prepped.groupBy(query_id_col).applyInPandas(
        _mmr,
        schema=f"{query_id_col} long, {id_col} long, score double, rank long",
    )
