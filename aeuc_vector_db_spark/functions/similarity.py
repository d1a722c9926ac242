"""The four reference similarity metrics as Spark Column builders.

Reference semantics (all return "higher = more similar"):
- cosine        — similarity.py:31-34, denom guarded `+ 1e-12`
- euclidean     — similarity.py:37-44, distance converted to `1/(1+d)`
- dot           — similarity.py:47-49
- phi_weighted  — similarity.py:52-74, per-dim weight 1/(dist to nearest
                  φⁿ, n ∈ [-3,6], + 1e-8), weights normalized to sum 1
                  (+1e-12 guard), then cosine of the weighted vectors
- dispatch      — similarity.py:82-110, ValueError on unknown metric

Inputs are expected as ARRAY<DOUBLE> (use functions.vector.as_double on
ARRAY<FLOAT> columns first). Everything is a pure Column expression —
JVM-side, codegen'd, no Python per row. For φ-weighted there is also an
Arrow-vectorized pandas_udf fast path (phi_weighted_pandas) used by the
batch search operator when SQL-lambda depth becomes the bottleneck.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.vector import let_col, dot_col, l2_norm_col, _c

PHI: float = (1.0 + 5.0**0.5) / 2.0
# φⁿ for n ∈ {-3..6} (similarity.py:22-23); computed once, folded as literals
PHI_POWERS: tuple[float, ...] = tuple(PHI**n for n in range(-3, 7))


def cosine_col(a: Column | str, b: Column | str) -> Column:
    denom = l2_norm_col(a) * l2_norm_col(b) + F.lit(1e-12)
    return dot_col(a, b) / denom


def euclidean_distance_col(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )


def euclidean_similarity_col(a: Column | str, b: Column | str) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + euclidean_distance_col(a, b))


def _phi_min_dist(m: Column) -> Column:
    """Distance from magnitude m to the nearest φ-power (10-way least)."""
    return F.least(*[F.abs(m - F.lit(p)) for p in PHI_POWERS])


def phi_weighted_col(a: Column | str, b: Column | str) -> Column:
    """φ-harmonic weighted cosine (similarity.py:52-74), pure SQL.

    Weight_i = 1/(dist(avg_mag_i, nearest φⁿ) + 1e-8), normalized to sum 1
    with a +1e-12 guard; then cosine (with its own +1e-12 guard) of the
    weighted vectors. Note cosine is *not* scale-invariant here because of
    the epsilon guards, so normalization is preserved exactly.
    """
    a_, b_ = _c(a), _c(b)
    avg_mag = F.zip_with(a_, b_, lambda x, y: (F.abs(x) + F.abs(y)) / F.lit(2.0) + F.lit(1e-12))
    w_raw_expr = F.transform(avg_mag, lambda m: F.lit(1.0) / (_phi_min_dist(m) + F.lit(1e-8)))
    # Every intermediate is let_col-bound (evaluated ONCE per pair).
    # The unbound form re-evaluated w_raw three times (w_sum, wa, wb),
    # w_sum PER ELEMENT inside both zip_with lambdas (an O(d²) fold),
    # and wa/wb twice each inside cosine's dot+norm — measured 5-10×
    # the arithmetic actually required. Binding changes evaluation
    # COUNT only, never the operations or their order, so the score
    # stays bit-identical to the DuckDB oracle and the Arrow twin
    # (pinned by the existing parity tests).
    return let_col(
        w_raw_expr,
        lambda w_raw: let_col(
            F.aggregate(w_raw, F.lit(0.0), lambda s, x: s + x) + F.lit(1e-12),
            lambda w_sum: let_col(
                F.zip_with(a_, w_raw, lambda x, w: x * (w / w_sum)),
                lambda wa: let_col(
                    F.zip_with(b_, w_raw, lambda x, w: x * (w / w_sum)),
                    lambda wb: cosine_col(wa, wb),
                ),
            ),
        ),
    )


METRICS: dict[str, Callable[[Column | str, Column | str], Column]] = {
    "cosine": cosine_col,
    "euclidean": euclidean_similarity_col,
    "dot": dot_col,
    "phi_weighted": phi_weighted_col,
}


def similarity_col(a: Column | str, b: Column | str, metric: str = "cosine") -> Column:
    """Metric dispatch (similarity.py:82-110): ValueError at plan-build time."""
    try:
        return METRICS[metric](a, b)
    except KeyError:
        raise ValueError(
            f"Unknown metric {metric!r}. "
            "Valid options: 'cosine', 'euclidean', 'dot', 'phi_weighted'."
        ) from None


def _phi_scores_sequential(mat: np.ndarray, qmat: np.ndarray) -> np.ndarray:
    """φ-weighted cosine for row-aligned (B, d) float64 matrices.

    Reductions are explicit left-to-right loops over the d axis (vectorized
    across the batch), NOT np.sum — np.sum uses pairwise summation, which
    differs in low-order bits from the SQL `aggregate` sequential fold.
    Keeping the fold order identical makes this path bit-identical to
    phi_weighted_col and to the DuckDB list_reduce oracle (verified).
    d is small (64 in the fixtures) so the Python-level loop costs nothing
    relative to the (B, d) vector ops inside it.
    """
    powers = np.asarray(PHI_POWERS, dtype=np.float64)
    avg_mag = (np.abs(mat) + np.abs(qmat)) / 2.0 + 1e-12
    min_d = np.abs(avg_mag[..., None] - powers).min(axis=-1)
    w = 1.0 / (min_d + 1e-8)
    b, d = mat.shape
    w_sum = np.zeros(b)
    for j in range(d):
        w_sum = w_sum + w[:, j]
    w_sum = w_sum + 1e-12
    wa = mat * (w / w_sum[:, None])
    wb = qmat * (w / w_sum[:, None])
    dot = np.zeros(b)
    na = np.zeros(b)
    nb = np.zeros(b)
    for j in range(d):
        dot = dot + wa[:, j] * wb[:, j]
        na = na + wa[:, j] * wa[:, j]
        nb = nb + wb[:, j] * wb[:, j]
    denom = np.sqrt(na) * np.sqrt(nb) + 1e-12
    return dot / denom


def phi_weighted_pair_pandas():
    """Arrow-vectorized φ-weighted scorer over (embedding, query) column
    pairs — the batch-search hot path (replaces the interpreted SQL-lambda
    expression, which is a ~200× scale-killer because higher-order
    functions are CodegenFallback). Bit-identical to phi_weighted_col via
    _phi_scores_sequential."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def score(a: pd.Series, b: pd.Series) -> pd.Series:
        mat = np.vstack(a.to_numpy()).astype(np.float64, copy=False)
        qmat = np.vstack(b.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(_phi_scores_sequential(mat, qmat))

    return score


def phi_weighted_pandas(query: Sequence[float]):
    """Arrow-vectorized φ-weighted scorer against a fixed query vector.

    Returns a pandas_udf(ARRAY<DOUBLE> -> DOUBLE). ~10-100× faster than
    row-at-a-time Python; used by search(impl='pandas'). Matches
    similarity.py:52-74 float64 math.
    """
    from pyspark.sql.types import DoubleType

    q = np.asarray(query, dtype=np.float64)

    @F.pandas_udf(DoubleType())
    def score(col: pd.Series) -> pd.Series:
        mat = np.vstack(col.to_numpy()).astype(np.float64, copy=False)
        qmat = np.broadcast_to(q, mat.shape)
        return pd.Series(_phi_scores_sequential(mat, qmat))

    return score
