"""Vector primitives as Column expressions over ARRAY<FLOAT>/ARRAY<DOUBLE>.

All math is performed in DOUBLE via SQL higher-order functions (zip_with /
aggregate / transform), which Catalyst evaluates JVM-side inside
whole-stage codegen — no Python in the hot path. Folds are sequential
left-to-right, which makes results reproducible and lets a DuckDB oracle
(list_reduce) match bit-for-bit.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: Column | str) -> Column:
    """Widen ARRAY<FLOAT> → ARRAY<DOUBLE> element-wise (exact widening)."""
    return F.transform(_c(col), lambda x: x.cast("double"))


def lit_vector(values: Sequence[float]) -> Column:
    """A query vector as a literal ARRAY<DOUBLE> column."""
    return F.array(*[F.lit(float(v)).cast("double") for v in values])


def dot_col(a: Column | str, b: Column | str) -> Column:
    """a·b as a sequential double fold (similarity.py:47-49 parity)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def sq_norm_col(a: Column | str) -> Column:
    """Σ x² (sequential fold)."""
    return F.aggregate(_c(a), F.lit(0.0), lambda s, x: s + x * x)


def l2_norm_col(a: Column | str) -> Column:
    """‖a‖₂ (clustering.py:110 parity)."""
    return F.sqrt(sq_norm_col(a))


def l2_normalize_col(a: Column | str, eps: float = 1e-12) -> Column:
    """Unit-normalize a vector; zero vectors stay (near-)zero via eps guard."""
    arr = _c(a)
    norm = l2_norm_col(arr) + F.lit(eps)
    return F.transform(arr, lambda x: x / norm)
