"""Skew-handling utilities for hot-key joins and aggregations.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in
session.py) handles sort-merge skew automatically at runtime; these
helpers cover the cases AQE can't:

- `salted_join`: a shuffle join where one side has a few pathologically
  hot keys (e.g. the empty-document shingle bucket, a default label).
  The hot side gets a deterministic salt in [0, buckets); the small side
  is replicated once per salt value. The join key becomes (key, salt),
  spreading each hot key over `buckets` reducers. Results are identical
  to the unsalted join (verified in tests) — salting only changes the
  partitioning.
- `two_phase_agg`: partial aggregation by (key, salt) then final by key
  — the classic hot-key aggregation split. Spark's own partial
  HashAggregate already does map-side combine; the explicit form helps
  when the combine ratio is poor (e.g. count-distinct-like states) and
  one reducer key still dominates.

Salts are deterministic (pmod of xxhash64 over a uniqueness column or
the row's own key tuple), never rand() — results must stay reproducible
and retry-safe (a rand() salt changes on task retry and corrupts joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, unique_cols: list[str]) -> DataFrame:
    """Deterministic salt column in [0, buckets) from the unique columns."""
    return df.withColumn(
        "__salt__", F.pmod(F.xxhash64(*[F.col(c) for c in unique_cols]), F.lit(buckets))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
    unique_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join with hot-key salting: large side salted, small side replicated.

    `unique_cols` default to [key] — pass the row's unique id when many
    rows share the key (the point of salting) so the salt actually
    spreads them. Output columns = plain join's (salt dropped).

    Only large-side-preserving joins are allowed: under right/full outer,
    an unmatched small-side row would surface once per salt replica —
    `buckets` copies instead of one.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full outer would duplicate unmatched small-side rows per salt"
        )
    uniq = unique_cols or [key]
    salted_large = with_salt(large, buckets, uniq)
    salts = small.sparkSession.range(buckets).select(F.col("id").cast("long").alias("__salt__"))
    replicated_small = small.crossJoin(F.broadcast(salts))
    return salted_large.join(replicated_small, [key, "__salt__"], how).drop("__salt__")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    buckets: int = 8,
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Hot-key sum/count via (key, salt) partial agg → key final agg."""
    uniq = unique_cols or [key, agg_col]
    salted = with_salt(df, buckets, uniq)
    partial = salted.groupBy(key, "__salt__").agg(
        F.sum(agg_col).alias("__psum__"), F.count(F.lit(1)).alias("__pcnt__")
    )
    return partial.groupBy(key).agg(
        F.sum("__psum__").alias(f"sum_{agg_col}"), F.sum("__pcnt__").alias("count")
    )
