"""JSONL import/export (reference parity: A20-A21, vector_field.py:396-446).

- export: all rows as JSONL ordered by timestamp (vector_field.py:402-405).
- import: explicit schema (never inferSchema in prod), silent skip of
  wrong-dim rows (vector_field.py:439-440), duplicate handling:
  skip when overwrite=False (left_anti), replace when True
  (vector_field.py:431-435). Returns the new corpus plus the imported
  count for the single batch-level audit record (vector_field.py:445).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aeuc_vector_db_spark.schemas import valid_embedding


def export_jsonl(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """A20: ordered JSONL export. Note Spark writes a directory of part
    files; within-file order follows the sort. For byte-stream parity with
    the reference use export_jsonl_string (driver-side, small data only)."""
    df.orderBy(F.col(ts_col).asc()).write.mode("overwrite").json(path)


def export_jsonl_string(df: DataFrame, ts_col: str = "ts") -> str:
    """A20 exact analog (vector_field.py:396-406): one JSONL string,
    timestamp-ordered. Collects — test/small-scale convenience only."""
    rows = df.orderBy(F.col(ts_col).asc()).toJSON().collect()
    return "\n".join(rows)


def import_jsonl(
    spark: SparkSession,
    path_or_lines: str | list[str],
    existing: DataFrame | None,
    schema: T.StructType,
    dim: int,
    id_col: str = "iglyph_id",
    vec_col: str = "embedding",
    overwrite: bool = False,
) -> tuple[DataFrame, int]:
    """A21: bulk JSONL import. Returns (new_corpus, imported_count)."""
    if isinstance(path_or_lines, list):
        incoming = spark.read.schema(schema).json(spark.sparkContext.parallelize(path_or_lines))
    else:
        incoming = spark.read.schema(schema).json(path_or_lines)

    # silent skip of wrong-dim rows (vector_field.py:439-440)
    incoming = incoming.filter(valid_embedding(vec_col, dim))
    # blank/corrupt lines parse to all-null rows with an explicit schema
    incoming = incoming.filter(F.col(id_col).isNotNull())

    if existing is None:
        imported = incoming
        merged = incoming
    elif overwrite:
        imported = incoming
        kept = existing.join(incoming.select(id_col), id_col, "left_anti")
        merged = kept.unionByName(incoming, allowMissingColumns=True)
    else:
        imported = incoming.join(existing.select(id_col), id_col, "left_anti")
        merged = existing.unionByName(imported, allowMissingColumns=True)

    return merged, imported.count()
