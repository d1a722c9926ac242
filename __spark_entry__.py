"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything delegates to the aeuc_vector_db_spark query registry
(aeuc_vector_db_spark/queries/__init__.py), which aggregates the
per-area modules (core vector ops, relational, text/dedup, ANN,
streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import aeuc_vector_db_spark.queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: batched top-10 cosine k-NN over the sf0.001
    embeddings corpus (SURVEY.md §2.A A1 — the engine's spine)."""
    return Q.queries()["knn_cosine_topk"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return Q.oracle_sql()
