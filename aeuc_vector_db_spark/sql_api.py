"""SQL entry point for the engine (SURVEY.md §4.3's declared nicety).

Everything the engine exposes as Column-builders is reachable from SQL
TEXT too: `register_sql_api` creates temp views over the engine tables
and registers the similarity metrics as Spark SQL *scalar functions*
(`CREATE TEMPORARY FUNCTION ... RETURN <expr>` — SQL-defined, expanded
into the plan and evaluated JVM-side inside whole-stage codegen, NOT
Python UDFs). A user can then drive the engine entirely through
`spark.sql(...)`:

    register_sql_api(spark, sf_dir)
    spark.sql("SELECT vec_id, cosine_sim(to_double_vec(embedding), qv) ...")

The function bodies are textually the same expressions the Column
builders in functions/vector.py / functions/similarity.py produce
(sequential left-to-right double folds), so SQL-path results are
bit-identical to DataFrame-path results — pinned by the
`sql_entry_knn_cosine` declared query sharing `knn_cosine_topk`'s
oracle.

Reference analog: the reference's only query surface is Python method
calls (reference vector_field.py:291-326); the SQL surface is the
engine's second, equivalent entry point.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: SQL scalar function definitions — bodies mirror functions/vector.py
#: (dot_col/sq_norm_col) and functions/similarity.py (cosine_col,
#: euclidean_*_col) exactly: same fold order, same epsilon guards.
_SQL_FUNCTIONS: tuple[str, ...] = (
    """CREATE OR REPLACE TEMPORARY FUNCTION to_double_vec(a ARRAY<FLOAT>)
       RETURNS ARRAY<DOUBLE>
       RETURN transform(a, x -> CAST(x AS DOUBLE))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION dot_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
       RETURNS DOUBLE
       RETURN aggregate(zip_with(a, b, (x, y) -> x * y),
                        CAST(0.0 AS DOUBLE), (s, x) -> s + x)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
       RETURNS DOUBLE
       RETURN aggregate(zip_with(a, b, (x, y) -> x * y),
                        CAST(0.0 AS DOUBLE), (s, x) -> s + x)
              / (sqrt(aggregate(a, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))
                 * sqrt(aggregate(b, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))
                 + 1e-12)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION euclidean_dist(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
       RETURNS DOUBLE
       RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                             CAST(0.0 AS DOUBLE), (s, x) -> s + x))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION euclidean_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
       RETURNS DOUBLE
       RETURN 1.0 / (1.0 + sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                                          CAST(0.0 AS DOUBLE), (s, x) -> s + x)))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION l2_norm(a ARRAY<DOUBLE>)
       RETURNS DOUBLE
       RETURN sqrt(aggregate(a, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))""",
)

#: the engine tables a SQL session sees (same set the DuckDB oracle
#: pre-registers)
TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_sql_functions(spark: SparkSession) -> None:
    """Register the metric scalar functions (session-scoped, JVM-side)."""
    for ddl in _SQL_FUNCTIONS:
        spark.sql(ddl)


def register_sql_api(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for every engine table at `sf_dir` + the metric
    functions: after this, the whole declared-query surface is
    reachable through `spark.sql`."""
    from aeuc_vector_db_spark.sources.tables import load_table

    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    register_sql_functions(spark)
