"""Declared queries exercising the SQL ENTRY POINT (sql_api.py).

Both queries run entirely through `spark.sql(...)` text — parser →
analyzer → Catalyst — against the temp views and SQL scalar functions
`register_sql_api` installs. Each shares its oracle with the
DataFrame-path twin (`rel_pricing_summary` / `knn_cosine_topk`), so a
hash match pins that the SQL surface and the DataFrame surface are the
same engine: same decimal arithmetic, same double fold order, same
tie-breaking.

Reference analog: the reference has one entry point (Python methods,
reference vector_field.py:291); the engine has two equivalent ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aeuc_vector_db_spark.queries.core import QUERY_FILTER, _dk_cosine, _knn_oracle
from aeuc_vector_db_spark.queries.relational import _ONE, _PRICING_ORACLE
from aeuc_vector_db_spark.sql_api import register_sql_api


def _sql_entry_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary as PURE SQL TEXT — the same
    decimal-cast arithmetic as the DataFrame twin, so the shared oracle
    (`_PRICING_ORACLE`) must hash-match both."""
    register_sql_api(spark, sf_dir)
    return spark.sql(f"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))) AS sd,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))
             * ({_ONE} + CAST(l_tax AS DECIMAL(3,2)))) AS sc,
         CAST(COUNT(*) AS BIGINT) AS count_order
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(sq AS DOUBLE) AS sum_qty,
       CAST(sp AS DOUBLE) AS sum_base_price,
       ROUND(CAST(sd AS DOUBLE), 2) AS sum_disc_price,
       ROUND(CAST(sc AS DOUBLE), 2) AS sum_charge,
       ROUND(CAST(sq AS DOUBLE) / count_order, 6) AS avg_qty,
       ROUND(CAST(sp AS DOUBLE) / count_order, 6) AS avg_price,
       count_order
FROM agg
""")


def _sql_entry_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN as PURE SQL TEXT through the registered `cosine_sim`
    SQL scalar function (JVM-side expression expansion, no Python).
    Shares `knn_cosine_topk`'s oracle — SQL path ≡ DataFrame path,
    bit-for-bit, down to the (score DESC, vec_id ASC) tie-break."""
    register_sql_api(spark, sf_dir)
    return spark.sql(f"""
WITH q AS (
  SELECT vec_id AS query_id, to_double_vec(embedding) AS qv
  FROM embeddings WHERE {QUERY_FILTER}
), c AS (
  SELECT vec_id, to_double_vec(embedding) AS cv FROM embeddings
), scored AS (
  SELECT q.query_id, c.vec_id, cosine_sim(cv, qv) AS s
  FROM c CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, ROUND(s, 9) AS score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
""")


QUERIES = {
    "sql_entry_pricing": (_sql_entry_pricing, _PRICING_ORACLE),
    "sql_entry_knn_cosine": (_sql_entry_knn_cosine, _knn_oracle(_dk_cosine)),
}
