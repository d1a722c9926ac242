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




def _sql_entry_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL distinct-token sketch as PURE SQL TEXT — every stage of
    the register pipeline (tokenize, sha256 window fold via conv,
    register/rho bit math, exact-integer harmonic denominator,
    correction branch) is expressible in Spark SQL, and the result
    shares `doc_hll_distinct`'s oracle: SQL path ≡ DataFrame path ≡
    DuckDB, three surfaces one answer."""
    from aeuc_vector_db_spark.operators.sketch import (
        HLL_ALPHA,
        HLL_M,
        HLL_P,
        HLL_W,
    )
    from aeuc_vector_db_spark.operators.text import TOKEN_SPLIT_RE

    register_sql_api(spark, sf_dir)
    shift = HLL_W + 1
    num = HLL_ALPHA * HLL_M * HLL_M * float(1 << shift)
    return spark.sql(f"""
WITH tok AS (
  SELECT explode(filter(split(lower(text), '{TOKEN_SPLIT_RE}'), x -> x != '')) AS term
  FROM documents
),
hv AS (SELECT CAST(conv(substring(sha2(term, 256), 1, 8), 16, 10) AS BIGINT) AS h FROM tok),
rr AS (
  SELECT pmod(h, {HLL_M}) AS register,
         CASE WHEN shiftright(h, {HLL_P}) = 0 THEN {shift}
              ELSE {shift} - length(conv(shiftright(h, {HLL_P}), 10, 2)) END AS rho
  FROM hv
),
regs AS (SELECT register, MAX(rho) AS maxrho FROM rr GROUP BY register),
agg AS (
  SELECT COUNT(*) AS n_present,
         SUM(shiftleft(CAST(1 AS BIGINT), {shift} - maxrho)) AS s_present
  FROM regs
),
est AS (
  SELECT ({HLL_M} - n_present) AS v_zero,
         s_present + ({HLL_M} - n_present) * shiftleft(CAST(1 AS BIGINT), {shift}) AS s_scaled
  FROM agg
),
fin AS (
  SELECT CASE WHEN ({num!r} / CAST(s_scaled AS DOUBLE)) <= {2.5 * HLL_M!r} AND v_zero > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(v_zero AS DOUBLE))
              ELSE ({num!r} / CAST(s_scaled AS DOUBLE)) END AS hll_estimate,
         v_zero, s_scaled
  FROM est
)
SELECT (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) FROM tok) AS n_distinct_exact,
       ROUND(hll_estimate, 2) AS hll_estimate,
       CAST(v_zero AS BIGINT) AS n_zero_registers,
       CAST(s_scaled AS BIGINT) AS s_scaled
FROM fin
""")


def _hll_shared_oracle() -> str:
    from aeuc_vector_db_spark.queries.textops import _HLL_DISTINCT_ORACLE

    return _HLL_DISTINCT_ORACLE


QUERIES = {
    "sql_entry_pricing": (_sql_entry_pricing, _PRICING_ORACLE),
    "sql_entry_knn_cosine": (_sql_entry_knn_cosine, _knn_oracle(_dk_cosine)),
    "sql_entry_hll_distinct": (_sql_entry_hll_distinct, _hll_shared_oracle()),
}
