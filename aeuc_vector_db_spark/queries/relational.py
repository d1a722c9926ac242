"""Relational declared queries over the TPC-H-ish fixtures (SURVEY.md §2.B).

The reference has no relational surface (it is a vector store), but the
engine's Spark substrate must supply joins / aggregations / windows / set
ops / top-k as first-class operators (SURVEY §2.B "what Spark must
supply"). Each query here exercises one category and is oracled against
DuckDB.

Determinism strategy for float aggregates: money columns are 2-decimal
doubles (FIXTURES.md); we cast per-row to DECIMAL before summing so the
aggregation is exact integer arithmetic — order-independent across any
partitioning, and identical between Spark and DuckDB. Averages divide the
exact decimal sum by the exact count in double at the end.

Plan-shape notes (the 100 TB design points, visible in .explain):
- dimension joins (region/nation/customer) broadcast — no shuffle of the
  fact table for the dim side;
- aggregations are partial+final HashAggregate (map-side combine);
- top-k is TakeOrderedAndProject (per-partition heap, driver merge), not
  a global sort;
- semi/anti joins never materialize the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.bloomjoin import bloom_reduced_join
from aeuc_vector_db_spark.sources.tables import load_table


def _dec(col, prec: int = 18, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})") if isinstance(col, str) else col.cast(
        f"decimal({prec},{scale})"
    )


_ONE = "CAST(1.00 AS DECIMAL(3,2))"


# ---------------------------------------------------------------------------
# Q1-style pricing summary: full-scan groupBy agg (partial+final), the
# canonical "does map-side combine happen" probe.
# ---------------------------------------------------------------------------

def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc = F.expr(f"CAST(l_discount AS DECIMAL(3,2))")
    tax = F.expr(f"CAST(l_tax AS DECIMAL(3,2))")
    price = F.expr("CAST(l_extendedprice AS DECIMAL(18,2))")
    qty = F.expr("CAST(l_quantity AS DECIMAL(18,2))")
    one = F.expr(_ONE)
    agg = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("_sq"),
            F.sum(price).alias("_sp"),
            F.sum(price * (one - disc)).alias("_sd"),
            F.sum(price * (one - disc) * (one + tax)).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sp").cast("double").alias("sum_base_price"),
        F.round(F.col("_sd").cast("double"), 2).alias("sum_disc_price"),
        F.round(F.col("_sc").cast("double"), 2).alias("sum_charge"),
        F.round(F.col("_sq").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.col("_sp").cast("double") / n, 6).alias("avg_price"),
        "count_order",
    )


_PRICING_ORACLE = f"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))) AS sd,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))
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
"""


# ---------------------------------------------------------------------------
# Q3-style: fact⋈fact⋈dim with a selective dim filter, grouped revenue,
# top-10. customer is broadcast; top-k is TakeOrderedAndProject.
# ---------------------------------------------------------------------------

def _top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    rev = F.expr(
        f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    )
    return (
        joined.groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(rev).alias("_rev"))
        .select(
            "o_orderkey",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_TOP_REVENUE_ORACLE = f"""
SELECT o_orderkey,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue,
       o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q5-style: snowflake join through two broadcast dims, revenue per nation.
# ---------------------------------------------------------------------------

def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    rev = F.expr(
        f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
    )
    dims = F.broadcast(
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("c_custkey", "n_name")
    )
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).join(
        dims, orders["o_custkey"] == dims["c_custkey"]
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("n_lineitems"))
        .select("n_name", F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
                "n_lineitems")
    )


_REVENUE_NATION_ORACLE = f"""
SELECT n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Window: top-3 orders per customer by totalprice (row_number per group).
# ---------------------------------------------------------------------------

def _top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            F.col("rn").cast("long").alias("rn"),
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
        )
    )


_TOP_PER_CUSTOMER_ORACLE = """
SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice AS totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Anti join (set op): parts never ordered at near-max quantity (>= 48),
# counted by brand. (Plain "never ordered" is degenerate on the fixtures —
# every part has 14+ lineitems — so the probe side is filtered to keep the
# anti join non-trivially selective.)
# ---------------------------------------------------------------------------

def _parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") >= 48)
    never = part.join(li.select("l_partkey"), part["p_partkey"] == li["l_partkey"], "left_anti")
    return never.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_parts"))


_PARTS_NEVER_ORACLE = """
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part ANTI JOIN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48) li
  ON p_partkey = l_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Semi join + EXISTS semantics (Q4-style): orders with at least one late
# lineitem, counted by priority.
# ---------------------------------------------------------------------------

def _late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey").distinct()
    hit = orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_LATE_PRIORITY_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Grouped agg with HAVING: customers whose total spend clears a threshold.
# ---------------------------------------------------------------------------

def _high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).alias("_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("_spend") > 2_000_000)
    )
    return spend.join(F.broadcast(cust), spend["o_custkey"] == cust["c_custkey"]).select(
        "c_custkey",
        "c_name",
        F.col("_spend").cast("double").alias("total_spend"),
        "n_orders",
    )


_HIGH_VALUE_ORACLE = """
SELECT c_custkey, c_name, CAST(spend AS DOUBLE) AS total_spend, n_orders
FROM (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
  HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 2000000
) JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Broadcast-dim rollup: average account balance per (region, nation).
# ---------------------------------------------------------------------------

def _acctbal_by_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    joined = cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]).join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    )
    agg = joined.groupBy("r_name", "n_name").agg(
        F.sum(F.expr("CAST(c_acctbal AS DECIMAL(18,2))")).alias("_s"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    return agg.select(
        "r_name",
        "n_name",
        F.round(F.col("_s").cast("double") / F.col("n_customers"), 6).alias("avg_acctbal"),
        "n_customers",
    )


_ACCTBAL_ORACLE = """
SELECT r_name, n_name,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_acctbal,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Date/scalar functions + distinct counting: monthly order stats.
# ---------------------------------------------------------------------------

def _orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_custkey",
            F.expr("CAST(o_totalprice AS DECIMAL(18,2))").alias("_p"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.sum("_p").cast("double").alias("total_price"),
        )
    )


_ORDERS_MONTH_ORACLE = """
SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY month
"""


# ---------------------------------------------------------------------------
# Rollup: region → nation hierarchy totals (NULL levels tagged 'ALL' so the
# output is engine-agnostic — grouping_id bit conventions differ).
# ---------------------------------------------------------------------------

def _rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    joined = cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]).join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    )
    agg = joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.expr("CAST(c_acctbal AS DECIMAL(18,2))")).alias("_s"),
    )
    return agg.select(
        F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
        F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
        "n_customers",
        F.col("_s").cast("double").alias("total_acctbal"),
    )


_ROLLUP_ORACLE = """
SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# Cube over two low-cardinality dims.
# ---------------------------------------------------------------------------

def _cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    agg = orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return agg.select(
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
        "n_orders",
    )


_CUBE_ORACLE = """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# Set ops: INTERSECT / EXCEPT on customer-activity sets across years.
# ---------------------------------------------------------------------------

def _customers_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    y = F.year("o_orderdate")
    c95 = orders.filter(y == 1995).select("o_custkey")
    c96 = orders.filter(y == 1996).select("o_custkey")
    both = c95.intersect(c96)          # INTERSECT (distinct semantics)
    only95 = c95.subtract(c96)         # EXCEPT DISTINCT
    return both.agg(F.count(F.lit(1)).alias("both_years")).crossJoin(
        only95.agg(F.count(F.lit(1)).alias("only_1995"))
    )


_SET_OPS_ORACLE = """
WITH c95 AS (SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS TIMESTAMP)) = 1995),
c96 AS (SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS TIMESTAMP)) = 1996),
both_y AS (SELECT DISTINCT o_custkey FROM c95 INTERSECT SELECT DISTINCT o_custkey FROM c96),
only95 AS (SELECT DISTINCT o_custkey FROM c95 EXCEPT SELECT DISTINCT o_custkey FROM c96)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM both_y) AS both_years,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM only95) AS only_1995
"""


# ---------------------------------------------------------------------------
# As-of join (charter custom-operator example — Spark has no native ASOF):
# for each event, the customer's most recent order at event time.
# Composition: equi-join on the key, anti-time filter, then a row_number
# window picking the latest (the per-key order count is bounded, so the
# join fan-out is modest; at scale, bucket both sides by the key and use
# a range-partitioned sort within buckets).
# ---------------------------------------------------------------------------

def _asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 500)
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    joined = ev.join(orders, ev["user_id"] == orders["o_custkey"], "inner").filter(
        F.col("o_orderdate") <= F.col("ts")
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "o_orderkey",
            # o_orderdate may arrive TIMESTAMP_NTZ; session TZ is UTC so
            # the cast to TIMESTAMP is identity
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_date_us"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# Same explicit formulation (not DuckDB's native ASOF) so the tie-break
# (o_orderdate DESC, o_orderkey DESC) is pinned identically.
_ASOF_ORACLE = """
WITH j AS (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         CAST(o.o_orderdate AS TIMESTAMP) AS od, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o ON e.user_id = o.o_custkey
  WHERE e.event_id < 500 AND CAST(o.o_orderdate AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
)
SELECT event_id, user_id, o_orderkey,
       CAST(epoch_us(od) AS BIGINT) AS order_date_us,
       o_totalprice AS totalprice
FROM j WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Exact interpolated percentiles per group (deterministic in both engines:
# same sorted-order linear interpolation).
# ---------------------------------------------------------------------------

def _price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99"),
        )
    )


_PERCENTILES_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Pivot: order counts by priority × status (explicit value list so the
# output schema is static — required for plan caching and the oracle).
# ---------------------------------------------------------------------------

def _pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Range join (charter custom-op example): orders from the same customer
# within 30 days of each other. Equi-join on the key bounds the fan-out;
# the range predicate filters within each key group (at scale: bucket by
# key, range-partition by date within buckets).
# ---------------------------------------------------------------------------

def _orders_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    a = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderdate").alias("a_date"),
    )
    b = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_date"),
    )
    pairs = (
        a.join(b, "custkey")
        .filter(
            (F.col("a_key") < F.col("b_key"))
            & (F.abs(F.datediff(F.col("a_date"), F.col("b_date"))) <= 30)
        )
    )
    return pairs.groupBy("custkey").agg(F.count(F.lit(1)).alias("n_close_pairs"))


_RANGE_JOIN_ORACLE = """
SELECT a.o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_close_pairs
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND abs(date_diff('day', CAST(b.o_orderdate AS TIMESTAMP),
                   CAST(a.o_orderdate AS TIMESTAMP))) <= 30
GROUP BY a.o_custkey
"""


# ---------------------------------------------------------------------------
# Skew-handling join: a planted hot key spread by deterministic salting.
# ---------------------------------------------------------------------------

def _skew_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join under planted skew: ~86% of lineitem rows are
    remapped to ONE supplier key (the hot key every real pipeline
    eventually meets — a default value, an empty document, a null
    stand-in), then joined to supplier through `salted_join`: the large
    side is salted on its unique line id, the small side replicated per
    salt, so the hot key fans across `buckets` reducers instead of one
    straggler. AQE's skew-join split (on in session.py) handles this
    adaptively for sort-merge plans at runtime scale; the salted form is
    the explicit, always-on variant and its results must equal the plain
    join's — which is exactly what the oracle checks (same remap + plain
    join in DuckDB)."""
    from aeuc_vector_db_spark.operators.skew import salted_join

    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    large = li.withColumn(
        "skew_key",
        F.when(F.col("l_suppkey") % 7 != 0, F.lit(1).cast("long"))
        .otherwise(F.col("l_suppkey").cast("long")),
    )
    rev = F.expr(
        f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
    )
    joined = salted_join(
        large,
        sup.select(F.col("s_suppkey").cast("long").alias("skew_key"), "s_nationkey"),
        key="skew_key",
        buckets=8,
        unique_cols=["l_orderkey", "l_linenumber"],
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("n_lineitems"))
        .select(
            F.col("s_nationkey").cast("long").alias("s_nationkey"),
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
            "n_lineitems",
        )
    )


_SKEW_SALTED_ORACLE = f"""
WITH remapped AS (
  SELECT CASE WHEN l_suppkey % 7 <> 0 THEN 1 ELSE l_suppkey END AS skew_key,
         l_extendedprice, l_discount
  FROM lineitem
)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM remapped JOIN supplier ON skew_key = s_suppkey
GROUP BY s_nationkey
"""


# ---------------------------------------------------------------------------
# Histogram quantile sketch (round 7): the deterministic alternative to
# approx_percentile — equi-width bucket counts (exact integers,
# mergeable by addition in any order, shuffle ≤ 256 rows/partition) +
# in-bucket linear interpolation. Error ≤ one bucket width; every
# arithmetic step mirrors in DuckDB so the ESTIMATES hash-match, which
# a randomized sketch can never do.
# ---------------------------------------------------------------------------

_HQ_BINS = 256
_HQ_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aeuc_vector_db_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    orders = load_table(spark, "orders", sf_dir)
    sk = histogram_sketch(orders, "o_totalprice", bins=_HQ_BINS)
    res = histogram_quantiles(sk, list(_HQ_QS), bins=_HQ_BINS)
    return res.select(
        F.round("q", 2).alias("q"), F.round("est", 6).alias("est"), "n"
    )


_HQ_ORACLE = f"""
WITH v AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders WHERE o_totalprice IS NOT NULL
),
b AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM v),
bk AS (
  SELECT CAST(CASE WHEN hi = lo THEN 0
              ELSE least(greatest(floor((v - lo) / (hi - lo) * {float(_HQ_BINS)!r}), 0), {_HQ_BINS - 1}) END AS INT) AS bucket,
         COUNT(*) AS cnt, MIN(lo) AS lo, MIN(hi) AS hi
  FROM v CROSS JOIN b GROUP BY 1
),
cum AS (
  SELECT bucket, cnt, lo, hi,
         SUM(cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER () AS n
  FROM bk
),
qs AS (SELECT unnest([{", ".join(f"CAST({q!r} AS DOUBLE)" for q in _HQ_QS)}]) AS q),
hit AS (
  SELECT q, bucket, cnt, lo, hi, cum, n
  FROM cum CROSS JOIN qs
  WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)
    AND CAST(cum - cnt AS DOUBLE) < q * CAST(n AS DOUBLE)
)
SELECT ROUND(q, 2) AS q,
       ROUND(lo + (CAST(bucket AS DOUBLE)
                   + (q * CAST(n AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                     / CAST(cnt AS DOUBLE))
                  * ((hi - lo) / {float(_HQ_BINS)!r}), 6) AS est,
       CAST(n AS BIGINT) AS n
FROM hit
"""


# ---------------------------------------------------------------------------
# Volume shipping (round 7; TPC-H Q7 shape): revenue flowing between two
# specific nations in either direction, per ship year — the 6-table
# multi-join breadth test. Plan: every dimension chain (supplier→nation,
# customer→nation via orders) broadcasts; the lineitem fact never
# shuffles for dimension resolution; decimal-exact revenue sums keep the
# aggregate order-independent.
# ---------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_1", "NATION_2")


def _volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    rev = F.expr(
        f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
    )
    # the nation-pair predicate implies BOTH endpoints lie in {a, b}:
    # filtering the nation dims up front (round 9) shrinks the supplier/
    # customer dims to the two nations' members and — decisively at
    # scale — the broadcast orders dim to only those customers' orders,
    # instead of broadcasting EVERY order and filtering after the join.
    # The cross-pair filter below is unchanged, so semantics hold.
    a, b = _Q7_NATIONS
    pair = F.col("n_name").isin(a, b)
    n1 = nation.filter(pair).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(pair).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sdim = F.broadcast(
        supp.join(F.broadcast(n1), supp["s_nationkey"] == n1["s_nk"]).select(
            "s_suppkey", "supp_nation"
        )
    )
    cdim = F.broadcast(
        cust.join(F.broadcast(n2), cust["c_nationkey"] == n2["c_nk"]).select(
            "c_custkey", "cust_nation"
        )
    )
    odim = F.broadcast(
        orders.join(cdim, orders["o_custkey"] == cdim["c_custkey"]).select(
            "o_orderkey", "cust_nation"
        )
    )
    joined = (
        li.join(sdim, li["l_suppkey"] == sdim["s_suppkey"])
        .join(odim, li["l_orderkey"] == odim["o_orderkey"])
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("n_lineitems"))
        .select(
            "supp_nation", "cust_nation",
            F.col("ship_year").cast("long").alias("ship_year"),
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
            F.col("n_lineitems").cast("long").alias("n_lineitems"),
        )
    )


_VOLUME_SHIPPING_ORACLE = f"""
SELECT supp_nation, cust_nation, CAST(ship_year AS BIGINT) AS ship_year,
       ROUND(CAST(SUM(vol) AS DOUBLE), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(CAST(l_shipdate AS TIMESTAMP)) AS ship_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * ({_ONE} - CAST(l_discount AS DECIMAL(3,2))) AS vol
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}')
     OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}')
)
GROUP BY supp_nation, cust_nation, ship_year
"""


# ---------------------------------------------------------------------------
# Data-quality operators (round 7): cross-table referential audit and
# distribution-drift monitoring — the nightly checks a 100 TB warehouse
# runs beside its single-table CHECK constraints.
# ---------------------------------------------------------------------------


def _fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ∪ planted orphans/nulls audited against customer: the
    anti-join must count exactly the planted rows (the fixture itself
    is FK-clean — asserted by construction through the oracle)."""
    from aeuc_vector_db_spark.operators.curation import referential_violations

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    # deterministic planting (a bare limit() picks partition-order-lucky
    # rows and the orphan-key sample would depend on which)
    planted = orders.filter(F.col("o_orderkey") % 997 == 0).select(
        *[
            (F.col("o_custkey") + F.lit(10_000_000)).alias("o_custkey")
            if c == "o_custkey"
            else F.col(c)
            for c in orders.columns
        ]
    )
    nulls = orders.filter(F.col("o_orderkey") % 997 == 1).select(
        *[
            F.lit(None).cast("long").alias("o_custkey")
            if c == "o_custkey"
            else F.col(c)
            for c in orders.columns
        ]
    )
    child = orders.unionByName(planted).unionByName(nulls)
    return referential_violations(child, cust, "o_custkey", "c_custkey")


_FK_ORACLE = """
WITH child AS (
  SELECT o_custkey FROM orders
  UNION ALL
  SELECT o_custkey + 10000000 AS o_custkey FROM orders WHERE o_orderkey % 997 = 0
  UNION ALL
  SELECT CAST(NULL AS BIGINT) AS o_custkey FROM orders WHERE o_orderkey % 997 = 1
),
orphans AS (
  SELECT o_custkey FROM child
  WHERE o_custkey IS NOT NULL
    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orphans) AS n_orphans,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM child WHERE o_custkey IS NULL) AS n_null_keys,
       (SELECT string_agg(CAST(k AS VARCHAR), ',' ORDER BY k)
        FROM (SELECT DISTINCT o_custkey AS k FROM orphans ORDER BY k LIMIT 5)) AS orphan_key_sample
"""


def _order_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between the o_totalprice distributions
    of the even- and odd-orderkey halves, from two 64-bucket sketches
    with common bounds. Exact-integer numerator ⇒ hash-exact drift."""
    from aeuc_vector_db_spark.operators.curation import histogram_drift

    orders = load_table(spark, "orders", sf_dir)
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    b = orders.filter(F.col("o_orderkey") % 2 == 1)
    res = histogram_drift(a, b, "o_totalprice", bins=64)
    return res.select(F.round("tvd", 9).alias("tvd"), "n_a", "n_b")


_DRIFT_ORACLE = """
WITH v AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v, o_orderkey % 2 AS half
  FROM orders WHERE o_totalprice IS NOT NULL
),
b AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM v),
bk AS (
  SELECT half,
         CAST(CASE WHEN hi = lo THEN 0
              ELSE least(greatest(floor((v - lo) / (hi - lo) * 64.0), 0), 63) END AS INT) AS bucket,
         COUNT(*) AS cnt
  FROM v CROSS JOIN b GROUP BY 1, 2
),
cells AS (
  SELECT COALESCE(a.bucket, bb.bucket) AS bucket,
         COALESCE(a.cnt, 0) AS ca, COALESCE(bb.cnt, 0) AS cb
  FROM (SELECT bucket, cnt FROM bk WHERE half = 0) a
  FULL OUTER JOIN (SELECT bucket, cnt FROM bk WHERE half = 1) bb
    ON a.bucket = bb.bucket
),
tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM cells)
SELECT ROUND(CAST(SUM(abs(ca * n_b - cb * n_a)) AS DOUBLE)
             / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 9) AS tvd,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
FROM cells CROSS JOIN tot
GROUP BY n_a, n_b
"""


def _bloom_semijoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction (operators/bloomjoin.py): order revenue
    per priority for customers in the BUILDING segment, with the orders
    side pre-filtered by a bloom filter over the qualifying customer
    keys BEFORE the join — the large⋈large shape where the build side's
    key set compresses to 32 KB of bits even when its rows don't
    broadcast. The oracle is the PLAIN join: any bloom false negative
    (dropped match) or probe miswiring diverges the hash; false
    positives are removed by the real join by construction."""
    orders = load_table(spark, "orders", sf_dir)
    cust = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    joined = bloom_reduced_join(orders, cust, "o_custkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dec(F.sum(_dec("o_totalprice"))).alias("sum_price"),
    )


_BLOOM_SEMIJOIN_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Correlated-subquery shapes (TPC-H Q4/Q17/Q21/Q22). The DataFrame API has
# no correlated subqueries, so each is written in its DECORRELATED form —
# the plan Catalyst's subquery rewrite would produce, made explicit:
# EXISTS → left-semi join, NOT EXISTS → left-anti join, correlated scalar
# aggregate → grouped aggregate + equi-join. Correlated comparisons against
# an average are rewritten exactly (qty < avg ⇔ qty·n < sum, all DECIMAL)
# so Spark and DuckDB agree bit-for-bit with no float-division boundary.
# At 100 TB: the semi/anti probes never materialize the probe side, the
# per-part aggregate is partial+final on the same join key it then joins
# on, and every dimension side broadcasts.
# ---------------------------------------------------------------------------


def _exists_late_shipment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders placed in 1996H1 with at least one lineitem
    shipped >60 days after the order date, counted per priority. The
    EXISTS decorrelates to ONE left-semi hash join on the order key with
    the date inequality as a join filter — the probe (lineitem) is never
    materialized into the output, and the semi short-circuits on first
    match per order."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_EXISTS_LATE_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def _small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from Brand#4 lineitems whose quantity is
    below 20% of that part's average quantity. The correlated scalar
    AVG decorrelates to a per-part grouped aggregate joined back on the
    part key; `qty < 0.2·avg` is rewritten exactly as `qty·5·n < sum`
    in DECIMAL (no float division, no boundary drift). Lineitem is
    semi-filtered to the brand's parts FIRST (broadcast, 96 keys), so
    both the aggregate and the join run over the reduced set — at scale
    the full-corpus pass never happens."""
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select(
            "l_partkey",
            F.col("l_quantity").cast("decimal(9,2)").alias("qd"),
            _dec("l_extendedprice").alias("pd"),
        )
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qd").alias("sq"), F.count(F.lit(1)).cast("decimal(9,0)").alias("nq")
    )
    flt = li.join(F.broadcast(per_part), "l_partkey").filter(
        F.col("qd") * F.lit(5).cast("decimal(1,0)") * F.col("nq") < F.col("sq")
    )
    return flt.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("pd").cast("double") / F.lit(7.0), 2).alias("avg_yearly"),
    )


_SMALL_QTY_ORACLE = """
WITH li AS (
  SELECT l_partkey,
         CAST(l_quantity AS DECIMAL(9,2)) AS qd,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS pd
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')
),
pa AS (
  SELECT l_partkey, SUM(qd) AS sq, CAST(COUNT(*) AS DECIMAL(9,0)) AS nq
  FROM li GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(CAST(SUM(pd) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM li JOIN pa USING (l_partkey)
WHERE qd * 5 * nq < sq
"""


def _waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers whose lineitem shipped >90 days after
    the order date in a multi-supplier order where NO other supplier was
    that late. Optimization round 16 (guide §2.3 "aggregate before you
    shuffle"): the r7-r15 form decorrelated EXISTS/NOT EXISTS into a
    left-semi join of `late` against the FULL lineitem fact plus a
    left-anti self-join of `late` — two joins whose probe sides carried
    every lineitem row across the exchange, and whose `late` subtree
    executed twice. Both quantifiers are per-ORDER set properties, so
    they reduce to min/max aggregates with map-side partials:

      EXISTS other supplier on the order
        ⇔ the order's lineitems span ≥2 distinct suppliers
        ⇔ min(l_suppkey) ≠ max(l_suppkey) over the order's lineitems
          (the probing row's supplier is itself among them);
      NOT EXISTS other LATE supplier
        ⇔ every late row of the order shares ONE suppkey
        ⇔ min = max over the order's LATE suppkeys — and that sole
          suppkey is the probing row's own (it is late too), so the
          per-order late rowcount IS the supplier's numwait there.

    `late` is now computed ONCE and collapsed to one row per order
    (min/max/count — exact integers); lineitem collapses likewise. The
    exchanges carry per-order aggregates instead of lineitem rows, the
    per-order semi join keys both sides on the same l_orderkey
    partitioning, supplier (100 rows) broadcasts; top-10 stays
    TakeOrderedAndProject over the (numwait DESC, s_name) total order.
    Row-for-row equal to the EXISTS/NOT EXISTS form (oracle-verified at
    3 SFs): per qualifying order every late row passes both quantifiers
    and contributes 1 to its (single) supplier's count."""
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    # orders spanning ≥2 distinct suppliers (the EXISTS quantifier)
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("mn"), F.max("l_suppkey").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("l_orderkey")
    )
    # per-order late profile: qualifies when exactly one supplier is
    # late (the NOT EXISTS quantifier); cnt = that supplier's late rows
    qual = (
        late.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("lmn"),
            F.max("l_suppkey").alias("lmx"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("lmn") == F.col("lmx"))
        .select("l_orderkey", F.col("lmn").alias("l_suppkey"), "cnt")
    )
    kept = qual.join(multi, "l_orderkey", "left_semi")
    return (
        kept.join(F.broadcast(sup), kept["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.sum("cnt").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


_WAITING_SUPPLIERS_ORACLE = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                    ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


def _idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average (positive) account
    balance and no orders since 2001, per nation. The correlated scalar
    AVG decorrelates to a 1-row aggregate broadcast into the filter;
    `bal > avg` is rewritten exactly as `bal·n > sum` in DECIMAL. The
    NOT EXISTS is a left-anti join against the date-filtered orders —
    at scale the anti probe carries only the filtered custkeys."""
    cust = load_table(spark, "customer", sf_dir)
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("sbal"),
        F.count(F.lit(1)).cast("decimal(9,0)").alias("nbal"),
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast("decimal(9,2)") * F.col("nbal") > F.col("sbal")
    )
    o2001 = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    idle = rich.join(o2001, rich["c_custkey"] == o2001["o_custkey"], "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("sum_bal"),
    )


_IDLE_RICH_ORACLE = """
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sbal,
         CAST(COUNT(*) AS DECIMAL(9,0)) AS nbal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer CROSS JOIN pos
WHERE CAST(c_acctbal AS DECIMAL(9,2)) * nbal > sbal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_nationkey
"""


def _rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval RANGE window: per order, the count and revenue of the
    same customer's orders in the trailing 30 days (inclusive). Spark
    expresses the time frame as rangeBetween over epoch seconds (session
    TZ is UTC, so the mapping to DuckDB's RANGE INTERVAL frame is
    exact); sums are DECIMAL so peer order inside the frame can't change
    the result. One shuffle (hash by o_custkey), running-window
    execution within each partition — no self-join, no point-vs-range
    blowup."""
    o = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("sum_price_30d"),
    )


_ROLLING_30D_ORACLE = """
SELECT o_orderkey,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS sum_price_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
"""


def _unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): part's numeric columns rotated into long form
    (metric, value) — the inverse of `rel_pivot_status_by_priority` —
    then re-aggregated per (brand, metric). Spark's native `unpivot` is
    a zero-shuffle Expand (each input row fans out to k rows map-side);
    the only shuffle is the final aggregate's. Long-form stats over
    wide-schema tables is the canonical reshape a feature pipeline does
    before per-feature normalization."""
    part = load_table(spark, "part", sf_dir)
    long = part.select(
        "p_brand",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot(["p_brand"], ["size", "retailprice"], "metric", "value")
    return long.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


_UNPIVOT_ORACLE = """
WITH long AS (
  SELECT p_brand, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
  UNION ALL
  SELECT p_brand, 'retailprice', CAST(p_retailprice AS DOUBLE) FROM part
)
SELECT p_brand, metric, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM long GROUP BY p_brand, metric
"""


def _grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form of the existing rollup/cube
    queries: exactly the (status, priority), (status), () aggregation
    levels in ONE pass (Expand + single shuffle), with `grouping_id`
    disambiguating a real NULL group value from an aggregated-out
    column. Bitmask semantics are standard SQL, so the DuckDB oracle's
    GROUPING(a, b) must agree bit-for-bit."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def _big_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds 180
    — an `IN (SELECT key ... GROUP BY key HAVING agg > x)` subquery,
    decorrelated to a grouped aggregate semi-joining the fact. The
    aggregate runs partial+final on l_orderkey and only the QUALIFYING
    keys flow into the join (the semi probe is the HAVING output, not
    lineitem); customer broadcasts; top-20 is TakeOrderedAndProject on
    the (o_totalprice DESC, o_orderkey) total order. Quantities sum as
    DECIMAL so the HAVING cut is exact on both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(9,2)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "inner")
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            _dec("o_totalprice").cast("double").alias("totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_BIG_VOLUME_ORACLE = """
SELECT c_name, o_orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders o
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(9,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(9,2))) > 180) big
  ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 20
"""


def _cheapest_part_offer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated scalar subquery `price =
    (SELECT MIN(price) WHERE same part)` selecting each part's
    best-offer rows. Decorrelates to a per-part MIN aggregate joined
    back on (part, price=min) — min and equality in DECIMAL, so the
    boundary is exact on both engines. The supplier dimension (100
    rows) broadcasts; top-20 by (price, part, supplier) is
    TakeOrderedAndProject. The mod-10 part filter is pushed to the
    scan on BOTH passes of lineitem."""
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_partkey") % 10 == 0)
        .select("l_partkey", "l_suppkey", _dec("l_extendedprice").alias("pd"))
    )
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.min("pd").alias("minp"))
        .withColumnRenamed("l_partkey", "pp_partkey")
    )
    best = li.join(
        per_part,
        (li["l_partkey"] == F.col("pp_partkey")) & (li["pd"] == F.col("minp")),
    ).select("l_partkey", "l_suppkey", "pd")
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(sup), best["l_suppkey"] == sup["s_suppkey"])
        .select(
            "l_partkey", "l_suppkey", "s_name",
            F.col("pd").cast("double").alias("best_price"),
        )
        .orderBy("best_price", "l_partkey", "l_suppkey")
        .limit(20)
    )


_CHEAPEST_OFFER_ORACLE = """
SELECT l.l_partkey, l.l_suppkey, s.s_name,
       CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS best_price
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE l.l_partkey % 10 = 0
  AND CAST(l.l_extendedprice AS DECIMAL(18,2)) =
      (SELECT MIN(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
       FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
ORDER BY best_price, l_partkey, l_suppkey
LIMIT 20
"""


def _market_share_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: a HAVING threshold against a GLOBAL scalar
    aggregate — customers whose lifetime order value exceeds 0.1% of
    the grand total. The scalar subquery decorrelates to a one-row
    aggregate broadcast-cross-joined into the grouped HAVING filter;
    the fraction is rewritten `sum·1000 > total` in DECIMAL (exact, no
    float boundary). Two aggregates over one orders scan shape — at
    scale the grouped agg is the only shuffle; the scalar is one row."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", _dec("o_totalprice").alias("pd")
    )
    per_cust = o.groupBy("o_custkey").agg(F.sum("pd").alias("s"))
    total = o.agg(F.sum("pd").alias("grand"))
    return (
        per_cust.crossJoin(F.broadcast(total))
        .filter(F.col("s") * F.lit(1000).cast("decimal(4,0)") > F.col("grand"))
        .select("o_custkey", F.col("s").cast("double").alias("total_spend"))
        .orderBy(F.col("total_spend").desc(), "o_custkey")
    )


_MARKET_SHARE_ORACLE = """
SELECT o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 1000 >
       (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
ORDER BY total_spend DESC, o_custkey
"""


def _top_quarter_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose 1996Q1 revenue equals the
    maximum over all suppliers — `rev = (SELECT MAX(rev) FROM view)`.
    Decorrelates to the grouped revenue aggregate plus a one-row MAX
    re-aggregate broadcast back as an equality filter (ties all
    returned, deterministically ordered). Revenue is the exact DECIMAL
    price·(1−disc) sum, cast to DOUBLE only at output."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = F.expr(
        f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
    )
    per_sup = li.groupBy("l_suppkey").agg(F.sum(rev).alias("r"))
    mx = per_sup.agg(F.max("r").alias("mr"))
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        per_sup.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("mr"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue")
        )
        .orderBy("l_suppkey")
    )


_TOP_QUARTER_SUPPLIER_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT rev.l_suppkey, s.s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
ORDER BY l_suppkey
"""


def _order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the double aggregation — count orders per
    customer INCLUDING zero-order customers (LEFT join with the
    priority predicate as a JOIN condition, not a post-filter — a
    post-filter would silently drop the unmatched rows the left join
    exists to keep), then the distribution of those counts. Two
    aggregates over one join; the second aggregate's input is
    |customers| rows, so the distribution step costs nothing at any
    scale."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_ORDER_COUNT_DIST_ORACLE = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def _disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of multi-column AND groups spanning BOTH
    join sides. The scale move is factoring the part-side disjunction's
    common implication (brand ∈ {B1, B3}) into a pre-join broadcast
    filter — the fact side joins against the reduced dim and only the
    residual OR rides as a join filter, so the disjunction never forces
    a full-dim join. (Same DNF idea as the manifest's files_for_any,
    applied to a join.)"""
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_brand").isin("Brand#1", "Brand#3"))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", _dec("l_extendedprice").alias("pd")
    )
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    g1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    g2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return j.filter(g1 | g2).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("pd").cast("double").alias("revenue"),
    )


_DISJUNCTIVE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 40)
"""


def _nation_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a conditional-numerator ratio — nation 5's share
    of total supplier revenue per order year. Numerator and denominator
    are ONE grouped aggregate (the CASE rides inside the sum — never
    two passes); the exact DECIMAL sums divide in DOUBLE only at
    output. Supplier (100 rows) broadcasts; the orders join carries
    only (orderkey, year)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    rev = F.expr(
        f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
    )
    j = (
        li.select("l_orderkey", "l_suppkey", rev.alias("rev"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    agg = j.groupBy("yr").agg(
        F.sum(F.when(F.col("s_nationkey") == 5, F.col("rev"))).alias("nat"),
        F.sum("rev").alias("tot"),
    )
    return agg.select(
        "yr",
        F.col("nat").cast("double").alias("nation_revenue"),
        F.col("tot").cast("double").alias("total_revenue"),
        F.round(
            F.col("nat").cast("double") / F.col("tot").cast("double"), 6
        ).alias("share"),
    ).orderBy("yr")


_NATION_SHARE_ORACLE = f"""
WITH j AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS yr, s.s_nationkey,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * ({_ONE} - CAST(l_discount AS DECIMAL(3,2))) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
), a AS (
  SELECT yr,
         SUM(CASE WHEN s_nationkey = 5 THEN rev END) AS nat,
         SUM(rev) AS tot
  FROM j GROUP BY yr
)
SELECT yr, CAST(nat AS DOUBLE) AS nation_revenue,
       CAST(tot AS DOUBLE) AS total_revenue,
       ROUND(CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
FROM a ORDER BY yr
"""


# ---------------------------------------------------------------------------
# Q9-style product-type profit (round 9): the widest join tree in the
# set — lineitem ⋈ part(substring filter) ⋈ supplier ⋈ nation ⋈ orders,
# grouped by (nation, year). Plan shape at 100 TB: part filters BEFORE
# the join (predicate pushdown into the scan) and every dim side
# broadcasts, so the fact table shuffles exactly once — for the final
# (nation, year) aggregate, which AQE coalesces. The fixture has no
# partsupp table, so supply cost is modeled as 60% of p_retailprice
# (deterministic, DECIMAL-exact on both engines).
# ---------------------------------------------------------------------------

def _product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").contains("red")
    )
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    amount = (
        F.expr(
            f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
        )
        - F.expr(
            "CAST(0.60 AS DECIMAL(3,2)) * CAST(p_retailprice AS DECIMAL(18,2))"
            " * CAST(l_quantity AS DECIMAL(18,2))"
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).alias("_p"))
        .select(
            "nation", "o_year",
            F.round(F.col("_p").cast("double"), 2).alias("profit"),
        )
    )


_PRODUCT_PROFIT_ORACLE = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))
                      - CAST(0.60 AS DECIMAL(3,2)) * CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE contains(p_name, 'red')
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


# ---------------------------------------------------------------------------
# Q10-style returned-item ranking (round 9): revenue lost to returns per
# customer inside one quarter — fact ⋈ fact with a time-sliced orders
# side, selective l_returnflag filter, broadcast customer/nation dims,
# top-20 via TakeOrderedAndProject (never a global sort).
# ---------------------------------------------------------------------------

def _returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    rev = F.expr(
        f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("n_returned_items"))
        .select(
            "c_custkey", "c_name",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("n_name").alias("nation"),
            "n_returned_items",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_RETURNED_ITEM_ORACLE = f"""
SELECT c_custkey, c_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_returned_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape (parts/supplier relationship, round 9): how many
# DISTINCT suppliers ship each (brand, size) bucket, excluding a
# blocklist of suppliers derived by predicate (the fixture has no
# partsupp table or s_comment column, so lineitem is the part↔supplier
# relationship and negative s_acctbal stands in for the "complaints"
# blocklist — the SHAPE is the point: grouped COUNT(DISTINCT) with a
# NOT-IN exclusion, cf. reference has no relational surface).
#
# Plan shape (the 100 TB design points):
# - part filter + projection push to the scan; the filtered part dim
#   (5 of 50 sizes, 24 of 25 brands) broadcasts — the lineitem fact
#   never shuffles for the join;
# - the supplier blocklist is a broadcast ANTI join (never materializes
#   the probe side, no shuffle);
# - COUNT(DISTINCT supp) runs as the two-phase distinct aggregate:
#   partial (brand,size,supp) dedup map-side, one shuffle on the GROUP
#   keys carrying only pre-deduped narrow triples.
# ---------------------------------------------------------------------------

_Q16_SIZES = (1, 9, 19, 29, 39, 49)
_Q16_BRAND = "Brand#21"


def _part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != _Q16_BRAND) & F.col("p_size").isin(*_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    blocked = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(blocked),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand",
            F.col("p_size").cast("long").alias("p_size"),
            F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
        )
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


_PART_SUPPLIER_VARIETY_ORACLE = f"""
SELECT p_brand,
       CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{_Q16_BRAND}'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# ---------------------------------------------------------------------------
# Pareto frontier / skyline (late round 9): parts optimal under
# (minimize p_retailprice, maximize p_size) — the classic SKYLINE
# operator (Börzsönyi/Kossmann/Stocker, ICDE'01; no SQL-standard
# spelling, engines express it as NOT EXISTS dominance). The oracle IS
# the quadratic NOT-EXISTS form; the Spark plan is the reduction that
# survives 100 TB:
#
# only the cheapest part at each size can be on the frontier, so the
# corpus folds to ≤ |size domain| candidate pairs (groupBy(p_size)
# MIN — map-side combine, one tiny shuffle), the dominance test
# becomes a suffix-min over ~50 rows (single-task window on a
# provably bounded set, never over the full table), and the winners
# broadcast back to fetch the actual part rows. A point (c_s, s) is
# dominated iff some larger size is at most as expensive: keep iff
# c_s < min over s' > s of c_s' (equality loses: same price, larger
# size strictly dominates). Ties WITHIN a size at the min price are
# all frontier members (equal in both dims — nothing dominates them).
# For two continuous dims the same operator is the sort-based running
# max over range-partitioned order — still one sort, no self-join.
# ---------------------------------------------------------------------------


def _part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    cheapest = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("c")
    )
    w = Window.orderBy(F.col("p_size").asc()).rowsBetween(
        1, Window.unboundedFollowing
    )
    frontier = (
        cheapest.withColumn("m", F.min("c").over(w))
        .filter(F.col("m").isNull() | (F.col("c") < F.col("m")))
        .select(F.col("p_size").alias("f_size"), F.col("c").alias("f_price"))
    )
    return (
        part.join(
            F.broadcast(frontier),
            (F.col("p_size") == F.col("f_size"))
            & (F.col("p_retailprice") == F.col("f_price")),
        )
        .select(
            "p_partkey",
            "p_brand",
            F.col("p_size").cast("long").alias("p_size"),
            "p_retailprice",
        )
        .orderBy("p_size", "p_partkey")
    )


_PART_SKYLINE_ORACLE = """
SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size, p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
ORDER BY p_size, p_partkey
"""


# ---------------------------------------------------------------------------
# Peak concurrency via sweep line (late round 9): for each customer,
# the maximum number of SIMULTANEOUSLY open orders, where an order is
# open for 30 days from o_orderdate ([start, end) — an order closing
# at instant t does not overlap one opening at t). The interval-
# overlap problem re-expressed as the classic +1/−1 event sweep: each
# order emits (start, +1) and (end, −1), a per-customer running sum
# ordered by (ts, delta) — deltas ascending so closes precede opens at
# the same instant — traces the concurrency curve, and its MAX is the
# peak. Tie-order among identical (ts, delta) rows is arbitrary but
# the MAX is invariant (the running sum visits the same extremes).
# Reported as a histogram: peak level → number of customers.
#
# Scale shape: the event explode is map-side ×2; the only data-sized
# shuffle is the per-customer window (one key exchange); the histogram
# is a ≤ few-dozen-row aggregate. Never an interval self-join —
# the naive overlap join is O(n²) per hot customer, the sweep is
# O(n log n) and skew-bounded by one customer's own order count.
# ---------------------------------------------------------------------------


def _peak_open_orders_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.expr("unix_micros(o_orderdate)").alias("s")
    )
    horizon = 30 * 86_400_000_000  # 30 days in epoch micros
    ev = orders.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("ts"), F.lit(1).alias("delta")),
                F.struct(
                    (F.col("s") + F.lit(horizon)).alias("ts"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e"),
    ).select("o_custkey", "e.ts", "e.delta")
    w = Window.partitionBy("o_custkey").orderBy("ts", "delta")
    peaks = (
        ev.withColumn(
            "open",
            F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("o_custkey")
        .agg(F.max("open").alias("peak"))
    )
    return (
        peaks.groupBy(F.col("peak").cast("long").alias("peak_open"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("peak_open")
    )


_PEAK_OPEN_ORACLE = """
WITH ev AS (
  SELECT o_custkey, epoch_us(o_orderdate) AS ts, 1 AS delta FROM orders
  UNION ALL
  SELECT o_custkey, epoch_us(o_orderdate) + 2592000000000, -1 FROM orders
), run AS (
  SELECT o_custkey,
         SUM(delta) OVER (PARTITION BY o_custkey ORDER BY ts, delta
                          ROWS UNBOUNDED PRECEDING) AS open
  FROM ev
), peaks AS (
  SELECT o_custkey, MAX(open) AS peak FROM run GROUP BY o_custkey
)
SELECT CAST(peak AS BIGINT) AS peak_open,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM peaks GROUP BY peak ORDER BY peak_open
"""


# ---------------------------------------------------------------------------
# Integer PageRank over the customer↔supplier trade graph (late round
# 9): the iterative-algorithm category, made ORACLE-CHECKABLE. Float
# PageRank is order-dependent under partial aggregation, so engines
# can't hash-match it; `operators/graph.py integer_pagerank` runs the
# damped update entirely in integer floor divisions — deterministic
# under any partitioning — and the DuckDB oracle UNROLLS the same 3
# iterations (r0→r1→r2→r3 CTEs), so the hash match proves the whole
# iterative computation, not just a final projection. Nodes are
# 'c<custkey>' / 's<suppkey>', edges both directions per distinct
# trading pair (customer bought from supplier via orders⋈lineitem).
# ---------------------------------------------------------------------------

_PR_ITERS = 3


def _trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aeuc_vector_db_spark.operators.graph import integer_pagerank

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = integer_pagerank(edges, iters=_PR_ITERS)
    return ranks.orderBy(F.desc("rank"), "node").limit(100)


def _pagerank_oracle() -> str:
    head = """
WITH pairs AS (
  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s, c FROM pairs),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes)"""
    step = """,
r{i} AS (
  SELECT n.node, CAST(150000000000 + COALESCE(s.s, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((85 * r.rank) // (100 * d.deg)) AS s
    FROM edges e JOIN deg d ON d.src = e.src
    JOIN r{p} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
    tail = f"""
SELECT node, rank FROM r{_PR_ITERS}
ORDER BY rank DESC, node LIMIT 100
"""
    return (
        head
        + "".join(step.format(i=i, p=i - 1) for i in range(1, _PR_ITERS + 1))
        + tail
    )


_TRADE_PAGERANK_ORACLE = _pagerank_oracle()


def _trade_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted variant: each customer↔supplier edge carries the number
    of lineitems traded, so a customer's rank splits across suppliers
    proportionally to trade VOLUME (floor(85·r·w / (100·W)) — still
    all-integer, oracle unrolls the same 3 iterations)."""
    from aeuc_vector_db_spark.operators.graph import integer_pagerank

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), F.col("w").alias("weight")
    ).union(
        pairs.select(
            F.col("s").alias("src"), F.col("c").alias("dst"), F.col("w").alias("weight")
        )
    )
    ranks = integer_pagerank(edges, iters=_PR_ITERS)
    return ranks.orderBy(F.desc("rank"), "node").limit(100)


def _pagerank_weighted_oracle() -> str:
    head = """
WITH pairs AS (
  SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
edges AS (SELECT c AS src, s AS dst, w FROM pairs
          UNION ALL SELECT s, c, w FROM pairs),
deg AS (SELECT src, SUM(w) AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes)"""
    step = """,
r{i} AS (
  SELECT n.node, CAST(150000000000 + COALESCE(s.s, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((85 * r.rank * e.w) // (100 * d.deg)) AS s
    FROM edges e JOIN deg d ON d.src = e.src
    JOIN r{p} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
    tail = f"""
SELECT node, rank FROM r{_PR_ITERS}
ORDER BY rank DESC, node LIMIT 100
"""
    return (
        head
        + "".join(step.format(i=i, p=i - 1) for i in range(1, _PR_ITERS + 1))
        + tail
    )


_TRADE_PAGERANK_W_ORACLE = _pagerank_weighted_oracle()


def _trade_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the high-volume 1995 trade graph
    (round 11, VERDICT r10 #3): `operators/dedup.py
    connected_components` — alternating large-star/small-star
    contraction, O(log n) rounds on ANY topology, loop-invariant tables
    localCheckpoint-ed — exposed DIRECTLY as a declared query instead
    of only as the dedup-cluster resolver. The graph is customer↔
    supplier pairs restricted to quantity-≥49 lineitems shipped under
    1995 orders (the restriction sparsifies the bipartite graph enough
    that the fixture yields a real multi-component histogram rather
    than one giant blob). Output is the component-size histogram —
    (component_size, n_components) — which fully determines the
    component count; the oracle recomputes the SAME components via
    DuckDB's recursive min-label propagation, so a single node landing
    in the wrong component moves two histogram cells and breaks the
    hash. Component ids are min node-id strings; both engines compare
    strings with plain binary collation, so the grouping identity is
    cross-engine exact.

    Scale shape: each contraction round is two grouped mins plus one
    key-equi join, all shuffling on the node key (iterations share that
    one exchange pattern); rounds are bounded 2·⌈log₂ n⌉ + 8 and each
    round's output is eagerly checkpointed so lineage stays O(1). The
    histogram tail is two map-side-combining aggregates."""
    from aeuc_vector_db_spark.operators.dedup import connected_components

    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_quantity") >= 49)
        .select("l_orderkey", "l_suppkey")
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.year("o_orderdate") == 1995)
        .select("o_orderkey", "o_custkey")
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a_id"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b_id"),
        )
        .distinct()
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").cast("long").alias("component_size"))
        .agg(F.count(F.lit(1)).alias("n_components"))
        .orderBy("component_size")
    )


_TRADE_COMPONENTS_ORACLE = """
WITH RECURSIVE pairs AS (
  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity >= 49 AND year(o_orderdate) = 1995
),
edges AS (SELECT c AS u, s AS v FROM pairs UNION ALL SELECT s, c FROM pairs),
nodes AS (SELECT DISTINCT u AS node FROM edges),
lab(node, comp) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.u, lab.comp FROM edges e JOIN lab ON lab.node = e.v
),
comp AS (SELECT node, MIN(comp) AS component FROM lab GROUP BY node),
sizes AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
SELECT CAST(sz AS BIGINT) AS component_size,
       CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY sz ORDER BY component_size
"""


# ---------------------------------------------------------------------------
# EXACT grouped median via two-pass bucket selection (late round 9):
# the order-statistic-at-scale primitive. A global/per-group sort of
# the fact table is the naive plan; the scale plan is selection: pass 1
# folds the corpus into per-(group, $10-bucket) counts (one map-side-
# combining shuffle whose volume is #buckets, not #rows), a tiny
# cumulative window over the bucket histogram locates WHICH bucket
# holds the median rank and at what offset, and pass 2 sorts ONLY that
# bucket's sliver of rows per group. Exact integer arithmetic
# throughout (prices as cents); median defined as the ⌈n/2⌉-th
# smallest (lower median — no averaging, so the answer is an actual
# data value and ties cannot break determinism: equal cents around the
# offset yield the same value whatever the row order). The oracle is
# the naive full-sort row_number form — hash equality proves the
# selection plan picks the identical order statistic.
# ---------------------------------------------------------------------------


def _exact_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    grp = ["l_returnflag", "l_linestatus"]
    li = load_table(spark, "lineitem", sf_dir).select(
        *grp,
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    b = li.withColumn("bkt", F.expr("cents div 1000"))
    bc = b.groupBy(*grp, "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    wg = Window.partitionBy(*grp).orderBy("bkt")
    wall = Window.partitionBy(*grp)
    cum = (
        bc.withColumn(
            "cum", F.sum("cnt").over(wg.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("n", F.sum("cnt").over(wall))
        .withColumn("r", F.expr("(n + 1) div 2"))
    )
    target = cum.filter(
        (F.col("cum") >= F.col("r")) & (F.col("cum") - F.col("cnt") < F.col("r"))
    ).select(*grp, "bkt", (F.col("r") - (F.col("cum") - F.col("cnt"))).alias("off"))
    sliver = b.join(F.broadcast(target), [*grp, "bkt"])
    ws = Window.partitionBy(*grp).orderBy("cents")
    return (
        sliver.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") == F.col("off"))
        .select(
            *grp,
            (F.col("cents").cast("double") / 100).alias("median_price"),
        )
        .orderBy(*grp)
    )


_EXACT_MEDIAN_ORACLE = """
WITH r AS (
  SELECT l_returnflag, l_linestatus,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
), rk AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
  FROM r
)
SELECT l_returnflag, l_linestatus,
       CAST(cents AS DOUBLE) / 100 AS median_price
FROM rk WHERE rn = (n + 1) // 2
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# RFM segmentation: the classic customer-scoring shape — quartile-bucket
# each customer on Recency (latest order), Frequency (order count), and
# Monetary (exact decimal spend), then count customers per 3-digit
# segment. The ORACLE stays the canonical NTILE form (total order with
# custkey tie-breaks, so bucketing is deterministic on both engines);
# the ENGINE — since round 10 (VERDICT r9 #2) — never runs an
# unpartitioned window. Instead it computes, per metric, the three
# NTILE boundary TUPLES by the same two-pass bucket selection that
# powers `rel_exact_median_price`, then buckets map-side by tuple
# comparison:
#
#   NTILE(4) over N rows puts rank rn in bucket 1 + #{i : rn > c_i},
#   c_i = i·(N div 4) + least(i, N mod 4)   (i = 1..3)
#
# and with a strict total order (negv = −value, custkey ASC), rn > c_i
# ⟺ tuple > tuple_at(c_i). So: pass 1 folds the per-customer aggregate
# into per-(metric, coarse-bucket) counts (one map-side-combining
# shuffle whose volume is #buckets, not #customers) and a tiny
# cumulative window over the 3-metric bucket histogram locates which
# bucket holds each boundary rank and at what offset. Pass 2 is
# ADAPTIVE per boundary bucket (round 12, VERDICT r11 #2 — round 11
# ran the refinement unconditionally and paid two extra histogram jobs
# on friendly data, 0.058 → 0.217 s headline):
#
#   - a boundary bucket holding ≤ _RFM_SLIVER_MAX rows takes the
#     DIRECT path (the round-10 plan): its rows rank once per
#     (metric, seg) with row_number over (negv, ck) — a single task
#     bounded by the sliver cap;
#   - a bigger bucket — a full tie-run holding O(N/4) customers when
#     a metric is heavily tied (frequency uses width 1, so its
#     boundary bucket IS one negv tie-run) — takes the round-11
#     REFINEMENT: histogram its rows by (exact negv, ck div 65536), a
#     cumulative window over THAT locates the sub-group holding the
#     boundary rank, and only the located sub-group — at most 65536
#     rows by construction, because each customer appears once per
#     metric and a ck-sub-bucket spans 65536 custkeys — gets a
#     row_number. Under heavy ties the refinement histogram collapses
#     to ~max_ck/65536 rows (one negv, many ck sub-buckets).
#
# The branch decision reads the NINE located-boundary histogram rows
# (a metadata-sized collect: 3 metrics × 3 segment boundaries — the
# cumulative window that produces them is over the bucket histogram,
# never the customers), so on untied data the refinement jobs never
# run at all (plan-gated: test_plans.py
# test_rfm_segments_direct_path_on_untied_data) while each skew regime
# stays bounded by its own mechanism (sliver sizes measured under
# synthetic 90%-tie skew in PLANS.md; tools/soak_rfm_skew.py plants
# ~45k-row tie-runs, above the 16384 sliver cap, so the soak exercises
# the refinement branch end-to-end with a hash-matched oracle). The 9
# boundary tuples then broadcast back for a map-side comparison
# bucket. Exact integer arithmetic throughout (spend as cents), so
# hash equality with the NTILE oracle proves the selection picks
# identical buckets. Plan-gated (test_plans.py
# test_rfm_segments_has_no_unpartitioned_window): no ntile anywhere,
# every Window partitioned by metric; the one SinglePartition exchange
# that remains is the constant-size 9-tuple boundary scalar agg.
#
# BENCH METHODOLOGY NOTE (like the bucketed-dedup table-write note):
# the adaptive branch decision executes targets.collect() at
# DataFrame-BUILD time, so the per-customer aggregate + boundary
# histogram jobs run eagerly when the query is constructed and land
# OUTSIDE bench.py's hot re-collect loop — the headline number is the
# hot path (map-side tuple-comparison bucketing) only; the cold
# build-time cost is ~2.9 s at sf0.1 (PLANS.md). Consequence for
# reuse: the 9 boundary constants freeze at build, so a cached
# DataFrame is stale if the underlying orders table changes — rebuild
# the query (cheap) when freshness matters.
# ---------------------------------------------------------------------------

#: boundary buckets at or under this take the direct single-rank path;
#: bigger ones (tie-runs) take the two-level refinement. 16384 keeps
#: the direct path's one-task rank trivially small while sitting far
#: under the soak's planted ~45k tie-runs (so the refinement branch
#: keeps real end-to-end coverage) and far over any real boundary
#: bucket the width constants produce on spread data.
_RFM_SLIVER_MAX = 16384


def _rfm_segments(
    spark: SparkSession, sf_dir: str, _refine_out: "list | None" = None
) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.expr("unix_micros(o_orderdate)")).alias("recency_us"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
    ).select(
        "o_custkey",
        "recency_us",
        "freq",
        (F.col("spend") * 100).cast("long").alias("spend_c"),
    )
    # consumed by 3 melt branches + the final scorer: compute once
    per_cust = per_cust.localCheckpoint(eager=False)

    # melt to (metric, negv, ck): ASC (negv, ck) ≡ the oracle's
    # (value DESC, custkey ASC). Coarse-bucket widths only shape the
    # histogram (any monotone bucketing is correct): ~1 day of recency,
    # unit frequency, $1000 of spend.
    melted = None
    for mname, col, width in (
        ("r", "recency_us", 86_400_000_000),
        ("f", "freq", 1),
        ("m", "spend_c", 100_000),
    ):
        part = per_cust.select(
            F.lit(mname).alias("metric"),
            (-F.col(col)).alias("negv"),
            F.col("o_custkey").alias("ck"),
        ).withColumn("bkt", F.expr(f"negv div {width}L"))
        melted = part if melted is None else melted.unionByName(part)

    hist = melted.groupBy("metric", "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    wg = Window.partitionBy("metric").orderBy("bkt")
    cum = (
        hist.withColumn(
            "cum", F.sum("cnt").over(wg.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("metric")))
    )
    targets = (
        cum.withColumn("seg", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))))
        .withColumn("c", F.expr("seg * (n div 4) + least(cast(seg as bigint), n % 4)"))
        .filter((F.col("cum") >= F.col("c")) & (F.col("cum") - F.col("cnt") < F.col("c")))
        .select(
            "metric", "bkt", "seg",
            (F.col("c") - (F.col("cum") - F.col("cnt"))).alias("off"),
            "cnt",
        )
    )
    # adaptive branch (see block comment): the 9 located boundary rows
    # are metadata — collect them and send each down the path its size
    # warrants, so untied data never runs the refinement jobs.
    collected = targets.collect()
    tgt_rows = [
        (str(r["metric"]), int(r["bkt"]), int(r["seg"]), int(r["off"]), int(r["cnt"]))
        for r in collected
    ]
    direct_t = [t[:4] for t in tgt_rows if t[4] <= _RFM_SLIVER_MAX]
    refine_t = [t[:4] for t in tgt_rows if t[4] > _RFM_SLIVER_MAX]
    if _refine_out is not None:
        _refine_out.extend(sorted((t[0], t[2]) for t in refine_t))
    tgt_schema = "metric string, bkt long, seg int, off long"
    bounds_parts = []
    if direct_t:
        # direct path (round 10): rank the whole boundary bucket —
        # ≤ _RFM_SLIVER_MAX rows per (metric, seg) by the branch test.
        tdf = spark.createDataFrame(direct_t, tgt_schema)
        wd = Window.partitionBy("metric", "seg").orderBy("negv", "ck")
        bounds_parts.append(
            melted.join(F.broadcast(tdf), ["metric", "bkt"])
            .withColumn("rn", F.row_number().over(wd))
            .filter(F.col("rn") == F.col("off"))
            .select("metric", "seg", "negv", "ck")
        )
    if refine_t:
        # two-level refinement (round 11): sub-histogram the boundary
        # bucket by (exact negv, ck div CKW), locate the sub-group
        # holding each boundary rank, and rank only that ≤CKW-row
        # sliver. Within a located sub-group negv is constant, so
        # ORDER BY ck alone equals the (negv, ck) total order; ck ≥ 0
        # keeps `div` monotone.
        CKW = 65536
        tdf = spark.createDataFrame(refine_t, tgt_schema)
        cand = melted.join(F.broadcast(tdf), ["metric", "bkt"]).withColumn(
            "ckb", F.expr(f"ck div {CKW}L")
        )
        h2 = cand.groupBy("metric", "seg", "off", "negv", "ckb").agg(
            F.count(F.lit(1)).alias("cnt2")
        )
        w2 = Window.partitionBy("metric", "seg").orderBy("negv", "ckb")
        c2 = h2.withColumn(
            "cum2", F.sum("cnt2").over(w2.rowsBetween(Window.unboundedPreceding, 0))
        )
        t2 = c2.filter(
            (F.col("cum2") >= F.col("off"))
            & (F.col("cum2") - F.col("cnt2") < F.col("off"))
        ).select(
            "metric", "seg", "negv", "ckb",
            (F.col("off") - (F.col("cum2") - F.col("cnt2"))).alias("off2"),
        )
        ws = Window.partitionBy("metric", "seg").orderBy("ck")
        bounds_parts.append(
            cand.join(F.broadcast(t2), ["metric", "seg", "negv", "ckb"])
            .withColumn("rn", F.row_number().over(ws))
            .filter(F.col("rn") == F.col("off2"))
            .select("metric", "seg", "negv", "ck")
        )
    bounds = bounds_parts[0]
    for extra in bounds_parts[1:]:
        bounds = bounds.unionByName(extra)
    # 9 boundary tuples → one wide row, broadcast to the scorer
    cell = lambda m, s, c: F.max(  # noqa: E731
        F.when((F.col("metric") == m) & (F.col("seg") == s), F.col(c))
    )
    brow = bounds.groupBy().agg(
        *[
            cell(m, s, c).alias(f"{m}{s}{c[0]}")
            for m in ("r", "f", "m")
            for s in (1, 2, 3)
            for c in ("negv", "ck")
        ]
    )

    def bucket(col: str, m: str):
        negv = -F.col(col)
        e = F.lit(1)
        for s in (1, 2, 3):
            bv, bk = F.col(f"{m}{s}n"), F.col(f"{m}{s}c")
            after = (negv > bv) | ((negv == bv) & (F.col("o_custkey") > bk))
            e = e + after.cast("int")
        return e

    scored = per_cust.crossJoin(F.broadcast(brow)).select(
        bucket("recency_us", "r").alias("r"),
        bucket("freq", "f").alias("f"),
        bucket("spend_c", "m").alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("f").cast("long").alias("f"),
            F.col("m").cast("long").alias("m"),
            "n_customers",
        )
        .orderBy("r", "f", "m")
    )


_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(epoch_us(o_orderdate)) AS recency_us,
         COUNT(*) AS freq,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT NTILE(4) OVER (ORDER BY recency_us DESC, o_custkey) AS r,
         NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
         NTILE(4) OVER (ORDER BY spend DESC, o_custkey) AS m
  FROM per_cust
)
SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
       CAST(m AS BIGINT) AS m, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored GROUP BY r, f, m ORDER BY r, f, m
"""


QUERIES = {
    "rel_part_skyline": (_part_skyline, _PART_SKYLINE_ORACLE),
    "rel_peak_open_orders_hist": (_peak_open_orders_hist, _PEAK_OPEN_ORACLE),
    "rel_trade_pagerank": (_trade_pagerank, _TRADE_PAGERANK_ORACLE),
    "rel_trade_pagerank_weighted": (_trade_pagerank_weighted,
                                    _TRADE_PAGERANK_W_ORACLE),
    "rel_trade_components": (_trade_components, _TRADE_COMPONENTS_ORACLE),
    "rel_rfm_segments": (_rfm_segments, _RFM_ORACLE),
    "rel_part_supplier_variety": (_part_supplier_variety,
                                  _PART_SUPPLIER_VARIETY_ORACLE),
    "rel_product_type_profit": (_product_type_profit, _PRODUCT_PROFIT_ORACLE),
    "rel_returned_item_revenue": (_returned_item_revenue, _RETURNED_ITEM_ORACLE),
    "rel_order_count_distribution": (_order_count_distribution,
                                     _ORDER_COUNT_DIST_ORACLE),
    "rel_disjunctive_promo_revenue": (_disjunctive_promo_revenue,
                                      _DISJUNCTIVE_ORACLE),
    "rel_nation_share_by_year": (_nation_share_by_year, _NATION_SHARE_ORACLE),
    "rel_cheapest_part_offer": (_cheapest_part_offer, _CHEAPEST_OFFER_ORACLE),
    "rel_market_share_customers": (_market_share_customers, _MARKET_SHARE_ORACLE),
    "rel_top_quarter_supplier": (_top_quarter_supplier, _TOP_QUARTER_SUPPLIER_ORACLE),
    "rel_big_volume_customers": (_big_volume_customers, _BIG_VOLUME_ORACLE),
    "rel_unpivot_part_metrics": (_unpivot_part_metrics, _UNPIVOT_ORACLE),
    "rel_grouping_sets_revenue": (_grouping_sets_revenue, _GROUPING_SETS_ORACLE),
    "rel_exists_late_shipment": (_exists_late_shipment, _EXISTS_LATE_ORACLE),
    "rel_small_qty_part_revenue": (_small_qty_part_revenue, _SMALL_QTY_ORACLE),
    "rel_waiting_suppliers": (_waiting_suppliers, _WAITING_SUPPLIERS_ORACLE),
    "rel_idle_rich_customers": (_idle_rich_customers, _IDLE_RICH_ORACLE),
    "rel_rolling_30d_revenue": (_rolling_30d_revenue, _ROLLING_30D_ORACLE),
    "rel_bloom_semijoin_revenue": (_bloom_semijoin_revenue, _BLOOM_SEMIJOIN_ORACLE),
    "rel_fk_violations": (_fk_violations, _FK_ORACLE),
    "rel_order_price_drift": (_order_price_drift, _DRIFT_ORACLE),
    "rel_volume_shipping": (_volume_shipping, _VOLUME_SHIPPING_ORACLE),
    "rel_price_quantile_sketch": (_price_quantile_sketch, _HQ_ORACLE),
    "rel_pricing_summary": (_pricing_summary, _PRICING_ORACLE),
    "rel_top_revenue_orders": (_top_revenue_orders, _TOP_REVENUE_ORACLE),
    "rel_revenue_by_nation": (_revenue_by_nation, _REVENUE_NATION_ORACLE),
    "rel_top_orders_per_customer": (_top_orders_per_customer, _TOP_PER_CUSTOMER_ORACLE),
    "rel_parts_never_ordered": (_parts_never_ordered, _PARTS_NEVER_ORACLE),
    "rel_late_order_priority": (_late_order_priority_counts, _LATE_PRIORITY_ORACLE),
    "rel_asof_latest_order": (_asof_latest_order, _ASOF_ORACLE),
    "rel_skew_salted_revenue": (_skew_salted_revenue, _SKEW_SALTED_ORACLE),
}

# Round 14 (VERDICT r13 #2): trivial long-green aggregates folded into
# rel_agg_composite (queries/composites.py); (fn, oracle) pairs stay here
# so the composite reuses the arithmetic verbatim and tests/bench can
# still drive the callables individually.
FOLDED = {
    "rel_exact_median_price": (_exact_median_price, _EXACT_MEDIAN_ORACLE),
    "rel_high_value_customers": (_high_value_customers, _HIGH_VALUE_ORACLE),
    "rel_acctbal_by_region_nation": (_acctbal_by_region_nation, _ACCTBAL_ORACLE),
    "rel_orders_by_month": (_orders_by_month, _ORDERS_MONTH_ORACLE),
    "rel_rollup_acctbal": (_rollup_acctbal, _ROLLUP_ORACLE),
    "rel_cube_order_status": (_cube_order_status, _CUBE_ORACLE),
    "rel_customers_both_years": (_customers_both_years, _SET_OPS_ORACLE),
    "rel_price_percentiles": (_price_percentiles, _PERCENTILES_ORACLE),
    "rel_pivot_status_by_priority": (_pivot_status_by_priority, _PIVOT_ORACLE),
    "rel_orders_within_30d": (_orders_within_30d, _RANGE_JOIN_ORACLE),
}
