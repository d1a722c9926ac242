"""Native Spark bucketed tables: the co-located-join evidence piece.

The manifest source implements its own bucketed layout (id_bucket
partition dirs + bucket-pruned reads); this pins the OTHER bucketing
mechanism a 100 TB deployment uses — Spark's catalog `bucketBy`, where
two tables bucketed by the same key join WITHOUT any Exchange: the
bucket files themselves are the shuffle output, paid once at write time
and amortized over every subsequent join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.01"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_tables_join_without_exchange(spark, no_broadcast):
    """orders and customer bucketed by the join key into the same
    bucket count: the join plan must contain NO Exchange — with
    broadcast disabled it is a SortMergeJoin fed directly by the
    bucketed scans. The same join over plain parquet must show TWO
    hashpartitioning Exchanges (the control — proves the assertion
    bites)."""
    o = load_table(spark, "orders", SF01).select("o_orderkey", "o_custkey")
    c = load_table(spark, "customer", SF01).select("c_custkey", "c_acctbal")
    for t in ("t_bj_orders", "t_bj_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        (o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
         .mode("overwrite").saveAsTable("t_bj_orders"))
        (c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
         .mode("overwrite").saveAsTable("t_bj_customer"))
        j = spark.table("t_bj_orders").join(
            spark.table("t_bj_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        ).groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # control: the identical join over the non-bucketed parquet
        # shuffles both sides
        pj = o.join(c, F.col("o_custkey") == F.col("c_custkey")).groupBy(
            "c_custkey"
        ).agg(F.count(F.lit(1)).alias("n"))
        pplan = pj._jdf.queryExecution().executedPlan().toString()
        assert pplan.count("Exchange hashpartitioning") >= 2
        # and the results agree
        a = sorted(map(tuple, j.collect()))
        b = sorted(map(tuple, pj.collect()))
        assert a == b and len(a) > 0
    finally:
        for t in ("t_bj_orders", "t_bj_customer"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
