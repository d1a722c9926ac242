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


def test_minhash_band_table_serves_without_corpus_exchange(spark, no_broadcast):
    """VERDICT r11 #1: the bucketed MinHash band table must make the
    incremental-dedup serve path Exchange-free on the CORPUS side —
    (a) the hot-band cap aggregate over the table runs with zero
    Exchange (the bucketed scan's HashPartitioning(bkey) already
    satisfies the groupBy distribution), (b) the candidate join
    shuffles exactly one side (the batch), with the same join over a
    non-bucketed copy shuffling both (the control), and (c) the
    end-to-end bucketed serve returns the identical pair set as the
    flat incremental path."""
    from aeuc_vector_db_spark.operators import dedup as D

    rows = [
        (i, f"shared boilerplate prefix tokens alpha beta gamma delta {i % 7} "
            f"tail {i}")
        for i in range(1, 41)
    ]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    is_batch = F.col("doc_id") % 5 == 0
    corpus, batch = full.filter(~is_batch), full.filter(is_batch)
    index = D.minhash_doc_index(corpus).localCheckpoint(eager=True)
    t = "t_bj_minhash_bands"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        D.write_minhash_band_table(index, t, n_buckets=8)

        # (a) the cap aggregate over the table: zero Exchange
        agg = spark.table(t).groupBy("bkey", "band", "vals").agg(
            F.count(F.lit(1)).alias("n")
        )
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan

        # (b) candidate join: one Exchange (batch side), corpus side fed
        # by the bucketed scan
        new_index = D.minhash_doc_index(batch)
        nb = D.minhash_band_rows_keyed(new_index)
        j = nb.select(F.col("doc_id").alias("x"), "bkey").join(
            spark.table(t).select(F.col("doc_id").alias("y"), "bkey"), "bkey"
        )
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in jplan
        assert jplan.count("Exchange hashpartitioning") == 1, jplan
        # control: same join against a non-bucketed copy shuffles BOTH
        flat_bands = D.minhash_band_rows_keyed(index).localCheckpoint(eager=True)
        cj = nb.select(F.col("doc_id").alias("x"), "bkey").join(
            flat_bands.select(F.col("doc_id").alias("y"), "bkey"), "bkey"
        )
        cplan = cj._jdf.queryExecution().executedPlan().toString()
        assert cplan.count("Exchange hashpartitioning") >= 2, cplan

        # (c) identical pair set, with and without the hot-band cap
        key = lambda r: (r["a_id"], r["b_id"], round(r["jaccard"], 9))  # noqa: E731
        for cap in (None, 6):
            bk = D.incremental_minhash_near_dup_bucketed(
                batch, index, t, threshold=0.3, max_band_size=cap
            )
            fl = D.incremental_minhash_near_dup(
                batch, index, threshold=0.3, max_band_size=cap
            )
            got = sorted(map(key, bk.collect()))
            want = sorted(map(key, fl.collect()))
            assert got == want
            assert got, "planted near-dups must survive"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_minhash_band_table_append_epoch_parity(spark, no_broadcast):
    """append_minhash_band_table (round 12): serving batch N and then
    FOLDING it in must leave the table equivalent to a fresh build —
    batch N+1's pairs against (table + append, index ∪ batchN-index)
    equal both the fresh-table bucketed serve and the flat incremental
    path over the grown corpus; and the candidate join stays
    one-Exchange after the append (multi-file buckets lose only the
    sort elision, never the bucket layout)."""
    from aeuc_vector_db_spark.operators import dedup as D

    def mkdocs(ids):
        return spark.createDataFrame(
            [
                (i, f"shared boilerplate prefix tokens alpha beta gamma "
                    f"delta {i % 4} tail {i}")
                for i in ids
            ],
            "doc_id long, text string",
        )

    corpus = mkdocs(range(1, 21))
    b1 = mkdocs(range(21, 27))
    b2 = mkdocs(range(27, 34))
    t, t2 = "t_bj_bands_epoch", "t_bj_bands_fresh"
    for name in (t, t2):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        idx_c = D.minhash_doc_index(corpus).localCheckpoint(eager=True)
        D.write_minhash_band_table(idx_c, t, n_buckets=8)
        idx_b1 = D.minhash_doc_index(b1).localCheckpoint(eager=True)
        D.append_minhash_band_table(idx_b1, t, n_buckets=8)
        idx2 = idx_c.unionByName(idx_b1)

        got = D.incremental_minhash_near_dup_bucketed(
            b2, idx2, t, threshold=0.3
        )
        # fresh-table reference over the grown corpus
        grown = corpus.unionByName(b1)
        idx_fresh = D.minhash_doc_index(grown).localCheckpoint(eager=True)
        D.write_minhash_band_table(idx_fresh, t2, n_buckets=8)
        want_bk = D.incremental_minhash_near_dup_bucketed(
            b2, idx_fresh, t2, threshold=0.3
        )
        want_fl = D.incremental_minhash_near_dup(b2, idx_fresh, threshold=0.3)
        key = lambda r: (r["a_id"], r["b_id"], round(r["jaccard"], 9))  # noqa: E731
        g = sorted(map(key, got.collect()))
        assert g == sorted(map(key, want_bk.collect()))
        assert g == sorted(map(key, want_fl.collect()))
        assert g, "planted near-dups must survive the epoch fold"
        # bucket layout survives the append: candidate join still
        # shuffles exactly one side
        nb = D.minhash_band_rows_keyed(D.minhash_doc_index(b2))
        j = nb.select(F.col("doc_id").alias("x"), "bkey").join(
            spark.table(t).select(F.col("doc_id").alias("y"), "bkey"), "bkey"
        )
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in jplan
        assert jplan.count("Exchange hashpartitioning") == 1, jplan
        # and a mismatched bucket spec must raise, not mis-bucket
        import pytest as _pytest

        with _pytest.raises(Exception, match="[Bb]ucket"):
            D.append_minhash_band_table(idx_b1, t, n_buckets=4)
    finally:
        for name in (t, t2):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
