"""Declared query over the transactional manifest table.

Exercises the full commit protocol end-to-end — overwrite, append,
MERGE upsert, snapshot read — and checks the RESULT (not just the
mechanics) against a DuckDB oracle computing the equivalent final state
directly from the source table. If any commit dropped, duplicated, or
failed to replace a row, the per-source aggregate hash diverges.

Reference analog: snapshot/restore + audit trail
(reference vector_field.py:85-117, 448-461), generalized to the
multi-writer transactional log in sources/manifest.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aeuc_vector_db_spark.sources.manifest import ManifestTable
from aeuc_vector_db_spark.sources.tables import load_table


def _manifest_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v0 = overwrite(even doc_ids), v1 = append(odd doc_ids),
    v2 = merge_upsert(doc_id < 50 with source='merged') — then read the
    latest snapshot and aggregate per source.

    The table lives in a fresh temp dir per invocation (the returned
    DataFrame is lazy: its files must outlive this function, so the dir
    is NOT cleaned up here — it is tiny at oracle scale and /tmp-scoped).
    """
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(tempfile.mkdtemp(prefix="aeuc_manifest_q_"))
    t.commit_overwrite(docs.filter(F.col("doc_id") % 2 == 0))
    t.commit_append(docs.filter(F.col("doc_id") % 2 == 1))
    updates = docs.filter(F.col("doc_id") < 50).withColumn("source", F.lit("merged"))
    t.merge_upsert(spark, updates, key="doc_id")
    final = t.read(spark)
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


_MANIFEST_ORACLE = """
WITH final AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id < 50 THEN 'merged' ELSE source END AS source
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM final GROUP BY source
"""


def _manifest_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v0 = docs with doc_id < 200, then two appends (200-349, 350+);
    read_appended(since_version=0) must return EXACTLY the appended rows
    — verified against the oracle computing the same subset directly.
    If the file-delta ever disagreed with the row-delta, the per-lang
    aggregate hash diverges."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(tempfile.mkdtemp(prefix="aeuc_manifest_inc_"))
    t.commit_append(docs.filter(F.col("doc_id") < 200))
    t.commit_append(docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)))
    t.commit_append(docs.filter(F.col("doc_id") >= 350))
    delta = t.read_appended(spark, since_version=0)
    return delta.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


_INCREMENTAL_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id >= 200 GROUP BY lang
"""


def _manifest_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three disjoint-range appends into a table with per-file doc_id
    stats, then a range read through `read_where` — the data-skipping
    path: only files whose footer min/max can contain [160, 290) are
    opened (middle append's files; the other two dirs are pruned, pinned
    in test_manifest.py). The oracle computes the same range directly,
    so a wrongly-pruned file (dropped rows) or a missed filter
    (extra rows) diverges the per-lang aggregate hash."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_skip_"), stats_cols=["doc_id"]
    )
    t.commit_append(docs.filter(F.col("doc_id") < 150))
    t.commit_append(docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)))
    t.commit_append(docs.filter(F.col("doc_id") >= 300))
    pruned = t.read_where(spark, [("doc_id", ">=", 160), ("doc_id", "<", 290)])
    return pruned.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


_SKIPPING_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id >= 160 AND doc_id < 290 GROUP BY lang
"""


def _manifest_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order compaction correctness: write documents scrambled, compact
    with cluster_by=[doc_id, n_chars] (Morton interleave of quantile
    ranks), then read through the file-pruning path under predicates on
    BOTH clustered columns. The oracle computes the same conjunction
    directly — a z-map bucketing error that dropped or duplicated rows,
    or a wrongly-pruned file, diverges the aggregate hash. File-count
    pruning on each column is pinned in test_manifest.py."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_z_"),
        stats_cols=["doc_id", "n_chars"],
    )
    # scrambled initial layout: stats exist but prune nothing
    t.commit_overwrite(docs.repartition(8))
    t.compact(spark, cluster_by=["doc_id", "n_chars"], n_files=12)
    pruned = t.read_where(
        spark, [("doc_id", ">=", 100), ("doc_id", "<", 400), ("n_chars", ">=", 500)]
    )
    return pruned.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


_ZORDER_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id >= 100 AND doc_id < 400 AND n_chars >= 500
GROUP BY lang
"""


def _manifest_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector correctness: append documents in two ranges, then
    soft-delete doc_id ∈ [120, 180) and n_chars < 400 via TWO positional
    deletion vectors (no data file rewritten — pinned in
    test_manifest.py), then read the snapshot. The oracle computes
    documents minus both predicates directly; a wrong (file, row) key,
    a dropped vector on append, or a double-deleted row diverges the
    per-lang aggregate hash."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_dv_"), stats_cols=["doc_id"]
    )
    t.commit_append(docs.filter(F.col("doc_id") < 250))
    t.commit_append(docs.filter(F.col("doc_id") >= 250))
    t.delete_where_dv(spark, [("doc_id", ">=", 120), ("doc_id", "<", 180)])
    t.delete_where_dv(spark, [("n_chars", "<", 400)])
    final = t.read(spark)
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


_DV_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE NOT (doc_id >= 120 AND doc_id < 180) AND NOT (n_chars < 400)
GROUP BY lang
"""


def _manifest_bloom_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-index point lookups: documents keyed by a sha2 content
    fingerprint (high-cardinality, unclustered — min/max stats span
    every file and prune nothing), written across many files with
    per-file bloom sidecars, then 5 point lookups through the pruning
    read. The oracle computes the same fingerprints directly; a bloom
    that wrongly excluded a file would drop its row and diverge the
    hash. File-count pruning itself is pinned in test_manifest.py."""
    docs = load_table(spark, "documents", sf_dir)
    keyed = docs.select(
        F.sha2(F.col("text"), 256).alias("fp"), "doc_id", "lang", "n_chars"
    )
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_bloom_"), bloom_cols=["fp"]
    )
    t.commit_overwrite(keyed.repartition(8))
    probes = [
        r["fp"] for r in keyed.filter(F.col("doc_id").isin(25, 150, 275, 300, 425)).collect()
    ]
    parts = [
        t.read_where(spark, [("fp", "=", p)]) for p in sorted(probes)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("doc_id", "lang", "n_chars")


_BLOOM_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id IN (25, 150, 275, 300, 425)
"""


def _manifest_merge_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same final state as `manifest_merge_read`, but the MERGE runs
    through `merge_upsert_dv` — positional deletes of the matched keys
    plus an append, one atomic commit, zero rewritten files (pinned in
    test_manifest.py). Sharing the oracle pins that the two merge
    implementations are semantically interchangeable."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_mdv_"), bloom_cols=["doc_id"]
    )
    t.commit_overwrite(docs.filter(F.col("doc_id") % 2 == 0))
    t.commit_append(docs.filter(F.col("doc_id") % 2 == 1))
    updates = docs.filter(F.col("doc_id") < 50).withColumn("source", F.lit("merged"))
    t.merge_upsert_dv(spark, updates, key="doc_id")
    final = t.read(spark)
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


def _manifest_merge_clauses_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE clause surface in one atomic DV commit: target =
    doc_id < 400; source = doc_id ∈ [300, 500) with a rewritten payload
    and a condition-only `op` flag. Matched keys divisible by 7 are
    deleted (via the flag), matched English docs are replaced by the
    source row, other matched docs are kept verbatim, source-only rows
    insert only when their new n_chars is even, and target-only rows
    with doc_id < 50 are swept by the not-matched-by-source clause.
    The oracle rebuilds the identical final state as a 4-branch UNION,
    so any clause misfire (wrong precedence, flag written, sweep too
    wide) diverges the per-source aggregate hash."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_mcl_"),
        stats_cols=["doc_id"], bloom_cols=["doc_id"],
    )
    t.commit_overwrite(docs.filter(F.col("doc_id") < 400))
    src = (
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 500))
        .withColumn("source", F.lit("merged"))
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .withColumn(
            "op",
            F.when(F.col("doc_id") % 7 == 0, F.lit("del")).otherwise(F.lit("keep")),
        )
    )
    t.merge(
        spark, src, key="doc_id",
        matched_delete="src_op = 'del'",
        matched_update="lang = 'en'",
        not_matched_insert="src_n_chars % 2 = 0",
        not_matched_by_source_delete="doc_id < 50",
    )
    final = t.read(spark)
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


_MERGE_CLAUSES_ORACLE = """
WITH tgt AS (SELECT * FROM documents WHERE doc_id < 400),
     src AS (
       SELECT doc_id, lang, 'merged' AS source, n_chars + 1000 AS n_chars,
              CASE WHEN doc_id % 7 = 0 THEN 'del' ELSE 'keep' END AS op
       FROM documents WHERE doc_id >= 300 AND doc_id < 500
     ),
     final AS (
       -- target-only survivors of the not-matched-by-source sweep
       SELECT t.doc_id, t.source, t.n_chars FROM tgt t
       WHERE t.doc_id >= 50 AND NOT EXISTS (
         SELECT 1 FROM src s WHERE s.doc_id = t.doc_id)
       UNION ALL
       -- matched, neither deleted nor updated: kept verbatim
       SELECT t.doc_id, t.source, t.n_chars
       FROM tgt t JOIN src s USING (doc_id)
       WHERE s.op <> 'del' AND t.lang IS DISTINCT FROM 'en'
       UNION ALL
       -- matched update: replaced by the source row
       SELECT s.doc_id, s.source, s.n_chars
       FROM tgt t JOIN src s USING (doc_id)
       WHERE s.op <> 'del' AND t.lang = 'en'
       UNION ALL
       -- conditional insert of source-only rows
       SELECT s.doc_id, s.source, s.n_chars FROM src s
       WHERE s.n_chars % 2 = 0 AND NOT EXISTS (
         SELECT 1 FROM tgt t WHERE t.doc_id = s.doc_id)
     )
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM final GROUP BY source
"""


def _manifest_cdc_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed correctness: anchor snapshot, then an append, a DV
    delete, and a DV merge; read_changes(0) must name every inserted
    and deleted row with its commit version. The oracle constructs each
    commit's expected change set directly from the source table — a
    missed delete, a phantom insert, or a wrong version diverges the
    aggregate hash."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_cdc_"), bloom_cols=["doc_id"]
    )
    t.commit_append(docs.filter(F.col("doc_id") < 300))          # v0 anchor
    t.commit_append(docs.filter(F.col("doc_id") >= 300))         # v1 inserts
    t.delete_where_dv(
        spark, [("doc_id", ">=", 100), ("doc_id", "<", 200)]
    )                                                            # v2 deletes
    ups = docs.filter(F.col("doc_id") < 40).withColumn("source", F.lit("m"))
    t.merge_upsert_dv(spark, ups, key="doc_id")                  # v3 del+ins
    ch = t.read_changes(spark, since_version=0)
    return ch.groupBy(
        F.col("_commit_version").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


_CDC_ORACLE = """
SELECT 1 AS commit_version, 'insert' AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id >= 300
UNION ALL
SELECT 2, 'delete', CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT),
       CAST(SUM(n_chars) AS BIGINT)
FROM documents WHERE doc_id >= 100 AND doc_id < 200
UNION ALL
SELECT 3, 'delete', CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT),
       CAST(SUM(n_chars) AS BIGINT)
FROM documents WHERE doc_id < 40
UNION ALL
SELECT 3, 'insert', CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT),
       CAST(SUM(n_chars) AS BIGINT)
FROM documents WHERE doc_id < 40
"""


def _manifest_in_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`IN`-list data skipping — the id-batch point-lookup pattern
    (reference vector_field.py:316-318: membership-list pruning over
    the glyph index). Three disjoint-range appends with doc_id stats +
    blooms, then ONE read under a 5-value IN list: only files that may
    hold ANY listed id are opened (pinned in test_manifest.py). The
    oracle computes the same IN directly — a wrongly-pruned file drops
    its row and diverges the hash."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_in_"),
        stats_cols=["doc_id"],
        bloom_cols=["doc_id"],
    )
    t.commit_append(docs.filter(F.col("doc_id") < 150))
    t.commit_append(docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)))
    t.commit_append(docs.filter(F.col("doc_id") >= 300))
    pruned = t.read_where(spark, [("doc_id", "in", [7, 12, 160, 161, 450])])
    return pruned.select("doc_id", "lang", "n_chars")


_IN_SKIPPING_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id IN (7, 12, 160, 161, 450)
"""


def _manifest_null_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL data skipping via per-file null-count
    stats: one append holds only null `v` (doc_id % 3 = 0), the other
    only non-null, so each null predicate provably prunes the opposite
    append's files (pinned in test_manifest.py). Both branches are read
    through the pruning path and aggregated; the oracle computes the
    same split directly from the modulus."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(F.col("doc_id") % 3 != 0, F.col("n_chars")).alias("v"),
    )
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_null_"), stats_cols=["v"]
    )
    t.commit_append(docs.filter(F.col("doc_id") % 3 == 0))
    t.commit_append(docs.filter(F.col("doc_id") % 3 != 0))
    a = (
        t.read_where(spark, [("v", "is_null", None)])
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .withColumn("part", F.lit("null"))
    )
    b = (
        t.read_where(spark, [("v", "is_not_null", None)])
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .withColumn("part", F.lit("not_null"))
    )
    return a.unionByName(b)


_NULL_SKIPPING_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars, 'null' AS part
FROM documents WHERE doc_id % 3 = 0 GROUP BY lang
UNION ALL
SELECT lang, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT), 'not_null'
FROM documents WHERE doc_id % 3 != 0 GROUP BY lang
"""


def _manifest_bucketed_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion vectors composed with the BUCKETED bounded merge — the
    r5 hazard closed in round 6: soft-delete doc_id ∈ [100, 200), then
    a bounded merge upserting [150, 180) with source='merged'. The
    merge rewrites only the touched buckets (materializing their DV
    rows away) and carries the untouched buckets' DV rows forward — a
    resurrection of any soft-deleted row, or a dropped carried delete,
    diverges the per-source aggregate hash."""
    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable

    docs = load_table(spark, "documents", sf_dir)
    t = BucketedManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_bdv_"),
        key="doc_id",
        n_buckets=8,
        stats_cols=["doc_id"],
    )
    t.commit_overwrite(docs)
    t.delete_where_dv(spark, [("doc_id", ">=", 100), ("doc_id", "<", 200)])
    ups = docs.filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 180)
    ).withColumn("source", F.lit("merged"))
    t.merge_upsert(spark, ups)
    final = t.read(spark)
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


_BUCKETED_DV_ORACLE = """
WITH final AS (
  SELECT doc_id, n_chars, source FROM documents
  WHERE NOT (doc_id >= 100 AND doc_id < 200)
  UNION ALL
  SELECT doc_id, n_chars, 'merged' AS source FROM documents
  WHERE doc_id >= 150 AND doc_id < 180
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM final GROUP BY source
"""


def _manifest_cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate MAINTENANCE over the CDC feed — the reason
    a change feed exists: a consumer holds a materialized per-lang
    aggregate computed at an anchor version and refreshes it to the
    latest version by folding in ONLY the changes (inserts add,
    deletes subtract), never re-reading the table.

        refreshed = anchor_agg ⊕ Σ(inserts) ⊖ Σ(deletes)

    The oracle computes the FINAL snapshot aggregate directly, so the
    query is green only if (anchor + changes) ≡ (final state) — any
    missed delete, phantom insert, or double-counted change breaks the
    additive identity. Cost is O(anchor groups + changed rows): at
    100 TB the anchor agg is a tiny materialization and each refresh
    touches only the commits since."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_inc_agg_"), bloom_cols=["doc_id"]
    )
    t.commit_append(docs.filter(F.col("doc_id") < 250))            # v0 anchor
    anchor_v = t.latest_version()
    t.commit_append(docs.filter(F.col("doc_id") >= 250))           # v1 inserts
    t.delete_where_dv(spark, [("doc_id", ">=", 50), ("doc_id", "<", 130)])  # v2
    ups = docs.filter(F.col("doc_id") < 30).withColumn("n_chars", F.col("n_chars") + 7)
    t.merge_upsert_dv(spark, ups, key="doc_id")                    # v3 del+ins

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("sum_doc_id"),
        )

    anchor = agg(t.read(spark, anchor_v))
    ch = t.read_changes(spark, since_version=anchor_v)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = ch.withColumn("__sign", sign).groupBy("lang").agg(
        F.sum("__sign").alias("n_docs"),
        F.sum(F.col("n_chars") * F.col("__sign")).alias("sum_chars"),
        F.sum(F.col("doc_id") * F.col("__sign")).alias("sum_doc_id"),
    )
    refreshed = (
        anchor.unionByName(delta)
        .groupBy("lang")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_chars").alias("sum_chars"),
            F.sum("sum_doc_id").alias("sum_doc_id"),
        )
        .filter(F.col("n_docs") > 0)  # fully-deleted groups leave the view
    )
    return refreshed


_CDC_INCREMENTAL_AGG_ORACLE = """
WITH final AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id < 30 THEN n_chars + 7 ELSE n_chars END AS n_chars
  FROM documents
  WHERE NOT (doc_id >= 50 AND doc_id < 130)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM final GROUP BY lang
"""


def _manifest_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution end-to-end (round 6): half the corpus
    commits under the original schema, the other half appends with an
    extra `quality` column via `evolve=True`, then a DV merge updates a
    few rows under the widened schema. Reads resolve pre-evolution
    files with NULL for the appended column (explicit-schema scan — no
    mergeSchema); the oracle constructs the same union directly, so a
    wrong NULL-fill, a dropped column, or a mis-resolved old file
    diverges the aggregate hash."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "n_chars", "source"
    )
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_evo_"), bloom_cols=["doc_id"]
    )
    t.commit_append(docs.filter(F.col("doc_id") < 250))
    wide = docs.filter(F.col("doc_id") >= 250).withColumn(
        "quality", (F.col("n_chars") % 100).cast("long")
    )
    t.commit_append(wide, evolve=True)
    ups = docs.filter(F.col("doc_id") < 20).withColumn(
        "quality", F.lit(777).cast("long")
    )
    t.merge_upsert_dv(spark, ups, key="doc_id")
    final = t.read(spark)
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.coalesce(F.col("quality"), F.lit(-1))).alias("sum_quality"),
    )


_SCHEMA_EVOLUTION_ORACLE = """
WITH final AS (
  SELECT doc_id, lang,
         CASE
           WHEN doc_id < 20 THEN 777
           WHEN doc_id >= 250 THEN n_chars % 100
           ELSE -1
         END AS q
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(q) AS BIGINT) AS sum_quality
FROM final GROUP BY lang
"""


def _manifest_dnf_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive (DNF) data skipping: three disjoint-range appends,
    then ONE read under `(40 ≤ doc_id < 60) OR doc_id = 450` — the
    union of the per-group file prunes opens the first and third
    appends' files and skips the middle entirely (pinned in
    test_manifest.py). The oracle computes the same disjunction
    directly."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_dnf_"), stats_cols=["doc_id"]
    )
    t.commit_append(docs.filter(F.col("doc_id") < 150))
    t.commit_append(docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)))
    t.commit_append(docs.filter(F.col("doc_id") >= 300))
    pruned = t.read_where_any(
        spark,
        [
            [("doc_id", ">=", 40), ("doc_id", "<", 60)],
            [("doc_id", "=", 450)],
        ],
    )
    return pruned.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


_DNF_SKIPPING_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE (doc_id >= 40 AND doc_id < 60) OR doc_id = 450
GROUP BY lang
"""


def _manifest_widening_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-widening schema evolution end-to-end (round 7): half the
    corpus commits with `n_chars_i` as INT and `score` as FLOAT, the
    other half appends the SAME columns widened to BIGINT/DOUBLE via
    `evolve=True`, then DV deletes carve a slice out of EACH file
    generation. Reads resolve the narrow files through the widened
    explicit schema (scan-time up-cast, no rewrite); the oracle
    computes the same arithmetic directly, so a mis-cast, a dropped
    narrow file, or a DV mispositioned across the widening boundary
    diverges the hash. `score` values are small integers (n_chars mod
    128) — exactly representable in float32, so the float→double
    up-cast and the cross-engine sums are bit-exact."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "n_chars")
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_widen_"), stats_cols=["doc_id"]
    )
    t.commit_append(
        docs.filter(F.col("doc_id") < 250).select(
            "doc_id", "lang",
            F.col("n_chars").cast("int").alias("n_chars_i"),
            (F.col("n_chars") % 128).cast("float").alias("score"),
        )
    )
    t.commit_append(
        docs.filter(F.col("doc_id") >= 250).select(
            "doc_id", "lang",
            F.col("n_chars").cast("bigint").alias("n_chars_i"),
            (F.col("n_chars") % 128).cast("double").alias("score"),
        ),
        evolve=True,
    )
    # one DV slice in the narrow generation, one in the wide
    t.delete_where_dv(spark, [("doc_id", ">=", 100), ("doc_id", "<", 150)])
    t.delete_where_dv(spark, [("doc_id", ">=", 300), ("doc_id", "<", 350)])
    return t.read(spark).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars_i").alias("sum_chars"),
        F.sum("score").cast("long").alias("sum_score"),
    )


_WIDENING_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_chars % 128) AS BIGINT) AS sum_score
FROM documents
WHERE NOT (doc_id >= 100 AND doc_id < 150)
  AND NOT (doc_id >= 300 AND doc_id < 350)
GROUP BY lang
"""


def _manifest_rename_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column rename end-to-end (round 7): commit half
    the corpus, RENAME doc_id→document_id and n_chars→length_chars
    (zero files rewritten — field-id-style indirection: physical names
    stay in the files, logical names live in the manifest), then
    append the other half under the NEW names, DV-delete through a
    renamed predicate, and bounded-merge on the renamed key. The final
    aggregate uses the logical names; the oracle computes the same
    arithmetic directly — a read resolving the wrong physical column,
    a predicate mistranslation, or a merge keyed on the wrong name
    diverges the hash."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "n_chars")
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_ren_"), stats_cols=["doc_id"]
    )
    t.commit_append(docs.filter(F.col("doc_id") < 250), sort_by=["doc_id"])
    t.rename_column("doc_id", "document_id")
    t.rename_column("n_chars", "length_chars")
    t.commit_append(
        docs.filter(F.col("doc_id") >= 250).select(
            F.col("doc_id").alias("document_id"), "lang",
            F.col("n_chars").alias("length_chars"),
        ),
        sort_by=["document_id"],
    )
    t.delete_where_dv(spark, [("document_id", ">=", 200), ("document_id", "<", 260)])
    ups = docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("document_id"), "lang",
        (F.col("n_chars") + 1000).alias("length_chars"),
    )
    t.merge_upsert_dv(spark, ups, key="document_id")
    return t.read(spark).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("document_id").alias("sum_id"),
        F.sum("length_chars").alias("sum_len"),
    )


_RENAME_ORACLE = """
WITH final AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id < 10 THEN n_chars + 1000 ELSE n_chars END AS len
  FROM documents
  WHERE NOT (doc_id >= 200 AND doc_id < 260)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_id,
       CAST(SUM(len) AS BIGINT) AS sum_len
FROM final GROUP BY lang
"""


def _manifest_ndv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents into an NDV-tracked table across two appends,
    then answer distinct-count questions from the MANIFEST ALONE
    (`ndv_estimate` takes no SparkSession — per-file HLL register
    vectors merge by max). The oracle recomputes the identical register
    pipeline over the same rows in DuckDB: the estimate is a pure
    function of the distinct value set, so split-vs-single-commit and
    engine cannot change a bit."""
    docs = load_table(spark, "documents", sf_dir)
    t = ManifestTable(
        tempfile.mkdtemp(prefix="aeuc_manifest_ndv_"), ndv_cols=["doc_id", "lang"]
    )
    t.commit_append(docs.filter(F.col("doc_id") % 2 == 0))
    t.commit_append(docs.filter(F.col("doc_id") % 2 == 1))
    ndv_doc = t.ndv_estimate("doc_id")
    ndv_lang = t.ndv_estimate("lang")
    return spark.createDataFrame(
        [(round(ndv_doc, 2), round(ndv_lang, 2))],
        "ndv_doc_id double, ndv_lang double",
    ).crossJoin(
        docs.agg(
            F.countDistinct("doc_id").cast("long").alias("exact_doc_id"),
            F.countDistinct("lang").cast("long").alias("exact_lang"),
        )
    )


def _ndv_oracle() -> str:
    from aeuc_vector_db_spark.operators.sketch import (
        HLL_ALPHA,
        HLL_M,
        HLL_P,
        HLL_W,
    )
    from aeuc_vector_db_spark.queries.textops import _dk_hex32

    shift = HLL_W + 1
    num = HLL_ALPHA * HLL_M * HLL_M * float(1 << shift)

    def est(key_expr: str) -> str:
        return f"""(
  WITH hv AS (SELECT {_dk_hex32(f"sha256({key_expr})")} AS h FROM documents),
  rr AS (
    SELECT h % {HLL_M} AS register,
           CASE WHEN (h >> {HLL_P}) = 0 THEN {shift}
                ELSE {shift} - length(format('{{:b}}', h >> {HLL_P})) END AS rho
    FROM hv
  ),
  regs AS (SELECT register, MAX(rho) AS maxrho FROM rr GROUP BY register),
  agg AS (
    SELECT COUNT(*) AS n_present,
           SUM(CAST(1 AS BIGINT) << CAST({shift} - maxrho AS INT)) AS s_present
    FROM regs
  ),
  e AS (
    SELECT ({HLL_M} - n_present) AS v_zero,
           s_present + ({HLL_M} - n_present) * (CAST(1 AS BIGINT) << {shift}) AS s_scaled
    FROM agg
  )
  SELECT ROUND(CASE WHEN ({num!r} / CAST(s_scaled AS DOUBLE)) <= {2.5 * HLL_M!r} AND v_zero > 0
               THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(v_zero AS DOUBLE))
               ELSE ({num!r} / CAST(s_scaled AS DOUBLE)) END, 2)
  FROM e
)"""

    return f"""
SELECT {est('CAST(doc_id AS VARCHAR)')} AS ndv_doc_id,
       {est('lang')} AS ndv_lang,
       (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM documents) AS exact_doc_id,
       (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents) AS exact_lang
"""


_NDV_ORACLE = _ndv_oracle()


QUERIES = {
    "manifest_merge_clauses_read": (
        _manifest_merge_clauses_read,
        _MERGE_CLAUSES_ORACLE,
    ),
    "manifest_ndv_read": (_manifest_ndv_read, _NDV_ORACLE),
    "manifest_dnf_skipping_read": (
        _manifest_dnf_skipping_read,
        _DNF_SKIPPING_ORACLE,
    ),
    "manifest_schema_evolution_read": (
        _manifest_schema_evolution_read,
        _SCHEMA_EVOLUTION_ORACLE,
    ),
    "manifest_cdc_incremental_agg": (
        _manifest_cdc_incremental_agg,
        _CDC_INCREMENTAL_AGG_ORACLE,
    ),
    "manifest_in_skipping_read": (_manifest_in_skipping_read, _IN_SKIPPING_ORACLE),
    "manifest_null_skipping_read": (
        _manifest_null_skipping_read,
        _NULL_SKIPPING_ORACLE,
    ),
    "manifest_bucketed_dv_read": (_manifest_bucketed_dv_read, _BUCKETED_DV_ORACLE),
    "manifest_cdc_read": (_manifest_cdc_read, _CDC_ORACLE),
    "manifest_bloom_read": (_manifest_bloom_read, _BLOOM_ORACLE),
    "manifest_merge_read": (_manifest_merge_read, _MANIFEST_ORACLE),
    "manifest_incremental_read": (_manifest_incremental_read, _INCREMENTAL_ORACLE),
    "manifest_dv_read": (_manifest_dv_read, _DV_ORACLE),
}

# Round 14 (VERDICT r13 #2): the five longest-green manifest reads folded
# into manifest_read_composite (queries/composites.py); (fn, oracle)
# pairs stay here so the composite reuses the arithmetic verbatim and
# tests can still drive the callables individually.
FOLDED = {
    "manifest_merge_dv_read": (_manifest_merge_dv_read, _MANIFEST_ORACLE),
    "manifest_rename_read": (_manifest_rename_read, _RENAME_ORACLE),
    "manifest_skipping_read": (_manifest_skipping_read, _SKIPPING_ORACLE),
    "manifest_widening_read": (_manifest_widening_read, _WIDENING_ORACLE),
    "manifest_zorder_read": (_manifest_zorder_read, _ZORDER_ORACLE),
}
