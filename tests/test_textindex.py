"""Materialized inverted text index: bit-parity with the corpus-scan
BM25, term-file pruning, and additive stats maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators import text as TX
from aeuc_vector_db_spark.operators.textindex import TextIndex
from aeuc_vector_db_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF01).cache()


def test_indexed_bm25_matches_scan_path(spark, docs, tmp_path):
    """Build on half the corpus, append the rest, query — every row
    (ids, ranks, scores to the bit) must equal the scan path."""
    idx = TextIndex.build(
        spark, docs.filter(F.col("doc_id") % 2 == 0), str(tmp_path / "ti")
    )
    idx.append_docs(spark, docs.filter(F.col("doc_id") % 2 == 1))
    q = ["vector", "stream", "hash"]
    got = [tuple(r) for r in idx.bm25_topk(spark, q, top_k=15).collect()]
    want = [tuple(r) for r in TX.bm25_topk(docs, q, top_k=15).collect()]
    assert got == want and len(got) == 15


def test_postings_reads_are_term_pruned(spark, docs, tmp_path):
    """The whole point of the index: a query's postings read opens only
    the files whose term range/bloom can contain its terms."""
    idx = TextIndex.build(spark, docs, str(tmp_path / "ti"), n_term_files=8)
    total = len(idx.postings.manifest()["files"])
    keep, tot = idx.postings.files_for([("term", "in", ["vector"])])
    assert tot == total == 8
    assert len(keep) < total


def test_stats_fold_is_additive(spark, docs, tmp_path):
    """build(all) and build(half)+append(half) must produce the same
    stats row — the scalar the scoring depends on."""
    a = TextIndex.build(spark, docs, str(tmp_path / "a"))
    b = TextIndex.build(
        spark, docs.filter(F.col("doc_id") < 250), str(tmp_path / "b")
    )
    b.append_docs(spark, docs.filter(F.col("doc_id") >= 250))
    ra = a.stats.read(spark).collect()[0].asDict()
    rb = b.stats.read(spark).collect()[0].asDict()
    assert ra == rb and ra["n_docs"] == 500


def test_empty_query_raises(spark, docs, tmp_path):
    idx = TextIndex.build(
        spark, docs.filter(F.col("doc_id") < 20), str(tmp_path / "ti")
    )
    with pytest.raises(ValueError, match="empty query"):
        idx.bm25_topk(spark, ["", None])
