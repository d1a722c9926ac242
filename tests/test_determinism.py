"""SURVEY §5.4: identical results under different parallelism. Every
declared query must canonicalize to the same value hash whether the
shuffle runs on 1 partition or 32 — the property that makes the DuckDB
oracle comparison (and any cluster re-run) meaningful."""

from __future__ import annotations

import pytest

import aeuc_vector_db_spark.queries as Q
from tools.check_correctness import canon

SF = "/root/testdata/sf0.01"

# Representative set: decimal aggs, vector aggs (posexplode reassembly),
# session windows (gaps-and-islands), minhash banding, window top-k.
REPRESENTATIVE = [
    "rel_pricing_summary",
    # centroids_by_label rides cluster_family_composite since round 14 —
    # the composite covers the same posexplode vector-agg path plus five
    # more cluster-family parts
    "cluster_family_composite",
    "events_sessionize",
    "doc_minhash_near_dup",
    "knn_cosine_topk",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_same_hash_on_1_and_32_shuffle_partitions(spark, name):
    fn = Q.queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = canon(fn(spark, SF).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = canon(fn(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert one == many
