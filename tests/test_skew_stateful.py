"""Tests: salted-join equivalence/distribution and the stateful
running-counts streaming operator."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 1000 rows, 90% on key 'hot'
    rows = [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)]
    return spark.createDataFrame(rows, "row_id long, key string")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("hot", "H"), ("k10", "A"), ("k20", "B")], "key string, attr string"
    )


def test_salted_join_equals_plain_join(skewed, dim):
    plain = skewed.join(dim, "key").select("row_id", "key", "attr")
    salted = skew.salted_join(skewed, dim, "key", buckets=8, unique_cols=["row_id"]).select(
        "row_id", "key", "attr"
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salt_spreads_hot_key(skewed):
    salted = skew.with_salt(skewed.filter(F.col("key") == "hot"), 8, ["row_id"])
    counts = [r["n"] for r in salted.groupBy("__salt__").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 8  # all buckets used
    assert max(counts) < 900 * 0.3  # no bucket holds the whole hot key


def test_salted_join_left_outer(skewed, dim):
    plain = skewed.join(dim, "key", "left").select("row_id", "attr")
    salted = skew.salted_join(
        skewed, dim, "key", buckets=4, unique_cols=["row_id"], how="left"
    ).select("row_id", "attr")
    assert sorted(plain.collect(), key=str) == sorted(salted.collect(), key=str)


def test_two_phase_agg_matches_direct(spark, skewed):
    df = skewed.withColumn("v", F.col("row_id") % 7)
    direct = {
        r["key"]: (r["s"], r["c"])
        for r in df.groupBy("key").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    two = {
        r["key"]: (r["sum_v"], r["count"])
        for r in skew.two_phase_agg(df, "key", "v", unique_cols=["row_id"]).collect()
    }
    assert direct == two


def test_stateful_running_counts_across_batches(spark, tmp_path):
    """applyInPandasWithState accumulates per-key totals across
    micro-batches (maxFilesPerTrigger=1 forces one batch per file)."""
    from aeuc_vector_db_spark.streaming import ingest as SI

    src = f"{tmp_path}/src"
    os.makedirs(src)

    def entry(i, glyph):
        return json.dumps(
            {"entry_id": f"e{i}", "glyph_id": glyph, "outer_context_id": 0,
             "embedding": [0.1] * 4, "source_tag": "t", "version": "1",
             "ts": f"2024-01-01T00:{i:02d}:00.000Z"}
        )

    with open(f"{src}/f1.jsonl", "w") as f:
        f.write("\n".join([entry(1, 7), entry(2, 7), entry(3, 9)]))
    with open(f"{src}/f2.jsonl", "w") as f:
        f.write("\n".join([entry(4, 7), entry(5, 9)]))

    stream = SI.read_vector_entry_stream(spark, src, max_files_per_trigger=1)
    counts = SI.running_counts_stateful(stream, key_col="glyph_id")
    q = (
        counts.writeStream.outputMode("update")
        .format("memory").queryName("running_counts")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from running_counts").collect()
    # last emitted total per key must be the full accumulated count
    final = {}
    for r in rows:
        final[r["key"]] = max(final.get(r["key"], 0), r["total_count"])
    assert final == {7: 3, 9: 2}
    # multiple emissions for key 7 prove state persisted across batches
    assert sum(1 for r in rows if r["key"] == 7) >= 2
