"""Python DataSource for the offset log (sources/pyds.py): batch
read/write, partition/offset filter pushdown pruning, two-phase-commit
writer contracts, and streaming exactly-once across a query restart."""

from __future__ import annotations

import json
import os

import pytest

from aeuc_vector_db_spark.sources import pyds
from aeuc_vector_db_spark.streaming.offset_source import OffsetLogSource


def _compact(d: dict) -> str:
    return json.dumps(d, separators=(",", ":"))


@pytest.fixture()
def log_root(spark, tmp_path):
    pyds.register(spark)
    pyds.register(spark)  # idempotent re-registration must not raise
    return str(tmp_path / "log")


def test_batch_write_read_roundtrip_dense_offsets(spark, log_root):
    df = spark.createDataFrame(
        [(i % 3, _compact({"k": i})) for i in range(20)],
        "partition INT, value STRING",
    )
    (df.write.format("aeuc_offsetlog").option("path", log_root)
       .option("n_partitions", "3").mode("append").save())
    back = (spark.read.format("aeuc_offsetlog")
            .option("path", log_root).load())
    rows = back.collect()
    assert len(rows) == 20 and len(set(rows)) == 20
    # offsets dense per partition, values intact
    by_part: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.partition, r.offset)):
        by_part.setdefault(r.partition, []).append(r)
    for p, rs in by_part.items():
        assert [r.offset for r in rs] == list(range(len(rs)))
        for r in rs:
            assert json.loads(r.value)["k"] % 3 == p
    # a second append continues the offset sequence (log, not table)
    spark.createDataFrame(
        [(0, _compact({"k": 100}))], "partition INT, value STRING"
    ).write.format("aeuc_offsetlog").option("path", log_root) \
        .mode("append").save()
    p0 = (spark.read.format("aeuc_offsetlog").option("path", log_root)
          .load().filter("partition = 0").collect())
    assert max(r.offset for r in p0) == len(p0) - 1
    assert any(r.value == '{"k":100}' for r in p0)


def test_filter_pushdown_prunes_planned_ranges(spark, log_root):
    src = OffsetLogSource(log_root, n_partitions=4)
    for p in range(4):
        src.append(p, [{"p": p, "i": i} for i in range(10)])
    rd = (spark.read.format("aeuc_offsetlog").option("path", log_root)
          .option("chunk_records", "1"))
    full = rd.load()
    assert full.rdd.getNumPartitions() == 40
    one = full.filter("partition = 2")
    # consumed EqualTo(partition) prunes 3 of 4 logs at PLANNING time
    assert one.rdd.getNumPartitions() == 10
    assert sorted(r.offset for r in one.collect()) == list(range(10))
    rng = full.filter("partition = 1 AND offset >= 7 AND offset < 9")
    assert rng.rdd.getNumPartitions() == 2  # exactly the 2 records
    assert sorted((r.offset, r.value) for r in rng.collect()) == [
        (7, '{"p":1,"i":7}'), (8, '{"p":1,"i":8}')
    ]
    # residual (non-partition/offset) predicates still evaluate
    assert full.filter("value LIKE '%\"i\":3%'").count() == 4


def test_writer_contracts(spark, log_root):
    df = spark.createDataFrame(
        [(0, _compact({"a": 1}))], "partition INT, value STRING"
    )
    with pytest.raises(Exception, match="append-only"):
        (df.write.format("aeuc_offsetlog").option("path", log_root)
           .mode("overwrite").save())
    with pytest.raises(Exception, match="must include"):
        (spark.createDataFrame([(1,)], "x INT").write
         .format("aeuc_offsetlog").option("path", log_root)
         .mode("append").save())
    # non-JSON value fails in the task (stage phase); nothing committed
    bad = spark.createDataFrame(
        [(0, "not json")], "partition INT, value STRING"
    )
    with pytest.raises(Exception, match="not JSON"):
        (bad.write.format("aeuc_offsetlog").option("path", log_root)
            .option("n_partitions", "2").mode("append").save())
    assert OffsetLogSource(log_root, 2).latest_offsets() == {0: 0, 1: 0}
    # out-of-range partition fails loud, not silent modulo
    oob = spark.createDataFrame(
        [(9, _compact({"a": 1}))], "partition INT, value STRING"
    )
    with pytest.raises(Exception, match="out of range"):
        (oob.write.format("aeuc_offsetlog").option("path", log_root)
            .option("n_partitions", "2").mode("append").save())


def test_streaming_exactly_once_across_restart(spark, log_root, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src = OffsetLogSource(log_root, n_partitions=2)
    src.append(0, [{"k": i} for i in range(5)])
    src.append(1, [{"k": 100 + i} for i in range(3)])
    q = (spark.readStream.format("aeuc_offsetlog").option("path", log_root)
         .option("n_partitions", "2").option("max_records_per_batch", "4")
         .load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        src.append(0, [{"k": 200}])
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 9
    # restart from the checkpoint: no redelivery of consumed offsets,
    # new appends flow, rate cap respected
    q2 = (spark.readStream.format("aeuc_offsetlog").option("path", log_root)
          .option("n_partitions", "2").load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).start())
    try:
        q2.processAllAvailable()
        src.append(1, [{"k": 300}, {"k": 301}])
        q2.processAllAvailable()
    finally:
        q2.stop()
    df = spark.read.parquet(out)
    rows = df.collect()
    assert len(rows) == 11 and len(set(rows)) == 11
    got = sorted((r.partition, r.offset, json.loads(r.value)["k"])
                 for r in rows)
    assert got[-2:] == [(1, 3, 300), (1, 4, 301)]


def test_staging_dir_left_clean_after_commit(spark, log_root):
    df = spark.createDataFrame(
        [(i % 2, _compact({"k": i})) for i in range(8)],
        "partition INT, value STRING",
    )
    (df.write.format("aeuc_offsetlog").option("path", log_root)
       .option("n_partitions", "2").mode("append").save())
    staging = os.path.join(log_root, ".staging")
    assert not os.path.isdir(staging) or os.listdir(staging) == []
    assert OffsetLogSource(log_root, 2).latest_offsets() == {0: 4, 1: 4}
