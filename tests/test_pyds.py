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


# -- streaming sink: epoch-idempotent exactly-once appends -------------------

def _staged_msgs(writer, rows_by_part: dict) -> list:
    """Stage rows as one synthetic task message (unit-level harness for
    commit-protocol tests — the real path stages via write())."""
    import uuid as _uuid
    os.makedirs(writer.staging, exist_ok=True)
    files = []
    for p, values in sorted(rows_by_part.items()):
        path = os.path.join(writer.staging, f"t0-p{p}-{_uuid.uuid4().hex}.jsonl")
        with open(path, "w") as fh:
            for v in values:
                fh.write(json.dumps(v, separators=(",", ":")) + "\n")
        files.append((p, path, len(values)))
    return [pyds._Staged(task=0, files=files)]


def test_stream_sink_end_to_end_exactly_once(spark, tmp_path):
    pyds.register(spark)
    src_root = str(tmp_path / "srclog")
    sink_root = str(tmp_path / "sinklog")
    ckpt = str(tmp_path / "ckpt")
    src = OffsetLogSource(src_root, n_partitions=2)
    src.append(0, [{"k": i} for i in range(6)])
    src.append(1, [{"k": 100 + i} for i in range(4)])

    def start():
        return (spark.readStream.format("aeuc_offsetlog")
                .option("path", src_root).option("n_partitions", "2").load()
                .writeStream.format("aeuc_offsetlog")
                .option("path", sink_root).option("n_partitions", "2")
                .option("checkpointLocation", ckpt).start())

    q = start()
    try:
        q.processAllAvailable()
        src.append(0, [{"k": 200}])
        q.processAllAvailable()
    finally:
        q.stop()
    q2 = start()  # restart: consumed offsets must not re-append
    try:
        q2.processAllAvailable()
        src.append(1, [{"k": 300}])
        q2.processAllAvailable()
    finally:
        q2.stop()
    back = (spark.read.format("aeuc_offsetlog").option("path", sink_root)
            .option("n_partitions", "2").load().collect())
    ks = sorted(json.loads(r.value)["k"] for r in back)
    assert ks == sorted(
        list(range(6)) + [100, 101, 102, 103, 200, 300]
    ), ks
    assert len(back) == len(set(back))
    led = pyds._EpochLedger(sink_root)
    assert led.committed_counts() == {0: 7, 1: 5}
    assert led.pending_intent() is None


def test_stream_sink_replayed_epoch_is_idempotent(tmp_path):
    root = str(tmp_path / "log")
    w = pyds.OffsetLogStreamWriter({"path": root, "n_partitions": "2"})
    w.commit(_staged_msgs(w, {0: [{"a": 1}, {"a": 2}], 1: [{"b": 3}]}), 0)
    src = OffsetLogSource(root, 2)
    assert src.latest_offsets() == {0: 2, 1: 1}
    # Spark replays epoch 0 after a driver crash: same batchId, fresh
    # staged files — nothing may append twice
    w.commit(_staged_msgs(w, {0: [{"a": 1}, {"a": 2}], 1: [{"b": 3}]}), 0)
    assert src.latest_offsets() == {0: 2, 1: 1}
    assert os.listdir(w.staging) == []  # replay's staging discarded
    w.commit(_staged_msgs(w, {1: [{"b": 4}]}), 1)
    assert src.latest_offsets() == {0: 2, 1: 2}


def test_stream_sink_crash_mid_commit_rolls_back_by_truncation(tmp_path):
    root = str(tmp_path / "log")
    w = pyds.OffsetLogStreamWriter({"path": root, "n_partitions": "2"})
    w.commit(_staged_msgs(w, {0: [{"a": 1}], 1: [{"b": 1}]}), 0)
    src = OffsetLogSource(root, 2)
    led = pyds._EpochLedger(root)
    # simulate a commit of epoch 1 that crashed mid-append: intent
    # recorded, partition 0 appended, partition 1 and the committed
    # record never happened
    sizes = {}
    for p in range(2):
        lp, ip = src._log_path(p), src._idx_path(p)
        sizes[str(p)] = [os.path.getsize(lp), os.path.getsize(ip)]
    led.append({"kind": "intent", "batch_id": 1, "sizes": sizes})
    src.append(0, [{"a": 2}])  # the partial append of the dead attempt
    assert src.latest_offsets() == {0: 2, 1: 1}
    # the replayed epoch 1 must first truncate the partial rows, then
    # land exactly its own
    w.commit(_staged_msgs(w, {0: [{"a": 2}], 1: [{"b": 2}]}), 1)
    assert src.latest_offsets() == {0: 2, 1: 2}
    assert [json.loads(ln) for ln in src.slice_lines(0, 0, 2)] == [
        {"a": 1}, {"a": 2}
    ]
    assert led.pending_intent() is None


def test_read_committed_hides_rollbackable_tail(spark, tmp_path):
    pyds.register(spark)
    root = str(tmp_path / "log")
    w = pyds.OffsetLogStreamWriter({"path": root, "n_partitions": "2"})
    w.commit(_staged_msgs(w, {0: [{"a": 1}], 1: [{"b": 1}, {"b": 2}]}), 0)
    # an in-flight epoch: intent written, rows appended, NOT committed
    src = OffsetLogSource(root, 2)
    led = pyds._EpochLedger(root)
    sizes = {str(p): [os.path.getsize(src._log_path(p)),
                      os.path.getsize(src._idx_path(p))] for p in range(2)}
    led.append({"kind": "intent", "batch_id": 1, "sizes": sizes})
    src.append(0, [{"a": 99}])
    rd = (spark.read.format("aeuc_offsetlog").option("path", root)
          .option("n_partitions", "2"))
    assert rd.load().count() == 4  # read-uncommitted default
    committed = rd.option("read_committed", "true").load().collect()
    assert len(committed) == 3
    assert all(json.loads(r.value) != {"a": 99} for r in committed)


# -- wire transport: the broker behind the same reader API -------------------

@pytest.fixture()
def wire_broker(tmp_path):
    from aeuc_vector_db_spark.streaming.wire import OffsetWireBroker

    src = OffsetLogSource(str(tmp_path / "wirelog"), n_partitions=3)
    b = OffsetWireBroker(src).start()
    try:
        yield b, src
    finally:
        b.stop()


def test_wire_batch_read_equals_local(spark, wire_broker, log_root):
    b, src = wire_broker
    for p in range(3):
        src.append(p, [{"p": p, "i": i} for i in range(7)])
    wire = (spark.read.format("aeuc_offsetlog")
            .option("host", b.host).option("port", str(b.port))
            .option("chunk_records", "4").load())
    local = (spark.read.format("aeuc_offsetlog")
             .option("path", src.root).load())
    assert sorted(wire.collect()) == sorted(local.collect())
    assert wire.rdd.getNumPartitions() == 6  # ceil(7/4) x 3 planned
    # pushdown prunes over the wire too (fetch ranges, not post-filter)
    two = wire.filter("partition = 0 AND offset >= 5")
    assert two.rdd.getNumPartitions() == 1
    assert sorted(r.offset for r in two.collect()) == [5, 6]


def test_wire_streaming_read_exactly_once(spark, wire_broker, tmp_path):
    b, src = wire_broker
    src.append(0, [{"k": 1}, {"k": 2}])
    out = str(tmp_path / "out")
    q = (spark.readStream.format("aeuc_offsetlog")
         .option("host", b.host).option("port", str(b.port)).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
        src.append(1, [{"k": 3}])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert sorted(json.loads(r.value)["k"] for r in rows) == [1, 2, 3]
    assert len(rows) == len(set(rows))


def test_wire_write_and_read_committed_refused(spark, wire_broker):
    b, _ = wire_broker
    df = spark.createDataFrame(
        [(0, '{"a":1}')], "partition INT, value STRING"
    )
    with pytest.raises(Exception, match="broker append API"):
        (df.write.format("aeuc_offsetlog")
           .option("host", b.host).option("port", str(b.port))
           .mode("append").save())
    with pytest.raises(Exception, match="read_committed requires"):
        (spark.read.format("aeuc_offsetlog")
         .option("host", b.host).option("port", str(b.port))
         .option("read_committed", "true").load().count())


def test_failed_write_task_leaves_no_orphan_staging(spark, log_root):
    bad = spark.createDataFrame(
        [(0, '{"ok":1}'), (1, "not json")], "partition INT, value STRING"
    ).coalesce(1)  # one task: the good row stages before the bad one fails
    with pytest.raises(Exception, match="not JSON"):
        (bad.write.format("aeuc_offsetlog").option("path", log_root)
            .option("n_partitions", "2").mode("append").save())
    staging = os.path.join(log_root, ".staging")
    leftovers = os.listdir(staging) if os.path.isdir(staging) else []
    assert leftovers == [], leftovers


def test_batch_commit_repairs_pending_intent_before_appending(
    spark, log_root
):
    """Review r15: a crashed stream commit leaves a pending intent; a
    BATCH write to the same root must first roll back the partial
    append AND mark the intent aborted — otherwise the later stream
    replay would truncate away the batch's committed rows."""
    w = pyds.OffsetLogStreamWriter({"path": log_root, "n_partitions": "2"})
    w.commit(_staged_msgs(w, {0: [{"a": 1}]}), 0)
    src = OffsetLogSource(log_root, 2)
    led = pyds._EpochLedger(log_root)
    sizes = {str(p): [
        os.path.getsize(src._log_path(p))
        if os.path.exists(src._log_path(p)) else 0,
        os.path.getsize(src._idx_path(p))
        if os.path.exists(src._idx_path(p)) else 0,
    ] for p in range(2)}
    led.append({"kind": "intent", "batch_id": 1, "sizes": sizes})
    src.append(0, [{"a": "partial"}])  # the dead attempt's partial rows
    pyds.register(spark)
    (spark.createDataFrame([(1, '{"b":1}')], "partition INT, value STRING")
     .write.format("aeuc_offsetlog").option("path", log_root)
     .option("n_partitions", "2").mode("append").save())
    # partial rolled back, batch row landed, intent resolved
    assert src.latest_offsets() == {0: 1, 1: 1}
    assert led.pending_intent() is None
    # the replayed stream epoch 1 now appends FRESH without truncating
    # the batch row away
    w.commit(_staged_msgs(w, {0: [{"a": 2}]}), 1)
    assert src.latest_offsets() == {0: 2, 1: 1}
    assert [json.loads(ln) for ln in src.slice_lines(1, 0, 1)] == [{"b": 1}]


def test_stream_writer_refuses_complete_output_mode(spark, log_root):
    pyds.register(spark)
    agg = (spark.readStream.format("rate-micro-batch")
           .option("rowsPerBatch", "1").load()
           .groupBy().count()
           .selectExpr("CAST(0 AS INT) AS partition",
                       "to_json(struct(count)) AS value"))
    q = (agg.writeStream.format("aeuc_offsetlog")
            .option("path", log_root).outputMode("complete")
            .option("checkpointLocation", log_root + "_ck").start())
    try:
        # the writer is constructed lazily in the first micro-batch,
        # so the refusal surfaces as the query's failure
        with pytest.raises(Exception, match="append-only"):
            q.processAllAvailable()
    finally:
        q.stop()
    assert not os.path.exists(
        os.path.join(log_root, "partition-00000.jsonl")
    )


def test_wire_stream_reader_rejects_zero_chunk(spark, wire_broker):
    b, _ = wire_broker
    with pytest.raises(Exception, match="chunk_records"):
        (spark.read.format("aeuc_offsetlog")
         .option("host", b.host).option("port", str(b.port))
         .option("chunk_records", "0").load().count())
