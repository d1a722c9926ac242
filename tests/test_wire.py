"""TCP wire transport for the offset source (streaming/wire.py).

Proves the offset design's transport-independence claim with a real
network hop: the same `run_offset_ingest` loop that drove the local
OffsetLogSource drives a broker over TCP, executor-side fetch kernels
and all, with the identical exactly-once behavior under redelivery,
crash-resume, and a producer racing the consumer.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.streaming import offset_source as OS
from aeuc_vector_db_spark.streaming.wire import (
    OffsetWireBroker,
    RemoteOffsetSource,
    _fetch_raw,
    _request,
)
from tests.test_streaming import DIM, _entry


@pytest.fixture()
def broker(tmp_path):
    src = OS.OffsetLogSource(str(tmp_path / "log"), n_partitions=3)
    b = OffsetWireBroker(src).start()
    try:
        yield b
    finally:
        b.stop()


def _rec(i: int, dim: int = DIM) -> dict:
    return json.loads(_entry(i, dim=dim))


def test_wire_protocol_roundtrip(broker):
    remote = RemoteOffsetSource(broker.host, broker.port)
    assert remote.n_partitions == 3
    assert remote.latest_offsets() == {0: 0, 1: 0, 2: 0}
    start, end = remote.append(1, [{"a": 1}, {"a": 2}])
    assert (start, end) == (0, 2)
    assert remote.latest_offsets() == {0: 0, 1: 2, 2: 0}
    # FETCH is pure: the same range re-serves identically (redelivery)
    r1 = _request(broker.host, broker.port,
                  {"op": "fetch", "partition": 1, "start": 0, "end": 2})
    r2 = _request(broker.host, broker.port,
                  {"op": "fetch", "partition": 1, "start": 0, "end": 2})
    assert r1 == r2 and len(r1["records"]) == 2
    assert r1["records"][0][0] == 0 and '"a":1' in r1["records"][0][1]


def test_raw_frame_fetch_matches_json_fetch(broker):
    """The length-prefixed raw-frame FETCH (the poll kernel's hot path)
    serves byte-identical records to the legacy all-JSON FETCH — same
    range, same order, offsets implicit lo+index — including non-ASCII
    payloads and the empty range."""
    remote = RemoteOffsetSource(broker.host, broker.port)
    vals = [{"i": i, "s": f"véc–{i}"} for i in range(7)]
    remote.append(2, vals)
    legacy = _request(
        broker.host, broker.port,
        {"op": "fetch", "partition": 2, "start": 1, "end": 5},
    )["records"]
    raw = _fetch_raw(broker.host, broker.port, 2, 1, 5)
    assert [v for _o, v in legacy] == raw
    assert [o for o, _v in legacy] == list(range(1, 5))
    assert [json.loads(v)["i"] for v in raw] == [1, 2, 3, 4]
    # empty slice: zero records, zero body bytes — not an error
    assert _fetch_raw(broker.host, broker.port, 2, 5, 5) == []
    assert _fetch_raw(broker.host, broker.port, 0, 0, 10) == []
    # errors still arrive as a JSON header line
    with pytest.raises(ValueError, match="broker error"):
        _fetch_raw(broker.host, broker.port, "x", 0, 1)  # type: ignore[arg-type]


def test_wire_malformed_request_fails_loud_broker_survives(broker):
    with pytest.raises(ValueError, match="unknown op"):
        _request(broker.host, broker.port, {"op": "nope"})
    with pytest.raises(ValueError, match="broker error"):
        _request(broker.host, broker.port, {"op": "fetch", "partition": "x"})
    # broker still serves after the bad requests
    assert RemoteOffsetSource(broker.host, broker.port).latest_offsets() == {
        0: 0, 1: 0, 2: 0,
    }


def test_remote_poll_is_distributed_and_lazy(spark, broker):
    remote = RemoteOffsetSource(broker.host, broker.port)
    remote.append(0, [{"i": i} for i in range(5)])
    remote.append(2, [{"i": i} for i in range(7)])
    df, end = remote.poll(spark, {})
    assert end == {0: 5, 1: 0, 2: 7}
    # the fetch runs through an Arrow mapInPandas kernel (executor-side)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    rows = df.collect()
    assert len(rows) == 12
    by_part = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    assert sorted(by_part[0]) == list(range(5))
    assert sorted(by_part[2]) == list(range(7))
    # bounded poll slices per partition
    df2, end2 = remote.poll(spark, {0: 2, 2: 6}, max_records_per_partition=2)
    assert end2 == {0: 4, 1: 0, 2: 7}
    assert df2.count() == 3  # offsets 2,3 of p0 + offset 6 of p2
    # empty poll returns (None, end) without touching Spark
    assert remote.poll(spark, end)[0] is None


def test_wire_ingest_exactly_once_end_to_end(spark, broker, tmp_path):
    """The SAME run_offset_ingest loop, over TCP, into a bucketed
    manifest table: offsets in the sink log, crash-resume, explicit
    redelivery absorbed, invalid rows quarantined by validation."""
    from aeuc_vector_db_spark import schemas
    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable

    remote = RemoteOffsetSource(broker.host, broker.port)
    t = BucketedManifestTable(
        str(tmp_path / "table"), key="entry_id", n_buckets=4
    )
    remote.append(0, [_rec(i) for i in range(0, 6)])
    remote.append(1, [_rec(i) for i in range(6, 10)])

    n = OS.run_offset_ingest(
        spark, remote, t, DIM, max_records_per_partition=3
    )
    assert n >= 2
    got = sorted(r["entry_id"] for r in t.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(10))

    # crash-after-commit: a FRESH consumer over a FRESH connection
    # resumes from the sink's committed offsets — nothing to do
    remote2 = RemoteOffsetSource(broker.host, broker.port)
    assert OS.committed_source_offsets(t) == remote2.latest_offsets()
    assert OS.run_offset_ingest(spark, remote2, t, DIM) == 0

    # crash-before-commit: redeliver an already-committed range over
    # the wire; same end offsets ⇒ same epoch marker ⇒ no duplicate
    batch, end = remote.poll(spark, {0: 3, 1: 0})
    parsed = batch.select(
        F.from_json(F.col("value"), schemas.VECTOR_ENTRY_SCHEMA).alias("r")
    ).select("r.*")
    v_before = t.latest_version()
    assert t.commit_append(parsed, epoch_id=OS._canonical_offsets(end)) is None
    assert t.latest_version() == v_before and t.read(spark).count() == 10

    # producer races the consumer between batches: new records land
    # exactly once; a wrong-dim record is dropped by validation
    remote.append(2, [_rec(10), _rec(11, dim=DIM + 2)])
    assert OS.run_offset_ingest(spark, remote, t, DIM) == 1
    got = sorted(r["entry_id"] for r in t.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(11))


def test_wire_matches_local_source_byte_for_byte(spark, tmp_path):
    """The wire transport must be invisible: polling the same log
    locally and over TCP yields identical (partition, offset, value)
    sets."""
    src = OS.OffsetLogSource(str(tmp_path / "log2"), n_partitions=2)
    src.append(0, [{"k": i} for i in range(4)])
    src.append(1, [{"k": i} for i in range(9)])
    b = OffsetWireBroker(src).start()
    try:
        remote = RemoteOffsetSource(b.host, b.port)
        local_df, local_end = src.poll(spark, {})
        wire_df, wire_end = remote.poll(spark, {})
        assert local_end == wire_end
        key = lambda r: (r["partition"], r["offset"], r["value"])  # noqa: E731
        assert sorted(map(key, local_df.collect())) == sorted(
            map(key, wire_df.collect())
        )
    finally:
        b.stop()


def test_remote_poll_chunked_fetch_parity(spark, broker):
    """fetch_chunk (round 11): slicing each partition's range into
    bounded FETCH round trips must return the byte-identical record
    set as one big fetch — the 64 MB response-line guard becomes a
    can't-happen backstop instead of a reachable ceiling."""
    remote_big = RemoteOffsetSource(broker.host, broker.port)
    remote_small = RemoteOffsetSource(broker.host, broker.port, fetch_chunk=7)
    remote_big.append(0, [{"i": i} for i in range(100)])
    remote_big.append(2, [{"i": i} for i in range(23)])
    df1, end1 = remote_big.poll(spark, {})
    df2, end2 = remote_small.poll(spark, {})
    assert end1 == end2
    k = lambda r: (r["partition"], r["offset"], r["value"])  # noqa: E731
    assert sorted(map(k, df1.collect())) == sorted(map(k, df2.collect()))
    with pytest.raises(ValueError, match="fetch_chunk"):
        RemoteOffsetSource(broker.host, broker.port, fetch_chunk=0)


# ---------------------------------------------------------------------------
# round 15: byte-offset-indexed slice (VERDICT r14 #5)
# ---------------------------------------------------------------------------

def _count_reads(monkeypatch, module, counter):
    """Instrument `open` inside `module`: every read()/readline()/
    iteration on files it opens adds the returned byte count to
    counter['bytes']."""
    real_open = open

    class CountingFile:
        def __init__(self, fh):
            self._fh = fh

        def read(self, *a):
            data = self._fh.read(*a)
            counter["bytes"] += len(data)
            return data

        def __iter__(self):
            for line in self._fh:
                counter["bytes"] += len(line)
                yield line

        def __getattr__(self, name):
            return getattr(self._fh, name)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return self._fh.__exit__(*a)

    def counting_open(path, *a, **kw):
        return CountingFile(real_open(path, *a, **kw))

    monkeypatch.setattr(module, "open", counting_open, raising=False)


def test_backlog_slice_reads_bytes_proportional_to_chunk(tmp_path, monkeypatch):
    """A chunked poll over a large backlog must read O(chunk) bytes via
    the sidecar byte-offset index — not scan the log from byte 0 per
    chunk (the quadratic-backlog shape VERDICT r14 #5 closes). The
    whole-log bound holds for EVERY chunk position, including the last."""
    src = OS.OffsetLogSource(str(tmp_path / "log"), n_partitions=1)
    n, payload = 20_000, "x" * 40
    for j in range(0, n, 5000):
        src.append(0, [{"i": i, "p": payload} for i in range(j, j + 5000)])
    log_bytes = (tmp_path / "log" / "partition-00000.jsonl").stat().st_size
    assert log_bytes > 1_000_000

    counter = {"bytes": 0}
    _count_reads(monkeypatch, OS, counter)
    chunk = 100
    # the WORST chunk for a scan-from-zero implementation: the tail
    lines = src.slice_lines(0, n - chunk, n)
    assert len(lines) == chunk
    assert json.loads(lines[0])["i"] == n - chunk
    # index entries read ≤ (chunk+1)*8 + validity probe; data read =
    # exactly the chunk's bytes. Allow 4x slack; a byte-0 scan would
    # read ~1.2 MB here.
    per_chunk = counter["bytes"]
    assert per_chunk < 4 * chunk * 60, f"read {per_chunk} bytes for {chunk} records"

    # _end_offset is O(1) too (index stat + one entry), not a line count
    counter["bytes"] = 0
    assert src._end_offset(0) == n
    assert counter["bytes"] <= 64


def test_slice_lines_index_fallback_and_crash_consistency(tmp_path):
    """Index absent (pre-index log) or stale (crash between log and
    index appends) must fall back to the line scan with identical
    results — never a wrong slice."""
    import os

    src = OS.OffsetLogSource(str(tmp_path / "log"), n_partitions=1)
    src.append(0, [{"i": i} for i in range(50)])
    want = src.slice_lines(0, 10, 20)
    assert [json.loads(x)["i"] for x in want] == list(range(10, 20))

    idx = tmp_path / "log" / "partition-00000.jsonl.idx"
    # stale: log grows without the index (simulated crash / old writer)
    with open(tmp_path / "log" / "partition-00000.jsonl", "ab") as fh:
        fh.write(b'{"i":50}\n')
    assert src._idx_records(0) == -1
    assert src._end_offset(0) == 51
    assert [json.loads(x)["i"] for x in src.slice_lines(0, 45, 51)] == list(
        range(45, 51)
    )
    # absent: delete the index entirely
    os.remove(idx)
    assert src.slice_lines(0, 10, 20) == want
    # appends on top of a stale/absent index re-validate going forward
    src.append(0, [{"i": 51}])
    assert src._end_offset(0) == 52


def test_broker_slice_serves_indexed_log(broker):
    """The broker's fetch path rides the indexed slice: results across
    a chunked drain equal the local source's, byte for byte."""
    b = broker
    src = b.source
    src.append(1, [{"k": i} for i in range(1000)])
    got = []
    lo = 0
    while lo < 1000:
        hi = min(lo + 97, 1000)
        got.extend(b._log_slice(1, lo, hi))
        lo = hi
    assert got == src.slice_lines(1, 0, 1000)
    assert [json.loads(x)["k"] for x in got[:3]] == [0, 1, 2]
