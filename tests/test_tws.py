"""transformWithStateInPandas CUSUM (streaming/tws.py).

The Spark runtime for the new stateful API needs `google.protobuf`
(the TWS worker's state-server protocol), which this sandbox does not
ship — so the RUNTIME test skips unless protobuf imports (environment
gap, like spark-avro). The processor's entire logic is still pinned
here WITHOUT that runtime: a fake StatefulProcessorHandle drives
`CusumProcessor` through arbitrary micro-batch slicings and the timer
protocol, comparing against the batch `cusum_alarms` operator — the
arithmetic, state carry-over, first-alarm-wins, timer re-anchoring,
and eviction semantics are all exercised as plain Python."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.timeseries import cusum_alarms
from aeuc_vector_db_spark.sources.tables import load_table
from aeuc_vector_db_spark.streaming.tws import CusumProcessor

SF = "/root/testdata/sf0.001"


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v

    def clear(self):
        self.v = None


class _FakeHandle:
    def __init__(self):
        self.states: dict[str, _FakeValueState] = {}
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


class _FakeTimerValues:
    def __init__(self, wm_ms=0):
        self.wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self.wm


def _events_cents(spark) -> pd.DataFrame:
    return (
        load_table(spark, "events", SF)
        .select(
            "user_id", "ts", "event_id",
            (F.col("value").cast("decimal(10,2)") * 100)
            .cast("long").alias("v"),
        )
        .orderBy("ts", "event_id")
        .toPandas()
    )


@pytest.mark.parametrize("n_chunks", [1, 3, 7])
def test_processor_equals_batch_kernel_across_slicings(spark, n_chunks):
    """Feeding the same per-key-ordered rows through any micro-batch
    slicing must end in the SAME final state as one batch pass — the
    associativity claim the streaming twin rests on."""
    pdf = _events_cents(spark)
    expected = {
        r.user_id: (r.n_events, r.n_alarms, r.first_alarm_id)
        for r in cusum_alarms(
            load_table(spark, "events", SF).select(
                "user_id", "ts", "event_id",
                (F.col("value").cast("decimal(10,2)") * 100)
                .cast("long").alias("v"),
            ),
            "user_id", ("ts", "event_id"), "v", "event_id",
            k=5000, h=20000,
        ).collect()
    }
    proc = CusumProcessor("v", "event_id", ["ts", "event_id"],
                          k=5000, h=20000)
    handle = _FakeHandle()
    proc.init(handle)
    per = (len(pdf) + n_chunks - 1) // n_chunks
    final = {}
    for i in range(n_chunks):
        chunk = pdf.iloc[i * per:(i + 1) * per]
        for key, grp in chunk.groupby("user_id"):
            # per-key state isolation: swap the fake state per key the
            # way the runtime scopes state to the grouping key
            proc.state = handle.getValueState(f"cusum-{key}", "")
            out = list(proc.handleInputRows(
                (key,), iter([grp]), _FakeTimerValues()
            ))
            final[key] = out[-1].iloc[0]
    assert len(final) == len(expected) > 0
    for key, exp in expected.items():
        got = final[key]
        fa = got["first_alarm_id"]
        assert (
            got["n_events"], got["n_alarms"],
            None if pd.isna(fa) else int(fa),
        ) == exp, key
    assert sum(e[1] for e in expected.values()) > 0  # alarms really fire


def test_processor_timer_reanchors_and_eviction_resets(spark):
    """Timer contract: each arrival deletes the stale timer and
    re-anchors at last_event + timeout; expiry emits one closed row
    and clears state; a post-eviction arrival starts from zero."""
    proc = CusumProcessor("v", "event_id", ["ts", "event_id"],
                          k=5000, h=20000,
                          idle_timeout_ms=60_000, ts_col="ts")
    handle = _FakeHandle()
    proc.init(handle)

    def batch(rows):
        return pd.DataFrame(rows, columns=["ts", "event_id", "v"]).assign(
            ts=lambda d: pd.to_datetime(d.ts, utc=True)
        )

    t0 = "2024-01-01 00:00:00"
    t1 = "2024-01-01 00:00:10"
    out1 = list(proc.handleInputRows(
        (1,), iter([batch([(t0, 10, 1000), (t1, 11, 1000)])]),
        _FakeTimerValues(0),
    ))
    anchor = pd.Timestamp(t1, tz="UTC").value // 10**6 + 60_000
    assert handle.timers == [anchor]
    assert out1[-1].iloc[0]["n_events"] == 2
    # a later arrival re-anchors (old timer deleted, not duplicated)
    t2 = "2024-01-01 00:01:00"
    list(proc.handleInputRows(
        (1,), iter([batch([(t2, 12, 1000)])]), _FakeTimerValues(10_000)
    ))
    anchor2 = pd.Timestamp(t2, tz="UTC").value // 10**6 + 60_000
    assert handle.timers == [anchor2]
    # expiry: closed row with the running totals, state cleared
    closed = list(proc.handleExpiredTimer(
        (1,), _FakeTimerValues(anchor2 + 1), None
    ))
    assert len(closed) == 1
    row = closed[0].iloc[0]
    assert bool(row["closed"]) and row["n_events"] == 3
    assert not proc.state.exists()
    # double-fire of a stale timer after clear emits nothing
    assert list(proc.handleExpiredTimer(
        (1,), _FakeTimerValues(anchor2 + 2), None
    )) == []
    # post-eviction arrival starts a fresh recurrence
    out2 = list(proc.handleInputRows(
        (1,), iter([batch([("2024-01-01 00:10:00", 13, 1000)])]),
        _FakeTimerValues(anchor2 + 2),
    ))
    assert out2[-1].iloc[0]["n_events"] == 1


def test_stream_runtime_end_to_end_if_protobuf_available(spark, tmp_path):
    """Full Spark runtime (RocksDB state store + TWS worker) —
    skipped in sandboxes without google.protobuf, which the TWS
    worker's state-server protocol imports."""
    pytest.importorskip("google.protobuf")
    from aeuc_vector_db_spark.streaming.tws import cusum_alarms_stream

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir, exist_ok=True)
    pdf = _events_cents(spark)
    per = (len(pdf) + 2) // 3
    for i in range(3):
        chunk = pdf.iloc[i * per:(i + 1) * per]
        with open(os.path.join(src_dir, f"c{i}.json"), "w") as fh:
            for r in chunk.itertuples():
                fh.write(json.dumps({
                    "user_id": int(r.user_id),
                    "ts": r.ts.isoformat(sep=" "),
                    "event_id": int(r.event_id), "v": int(r.v),
                }) + "\n")
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (spark.readStream
                  .schema("user_id LONG, ts TIMESTAMP, event_id LONG, v LONG")
                  .option("maxFilesPerTrigger", 1).json(src_dir))
        out = cusum_alarms_stream(
            stream, "user_id", "v", "event_id", k=5000, h=20000,
            order_cols=("ts", "event_id"),
        )
        q = (out.writeStream.format("memory").queryName("tws_rt")
             .outputMode("update").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {}
        for r in spark.sql("SELECT * FROM tws_rt").collect():
            if r.key not in got or r.n_events > got[r.key].n_events:
                got[r.key] = r
        expected = cusum_alarms(
            load_table(spark, "events", SF).select(
                "user_id", "ts", "event_id",
                (F.col("value").cast("decimal(10,2)") * 100)
                .cast("long").alias("v"),
            ),
            "user_id", ("ts", "event_id"), "v", "event_id",
            k=5000, h=20000,
        ).collect()
        for e in expected:
            g = got[e.user_id]
            assert (g.n_events, g.n_alarms, g.first_alarm_id) == (
                e.n_events, e.n_alarms, e.first_alarm_id
            )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
