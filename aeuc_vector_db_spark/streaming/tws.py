"""transformWithStateInPandas operators (Spark 4's arbitrary-stateful
API: typed per-key state through a StatefulProcessorHandle, plus
timers — the successor to applyInPandasWithState, SPARK-46815).

`cusum_alarms_stream` is the streaming twin of the batch
`operators/timeseries.py cusum_alarms` (Page 1954, exact integer
recurrence): per key, ValueState carries (s, n_events, n_alarms,
first_alarm_id) across micro-batches, so feeding the same rows in the
same per-key order through ANY micro-batch slicing ends in the same
state as one batch pass — the recurrence is associative over
concatenation of ordered chunks by construction (s carries over, the
counters add, first-alarm is first-wins). The batch≡streaming pin in
tests/test_tws.py replays the events fixture in chronological chunks
and compares final per-key rows against the batch operator verbatim.

Event-time timers make the bounded-state story explicit: with
`idle_timeout` set (timeMode='eventTime'), a key whose last event sits
more than the timeout below the watermark gets CLOSED — one final row
with closed=true, state cleared, timer deleted. Idle keys therefore
cost nothing forever; live state tracks active keys only (rate ×
timeout), the same 100 TB bound dedup_within_watermark documents.

Scale shape: one shuffle on the key (the groupBy), state is O(1) per
key, each micro-batch costs O(rows in batch) — a hot key costs its own
row count, never the stream's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_STATE_SCHEMA = "s LONG, n_events LONG, n_alarms LONG, first_alarm_id LONG"
OUT_SCHEMA = ("key LONG, n_events LONG, n_alarms LONG, "
              "first_alarm_id LONG, closed BOOLEAN")


class CusumProcessor(StatefulProcessor):
    """Per-key one-sided upper CUSUM with restart-after-alarm:
    s ← max(0, s + (v − k)); alarm when s ≥ h, then s ← 0. Integer
    arithmetic throughout — bit-identical to the batch kernel."""

    def __init__(self, value_col: str, id_col: str, order_cols,
                 k: int, h: int, idle_timeout_ms: "int | None" = None,
                 ts_col: str = "ts"):
        self.value_col = value_col
        self.id_col = id_col
        self.order_cols = list(order_cols)
        self.k = k
        self.h = h
        self.idle_timeout_ms = idle_timeout_ms
        self.ts_col = ts_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState("cusum", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        s, n, a, first = (0, 0, 0, None)
        if self.state.exists():
            s, n, a, first = self.state.get()
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            # order within the micro-batch is the caller's order
            # contract, same as the batch kernel's sort
            pdf = pdf.sort_values(self.order_cols, kind="mergesort")
            for v, eid in zip(pdf[self.value_col], pdf[self.id_col]):
                s += int(v) - self.k
                if s < 0:
                    s = 0
                n += 1
                if s >= self.h:
                    a += 1
                    if first is None:
                        first = int(eid)
                    s = 0
        self.state.update((s, n, a, first))
        if self.idle_timeout_ms is not None and chunks:
            # one live timer per key, anchored at the key's LAST event
            # time: the key closes when the watermark passes
            # last_event + timeout. Each arrival deletes the previous
            # timer (a stale one would close an active key).
            # Epoch contract (review r15): the runtime hands ts as a
            # SESSION-TIMEZONE-naive pandas Timestamp while
            # registerTimer compares against the UTC watermark — so a
            # naive value is localized to UTC explicitly, which is
            # only correct under a UTC session (what session.py pins
            # and every declared query runs under). Non-UTC sessions
            # must pass tz-aware timestamps or expect shifted timers.
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            last = pdf[self.ts_col].max()
            if last.tzinfo is None:
                last = last.tz_localize("UTC")
            last_ms = int(last.timestamp() * 1000)
            self.handle.registerTimer(last_ms + self.idle_timeout_ms)
        yield pd.DataFrame({
            "key": [key[0]], "n_events": [n], "n_alarms": [a],
            "first_alarm_id": [first], "closed": [False],
        })

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        if self.state.exists():
            s, n, a, first = self.state.get()
            self.state.clear()
            yield pd.DataFrame({
                "key": [key[0]], "n_events": [n], "n_alarms": [a],
                "first_alarm_id": [first], "closed": [True],
            })

    def close(self) -> None:
        pass


def cusum_alarms_stream(
    entries: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int,
    h: int,
    order_cols: "tuple[str, ...]" = (),
    idle_timeout: "str | None" = None,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming CUSUM over a keyed stream: emits one row per touched
    key per micro-batch with the UPDATED running (n_events, n_alarms,
    first_alarm_id), plus a final closed=true row when `idle_timeout`
    event time passes a key's last activity (state evicted). Without
    `idle_timeout`, timeMode='none' (no watermark requirement)."""
    order = list(order_cols) or [id_col]
    proc = CusumProcessor(
        value_col, id_col, order, k, h,
        idle_timeout_ms=(
            _duration_ms(idle_timeout) if idle_timeout else None
        ),
        ts_col=ts_col,
    )
    src = entries
    time_mode = "none"
    if idle_timeout is not None:
        src = src.withWatermark(ts_col, watermark_delay)
        time_mode = "eventTime"
    return src.groupBy(F.col(key_col)).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=OUT_SCHEMA,
        outputMode="update",
        timeMode=time_mode,
    )


def _duration_ms(text: str) -> int:
    """'10 minutes' / '30 seconds' / '500 milliseconds' → ms."""
    qty, unit = text.split()
    mult = {"millisecond": 1, "milliseconds": 1,
            "second": 1000, "seconds": 1000,
            "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(qty) * mult
