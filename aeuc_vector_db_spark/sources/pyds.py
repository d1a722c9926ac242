"""Spark 4 Python DataSource for the offset log — the engine's
Kafka-shaped transport as a first-class pluggable format.

`OffsetLogSource` (streaming/offset_source.py) already provides the
partitioned, offset-addressed, replayable log with O(slice) byte-offset
index seeks. This module lifts it into Spark's modern extension point
(`pyspark.sql.datasource`, SPARK-44076) so it composes with the whole
read/write surface instead of the bespoke `poll` helper:

    spark.dataSource.register(OffsetLogDataSource)
    spark.read.format("aeuc_offsetlog").option("path", root).load()
    df.write.format("aeuc_offsetlog").option("path", root).save()
    spark.readStream.format("aeuc_offsetlog").option("path", root).load()

Scale shapes (the reason to use the API rather than collect-and-
parallelize):

- **Partition planning**: each log partition is split into
  `chunk_records` ranges, one Spark task per range; every task seeks
  straight to its byte range via the sidecar index (two 8-byte reads +
  one bounded read — never a scan from byte 0). Parallelism is
  bounded by records, not by the log partition count.
- **Filter pushdown** (`pushFilters`): predicates on `partition`
  (EqualTo/In) prune whole log partitions before planning; predicates
  on `offset` (comparisons/EqualTo) narrow the planned ranges exactly.
  Both are fully consumed — Spark re-evaluates nothing.
- **Streaming**: a full `DataSourceStreamReader` (driver plans offset
  ranges, executors read them) with dense per-partition offsets in the
  checkpoint — redelivery of a failed epoch re-plans the same
  [start, end) and `slice_lines` re-serves it identically, which is
  the exactly-once contract the wire/ingest family already proves at
  the `poll` level. `max_records_per_batch` rate-limits progression.
- **Two-phase-commit batch writer**: tasks stage their rows as
  JSON-normalized lines under `<root>/.staging/`, and the DRIVER
  appends staged files partition-by-partition in deterministic
  (partition, task) order at `commit` — preserving the log's
  single-producer-per-partition append contract (concurrent
  executor-side appends to one log file would interleave and corrupt
  offset density). `abort` removes the staged files; the log is
  untouched until commit. Overwrite mode is refused: the log is
  append-only by definition.

Reference analog: none — charter extension (the reference has no
streaming/source surface); the shape is Spark's own DataSourceV2
partition-planning contract expressed through the Python API.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

SCHEMA = "partition INT, offset BIGINT, value STRING"


class _WireTransport:
    """Reader-side transport over the TCP broker (streaming/wire.py):
    the same planning/read contract as the local files, with METADATA
    round trips for offsets and pure chunked raw-frame FETCHes per
    planned range — each Spark task opens its own connection, and a
    task retry re-fetches its byte-identical slice."""

    def __init__(self, host: str, port: int) -> None:
        self.host, self.port = host, int(port)
        from aeuc_vector_db_spark.streaming.wire import _request

        self.n = int(_request(self.host, self.port,
                              {"op": "meta"})["n_partitions"])

    def latest_offsets(self) -> "dict[int, int]":
        from aeuc_vector_db_spark.streaming.wire import _request

        meta = _request(self.host, self.port, {"op": "meta"})
        return {int(p): int(o) for p, o in meta["end_offsets"].items()}

    def slice_values(self, p: int, lo: int, hi: int) -> "list[str]":
        from aeuc_vector_db_spark.streaming.wire import _fetch_raw

        return [v for v in _fetch_raw(self.host, self.port, p, lo, hi)]

    def append(self, p: int, values: "list[dict]") -> None:
        from aeuc_vector_db_spark.streaming.wire import _request

        _request(self.host, self.port,
                 {"op": "append", "partition": p, "values": values})


class _LocalTransport:
    def __init__(self, root: str, n: int) -> None:
        from aeuc_vector_db_spark.streaming.offset_source import (
            OffsetLogSource,
        )

        self.src = OffsetLogSource(root, n)
        self.n = n

    def latest_offsets(self) -> "dict[int, int]":
        return self.src.latest_offsets()

    def slice_values(self, p: int, lo: int, hi: int) -> "list[str]":
        return [ln.decode("utf-8")
                for ln in self.src.slice_lines(p, lo, hi)]

    def append(self, p: int, values: "list[dict]") -> None:
        self.src.append(p, values)


def _is_wire(options) -> bool:
    return bool(options.get("host")) and bool(options.get("port"))


def _chunk_opt(options) -> int:
    """The ONE parse point for chunk_records (review r15: a diverged
    copy in the stream reader skipped validation, and chunk=0 on the
    wire path made _chunked loop forever)."""
    chunk = int(options.get("chunk_records", "100000"))
    if chunk < 1:
        raise ValueError("chunk_records must be >= 1")
    return chunk


def _transport(options):
    if _is_wire(options):
        return _WireTransport(options["host"], options["port"])
    root, n = _opts(options)
    return _LocalTransport(root, n)


def _opts(options) -> tuple[str, int]:
    root = options.get("path") or options.get("root")
    if not root:
        raise ValueError(
            "aeuc_offsetlog requires option 'path' (local log) or "
            "'host' + 'port' (wire broker)"
        )
    n_opt = options.get("n_partitions")
    if n_opt is not None:
        n = int(n_opt)
    else:
        # infer from the on-disk layout (partition-%05d.jsonl)
        n = 0
        if os.path.isdir(root):
            for f in os.listdir(root):
                if f.startswith("partition-") and f.endswith(".jsonl"):
                    n = max(n, int(f[len("partition-"):-len(".jsonl")]) + 1)
        n = n or 4
    return root, n


class _Range(InputPartition):
    """One planned (log partition, [lo, hi)) record range."""

    def __init__(self, part: int, lo: int, hi: int) -> None:
        self.part, self.lo, self.hi = part, lo, hi


def _read_range(tx, rng: _Range):
    """One planned range as a single Arrow RecordBatch — the columnar
    fast path the Python DataSource API accepts in place of per-row
    tuples (one batch build + one Arrow transfer per range instead of
    a pickle round trip per record)."""
    if rng.hi <= rng.lo:
        return
    import pyarrow as pa

    values = tx.slice_values(rng.part, rng.lo, rng.hi)
    n = len(values)
    yield pa.RecordBatch.from_arrays(
        [
            pa.array([rng.part] * n, type=pa.int32()),
            pa.array(range(rng.lo, rng.lo + n), type=pa.int64()),
            pa.array(values, type=pa.string()),
        ],
        names=["partition", "offset", "value"],
    )


def _chunked(p: int, lo: int, hi: int, chunk: int) -> "list[_Range]":
    out = []
    while lo < hi:
        out.append(_Range(p, lo, min(lo + chunk, hi)))
        lo += chunk
    return out


def _read_committed_opt(options) -> bool:
    return str(options.get("read_committed", "false")).lower() == "true"


def _sweep_stale_staging(staging: str, ttl_s: int) -> None:
    """Reap staged files older than ttl from killed/speculative task
    attempts — such attempts never return a commit message, so neither
    commit() nor abort() can ever see their files and .staging would
    grow without bound (review r15). Runs on the driver after a
    successful commit; the TTL (option staging_ttl_seconds, default
    3600) must exceed the longest stage→commit latency of any LIVE
    write, which in practice is one micro-batch/job."""
    import time as _time

    if not os.path.isdir(staging):
        return
    cutoff = _time.time() - ttl_s
    for f in os.listdir(staging):
        p = os.path.join(staging, f)
        try:
            if os.path.getmtime(p) < cutoff:
                os.remove(p)
        except OSError:
            pass  # concurrent removal / in-flight rename: not ours


def _cap_committed(root: str, latest: "dict[int, int]") -> "dict[int, int]":
    """Cap end offsets at the epoch ledger's last COMMITTED counts —
    rows a crashed stream-writer commit could still roll back stay
    invisible (read-committed isolation). A log without a ledger (not
    written by the streaming sink) is served as-is. Semantics on a
    MIXED log (streaming sink + batch/producer appends to the same
    root): the cap reflects only stream-committed progress, so later
    non-ledger appends stay hidden under read_committed until the next
    stream epoch commits past them — conservative, never phantom."""
    counts = _EpochLedger(root).committed_counts()
    if counts is None:
        return latest
    return {p: min(hi, counts.get(p, 0)) for p, hi in latest.items()}


class OffsetLogBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.tx = _transport(options)
        self.chunk = _chunk_opt(options)
        self.read_committed = _read_committed_opt(options)
        self.root = options.get("path") or options.get("root")
        if self.read_committed and _is_wire(options):
            raise ValueError(
                "read_committed requires the local log: the epoch "
                "ledger is filesystem-side, not served by the broker"
            )
        self._parts: "set[int] | None" = None  # None = all
        self._off_lo = 0
        self._off_hi: "int | None" = None

    def pushFilters(self, filters):
        """Consume partition/offset predicates exactly; yield the rest
        back to Spark. Every consumed filter is FULLY satisfied by the
        pruned plan (each range carries a single partition value and a
        contiguous offset span), so over-pruning is impossible and
        Spark re-evaluates nothing."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("partition",) and isinstance(f, EqualTo) \
                    and isinstance(f.value, int):
                keep = {f.value}
                self._parts = keep if self._parts is None \
                    else self._parts & keep
            elif attr == ("partition",) and isinstance(f, In) and all(
                isinstance(v, int) for v in f.values
            ):
                keep = set(f.values)
                self._parts = keep if self._parts is None \
                    else self._parts & keep
            elif attr == ("offset",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual,
                    LessThan, LessThanOrEqual)
            ) and isinstance(f.value, int):
                v = f.value
                if isinstance(f, EqualTo):
                    self._off_lo = max(self._off_lo, v)
                    self._off_hi = v + 1 if self._off_hi is None \
                        else min(self._off_hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self._off_lo = max(self._off_lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self._off_lo = max(self._off_lo, v)
                elif isinstance(f, LessThan):
                    self._off_hi = v if self._off_hi is None \
                        else min(self._off_hi, v)
                else:  # LessThanOrEqual
                    self._off_hi = v + 1 if self._off_hi is None \
                        else min(self._off_hi, v + 1)
            else:
                yield f

    def partitions(self):
        latest = self.tx.latest_offsets()
        if self.read_committed:
            latest = _cap_committed(self.root, latest)
        out: "list[_Range]" = []
        for p in range(self.tx.n):
            if self._parts is not None and p not in self._parts:
                continue
            lo = self._off_lo
            hi = latest[p] if self._off_hi is None \
                else min(latest[p], self._off_hi)
            out.extend(_chunked(p, lo, hi, self.chunk))
        return out or [_Range(0, 0, 0)]

    def read(self, partition: _Range):
        return _read_range(self.tx, partition)


class OffsetLogStreamReader(DataSourceStreamReader):
    """Driver plans [start, end) per micro-batch from the checkpointed
    offset dict; executors slice their ranges through the byte index.
    Offsets are {str(partition): next_offset} — dense, so replaying a
    failed epoch re-plans byte-identical slices (exactly-once with an
    idempotent or transactional sink, Kafka-source semantics)."""

    def __init__(self, options) -> None:
        self.tx = _transport(options)
        self.chunk = _chunk_opt(options)
        self.max_per_batch = int(
            options.get("max_records_per_batch", "0")
        )  # 0 = unbounded
        self.read_committed = _read_committed_opt(options)
        self.root = options.get("path") or options.get("root")
        if self.read_committed and _is_wire(options):
            raise ValueError(
                "read_committed requires the local log: the epoch "
                "ledger is filesystem-side, not served by the broker"
            )
        self._prev_end: "dict[str, int] | None" = None

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in range(self.tx.n)}

    def latestOffset(self) -> dict:
        latest = self.tx.latest_offsets()
        if self.read_committed:
            latest = _cap_committed(self.root, latest)
        out = {str(p): latest[p] for p in range(self.tx.n)}
        if self.max_per_batch > 0 and self._prev_end is not None:
            # rate limit only once a known start exists: capping from 0
            # on a restarted query could place end below the
            # checkpointed start
            for k in out:
                base = self._prev_end.get(k, 0)
                out[k] = max(base, min(out[k], base + self.max_per_batch))
        return out

    def partitions(self, start: dict, end: dict):
        self._prev_end = dict(end)
        out: "list[_Range]" = []
        for k in sorted(end, key=int):
            p = int(k)
            out.extend(
                _chunked(p, int(start.get(k, 0)), int(end[k]), self.chunk)
            )
        return out or [_Range(0, 0, 0)]

    def read(self, partition: _Range):
        return _read_range(self.tx, partition)

    def commit(self, end: dict) -> None:
        # consumer progress lives in the streaming checkpoint; the log
        # itself retains everything (replayability is the contract)
        pass

    def stop(self) -> None:
        pass


@dataclass
class _Staged(WriterCommitMessage):
    task: int
    files: "list[tuple[int, str, int]]"  # (partition, staged path, count)


class OffsetLogWriter(DataSourceWriter):
    """Two-phase append: executors stage, the driver commits.

    `write` parses every value as JSON (fail-fast, distributed) and
    stages compact-normalized lines per log partition; `commit` appends
    staged files in deterministic (partition, task) order through
    `OffsetLogSource.append` — one producer, dense offsets, index
    maintained. Note the normalization contract: the log stores
    compact JSON (`separators=(',', ':')`, insertion-ordered keys), so
    a value string round-trips byte-identically iff it is already
    compact — which `F.to_json` output is."""

    def __init__(self, options) -> None:
        self.root, self.n = _opts(options)
        self.staging = os.path.join(self.root, ".staging")
        self.staging_ttl_s = int(options.get("staging_ttl_seconds", "3600"))

    def write(self, iterator) -> _Staged:
        from pyspark import TaskContext

        os.makedirs(self.staging, exist_ok=True)
        tid = TaskContext.get().partitionId()
        handles: "dict[int, tuple[str, object, int]]" = {}
        counts: "dict[int, int]" = {}
        try:
            for row in iterator:
                p = row["partition"]
                if p is None or not (0 <= p < self.n):
                    raise ValueError(
                        f"partition {p!r} out of range [0, {self.n})"
                    )
                try:
                    parsed = json.loads(row["value"])
                except (TypeError, ValueError) as e:
                    raise ValueError(
                        f"value is not JSON at partition {p}: {e}"
                    ) from e
                if p not in handles:
                    path = os.path.join(
                        self.staging,
                        f"task{tid}-p{p}-{uuid.uuid4().hex}.jsonl",
                    )
                    handles[p] = (path, open(path, "w"), 0)
                path, fh, _ = handles[p]
                fh.write(json.dumps(parsed, separators=(",", ":")) + "\n")
                counts[p] = counts.get(p, 0) + 1
        except BaseException:
            # fail-fast path: close and remove this task's partial
            # staging so a validation error leaves no orphan files
            # (the task returns no commit message, so abort() could
            # never find them)
            for path, fh, _ in handles.values():
                fh.close()
                if os.path.exists(path):
                    os.remove(path)
            raise
        files = []
        for p, (path, fh, _) in sorted(handles.items()):
            fh.flush()
            os.fsync(fh.fileno())
            fh.close()
            files.append((p, path, counts[p]))
        return _Staged(task=tid, files=files)

    def commit(self, messages) -> None:
        from aeuc_vector_db_spark.streaming.offset_source import (
            OffsetLogSource,
        )

        src = OffsetLogSource(self.root, self.n)
        ledger = _EpochLedger(self.root)
        if ledger.exists():
            # a streaming sink has used this root: a crashed stream
            # commit may have left a pending intent whose replay would
            # truncate away THIS batch's rows — repair it (and mark it
            # aborted) before appending (review r15)
            ledger.resolve_pending(src, ledger.state()[1])
        staged: "list[tuple[int, int, str]]" = []
        for m in messages:
            if m is None:
                continue
            for p, path, _ in m.files:
                staged.append((p, m.task, path))
        for p, _, path in sorted(staged):
            with open(path) as fh:
                values = [json.loads(ln) for ln in fh]
            if values:
                src.append(p, values)
            os.remove(path)
        _sweep_stale_staging(self.staging, self.staging_ttl_s)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for _, path, _ in m.files:
                if os.path.exists(path):
                    os.remove(path)


class _EpochLedger:
    """Sink-side write-ahead ledger making streaming appends to the log
    EXACTLY-ONCE under Spark's epoch replay, on top of files that
    cannot be committed atomically with the data:

    commit protocol per micro-batch (single driver = single writer):
      1. already committed batchId  → discard staged files (replay
         absorbed — idempotence);
      2. a PENDING intent exists    → a previous commit attempt
         crashed mid-append: ROLL BACK by truncating every partition
         log+index to the intent's recorded byte sizes (append-only
         files make undo a truncate), then proceed;
      3. write intent {batchId, per-partition (log_bytes, idx_bytes)}
         + fsync   (the write-ahead record);
      4. append the staged data;
      5. write committed {batchId} + fsync.

    A crash between 3-4, 4-5, or mid-4 is repaired by step 2 on the
    replayed epoch. Readers that must not observe a tail that could
    still be rolled back pass read_committed=true — latestOffset is
    then capped at the last COMMITTED record counts (the ledger's
    step-5 entries), Kafka's read-committed isolation."""

    def __init__(self, root: str) -> None:
        self.path = os.path.join(root, "_epochs.jsonl")

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def _entries(self) -> "list[dict]":
        if not os.path.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(ln) for ln in fh if ln.strip()]

    def state(self) -> "tuple[set[int], dict | None, dict[int, int] | None]":
        """(committed batchIds, pending intent, last committed counts)
        derived from ONE pass over the ledger (review r15: commit read
        and re-parsed the file three times per epoch). An 'aborted'
        record resolves its intent like a 'committed' one — it marks a
        rollback already performed by a later commit (stream or
        batch), so the intent must never be replayed against appends
        that happened after the repair."""
        committed: "set[int]" = set()
        last_intent = None
        resolved: "set[int]" = set()
        counts = None
        for e in self._entries():
            if e["kind"] == "intent":
                last_intent = e
            elif e["kind"] == "committed":
                committed.add(e["batch_id"])
                resolved.add(e["batch_id"])
                if "counts" in e:
                    counts = {int(k): v for k, v in e["counts"].items()}
            elif e["kind"] == "aborted":
                resolved.add(e["batch_id"])
        pending = (
            last_intent
            if last_intent is not None
            and last_intent["batch_id"] not in resolved
            else None
        )
        return committed, pending, counts

    def committed_ids(self) -> "set[int]":
        return self.state()[0]

    def pending_intent(self) -> "dict | None":
        return self.state()[1]

    def committed_counts(self) -> "dict[int, int] | None":
        """Per-partition record counts as of the last committed epoch,
        or None when the ledger is absent (log not written by the
        streaming sink — no isolation information exists)."""
        return self.state()[2]

    def resolve_pending(self, src, pending: "dict | None") -> None:
        """Repair a crashed commit attempt: truncate every partition
        log+index back to the intent's recorded byte sizes (append-only
        files make undo a truncate) and mark the intent 'aborted' —
        REQUIRED before ANY further append to a ledgered log, stream or
        batch: without the marker, a later stream replay would roll
        back again and silently destroy appends that landed after this
        repair (review r15)."""
        if pending is None:
            return
        for k, (log_b, idx_b) in pending["sizes"].items():
            p = int(k)
            lp = src._log_path(p)
            ip = src._idx_path(p)
            if os.path.exists(lp) and os.path.getsize(lp) > log_b:
                os.truncate(lp, log_b)
            if os.path.exists(ip) and os.path.getsize(ip) > idx_b:
                os.truncate(ip, idx_b)
        self.append({"kind": "aborted", "batch_id": pending["batch_id"]})

    def append(self, record: dict) -> None:
        with open(self.path, "a") as fh:
            fh.write(json.dumps(record, separators=(",", ":")) + "\n")
            fh.flush()
            os.fsync(fh.fileno())


class OffsetLogStreamWriter(OffsetLogWriter, DataSourceStreamWriter):
    """Streaming sink: stage like the batch writer (inherited write),
    commit through the epoch ledger (write-ahead intent → append →
    committed), so a replayed micro-batch appends nothing twice and a
    crash mid-commit rolls back by truncation on the next attempt.
    Inherits DataSourceStreamWriter because Spark type-checks the
    instance before use."""

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        from aeuc_vector_db_spark.streaming.offset_source import (
            OffsetLogSource,
        )

        ledger = _EpochLedger(self.root)
        committed, pend, _ = ledger.state()  # one ledger pass per epoch
        staged: "list[tuple[int, int, str]]" = []
        for m in messages:
            if m is None:
                continue
            for p, path, _ in m.files:
                staged.append((p, m.task, path))
        if batchId in committed:
            for _, _, path in staged:
                if os.path.exists(path):
                    os.remove(path)
            return
        src = OffsetLogSource(self.root, self.n)
        ledger.resolve_pending(src, pend)
        sizes = {}
        for p in range(self.n):
            lp, ip = src._log_path(p), src._idx_path(p)
            sizes[str(p)] = [
                os.path.getsize(lp) if os.path.exists(lp) else 0,
                os.path.getsize(ip) if os.path.exists(ip) else 0,
            ]
        ledger.append({"kind": "intent", "batch_id": batchId,
                       "sizes": sizes})
        for p, _, path in sorted(staged):
            with open(path) as fh:
                values = [json.loads(ln) for ln in fh]
            if values:
                src.append(p, values)
            os.remove(path)
        counts = src.latest_offsets()
        ledger.append({"kind": "committed", "batch_id": batchId,
                       "counts": {str(p): c for p, c in counts.items()}})
        _sweep_stale_staging(self.staging, self.staging_ttl_s)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        OffsetLogWriter.abort(self, messages)


class OffsetLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "aeuc_offsetlog"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> OffsetLogBatchReader:
        return OffsetLogBatchReader(self.options)

    def streamReader(self, schema) -> OffsetLogStreamReader:
        return OffsetLogStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> OffsetLogStreamWriter:
        if overwrite:
            # complete/truncate output modes would re-append every
            # key's full state each epoch — the log is append-only and
            # must refuse, like the batch overwrite path (review r15)
            raise ValueError(
                "aeuc_offsetlog is append-only; use outputMode "
                "'append'/'update', not 'complete'"
            )
        self._check_write(schema)
        return OffsetLogStreamWriter(self.options)

    def writer(self, schema, overwrite: bool) -> OffsetLogWriter:
        if overwrite:
            raise ValueError(
                "aeuc_offsetlog is append-only; overwrite is refused"
            )
        self._check_write(schema)
        return OffsetLogWriter(self.options)

    def _check_write(self, schema) -> None:
        if _is_wire(self.options):
            # the two-phase writer needs a filesystem shared between
            # executors (staging) and driver (commit+ledger); over the
            # wire, producers talk to the broker's append API directly
            # (streaming/wire.py RemoteOffsetSource.append)
            raise ValueError(
                "aeuc_offsetlog writes require the local log ('path'); "
                "wire producers use the broker append API"
            )
        names = [f.name for f in schema.fields]
        for required in ("partition", "value"):
            if required not in names:
                raise ValueError(
                    f"write schema must include '{required}' (got {names})"
                )


def register(spark) -> None:
    """Idempotent registration of the 'aeuc_offsetlog' format. Also
    enables Python-source filter pushdown (off by default in Spark
    4.1; a runtime SQL conf) — without it Spark refuses any reader
    that implements pushFilters()."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OffsetLogDataSource)
