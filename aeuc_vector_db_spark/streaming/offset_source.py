"""Kafka-shaped replayable offset source (VERDICT r5 item 7).

The engine's exactly-once story was proven against replayed epochs
(Structured Streaming redelivers a failed epoch under the same
epoch_id). A real pipeline's first integration point is a Kafka-like
log: partitioned, offset-addressed, REDELIVERING — the consumer decides
where to start, and the broker happily re-serves any committed range.
This module supplies that shape without a broker dependency, served
from local append-only files, and closes the loop the way Kafka sinks
do it in production: **the sink transaction carries the source
offsets**, so "where do I resume?" is answered by the sink's own log,
never by a side-channel that can diverge from it.

    OffsetLogSource  — per-partition append-only JSONL logs; records
                       are (partition, offset, value), offsets dense
                       per partition; poll(start→end) is pure and
                       repeatable (redelivery = calling it again)
    run_offset_ingest — batch loop: resume offsets ← sink manifest,
                       poll, validate, commit with epoch_id =
                       canonical offset-range string. A crash anywhere
                       re-runs the same range; the manifest's epoch
                       idempotence absorbs the duplicate commit, and
                       the NEXT resume point is read back from the
                       manifest — offsets and data commit atomically
                       because they are one manifest publish.

Reference analog: none (the reference has no streaming surface;
types.py:7 only gestures at it). The design is the public
Kafka-to-transactional-sink pattern (offsets stored in the sink's
transaction, e.g. Kafka Connect exactly-once / Delta streaming sinks).
"""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH_PREFIX = "offsets:"


def _canonical_offsets(offsets: dict[int, int]) -> str:
    """Deterministic epoch marker for an end-offset map: same range ⇒
    same string ⇒ same epoch_id ⇒ idempotent commit under redelivery."""
    return _EPOCH_PREFIX + ",".join(
        f"{p}={offsets[p]}" for p in sorted(offsets)
    )


def _parse_offsets(epoch_id: str) -> dict[int, int] | None:
    if not epoch_id or not epoch_id.startswith(_EPOCH_PREFIX):
        return None
    out: dict[int, int] = {}
    body = epoch_id[len(_EPOCH_PREFIX):]
    if not body:
        return out
    try:
        for part in body.split(","):
            p, o = part.split("=")
            out[int(p)] = int(o)
    except ValueError:
        return None
    return out


class OffsetLogSource:
    """A partitioned, offset-addressed, replayable record log on local
    files — the Kafka shape without the broker.

    Each partition is one append-only JSONL file; a record's offset is
    its line index (dense, starting at 0 — Kafka semantics with no
    compaction). `poll` slices [start, end) per partition and is PURE:
    polling the same range twice returns the same records (that IS the
    redelivery behavior the consumer must survive). Appends are
    producer-side only; the consumer never mutates the log.

    At cluster scale the same interface fronts a real broker: `poll`
    becomes the executor-side range fetch (Spark's Kafka source does
    exactly this per partition), `latest_offsets` the metadata call.
    Everything downstream — offset-carrying commits, resume-from-sink —
    is transport-independent, which is the point of the abstraction.
    """

    def __init__(self, root: str, n_partitions: int = 4) -> None:
        if n_partitions < 1:
            raise ValueError("n_partitions must be >= 1")
        self.root = root
        self.n_partitions = n_partitions
        os.makedirs(root, exist_ok=True)

    def _log_path(self, partition: int) -> str:
        if not (0 <= partition < self.n_partitions):
            raise ValueError(
                f"partition {partition} out of range [0, {self.n_partitions})"
            )
        return os.path.join(self.root, f"partition-{partition:05d}.jsonl")

    def _idx_path(self, partition: int) -> str:
        return self._log_path(partition) + ".idx"

    def append(self, partition: int, values: list[dict]) -> tuple[int, int]:
        """Producer API: append `values` (JSON-serializable records) to
        one partition; returns the assigned offset range [start, end).

        Alongside each record line, its cumulative END byte offset is
        appended to a fixed-width sidecar index (8 bytes big-endian per
        record, round 15) — that is what makes `slice_lines` seek
        straight to a record range instead of scanning from byte 0
        (quadratic across a chunked backlog drain), and `_end_offset`
        a stat instead of a line count. Write order is log-then-index,
        each fsynced: a crash between the two leaves the index SHORT,
        which the validity check detects and falls back to a scan —
        never a wrong slice."""
        p = self._log_path(partition)
        start = self._end_offset(partition)
        if self._idx_records(partition) != start:
            # the index does not cover exactly the existing records
            # (pre-index log, crash-truncated index, or a deleted index
            # whose tail-only regrowth would wrongly re-validate — the
            # last-entry==filesize probe alone cannot see missing HEAD
            # entries). One amortized rebuild restores O(1) slices.
            self._rebuild_index(partition)
        ends = []
        with open(p, "ab") as fh:
            pos = fh.tell()
            for v in values:
                line = (json.dumps(v, separators=(",", ":")) + "\n").encode()
                fh.write(line)
                pos += len(line)
                ends.append(pos)
            fh.flush()
            os.fsync(fh.fileno())
        with open(self._idx_path(partition), "ab") as ix:
            ix.write(b"".join(struct.pack(">Q", e) for e in ends))
            ix.flush()
            os.fsync(ix.fileno())
        return start, start + len(values)

    def _rebuild_index(self, partition: int) -> None:
        """Re-derive the sidecar index from the log with one scan,
        atomically (temp + rename). Removes the index when the log is
        absent/empty."""
        p = self._log_path(partition)
        ip = self._idx_path(partition)
        if not os.path.exists(p) or os.path.getsize(p) == 0:
            if os.path.exists(ip):
                os.remove(ip)
            return
        tmp = ip + ".tmp"
        pos = 0
        with open(p, "rb") as fh, open(tmp, "wb") as ix:
            for line in fh:
                pos += len(line)
                ix.write(struct.pack(">Q", pos))
            ix.flush()
            os.fsync(ix.fileno())
        os.replace(tmp, ip)

    def _idx_records(self, partition: int) -> int:
        """Record count per the sidecar index, or -1 when the index is
        absent/stale (missing file, truncated entry, or a last-entry
        byte offset that does not equal the log size — e.g. a log
        written by the pre-index code or a crash between log and index
        appends). O(1): two stats + one 8-byte read."""
        p = self._log_path(partition)
        ip = self._idx_path(partition)
        if not os.path.exists(p) or not os.path.exists(ip):
            return -1
        isize = os.path.getsize(ip)
        if isize == 0 or isize % 8:
            return -1
        with open(ip, "rb") as ix:
            ix.seek(isize - 8)
            (last_end,) = struct.unpack(">Q", ix.read(8))
        if last_end != os.path.getsize(p):
            return -1
        return isize // 8

    def _end_offset(self, partition: int) -> int:
        p = self._log_path(partition)
        if not os.path.exists(p):
            return 0
        n = self._idx_records(partition)
        if n >= 0:
            return n
        with open(p) as fh:
            return sum(1 for _ in fh)

    def slice_lines(self, partition: int, lo: int, hi: int) -> "list[bytes]":
        """[lo, hi) of one partition log as raw record lines (no
        terminators). With a valid sidecar index this is two bounded
        seeks — O(slice), not O(log): read index entries [lo-1, hi),
        then exactly the byte range they delimit. Index absent/stale →
        the line-scan fallback (correct on any log the old writer
        produced)."""
        if hi <= lo:
            return []
        path = self._log_path(partition)
        if not os.path.exists(path):
            return []
        n = self._idx_records(partition)
        if n >= 0:
            hi = min(hi, n)
            if hi <= lo:
                return []
            with open(self._idx_path(partition), "rb") as ix:
                if lo == 0:
                    start_byte = 0
                    ix.seek(0)
                else:
                    ix.seek((lo - 1) * 8)
                    (start_byte,) = struct.unpack(">Q", ix.read(8))
                ix.seek((hi - 1) * 8)
                (end_byte,) = struct.unpack(">Q", ix.read(8))
            with open(path, "rb") as fh:
                fh.seek(start_byte)
                data = fh.read(end_byte - start_byte)
            return data.splitlines()
        out: "list[bytes]" = []
        with open(path, "rb") as fh:
            for i, line in enumerate(fh):
                if i < lo:
                    continue
                if i >= hi:
                    break
                out.append(line.rstrip(b"\r\n"))
        return out

    def latest_offsets(self) -> dict[int, int]:
        """End offset per partition (the next offset a producer would
        assign) — the consumer's 'how far can I read' metadata call."""
        return {p: self._end_offset(p) for p in range(self.n_partitions)}

    def poll(
        self,
        spark: SparkSession,
        start: dict[int, int],
        max_records_per_partition: int | None = None,
    ) -> tuple[DataFrame | None, dict[int, int]]:
        """Read [start, end) per partition as a DataFrame of
        `(partition INT, offset LONG, value STRING)` — the Kafka record
        shape. Returns (df, end_offsets); df is None when no partition
        has new records. Pure: re-polling a range re-serves it
        identically (redelivery)."""
        latest = self.latest_offsets()
        end: dict[int, int] = {}
        rows: list[tuple[int, int, str]] = []
        for p in range(self.n_partitions):
            lo = start.get(p, 0)
            hi = latest[p]
            if max_records_per_partition is not None:
                hi = min(hi, lo + max_records_per_partition)
            end[p] = hi
            if hi <= lo:
                continue
            for i, ln in enumerate(self.slice_lines(p, lo, hi)):
                rows.append((p, lo + i, ln.decode("utf-8")))
        if not rows:
            return None, end
        return (
            spark.createDataFrame(
                rows, "partition INT, offset LONG, value STRING"
            ),
            end,
        )


def committed_source_offsets(
    table, known: "tuple[int, dict[int, int]] | None" = None
) -> dict[int, int]:
    """The consumer's resume point, read from the SINK's transaction
    log: the newest manifest whose epoch marker is an offset-range
    string. Offsets and data commit in one manifest publish, so this
    can never disagree with the committed data — the property a
    side-channel checkpoint file cannot give. O(versions back to the
    last offset commit) metadata reads; vacuumed histories fall back to
    the retired-epoch set (markers survive vacuum by design).

    `known=(version, offsets)` bounds the backward walk: versions ≤
    `version` are never read, and if no newer marker exists the cached
    `offsets` are returned. A driving loop passes its last commit here
    so each batch costs O(new versions) metadata reads, not
    O(full history) — the same catch-up-cost shape the CDC one-scan
    rewrite fixed (round-6 ADVICE)."""
    vs = table.versions()
    for v in reversed(vs):
        if known is not None and v <= known[0]:
            break
        got = _parse_offsets(str(table.manifest(v).get("epoch_id") or ""))
        if got is not None:
            return got
    if known is not None:
        return known[1]
    # log truncated by vacuum: the retired set keeps every marker; the
    # resume point is the per-partition max across them
    best: dict[int, int] = {}
    for e in table._retired_epochs():
        got = _parse_offsets(e)
        if got:
            for p, o in got.items():
                best[p] = max(best.get(p, 0), o)
    return best


def run_offset_ingest(
    spark: SparkSession,
    source: OffsetLogSource,
    table,
    dim: int,
    quarantine_path: str | None = None,
    max_records_per_partition: int | None = None,
    max_batches: int = 1_000,
) -> int:
    """Drain the source into a ManifestTable exactly once, end-to-end
    through OFFSETS: each batch's manifest commit carries its end-offset
    range as the epoch marker, and each iteration re-derives its start
    from the sink. Crash anywhere and re-run:

      - crash after poll, before commit → the range replays; same
        offsets ⇒ same epoch_id ⇒ the commit lands once
      - crash after commit → the resume read returns the committed end
        offsets; the range is never re-appended

    Records are JSON VectorEntry payloads in `value` (parsed with the
    explicit schema — never inference); validation splits to quarantine
    exactly like `manifest_sink`. Returns the number of batches that
    committed new data."""
    from aeuc_vector_db_spark import schemas
    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable
    from aeuc_vector_db_spark.streaming.ingest import (
        bucketed_manifest_sink,
        manifest_sink,
    )

    # A bucketed sink table gets the bucket-pruned PK-dedup body: same
    # offset/epoch exactly-once contract, plus cross-epoch re-minted-id
    # dedup bounded by the batch's bucket fan-out.
    if isinstance(table, BucketedManifestTable):
        body = bucketed_manifest_sink(table, dim, quarantine_path)
    else:
        body = manifest_sink(table, dim, quarantine_path)
    committed = 0
    # resume-point cache: the first iteration pays the full backward
    # walk once; afterwards each call only inspects versions newer than
    # the last known marker (usually zero or one manifest read)
    known: "tuple[int, dict[int, int]] | None" = None
    for _ in range(max_batches):
        start = committed_source_offsets(table, known)
        batch, end = source.poll(spark, start, max_records_per_partition)
        if batch is None:
            break
        parsed = batch.select(
            F.from_json(F.col("value"), schemas.VECTOR_ENTRY_SCHEMA).alias("r")
        ).select("r.*")
        epoch_key = _canonical_offsets(end)
        before = table.latest_version()
        body(parsed, epoch_key)
        if table.latest_version() != before:
            committed += 1
        # whether the commit landed or de-duplicated, `end` is now
        # committed in the sink log — safe to cache as the floor
        known = (table.latest_version(), end)
    return committed
