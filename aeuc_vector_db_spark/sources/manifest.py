"""Transactional manifest-committed Parquet table (mini transaction log).

Reference analog: the hash-chained audit log + snapshot/restore give the
reference crash-consistent state on a single process
(/root/reference/aeuc_vector_db/vector_field.py:85-117, 448-461). At
100 TB with many writers the Spark-idiomatic equivalent is a transaction
log over immutable Parquet data files — the public lakehouse design
(Delta/Iceberg papers): a writer makes data files visible only by
atomically publishing a manifest, so readers always see a complete
snapshot and a crash mid-write is invisible.

Layout:

    <root>/data/<token>/part-*.parquet    immutable data directories
    <root>/_log/v{N:012d}.json            manifest: version N's snapshot

A manifest lists the ABSOLUTE snapshot (every live file), not a delta —
readers resolve one JSON file and never replay history. Manifests are
tiny (file paths + stats); data files are never rewritten in place.

Commit protocol (optimistic concurrency, POSIX-atomic publish):

 1. write the new data directory with Spark (invisible to readers — no
    manifest references it yet)
 2. build the manifest: parent version, action, live file list, row
    count (captured via ``Observation`` on the write job — no second
    count pass), optional streaming epoch marker
 3. publish via ``os.link(tmp, _log/vN.json)`` — atomic fail-if-exists.
    On EEXIST another writer won vN: re-resolve the latest version,
    recompute the snapshot file list against it, retry at N+1. Appends
    retry without rework (their data dir is still valid); merge/delete
    re-run their read-modify-write against the new snapshot.

Guarantees (each pinned in tests/test_manifest.py):
 - atomic visibility: a reader sees version N in full or not at all
 - crash safety: data files without a published manifest are ignored,
   and ``vacuum()`` reclaims them
 - time travel: any retained version remains readable
 - idempotent streaming epochs: ``commit_append(df, epoch_id=e)`` is a
   no-op if epoch ``e`` already committed — the exactly-once
   ``foreachBatch`` sink pattern (a restarted stream replays its last
   epoch; the log absorbs the duplicate)
 - optimistic concurrency: racing writers serialize through the
   fail-if-exists publish; the loser retries on a fresh snapshot

Cloud note: ``os.link`` fail-if-exists is the local-FS stand-in for the
same primitive every production log uses (S3 conditional PUT, GCS
if-generation-match, HDFS atomic rename). Only ``_try_publish`` would
change on those stores.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMAT_VERSION = 1
_LOG_DIR = "_log"
_DATA_DIR = "data"


class CommitConflictError(RuntimeError):
    """Raised when a commit loses the publish race more than max_retries
    times — the caller's read-modify-write is persistently stale."""


class ManifestTable:
    """Handle on a manifest-committed table rooted at a directory.

    Stateless: every operation re-resolves the log on disk, so any number
    of handles (processes) can share a root; the publish protocol
    serializes them.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, _LOG_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)

    # -- log resolution ------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _LOG_DIR, f"v{version:012d}.json")

    def versions(self) -> list[int]:
        names = os.listdir(os.path.join(self.root, _LOG_DIR))
        return sorted(
            int(n[1:13]) for n in names if n.startswith("v") and n.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"no committed version at {self.root!r}")
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def committed_epochs(self) -> set[str]:
        """Every epoch marker in the log (all versions, not just latest —
        an epoch interleaved with other commits must still be detected)."""
        out: set[str] = set()
        for v in self.versions():
            e = self.manifest(v).get("epoch_id")
            if e is not None:
                out.add(str(e))
        return out

    # -- reading -------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The snapshot at `version` (default latest) — reads exactly the
        files that manifest lists; uncommitted data dirs are invisible."""
        m = self.manifest(version)
        files = [os.path.join(self.root, f) for f in m["files"]]
        if not files:
            raise ValueError(
                f"version {m['version']} of {self.root!r} is an empty snapshot"
            )
        return spark.read.parquet(*files)

    # -- writing -------------------------------------------------------

    def _write_data_dir(self, df: DataFrame) -> tuple[list[str], int]:
        """Write df to a fresh immutable data dir; return (root-relative
        file list, row count). Count rides the write job via Observation —
        the commit costs one pass, never a second count job."""
        from pyspark.sql import Observation

        token = uuid.uuid4().hex[:16]
        rel_dir = os.path.join(_DATA_DIR, token)
        out_dir = os.path.join(self.root, rel_dir)
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.parquet(out_dir)
        n = int(obs.get["n"] or 0)
        files = sorted(
            os.path.join(rel_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        )
        return files, n

    def _try_publish(self, manifest: dict, version: int) -> bool:
        """Atomically publish `manifest` as `version`. False ⟺ lost the
        race (vN already exists)."""
        tmp = os.path.join(
            self.root, _LOG_DIR, f".tmp-{uuid.uuid4().hex}.json"
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._manifest_path(version))  # atomic, EEXIST on race
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _commit(
        self,
        action: str,
        new_files: list[str],
        n_new: int,
        keep_parent_files: bool,
        epoch_id: str | None = None,
        expected_parent: int | None = None,
    ) -> int:
        """Publish a version; retries the publish on conflict.

        `keep_parent_files=True` (append): the new snapshot = parent's
        files + new files, recomputed against whatever parent wins the
        race — safe to retry blindly. `False` (overwrite semantics): the
        snapshot is exactly `new_files`; if `expected_parent` is set and
        a different version won, raise CommitConflictError so the caller
        re-runs its read-modify-write instead of clobbering it.
        """
        for _ in range(50):
            parent = self.latest_version()
            if (
                expected_parent is not None
                and parent is not None
                and parent != expected_parent
            ):
                raise CommitConflictError(
                    f"snapshot moved {expected_parent}→{parent} under a "
                    f"{action}; re-run the read-modify-write"
                )
            version = 0 if parent is None else parent + 1
            if keep_parent_files and parent is not None:
                pm = self.manifest(parent)
                files = pm["files"] + new_files
                n_rows = pm["n_rows"] + n_new
            else:
                files, n_rows = list(new_files), n_new
            manifest = {
                "format_version": FORMAT_VERSION,
                "version": version,
                "parent": parent,
                "action": action,
                "files": files,
                "n_rows": n_rows,
                "epoch_id": epoch_id,
                "committed_at_s": round(time.time(), 3),
            }
            if self._try_publish(manifest, version):
                return version
        raise CommitConflictError(f"publish retries exhausted under {action}")

    def commit_append(self, df: DataFrame, epoch_id: str | int | None = None) -> int | None:
        """Append df as a new version. With `epoch_id`, the commit is
        idempotent: if that epoch is already in the log the data is NOT
        rewritten and None is returned (exactly-once foreachBatch sink)."""
        eid = None if epoch_id is None else str(epoch_id)
        if eid is not None and eid in self.committed_epochs():
            return None
        files, n = self._write_data_dir(df)
        return self._commit("append", files, n, keep_parent_files=True, epoch_id=eid)

    def commit_overwrite(self, df: DataFrame) -> int:
        """Replace the snapshot with df (new files; old versions remain
        time-travel readable until vacuumed)."""
        files, n = self._write_data_dir(df)
        return self._commit("overwrite", files, n, keep_parent_files=False)

    def merge_upsert(
        self, spark: SparkSession, updates: DataFrame, key: str, max_retries: int = 5
    ) -> int:
        """MERGE: rows in `updates` replace same-key rows, others append
        (A13/A15 batch semantics — `MERGE WHEN [NOT] MATCHED` without a
        lakehouse dependency). Read-modify-write with optimistic retry:
        on a lost race the merge re-runs against the winning snapshot.

        Scale note: rewrites the full snapshot. Keyed data-file layout
        (hash-bucket dirs like streaming ingest's id_bucket) would bound
        the rewrite to touched buckets; at fixture scale the simple form
        keeps every byte exercised by the oracle.
        """
        last: CommitConflictError | None = None
        for _ in range(max_retries):
            parent = self.latest_version()
            if parent is None:
                files, n = self._write_data_dir(updates)
                try:
                    return self._commit(
                        "merge", files, n, keep_parent_files=False, expected_parent=None
                    )
                except CommitConflictError as exc:  # someone created v0 first
                    last = exc
                    continue
            current = self.read(spark, parent)
            merged = current.join(
                updates.select(key).distinct(), key, "left_anti"
            ).unionByName(updates)
            files, n = self._write_data_dir(merged)
            try:
                return self._commit(
                    "merge", files, n, keep_parent_files=False, expected_parent=parent
                )
            except CommitConflictError as exc:
                last = exc  # stale read: loop re-merges against the winner
        raise CommitConflictError(f"merge_upsert: {max_retries} retries exhausted") from last

    def delete_where(self, spark: SparkSession, condition) -> int:
        """Keep rows NOT matching `condition` (a Column) as a new version."""
        parent = self.latest_version()
        if parent is None:
            raise FileNotFoundError(f"no committed version at {self.root!r}")
        kept = self.read(spark, parent).filter(~condition)
        files, n = self._write_data_dir(kept)
        return self._commit(
            "delete", files, n, keep_parent_files=False, expected_parent=parent
        )

    # -- maintenance ---------------------------------------------------

    def vacuum(self, retain_last: int = 1, min_age_s: float = 0.0) -> dict:
        """Reclaim space: drop manifests older than the last `retain_last`
        and delete data dirs no retained manifest references (covers
        crash orphans — dirs written but never published). `min_age_s`
        protects an in-flight writer's just-written dir from deletion
        (production default would be hours; tests use 0 but an in-flight
        dir younger than the cutoff survives either way only via age).
        """
        vs = self.versions()
        keep_vs = vs[-retain_last:] if retain_last > 0 else []
        live_dirs = set()
        for v in keep_vs:
            for f in self.manifest(v)["files"]:
                live_dirs.add(f.split(os.sep)[1])  # data/<token>/part → token
        removed_manifests = []
        for v in vs:
            if v not in keep_vs:
                os.unlink(self._manifest_path(v))
                removed_manifests.append(v)
        removed_dirs = []
        data_root = os.path.join(self.root, _DATA_DIR)
        now = time.time()
        for token in os.listdir(data_root):
            p = os.path.join(data_root, token)
            if token not in live_dirs and now - os.path.getmtime(p) >= min_age_s:
                shutil.rmtree(p)
                removed_dirs.append(token)
        return {"removed_versions": removed_manifests, "removed_data_dirs": sorted(removed_dirs)}
