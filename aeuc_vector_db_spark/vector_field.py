"""VectorField — the engine's facade over the reference's VectorFieldDB API.

Mirrors the public surface of vector_field.py:45-486 (add/get/update/
delete, form_cluster, recompute, search, search_pglyphs, auto_cluster_phi,
export/import JSONL, snapshot, stats) with batch-oriented semantics:

- state is three DataFrames (iglyphs, pglyphs, membership) + an append-only
  audit DataFrame, all immutable; every mutation returns via set algebra
  and re-binds the handles.
- the dataset digest is hash-chained per BATCH commit (vector_field.py's
  per-row digest is the O(N²) hazard documented in BASELINE.md).
- error contracts preserved: ValueError on dup insert / empty cluster /
  unknown metric; KeyError on update/delete of a missing id.

For interactive single-row use this facade is convenience; the real
100 TB paths are the underlying operator functions, which never collect.
"""

from __future__ import annotations

import uuid
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aeuc_vector_db_spark import schemas
from aeuc_vector_db_spark.operators import clustering as C
from aeuc_vector_db_spark.operators import crud, search
from aeuc_vector_db_spark.sources import jsonl as jsonl_src

VERSION = "0.1.0"


class VectorField:
    def __init__(self, spark: SparkSession, dim: int = 128) -> None:
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        self.spark = spark
        self.dim = dim
        self.iglyphs: DataFrame = spark.createDataFrame([], schemas.IGLYPH_SCHEMA)
        self.pglyphs: DataFrame = spark.createDataFrame([], schemas.PGLYPH_SCHEMA)
        self.membership: DataFrame = spark.createDataFrame([], schemas.MEMBERSHIP_SCHEMA)
        self.audit: DataFrame = spark.createDataFrame([], schemas.AUDIT_SCHEMA)
        self._audit_seq = 0
        self.current_hash = self._digest()

    # ------------------------------------------------------------------
    def _digest(self) -> str:
        ids = self.iglyphs.select(F.col("iglyph_id").alias("id")).unionAll(
            self.pglyphs.select(F.col("pglyph_id").alias("id"))
        )
        return crud.dataset_digest(ids, "id")

    def _log(self, action: str, **payload: Any) -> None:
        old = self.current_hash
        self.current_hash = self._digest()
        self._audit_seq += 1
        rec = crud.audit_record(
            self.spark, action, old, self.current_hash,
            {k: str(v) for k, v in payload.items()}, seq=self._audit_seq,
        )
        self.audit = self.audit.unionByName(rec, allowMissingColumns=True)

    def _validate_vec(self, embedding: Sequence[float]) -> list[float]:
        vec = [float(x) for x in embedding]
        if len(vec) != self.dim:
            raise ValueError(f"Embedding dim mismatch: expected {self.dim}, got {len(vec)}.")
        return vec

    @staticmethod
    def _check_ranges(glyph_id: int, outer_context_id: int) -> None:
        if not (0 <= glyph_id <= schemas.GLYPH_ID_MAX):
            raise ValueError(f"glyph_id must be in [0, {schemas.GLYPH_ID_MAX}], got {glyph_id}")
        if not (0 <= outer_context_id <= schemas.OUTER_CONTEXT_MAX):
            raise ValueError(
                f"outer_context_id must be in [0, {schemas.OUTER_CONTEXT_MAX}],"
                f" got {outer_context_id}"
            )

    # ------------------------------------------------------------------
    # IGlyph CRUD (A13-A16)
    # ------------------------------------------------------------------

    def add_iglyph(
        self,
        glyph_id: int,
        outer_context_id: int,
        embedding: Sequence[float],
        label: str = "",
        meta: dict | None = None,
        iglyph_id: str | None = None,
    ) -> str:
        vec = self._validate_vec(embedding)
        self._check_ranges(glyph_id, outer_context_id)
        _id = iglyph_id or str(uuid.uuid4())
        row = self.spark.createDataFrame(
            [
                (
                    _id,
                    glyph_id,
                    outer_context_id,
                    vec,
                    label,
                    None,
                    {k: str(v) for k, v in (meta or {}).items()},
                    VERSION,
                )
            ],
            "iglyph_id string, glyph_id long, outer_context_id int, embedding array<float>,"
            " label string, proto_id string, meta map<string,string>, version string",
        ).withColumn("ts", F.current_timestamp())
        self.iglyphs = crud.insert_rows(self.iglyphs, row, "iglyph_id", on_duplicate="error")
        self.iglyphs = self.iglyphs.localCheckpoint(eager=False)
        self._log("ADD_IGLYPH", iglyph_id=_id, glyph_id=glyph_id,
                  outer_context_id=outer_context_id, label=label)
        return _id

    def add_iglyphs_batch(self, rows: DataFrame, on_duplicate: str = "error") -> None:
        """Bulk path: validated insert of a whole DataFrame in one commit."""
        validated = schemas.assert_valid(rows, self.dim, vec_col="embedding")
        self.iglyphs = crud.insert_rows(self.iglyphs, validated, "iglyph_id", on_duplicate)
        self._log("ADD_IGLYPH_BATCH")

    def get_iglyph(self, iglyph_id: str):
        rows = self.iglyphs.filter(F.col("iglyph_id") == iglyph_id).limit(1).collect()
        return rows[0] if rows else None

    def update_iglyph_embedding(self, iglyph_id: str, embedding: Sequence[float]) -> None:
        vec = self._validate_vec(embedding)
        upd = self.spark.createDataFrame(
            [(iglyph_id, vec)], "iglyph_id string, embedding array<float>"
        )
        self.iglyphs = crud.update_embeddings(self.iglyphs, upd, "iglyph_id").localCheckpoint(
            eager=False
        )
        self._log("UPDATE_IGLYPH", iglyph_id=iglyph_id)

    def delete_iglyph(self, iglyph_id: str) -> None:
        ids = self.spark.createDataFrame([(iglyph_id,)], "iglyph_id string")
        remaining, new_membership, _stale = crud.delete_with_membership_cleanup(
            self.iglyphs, self.membership, ids
        )
        # strict KeyError contract (vector_field.py:198-199)
        if self.iglyphs.filter(F.col("iglyph_id") == iglyph_id).limit(1).count() == 0:
            raise KeyError(f"IGlyph {iglyph_id!r} not found.")
        self.iglyphs = remaining.localCheckpoint(eager=False)
        self.membership = new_membership
        self._log("DELETE_IGLYPH", iglyph_id=iglyph_id)

    # ------------------------------------------------------------------
    # PGlyph ops (A10, A19, A2)
    # ------------------------------------------------------------------

    def form_cluster(
        self,
        iglyph_ids: list[str],
        anchor_glyph_id: int,
        outer_context_id: int,
        cluster_tag: str = "",
    ) -> str:
        members = self.iglyphs.filter(F.col("iglyph_id").isin(iglyph_ids))
        if members.limit(1).count() == 0:
            raise ValueError("No valid IGlyphs found for the given ids.")
        grouped = members.withColumn("__g__", F.lit(1))
        pg = C.form_pglyphs(grouped, ["__g__"], id_col="iglyph_id").drop("__g__")
        pg = (
            pg.withColumn("glyph_id", F.lit(anchor_glyph_id).cast("long"))
            .withColumn("outer_context_id", F.lit(outer_context_id).cast("int"))
            .withColumn("cluster_tag", F.lit(cluster_tag))
            .withColumn("ts", F.current_timestamp())
            .select(
                "pglyph_id", "glyph_id", "outer_context_id", "centroid",
                "member_count", "cluster_tag", "inertia", "ts",
            )
        )
        mem = C.membership(grouped, ["__g__"], id_col="iglyph_id")
        pgid = pg.select("pglyph_id").collect()[0][0]
        self.pglyphs = self.pglyphs.unionByName(pg).localCheckpoint(eager=False)
        self.membership = self.membership.unionByName(mem).localCheckpoint(eager=False)
        self._log("FORM_CLUSTER", pglyph_id=pgid, anchor_glyph_id=anchor_glyph_id,
                  cluster_tag=cluster_tag)
        return pgid

    def get_pglyph(self, pglyph_id: str):
        rows = self.pglyphs.filter(F.col("pglyph_id") == pglyph_id).limit(1).collect()
        return rows[0] if rows else None

    def recompute_pglyph(self, pglyph_id: str) -> None:
        """A19: re-derive centroid+inertia from surviving members."""
        mem = self.membership.filter(F.col("pglyph_id") == pglyph_id)
        members = self.iglyphs.join(mem.select("iglyph_id"), "iglyph_id", "left_semi")
        if members.limit(1).count() == 0:
            raise ValueError("PGlyph has no valid members to recompute from.")
        grouped = members.withColumn("__g__", F.lit(1))
        cents = C.centroids(grouped, ["__g__"], "embedding")
        inert = C.inertia(grouped, cents, ["__g__"], "embedding")
        stats_row = (
            cents.join(inert, "__g__")
            .join(grouped.groupBy("__g__").agg(F.count(F.lit(1)).alias("n")), "__g__")
            .collect()[0]
        )
        updated = self.pglyphs.withColumn(
            "centroid",
            F.when(F.col("pglyph_id") == pglyph_id,
                   F.lit(stats_row["centroid"]).cast("array<double>")).otherwise(F.col("centroid")),
        ).withColumn(
            "inertia",
            F.when(F.col("pglyph_id") == pglyph_id, F.lit(stats_row["inertia"]))
            .otherwise(F.col("inertia")),
        ).withColumn(
            "member_count",
            F.when(F.col("pglyph_id") == pglyph_id, F.lit(stats_row["n"]).cast("long"))
            .otherwise(F.col("member_count")),
        )
        self.pglyphs = updated.localCheckpoint(eager=False)
        self._log("RECOMPUTE_PGLYPH", pglyph_id=pglyph_id, members=stats_row["n"])

    # ------------------------------------------------------------------
    # Search (A1, A2) / auto-cluster (A12)
    # ------------------------------------------------------------------

    def search(
        self,
        query: Sequence[float],
        top_k: int = 10,
        metric: str = "cosine",
        glyph_id_filter: int | None = None,
        outer_context_filter: int | None = None,
    ) -> list[tuple[str, float]]:
        q = self._validate_vec(query)
        res = search.knn_search(
            self.iglyphs, q, top_k=top_k, metric=metric, id_col="iglyph_id",
            glyph_id_filter=glyph_id_filter, outer_context_filter=outer_context_filter,
        )
        return [(r["iglyph_id"], r["score"]) for r in res.collect()]

    def search_pglyphs(self, query: Sequence[float], top_k: int = 5,
                       metric: str = "cosine") -> list[tuple[str, float]]:
        q = self._validate_vec(query)
        res = search.search_pglyphs(self.pglyphs, q, top_k=top_k, metric=metric)
        return [(r["pglyph_id"], r["score"]) for r in res.collect()]

    def auto_cluster_phi(self, outer_context_id: int, anchor_glyph_id: int,
                         levels: int = 3) -> list[str]:
        scoped = self.iglyphs.filter(F.col("outer_context_id") == outer_context_id)
        if scoped.limit(1).count() == 0:
            return []
        banded = C.with_phi_band(scoped, levels=levels)
        pg = C.form_pglyphs(banded, ["band"], id_col="iglyph_id")
        pg_rows = (
            pg.withColumn("cluster_tag",
                          F.concat(F.lit("phi_band_"), F.col("band").cast("string")))
            .withColumn("glyph_id", F.lit(anchor_glyph_id).cast("long"))
            .withColumn("outer_context_id", F.lit(outer_context_id).cast("int"))
            .withColumn("ts", F.current_timestamp())
            .select("pglyph_id", "glyph_id", "outer_context_id", "centroid",
                    "member_count", "cluster_tag", "inertia", "ts")
        )
        mem = C.membership(banded, ["band"], id_col="iglyph_id")
        ids = [r["pglyph_id"] for r in pg_rows.select("pglyph_id").collect()]
        self.pglyphs = self.pglyphs.unionByName(pg_rows).localCheckpoint(eager=False)
        self.membership = self.membership.unionByName(mem).localCheckpoint(eager=False)
        self._log("AUTO_CLUSTER_PHI", outer_context_id=outer_context_id, clusters=len(ids))
        return ids

    # ------------------------------------------------------------------
    # Import / export / snapshot / stats (A20-A23)
    # ------------------------------------------------------------------

    def export_jsonl(self, path: str | None = None) -> str:
        """A20. With `path`, writes ts-ordered JSONL distributed (the scale
        path) and returns the path; without, returns the corpus as one
        string (reference string contract — small collections only)."""
        if path is not None:
            jsonl_src.export_jsonl(self.iglyphs, path)
            return path
        return jsonl_src.export_jsonl_string(self.iglyphs)

    def import_jsonl(self, lines: str | list[str], overwrite: bool = False) -> int:
        if isinstance(lines, str):
            lines = [ln for ln in lines.strip().splitlines() if ln.strip()]
        merged, count = jsonl_src.import_jsonl(
            self.spark, lines, self.iglyphs, schemas.IGLYPH_SCHEMA, self.dim,
            overwrite=overwrite,
        )
        self.iglyphs = merged.localCheckpoint(eager=False)
        self._log("IMPORT_JSONL", count=count, overwrite=overwrite)
        return count

    def snapshot(self, path: str) -> dict:
        """A22: multi-table checkpoint + manifest."""
        import json

        self.iglyphs.write.mode("overwrite").parquet(f"{path}/iglyphs")
        self.pglyphs.write.mode("overwrite").parquet(f"{path}/pglyphs")
        self.membership.write.mode("overwrite").parquet(f"{path}/membership")
        self.audit.write.mode("overwrite").parquet(f"{path}/audit")
        manifest = {"version": VERSION, "dim": self.dim,
                    "current_hash": self.current_hash, "path": path}
        # manifest written driver-side: tiny, and must be a single file
        with open(f"{path}/manifest.json", "w") as f:
            json.dump(manifest, f)
        return manifest

    @classmethod
    def load_snapshot(cls, spark: SparkSession, path: str) -> "VectorField":
        """Restore a VectorField from snapshot(); verifies the dataset
        digest against the manifest (tamper/corruption check)."""
        import json

        with open(f"{path}/manifest.json") as f:
            manifest = json.load(f)
        db = cls(spark, dim=manifest["dim"])
        db.iglyphs = spark.read.parquet(f"{path}/iglyphs")
        db.pglyphs = spark.read.parquet(f"{path}/pglyphs")
        db.membership = spark.read.parquet(f"{path}/membership")
        db.audit = spark.read.parquet(f"{path}/audit")
        # Resume the audit sequence where the snapshot left off; otherwise
        # post-restore mutations would re-issue seq 1..N and make
        # verify_audit_chain's orderBy(seq) ambiguous.
        if "seq" in db.audit.columns:
            max_seq = db.audit.agg(F.max("seq")).collect()[0][0]
            db._audit_seq = int(max_seq) if max_seq is not None else 0
        db.current_hash = db._digest()
        if db.current_hash != manifest["current_hash"]:
            raise ValueError(
                "snapshot digest mismatch: stored "
                f"{manifest['current_hash'][:12]}…, recomputed {db.current_hash[:12]}…"
            )
        return db

    def stats(self) -> dict:
        out = crud.stats(self.iglyphs, self.pglyphs, self.audit)
        out.update(version=VERSION, dim=self.dim, current_hash=self.current_hash)
        return out

    def __repr__(self) -> str:
        s = self.stats()
        return (
            f"VectorField(v{s['version']} dim={s['dim']} iglyphs={s['iglyph_count']}"
            f" pglyphs={s['pglyph_count']} hash={self.current_hash[:8]}...)"
        )
