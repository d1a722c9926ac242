"""Declared multimodal query (E5) — rows-only check (the decode kernels
are deterministic stubs; their sha256-derived outputs aren't expressible
in DuckDB SQL, so the driver verifies rows/schema and the unit tests pin
the values).

The query materializes a small binary corpus under /tmp (binary blobs
derived deterministically from the documents fixture), reads it back
through the binaryFile source, runs the mapInPandas decode kernel, and
aggregates per-modality feature stats — the full multimodal plumbing
end-to-end: bytes → typed rows → Arrow batches → features → agg.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aeuc_vector_db_spark.sources import multimodal as MM
from aeuc_vector_db_spark.sources.tables import load_table


def _blob_dir(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic binary corpus: one blob per documents row (doc_id %
    25 == 0), bytes = sha256(text) repeated, extension cycles modalities."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = f"/tmp/aeuc_multimodal_{tag}"
    marker = f"{d}/.complete"
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        rows = (
            load_table(spark, "documents", sf_dir)
            .filter(F.col("doc_id") % 25 == 0)
            .select("doc_id", "text")
            .collect()
        )
        exts = ("png", "wav", "mp4")
        for r in rows:
            payload = hashlib.sha256(r["text"].encode()).digest() * 4
            with open(f"{d}/blob_{r['doc_id']}.{exts[r['doc_id'] % 3]}", "wb") as f:
                f.write(payload)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = MM.read_binary_dir(spark, _blob_dir(spark, sf_dir))
    feats = MM.decode_image_features_stub(blobs, feature_dim=8)
    rejoined = feats.join(blobs.select("blob_id", "modality"), "blob_id")
    return (
        rejoined.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg(F.element_at("features", 1)), 9).alias("avg_f0"),
        )
        .orderBy("modality")
    )


QUERIES = {
    "multimodal_feature_stats": (_multimodal_features, None),
}
