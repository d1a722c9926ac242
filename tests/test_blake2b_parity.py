"""Blake2b byte-parity twins vs the reference formulas.

Reference: VectorEntry.fingerprint = blake2b-256 of compact-JSON embedding
(types.py:68-71); VectorFieldDB._compute_hash = blake2b-256 of sort_keys
JSON over sorted id sets (vector_field.py:95-103). Expected values here
are computed with hashlib/json directly — the same public formula the
reference uses — so a match is bit-for-bit parity.
"""

import hashlib
import json

from pyspark.sql import functions as F

from aeuc_vector_db_spark import schemas
from aeuc_vector_db_spark.operators import crud


def _ref_fingerprint(embedding):
    raw = json.dumps(embedding, separators=(",", ":")).encode()
    return hashlib.blake2b(raw, digest_size=32).hexdigest()


def _ref_dataset_hash(iglyph_ids, pglyph_ids):
    payload = json.dumps(
        {"iglyphs": sorted(iglyph_ids), "pglyphs": sorted(pglyph_ids)},
        sort_keys=True,
    ).encode()
    return hashlib.blake2b(payload, digest_size=32).hexdigest()


def test_fingerprint_blake2b_bit_parity(spark):
    vecs = [
        [1.0, 2.0, 3.0],
        [0.1, -0.25, 1e-9],          # repr-sensitive doubles
        [0.0, -0.0, 123456.789],
        [1 / 3, 2 / 3, 1 / 7],       # non-terminating binary fractions
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "id int, embedding array<double>")
    out = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", schemas.entry_fingerprint_blake2b("embedding").alias("fp")
        ).collect()
    }
    for i, v in enumerate(vecs):
        assert out[i] == _ref_fingerprint(v), f"fingerprint mismatch for row {i}"


def test_fingerprint_blake2b_is_64_hex(spark):
    df = spark.createDataFrame([([1.5, 2.5],)], "embedding array<double>")
    fp = df.select(schemas.entry_fingerprint_blake2b("embedding").alias("fp")).collect()[0][0]
    assert len(fp) == 64 and int(fp, 16) >= 0


def test_fingerprint_blake2b_null_propagates(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "id int, embedding array<double>"
    )
    out = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", schemas.entry_fingerprint_blake2b("embedding").alias("fp")
        ).collect()
    }
    assert out[0] == _ref_fingerprint([1.0, 2.0])
    assert out[1] is None  # NULL in, NULL out — like the sha2 twin


def test_dataset_digest_blake2b_bit_parity(spark):
    ig_ids = ["b-2", "a-1", "c-3"]
    pg_ids = ["p-9", "p-1"]
    ig = spark.createDataFrame([(i,) for i in ig_ids], "iglyph_id string")
    pg = spark.createDataFrame([(i,) for i in pg_ids], "pglyph_id string")
    assert crud.dataset_digest_blake2b(ig, pg) == _ref_dataset_hash(ig_ids, pg_ids)
    # empty-pglyph case matches a fresh reference DB
    assert crud.dataset_digest_blake2b(ig, None) == _ref_dataset_hash(ig_ids, [])


def test_dataset_digest_blake2b_order_insensitive(spark):
    ig = spark.createDataFrame([("x",), ("y",)], "iglyph_id string")
    ig_rev = spark.createDataFrame([("y",), ("x",)], "iglyph_id string")
    assert crud.dataset_digest_blake2b(ig) == crud.dataset_digest_blake2b(ig_rev)
