"""Semantic port of the reference's types validation suite
(/root/reference/tests/test_types.py:1-170, 14 tests) against the
DataFrame-level validation in schemas.py: range boundaries, empty/
wrong-dim/NaN embeddings, fingerprint contract, float32 storage,
round-trip."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aeuc_vector_db_spark import schemas

DIM = 4


def _rows_df(spark, rows):
    return spark.createDataFrame(
        rows, "iglyph_id string, glyph_id long, outer_context_id int, embedding array<float>"
    )


def _count_valid(spark, rows, dim=DIM):
    df = _rows_df(spark, rows)
    return df.filter(schemas.valid_row(dim)).count()


def test_boundary_glyph_ids_ok(spark):
    rows = [("a", 0, 0, [0.1] * DIM), ("b", 143_999, 0, [0.1] * DIM)]
    assert _count_valid(spark, rows) == 2


def test_glyph_id_out_of_range(spark):
    assert _count_valid(spark, [("a", 144_000, 0, [0.1] * DIM)]) == 0
    assert _count_valid(spark, [("a", -1, 0, [0.1] * DIM)]) == 0


def test_boundary_ctx_ok(spark):
    assert _count_valid(spark, [("a", 1, 9, [0.1] * DIM)]) == 1


def test_ctx_out_of_range(spark):
    assert _count_valid(spark, [("a", 1, 10, [0.1] * DIM)]) == 0


def test_empty_embedding_rejected(spark):
    assert _count_valid(spark, [("a", 1, 0, [])]) == 0


def test_wrong_dim_rejected(spark):
    assert _count_valid(spark, [("a", 1, 0, [0.1] * (DIM + 1))]) == 0


def test_nan_embedding_rejected(spark):
    assert _count_valid(spark, [("a", 1, 0, [0.1, float("nan"), 0.1, 0.1])]) == 0


def test_assert_valid_raises_on_bad_row(spark):
    from py4j.protocol import Py4JJavaError

    df = _rows_df(spark, [("a", 144_000, 0, [0.1] * DIM)])
    with pytest.raises(Exception) as exc_info:
        schemas.assert_valid(df, DIM).count()
    assert "validation failed" in str(exc_info.value)


def test_assert_valid_passes_good_rows(spark):
    df = _rows_df(spark, [("a", 1, 0, [0.1] * DIM), ("b", 2, 3, [0.2] * DIM)])
    assert schemas.assert_valid(df, DIM).count() == 2


def test_fingerprint_is_64_hex_and_deterministic(spark):
    df = _rows_df(spark, [("a", 1, 0, [0.5] * DIM), ("b", 1, 0, [0.5] * DIM)])
    fps = [r["fp"] for r in df.select(schemas.entry_fingerprint_col().alias("fp")).collect()]
    assert all(len(fp) == 64 and int(fp, 16) >= 0 for fp in fps)
    assert fps[0] == fps[1]  # same embedding ⇒ same fingerprint


def test_fingerprint_changes_with_embedding(spark):
    df = _rows_df(spark, [("a", 1, 0, [0.5] * DIM), ("b", 1, 0, [0.6] * DIM)])
    fps = [r["fp"] for r in df.select(schemas.entry_fingerprint_col().alias("fp")).collect()]
    assert fps[0] != fps[1]


def test_embedding_stored_float32(spark):
    """np_embedding float32 analog (types.py:132-136): the engine schema
    stores ARRAY<FLOAT> (4-byte), not ARRAY<DOUBLE>."""
    assert isinstance(
        schemas.IGLYPH_SCHEMA["embedding"].dataType.elementType, T.FloatType
    )
    assert isinstance(
        schemas.VECTOR_ENTRY_SCHEMA["embedding"].dataType.elementType, T.FloatType
    )


def test_dict_round_trip_via_json(spark):
    """to_dict/from_dict analog: rows survive a JSON round trip intact."""
    df = _rows_df(spark, [("rt-1", 7, 3, [0.25] * DIM)])
    line = df.toJSON().collect()[0]
    back = spark.read.schema(
        "iglyph_id string, glyph_id long, outer_context_id int, embedding array<float>"
    ).json(spark.sparkContext.parallelize([line]))
    r0, r1 = df.collect()[0], back.collect()[0]
    assert r0["iglyph_id"] == r1["iglyph_id"]
    assert r0["embedding"] == r1["embedding"]
    assert r0["glyph_id"] == r1["glyph_id"]


def test_pglyph_schema_shape(spark):
    pg = spark.createDataFrame(
        [("p1", 10, 1, [0.5] * DIM, 1, "geo_band_0", 0.0, None)], schemas.PGLYPH_SCHEMA
    ).collect()[0]
    assert pg["glyph_id"] == 10
    assert pg["inertia"] == 0.0
    assert pg["centroid"][2] == pytest.approx(0.5)
