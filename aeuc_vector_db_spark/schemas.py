"""Engine table schemas and ingest-time validation (reference parity: A24).

Reference data model (SURVEY.md §1): IGlyph rows (types.py:89-165), PGlyph
prototypes (types.py:173-232), VectorEntry ingest records (types.py:29-81).
Validation contract (types.py:52-62, 120-128, 206-214; vector_field.py:119-127):

- glyph_id ∈ [0, 143_999]
- outer_context_id ∈ [0, 9]
- embedding non-empty, 1-D, length == db dim

Here those become StructTypes plus Column-expression predicates that either
filter (bulk import semantics — silent skip, vector_field.py:439-440) or
raise (add/update semantics — ValueError, via F.raise_error).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

GLYPH_ID_MAX = 143_999
OUTER_CONTEXT_MAX = 9

IGLYPH_SCHEMA = T.StructType(
    [
        T.StructField("iglyph_id", T.StringType(), False),
        T.StructField("glyph_id", T.LongType(), False),
        T.StructField("outer_context_id", T.IntegerType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("proto_id", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

PGLYPH_SCHEMA = T.StructType(
    [
        T.StructField("pglyph_id", T.StringType(), False),
        T.StructField("glyph_id", T.LongType(), False),
        T.StructField("outer_context_id", T.IntegerType(), False),
        T.StructField("centroid", T.ArrayType(T.DoubleType()), False),
        T.StructField("member_count", T.LongType(), False),
        T.StructField("cluster_tag", T.StringType(), True),
        T.StructField("inertia", T.DoubleType(), False),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Normalized member_ids / proto_id relation (types.py:199, vector_field.py:256-257)
MEMBERSHIP_SCHEMA = T.StructType(
    [
        T.StructField("pglyph_id", T.StringType(), False),
        T.StructField("iglyph_id", T.StringType(), False),
    ]
)

# VectorEntry (types.py:29-81): ingest-side row for streaming / bulk use.
VECTOR_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("entry_id", T.StringType(), False),
        T.StructField("glyph_id", T.LongType(), False),
        T.StructField("outer_context_id", T.IntegerType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("source_tag", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Audit record shape (vector_field.py:109-117); `seq` is the commit
# sequence — the chain's total order (ts alone can collide at µs
# resolution).
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("hash_before", T.StringType(), False),
        T.StructField("hash_after", T.StringType(), False),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def valid_glyph_id(col: Column | str) -> Column:
    """glyph_id range check (types.py:121-124)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c >= 0) & (c <= GLYPH_ID_MAX)


def valid_outer_context(col: Column | str) -> Column:
    """outer_context_id range check (types.py:125-128)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c >= 0) & (c <= OUTER_CONTEXT_MAX)


def valid_embedding(col: Column | str, dim: int) -> Column:
    """Dim/shape check (vector_field.py:119-127): exact length, no NULL slots."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        c.isNotNull()
        & (F.size(c) == F.lit(dim))
        & (F.size(F.filter(c, lambda x: x.isNull() | F.isnan(x))) == 0)
    )


def valid_row(dim: int, glyph_col: str = "glyph_id", ctx_col: str = "outer_context_id",
              vec_col: str = "embedding") -> Column:
    """Conjunction of all constructor-time checks (A24)."""
    return (
        valid_glyph_id(glyph_col) & valid_outer_context(ctx_col) & valid_embedding(vec_col, dim)
    )


def entry_fingerprint_col(vec_col: Column | str = "embedding") -> Column:
    """VectorEntry.fingerprint analog (types.py:68-71): 256-bit hex digest
    of the JSON-serialized embedding. The reference uses Blake2b; the
    contract is 'same embedding ⇒ same 64-hex fingerprint', which sha2
    preserves JVM-side (no Python in the ingest path)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.sha2(F.to_json(c), 256)


def entry_fingerprint_blake2b(vec_col: Column | str = "embedding") -> Column:
    """Bit-compatible twin of VectorEntry.fingerprint (types.py:68-71):
    Blake2b-256 hex digest of the compact-JSON-serialized embedding.

    Arrow-batched pandas_udf (Blake2b isn't a Spark builtin): each value
    is serialized with Python's json.dumps(separators=(",", ":")) —
    byte-identical to the reference when the embedding holds the same
    doubles (pass ARRAY<DOUBLE>; float32 storage widens to different
    doubles and is the caller's parity bug, not this function's).
    Use entry_fingerprint_col (sha2, JVM-side) when only the
    'same embedding ⇒ same digest' contract matters; use this twin when
    byte-level parity with reference exports does.
    """
    import hashlib
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fp(v):
        # NULL embedding → NULL fingerprint, matching the sha2 twin's
        # null propagation (a crashed task is not a contract)
        return v.map(
            lambda arr: hashlib.blake2b(
                json.dumps([float(x) for x in arr], separators=(",", ":")).encode(),
                digest_size=32,
            ).hexdigest()
            if arr is not None
            else None
        )

    # real type objects, not strings — `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf can't introspect
    _fp.__annotations__ = {"v": pd.Series, "return": pd.Series}
    fp_udf = pandas_udf(_fp, "string")

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return fp_udf(c.cast("array<double>"))


def assert_valid(df, dim: int, **cols):
    """add/update semantics: raise on the first invalid row (ValueError analog,
    vector_field.py:119-127 / types.py __post_init__).

    Implemented as a filter whose predicate raises instead of returning
    false — it cannot be pruned away by the optimizer, so the check fires
    with whatever action eventually runs the plan.
    """
    pred = valid_row(dim, **cols)
    return df.filter(
        F.when(pred, F.lit(True)).otherwise(
            F.raise_error(F.lit("validation failed: embedding dim/shape or id range"))
        )
    )
