"""Pins for the literal-parameter apply queries (VERDICT r14 #1).

The hash-matched twins (ann_pq_adc_apply, emb_cell_assign_literal)
rest on one claim: with dyadic literal parameters AND dyadic-quantized
inputs, every intermediate in the NumPy/BLAS kernels is an exactly
representable IEEE double, so fold-order reassociation cannot change a
bit and the kernels agree with ANY correctly-rounded re-computation.
These tests pin (a) the dyadic structure of the literal generators,
(b) quantize_dyadic_col's exactness + cross-engine floor semantics,
(c) end-to-end bit-parity of the full np kernel chain against an
independent pure-Python sequential-fold recomputation — no rounding.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.vector import quantize_dyadic_col
from aeuc_vector_db_spark.operators.ann import (
    assign_centroids,
    literal_centroids,
    literal_codebooks,
    pq_encode,
    pq_search_batch,
)


def test_literal_generators_are_dyadic():
    cb = literal_codebooks(8, 16, 8)
    vals = [x for j in cb for c in j for x in c]
    assert all(x * 32 == int(x * 32) for x in vals)
    assert all(-0.5 <= x <= 0.5 for x in vals)
    cents = literal_centroids(16, 64)
    assert [cid for cid, _ in cents] == list(range(16))
    assert all(x * 32 == int(x * 32) for _, v in cents for x in v)
    # distinct rows WHERE the argmin discriminates: all k coarse
    # centroids, and all ksub codewords within each subspace (rows may
    # repeat ACROSS subspaces — encoding never compares those)
    assert len({tuple(v) for _, v in cents}) == 16
    for j in range(8):
        assert len({tuple(c) for c in cb[j]}) == 16


def test_quantize_dyadic_col_exact(spark):
    xs = [0.123456, -0.9999, 0.0078125, -0.0078124, 1.5, -2.25, 0.4999]
    df = spark.createDataFrame([(xs,)], "v array<double>")
    [got] = df.select(quantize_dyadic_col("v").alias("q")).collect()
    want = [math.floor(x * 64 + 0.5) / 64 for x in xs]
    assert list(got["q"]) == want  # bit-exact vs Python's floor recipe
    assert all(q * 64 == int(q * 64) for q in got["q"])  # dyadic


def test_pq_adc_kernel_bit_parity_on_dyadic_inputs(spark):
    """pq_encode + pq_search_batch (BLAS/np, any fold order) must equal
    a pure-Python sequential left-to-right recomputation BIT-FOR-BIT
    when all inputs are dyadic — the exactness argument the
    ann_pq_adc_apply oracle rests on, checked without any rounding."""
    m, ksub, dsub = 4, 8, 4
    dim = m * dsub
    cb = literal_codebooks(m, ksub, dsub)
    # dyadic corpus vectors from an integer recipe (multiples of 1/64)
    vecs = [
        (i, [((i * 13 + t * 5) % 97 - 48) / 64.0 for t in range(dim)])
        for i in range(40)
    ]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    codes_df = pq_encode(corpus, cb)
    queries = spark.createDataFrame(
        vecs[:3], "query_id long, query_embedding array<double>"
    )
    res = pq_search_batch(codes_df, cb, queries, top_k=5)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["score"])
        for r in res.collect()
    }

    # independent sequential-fold recomputation (no numpy)
    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    cb_sq = [[dot(c, c) for c in cb[j]] for j in range(m)]
    exp_codes = {}
    for vid, v in vecs:
        cs = []
        for j in range(m):
            sub = v[j * dsub : (j + 1) * dsub]
            d2 = [cb_sq[j][c] - 2.0 * dot(sub, cb[j][c]) for c in range(ksub)]
            cs.append(d2.index(min(d2)))  # first-minimum tie-break
        exp_codes[vid] = cs
    for qid, qv in vecs[:3]:
        lut = [
            [
                cb_sq[j][c]
                - 2.0 * dot(qv[j * dsub : (j + 1) * dsub], cb[j][c])
                + dot(qv[j * dsub : (j + 1) * dsub], qv[j * dsub : (j + 1) * dsub])
                for c in range(ksub)
            ]
            for j in range(m)
        ]
        scored = []
        for vid, _ in vecs:
            d2 = sum(lut[j][exp_codes[vid][j]] for j in range(m))
            scored.append((-(1.0 / (1.0 + math.sqrt(max(d2, 0.0)))), vid))
        scored.sort()
        for rank, (neg_s, vid) in enumerate(scored[:5], 1):
            assert got[(qid, rank)] == (vid, -neg_s)  # exact doubles


def test_cell_assign_argmin_bit_parity_on_dyadic_inputs(spark):
    """assign_centroids (np argmin over ‖c‖²−2x·c) vs a pure-Python
    sequential recomputation under dyadic inputs + literal centroids."""
    k, dim = 16, 64
    cents = literal_centroids(k, dim)
    vecs = [
        (i, [((i * 29 + t * 7) % 129 - 64) / 64.0 for t in range(dim)])
        for i in range(60)
    ]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_centroids(corpus, cents).collect()
    }

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    csq = [dot(v, v) for _, v in cents]
    for vid, v in vecs:
        d2 = [csq[c] - 2.0 * dot(v, cents[c][1]) for c in range(k)]
        assert got[vid] == d2.index(min(d2)), vid


def test_literal_rotation_exactly_orthogonal_and_kernel_parity(spark):
    """R = Hadamard/8: R·Rᵀ must equal I EXACTLY in float (every dot is
    a sum of ±1/64 terms — dyadic, order-free), and `rotate_vectors`
    (BLAS matv @ R) must match a pure-Python sequential recomputation
    bit-for-bit on dyadic inputs — the emb_rotation_apply_literal
    claim. Non-power-of-4 dims are rejected (1/sqrt(dim) not dyadic)."""
    from aeuc_vector_db_spark.operators.ann import (
        literal_rotation,
        rotate_vectors,
    )

    R = literal_rotation(64)
    for i in range(64):
        for j in range(0, 64, 7):  # spot-spread rows x columns
            dot = 0.0
            for t in range(64):
                dot += R[i][t] * R[j][t]
            assert dot == (1.0 if i == j else 0.0), (i, j, dot)
    with pytest.raises(ValueError, match="power of 4"):
        literal_rotation(32)

    vecs = [
        (i, [((i * 17 + t * 3) % 129 - 64) / 64.0 for t in range(64)])
        for i in range(20)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: list(r["r"])
        for r in rotate_vectors(df, R, out_col="r").collect()
    }
    for vid, v in vecs:
        want = [
            sum(v[i] * R[i][j] for i in range(64)) for j in range(64)
        ]  # python sum: left-to-right; equality must hold EXACTLY anyway
        assert got[vid] == want, vid
