"""Clustering operator tests (A8-A12), cross-checked against independent
NumPy recomputation of the reference math (clustering.py:25-127).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.clustering import (
    auto_cluster_phi,
    centroids,
    form_pglyphs,
    inertia,
    membership,
    with_phi_band,
)

PHI = (1.0 + 5.0**0.5) / 2.0


@pytest.fixture(scope="module")
def corpus_np(embeddings):
    rows = embeddings.select("vec_id", "embedding", "label").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    return ids, mat, labels


class TestCentroidInertia:
    def test_centroid_matches_numpy(self, embeddings, corpus_np):
        _, mat, labels = corpus_np
        got = {r["label"]: r["centroid"] for r in
               centroids(embeddings, ["label"]).collect()}
        for lab in np.unique(labels):
            exp = mat[labels == lab].mean(axis=0)
            np.testing.assert_allclose(np.array(got[int(lab)]), exp, rtol=1e-9)

    def test_inertia_matches_numpy(self, embeddings, corpus_np):
        _, mat, labels = corpus_np
        cents = centroids(embeddings, ["label"])
        got = {r["label"]: r["inertia"] for r in
               inertia(embeddings, cents, ["label"]).collect()}
        for lab in np.unique(labels):
            grp = mat[labels == lab]
            c = grp.mean(axis=0)
            exp = float(((grp - c) ** 2).sum())
            assert got[int(lab)] == pytest.approx(exp, rel=1e-9)

    def test_empty_group_absent(self, spark):
        # reference raises on empty list (clustering.py:27-28); in batch form
        # an empty group simply produces no row.
        df = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
        assert centroids(df, ["label"]).count() == 0


class TestFormPglyphs:
    def test_ids_deterministic_and_counts(self, embeddings, corpus_np):
        ids, _, labels = corpus_np
        pg1 = form_pglyphs(embeddings, ["label"], id_col="vec_id").collect()
        pg2 = form_pglyphs(embeddings.repartition(7), ["label"], id_col="vec_id").collect()
        d1 = {r["label"]: r for r in pg1}
        d2 = {r["label"]: r for r in pg2}
        assert set(d1) == set(d2) == {int(x) for x in np.unique(labels)}
        for lab in d1:
            assert d1[lab]["pglyph_id"] == d2[lab]["pglyph_id"]  # sha2 of sorted members
            assert d1[lab]["member_count"] == int((labels == lab).sum())

    def test_membership_relation(self, embeddings, corpus_np):
        ids, _, labels = corpus_np
        mem = membership(embeddings, ["label"], id_col="vec_id")
        assert mem.count() == len(ids)
        assert mem.select("pglyph_id").distinct().count() == len(np.unique(labels))


class TestPhiPartition:
    def _np_bands(self, norms, levels):
        mn, mx = norms.min(), norms.max()
        span = mx - mn + 1e-12
        breaks = [mn] + [mn + span * (1 - 1 / PHI**k) for k in range(1, levels)] + [mx + 1e-9]
        out = np.full(len(norms), -1)
        for i, n in enumerate(norms):
            for b in range(levels):
                if breaks[b] <= n < breaks[b + 1]:
                    out[i] = b
                    break
        return out

    @pytest.mark.parametrize("levels", [2, 3, 5])
    def test_matches_reference_banding(self, embeddings, corpus_np, levels):
        ids, mat, _ = corpus_np
        norms = np.linalg.norm(mat, axis=1)
        exp = dict(zip(ids, self._np_bands(norms, levels)))
        got = {r["vec_id"]: r["band"] for r in
               with_phi_band(embeddings, levels=levels).select("vec_id", "band").collect()}
        assert got == {int(k): int(v) for k, v in exp.items()}

    def test_bands_are_partition(self, embeddings):
        banded = with_phi_band(embeddings, levels=3)
        n = banded.count()
        assert n == embeddings.count()  # exhaustive
        assert banded.groupBy("vec_id").count().filter("count > 1").count() == 0  # disjoint

    def test_auto_cluster_pipeline(self, embeddings, corpus_np):
        _, mat, labels = corpus_np
        ctx = int(labels[0])
        df = embeddings.withColumn("outer_context_id", F.col("label"))
        pg = auto_cluster_phi(df, outer_context_id=ctx, levels=3).collect()
        assert 1 <= len(pg) <= 3
        assert all(r["cluster_tag"].startswith("phi_band_") for r in pg)
        total = sum(r["member_count"] for r in pg)
        assert total == int((labels == ctx).sum())

    def test_empty_context_empty_result(self, embeddings):
        df = embeddings.withColumn("outer_context_id", F.col("label"))
        assert auto_cluster_phi(df, outer_context_id=9999).count() == 0
