"""Port of reference tests/test_similarity.py (semantics, not code):
metric identities and known values, computed through the engine's Column
builders on a Spark DataFrame.
"""

import math

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.similarity import (
    METRICS,
    cosine_col,
    dot_col,
    euclidean_distance_col,
    euclidean_similarity_col,
    phi_weighted_col,
    similarity_col,
)
from aeuc_vector_db_spark.functions.vector import l2_norm_col, l2_normalize_col, lit_vector


def _pair(spark, a, b):
    return spark.createDataFrame([(a, b)], "a array<double>, b array<double>")


def _score(spark, a, b, col_fn):
    return _pair(spark, a, b).select(col_fn("a", "b").alias("s")).collect()[0]["s"]


class TestCosine:
    def test_identical(self, spark):
        assert _score(spark, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0], cosine_col) == pytest.approx(1.0)

    def test_orthogonal(self, spark):
        assert _score(spark, [1.0, 0.0], [0.0, 1.0], cosine_col) == pytest.approx(0.0, abs=1e-9)

    def test_opposite(self, spark):
        assert _score(spark, [1.0, 0.0], [-1.0, 0.0], cosine_col) == pytest.approx(-1.0)

    def test_zero_vector_guard(self, spark):
        # denom +1e-12 guard (similarity.py:33): no NaN, returns 0
        s = _score(spark, [0.0, 0.0], [1.0, 1.0], cosine_col)
        assert not math.isnan(s)
        assert s == pytest.approx(0.0)

    def test_range(self, spark):
        s = _score(spark, [1.0, 2.0, -3.0], [-4.0, 0.5, 2.0], cosine_col)
        assert -1.0 <= s <= 1.0


class TestEuclidean:
    def test_3_4_5(self, spark):
        d = _score(spark, [0.0, 0.0], [3.0, 4.0], euclidean_distance_col)
        assert d == pytest.approx(5.0)

    def test_similarity_conversion(self, spark):
        # 1/(1+d) (similarity.py:42-44)
        s = _score(spark, [0.0, 0.0], [3.0, 4.0], euclidean_similarity_col)
        assert s == pytest.approx(1.0 / 6.0)

    def test_identical_is_one(self, spark):
        assert _score(spark, [1.0, 2.0], [1.0, 2.0], euclidean_similarity_col) == pytest.approx(1.0)

    def test_monotonic_decay(self, spark):
        s1 = _score(spark, [0.0], [1.0], euclidean_similarity_col)
        s2 = _score(spark, [0.0], [2.0], euclidean_similarity_col)
        s3 = _score(spark, [0.0], [5.0], euclidean_similarity_col)
        assert s1 > s2 > s3


class TestDot:
    def test_known_value(self, spark):
        # [1,2,3]·[4,5,6] = 32 (test_similarity.py:74-77)
        assert _score(spark, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0], dot_col) == pytest.approx(32.0)

    def test_orthogonal_zero(self, spark):
        assert _score(spark, [1.0, 0.0], [0.0, 1.0], dot_col) == pytest.approx(0.0)


class TestPhiWeighted:
    def test_self_similarity_near_one(self, spark):
        v = [1.618, 2.618, 0.618, 4.236]
        assert _score(spark, v, v, phi_weighted_col) == pytest.approx(1.0, abs=1e-6)

    def test_matches_reference_math(self, spark):
        # independent NumPy recomputation of similarity.py:52-74
        import numpy as np

        a = [0.3, 1.6, 2.7, 0.1]
        b = [1.1, 1.7, 0.2, 0.9]
        phi = (1 + 5**0.5) / 2
        powers = np.array([phi**n for n in range(-3, 7)])
        aa, bb = np.array(a), np.array(b)
        avg = (np.abs(aa) + np.abs(bb)) / 2 + 1e-12
        w = 1.0 / (np.abs(avg[:, None] - powers).min(axis=1) + 1e-8)
        w /= w.sum() + 1e-12
        wa, wb = aa * w, bb * w
        expected = float(wa @ wb / (np.linalg.norm(wa) * np.linalg.norm(wb) + 1e-12))
        assert _score(spark, a, b, phi_weighted_col) == pytest.approx(expected, rel=1e-9)

    def test_pandas_udf_matches_sql(self, spark):
        from aeuc_vector_db_spark.functions.similarity import phi_weighted_pandas

        a = [0.3, 1.6, 2.7, 0.1]
        q = [1.1, 1.7, 0.2, 0.9]
        df = spark.createDataFrame([(a,)], "emb array<double>")
        sql_val = df.select(phi_weighted_col("emb", lit_vector(q)).alias("s")).collect()[0]["s"]
        pd_val = df.select(phi_weighted_pandas(q)(F.col("emb")).alias("s")).collect()[0]["s"]
        assert pd_val == pytest.approx(sql_val, rel=1e-12)


class TestDispatch:
    @pytest.mark.parametrize("metric", sorted(METRICS))
    def test_each_metric_dispatches(self, spark, metric):
        s = _score(spark, [1.0, 2.0], [2.0, 1.0], lambda a, b: similarity_col(a, b, metric))
        assert isinstance(s, float)

    def test_unknown_metric_raises(self):
        with pytest.raises(ValueError, match="Unknown metric"):
            similarity_col("a", "b", "bogus")


class TestVectorHelpers:
    def test_l2_norm(self, spark):
        df = spark.createDataFrame([([3.0, 4.0],)], "v array<double>")
        assert df.select(l2_norm_col("v").alias("n")).collect()[0]["n"] == pytest.approx(5.0)

    def test_normalize(self, spark):
        df = spark.createDataFrame([([3.0, 4.0],)], "v array<double>")
        out = df.select(l2_normalize_col("v").alias("u")).collect()[0]["u"]
        assert out[0] == pytest.approx(0.6, rel=1e-9)
        assert out[1] == pytest.approx(0.8, rel=1e-9)
