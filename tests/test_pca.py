"""PCA power iteration: numpy eigendecomposition cross-check."""

import numpy as np
import pytest
from pyspark.sql import Row

from linkgraph_spark.kernels.pca import pca_power


def _emb(spark, mat):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in r]) for i, r in enumerate(mat)]
    )


def test_pca_power_matches_numpy_top_component(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: dominant direction along a fixed axis mix
    d0 = np.array([3.0, 1.0, -2.0, 0.5])
    mat = rng.normal(size=(60, 4)) + rng.normal(size=(60, 1)) * 4.0 * d0
    rows = pca_power(_emb(spark, mat), iterations=12).collect()
    got_v = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    got_eig = rows[0].eigenvalue

    c = mat - mat.mean(axis=0)
    evals, evecs = np.linalg.eigh(c.T @ c)
    top_v, top_eig = evecs[:, -1], evals[-1]
    # direction matches up to sign; Rayleigh quotient matches the top
    # eigenvalue of the (uncentered-scale) scatter matrix
    assert abs(float(np.dot(got_v, top_v))) > 0.9999
    assert got_eig == pytest.approx(top_eig, rel=1e-4)


def test_pca_power_loadings_are_unit(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(30, 5))
    rows = pca_power(_emb(spark, mat), iterations=8).collect()
    v = np.array([r.loading for r in rows])
    assert float(np.linalg.norm(v)) == pytest.approx(1.0, abs=1e-5)
    assert len(rows) == 5


def test_pca_power_refuses_missing_seed(spark):
    df = spark.createDataFrame([Row(vec_id=5, embedding=[1.0, 2.0])])
    with pytest.raises(ValueError, match="vec_id == 0"):
        pca_power(df, iterations=2)


def test_bigram_lm_score_hand_values(spark):
    from linkgraph_spark.functions.text import bigram_lm_score

    # corpus bigrams: "a b" x2 (doc0, doc1), "b a" x1 (doc1)
    # heads: C(a ·)=2, C(b ·)=1
    rows = [(0, "a b"), (1, "a b a"), (2, "x")]  # doc2: 1 token -> no row
    d = spark.createDataFrame(rows, "doc_id long, text string")
    import math

    got = {
        r.doc_id: (r.n_bigrams, r.lm_score)
        for r in bigram_lm_score(d).collect()
    }
    p_ab = math.log(2 / 2)  # C(a b)/C(a ·) = 2/2
    p_ba = math.log(1 / 1)  # C(b a)/C(b ·) = 1/1
    assert got == {
        0: (1, round(p_ab, 6)),
        1: (2, round((p_ab + p_ba) / 2, 6)),
    }
