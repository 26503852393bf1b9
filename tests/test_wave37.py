"""Wave-37 operators: C(k) clustering-by-degree curve, trigram event
paths, second principal component via deflated power iteration."""

import datetime

import numpy as np
import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.events import trigram_paths
from linkgraph_spark.kernels.pca import pca2_power, pca_power
from linkgraph_spark.kernels.triangles import clustering_by_degree


# --------------------------------------------------------- clustering_by_degree
def test_clustering_by_degree_hand(spark):
    # triangle 0-1-2 plus pendant 2-3: degs 2,2,3,1; lcc 1,1,1/3,0
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    got = {r.deg: r for r in clustering_by_degree(g).collect()}
    assert got[2].n_vertices == 2 and got[2].avg_lcc == 1.0
    assert got[3].n_vertices == 1 and got[3].avg_lcc == pytest.approx(
        round(1 / 3, 6)
    )
    assert got[1].n_vertices == 1 and got[1].avg_lcc == 0.0


# ---------------------------------------------------------------- trigram_paths
def test_trigram_paths_hand(spark):
    t0 = datetime.datetime(2026, 1, 1)
    mk = lambda i, s, et: (i, t0 + datetime.timedelta(seconds=s), 1, et, 0.0)  # noqa: E731
    rows = [
        mk(0, 0, "view"),
        mk(1, 10, "click"),
        mk(2, 20, "view"),     # view,click,view
        mk(3, 30, "click"),    # click,view,click
        mk(4, 99999, "view"),  # gap breaks both trigrams through it
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {(r.t1, r.t2, r.t3): r.n for r in trigram_paths(df).collect()}
    assert got == {("view", "click", "view"): 1, ("click", "view", "click"): 1}


def test_trigram_paths_topn_and_rejects(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 1, et, 0.0)
        for i, et in enumerate(["a", "b", "a", "b", "a"])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    top1 = trigram_paths(df, top_n=1).collect()
    assert len(top1) == 1 and top1[0].n == 2  # a,b,a occurs twice
    with pytest.raises(ValueError):
        trigram_paths(df, top_n=0)


# ------------------------------------------------------------------- pca2_power
def _embs(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row], 0) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>, label int",
    )


def test_pca2_orthogonal_to_pca1_and_matches_numpy(spark):
    rng = np.random.RandomState(7)
    # anisotropic 3-D cloud: distinct top-2 directions
    mat = rng.randn(40, 3) * np.array([5.0, 2.0, 0.3])
    df = _embs(spark, mat)
    u1 = np.array([r.loading for r in pca_power(df, iterations=12).collect()])
    rows2 = pca2_power(df, iterations=12).collect()
    u2 = np.array([r.loading for r in sorted(rows2, key=lambda r: r.pos)])
    assert abs(float(u1 @ u2)) < 1e-3  # deflation enforces orthogonality
    c = mat - mat.mean(axis=0)
    evals, evecs = np.linalg.eigh(c.T @ c)
    np1, np2 = evecs[:, -1], evecs[:, -2]
    assert abs(abs(float(np2 @ u2)) - 1.0) < 1e-3  # aligned with true PC2
    assert rows2[0].eigenvalue == pytest.approx(float(evals[-2]), rel=1e-3)


def test_pca2_requires_seed_vectors(spark):
    df = _embs(spark, [[1.0, 0.0], [0.0, 1.0]])
    shifted = df.selectExpr("vec_id + 5 as vec_id", "embedding", "label")
    with pytest.raises(ValueError):
        pca2_power(shifted)
