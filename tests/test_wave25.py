"""Wave-25 operators: IVF recall audit, rank-vs-degree calibration curve,
landmark average-distance estimate."""

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.similarity import cosine_topk, ivf_knn, ivf_recall
from linkgraph_spark.kernels import avg_distance_landmarks
from linkgraph_spark.kernels.stats import rank_by_degree


# ------------------------------------------------------------------ ivf_recall
def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_ivf_recall_full_probe_is_exact(spark):
    # n_probe == n_cells → IVF searches everything → recall 1.0
    vecs = [
        [1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9],
        [0.7, 0.7], [1.0, 0.1], [0.1, 1.0], [0.8, 0.6],
    ]
    df = _embs(spark, vecs)
    out = ivf_recall(df, n_queries=3, k=2, n_cells=2, n_probe=2).collect()
    assert len(out) == 3
    assert all(r.recall == 1.0 for r in out)
    assert all(r.n_exact == 2 and r.n_hits == 2 for r in out)


def test_ivf_recall_counts_misses(spark):
    # replay engine's own components: recall must equal |exact ∩ approx|/k
    vecs = [
        [1.0, 0.0], [0.95, 0.05], [0.0, 1.0], [0.05, 0.95],
        [0.6, 0.8], [0.8, 0.6], [0.99, 0.01], [0.01, 0.99],
    ]
    df = _embs(spark, vecs)
    ex = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df, n_queries=4, k=3).collect()
    }
    ap = {
        (r.query_id, r.neighbor_id)
        for r in ivf_knn(df, n_queries=4, k=3, n_cells=4, n_probe=1).collect()
    }
    got = {
        r.query_id: (r.n_exact, r.n_hits)
        for r in ivf_recall(df, n_queries=4, k=3, n_cells=4, n_probe=1).collect()
    }
    for q, (n_exact, n_hits) in got.items():
        assert n_exact == sum(1 for (qq, _) in ex if qq == q)
        assert n_hits == len({p for p in ex if p[0] == q} & ap)


# -------------------------------------------------------------- rank_by_degree
def test_rank_by_degree_star(spark):
    # star: hub in-deg 3 holds its rank mass; leaves in-deg 0 share theirs
    g = graph_from_edges(spark, [(1, 0), (2, 0), (3, 0)])
    ranks = spark.createDataFrame(
        [(0, 0.7), (1, 0.1), (2, 0.1), (3, 0.1)], "id long, rank double"
    )
    got = {r.in_deg: r for r in rank_by_degree(ranks, g).collect()}
    assert set(got) == {0, 3}
    assert got[3].n_vertices == 1
    assert got[3].avg_rank == 0.7
    assert got[3].rank_share == 0.7
    assert got[0].n_vertices == 3
    assert got[0].avg_rank == pytest.approx(0.1, abs=1e-9)
    assert got[0].rank_share == pytest.approx(0.3, abs=1e-9)


# -------------------------------------------------- avg_distance_landmarks
def test_avg_distance_on_a_path(spark):
    # path 0-1-2-3 undirected, landmark 0, k=3: distances 1,2,3
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)])
    r = avg_distance_landmarks(g, landmarks=[0], k=3).collect()[0]
    assert (r.n_landmarks, r.n_pairs) == (1, 3)
    assert r.avg_distance == 2.0
    assert r.reached_frac == 1.0


def test_avg_distance_truncation_and_frac(spark):
    # k=1 truncates: only the direct neighbor is reached
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)])
    r = avg_distance_landmarks(g, landmarks=[0], k=1).collect()[0]
    assert r.n_pairs == 1 and r.avg_distance == 1.0
    assert r.reached_frac == pytest.approx(round(1 / 3, 6), abs=1e-9)


def test_avg_distance_multi_landmark_disconnected(spark):
    # two components: landmark 0 reaches 1; landmark 2 reaches 3
    g = graph_from_edges(spark, [(0, 1), (2, 3)])
    r = avg_distance_landmarks(g, landmarks=[0, 2], k=2).collect()[0]
    assert (r.n_landmarks, r.n_pairs) == (2, 2)
    assert r.avg_distance == 1.0
    assert r.reached_frac == pytest.approx(round(2 / 6, 6), abs=1e-9)
    with pytest.raises(ValueError):
        avg_distance_landmarks(g, landmarks=[], k=2)
