"""Wave-29 operators: friendship-paradox audit, avg-neighbor-degree curve,
rank Dirichlet smoothness, embedding anisotropy."""

import math

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.similarity import anisotropy
from linkgraph_spark.kernels.stats import (
    avg_neighbor_degree,
    friendship_paradox,
    rank_smoothness,
)


def _ranks(spark, pairs):
    return spark.createDataFrame(pairs, "id long, rank double")


def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


# -------------------------------------------------------- friendship_paradox
def test_friendship_paradox_star(spark):
    # star 0-{1,2,3}: deg(0)=3, leaves 1; nb_avg(0)=1, leaves 3
    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3)])
    r = friendship_paradox(g).collect()[0]
    assert r.n_vertices == 4
    assert r.mean_deg == 1.5
    assert r.mean_neighbor_deg == 2.5
    assert r.edge_pov_deg == 2.0  # (9+1+1+1)/6
    assert r.paradox_frac == 0.75  # the 3 leaves, not the hub


def test_friendship_paradox_regular(spark):
    # triangle: 2-regular — no paradox anywhere
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])
    r = friendship_paradox(g).collect()[0]
    assert r.mean_deg == 2.0 and r.mean_neighbor_deg == 2.0
    assert r.paradox_frac == 0.0


def test_friendship_paradox_ignores_loops_and_dups(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 0), (0, 0), (0, 1)])
    r = friendship_paradox(g).collect()[0]
    assert r.n_vertices == 2 and r.mean_deg == 1.0 and r.paradox_frac == 0.0


# ------------------------------------------------------- avg_neighbor_degree
def test_avg_neighbor_degree_star(spark):
    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3)])
    got = {r.deg: r for r in avg_neighbor_degree(g).collect()}
    assert got[3].n_vertices == 1 and got[3].avg_nb_deg == 1.0
    assert got[1].n_vertices == 3 and got[1].avg_nb_deg == 3.0


def test_avg_neighbor_degree_path(spark):
    # path 0-1-2: endpoints see the middle (deg 2); middle sees deg-1 ends
    g = graph_from_edges(spark, [(0, 1), (1, 2)])
    got = {r.deg: r for r in avg_neighbor_degree(g).collect()}
    assert got[1].n_vertices == 2 and got[1].avg_nb_deg == 2.0
    assert got[2].n_vertices == 1 and got[2].avg_nb_deg == 1.0


# ----------------------------------------------------------- rank_smoothness
def test_rank_smoothness_hand_path(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2)])
    r = rank_smoothness(
        _ranks(spark, [(0, 1.0), (1, 2.0), (2, 4.0)]), g
    ).collect()[0]
    assert r.n_edges == 2
    assert r.energy == pytest.approx(5.0)  # 1 + 4
    assert r.smoothness == pytest.approx(0.2)  # 5 / (5 + 20)


def test_rank_smoothness_constant_signal(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2)])
    r = rank_smoothness(
        _ranks(spark, [(0, 1.0), (1, 1.0), (2, 1.0)]), g
    ).collect()[0]
    assert r.energy == 0.0 and r.smoothness == 0.0


def test_rank_smoothness_zero_signal_null(spark):
    g = graph_from_edges(spark, [(0, 1)])
    r = rank_smoothness(_ranks(spark, [(0, 0.0), (1, 0.0)]), g).collect()[0]
    assert r.energy == 0.0 and r.smoothness is None


# ---------------------------------------------------------------- anisotropy
def test_anisotropy_identical(spark):
    r = anisotropy(_embs(spark, [[1, 0], [2, 0]])).collect()[0]
    assert r.n == 2 and r.dim == 2
    assert r.mean_norm == 1.5
    assert r.mean_pairwise_cos == pytest.approx(1.0)


def test_anisotropy_orthogonal_and_opposite(spark):
    assert anisotropy(_embs(spark, [[1, 0], [0, 1]])).collect()[0][
        "mean_pairwise_cos"
    ] == pytest.approx(0.0)
    assert anisotropy(_embs(spark, [[1, 0], [-1, 0]])).collect()[0][
        "mean_pairwise_cos"
    ] == pytest.approx(-1.0)


def test_anisotropy_zero_vector_excluded(spark):
    r = anisotropy(_embs(spark, [[3, 4], [0, 0]])).collect()[0]
    assert r.n == 1 and r.mean_norm == 5.0
    assert r.mean_pairwise_cos is None


def test_anisotropy_matches_bruteforce(spark):
    vecs = [[1, 2, 3], [4, -5, 6], [-7, 8, 9], [1, 1, 1]]
    r = anisotropy(_embs(spark, vecs)).collect()[0]
    unit = [
        [x / math.sqrt(sum(y * y for y in v)) for x in v] for v in vecs
    ]
    n = len(unit)
    s = sum(
        sum(a * b for a, b in zip(unit[i], unit[j]))
        for i in range(n)
        for j in range(n)
        if i != j
    )
    assert r.mean_pairwise_cos == pytest.approx(round(s / (n * (n - 1)), 6), abs=2e-6)
