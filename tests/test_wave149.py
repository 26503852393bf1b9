"""Wave-149 operators: truncated Estrada subgraph centrality (SC4) and
the Molloy-Reed percolation threshold."""

import itertools
import random

import numpy as np
import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.centrality import subgraph_centrality4
from linkgraph_spark.kernels.stats import molloy_reed


def _sc4_ref(edges):
    verts = sorted({v for e in edges for v in e if e[0] != e[1]})
    idx = {v: i for i, v in enumerate(verts)}
    a = np.zeros((len(verts), len(verts)))
    for u, w in edges:
        if u == w:
            continue
        a[idx[u], idx[w]] = 1.0
        a[idx[w], idx[u]] = 1.0
    a2, a3, a4 = a @ a, None, None
    a3 = a2 @ a
    a4 = a3 @ a
    out = {}
    for v in verts:
        i = idx[v]
        out[v] = round(
            1.0 + a2[i, i] / 2 + a3[i, i] / 6 + a4[i, i] / 24, 6
        )
    return out


def test_sc4_matches_matrix_power_bruteforce(spark):
    rng = random.Random(149)
    for _ in range(2):
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(10), 2)
            if rng.random() < 0.35
        ]
        got = {
            r.id: r.sc4
            for r in subgraph_centrality4(graph_from_edges(spark, edges)).collect()
        }
        want = _sc4_ref(edges)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_sc4_separates_equal_degree_equal_triangles(spark):
    # square + diagonal-free path: vertices 0..3 on a C4 all have d=2, t=0
    # but the C4 closes 4-walks a path cannot — SC4(C4 vertex) > SC4(path
    # middle) even at equal degree and zero triangles
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    path = [(10, 11), (11, 12), (12, 13), (13, 14)]
    got = {
        r.id: r.sc4
        for r in subgraph_centrality4(
            graph_from_edges(spark, c4 + path)
        ).collect()
    }
    assert got[0] > got[12]
    want = _sc4_ref(c4 + path)
    for v, s in want.items():
        assert got[v] == pytest.approx(s, abs=2e-6)


def test_molloy_reed_hand_values(spark):
    # 5-ring: all degrees 2 → kappa = 2, fc = 1 - 1/(2-1) = 0
    ring = [(i, (i + 1) % 5) for i in range(5)]
    (r,) = molloy_reed(graph_from_edges(spark, ring)).collect()
    assert (r.n, r.m) == (5, 5)
    assert r.mean_k == 2.0 and r.kappa == 2.0 and r.fc == 0.0
    # 4-leaf star: Σk = 8, Σk² = 20 → kappa 2.5, fc = 1 - 1/1.5
    star = [(0, i) for i in range(1, 5)]
    (r,) = molloy_reed(graph_from_edges(spark, star)).collect()
    assert (r.n, r.m) == (5, 4)
    assert r.kappa == pytest.approx(2.5, abs=1e-9)
    assert r.fc == pytest.approx(1 - 1 / 1.5, abs=1e-6)


def test_molloy_reed_single_edge_fc_null(spark):
    # one edge: kappa = 1 → below the giant-component regime, fc NULL
    (r,) = molloy_reed(graph_from_edges(spark, [(0, 1)])).collect()
    assert r.kappa == 1.0 and r.fc is None
