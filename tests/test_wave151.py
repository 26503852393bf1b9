"""Wave-151 operators: k=4 clique percolation and the spectral-radius /
epidemic-threshold estimate."""

import itertools
import random

import numpy as np
import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.cpm import clique_percolation3, clique_percolation4
from linkgraph_spark.kernels.spectral import spectral_radius


# ----------------------------------------------------------------- cpm k=4
def _cpm4_ref(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    k4s = [
        q
        for q in itertools.combinations(sorted(adj), 4)
        if all(y in adj[x] for x, y in itertools.combinations(q, 2))
    ]
    parent = list(range(len(k4s)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    by_face = {}
    for i, q in enumerate(k4s):
        for f in itertools.combinations(q, 3):
            by_face.setdefault(f, []).append(i)
    for members in by_face.values():
        for j in members[1:]:
            ra, rb = find(members[0]), find(j)
            parent[max(ra, rb)] = min(ra, rb)

    def key(q):
        return ":".join(str(v).zfill(19) for v in q)

    name = {}
    for i, q in enumerate(k4s):
        r = find(i)
        name[r] = min(name.get(r, key(q)), key(q))
    out = {}
    for i, q in enumerate(k4s):
        for v in q:
            out.setdefault(v, set()).add(name[find(i)])
    return out


def _k(n, base=0):
    return [(base + a, base + b) for a, b in itertools.combinations(range(n), 2)]


def test_cpm4_k5_is_one_community_and_edge_glue_is_not_enough(spark):
    # K5 = 5 K4s all sharing triangles → one community; a second K4 glued
    # to it by a single EDGE stays a separate community at k=4 (it would
    # merge at k=3 — the two levels must disagree here)
    k5 = _k(5)
    extra = [(3, 10), (3, 11), (4, 10), (4, 11), (10, 11)]  # K4 on {3,4,10,11}
    edges = k5 + extra
    res4 = clique_percolation4(graph_from_edges(spark, edges))
    assert res4.converged
    got4 = {}
    for r in res4.memberships.collect():
        got4.setdefault(r.id, set()).add(r.community)
    assert got4 == _cpm4_ref(edges)
    comms = set().union(*got4.values())
    assert len(comms) == 2
    assert len(got4[3]) == 2 and len(got4[4]) == 2  # shared-edge endpoints
    res3 = clique_percolation3(graph_from_edges(spark, edges))
    got3 = {}
    for r in res3.memberships.collect():
        got3.setdefault(r.id, set()).add(r.community)
    assert len(set().union(*got3.values())) == 1  # k=3 merges them


def test_cpm4_triangle_sharing_k4s_merge(spark):
    # two K4s sharing the triangle {0,1,2} percolate into one community
    edges = _k(4) + [(0, 9), (1, 9), (2, 9)]
    res = clique_percolation4(graph_from_edges(spark, edges))
    assert res.converged
    got = {}
    for r in res.memberships.collect():
        got.setdefault(r.id, set()).add(r.community)
    assert len(set().union(*got.values())) == 1
    assert set(got) == {0, 1, 2, 3, 9}


def test_cpm4_random_matches_union_find(spark):
    rng = random.Random(151)
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(12), 2)
        if rng.random() < 0.5
    ]
    res = clique_percolation4(graph_from_edges(spark, edges))
    assert res.converged
    got = {}
    for r in res.memberships.collect():
        got.setdefault(r.id, set()).add(r.community)
    assert got == _cpm4_ref(edges)


# ------------------------------------------------------- spectral radius
def test_spectral_radius_known_graphs(spark):
    # complete graph K5: lambda1 = 4 exactly (power iteration is exact in
    # one round on a regular graph)
    (r,) = spectral_radius(graph_from_edges(spark, _k(5))).collect()
    assert r.radius_est == pytest.approx(4.0, abs=1e-6)
    assert r.epidemic_threshold == pytest.approx(0.25, abs=1e-6)
    # 4-ring (2-regular): lambda1 = 2
    ring = [(i, (i + 1) % 4) for i in range(4)]
    (r,) = spectral_radius(graph_from_edges(spark, ring)).collect()
    assert r.radius_est == pytest.approx(2.0, abs=1e-6)


def test_spectral_radius_lower_bounds_numpy_eig(spark):
    rng = random.Random(1510)
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(12), 2)
        if rng.random() < 0.3
    ]
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    a = np.zeros((len(verts), len(verts)))
    for u, w in edges:
        a[idx[u], idx[w]] = a[idx[w], idx[u]] = 1.0
    lam = max(np.linalg.eigvalsh(a))
    (r,) = spectral_radius(
        graph_from_edges(spark, edges), iterations=12
    ).collect()
    # Rayleigh quotient from below, tight after 12 rounds
    assert r.radius_est <= lam + 1e-6
    assert r.radius_est == pytest.approx(lam, rel=1e-3)
