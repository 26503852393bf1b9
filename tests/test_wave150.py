"""Wave-150 operator: k=3 clique percolation (overlapping triangle
communities) vs a brute-force union-find over pairwise triangle adjacency."""

import itertools
import random

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.cpm import clique_percolation3


def _cpm_ref(edges):
    """Union-find over triangles sharing an edge → {vertex: set(community)}
    with each community named by its minimum lpad-19 triangle key."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = [
        (a, b, c)
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    ]
    parent = list(range(len(tris)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    by_edge = {}
    for i, t in enumerate(tris):
        for e in itertools.combinations(t, 2):
            by_edge.setdefault(e, []).append(i)
    for members in by_edge.values():
        for j in members[1:]:
            ra, rb = find(members[0]), find(j)
            parent[max(ra, rb)] = min(ra, rb)

    def key(t):
        return ":".join(str(v).zfill(19) for v in t)

    comm_name = {}
    for i, t in enumerate(tris):
        r = find(i)
        comm_name[r] = min(comm_name.get(r, key(t)), key(t))
    out = {}
    for i, t in enumerate(tris):
        name = comm_name[find(i)]
        for v in t:
            out.setdefault(v, set()).add(name)
    return out


def _got(spark, edges):
    res = clique_percolation3(graph_from_edges(spark, edges))
    assert res.converged
    out = {}
    for r in res.memberships.collect():
        out.setdefault(r.id, set()).add(r.community)
    return out


def test_cpm_two_pods_sharing_a_broker_vertex(spark):
    # two triangles sharing ONLY vertex 2 (no common edge): two distinct
    # communities, and the broker belongs to BOTH — the overlap disjoint
    # components cannot express
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)]
    got = _got(spark, edges)
    assert got == _cpm_ref(edges)
    assert len(got[2]) == 2
    assert len(got[0]) == 1 and got[0] == got[1]
    assert got[3] == got[4] and got[3] != got[0]


def test_cpm_edge_shared_triangles_merge(spark):
    # two triangles sharing EDGE (0,1) percolate into one community
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3)]
    got = _got(spark, edges)
    comms = set().union(*got.values())
    assert len(comms) == 1
    assert set(got) == {0, 1, 2, 3}


def test_cpm_triangle_free_graph_empty(spark):
    res = clique_percolation3(graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)]))
    assert res.converged
    assert res.memberships.count() == 0


def test_cpm_random_graph_matches_union_find(spark):
    rng = random.Random(150)
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(14), 2)
        if rng.random() < 0.3
    ]
    assert _got(spark, edges) == _cpm_ref(edges)


def test_cpm_chain_of_triangles_converges_in_diameter_rounds(spark):
    # a strip of triangles glued edge-to-edge: one community; the hash-min
    # needs O(strip length) rounds — converged flag must be honest
    strip = []
    for i in range(6):
        strip += [(i, i + 1), (i, i + 2), (i + 1, i + 2)]
    res = clique_percolation3(graph_from_edges(spark, strip))
    assert res.converged
    got = {}
    for r in res.memberships.collect():
        got.setdefault(r.id, set()).add(r.community)
    assert len(set().union(*got.values())) == 1
