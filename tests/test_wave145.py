"""Wave-145 operator: the size-4 graphlet census (non-induced + induced
counts of path4/claw/paw/cycle4/diamond/clique4 via closed-form
identities — verified here against 4-subset brute-force enumeration)."""

import itertools
import random

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.graphlets import graphlet_census4

PATTERNS = ("path4", "claw", "paw", "cycle4", "diamond", "clique4")


def _induced_ref(edges):
    """Brute-force induced census by 4-subset classification."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = dict.fromkeys(PATTERNS, 0)
    for S in itertools.combinations(sorted(adj), 4):
        es = [(a, b) for a, b in itertools.combinations(S, 2) if b in adj[a]]
        k = len(es)
        degs = sorted(sum(1 for e in es if v in e) for v in S)
        if k == 3 and degs == [1, 1, 2, 2]:
            counts["path4"] += 1
        elif k == 3 and degs == [1, 1, 1, 3]:
            counts["claw"] += 1
        elif k == 4 and degs == [2, 2, 2, 2]:
            counts["cycle4"] += 1
        elif k == 4 and degs == [1, 2, 2, 3]:
            counts["paw"] += 1
        elif k == 5:
            counts["diamond"] += 1
        elif k == 6:
            counts["clique4"] += 1
    return counts


def _noninduced_ref(induced):
    """Subgraph-copy counts from induced counts via the overcount matrix
    (copies of each pattern inside each denser pattern)."""
    i = induced
    return {
        "path4": i["path4"] + 2 * i["paw"] + 4 * i["cycle4"]
        + 6 * i["diamond"] + 12 * i["clique4"],
        "claw": i["claw"] + i["paw"] + 2 * i["diamond"] + 4 * i["clique4"],
        "paw": i["paw"] + 4 * i["diamond"] + 12 * i["clique4"],
        "cycle4": i["cycle4"] + i["diamond"] + 3 * i["clique4"],
        "diamond": i["diamond"] + 6 * i["clique4"],
        "clique4": i["clique4"],
    }


def _census(spark, edges):
    rows = graphlet_census4(graph_from_edges(spark, edges)).collect()
    assert len(rows) == 6
    ni = {r.graphlet: int(r.subgraph_count) for r in rows}
    ind = {r.graphlet: int(r.induced_count) for r in rows}
    return ni, ind


def _check(spark, edges):
    want_i = _induced_ref(edges)
    want_ni = _noninduced_ref(want_i)
    got_ni, got_i = _census(spark, edges)
    assert got_i == want_i
    assert got_ni == want_ni


def test_census_named_small_graphs(spark):
    # K4: 12 P4 copies, 4 claws, 12 paws, 3 C4, 6 diamonds, 1 K4; induced
    # counts are zero except the clique itself
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    ni, ind = _census(spark, k4)
    assert ni == {
        "path4": 12, "claw": 4, "paw": 12, "cycle4": 3, "diamond": 6,
        "clique4": 1,
    }
    assert ind == {
        "path4": 0, "claw": 0, "paw": 0, "cycle4": 0, "diamond": 0,
        "clique4": 1,
    }
    # pure patterns count themselves once
    for edges, name in [
        ([(0, 1), (1, 2), (2, 3)], "path4"),
        ([(0, 1), (0, 2), (0, 3)], "claw"),
        ([(0, 1), (1, 2), (2, 0), (0, 3)], "paw"),
        ([(0, 1), (1, 2), (2, 3), (3, 0)], "cycle4"),
        ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)], "diamond"),
    ]:
        ni, ind = _census(spark, edges)
        assert ind[name] == 1 and ni[name] == 1, name
        assert sum(ind.values()) >= 1


def test_census_bipartite_and_web_graph(spark):
    # K_{2,3}: triangle-free → paw/diamond/clique all zero; 3 induced C4
    k23 = [(a, 10 + b) for a in range(2) for b in range(3)]
    _check(spark, k23)
    ni, ind = _census(spark, k23)
    assert ind["cycle4"] == 3 and ni["paw"] == ni["diamond"] == 0

    from tests.fixtures_graphs import web64

    _check(spark, web64(36, 3))


def test_census_random_graphs_match_bruteforce(spark):
    rng = random.Random(145)
    for _ in range(3):
        n = rng.randint(8, 14)
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < 0.35
        ]
        _check(spark, edges)


def test_census_hub_spiked_orientation_bounded_c4(spark):
    # adversarial fixture for the orientation-bounded C4 wedge pass: two
    # dominant hubs (the top (deg, id) ranks, so hub-centered wedges are
    # dropped by the not-max rule) plus random chords among the leaves —
    # every C4 class appears: hub–hub cycles (both common neighbors of a
    # low diagonal rank ABOVE it), hub–leaf cycles (mixed ranks) and pure
    # leaf cycles.  Brute force pins the counts exactly.
    rng = random.Random(1450)
    n = 14
    edges = [(100, i) for i in range(2, n)] + [(101, i) for i in range(2, n)]
    edges += [
        (a, b)
        for a, b in itertools.combinations(range(2, n), 2)
        if rng.random() < 0.3
    ]
    _check(spark, edges)
    # sanity: the fixture actually exercises the hub–hub C4 family
    want = _induced_ref(edges)
    assert want["cycle4"] + want["diamond"] + want["clique4"] > 0


def test_census_self_loops_and_duplicates_ignored(spark):
    base = [(0, 1), (1, 2), (2, 0), (0, 3)]
    noisy = base + [(1, 1), (2, 2)] + [(b, a) for a, b in base] + base
    assert _census(spark, base) == _census(spark, noisy)


def test_census_triangle_only_graph_zero_rows_still_six(spark):
    # a bare triangle has no 4-vertex subgraph at all: six all-zero rows
    ni, ind = _census(spark, [(0, 1), (1, 2), (2, 0)])
    assert set(ni.values()) == {0} and set(ind.values()) == {0}
