"""Wave-148 operator: onion decomposition (k-core peel layers)."""

import itertools
import random

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.kcore import k_core, onion_decomposition


def _onion_ref(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    k, layer, out = 0, 0, {}
    while active:
        deg = {v: len(adj[v] & active) for v in active}
        k = max(k, min(deg.values()))
        layer += 1
        peel = {v for v in active if deg[v] <= k}
        for v in peel:
            out[v] = (k, layer)
        active -= peel
    return out


def _got(spark, edges, **kw):
    res = onion_decomposition(graph_from_edges(spark, edges), **kw)
    assert res.converged
    return res, {r.id: (r.core, r.layer) for r in res.layers.collect()}


def test_onion_chain_off_a_core_peels_layer_per_round(spark):
    # triangle (core 2) with a 3-vertex tail: the tail peels one layer per
    # round at k=1 — coreness alone cannot see this depth structure
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 5)]
    res, got = _got(spark, edges)
    assert got == _onion_ref(edges)
    assert got[5] == (1, 1) and got[4] == (1, 2) and got[3] == (1, 3)
    assert got[0][0] == 2 and got[1][0] == 2 and got[2][0] == 2
    assert res.metrics[0]["k"] == 1
    # peeled counts per round sum to |V|
    assert sum(m["peeled"] for m in res.metrics) == 6


def test_onion_ring_and_star(spark):
    ring = [(i, (i + 1) % 5) for i in range(5)]
    _, got = _got(spark, ring)
    assert set(got.values()) == {(2, 1)}  # whole ring is one 2-core layer
    star = [(0, i) for i in range(1, 6)]
    _, got = _got(spark, star)
    assert got[0] == (1, 2)  # hub survives one round longer
    assert all(got[i] == (1, 1) for i in range(1, 6))


def test_onion_core_equals_kcore_kernel(spark):
    rng = random.Random(148)
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(16), 2)
        if rng.random() < 0.25
    ]
    g = graph_from_edges(spark, edges)
    res = onion_decomposition(g)
    assert res.converged
    onion_core = {r.id: r.core for r in res.layers.collect()}
    kc = k_core(g)
    assert kc.converged
    core = {r.id: r.core for r in kc.coreness.collect()}
    assert onion_core == core
    assert onion_core == {v: c for v, (c, _) in _onion_ref(edges).items()}


def test_onion_cap_stop_reports_not_converged(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    res = onion_decomposition(graph_from_edges(spark, edges), max_rounds=2)
    assert not res.converged
    assert res.rounds == 2
