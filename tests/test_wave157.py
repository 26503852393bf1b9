"""Wave-157 operator: PageRank drift between the stream's time halves."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.temporal import pagerank_drift


def _compat_ref(all_verts, half_edges, iters=3, d=0.8):
    """Reference-compat PageRank: in-deg-or-1 SOURCE divisor,
    keep-old-rank quirk, 1/N init over the FULL universe."""
    n = len(all_verts)
    indeg = {}
    for u, v in half_edges:
        indeg[v] = indeg.get(v, 0) + 1
    rel = {u: indeg.get(u, 0) or 1 for u in all_verts}
    r = {v: 1.0 / n for v in all_verts}
    for _ in range(iters):
        contrib = {}
        for u, v in half_edges:
            contrib[v] = contrib.get(v, 0.0) + r[u] / rel[u]
        nr = {}
        for v in all_verts:
            nr[v] = d * contrib[v] + (1 - d) / n if v in contrib else r[v]
        r = nr
    return {v: round(x, 6) for v, x in r.items()}


def _drift_ref(tedges, iters=3):
    verts = sorted({x for s, t, _ in tedges for x in (s, t) if s != t})
    ts = sorted(t for _, _, t in tedges)
    m = len(ts)
    med = (ts[(m - 1) // 2] + ts[m // 2]) / 2
    cut = math.floor(med)
    old = sorted({(s, t) for s, t, w in tedges if s != t and w <= cut})
    new = sorted({(s, t) for s, t, w in tedges if s != t and w > cut})
    ro = _compat_ref(verts, old, iters)
    rn = _compat_ref(verts, new, iters)
    return {v: (ro[v], rn[v], round(rn[v] - ro[v], 6)) for v in verts}


def _run(spark, tedges, iters=3):
    g = graph_from_edges(spark, [(s, t) for s, t, _ in tedges])
    te = spark.createDataFrame(tedges, "src long, dst long, ts long")
    rows = pagerank_drift(g, te, iterations=iters).collect()
    return {r.id: (r.rank_old, r.rank_new, r.delta) for r in rows}


def test_drift_matches_reference_and_direction(spark):
    # early: star INTO 0; late: star INTO 9 — importance must move 0 → 9
    tedges = (
        [(i, 0, 100 + i) for i in range(1, 5)]
        + [(0, 9, 105)]
        + [(i, 9, 200 + i) for i in range(1, 5)]
        + [(9, 0, 210)]
    )
    got = _run(spark, tedges)
    want = _drift_ref(tedges)
    assert set(got) == set(want)
    for v in want:
        for gi, wi in zip(got[v], want[v]):
            assert gi == pytest.approx(wi, abs=2e-6), v
    assert got[9][2] > 0 and got[0][2] < 0


def test_drift_stationary_graph_zero_delta(spark):
    # identical edge sets in both halves → delta exactly 0 everywhere
    base = [(0, 1), (1, 2), (2, 0)]
    tedges = [(s, t, 10) for s, t in base] + [(s, t, 20) for s, t in base]
    got = _run(spark, tedges)
    assert all(d == 0.0 for _, _, d in got.values())


def test_drift_duplicate_edges_dedup_first_wins(spark):
    # multiplicity in a half must not change the half's simple-graph rank
    tedges = [(0, 1, 5), (0, 1, 6), (1, 0, 7), (0, 1, 50), (1, 0, 60)]
    got = _run(spark, tedges)
    want = _drift_ref(tedges)
    for v in want:
        for gi, wi in zip(got[v], want[v]):
            assert gi == pytest.approx(wi, abs=2e-6), v
