"""Wave-16 operators: SimRank (sparse superstep iteration), exact
radius-1/2 ball sizes, and DBSCAN density clustering over embeddings.

Each test pins the engine against an independent pure-Python reference
(dense SimRank matrix iteration, BFS ball counts, classic DBSCAN over the
separately-verified pair relation)."""

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.similarity import dbscan, embedding_near_dups
from linkgraph_spark.kernels.centrality import ball_sizes
from linkgraph_spark.kernels.simrank import simrank
from tests.fixtures_graphs import TWO_COMPS, web64


# ------------------------------------------------------------------ helpers
def _r(x: float, n: int) -> float:
    """HALF_UP rounding — Spark's F.round / DuckDB's round(), NOT Python's
    banker's round() (observed flipping a 6-dp value at a .5 boundary)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), ROUND_HALF_UP))


def _dense_simrank(edges, iterations, decay=0.8, max_out_degree=None, min_score=0.0):
    """Dense reference: Jeh & Widom iteration with the engine's per-round
    9-dp rounding (and optional hub-source cap / inter-round prune)."""
    edges = sorted({(s, d) for s, d in edges if s != d})
    if max_out_degree is not None:
        from collections import Counter

        od = Counter(s for s, _ in edges)
        edges = [(s, d) for s, d in edges if od[s] <= max_out_degree]
    verts = sorted({v for e in edges for v in e})
    innb = {v: [s for s, d in edges if d == v] for v in verts}
    s = {}  # off-diagonal sparse dict on ordered pairs
    for _ in range(iterations):
        nxt = {}
        for a in verts:
            for b in verts:
                if a >= b or not innb[a] or not innb[b]:
                    continue
                tot = 0.0
                for i in innb[a]:
                    for j in innb[b]:
                        if i == j:
                            tot += 1.0
                        else:
                            tot += s.get((min(i, j), max(i, j)), 0.0)
                val = _r(decay * tot / (len(innb[a]) * len(innb[b])), 9)
                if val == 0.0 or (min_score > 0 and val < min_score):
                    continue
                nxt[(a, b)] = val
        s = nxt
    return {k: _r(v, 6) for k, v in s.items() if _r(v, 6) > 0}


def _ball_ref(edges, vertices, max_degree=None):
    und = {}
    for a, b in edges:
        if a == b:
            continue
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    out = {}
    for v in vertices:
        n1 = und.get(v, set()) | {v}
        n2 = set(n1)
        for m in und.get(v, set()):
            if max_degree is not None and len(und[m]) > max_degree:
                continue
            n2 |= und[m]
        out[v] = (len(n1), len(n2))
    return out


# ------------------------------------------------------------------- simrank
def test_simrank_matches_dense_reference(spark):
    edges = web64(24, 2)
    g = graph_from_edges(spark, edges)
    got = {
        (r.a, r.b): r.score for r in simrank(g, iterations=2).collect()
    }
    want = _dense_simrank(edges, iterations=2)
    assert got == pytest.approx(want)


def test_simrank_three_iterations_and_decay(spark):
    edges = web64(20, 2, seed=7)
    g = graph_from_edges(spark, edges)
    got = {
        (r.a, r.b): r.score
        for r in simrank(g, iterations=3, decay=0.6).collect()
    }
    want = _dense_simrank(edges, iterations=3, decay=0.6)
    assert got == pytest.approx(want)


def test_simrank_iteration1_is_normalized_common_inneighbors(spark):
    # s_1(a,b) = C * |I(a) ∩ I(b)| / (|I(a)|·|I(b)|) — the link between
    # SimRank and the common-neighbor family
    edges = [(0, 2), (1, 2), (0, 3), (1, 3), (4, 3)]
    g = graph_from_edges(spark, edges)
    got = {(r.a, r.b): r.score for r in simrank(g, iterations=1).collect()}
    assert got[(2, 3)] == pytest.approx(round(0.8 * 2 / (2 * 3), 6), abs=1e-9)


def test_simrank_hub_cap_and_prune_match_reference(spark):
    edges = web64(24, 3, seed=3)
    g = graph_from_edges(spark, edges)
    got = {
        (r.a, r.b): r.score
        for r in simrank(
            g, iterations=2, max_out_degree=3, min_score=0.01
        ).collect()
    }
    want = _dense_simrank(edges, 2, max_out_degree=3, min_score=0.01)
    assert got == pytest.approx(want)


def test_simrank_plan_no_cartesian_or_row_python(spark):
    # audit the UNCHECKPOINTED builder plan (the public wrapper
    # materializes eagerly, hiding the shape)
    from linkgraph_spark.kernels.simrank import _simrank_frame

    g = graph_from_edges(spark, web64(24, 2))
    frame, edges = _simrank_frame(g, 2, 0.8, None, 0.0)
    p = frame._jdf.queryExecution().executedPlan().toString()
    edges.unpersist()
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


# ---------------------------------------------------------------- ball sizes
def test_ball_sizes_exact_two_components(spark):
    g = graph_from_edges(spark, TWO_COMPS)
    got = {r.id: (r.ball1, r.ball2) for r in ball_sizes(g).collect()}
    verts = {v for e in TWO_COMPS for v in e}
    assert got == _ball_ref(TWO_COMPS, verts)


def test_ball_sizes_web_graph(spark):
    edges = web64(40, 3)
    g = graph_from_edges(spark, edges)
    got = {r.id: (r.ball1, r.ball2) for r in ball_sizes(g).collect()}
    verts = {v for e in edges for v in e}
    assert got == _ball_ref(edges, verts)
    # triangle inequality of the neighborhood function
    assert all(b1 <= b2 for b1, b2 in got.values())


def test_ball_sizes_hub_cap_drops_relay(spark):
    # star: hub 0 relays everyone; capping below its degree makes every
    # spoke's ball2 collapse to its direct neighborhood
    edges = [(i, 0) for i in range(1, 8)]
    g = graph_from_edges(spark, edges)
    got = {r.id: (r.ball1, r.ball2) for r in ball_sizes(g, max_degree=3).collect()}
    verts = {v for e in edges for v in e}
    assert got == _ball_ref(edges, verts, max_degree=3)
    assert got[1] == (2, 2)  # hub not allowed to relay
    assert got[0] == (8, 8)  # hub itself: spokes can relay (deg 1)


# -------------------------------------------------------------------- dbscan
def _embedding_fixture(spark):
    """Three regions in 8-d: a dense cluster (cores), a second dense
    cluster, a border point attached to cluster A, and isolated noise."""
    base_a = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rows = []
    for i in range(5):  # cluster A: ids 0..4, tight around e1
        v = list(base_a)
        v[2] = 0.05 * (i + 1)
        rows.append((i, v))
    for i in range(5):  # cluster B: ids 5..9, tight around e2
        v = list(base_b)
        v[3] = 0.05 * (i + 1)
        rows.append((5 + i, v))
    # border 10: close to A's fringe only (cos ≥ 0.8 to fewer than
    # min_pts A members, so it can't be core itself)
    rows.append((10, [0.7, 0.0, 0.55, 0.0, 0.45, 0.0, 0.0, 0.0]))
    # noise 11, 12: orthogonal directions
    rows.append((11, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0]))
    rows.append((12, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]))
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _dbscan_ref(pairs, all_ids, min_pts):
    """Classic DBSCAN over a given neighbor-pair relation, with the
    engine's deterministic min-label conventions."""
    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    cores = {v for v, ns in nbrs.items() if len(ns) >= min_pts}
    # components over core-core edges (min label)
    label = {c: c for c in cores}
    changed = True
    while changed:
        changed = False
        for c in cores:
            for n in nbrs[c]:
                if n in cores and label[n] < label[c]:
                    label[c] = label[n]
                    changed = True
    out = {}
    for v in all_ids:
        if v in cores:
            out[v] = ("core", label[v])
        elif any(n in cores for n in nbrs.get(v, ())):
            out[v] = ("border", min(label[n] for n in nbrs[v] if n in cores))
        else:
            out[v] = ("noise", None)
    return out


def test_dbscan_roles_and_clusters_match_reference(spark):
    embs = _embedding_fixture(spark)
    thr, mp = 0.8, 3
    pairs = [
        (r.vec_a, r.vec_b)
        for r in embedding_near_dups(embs, threshold=thr).collect()
    ]
    want = _dbscan_ref(pairs, [r.vec_id for r in embs.collect()], mp)
    got = {
        r.vec_id: (r.role, r.cluster)
        for r in dbscan(embs, threshold=thr, min_pts=mp).collect()
    }
    assert got == want
    roles = {role for role, _ in got.values()}
    assert roles == {"core", "border", "noise"}  # fixture exercises all three
    # density semantics: A and B are separate clusters, never glued
    assert got[0][1] != got[5][1]
    assert got[11] == ("noise", None)


def test_dbscan_min_pts_gates_connectivity(spark):
    embs = _embedding_fixture(spark)
    # at min_pts high enough nothing is dense: everything noise
    got = {
        r.vec_id: (r.role, r.cluster)
        for r in dbscan(embs, threshold=0.8, min_pts=50).collect()
    }
    assert all(v == ("noise", None) for v in got.values())


def test_dbscan_every_vector_labeled_once(spark):
    embs = _embedding_fixture(spark)
    res = dbscan(embs, threshold=0.8, min_pts=3).collect()
    assert len(res) == embs.count()
    assert len({r.vec_id for r in res}) == len(res)
