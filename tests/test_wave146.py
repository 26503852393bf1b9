"""Wave-146 operators: LeaderRank (ground-node random walk) and the
Serrano-Boguñá-Vespignani disparity-filter backbone."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph, graph_from_edges, vertex_degrees
from linkgraph_spark.kernels.spectral import leaderrank
from linkgraph_spark.kernels.stats import disparity_backbone


# -------------------------------------------------------------- leaderrank
def _leaderrank_ref(edges, iters):
    verts = sorted({v for e in edges for v in e if e[0] != e[1]})
    ded = sorted({(a, b) for a, b in edges if a != b})
    n = len(verts)
    div = {v: 1 for v in verts}
    for a, _ in ded:
        div[a] += 1
    r = {v: 1.0 for v in verts}
    g = 0.0
    for _ in range(iters):
        nr = {v: g / n for v in verts}
        for a, b in ded:
            nr[b] += r[a] / div[a]
        ng = sum(r[v] / div[v] for v in verts)
        r, g = nr, ng
    return {v: r[v] + g / n for v in verts}, g


def test_leaderrank_matches_reference_and_conserves_mass(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 2), (0, 2)]
    res = leaderrank(graph_from_edges(spark, edges), iterations=10)
    want, g_final = _leaderrank_ref(edges, 10)
    got = {r.id: r.score for r in res.scores.collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # walker mass is conserved: Σ final scores = N exactly (up to fp)
    assert sum(got.values()) == pytest.approx(len(want), abs=1e-9)
    assert res.metrics[-1]["mass"] == pytest.approx(len(want), abs=1e-9)


def test_leaderrank_dangling_vertex_feeds_ground_not_lost(spark):
    # vertex 2 has no out-edges: with plain PageRank it would dangle; here
    # it sends everything to ground, which recycles it — mass stays N and
    # the hub everyone points at outranks the periphery
    edges = [(0, 2), (1, 2), (3, 2), (4, 2), (0, 1)]
    res = leaderrank(graph_from_edges(spark, edges), iterations=12)
    got = {r.id: r.score for r in res.scores.collect()}
    assert sum(got.values()) == pytest.approx(len(got), abs=1e-9)
    assert got[2] == max(got.values())
    want, _ = _leaderrank_ref(edges, 12)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_leaderrank_symmetric_pair_equal_scores(spark):
    res = leaderrank(graph_from_edges(spark, [(0, 1), (1, 0)]), iterations=8)
    got = {r.id: r.score for r in res.scores.collect()}
    assert got[0] == pytest.approx(got[1], abs=1e-12)


# ------------------------------------------------------ disparity backbone
def _wgraph(spark, wedges):
    e = spark.createDataFrame(wedges, "src long, dst long, weight long").persist()
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("actor_key", F.col("id").cast("string"))
        .persist()
    )
    d = vertex_degrees(v, e).persist()
    return LinkGraph(vertices=v, edges=e, degrees=d, num_vertices=v.count())


def _disparity_ref(wedges, alpha):
    und = {}
    for a, b, w in wedges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        und[k] = und.get(k, 0) + w
    ks, ss = {}, {}
    for (a, b), w in und.items():
        for v in (a, b):
            ks[v] = ks.get(v, 0) + 1
            ss[v] = ss.get(v, 0) + w
    out = {}
    for (a, b), w in und.items():
        pa = (1.0 - w / ss[a]) ** (ks[a] - 1)
        pb = (1.0 - w / ss[b]) ** (ks[b] - 1)
        al = round(min(pa, pb), 6)
        out[(a, b)] = (w, al, al < alpha)
    return out


def test_disparity_star_keeps_dominant_edge_only(spark):
    # hub 0 with one heavy edge (w=10) and two light ones (w=1):
    # alpha(heavy) = (1 - 10/12)^2 = 1/36 < 0.05 → kept;
    # alpha(light) = (1 - 1/12)^2 ≈ 0.84 → dropped
    wedges = [(0, 1, 10), (0, 2, 1), (0, 3, 1)]
    rows = disparity_backbone(_wgraph(spark, wedges), alpha=0.05).collect()
    got = {(r.a, r.b): (r.weight, r.alpha, r.keep) for r in rows}
    assert got[(0, 1)][2] is True
    assert got[(0, 2)][2] is False and got[(0, 3)][2] is False
    assert got[(0, 1)][1] == pytest.approx((1 - 10 / 12) ** 2, abs=1e-6)


def test_disparity_degree_one_vertices_alpha_one(spark):
    # an isolated pair: both endpoints k=1 → alpha exactly 1, never kept
    rows = disparity_backbone(_wgraph(spark, [(7, 8, 99)]), alpha=0.05).collect()
    assert len(rows) == 1
    assert rows[0].alpha == 1.0 and rows[0].keep is False


def test_disparity_matches_reference_and_sums_directions(spark):
    import random

    rng = random.Random(146)
    wedges = [
        (a, b, rng.randint(1, 20))
        for a in range(8)
        for b in range(8)
        if a != b and rng.random() < 0.3
    ]
    want = _disparity_ref(wedges, 0.1)
    rows = disparity_backbone(_wgraph(spark, wedges), alpha=0.1).collect()
    got = {(r.a, r.b): (r.weight, r.alpha, r.keep) for r in rows}
    assert set(got) == set(want)
    for k, (w, al, kp) in want.items():
        assert got[k][0] == w
        assert got[k][1] == pytest.approx(al, abs=2e-6)
        assert got[k][2] == kp


def test_disparity_requires_weighted_graph(spark):
    with pytest.raises(ValueError):
        disparity_backbone(graph_from_edges(spark, [(0, 1)]))
