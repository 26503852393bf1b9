from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels import (
    connected_components,
    label_propagation,
    triangle_count,
    triangles_per_vertex,
)
from tests.fixtures_graphs import DIRTY, STAR10, TRI3, TWO_COMPS, web64
from tests.oracles import components_oracle, labelprop_oracle, triangles_oracle

import pytest


@pytest.mark.parametrize(
    "edges", [TRI3, STAR10, TWO_COMPS, DIRTY, web64()],
    ids=["tri3", "star10", "two_comps", "dirty", "web64"],
)
def test_components_exact(spark, edges):
    g = graph_from_edges(spark, edges)
    got = {r["id"]: r["component"] for r in connected_components(g).labels.collect()}
    assert got == components_oracle(edges)
    g.unpersist()


def test_two_comps_shape(spark):
    g = graph_from_edges(spark, TWO_COMPS)
    got = {r["id"]: r["component"] for r in connected_components(g).labels.collect()}
    assert {v for k, v in got.items() if k in (0, 1, 2)} == {0}
    assert {v for k, v in got.items() if k in (10, 11, 12)} == {10}
    g.unpersist()


@pytest.mark.parametrize(
    "edges", [TRI3, STAR10, TWO_COMPS, web64()],
    ids=["tri3", "star10", "two_comps", "web64"],
)
def test_labelprop_matches_sync_oracle(spark, edges):
    g = graph_from_edges(spark, edges)
    got = {r["id"]: r["label"] for r in label_propagation(g, max_iterations=5).collect()}
    assert got == labelprop_oracle(edges, max_iters=5)
    g.unpersist()


@pytest.mark.parametrize(
    "edges,expected",
    [(TRI3, 1), (STAR10, None), (TWO_COMPS, 1), (DIRTY, 1), (web64(), None)],
    ids=["tri3", "star10", "two_comps", "dirty", "web64"],
)
def test_triangles_exact(spark, edges, expected):
    g = graph_from_edges(spark, edges)
    want = triangles_oracle(edges) if expected is None else expected
    assert triangle_count(g) == want
    g.unpersist()


def test_triangles_per_vertex(spark):
    g = graph_from_edges(spark, TRI3 + [(10, 11)])
    got = {r["id"]: r["triangles"] for r in triangles_per_vertex(g).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 10: 0, 11: 0}
    g.unpersist()


def test_components_converged_flag_trips_at_cap(spark):
    """A path graph's diameter exceeds a tiny iteration cap — the result
    must SAY so instead of silently returning split components."""
    from linkgraph_spark.kernels import connected_components_star

    path = [(i, i + 1) for i in range(20)]
    g = graph_from_edges(spark, path)
    capped = connected_components(g, max_iterations=3)
    assert capped.converged is False
    full = connected_components(g, max_iterations=50)
    assert full.converged is True
    assert {r["component"] for r in full.labels.collect()} == {0}
    # large-star/small-star: O(log n) rounds on the same diameter-20 path
    star = connected_components_star(g)
    assert star.converged is True
    assert star.iterations < 10
    got = {r["id"]: r["component"] for r in star.labels.collect()}
    assert got == {r["id"]: r["component"] for r in full.labels.collect()}
    g.unpersist()


@pytest.mark.parametrize(
    "edges", [TRI3, STAR10, TWO_COMPS, DIRTY, web64()],
    ids=["tri3", "star10", "two_comps", "dirty", "web64"],
)
def test_components_star_matches_hashmin(spark, edges):
    from linkgraph_spark.kernels import connected_components_star

    g = graph_from_edges(spark, edges)
    res = connected_components_star(g)
    assert res.converged is True
    got = {r["id"]: r["component"] for r in res.labels.collect()}
    assert got == components_oracle(edges)
    g.unpersist()


def _bfs_oracle(edges, sources, undirected=False):
    from collections import deque

    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        if undirected:
            adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


@pytest.mark.parametrize(
    "edges,directed", [(STAR10, True), (TWO_COMPS, True), (web64(), True), (web64(), False)],
    ids=["star10", "two_comps", "web64", "web64_und"],
)
def test_bfs_matches_oracle(spark, edges, directed):
    from linkgraph_spark.kernels import shortest_paths

    g = graph_from_edges(spark, edges)
    srcs = [0, 1]
    res = shortest_paths(g, sources=srcs, directed=directed)
    assert res.converged
    got = {r["id"]: r["distance"] for r in res.distances.collect()}
    dedup = {(u, v) for u, v in edges if u != v}
    assert got == _bfs_oracle(dedup, srcs, undirected=not directed)
    g.unpersist()


def test_hits_matches_numpy(spark):
    import math

    from linkgraph_spark.kernels import hits

    edges = sorted({(u, v) for u, v in web64() if u != v})
    g = graph_from_edges(spark, edges)
    ids = sorted({x for e in edges for x in e})
    hub = {i: 1.0 for i in ids}
    for _ in range(5):
        auth = {i: 0.0 for i in ids}
        for u, v in edges:
            auth[v] += hub[u]
        an = math.sqrt(sum(a * a for a in auth.values())) or 1.0
        auth = {i: a / an for i, a in auth.items()}
        hub2 = {i: 0.0 for i in ids}
        for u, v in edges:
            hub2[u] += auth[v]
        hn = math.sqrt(sum(h * h for h in hub2.values())) or 1.0
        hub = {i: h / hn for i, h in hub2.items()}
    res = hits(g, iterations=5)
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    for i in ids:
        assert abs(got[i][0] - hub[i]) < 1e-9, i
        assert abs(got[i][1] - auth[i]) < 1e-9, i
    g.unpersist()


def test_adamic_adar_matches_oracle(spark):
    import math

    from linkgraph_spark.kernels import adamic_adar

    edges = web64()
    g = graph_from_edges(spark, edges)
    adj = {}
    for u, v in {(u, v) for u, v in edges if u != v}:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    ids = sorted(adj)
    for i, x in enumerate(ids):
        for y in ids[i + 1:]:
            if y in adj[x]:
                continue
            common = adj[x] & adj[y]
            if common:
                want[(x, y)] = round(sum(1.0 / math.log(len(adj[z])) for z in common), 6)
    got = {(r["x"], r["y"]): r["score"] for r in adamic_adar(g).collect()}
    assert got == want
    # degree cap drops hub-generated wedges only
    capped = {(r["x"], r["y"]) for r in adamic_adar(g, max_degree=10).collect()}
    assert capped <= set(got)
    g.unpersist()


def test_adamic_adar_hot_hub_bounded(spark):
    """The shipped at-scale config (max_degree + top_k — what the gate and
    bench run) must bound candidate counts on a hot-hub graph: a degree-D
    hub generates ZERO wedges when D > max_degree, so output is bounded by
    the low-degree wedge mass, not C(D, 2)."""
    from linkgraph_spark.kernels import adamic_adar
    from linkgraph_spark.kernels.linkpred import link_scores

    hub_deg = 200
    edges = [(0, i) for i in range(1, hub_deg + 1)]          # hot hub 0
    edges += [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]  # clique 1-5
    g = graph_from_edges(spark, edges)

    exact_n = adamic_adar(g).count()
    assert exact_n >= hub_deg * (hub_deg - 1) // 2 - len(edges)  # hub blow-up

    capped = adamic_adar(g, max_degree=32, top_k=10).collect()
    # only the clique vertices (deg 5+1=6 ≤ 32) generate wedges; every pair
    # they produce is already an edge, so nothing survives the anti-join —
    # the hub's ~C(200,2) candidates are gone entirely
    assert len(capped) == 0
    # with a clique pair broken open, the capped path still finds it
    g.unpersist()
    edges2 = [e for e in edges if e != (1, 2)]
    g2 = graph_from_edges(spark, edges2)
    capped2 = {(r["x"], r["y"]) for r in adamic_adar(g2, max_degree=32, top_k=10).collect()}
    assert capped2 == {(1, 2)}
    ls = link_scores(g2, max_degree=32).collect()
    assert {(r["x"], r["y"]) for r in ls} == {(1, 2)}
    # top_k bounds per-vertex output
    per_x = {}
    for r in adamic_adar(g2, top_k=3).collect():
        per_x[r["x"]] = per_x.get(r["x"], 0) + 1
    assert per_x and max(per_x.values()) <= 3
    g2.unpersist()


def test_near_dup_clusters_transitive(spark):
    """A~B and B~C (no direct A~C pair needed) must collapse to ONE keeper;
    non-duplicates are singleton clusters."""
    from linkgraph_spark.functions.dedup import near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, base + " tail zero"),
        (1, base + " tail one"),   # ~0 and ~2 via shared shingles
        (2, base + " tail two"),
        (7, "completely different text about unrelated topics entirely here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["keeper_id"], r["cluster_size"])
        for r in near_dup_clusters(d, threshold=0.5).collect()
    }
    assert got[0] == (0, 3) and got[1] == (0, 3) and got[2] == (0, 3)
    assert got[7] == (7, 1)


def _kcore_oracle(edges):
    """Exact coreness by classic peeling."""
    adj = {}
    for u, v in {(u, v) for u, v in edges if u != v}:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    alive = set(adj)
    k = 0
    while alive:
        k += 1
        changed = True
        while changed:
            changed = False
            for v in [v for v in alive if deg[v] < k]:
                core[v] = k - 1
                alive.discard(v)
                for n in adj[v]:
                    if n in alive:
                        deg[n] -= 1
                changed = True
    return core


@pytest.mark.parametrize(
    "edges", [TRI3, STAR10, TWO_COMPS, web64()],
    ids=["tri3", "star10", "two_comps", "web64"],
)
def test_k_core_matches_peel(spark, edges):
    from linkgraph_spark.kernels import k_core

    g = graph_from_edges(spark, edges)
    res = k_core(g)
    assert res.converged
    got = {r["id"]: r["core"] for r in res.coreness.collect()}
    assert got == _kcore_oracle(edges)
    g.unpersist()


def test_k_core_hub_partition_bounded(spark):
    """k-core's h-index must never put a hub's whole neighborhood in one
    window partition: the phase-1 histogram (clamped at cap = √(2E)+1)
    bounds every per-vertex partition at cap+1 rows even at degree 1000."""
    import math

    from linkgraph_spark.kernels import k_core
    from linkgraph_spark.kernels.components import undirected
    from linkgraph_spark.kernels.kcore import _capped_histogram
    from pyspark.sql import functions as F

    hub_deg = 1000
    edges = [(0, i) for i in range(1, hub_deg + 1)]
    edges += [(i, i + 1) for i in range(1, 20)]  # a chain off the leaves
    g = graph_from_edges(spark, edges)

    sym = undirected(g.edges)
    n_sym = sym.count()
    cap = math.isqrt(n_sym) + 1
    assert cap < hub_deg  # the clamp actually bites on this fixture
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("core"))
    nbr = sym.join(
        deg.select(F.col("id").alias("dst"), F.col("core").alias("nbr_core")), "dst"
    ).select(F.col("src").alias("id"), "nbr_core")
    worst = (
        _capped_histogram(nbr, cap)
        .groupBy("id")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert worst <= cap + 1  # the window partition bound, degree-independent

    res = k_core(g)
    assert res.converged
    assert {r["id"]: r["core"] for r in res.coreness.collect()} == _kcore_oracle(edges)
    g.unpersist()


def test_walk_adjacency_index_two_level(spark):
    """The walk adjacency index must equal the flat per-src dst-rank while
    bounding every window partition at ~√V rows (hub-degree independent)."""
    import math

    from linkgraph_spark.kernels.walks import _indexed_adjacency
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    hub_deg = 1000
    edges = [(0, i) for i in range(1, hub_deg + 1)] + [(5, 3), (5, 900), (7, 7)]
    g = graph_from_edges(spark, edges)

    adj = _indexed_adjacency(g.edges, g.num_vertices)
    flat = g.edges.select("src", "dst").withColumn(
        "idx", F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1
    )
    key = lambda r: (r["src"], r["idx"], r["dst"])
    assert sorted(map(key, adj.collect())) == sorted(map(key, flat.collect()))

    width = math.isqrt(g.num_vertices) + 1
    worst = (
        g.edges.groupBy("src", F.floor(F.col("dst") / F.lit(width)))
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert worst <= width  # dense ids → ≤ width rows per (src, bucket)
    g.unpersist()


def test_random_walks_frees_interim_blocks(spark):
    """Long walks (>8 hops) checkpoint interim frontiers; after the corpus
    is materialized only ONE block set may remain alive (the corpus), not
    one per 8-hop truncation."""
    from linkgraph_spark.kernels import random_walks
    from linkgraph_spark.lineage import _persistent_rdd_ids, checkpoint_tracked

    g = graph_from_edges(spark, web64())
    sc = spark.sparkContext
    # baseline: how many persistent ids ONE localCheckpoint contributes
    probe, probe_ids = checkpoint_tracked(spark.range(4))
    per_ckpt = len(probe_ids)
    from linkgraph_spark.lineage import free_tracked

    free_tracked(sc, probe_ids)

    pre = _persistent_rdd_ids(sc)
    corpus = random_walks(g, walk_length=17, walks_per_vertex=1)
    assert corpus.count() > 0
    leaked = _persistent_rdd_ids(sc) - pre
    assert len(leaked) <= per_ckpt  # the corpus itself; interims freed
    g.unpersist()


def test_random_walks_deterministic_and_valid(spark):
    from linkgraph_spark.kernels import random_walks

    edges = web64()
    g = graph_from_edges(spark, edges)
    rows = random_walks(g, walk_length=3, walks_per_vertex=2).collect()
    again = random_walks(g, walk_length=3, walks_per_vertex=2).collect()
    key = lambda r: (r["walk_id"], r["step"], r["vertex"])
    assert sorted(map(key, rows)) == sorted(map(key, again))  # deterministic
    eset = {(u, v) for u, v in edges if u != v}
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    n_moves = 0
    for w, steps in walks.items():
        assert 0 in steps
        for s in range(1, max(steps) + 1):
            assert (steps[s - 1], steps[s]) in eset  # every hop is a real edge
            n_moves += 1
    assert n_moves > 0
    g.unpersist()


def test_sssp_weighted_matches_oracle(spark):
    import heapq

    from linkgraph_spark.edges import LinkGraph, vertex_degrees
    from linkgraph_spark.kernels import shortest_paths_weighted
    from pyspark.sql import functions as F

    wedges = [(0, 1, 1), (1, 2, 5), (0, 2, 10), (2, 3, 1), (0, 3, 20), (4, 5, 2)]
    e = spark.createDataFrame(wedges, "src long, dst long, weight long").persist()
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("actor_key", F.col("id").cast("string"))
        .persist()
    )
    d = vertex_degrees(v, e).persist()
    g = LinkGraph(vertices=v, edges=e, degrees=d, num_vertices=v.count())
    res = shortest_paths_weighted(g, sources=[0])
    assert res.converged
    got = {r["id"]: r["distance"] for r in res.distances.collect()}
    # dijkstra oracle
    adj = {}
    for u, vv, w in wedges:
        adj.setdefault(u, []).append((vv, w))
    dist = {0: 0}
    pq = [(0, 0)]
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, 1 << 60):
            continue
        for vv, w in adj.get(u, ()):
            nd = dd + w
            if nd < dist.get(vv, 1 << 60):
                dist[vv] = nd
                heapq.heappush(pq, (nd, vv))
    assert got == dist
    g.unpersist()


def test_weighted_labelprop_weights_decide(spark):
    """Vertex 0's single HEAVY neighbor (label 9, weight 10) must outvote
    its two unit-weight neighbors (labels 1, 2) under weighted LPA, while
    unweighted LPA sees three equal votes and tie-breaks to the SMALLEST
    label — the two modes must disagree on this fixture."""
    from linkgraph_spark.edges import LinkGraph, vertex_degrees
    from pyspark.sql import functions as F

    wedges = [(0, 9, 10), (0, 1, 1), (0, 2, 1)]
    e = spark.createDataFrame(wedges, "src long, dst long, weight long").persist()
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("actor_key", F.col("id").cast("string"))
        .persist()
    )
    d = vertex_degrees(v, e).persist()
    g = LinkGraph(vertices=v, edges=e, degrees=d, num_vertices=v.count())
    w1 = {r["id"]: r["label"] for r in label_propagation(g, 1, weighted=True).collect()}
    u1 = {r["id"]: r["label"] for r in label_propagation(g, 1).collect()}
    assert w1[0] == 9  # the weight-10 vote wins
    assert u1[0] == 1  # three equal votes → smallest label
    g.unpersist()


def test_clustering_coefficient_closed_form(spark):
    from linkgraph_spark.kernels.triangles import clustering_coefficient

    # triangle 0-1-2 with a pendant 3 off vertex 2
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    got = {r["id"]: r["lcc"] for r in clustering_coefficient(g).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: round(2 * 1 / (3 * 2), 6), 3: 0.0}
    g.unpersist()


def test_subgraph_and_ego(spark):
    from pyspark.sql import functions as F

    from linkgraph_spark.kernels import connected_components, ego_graph, induced_subgraph

    # hub 0 — ring 1..6 — pendant chain 7-8-9 off vertex 3
    edges = [(0, i) for i in (1, 3, 5)] + [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1), (3, 7), (7, 8), (8, 9),
    ]
    g = graph_from_edges(spark, edges)

    sub = induced_subgraph(g, F.col("out_deg") >= 2)
    kept = {r["id"] for r in sub.vertices.collect()}
    # out_deg >= 2: only 0 (3 out) and 3 (4,7) and others with 2+ out-edges
    want_kept = set()
    outd = {}
    dedup = {(u, v) for u, v in edges if u != v}
    for u, v in dedup:
        outd[u] = outd.get(u, 0) + 1
    want_kept = {u for u, d in outd.items() if d >= 2} & {
        x for e in dedup for x in e
    }
    assert kept == want_kept
    got_edges = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    assert got_edges == {(u, v) for u, v in dedup if u in kept and v in kept}
    # kernels compose with the sliced graph unchanged
    assert connected_components(sub).converged
    sub.unpersist()

    ego = ego_graph(g, sources=[9], k=2)  # undirected 2 hops from the tail
    ids = {r["id"] for r in ego.vertices.collect()}
    assert ids == {9, 8, 7}  # hops: 8 at 1, 7 at 2 (3 is at hop 3 — excluded)
    ego_edges = {(r["src"], r["dst"]) for r in ego.edges.collect()}
    assert ego_edges == {(7, 8), (8, 9)}  # induced, original direction
    ego.unpersist()
    g.unpersist()


def test_reciprocity_and_assortativity_closed_form(spark):
    from linkgraph_spark.kernels import degree_assortativity, reciprocity

    # 4 distinct non-loop edges; exactly the 0<->1 pair is mutual (2 of 4)
    g = graph_from_edges(spark, [(0, 1), (1, 0), (1, 2), (2, 3), (3, 3), (1, 2)])
    assert reciprocity(g).collect()[0]["reciprocity"] == 0.5
    # star 0-1, 0-2, 0-3: perfectly disassortative, r = -1
    star = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3)])
    got = degree_assortativity(star).collect()[0]["assortativity"]
    assert got == -1.0
    # single edge: degrees constant -> corr undefined -> NULL
    one = graph_from_edges(spark, [(0, 1)])
    assert degree_assortativity(one).collect()[0]["assortativity"] is None
    assert reciprocity(one).collect()[0]["reciprocity"] == 0.0
    for gg in (g, star, one):
        gg.unpersist()


def test_k_truss_closed_form(spark):
    from linkgraph_spark.kernels import edge_support, k_truss

    # two triangles sharing edge (1,2), plus a pendant edge (3,4)
    g = graph_from_edges(
        spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]
    )
    sup = {(r["a"], r["b"]): r["support"] for r in edge_support(g).collect()}
    assert sup == {
        (0, 1): 1, (0, 2): 1, (1, 2): 2, (1, 3): 1, (2, 3): 1, (3, 4): 0,
    }
    t3 = k_truss(g, k=3)
    assert t3.converged
    got = {(r["a"], r["b"]) for r in t3.edges.collect()}
    assert got == {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)}  # pendant peeled
    # k=4 needs support >= 2: only (1,2) qualifies round 1, then its own
    # triangles vanish -> cascading peel empties the truss (converged)
    t4 = k_truss(g, k=4)
    assert t4.converged and t4.edges.count() == 0
    assert t4.iterations >= 2  # the cascade took more than one round

    # a 4-clique IS a 4-truss: every edge in 2 triangles, fixpoint round 1
    from itertools import combinations

    k4 = graph_from_edges(spark, list(combinations(range(4), 2)))
    r = k_truss(k4, k=4)
    assert r.converged and r.edges.count() == 6
    assert all(row["support"] == 2 for row in r.edges.collect())
    for gg in (g, k4):
        gg.unpersist()


def test_harmonic_landmarks_closed_form(spark):
    from linkgraph_spark.kernels import harmonic_landmarks

    # path 0-1-2-3-4: harmonic(0) at k=4 = 1 + 1/2 + 1/3 + 1/4;
    # harmonic(2) = 2*(1 + 1/2)
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_landmarks(g, landmarks=[0, 2], k=4).collect()
    }
    assert got == {0: round(1 + 1 / 2 + 1 / 3 + 1 / 4, 6), 2: 3.0}
    # truncation: k=1 sees only direct neighbors
    got1 = {
        r["id"]: r["harmonic"]
        for r in harmonic_landmarks(g, landmarks=[0, 2], k=1).collect()
    }
    assert got1 == {0: 1.0, 2: 2.0}
    g.unpersist()


def test_hyperball_matches_exact_bfs(spark):
    from linkgraph_spark.kernels import hyperball

    # two rings joined by a bridge — every ball size is hand-computable,
    # and at these cardinalities the DataSketches HLL is still exact
    edges = (
        [(i, (i + 1) % 6) for i in range(6)]
        + [(6 + i, 6 + (i + 1) % 6) for i in range(6)]
        + [(0, 6)]
    )
    g = graph_from_edges(spark, edges)

    # exact truncated harmonic via python BFS
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    import collections

    def exact_harmonic(src, max_r):
        dist = {src: 0}
        q = collections.deque([src])
        while q:
            x = q.popleft()
            if dist[x] >= max_r:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        return sum(1.0 / d for d in dist.values() if d >= 1)

    res = hyperball(g, max_r=8)
    assert res.converged
    got = {r["id"]: (r["ball_est"], r["harmonic_est"]) for r in res.centrality.collect()}
    for v in adj:
        ball, harm = got[v]
        assert ball == 12.0  # connected: every ball saturates at |V|
        assert abs(harm - exact_harmonic(v, 8)) < 0.02, (v, harm)
    g.unpersist()


def _tarjan_scc(edges, vertices):
    """Iterative Tarjan; returns {vertex: min id of its SCC}."""
    adj = {v: [] for v in vertices}
    for u, v in edges:
        if u != v:
            adj[u].append(v)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]
    for root in vertices:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
    return comp


def test_scc_closed_form_and_random(spark):
    from linkgraph_spark.kernels import strongly_connected_components

    # 2-cycle + 3-cycle bridged one-way + a DAG tail
    edges = [
        (0, 1), (1, 0),            # SCC {0,1}
        (1, 2),                    # one-way bridge
        (2, 3), (3, 4), (4, 2),    # SCC {2,3,4}
        (4, 5), (5, 6),            # DAG tail: singletons
    ]
    g = graph_from_edges(spark, edges)
    res = strongly_connected_components(g)
    assert res.converged
    got = {r["id"]: r["scc"] for r in res.labels.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 2, 5: 5, 6: 6}
    g.unpersist()

    # randomized cross-check vs Tarjan (fixed seeds, cyclic-ish graphs)
    import random

    for seed in (7, 41):
        rng = random.Random(seed)
        n = 40
        redges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
        rg = graph_from_edges(spark, redges)
        want = _tarjan_scc(redges, {x for e in redges for x in e})
        rres = strongly_connected_components(rg)
        assert rres.converged
        rgot = {r["id"]: r["scc"] for r in rres.labels.collect()}
        assert rgot == want, (seed, rres.rounds)
        rg.unpersist()


def test_effective_diameter_ring(spark):
    from linkgraph_spark.kernels import effective_diameter

    # ring of 12: N(r) = 12(1+2r) for r<=5, N(6)=144; q=0.9 target 129.6
    # falls between N(4)=108 and N(5)=132 -> 4 + 21.6/24 = 4.9 exactly
    # (HLL is exact at these cardinalities)
    g = graph_from_edges(spark, [(i, (i + 1) % 12) for i in range(12)])
    assert abs(effective_diameter(g, q=0.9) - 4.9) < 0.05
    g.unpersist()


def test_mis_equals_greedy_by_priority(spark):
    """With unique deterministic priorities the Luby fixpoint IS the
    sequential greedy MIS in ascending-priority order — checked exactly,
    plus independence + maximality, on the random web graph."""
    from linkgraph_spark.kernels import maximal_independent_set
    from linkgraph_spark.kernels.mis import MIS_A, MIS_B, MIS_P

    edges = web64(n=50)
    ids = sorted({v for e in edges for v in e})
    adj: dict = {v: set() for v in ids}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    pr = {
        v: f"{(MIS_A * (v % MIS_P) + MIS_B) % MIS_P:010d}-{v:019d}" for v in ids
    }
    assert len(set(pr.values())) == len(ids)  # id suffix: unique
    mis, blocked = set(), set()
    for v in sorted(ids, key=lambda x: pr[x]):
        if v not in blocked:
            mis.add(v)
            blocked |= adj[v]
    g = graph_from_edges(spark, edges)
    res = maximal_independent_set(g, max_iterations=20)
    assert res.converged
    got = {r["id"]: r["status"] for r in res.labels.collect()}
    assert {v for v, s in got.items() if s == "in"} == mis
    assert all(s in ("in", "out") for s in got.values())
    # independence + maximality straight from the graph
    for s, d in edges:
        assert not (got.get(s) == "in" and got.get(d) == "in" and s != d)
    for v in ids:
        if got[v] == "out":
            assert any(got[u] == "in" for u in adj[v])
    g.unpersist()


def test_temporal_components_window_locality(spark):
    """Components are per-window: chains connected only across different
    windows must NOT merge, and a vertex appears once per window it is
    active in, labeled by that window's min member."""
    from linkgraph_spark.edges import LinkGraph, vertex_degrees
    from linkgraph_spark.kernels.temporal import temporal_components

    verts = spark.createDataFrame(
        [(i, f"a{i}") for i in range(6)], "id long, actor_key string"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (2, 3)], "src long, dst long"
    )
    g = LinkGraph(
        vertices=verts, edges=edges,
        degrees=vertex_degrees(verts, edges), num_vertices=6,
    )
    W = 100
    # window 0: 0-1-2 chain and 3-4; the 2-3 bridge happens in window 1
    te = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 50), (3, 4, 99), (2, 3, 150), (0, 1, 160)],
        "src long, dst long, ts long",
    )
    got = {
        (r["window_start"], r["id"]): r["component"]
        for r in temporal_components(g, te, window_sec=W).collect()
    }
    assert got == {
        (0, 0): 0, (0, 1): 0, (0, 2): 0,  # chain merged within window 0
        (0, 3): 3, (0, 4): 3,  # separate cluster, NOT merged via window-1 bridge
        (100, 2): 2, (100, 3): 2,  # the bridge's own window
        (100, 0): 0, (100, 1): 0,
    }


def test_densest_subgraph_replay_and_planted_clique(spark):
    """Exact python replay of the (1+eps)-peel on the web graph, then a
    planted K8 clique in path noise must survive into the best set."""
    from linkgraph_spark.kernels import densest_subgraph

    eps = 0.5
    edges = web64(n=40)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    ids = sorted({v for e in canon for v in e})
    removed: dict = {}
    live = set(canon)
    surv = set(ids)
    rhos = []
    it = 0
    while surv:
        it += 1
        deg = {v: 0 for v in surv}
        for a, b in live:
            deg[a] += 1
            deg[b] += 1
        rho = len(live) / len(surv)
        rhos.append(rho)
        thresh = 2 * (1 + eps) * rho
        peel = {v for v in surv if deg[v] <= thresh}
        for v in peel:
            removed[v] = it
        surv -= peel
        live = {(a, b) for a, b in live if a not in peel and b not in peel}
    best_round = max(range(len(rhos)), key=lambda i: (rhos[i], -i)) + 1
    g = graph_from_edges(spark, edges)
    res = densest_subgraph(g, epsilon=eps, max_iterations=60)
    assert res.converged and res.iterations == it
    got = {r["id"]: r["removed_round"] for r in res.peel_rounds.collect()}
    assert got == removed
    assert res.best_round == best_round
    assert abs(res.best_density - max(rhos)) < 1e-9
    want_best = {v for v, r in removed.items() if r >= best_round}
    assert {r["id"] for r in res.densest_vertices.collect()} == want_best
    g.unpersist()

    # planted clique: K8 on 100..107 + a long path of noise
    clique = [(a, b) for a in range(100, 108) for b in range(a + 1, 108)]
    noise = [(i, i + 1) for i in range(60)]
    g2 = graph_from_edges(spark, clique + noise)
    res2 = densest_subgraph(g2, epsilon=0.5, max_iterations=60)
    dense = {r["id"] for r in res2.densest_vertices.collect()}
    assert set(range(100, 108)) <= dense
    assert res2.best_density >= 3.5 / 3  # within 2(1+eps) of the K8 density
    g2.unpersist()


def test_matching_equals_sequential_greedy(spark):
    """Local-min rounds with a total edge order == sequential greedy
    matching in ascending-key order; plus validity (no shared endpoint)
    and maximality (every live edge touches a matched vertex)."""
    import hashlib

    from linkgraph_spark.kernels import maximal_matching

    edges = web64(n=50)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})

    def key(a, b):
        h = int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:15], 16)
        return (f"{h:019d}", f"{a:012d}", f"{b:012d}")

    used: set = set()
    want: set = set()
    for a, b in sorted(canon, key=lambda e: key(*e)):
        if a not in used and b not in used:
            want.add((a, b))
            used |= {a, b}
    g = graph_from_edges(spark, edges)
    res = maximal_matching(g, max_iterations=20)
    assert res.converged
    got = {(r["a"], r["b"]) for r in res.matching.collect()}
    assert got == want
    seen: set = set()
    for a, b in got:
        assert a not in seen and b not in seen  # valid matching
        seen |= {a, b}
    for a, b in canon:  # maximal: no augmentable edge left
        assert a in seen or b in seen
    g.unpersist()


def test_vertex_cover_raises_when_matching_not_maximal(spark):
    """The 2-approx bound only holds over a MAXIMAL matching — a starved
    round budget must raise, never emit a non-covering set."""
    import pytest

    from linkgraph_spark.kernels import vertex_cover

    # long path needs several local-min rounds; 1 round can't finish it
    g = graph_from_edges(spark, [(i, i + 1) for i in range(64)])
    with pytest.raises(RuntimeError, match="maximal"):
        vertex_cover(g, max_iterations=1)
    cover = {r["id"] for r in vertex_cover(g, max_iterations=20).collect()}
    for i in range(64):
        assert i in cover or i + 1 in cover  # every edge covered
    g.unpersist()


def test_coloring_equals_sequential_greedy(spark):
    """Jones-Plassmann with unique priorities == sequential greedy coloring
    in decreasing-priority order; plus properness (no edge monochromatic)
    and the greedy bound (colors <= max degree + 1)."""
    from linkgraph_spark.kernels import greedy_coloring
    from linkgraph_spark.kernels.mis import MIS_A, MIS_B, MIS_P

    edges = web64(n=50)
    ids = sorted({v for e in edges for v in e})
    adj: dict = {v: set() for v in ids}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    pr = {
        v: f"{(MIS_A * (v % MIS_P) + MIS_B) % MIS_P:010d}-{v:019d}" for v in ids
    }
    want: dict = {}
    for v in sorted(ids, key=lambda x: pr[x], reverse=True):  # decreasing
        used = {want[u] for u in adj[v] if u in want}
        c = 0
        while c in used:
            c += 1
        want[v] = c
    g = graph_from_edges(spark, edges)
    res = greedy_coloring(g, max_iterations=40)
    assert res.converged
    got = {r["id"]: r["color"] for r in res.colors.collect()}
    assert got == want
    for s, d in edges:
        if s != d:
            assert got[s] != got[d]
    assert max(got.values()) <= max(len(adj[v]) for v in ids)
    g.unpersist()


def test_katz_matches_pure_python(spark):
    """Katz recurrence x_k = β + α Σ_in x_{k-1} against a dict-based
    replay on the random web graph."""
    from linkgraph_spark.kernels import katz

    edges = web64(n=30)
    alpha, beta, iters = 0.05, 1.0, 4
    ids = sorted({v for e in edges for v in e})
    x = {v: beta for v in ids}
    for _ in range(iters):
        nxt = {v: beta for v in ids}
        for s, d in edges:
            nxt[d] += alpha * x[s]
        x = nxt
    g = graph_from_edges(spark, edges)
    res = katz(g, iterations=iters, alpha=alpha, beta=beta)
    got = {r["id"]: r["katz"] for r in res.scores.collect()}
    assert set(got) == set(x)
    assert all(abs(got[v] - x[v]) < 1e-9 for v in x)
    assert len(res.metrics) == iters
    # mass metric rides the plan: equals the sum of the final scores at k
    assert abs(res.metrics[-1]["mass"] - sum(x.values())) < 1e-6
    g.unpersist()


def test_closeness_and_double_sweep_path_graph(spark):
    """Closed forms on the 0-1-2-3-4 path: truncated closeness of an end
    vertex, and the double sweep finding the true diameter from a middle
    seed."""
    from linkgraph_spark.kernels import closeness_landmarks, double_sweep_diameter

    g = graph_from_edges(spark, [(i, i + 1) for i in range(4)])
    # landmark 0, k=3: reaches d=1,2,3 -> n=3, sum=6, closeness 0.5
    # landmark 2 (middle), k=3: d=1,1,2,2 -> n=4, sum=6, closeness 2/3
    got = {
        r["id"]: (r["n_reached"], r["closeness"])
        for r in closeness_landmarks(g, landmarks=[0, 2], k=3).collect()
    }
    assert got[0] == (3, 0.5)
    assert got[2] == (4, round(4 / 6, 6))
    # seed middle (2): farthest is 0 (d=2, min-id tie-break over 4); BFS
    # from 0 reaches 4 at d=4 = the true diameter
    (row,) = double_sweep_diameter(g, seed=2, k=8).collect()
    assert (row["far_id"], row["diameter_lb"]) == (0, 4)
    g.unpersist()


def test_effective_diameter_rejects_resumed_sweep(spark):
    """A checkpoint-resumed HyperBall run's metrics start mid-sweep; feeding
    it to effective_diameter would misalign the N(r) radii, so it must be
    refused loudly."""
    import pytest

    from linkgraph_spark.kernels import effective_diameter
    from linkgraph_spark.kernels.centrality import HyperBallResult

    g = graph_from_edges(spark, [(i, (i + 1) % 6) for i in range(6)])
    resumed = HyperBallResult(
        centrality=None,
        iterations=4,
        converged=True,
        metrics=[{"iteration": 3, "grew": 1, "nf": 30.0}],
        start_radius=2,
    )
    with pytest.raises(ValueError, match="FRESH"):
        effective_diameter(g, result=resumed)
    g.unpersist()


def test_effective_diameter_landmarks_ring_and_brute(spark):
    """Exact landmark-sample effective diameter: closed form on the ring,
    then pure-python BFS parity on the random web graph."""
    from collections import deque

    from linkgraph_spark.kernels import effective_diameter_landmarks

    # ring of 12, ALL vertices as landmarks, k=6: identical N(r) curve to
    # the hyperball test -> exactly 4.9
    ring = [(i, (i + 1) % 12) for i in range(12)]
    g = graph_from_edges(spark, ring)
    (row,) = effective_diameter_landmarks(
        g, landmarks=list(range(12)), k=6, q=0.9
    ).collect()
    assert abs(row["effective_diameter"] - 4.9) < 1e-6
    g.unpersist()

    edges = web64(n=40)
    lms, k, q = [0, 3, 7, 11], 5, 0.9
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    dists = []
    for lm in lms:
        dd = {lm: 0}
        dq = deque([lm])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, ()):
                if v not in dd:
                    dd[v] = dd[u] + 1
                    dq.append(v)
        dists += [x for x in dd.values() if x <= k]
    nf = [sum(1 for x in dists if x <= r) for r in range(k + 1)]
    target = q * nf[-1]
    want = 0.0
    for r in range(k + 1):
        if nf[r] >= target:
            want = (
                0.0
                if r == 0
                else (
                    float(r)
                    if nf[r] == nf[r - 1]
                    else round((r - 1) + (target - nf[r - 1]) / (nf[r] - nf[r - 1]), 6)
                )
            )
            break
    g2 = graph_from_edges(spark, edges)
    (row2,) = effective_diameter_landmarks(g2, landmarks=lms, k=k, q=q).collect()
    assert abs(row2["effective_diameter"] - want) < 1e-6
    g2.unpersist()


def test_shared_tool_affinity_closed_form(spark):
    from linkgraph_spark.edges import LinkGraph, vertex_degrees
    from linkgraph_spark.kernels import shared_tool_affinity
    from pyspark.sql import functions as F

    verts = spark.createDataFrame(
        [(0, "c0#user"), (1, "c1#user"), (2, "c2#user"),
         (10, "tool:a"), (11, "tool:b")],
        "id long, actor_key string",
    )
    # users 0,1 share tools a+b; user 2 only a; duplicate invocations dedup
    edges = spark.createDataFrame(
        [(0, 10), (0, 10), (1, 10), (2, 10), (0, 11), (1, 11)],
        "src long, dst long",
    )
    g = LinkGraph(
        vertices=verts, edges=edges,
        degrees=vertex_degrees(verts, edges), num_vertices=5,
    )
    got = {
        (r["a"], r["b"]): r["shared_tools"]
        for r in shared_tool_affinity(g).collect()
    }
    assert got == {(0, 1): 2, (0, 2): 1, (1, 2): 1}
    # min_shared filters; hub cap drops tool:a (3 users > 2)
    got2 = {
        (r["a"], r["b"]): r["shared_tools"]
        for r in shared_tool_affinity(g, min_shared=2).collect()
    }
    assert got2 == {(0, 1): 2}
    got3 = {
        (r["a"], r["b"]): r["shared_tools"]
        for r in shared_tool_affinity(g, max_tool_users=2).collect()
    }
    assert got3 == {(0, 1): 1}


def test_modularity_closed_form(spark):
    from linkgraph_spark.kernels import modularity

    # two triangles bridged by (2,3): communities = the triangles
    # m=7, m_c=3 each, d_c=7 each -> Q = 2*(3/7 - (7/14)^2) = 0.357143
    g = graph_from_edges(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )
    labels = spark.createDataFrame(
        [(i, 0) for i in (0, 1, 2)] + [(i, 1) for i in (3, 4, 5)],
        "id long, label long",
    )
    got = modularity(g, labels).collect()[0]["modularity"]
    assert got == round(2 * (3 / 7 - 0.25), 6)
    # everything in one community: Q = 1 - 1 = ... m_c=m, d_c=2m -> 0.0
    one = labels.selectExpr("id", "0 AS label")
    assert modularity(g, one).collect()[0]["modularity"] == 0.0
    g.unpersist()


def _brandes(edges, vertices, sources, directed=False):
    """Pure-python Brandes dependency sums over the given sources."""
    import collections

    adj = {v: set() for v in vertices}
    for u, v in edges:
        if u == v:
            continue
        adj[u].add(v)
        if not directed:
            adj[v].add(u)
    bc = {v: 0.0 for v in vertices}
    for s in sources:
        sigma = {s: 1.0}
        dist = {s: 0}
        preds = collections.defaultdict(list)
        order = []
        q = collections.deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_matches_brandes(spark):
    from linkgraph_spark.kernels import betweenness

    # path graph: the classic closed form
    path = [(i, i + 1) for i in range(5)]
    g = graph_from_edges(spark, path)
    verts = set(range(6))
    res = betweenness(g, sources=sorted(verts))
    assert res.converged
    want = _brandes(path, verts, sorted(verts))
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    assert got.keys() == want.keys()
    assert all(abs(got[v] - want[v]) < 1e-5 for v in verts)
    g.unpersist()

    import random

    for seed, directed in ((3, False), (11, True)):
        rng = random.Random(seed)
        n = 30
        redges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
        rverts = {x for e in redges for x in e}
        srcs = sorted(rverts)[:8]
        rg = graph_from_edges(spark, redges)
        rres = betweenness(rg, sources=srcs, directed=directed)
        assert rres.converged
        rwant = _brandes(redges, rverts, srcs, directed=directed)
        rgot = {r["id"]: r["betweenness"] for r in rres.scores.collect()}
        assert all(abs(rgot[v] - rwant[v]) < 1e-5 for v in rverts), (seed, directed)
        rg.unpersist()


def test_skipgram_pairs_closed_form(spark):
    from linkgraph_spark.kernels import skipgram_pairs

    # one walk 10->11->12, window 1: adjacent pairs only, both directions
    corpus = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 11), (0, 2, 12)],
        "walk_id long, step long, vertex long",
    )
    got = {
        (r["center"], r["context"]): r["n"]
        for r in skipgram_pairs(corpus, window=1).collect()
    }
    assert got == {(10, 11): 1, (11, 10): 1, (11, 12): 1, (12, 11): 1}
    # window 2 adds the distance-2 pair both ways
    got2 = {
        (r["center"], r["context"]): r["n"]
        for r in skipgram_pairs(corpus, window=2).collect()
    }
    assert got2 == {**got, (10, 12): 1, (12, 10): 1}


def test_node2vec_python_replay(spark):
    import hashlib

    from linkgraph_spark.kernels import node2vec_walks

    edges = [
        (0, 1), (1, 0), (1, 2), (2, 3), (3, 1), (0, 3), (3, 4), (4, 0), (2, 0),
    ]
    g = graph_from_edges(spark, edges)
    wb, wc, wf = 1, 2, 4
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in node2vec_walks(
            g, walk_length=5, w_back=wb, w_common=wc, w_forward=wf
        ).collect()
    }

    adj = {}
    memb = set(edges)
    for u, v in sorted(set(edges)):
        adj.setdefault(u, []).append(v)
    want = {}
    for start in {x for e in edges for x in e}:
        prev = cur = start
        want[(start, 0)] = start
        for s in range(1, 6):
            cands = adj.get(cur, [])
            if not cands:
                break
            ws = [
                wb if x == prev else (wc if (prev, x) in memb else wf)
                for x in cands
            ]
            h = int(hashlib.md5(f"{start}_{s}".encode()).hexdigest()[:15], 16)
            r = h % sum(ws)
            acc = 0
            for x, w in zip(cands, ws):
                acc += w
                if r < acc:
                    prev, cur = cur, x
                    break
            want[(start, s)] = cur
    assert got == want
    g.unpersist()


def test_temporal_reachability_respects_time(spark):
    from linkgraph_spark.kernels import temporal_reachability

    # static path 0->1->2 exists, but the 1->2 edge happened BEFORE the
    # walk arrives at 1 — temporally unreachable; 1->3 (later) is fine
    g = graph_from_edges(spark, [(0, 1), (1, 2), (1, 3)])
    te = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 5), (1, 3, 20)], "src long, dst long, ts long"
    )
    res = temporal_reachability(g, te, sources=[0])
    assert res.converged
    got = {r["id"]: r["arrival"] for r in res.arrivals.collect()}
    assert got == {0: -1, 1: 10, 3: 20}  # 2 absent: time-respecting only
    # earliest arrival picks the min feasible ts among parallel edges
    te2 = spark.createDataFrame(
        [(0, 1, 10), (0, 1, 7), (1, 3, 20)], "src long, dst long, ts long"
    )
    got2 = {
        r["id"]: r["arrival"]
        for r in temporal_reachability(g, te2, sources=[0]).arrivals.collect()
    }
    assert got2[1] == 7
    g.unpersist()


def test_components_warm_start_incremental(spark):
    from linkgraph_spark.kernels import connected_components

    # long chain: cold convergence needs ~diameter supersteps
    chain = [(i, i + 1) for i in range(40)]
    g = graph_from_edges(spark, chain)
    cold = connected_components(g)
    assert cold.converged and cold.iterations > 10

    # additions-only delta: a new vertex + a bridge edge; warm start
    # re-converges in a couple of rounds and matches the cold labels
    g2 = graph_from_edges(spark, chain + [(40, 41), (5, 41)])
    cold2 = connected_components(g2)
    warm2 = connected_components(g2, init_labels=cold.labels)
    assert warm2.converged
    assert warm2.iterations < cold2.iterations
    a = {r["id"]: r["component"] for r in cold2.labels.collect()}
    b = {r["id"]: r["component"] for r in warm2.labels.collect()}
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError):
        connected_components(g, init_labels=cold.labels, resume=True)
    for gg in (g, g2):
        gg.unpersist()


def test_labelprop_warm_start_state_equivalence(spark):
    """Sync LPA is a deterministic function of the label state, so
    warm-starting from the state after k0 iterations and running k more
    MUST equal a cold run of k0+k — the exact semantic a nightly
    incremental community job relies on. Unknown/new ids in the init
    default to their own label."""
    from linkgraph_spark.kernels import label_propagation

    edges = web64(n=40)
    g = graph_from_edges(spark, edges)
    after3 = label_propagation(g, max_iterations=3)
    warm = label_propagation(g, max_iterations=2, init_labels=after3)
    cold5 = label_propagation(g, max_iterations=5)
    assert {(r["id"], r["label"]) for r in warm.collect()} == {
        (r["id"], r["label"]) for r in cold5.collect()
    }
    # additions-only delta: new vertex bridges in, defaults to own label
    g2 = graph_from_edges(spark, edges + [(0, 999)])
    warm2 = label_propagation(g2, max_iterations=1, init_labels=after3)
    got = {r["id"]: r["label"] for r in warm2.collect()}
    assert 999 in got  # covered despite being absent from init
    g.unpersist()
    g2.unpersist()


def test_conductance_closed_form(spark):
    from linkgraph_spark.kernels import conductance

    # two triangles bridged by (2,3): m=7; each community vol=7, cut=1
    # -> phi = 1/7 for both
    g = graph_from_edges(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )
    labels = spark.createDataFrame(
        [(i, 0) for i in (0, 1, 2)] + [(i, 1) for i in (3, 4, 5)],
        "id long, label long",
    )
    got = {r["community"]: r["conductance"] for r in conductance(g, labels).collect()}
    assert got == {0: round(1 / 7, 6), 1: round(1 / 7, 6)}
    # one community covering everything: complement empty -> NULL
    one = labels.selectExpr("id", "0 AS label")
    assert conductance(g, one).collect()[0]["conductance"] is None
    g.unpersist()


def test_eccentricity_landmarks_closed_form(spark):
    from linkgraph_spark.kernels import eccentricity_landmarks

    # path 0-1-2-3-4: ecc(0)=4 at k=4, truncates to 2 at k=2; ecc(2)=2
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {
        r["id"]: r["eccentricity"]
        for r in eccentricity_landmarks(g, landmarks=[0, 2], k=4).collect()
    }
    assert got == {0: 4, 2: 2}
    got2 = {
        r["id"]: r["eccentricity"]
        for r in eccentricity_landmarks(g, landmarks=[0], k=2).collect()
    }
    assert got2 == {0: 2}
    g.unpersist()


def test_k_core_warm_start_deletions(spark):
    """Warm-start contract: after a deletions-only change, yesterday's
    coreness is a pointwise UPPER bound on today's, so k_core(init_coreness=
    yesterday) must land on the exact cold-run coreness in fewer h-index
    rounds (the estimates start sandwiched between coreness and degree)."""
    from linkgraph_spark.kernels import k_core

    e1 = web64(96, 4)
    g1 = graph_from_edges(spark, e1)
    cold1 = k_core(g1)
    assert cold1.converged

    # warm start on the SAME graph: already the fixpoint — one probe round
    warm_same = k_core(g1, init_coreness=cold1.coreness)
    assert warm_same.converged and warm_same.iterations == 1
    assert {tuple(r) for r in warm_same.coreness.collect()} == {
        tuple(r) for r in cold1.coreness.collect()
    }

    # deletions-only day-2 graph: drop every 5th edge
    e2 = [e for i, e in enumerate(e1) if i % 5 != 0]
    g2 = graph_from_edges(spark, e2)
    cold2 = k_core(g2)
    warm2 = k_core(g2, init_coreness=cold1.coreness)
    assert cold2.converged and warm2.converged
    a = {r["id"]: r["core"] for r in cold2.coreness.collect()}
    b = {r["id"]: r["core"] for r in warm2.coreness.collect()}
    assert a == b == _kcore_oracle(e2)  # exact same fixpoint
    assert warm2.iterations <= cold2.iterations  # head start never hurts
    g1.unpersist()
    g2.unpersist()


def test_directed_triangle_census(spark):
    from linkgraph_spark.kernels.triangles import directed_triangle_census

    # TRI3 is the directed 3-cycle 0->1->2->0
    g = graph_from_edges(spark, TRI3)
    (r,) = directed_triangle_census(g).collect()
    assert (r["cyclic"], r["transitive"]) == (1, 0)
    g.unpersist()

    # transitive triad + a reciprocal pair that closes NO new triangle
    g2 = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 3)])
    (r2,) = directed_triangle_census(g2).collect()
    assert (r2["cyclic"], r2["transitive"]) == (0, 1)
    g2.unpersist()


def test_rich_club_star(spark):
    from linkgraph_spark.kernels.stats import rich_club

    # STAR10's undirected simple graph: hub 0 with 9 spokes
    g = graph_from_edges(spark, STAR10)
    got = {r["k"]: r for r in rich_club(g, ks=[0, 1, 8]).collect()}
    # k=0: everyone is rich -> the whole graph: 10 vertices, 9 edges
    assert (got[0]["n_rich"], got[0]["e_rich"]) == (10, 9)
    assert abs(got[0]["phi"] - 2 * 9 / (10 * 9)) < 1e-9
    # k=1: only the hub (deg 9) -> n_rich=1, phi pinned 0.0
    assert (got[1]["n_rich"], got[1]["e_rich"], got[1]["phi"]) == (1, 0, 0.0)
    assert (got[8]["n_rich"], got[8]["phi"]) == (1, 0.0)
    g.unpersist()


def test_seed_spread_domains(spark):
    from pyspark.sql import functions as F

    from linkgraph_spark.kernels.labelprop import seed_spread

    # TWO_COMPS: triangle {0,1,2} + path {10,11,12}
    g = graph_from_edges(spark, TWO_COMPS)
    seeds = g.vertices.where(F.col("id") == 0).select(
        "id", F.col("id").alias("label")
    )
    got = {r["id"]: r["label"] for r in seed_spread(g, seeds).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[10] is None and got[11] is None and got[12] is None

    # two seeds with distinct labels: min reachable seed wins per component
    seeds2 = spark.createDataFrame([(0, 7), (10, 3)], "id long, label long")
    got2 = {r["id"]: r["label"] for r in seed_spread(g, seeds2).collect()}
    assert got2[1] == got2[2] == 7 and got2[11] == got2[12] == 3
    g.unpersist()


def test_eigenvector_and_salsa_match_numpy(spark):
    """Value contract: both spectral kernels replicate a dense numpy run of
    the same fixed-iteration recurrence on web64 (allclose 1e-9 before the
    6-dp gate rounding)."""
    import numpy as np

    from linkgraph_spark.kernels.spectral import eigenvector_centrality, salsa

    edges = sorted(set(web64()))
    n = 64
    g = graph_from_edges(spark, edges)

    # eigenvector: x' = A^T x / max
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] = 1.0
    x = np.ones(n)
    for _ in range(8):
        x = A.T @ x
        mx = x.max()
        x = x / (mx if mx > 0 else 1.0)
    got = {r["id"]: r["score"] for r in eigenvector_centrality(g, 8).scores.collect()}
    assert all(abs(got[i] - x[i]) < 1e-9 for i in range(n))

    # salsa: degree-normalized two-step walk with L1 normalization
    out_deg = A.sum(axis=1)
    in_deg = A.sum(axis=0)
    h = np.ones(n) / n
    for _ in range(5):
        a_raw = A.T @ (np.divide(h, out_deg, out=np.zeros(n), where=out_deg > 0))
        a_n = a_raw.sum() or 1.0
        a = a_raw / a_n
        h_raw = A @ (np.divide(a, in_deg, out=np.zeros(n), where=in_deg > 0))
        h_n = h_raw.sum() or 1.0
        h = h_raw / h_n
    res = {r["id"]: (r["hub"], r["authority"]) for r in salsa(g, 5).scores.collect()}
    assert all(abs(res[i][0] - h[i]) < 1e-9 for i in range(n))
    assert all(abs(res[i][1] - a[i]) < 1e-9 for i in range(n))
    g.unpersist()


def test_neighborhood_overlap_hand_values(spark):
    """Triangle 1-2-3 + pendant 3-4 + isolated edge 5-6: every overlap and
    the degree-1/degree-1 NULL case, hand-computed (Onnela et al. 2007)."""
    from linkgraph_spark.kernels.linkpred import neighborhood_overlap

    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)])
    rows = {(r["a"], r["b"]): r for r in neighborhood_overlap(g).collect()}
    assert set(rows) == {(1, 2), (1, 3), (2, 3), (3, 4), (5, 6)}
    # edge (1,2): support 1, deg 2+2 → denom 2+2-2-1=1 → 1.0
    assert rows[(1, 2)]["support"] == 1 and rows[(1, 2)]["overlap"] == 1.0
    # edges (1,3),(2,3): support 1, deg 2+3 → denom 2 → 0.5
    assert rows[(1, 3)]["overlap"] == 0.5 and rows[(2, 3)]["overlap"] == 0.5
    # pendant (3,4): support 0, denom 3+1-2-0=2 → 0.0
    assert rows[(3, 4)]["support"] == 0 and rows[(3, 4)]["overlap"] == 0.0
    # isolated edge (5,6): denom 1+1-2-0=0 → undefined ⇒ NULL, not 0
    assert rows[(5, 6)]["overlap"] is None
    g.unpersist()


def _kruskal(n_edges):
    """Sequential Kruskal with the engine's exact (weight, a, b) total
    order — the MSF under that order is unique, so set-equality is the
    oracle (pure python union-find; no external libs)."""
    parent = {}

    def find(u):
        parent.setdefault(u, u)
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    forest = []
    for w, a, b in sorted((w, a, b) for a, b, w in n_edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.append((a, b, w))
    return set(forest)


def test_boruvka_msf_matches_kruskal(spark):
    """Borůvka (parallel, pointer-doubling contraction) must produce the
    IDENTICAL edge set as sequential Kruskal under the shared (weight,a,b)
    total order — on a multi-component graph with parallel edges (collapse
    to min weight), a self-loop (dropped), and weight ties (tie-break)."""
    from linkgraph_spark.edges import LinkGraph
    from linkgraph_spark.kernels import boruvka_msf

    web = web64(40, 2)
    wedges = [
        (a, b, float((a * 7 + b * 13) % 23) / 4.0) for a, b in web
    ]
    wedges += [(100, 101, 0.5), (101, 102, 0.5), (102, 100, 0.5)]  # tied cycle
    wedges += [(0, 1, 99.0), (7, 7, 0.0)]  # heavy parallel + self-loop
    edges = spark.createDataFrame(wedges, "src long, dst long, weight double")
    vids = sorted({v for a, b, _ in wedges for v in (a, b)})
    vertices = spark.createDataFrame([(v, str(v)) for v in vids], "id long, actor_key string")
    g = LinkGraph(vertices=vertices, edges=edges, degrees=None, num_vertices=len(vids))

    res = boruvka_msf(g)
    assert res.converged
    got = {(r["a"], r["b"], r["weight"]) for r in res.edges.collect()}

    # oracle input: same simple-graph reduction (a<b, min weight per pair)
    simple = {}
    for a, b, w in wedges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        simple[k] = min(simple.get(k, float("inf")), w)
    want = _kruskal([(a, b, w) for (a, b), w in simple.items()])
    assert got == want
    # forest size = V - #components (two components here)
    assert len(got) == len(vids) - 2
    # ≤ log2(V) merge rounds — the Borůvka halving argument held
    assert res.iterations <= 7


def test_msf_clusters_single_link(spark):
    """Cutting the k heaviest MSF edges must reproduce sequential
    single-linkage: partition-compare against Kruskal-forest-minus-top-k
    under the shared (weight, a, b) total order."""
    from linkgraph_spark.edges import LinkGraph
    from linkgraph_spark.kernels import msf_clusters

    web = web64(40, 2)
    wedges = [(a, b, float((a * 7 + b * 13) % 23) / 4.0) for a, b in web]
    wedges += [(100, 101, 0.5), (101, 102, 0.5), (102, 100, 0.5)]
    edges = spark.createDataFrame(wedges, "src long, dst long, weight double")
    vids = sorted({v for a, b, _ in wedges for v in (a, b)})
    vertices = spark.createDataFrame(
        [(v, str(v)) for v in vids], "id long, actor_key string"
    )
    g = LinkGraph(vertices=vertices, edges=edges, degrees=None, num_vertices=len(vids))

    cuts = 3
    got = {}
    for r in msf_clusters(g, cuts=cuts).collect():
        got.setdefault(r["cluster"], set()).add(r["id"])

    simple = {}
    for a, b, w in wedges:
        k = (min(a, b), max(a, b))
        simple[k] = min(simple.get(k, float("inf")), w)
    forest = _kruskal([(a, b, w) for (a, b), w in simple.items()])
    kept = sorted(forest, key=lambda e: (e[2], e[0], e[1]), reverse=True)[cuts:]
    parent = {v: v for v in vids}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a, b, _ in kept:
        parent[find(a)] = find(b)
    want = {}
    for v in vids:
        want.setdefault(find(v), set()).add(v)

    assert sorted(got.values(), key=min) == sorted(want.values(), key=min)
    # 2 base components + 3 cuts = 5 clusters; labels are component minima
    assert len(got) == 5 and all(lbl == min(m) for lbl, m in got.items())


def test_degree_percentiles_hand_values(spark):
    """Path 0→1→2→3: both degree columns are [0,1,1,1] sorted, so the
    exact interpolated percentiles are hand-computable."""
    from linkgraph_spark.kernels import degree_percentiles

    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)])
    rows = {
        r["p"]: (r["out_deg_pct"], r["in_deg_pct"])
        for r in degree_percentiles(g, ps=(0.25, 0.5, 1.0)).collect()
    }
    assert rows[0.25] == (0.75, 0.75)  # idx 0.75 between 0 and 1
    assert rows[0.5] == (1.0, 1.0)
    assert rows[1.0] == (1.0, 1.0)
    g.unpersist()
