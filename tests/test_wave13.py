"""Wave-13 operators: the web-graph macro-structure classics — bow-tie
decomposition, TrustRank/spam mass, degree-signature anonymity sets,
label assortativity, temporal 2-edge motifs, host-style contraction."""

from collections import defaultdict

from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges, vertex_degrees
from tests.fixtures_graphs import STAR10, web64
from tests.oracles import clean, pagerank_personalized, pagerank_textbook


# ------------------------------------------------------------------ bow-tie
def _bowtie_oracle(edges):
    """Pure-python Kosaraju SCC + BFS bow-tie: → {category: n_vertices}."""
    edges = clean(edges)
    nodes = sorted({u for e in edges for u in e})
    fwd, bwd = defaultdict(list), defaultdict(list)
    for s, t in edges:
        fwd[s].append(t)
        bwd[t].append(s)

    # Kosaraju: order by finish time on fwd, assign on bwd
    seen, order = set(), []
    for v in nodes:
        if v in seen:
            continue
        stack = [(v, iter(fwd[v]))]
        seen.add(v)
        while stack:
            node, it = stack[-1]
            advanced = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    scc = {}
    for v in reversed(order):
        if v in scc:
            continue
        label = v
        stack = [v]
        scc[v] = label
        while stack:
            x = stack.pop()
            for w in bwd[x]:
                if w not in scc:
                    scc[w] = label
                    stack.append(w)
    by_scc = defaultdict(set)
    for v, l in scc.items():
        by_scc[l].add(v)
    core = max(by_scc.values(), key=lambda s: (len(s), -min(s)))

    def reach(adj, seeds):
        out = set(seeds)
        stack = list(seeds)
        while stack:
            x = stack.pop()
            for w in adj[x]:
                if w not in out:
                    out.add(w)
                    stack.append(w)
        return out

    f, b = reach(fwd, core), reach(bwd, core)
    und = defaultdict(list)
    for s, t in edges:
        und[s].append(t)
        und[t].append(s)
    weak = reach(und, core)
    cats = {"core": 0, "in": 0, "out": 0, "tendrils": 0, "disconnected": 0}
    for v in nodes:
        if v in core:
            cats["core"] += 1
        elif v in f:
            cats["out"] += 1
        elif v in b:
            cats["in"] += 1
        elif v in weak:
            cats["tendrils"] += 1
        else:
            cats["disconnected"] += 1
    return cats


def test_bowtie_closed_form(spark):
    from linkgraph_spark.kernels import bowtie

    # core cycle {0,1,2}; 3 reaches the core (IN), 4 is reached (OUT),
    # 5 hangs off IN (tendril), {6,7} weakly disconnected
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (2, 4), (3, 5), (6, 7)]
    res = bowtie(graph_from_edges(spark, edges))
    assert res.converged
    got = {r["category"]: r["n_vertices"] for r in res.sizes.collect()}
    assert got == {"core": 3, "in": 1, "out": 1, "tendrils": 1, "disconnected": 2}
    assert res.core_scc == 0


def test_bowtie_matches_python_oracle(spark):
    from linkgraph_spark.kernels import bowtie

    edges = web64()
    res = bowtie(graph_from_edges(spark, edges))
    assert res.converged
    got = {r["category"]: r["n_vertices"] for r in res.sizes.collect()}
    assert got == _bowtie_oracle(edges)


def test_bowtie_all_core(spark):
    from linkgraph_spark.kernels import bowtie

    # one big cycle: everything is the core, every other class is 0
    n = 10
    res = bowtie(graph_from_edges(spark, [(i, (i + 1) % n) for i in range(n)]))
    got = {r["category"]: r["n_vertices"] for r in res.sizes.collect()}
    assert got == {"core": n, "in": 0, "out": 0, "tendrils": 0, "disconnected": 0}


# ---------------------------------------------------------------- spam mass
def test_spam_mass_matches_python(spark):
    from linkgraph_spark.kernels import spam_mass

    edges = web64(n=32)
    seeds = [0, 1, 2]
    pr, _ = pagerank_textbook(edges, tol=-1.0, max_iters=3)
    tr, _ = pagerank_personalized(edges, seeds, tol=-1.0, max_iters=3)
    got = spam_mass(
        graph_from_edges(spark, edges), trusted_ids=seeds, iterations=3
    ).collect()
    assert len(got) == len(pr)
    for r in got:
        v = r["id"]
        assert abs(r["pr"] - round(pr[v], 6)) <= 1e-9
        assert abs(r["tr"] - round(tr[v], 6)) <= 1e-9
        assert abs(r["spam_mass"] - round((pr[v] - tr[v]) / pr[v], 6)) <= 1e-9


def test_spam_mass_seeds_trusted(spark):
    from linkgraph_spark.kernels import spam_mass

    # seeds hold the whole teleport mass -> their spam mass is negative
    # (rank over-covered by trust); far vertices trend positive
    edges = [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2)]
    got = {
        r["id"]: r["spam_mass"]
        for r in spam_mass(
            graph_from_edges(spark, edges), trusted_ids=[0], iterations=3
        ).collect()
    }
    assert got[0] < 0
    assert got[3] > 0


# -------------------------------------------------------- degree uniqueness
def test_degree_uniqueness_star(spark):
    from linkgraph_spark.kernels import degree_uniqueness

    # STAR10 signatures: (1,9) hub, (1,1) vertex 1, (1,0) the other 8
    got = {
        r["class_size"]: (r["n_classes"], r["n_vertices"], r["frac"])
        for r in degree_uniqueness(graph_from_edges(spark, STAR10)).collect()
    }
    assert got == {1: (2, 2, 0.2), 8: (1, 8, 0.8)}


# ------------------------------------------------------ label assortativity
def test_label_assortativity_perfect(spark):
    from linkgraph_spark.kernels import label_assortativity

    # two disjoint triangles labelled by component: all edges intra -> r = 1
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    g = graph_from_edges(spark, edges)
    labels = g.vertices.select(
        "id", F.when(F.col("id") < 10, 0).otherwise(1).alias("label")
    )
    row = label_assortativity(g, labels).collect()[0]
    assert row["r"] == 1.0
    assert row["n_labels"] == 2
    assert row["diag_frac"] == 1.0


def test_label_assortativity_disassortative(spark):
    from linkgraph_spark.kernels import label_assortativity

    # perfect 2-label crossing (all edges inter, symmetric marginals):
    # diag = 0, sum a*b = 0.5 -> r = -1
    edges = [(0, 1), (1, 0), (2, 3), (3, 2)]
    g = graph_from_edges(spark, edges)
    labels = g.vertices.select(
        "id", (F.col("id") % 2).alias("label")
    )
    row = label_assortativity(g, labels).collect()[0]
    assert row["r"] == -1.0
    assert row["diag_frac"] == 0.0


# ---------------------------------------------------------- temporal motifs
def test_temporal_motifs_hand(spark):
    from linkgraph_spark.kernels import temporal_motifs

    rows = [
        (1, 2, 0),       # + (2,3,100)  -> chain
        (2, 1, 50),      # after (1,2,0) -> ping_pong
        (2, 3, 100),     # also: (1,2,0)->(2,1,50) only pair with b=2 besides
        (3, 4, 10000),   # gap 9900 from (2,3,100): outside delta
        (4, 5, 10000),   # t2 == t1 of (3,4,10000): simultaneous, excluded
        (7, 8, 3599),    # bucket-boundary pair: gap 2 crosses delta buckets
        (8, 9, 3601),    # -> chain (catches a bk/bk+1 explode regression)
    ]
    te = spark.createDataFrame(rows, "src long, dst long, ts long")
    got = {r["motif"]: r["n_pairs"] for r in temporal_motifs(te, 3600).collect()}
    # chains: (1,2,0)->(2,3,100) and (7,8,3599)->(8,9,3601);
    # ping_pongs: (1,2,0)->(2,1,50); note (2,1,50)->(1,2,?) has no later edge
    assert got == {"chain": 2, "ping_pong": 1}


def test_temporal_motifs_empty_zero_rows(spark):
    from linkgraph_spark.kernels import temporal_motifs

    te = spark.createDataFrame([], "src long, dst long, ts long")
    got = {r["motif"]: r["n_pairs"] for r in temporal_motifs(te, 60).collect()}
    assert got == {"chain": 0, "ping_pong": 0}


# --------------------------------------------------------------- contraction
def test_contract_roles_closed_form(spark):
    from linkgraph_spark.edges import LinkGraph
    from linkgraph_spark.kernels import contract_vertices

    verts = spark.createDataFrame(
        [
            (0, "c1#user"),
            (1, "c1#assistant"),
            (2, "c2#user"),
            (3, "c2#assistant"),
            (4, "tool:search"),
        ],
        "id long, actor_key string",
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 3), (3, 2), (1, 4), (3, 4)],
        "src long, dst long",
    )
    g = LinkGraph(
        vertices=verts,
        edges=edges,
        degrees=vertex_degrees(verts, edges),
        num_vertices=5,
    )
    got = {
        (r["src_group"], r["dst_group"]): (r["n_edges"], r["n_src"], r["n_dst"])
        for r in contract_vertices(g).collect()
    }
    assert got == {
        ("user", "assistant"): (2, 2, 2),
        ("assistant", "user"): (2, 2, 2),
        ("assistant", "tool:search"): (2, 2, 1),
    }
