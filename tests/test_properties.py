"""Property-based checks (hypothesis) — bounded example counts because
every example runs Spark jobs; the properties are the engine's structural
invariants, complementing the fixed-fixture oracles."""

import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
    min_size=2,
    max_size=30,
    unique=True,
)


@given(ks=keys)
@SLOW
def test_actor_ids_are_sorted_rank(spark, ks):
    """id = rank in global sorted key order, for ANY key set and any
    partition count — the determinism the offset machinery must preserve."""
    from linkgraph_spark.edges import assign_actor_ids

    pairs = [(a, b) for a, b in zip(ks, ks[1:] + ks[:1])]
    clean = spark.createDataFrame(pairs, "src_key string, dst_key string")
    got = {
        r["actor_key"]: r["id"] for r in assign_actor_ids(clean, num_partitions=3).collect()
    }
    want = {k: i for i, k in enumerate(sorted(set(ks)))}
    assert got == want


texts = st.lists(
    st.text(alphabet=string.ascii_lowercase + " ", min_size=1, max_size=60),
    min_size=1,
    max_size=15,
)


@given(ts=texts)
@SLOW
def test_exact_dedup_partitions_the_corpus(spark, ts):
    """exact_dedup output covers every doc exactly once, keeper is a group
    member with the minimum id, and group sizes sum to the corpus size."""
    from linkgraph_spark.functions.dedup import exact_dedup

    docs = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    rows = exact_dedup(docs).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(ts)))
    groups = {}
    for r in rows:
        groups.setdefault(r["keeper_id"], []).append(r)
    for keeper, members in groups.items():
        assert keeper == min(m["doc_id"] for m in members)
        assert all(m["group_size"] == len(members) for m in members)
    assert sum(len(m) for m in groups.values()) == len(ts)


small_graphs = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
)


@given(edges=small_graphs)
@SLOW
def test_components_partition_refines_reachability(spark, edges):
    """Hash-min labels: same component ⟺ connected in the undirected
    closure, for arbitrary small graphs (self-loops/dupes included)."""
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels import connected_components

    g = graph_from_edges(spark, edges)
    if g.num_vertices == 0:
        g.unpersist()
        return
    res = connected_components(g)
    assert res.converged
    got = {r["id"]: r["component"] for r in res.labels.collect()}
    # union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u != v:
            parent[find(u)] = find(v)
    for v in got:
        find(v)
    roots = {v: find(v) for v in got}
    # same component iff same root, and label == min member id
    from collections import defaultdict

    by_root = defaultdict(list)
    for v, r in roots.items():
        by_root[r].append(v)
    for members in by_root.values():
        labels = {got[m] for m in members}
        assert labels == {min(members)}
    g.unpersist()


rand_edges = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)),
    min_size=3,
    max_size=60,
    unique=True,
)


@given(es=rand_edges)
@SLOW
def test_structural_invariants_random_graphs(spark, es):
    """Cross-kernel invariants on arbitrary small digraphs: SCC refines
    weak components; every k-truss edge survives in the (k-1)-truss;
    an ego graph is contained in its source's weak component; modularity
    of any labeling is <= 1; induced slicing is idempotent."""
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels import (
        connected_components,
        ego_graph,
        induced_subgraph,
        k_truss,
        modularity,
        strongly_connected_components,
    )

    es = [e for e in es if e[0] != e[1]]
    if len(es) < 2:
        return
    g = graph_from_edges(spark, es)

    comp = {r["id"]: r["component"] for r in connected_components(g).labels.collect()}
    scc_res = strongly_connected_components(g)
    assert scc_res.converged
    scc = {r["id"]: r["scc"] for r in scc_res.labels.collect()}
    # SCC refines weak components: same scc -> same weak component
    by_scc = {}
    for v, s in scc.items():
        by_scc.setdefault(s, set()).add(comp[v])
    assert all(len(cs) == 1 for cs in by_scc.values())

    t4 = {(r["a"], r["b"]) for r in k_truss(g, k=4).edges.collect()}
    t3 = {(r["a"], r["b"]) for r in k_truss(g, k=3).edges.collect()}
    assert t4 <= t3  # truss nesting

    src = es[0][0]
    ego = ego_graph(g, sources=[src], k=2)
    ego_ids = {r["id"] for r in ego.vertices.collect()}
    assert all(comp[v] == comp[src] for v in ego_ids)

    labels = connected_components(g).labels.selectExpr("id", "component AS label")
    q = modularity(g, labels).collect()[0]["modularity"]
    assert q is not None and q <= 1.0

    sub = induced_subgraph(g, F.col("out_deg") >= 1)
    sub2 = induced_subgraph(sub, F.col("out_deg") >= 0)
    assert {r["id"] for r in sub2.vertices.collect()} == {
        r["id"] for r in sub.vertices.collect()
    }
    for gg in (g, sub, sub2, ego):
        gg.unpersist()
