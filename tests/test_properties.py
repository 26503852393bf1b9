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
