"""Wave-6 operators: 4-clique counting, Markov transitions, prefix-dup
pairs, weighted sampling, PMI collocations, attack resilience."""

import math
from datetime import datetime, timezone
from itertools import combinations

import pytest

from linkgraph_spark.edges import graph_from_edges
from tests.fixtures_graphs import TRI3, web64


def _k(n, offset=0):
    """Complete graph on n vertices starting at ``offset``."""
    return [
        (a + offset, b + offset) for a, b in combinations(range(n), 2)
    ]


# ------------------------------------------------------------- four cliques
def brute_four_cliques(edges):
    """Per-vertex 4-clique counts by brute force over the undirected graph."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in und for v in e})
    counts = {v: 0 for v in verts}
    for q in combinations(verts, 4):
        if all(tuple(sorted(p)) in und for p in combinations(q, 2)):
            for v in q:
                counts[v] += 1
    return counts


@pytest.mark.parametrize(
    "edges",
    [
        _k(4),                       # one K4: every vertex in exactly 1
        _k(5),                       # K5: C(4,3)=4 per vertex, 5 cliques
        _k(4) + _k(4, offset=10),    # two disjoint K4s
        TRI3,                        # triangle only — zero K4s
        web64(32, 4),                # preferential-attachment digraph
    ],
)
def test_four_cliques_per_vertex_exact(spark, edges):
    from linkgraph_spark.kernels.triangles import four_cliques_per_vertex

    g = graph_from_edges(spark, edges)
    got = {
        r["id"]: r["four_cliques"]
        for r in four_cliques_per_vertex(g).collect()
    }
    want = brute_four_cliques(edges)
    # kernel reports every graph vertex; brute force only edge endpoints
    for v, c in want.items():
        assert got[v] == c, (v, c, got[v])
    assert all(c == 0 for v, c in got.items() if v not in want)


def test_four_cliques_over_pairs_matches_linkgraph_variant(spark):
    from linkgraph_spark.kernels.triangles import (
        four_cliques_over_pairs,
        four_cliques_per_vertex,
    )

    edges = _k(5) + [(50, 51)]
    g = graph_from_edges(spark, edges)
    via_graph = {
        r["id"]: r["four_cliques"]
        for r in four_cliques_per_vertex(g).collect()
    }
    pairs = spark.createDataFrame(edges, "a long, b long")
    via_pairs = {
        r["id"]: r["four_cliques"]
        for r in four_cliques_over_pairs(pairs).collect()
    }
    assert via_pairs == {v: c for v, c in via_graph.items() if v in via_pairs}
    assert via_pairs[0] == 4 and via_pairs[50] == 0


# -------------------------------------------------------- markov transitions
def _mk_events(spark, rows):
    """rows: (event_id, user_id, event_type, epoch_sec)."""
    data = [
        (eid, uid, et, datetime.fromtimestamp(ts, tz=timezone.utc))
        for eid, uid, et, ts in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_markov_transitions_counts_and_session_breaks(spark):
    from linkgraph_spark.functions.events import markov_transitions

    rows = [
        # user 1: a->b->a within gap, then a session break, then a->b
        (1, 1, "a", 1000),
        (2, 1, "b", 1010),
        (3, 1, "a", 1020),
        (4, 1, "a", 9999),   # gap > 1800: NOT a transition from previous
        (5, 1, "b", 10000),
        # user 2: b->b
        (6, 2, "b", 50),
        (7, 2, "b", 60),
    ]
    got = {
        (r["src_type"], r["dst_type"]): (r["n_trans"], r["prob"])
        for r in markov_transitions(_mk_events(spark, rows), gap_sec=1800).collect()
    }
    # from 'a': a->b twice; from 'b': b->a once, b->b once
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 0.5)
    assert got[("b", "b")] == (1, 0.5)
    assert ("a", "a") not in got  # the break killed the only a->a pair


def test_markov_transitions_probs_sum_to_one_per_src(spark):
    from linkgraph_spark.functions.events import markov_transitions

    rows = [
        (i, i % 3, "xyz"[(i * 7) % 3], 100 + i * 13) for i in range(60)
    ]
    res = markov_transitions(_mk_events(spark, rows), gap_sec=1800).collect()
    by_src = {}
    for r in res:
        by_src.setdefault(r["src_type"], 0.0)
        by_src[r["src_type"]] += r["prob"]
    for s, tot in by_src.items():
        assert abs(tot - 1.0) < 1e-4, (s, tot)


# ------------------------------------------------------------- prefix dups
def test_prefix_dup_pairs_classification(spark):
    from linkgraph_spark.functions.dedup import prefix_dup_pairs

    docs = spark.createDataFrame(
        [
            (1, "abcdef body one"),
            (2, "abcdef body one"),            # exact dup of 1
            (3, "abcdef body one and more"),   # 1 is a prefix of 3
            (4, "abcdef completely different"),  # shares only the prefix
            (5, "zzz unrelated"),
            (6, None),                          # NULL text → empty
            (7, ""),                            # empty text
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["relation"]
        for r in prefix_dup_pairs(docs, prefix_len=6).collect()
    }
    assert got[(1, 2)] == "exact"
    assert got[(1, 3)] == "contains"
    assert got[(2, 3)] == "contains"
    assert got[(1, 4)] == "shared_prefix"
    assert got[(6, 7)] == "exact"  # both empty
    assert not any(5 in p for p in got)


def test_prefix_dup_pairs_bucket_cap_drops_boilerplate(spark):
    from linkgraph_spark.functions.dedup import prefix_dup_pairs

    docs = spark.createDataFrame(
        [(i, f"same-boilerplate-prefix tail {i}") for i in range(10)]
        + [(100, "rare one"), (101, "rare one")],
        "doc_id long, text string",
    )
    got = prefix_dup_pairs(docs, prefix_len=10, bucket_cap=5).collect()
    # the 10-doc boilerplate bucket exceeds the cap and is dropped whole
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(100, 101)}


# --------------------------------------------------------- weighted sampling
def test_weighted_hash_sample_deterministic_and_sized(spark):
    from linkgraph_spark.functions.sampling import weighted_hash_sample

    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(200)], "k long, w double"
    )
    a = sorted(r["k"] for r in weighted_hash_sample(df, ["k"], "w", 20).collect())
    b = sorted(r["k"] for r in weighted_hash_sample(df, ["k"], "w", 20).collect())
    assert a == b and len(a) == 20
    c = sorted(
        r["k"] for r in weighted_hash_sample(df, ["k"], "w", 20, salt="x").collect()
    )
    assert c != a  # independent draw under a different salt


def test_weighted_hash_sample_prefers_heavy_rows(spark):
    from linkgraph_spark.functions.sampling import weighted_hash_sample

    # 50 heavy rows (w=1000) vs 450 light (w=1): heavies should dominate
    df = spark.createDataFrame(
        [(i, 1000.0 if i < 50 else 1.0) for i in range(500)], "k long, w double"
    )
    got = [r["k"] for r in weighted_hash_sample(df, ["k"], "w", 40).collect()]
    assert sum(1 for k in got if k < 50) >= 30


def test_weighted_hash_sample_skips_nonpositive_weights(spark):
    from linkgraph_spark.functions.sampling import weighted_hash_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, None), (4, 2.0), (5, 1.0)],
        "k long, w double",
    )
    got = sorted(r["k"] for r in weighted_hash_sample(df, ["k"], "w", 10).collect())
    assert got == [4, 5]


# ----------------------------------------------------------------- term PMI
def test_term_pmi_known_value(spark):
    from linkgraph_spark.functions.text import term_pmi

    # 8 docs; "foo bar" always co-occur (4 docs), "baz" independent
    docs = spark.createDataFrame(
        [
            (1, "foo bar x1"),
            (2, "foo bar x2"),
            (3, "foo bar x3"),
            (4, "foo bar x4"),
            (5, "baz y1"),
            (6, "baz y2"),
            (7, "baz y3"),
            (8, "baz y4"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["term_a"], r["term_b"]): (r["n_docs_both"], r["pmi"])
        for r in term_pmi(
            docs, min_df=2, max_df_frac=0.9, min_pair=2, top_n=10
        ).collect()
    }
    n, pmi = got[("bar", "foo")]
    assert n == 4
    # pmi = ln( (4/4) * (8/4) ) = ln 2
    assert abs(pmi - round(math.log(2.0), 6)) < 1e-9
    assert ("bar", "baz") not in got  # never co-occur


def test_term_pmi_df_bounds_exclude_terms(spark):
    from linkgraph_spark.functions.text import term_pmi

    docs = spark.createDataFrame(
        [(i, f"always rare{'x' if i else ''} w{i}") for i in range(10)],
        "doc_id long, text string",
    )
    got = term_pmi(docs, min_df=2, max_df_frac=0.5, min_pair=2, top_n=10).collect()
    # "always" has df=1.0 frac (boilerplate) → excluded; everything else df=1
    assert got == []


# --------------------------------------------------------- attack resilience
def test_attack_resilience_star_shatters(spark):
    from linkgraph_spark.kernels.components import attack_resilience

    # star: hub 0 with 9 spokes; removing the hub isolates all spokes
    edges = [(0, s) for s in range(1, 10)]
    g = graph_from_edges(spark, edges)
    row = attack_resilience(g, k=1).collect()[0]
    assert row["n_removed"] == 1
    assert row["n_vertices_left"] == 9
    assert row["n_edges_left"] == 0
    assert row["n_components"] == 9
    assert row["largest_component"] == 1


def test_attack_resilience_matches_networkx_free_brute(spark):
    from linkgraph_spark.kernels.components import attack_resilience

    edges = web64(48, 3)
    g = graph_from_edges(spark, edges)
    row = attack_resilience(g, k=4).collect()[0]

    # brute-force replay in pure python
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    hubs = set(
        v for v, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    )
    verts = {v for e in edges for v in e} - hubs
    left = {e for e in und if e[0] not in hubs and e[1] not in hubs}
    # union-find
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in left:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for v in verts:
        comps.setdefault(find(v), 0)
        comps[find(v)] += 1
    assert row["n_removed"] == 4
    assert row["n_vertices_left"] == len(verts)
    assert row["n_edges_left"] == len(left)
    assert row["n_components"] == len(comps)
    assert row["largest_component"] == max(comps.values())
