"""Wave-20 operators: Okapi BM25 retrieval scoring and the 4-cycle
(square) motif count."""

import math
from itertools import combinations

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.text import bm25
from linkgraph_spark.kernels.triangles import square_count


# ----------------------------------------------------------------------- bm25
def _bm25_ref(docs: dict, queries, k1=1.2, b=0.75, top_n=10):
    toks = {d: t.lower().split() for d, t in docs.items()}
    n = len(docs)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for qi, q in enumerate(queries):
        scores = {}
        for term in dict.fromkeys(q.lower().split()):
            if term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf:
                    scores[d] = scores.get(d, 0.0) + idf * tf / (
                        tf + k1 * (1 - b + b * dl[d] / avgdl)
                    )
        ranked = sorted(
            ((round(s, 6), d) for d, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:top_n]
        out.extend((qi, d, s) for s, d in ranked)
    return out


def _docs_df(spark, docs: dict):
    return spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    )


def test_bm25_matches_reference(spark):
    docs = {
        1: "join hash join slow",
        2: "scan fast scan scan",
        3: "hash table build probe",
        4: "slow slow slow network",
        5: "vector search index",
        6: "join order optimizer hash",
    }
    queries = ["hash join", "slow scan", "vector"]
    got = [
        (r.query_id, r.doc_id, r.score)
        for r in bm25(_docs_df(spark, docs), queries, top_n=3)
        .orderBy("query_id", "doc_id")
        .collect()
    ]
    want = sorted(_bm25_ref(docs, queries, top_n=3))
    assert [(q, d) for q, d, _ in got] == [(q, d) for q, d, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)


def test_bm25_rewards_rare_terms_and_tf_saturates(spark):
    # 'rare' appears in one doc, 'common' in all: the rare-term doc must
    # outrank a doc stuffed with the common term for query "rare common"
    docs = {
        1: "rare common",
        2: "common common common common common common",
        3: "common filler text",
        4: "common other words",
    }
    rows = bm25(_docs_df(spark, docs), ["rare common"], top_n=4).collect()
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: -r.score)]
    assert ranked[0] == 1


def test_bm25_query_without_matches_yields_no_rows(spark):
    docs = {1: "alpha beta", 2: "beta gamma"}
    rows = bm25(_docs_df(spark, docs), ["zzz", "alpha"], top_n=5).collect()
    assert {r.query_id for r in rows} == {1}


# -------------------------------------------------------------------- squares
def _square_ref(edges):
    und = {}
    for a, b in edges:
        if a == b:
            continue
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    tot = 0
    for x, y in combinations(sorted(und), 2):
        w = len(und[x] & und[y])
        tot += w * (w - 1) // 2
    return tot // 2


def test_square_count_c4_and_k4(spark):
    ring4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    (r,) = square_count(graph_from_edges(spark, ring4)).collect()
    assert r.squares == 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    (r,) = square_count(graph_from_edges(spark, k4)).collect()
    assert r.squares == 3  # K4 contains 3 distinct 4-cycles


def test_square_count_triangle_free_bipartite(spark):
    # K_{2,3}: squares = C(3,2) pairs of right-vertices through the 2
    # left hubs = 3; and zero triangles by construction
    k23 = [(a, 10 + b) for a in range(2) for b in range(3)]
    (r,) = square_count(graph_from_edges(spark, k23)).collect()
    assert r.squares == _square_ref(k23) == 3


def test_square_count_web_graph_and_cap(spark):
    from tests.fixtures_graphs import web64

    edges = web64(40, 3)
    (r,) = square_count(graph_from_edges(spark, edges)).collect()
    assert r.squares == _square_ref(edges)
    # capping centers can only reduce the count
    (rc,) = square_count(graph_from_edges(spark, edges), max_degree=4).collect()
    assert rc.squares <= r.squares
