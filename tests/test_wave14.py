"""Wave-14 operators: mutual-kNN embedding graph, corpus bigram vocabulary,
blocklist audit, MinHash band sweep, and the warm-start PageRank gate
contract (warm(2)+3 supersteps == cold 5)."""

import math
from collections import Counter

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.curation import blocklist_audit
from linkgraph_spark.functions.dedup import minhash_band_sweep, minhash_lsh_dups
from linkgraph_spark.functions.similarity import mutual_knn
from linkgraph_spark.functions.text import top_bigrams
from linkgraph_spark.kernels import pagerank
from tests.fixtures_graphs import web64

MERSENNE_P = 2_147_483_647


# --------------------------------------------------------------- mutual kNN
def _plane_sign_py(p: int, i: int) -> int:
    v = ((1 + 7 * p) * ((i * 2654435761) % MERSENNE_P)) % MERSENNE_P
    return (v % 2) * 2 - 1


def _mutual_knn_oracle(vecs: dict[int, list[float]], k: int, n_planes: int = 6):
    """Pure-python replay: deterministic hyperplane buckets → per-bucket
    cosine top-k (cosine desc, id asc tie-break, 6dp rounding) → mutual."""
    def bucket(v):
        b = 0
        for p in range(n_planes):
            proj = sum(x * _plane_sign_py(p, i + 1) for i, x in enumerate(v))
            if proj > 0:
                b += 2 ** p
        return b

    buckets = {vid: bucket(v) for vid, v in vecs.items()}
    norms = {vid: math.sqrt(sum(x * x for x in v)) for vid, v in vecs.items()}
    topk = {}
    for q, qv in vecs.items():
        cands = []
        for o, ov in vecs.items():
            if o == q or buckets[o] != buckets[q]:
                continue
            cos = sum(a * b for a, b in zip(qv, ov)) / (norms[q] * norms[o])
            cands.append((round(cos, 6), o))
        cands.sort(key=lambda t: (-t[0], t[1]))
        topk[q] = {o: c for c, o in cands[:k]}
    pairs = set()
    for a in vecs:
        for b, cos in topk[a].items():
            if a < b and a in topk[b]:
                pairs.add((a, b, cos))
    return pairs


def test_mutual_knn_matches_bruteforce_oracle(spark):
    # deterministic 8-dim vectors with enough spread to populate several
    # buckets; float32 round-trip mirrors the parquet embedding column
    vecs = {
        i: [float(round(math.sin(0.7 * i * (j + 1)) + 0.1 * j, 4)) for j in range(8)]
        for i in range(24)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in mutual_knn(df, k=3).collect()
    }
    want = _mutual_knn_oracle(vecs, k=3)
    assert got == want
    assert want  # fixture actually produces mutual pairs
    # mutuality by construction: every edge is ordered and unique
    assert all(a < b for a, b, _ in got)


# --------------------------------------------------------------- top bigrams
def test_top_bigrams_exact_counts(spark):
    rows = [
        (1, "a b a b c"),
        (2, "b c b c"),
        (3, "a"),          # single token: no bigrams
        (4, None),          # NULL text: coalesced, no bigrams
        (5, "a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.bg, r.tf, r.df) for r in top_bigrams(df, top_n=10).collect()}
    tf = Counter()
    docf = Counter()
    for _, text in rows:
        toks = (text or "").split()
        bgs = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
        tf.update(bgs)
        docf.update(set(bgs))
    want = {(bg, n, docf[bg]) for bg, n in tf.items()}
    assert got == want


def test_top_bigrams_limit_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "z y z y"), (2, "a b a b")], "doc_id long, text string"
    )
    out = top_bigrams(df, top_n=2).collect()
    # tf: 'a b'=2, 'z y'=2, 'b a'=1, 'y z'=1 — the tf-2 pair wins,
    # ordered by bigram asc
    assert [r.bg for r in out] == ["a b", "z y"]


# ----------------------------------------------------------- blocklist audit
def test_blocklist_audit_counts_and_zero_row(spark):
    rows = [
        (1, "slow join slow scan"),
        (2, "the slowest join"),  # 'slowest' must NOT match 'slow'
        (3, "dup dup dup"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: r for r in blocklist_audit(df, ["slow", "dup", "leak"]).collect()}
    assert set(out) == {"slow", "dup", "leak"}
    assert (out["slow"].n_docs, out["slow"].n_occurrences) == (1, 2)
    assert (out["dup"].n_docs, out["dup"].n_occurrences) == (1, 3)
    assert (out["leak"].n_docs, out["leak"].n_occurrences) == (0, 0)
    assert out["slow"].doc_share == 0.25
    assert out["leak"].doc_share == 0.0


def test_blocklist_audit_rejects_empty_list(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        blocklist_audit(df, [])


# --------------------------------------------------------- minhash band sweep
def _dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup
        (4, "completely different text about spark shuffle partitions"),
        (5, "another unrelated document mentioning join order and hash"),
        (6, base + " with a small suffix"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_band_sweep_nested_candidates(spark):
    docs = _dup_docs(spark)
    out = {r.bands: r for r in minhash_band_sweep(docs, threshold=0.5).collect()}
    assert set(out) == {2, 4, 8}
    assert out[2].rows_per_band == 8 and out[8].rows_per_band == 2
    # aligned band slices nest: fewer, wider bands can only drop candidates
    assert out[2].n_candidates <= out[4].n_candidates <= out[8].n_candidates
    for r in out.values():
        assert 0 <= r.n_dups <= r.n_candidates
        assert 0.0 <= r.precision <= 1.0
    # the default 4x4 configuration is exactly minhash_lsh_dups
    assert out[4].n_dups == minhash_lsh_dups(docs, threshold=0.5).count()
    # the exact-dup pair must be a candidate in every configuration
    assert out[2].n_dups >= 1


def test_minhash_band_sweep_rejects_bad_config(spark):
    docs = _dup_docs(spark)
    with pytest.raises(ValueError):
        minhash_band_sweep(docs, configs=((3, 5),)).collect()


# ------------------------------------------------------ warm-start PageRank
def test_pagerank_warm_2_plus_3_equals_cold_5(spark):
    g = graph_from_edges(spark, web64())
    cold = pagerank(g, mode="textbook", iterations=5)
    warm = pagerank(g, mode="textbook", iterations=2)
    res = pagerank(g, mode="textbook", iterations=3, init_ranks=warm.ranks)
    got = {r.id: r.rank for r in res.ranks.collect()}
    want = {r.id: r.rank for r in cold.ranks.collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)
