"""Dedup/similarity operator tests: scale-safe plan shapes (no cross joins,
no all-shared-shingle-pairs verification) and semantics of the banded /
capped / LSH candidate paths vs their exact all-pairs definitions."""

import re

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.functions import dedup as dd
from linkgraph_spark.functions import similarity as sim

SF_DIR = "/root/testdata/sf0.001"
BAD_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# ------------------------------------------------------------- plan audits
def test_no_cross_join_plans(spark, docs, embs):
    """Every candidate-generating dedup/similarity operator must plan as
    equi-joins — a CartesianProduct or BroadcastNestedLoopJoin is the
    all-pairs scale-killer these operators exist to avoid. (cosine_topk and
    ivf_knn intentionally broadcast a tiny query/codebook side and are
    audited separately.)"""
    cases = {
        "ngram_jaccard_dups": dd.ngram_jaccard_dups(docs, threshold=0.5),
        "ngram_jaccard_capped": dd.ngram_jaccard_dups(docs, 0.5, max_doc_freq=100),
        "minhash_lsh_dups": dd.minhash_lsh_dups(docs, threshold=0.5),
        "simhash_dups": dd.simhash_dups(docs, max_hamming=3),
        "embedding_near_dups": sim.embedding_near_dups(embs, threshold=0.35),
        "lsh_knn": sim.lsh_knn(embs),
    }
    for name, df in cases.items():
        plan = _plan(df)
        for bad in BAD_NODES:
            assert bad not in plan, f"{name}: {bad} in plan\n{plan}"


def test_minhash_verify_not_flat_join(spark, docs):
    """The MinHash verification must not re-enumerate all shared-shingle
    pairs (the flat⋈flat join LSH exists to avoid): the only Generate nodes
    allowed are the banded posexplode — no bare explode of the shingle
    array feeding a join."""
    plan = _plan(dd.minhash_lsh_dups(docs, threshold=0.5))
    assert not re.search(r"(?<!pos)explode\(sh", plan), plan


# -------------------------------------------------- banded simhash semantics
def test_simhash_banded_equals_all_pairs(spark, docs):
    """Pigeonhole guarantee: the banded equi-join output is identical to the
    all-pairs Hamming ≤ 3 definition."""
    s = dd.simhash(docs).persist()
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= 3)
        .collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dd.simhash_dups(docs, max_hamming=3).collect()
    }
    s.unpersist()
    assert banded == brute


# ------------------------------------------------- shingle DF cap semantics
def _hot_docs(spark):
    rows = [
        (0, "zzz yyy xxx the cat sat on the mat today ok"),
        (1, "zzz yyy xxx the cat sat on the mat tonight ok"),
        (2, "zzz yyy xxx completely different words here alpha beta"),
        (3, "zzz yyy xxx unrelated tokens entirely gamma delta epsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_doc_freq_cap(spark):
    """The hot shingle 'zzz yyy xxx' (doc-freq 4) must stop generating
    candidates under max_doc_freq=3; pairs still reachable through rare
    shingles keep their EXACT jaccard (verification uses full arrays)."""
    d = _hot_docs(spark)
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_dups(d, threshold=0.01).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_dups(d, threshold=0.01, max_doc_freq=3).collect()
    }
    # (2,3) share ONLY the hot shingle → present uncapped, dropped capped
    assert (2, 3) in uncapped and (2, 3) not in capped
    # (0,1) share rare shingles → present in both with identical exact jaccard
    assert capped[(0, 1)] == uncapped[(0, 1)]
    # every capped pair is an uncapped pair with the same value (no fabrication)
    assert all(uncapped[k] == v for k, v in capped.items())


# ------------------------------------------- embedding LSH recall vs exact
def test_embedding_near_dups_recall(spark, embs):
    """LSH-candidate near-dups must be a subset of the exact all-pairs
    result (verified pairs are always true positives) with high recall at
    the gate threshold."""
    exact = {
        (r["vec_a"], r["vec_b"]) for r in sim.embedding_near_dups_exact(embs, 0.35).collect()
    }
    lsh = {(r["vec_a"], r["vec_b"]) for r in sim.embedding_near_dups(embs, 0.35).collect()}
    assert lsh <= exact
    assert len(lsh) >= 0.9 * len(exact), f"recall {len(lsh)}/{len(exact)}"


def test_embedding_clusters_transitive_closure(spark, embs):
    """Clusters = transitive closure of the near-dup pair relation: every
    pair's endpoints share a keeper, the keeper is each cluster's min
    vec_id, sizes count members, and non-dup vectors are singletons
    covering the whole table."""
    pairs = [
        (r["vec_a"], r["vec_b"])
        for r in sim.embedding_near_dups(embs, 0.35).collect()
    ]
    # python union-find over the same pairs
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_groups: dict = {}
    for v in list(parent):
        want_groups.setdefault(find(v), set()).add(v)
    got = {
        r["vec_id"]: (r["keeper_id"], r["cluster_size"])
        for r in sim.embedding_clusters(embs, 0.35).collect()
    }
    n_vecs = embs.count()
    assert len(got) == n_vecs  # total coverage
    assert pairs, "fixture produced no near-dup pairs; threshold too high"
    for root, members in want_groups.items():
        keeper = min(members)
        for m in members:
            assert got[m] == (keeper, len(members))
    clustered = {v for ms in want_groups.values() for v in ms}
    for v, (keeper, size) in got.items():
        if v not in clustered:
            assert (keeper, size) == (v, 1)  # singleton


def test_vocab_stats_matches_hand_computation(spark):
    from collections import Counter

    from linkgraph_spark.functions.text import vocab_stats

    rows = [
        (0, "spark row spark  ROW agg"),
        (1, "row agg agg"),
        (2, "spark"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    tf = Counter()
    df_ = Counter()
    for _, t in rows:
        toks = t.lower().split()
        tf.update(toks)
        df_.update(set(toks))
    got = [(r["term"], r["tf"], r["df"]) for r in vocab_stats(d, top_n=2).collect()]
    # all three terms tie at tf=3; term-asc tie-break picks agg, row
    assert got == [("agg", 3, 2), ("row", 3, 2)]
    full = {r["term"]: (r["tf"], r["df"]) for r in vocab_stats(d, top_n=10).collect()}
    assert full == {t: (tf[t], df_[t]) for t in tf}


def test_curate_corpus_reason_codes(spark):
    """Each filter fires on a doc built to trip exactly it; a clean doc
    keeps with no reasons; the exact-dup keeper is the smallest doc_id."""
    from linkgraph_spark.functions.curation import curate_corpus

    clean = "the cat and the dog walk to the park with a friend today fine"
    rows = [
        (0, clean),
        (1, "word " + clean),  # near-identical but NOT an exact dup
        (2, clean.upper()),  # exact dup of 0 after normalization
        (3, "tiny doc"),  # too_short
        (4, "??!!.. ??!!.. the and of to in is on for day ok"),  # punct 12/47
        (5, "zebra quark lattice photon meson gluon"),  # stopword floor
        (6, ("the dog " * 20).strip()),  # low diversity + repetition
        (7, None),  # NULL text must still get a verdict (too_short)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["keep"], list(r["reasons"]))
        for r in curate_corpus(d).collect()
    }
    assert got[0] == (True, [])
    assert got[1] == (True, [])
    assert got[2] == (False, ["exact_dup"])
    assert got[3][0] is False and "too_short" in got[3][1]
    assert got[4][0] is False and "punct" in got[4][1]
    assert got[5][0] is False and "stopword" in got[5][1]
    assert got[6][0] is False and {"low_diversity", "repetition"} <= set(got[6][1])
    assert 7 in got  # NULL text is accounted for, never silently dropped
    assert got[7][0] is False and "too_short" in got[7][1]


def test_repetition_stats_closed_form(spark):
    from linkgraph_spark.functions.text import repetition_stats

    rows = [
        (0, "a a a a"),  # uniq 1/4, bigrams [a a]x3 dup 2/3, top 4/4
        (1, "w x y z"),  # all distinct: uniq 1, dup 0, top 1/4
        (2, "one"),  # single token: no bigrams -> dup 0 (not fabricated)
        (3, "go go stop go"),  # uniq 2/4; bigrams gg,gs,sg distinct; top 3/4
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["unique_token_ratio"],
            r["dup_bigram_fraction"],
            r["top_token_fraction"],
        )
        for r in repetition_stats(d).collect()
    }
    assert got[0] == (0.25, round(2 / 3, 6), 1.0)
    assert got[1] == (1.0, 0.0, 0.25)
    assert got[2] == (1.0, 0.0, 1.0)
    assert got[3] == (0.5, 0.0, 0.75)


def test_dedup_corpus_keepers_only(spark):
    """dedup_corpus = exactly the keeper of each near-dup cluster, with the
    cluster's raw-doc count as dedup weight; the corpus covers every
    original doc through its keeper."""
    from linkgraph_spark.functions.dedup import dedup_corpus, near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, base + " tail zero"),
        (1, base + " tail one"),
        (2, base + " tail two"),
        (7, "completely different text about unrelated topics entirely here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = {r["doc_id"]: r["cluster_size"] for r in dedup_corpus(d, 0.5).collect()}
    assert corpus == {0: 3, 7: 1}
    keepers = {
        r["keeper_id"] for r in near_dup_clusters(d, 0.5).collect()
    }
    assert keepers == set(corpus)  # every doc's keeper survives


def test_tfidf_top_terms_matches_hand_computation(spark):
    import math

    from linkgraph_spark.functions.text import tfidf_top_terms

    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "cherry cherry durian"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    docs = {i: t.split() for i, t in rows}
    n = len(rows)
    want = {}
    for i, toks in docs.items():
        scores = {}
        for t in set(toks):
            df = sum(t in d2 for d2 in docs.values())
            scores[t] = round(toks.count(t) * math.log(n / df), 6)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        want[i] = top
    got = {}
    for r in tfidf_top_terms(d, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["term"], r["tfidf"]))
    got = {i: sorted(v, key=lambda kv: (-kv[1], kv[0])) for i, v in got.items()}
    assert got == want


def test_redact_pii_explicit(spark):
    from linkgraph_spark.functions.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567."),
            (2, "server 192.168.1.250 logged 3 errors"),
            (3, "no pii here, just words and the number 7"),
            # phone-bounds pins: separator runs (padded column) must
            # survive; a bare 7-digit number redacts. A >15-digit ID still
            # partially matches (greedy 15-digit prefix) — no-lookaround
            # regexes can't refuse a longer digit context, pinned as-is
            (4, "order 12345678901234567890 total"),
            (5, "padded 12   34   56   78   90 table"),
            (6, "call 5551234 now"),
            # documented false positive (see redact_pii docstring): digit-
            # dense ISO timestamp redacts — pinned so a silent behavior
            # change is caught
            (7, "logged at 2026-08-17 12:00"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert got[1] == "mail me at [EMAIL] or call [PHONE]."
    assert got[2] == "server [IP] logged 3 errors"
    assert got[3] == "no pii here, just words and the number 7"
    assert got[4] == "order [PHONE]67890 total"
    assert got[5] == "padded 12   34   56   78   90 table"
    assert got[6] == "call [PHONE] now"
    assert "[PHONE]" in got[7]


def test_unigram_lm_score_closed_form(spark):
    import math

    from linkgraph_spark.functions.text import unigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    # corpus: a=3, b=1, c=1, N=5
    got = {r["doc_id"]: r for r in unigram_lm_score(docs).collect()}
    want1 = (2 * math.log(3 / 5) + math.log(1 / 5)) / 3
    want2 = (math.log(3 / 5) + math.log(1 / 5)) / 2
    assert got[1]["n_tokens"] == 3 and abs(got[1]["lm_score"] - round(want1, 6)) < 1e-9
    assert got[2]["n_tokens"] == 2 and abs(got[2]["lm_score"] - round(want2, 6)) < 1e-9
    # rare-symbol doc scores strictly below the common-token doc
    assert got[2]["lm_score"] < got[1]["lm_score"]


def test_contamination_check_flags_copies(spark):
    from linkgraph_spark.functions.dedup import contamination_check

    bench_text = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (0, bench_text),                       # the benchmark doc itself
            (1, bench_text),                       # verbatim copy -> flagged
            (2, "quick brown fox jumps over it"),  # partial overlap
            (3, "completely unrelated text here"), # clean
        ],
        "doc_id long, text string",
    )
    bench = docs.where("doc_id = 0")
    got = {r["doc_id"]: r for r in contamination_check(docs, bench, min_shared=2).collect()}
    # self never matches; the copy shares all 7 shingles of the benchmark
    assert 0 not in got and 3 not in got
    assert got[1]["shared_shingles"] == 7 and got[1]["bench_docs"] == 1
    # partial overlap: 'quick brown fox', 'brown fox jumps', 'fox jumps over'
    assert got[2]["shared_shingles"] == 3
    # raising the threshold drops the partial hit
    strict = contamination_check(docs, bench, min_shared=5)
    assert {r["doc_id"] for r in strict.collect()} == {1}


def test_doc_chunks_sliding_windows(spark):
    """64/48 default elsewhere; here 4-token windows with stride 3 on a
    7-token doc → starts 0,3,6 with the last chunk short; empty text still
    yields one (empty) chunk so no document silently disappears."""
    from linkgraph_spark.functions.text import doc_chunks

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "x y")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        for r in doc_chunks(docs, chunk_size=4, stride=3).collect()
    )
    assert rows == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "d e f g"),  # 1-token overlap
        (1, 2, 1, "g"),       # short tail chunk
        (2, 0, 1, ""),        # empty doc → one empty chunk
        (3, 0, 2, "x y"),
    ]


def test_corpus_stats_hand_values(spark):
    from linkgraph_spark.functions.text import corpus_stats

    docs = spark.createDataFrame(
        [(1, "a b", "aa"), (2, "x", "aa"), (3, "p q r", "bb")],
        "doc_id long, text string, lang string",
    )
    rows = {r["lang"]: r for r in corpus_stats(docs).collect()}
    assert rows["aa"]["n_docs"] == 2
    assert rows["aa"]["total_tokens"] == 3
    assert rows["aa"]["mean_chars"] == 2.0  # (3 + 1) / 2
    assert rows["aa"]["p50_chars"] == 2.0   # median of [1, 3]
    assert rows["bb"]["total_tokens"] == 3 and rows["bb"]["p50_chars"] == 5.0


def test_oov_rate_hand_values(spark):
    from linkgraph_spark.functions.text import oov_rate

    rows = [
        (0, "a a a b"),      # corpus tf: a=4, b=2, c=1
        (1, "a b c"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    # vocab_size=2 -> vocab {a, b}; c is OOV
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in oov_rate(d, vocab_size=2).collect()
    }
    assert got == {0: (4, 0, 0.0), 1: (3, 1, round(1 / 3, 6))}


def test_oov_rate_vocab_tie_breaks_term_asc(spark):
    from linkgraph_spark.functions.text import oov_rate

    # x and y tie at tf=2; vocab_size=1 keeps 'x' (term asc), 'y' is OOV
    d = spark.createDataFrame([(0, "x y x y")], "doc_id long, text string")
    [r] = oov_rate(d, vocab_size=1).collect()
    assert (r.n_tokens, r.n_oov, r.oov_rate) == (4, 2, 0.5)
