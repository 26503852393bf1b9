"""Wave-8 operators: conversation stats, role transitions, TF-IDF doc-pair
similarity, length deciles."""

import math

from pyspark.sql import functions as F


def _mk_transcripts(spark, rows):
    """rows: (conv_id, turn_idx, role, text, tool)."""
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    )


# ---------------------------------------------------------------- conv stats
def test_conv_stats_values(spark):
    from linkgraph_spark.transcripts import conv_stats

    t = _mk_transcripts(
        spark,
        [
            ("c1", 0, "user", "hi", None),
            ("c1", 1, "assistant", "yo", "search"),
            ("c1", 2, "user", "ok", None),
            ("c1", 3, "assistant", "done", "search"),
            ("c2", 0, "system", "boot", None),
        ],
    )
    got = {r["conv_id"]: r.asDict() for r in conv_stats(t).collect()}
    c1 = got["c1"]
    assert c1["n_turns"] == 4 and c1["n_roles"] == 2
    assert c1["n_tool_calls"] == 2 and c1["n_tools"] == 1
    assert c1["user_frac"] == 0.5
    c2 = got["c2"]
    assert c2["n_tool_calls"] == 0 and c2["n_tools"] == 0
    assert c2["user_frac"] == 0.0


# ----------------------------------------------------------- role transitions
def test_role_transitions_counts_and_probs(spark):
    from linkgraph_spark.transcripts import role_transitions

    t = _mk_transcripts(
        spark,
        [
            ("c1", 0, "user", "a", None),
            ("c1", 1, "assistant", "b", None),
            ("c1", 2, "user", "c", None),
            ("c2", 0, "user", "d", None),
            ("c2", 1, "system", "e", None),
        ],
    )
    got = {
        (r["src_role"], r["dst_role"]): (r["n_trans"], r["prob"])
        for r in role_transitions(t).collect()
    }
    # user→assistant, user→system (one each of user's 2 transitions);
    # assistant→user is assistant's only transition
    assert got[("user", "assistant")] == (1, 0.5)
    assert got[("user", "system")] == (1, 0.5)
    assert got[("assistant", "user")] == (1, 1.0)
    # conversations never chain into each other
    assert ("user", "user") not in got


# ------------------------------------------------------------ tfidf doc pairs
def test_tfidf_doc_pairs_identical_docs_cosine_one(spark):
    from linkgraph_spark.functions.text import tfidf_doc_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "delta epsilon zeta"),
            (4, "delta epsilon zeta"),
            (5, "unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared_terms"], r["cosine"])
        for r in tfidf_doc_pairs(
            docs, min_df=2, max_df_frac=0.9, min_sim=0.5, min_shared=2
        ).collect()
    }
    assert got[(1, 2)] == (3, 1.0)
    assert got[(3, 4)] == (3, 1.0)
    assert len(got) == 2  # doc 5's terms are df=1, below min_df


def test_tfidf_doc_pairs_partial_overlap_value(spark):
    from linkgraph_spark.functions.text import tfidf_doc_pairs

    # docs 1-2 share {a b}, each has one private term; all terms df>=2 via
    # padding docs 3-4 that hold the private terms
    docs = spark.createDataFrame(
        [
            (1, "a b x"),
            (2, "a b y"),
            (3, "x q"),
            (4, "y q"),
        ],
        "doc_id long, text string",
    )
    res = tfidf_doc_pairs(
        docs, min_df=2, max_df_frac=0.9, min_sim=0.1, min_shared=2
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in res}
    r12 = got[(1, 2)]
    assert r12["n_shared_terms"] == 2
    # weights: a,b,x,y all df=2, N=4 → w = ln 2 each; cos = 2/3
    assert abs(r12["cosine"] - round(2 / 3, 6)) < 1e-6


# -------------------------------------------------------------- length deciles
def test_length_deciles_uniform_100(spark):
    from linkgraph_spark.functions.text import length_deciles

    docs = spark.createDataFrame(
        [(i, "x", i + 1) for i in range(100)],
        "doc_id long, text string, n_chars long",
    )
    got = {r["doc_id"]: r["decile"] for r in length_deciles(docs).collect()}
    # 10 docs per decile on a uniform 1..100 ladder
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == set(range(1, 11))
    assert all(v == 10 for v in c.values())
    assert got[0] == 1 and got[99] == 10


def test_length_deciles_constant_corpus_single_bin(spark):
    from linkgraph_spark.functions.text import length_deciles

    docs = spark.createDataFrame(
        [(i, "x", 42) for i in range(10)],
        "doc_id long, text string, n_chars long",
    )
    got = length_deciles(docs).collect()
    # every cut equals 42; nothing is strictly above any cut → all decile 1
    assert all(r["decile"] == 1 for r in got)
