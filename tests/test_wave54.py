"""Wave-54 operators: vocab richness (hapax + Yule's K), Davies-Bouldin
index, curation funnel."""

import pytest

from linkgraph_spark.functions.curation import curation_funnel
from linkgraph_spark.functions.similarity import davies_bouldin
from linkgraph_spark.functions.text import vocab_richness


# --------------------------------------------------------------- vocab_richness
def test_vocab_richness_hand(spark):
    # source A: tokens a a a b -> N=4, V=2, V1=1 (b), m2 = 9+1 = 10
    # yule_k = 1e4 * (10 - 4) / 16 = 3750
    docs = spark.createDataFrame(
        [(0, "a a a", "A"), (1, "b", "A")],
        "doc_id long, text string, source string",
    )
    r = vocab_richness(docs).collect()[0]
    assert r.n_tokens == 4 and r.n_terms == 2
    assert r.hapax_share == pytest.approx(0.5)
    assert r.yule_k == pytest.approx(3750.0)


def test_vocab_richness_all_hapax(spark):
    # every term once: yule_k = 0, hapax_share = 1
    docs = spark.createDataFrame(
        [(0, "x y z", "A")], "doc_id long, text string, source string"
    )
    r = vocab_richness(docs).collect()[0]
    assert r.hapax_share == pytest.approx(1.0)
    assert r.yule_k == pytest.approx(0.0)


def test_vocab_richness_per_source_independent(spark):
    docs = spark.createDataFrame(
        [(0, "a a", "A"), (1, "a b c", "B")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in vocab_richness(docs).collect()}
    assert got["A"].n_terms == 1 and got["A"].hapax_share == 0.0
    assert got["B"].n_terms == 3 and got["B"].hapax_share == 1.0


# --------------------------------------------------------------- davies_bouldin
def test_davies_bouldin_hand(spark):
    # 1-D: a={0, 2}, b={10, 12}; S_a = S_b = 1; M = 10
    # R_ab = (1+1)/10 = 0.2; DB = 0.2
    embs = spark.createDataFrame(
        [(0, [0.0], "a"), (1, [2.0], "a"), (2, [10.0], "b"), (3, [12.0], "b")],
        "vec_id long, embedding array<float>, label string",
    )
    r = davies_bouldin(embs).collect()[0]
    assert r.n_labels == 2
    assert r.db_index == pytest.approx(0.2)


def test_davies_bouldin_worst_pair_wins(spark):
    # three labels; c=far away, a/b close together -> max pair dominates
    embs = spark.createDataFrame(
        [
            (0, [0.0], "a"), (1, [2.0], "a"),
            (2, [4.0], "b"), (3, [6.0], "b"),
            (4, [100.0], "c"), (5, [102.0], "c"),
        ],
        "vec_id long, embedding array<float>, label string",
    )
    r = davies_bouldin(embs).collect()[0]
    # a-b: (1+1)/4 = 0.5 is each of a,b's max; c's max is tiny
    # DB = (0.5 + 0.5 + (1+1)/96) / 3
    assert r.db_index == pytest.approx((0.5 + 0.5 + 2.0 / 96.0) / 3, abs=1e-6)


def test_davies_bouldin_degenerate_null(spark):
    # one label -> NULL
    embs = spark.createDataFrame(
        [(0, [1.0], "a"), (1, [2.0], "a")],
        "vec_id long, embedding array<float>, label string",
    )
    assert davies_bouldin(embs).collect()[0].db_index is None
    # coincident centroids -> infinite DB -> NULL
    embs2 = spark.createDataFrame(
        [(0, [0.0], "a"), (1, [2.0], "a"), (2, [0.0], "b"), (3, [2.0], "b")],
        "vec_id long, embedding array<float>, label string",
    )
    assert davies_bouldin(embs2).collect()[0].db_index is None


# --------------------------------------------------------------- curation_funnel
def test_curation_funnel_kept_and_reasons(spark):
    good = "the quick brown fox jumps over the lazy dog again " * 2
    docs = spark.createDataFrame(
        [
            (0, good, "A"),
            (1, good, "A"),          # exact dup of 0
            (2, "a b", "A"),          # too_short
            (3, good + " extra", "B"),
        ],
        "doc_id long, text string, source string",
    )
    rows = curation_funnel(docs).collect()
    got = {(r.source, r.reason): r for r in rows}
    assert got[("A", "__kept__")].n_docs == 1
    assert got[("A", "exact_dup")].n_docs == 1
    assert got[("A", "too_short")].n_docs == 1
    assert got[("B", "__kept__")].frac_of_source == pytest.approx(1.0)
    # __kept__ rows partition each source together with dropped docs
    a_total = sum(
        r.n_docs for r in rows if r.source == "A" and r.reason == "__kept__"
    ) + len({r.reason for r in rows if r.source == "A"} - {"__kept__"})
    assert a_total == 3  # 1 kept + 2 distinct dropped docs (1 reason each)


def test_curation_funnel_multireason_counts_twice(spark):
    # "x x x x" fails stopword AND low_diversity -> two reason rows
    docs = spark.createDataFrame(
        [(0, "x x x x x x", "A")], "doc_id long, text string, source string"
    )
    rows = curation_funnel(docs).collect()
    reasons = {r.reason for r in rows}
    assert "stopword" in reasons and "low_diversity" in reasons
    assert all(r.frac_of_source == pytest.approx(1.0) for r in rows)
    assert "__kept__" not in reasons
