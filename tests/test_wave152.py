"""Wave-152 operators: quality-aware dedup keeper and the verbatim
memorization probe."""

import hashlib

import pytest

from linkgraph_spark.functions.dedup import dedup_corpus, dedup_corpus_best_quality
from linkgraph_spark.functions.text import memorization_rate


def _variant(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 2


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


GOOD = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the garden and the birds are singing in the trees all day"
)
# same shingles but drowned in punctuation (punct_ratio > 0.2 drops one
# 0.25 quality band) -> same cluster, lower quality
BAD = GOOD + " " + " ".join(["!!!!!!!!!!!!"] * 5)


def test_best_quality_keeper_beats_min_id(spark):
    # doc 1 is the LOW-quality copy but has the smaller id: dedup_corpus
    # keeps 1 (min id), dedup_corpus_best_quality must keep 2
    docs = [(1, BAD), (2, GOOD), (50, "completely different text about "
                                      "spark plans and shuffles in the engine")]
    plain = {r.doc_id for r in dedup_corpus(_docs_df(spark, docs)).collect()}
    best_rows = dedup_corpus_best_quality(_docs_df(spark, docs)).collect()
    best = {r.doc_id: (r.cluster_size, r.quality) for r in best_rows}
    assert 1 in plain and 2 not in plain
    assert 2 in best and 1 not in best
    assert best[2][0] == 2  # the pair collapsed to one keeper
    assert 50 in best and best[50][0] == 1  # singleton keeps itself
    assert len(best) == 2


def test_best_quality_tie_breaks_by_min_id(spark):
    # identical texts → identical quality → min id wins deterministically
    docs = [(7, GOOD), (3, GOOD)]
    rows = dedup_corpus_best_quality(_docs_df(spark, docs)).collect()
    assert [(r.doc_id, r.cluster_size) for r in rows] == [(3, 2)]


def test_memorization_rate_full_and_zero(spark):
    tr = [i for i in range(40) if _variant(i) == 0]
    te = [i for i in range(40) if _variant(i) == 1]
    train_text = "a b c d e f g h i j k l"  # 12 tokens → 5 8-gram windows
    docs = [(tr[0], train_text),
            (te[0], train_text),                       # verbatim copy
            (te[1], "z y x w v u t s r q p o")]        # disjoint
    got = {r.doc_id: r for r in memorization_rate(_docs_df(spark, docs)).collect()}
    assert set(got) == {te[0], te[1]}
    assert got[te[0]].n_windows == 5 and got[te[0]].mem_rate == 1.0
    assert got[te[1]].n_windows == 5 and got[te[1]].mem_rate == 0.0


def test_memorization_rate_partial_overlap_and_short_docs_drop(spark):
    tr = [i for i in range(40) if _variant(i) == 0]
    te = [i for i in range(40) if _variant(i) == 1]
    docs = [
        (tr[0], "one two three four five six seven eight"),  # exactly 1 window
        (te[0], "one two three four five six seven eight nine"),  # 2 windows, 1 hit
        (te[1], "too short"),  # < 8 tokens → no row
    ]
    got = {r.doc_id: r for r in memorization_rate(_docs_df(spark, docs)).collect()}
    assert set(got) == {te[0]}
    r = got[te[0]]
    assert (r.n_windows, r.n_memorized) == (2, 1)
    assert r.mem_rate == pytest.approx(0.5, abs=1e-9)
