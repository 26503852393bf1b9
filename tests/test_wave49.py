"""Wave-49 operators: syllable readability profile, per-language char
trigrams, kNN hubness histogram."""

import pytest

from linkgraph_spark.functions.similarity import knn_hubness
from linkgraph_spark.functions.text import char_trigrams, readability


# ------------------------------------------------------------------ readability
def test_readability_hand(spark):
    # "go going private": vowel groups 1/1/3 → syl_per_word = 5/3,
    # complex (≥3 groups) share = 1/3, avg word len = (2+5+7)/3
    docs = spark.createDataFrame(
        [(0, "go going private")], "doc_id long, text string"
    )
    r = readability(docs).collect()[0]
    assert r.n_words == 3
    assert r.syl_per_word == pytest.approx(round(5 / 3, 6))
    assert r.complex_share == pytest.approx(round(1 / 3, 6))
    assert r.avg_word_len == pytest.approx(round(14 / 3, 6))


def test_readability_y_is_vowel_and_case_folds(spark):
    # "RHYTHM" → lowercased "rhythm": single 'y' group → 1 syllable
    docs = spark.createDataFrame([(0, "RHYTHM")], "doc_id long, text string")
    r = readability(docs).collect()[0]
    assert r.n_words == 1 and r.syl_per_word == pytest.approx(1.0)
    assert r.complex_share == 0.0


# ---------------------------------------------------------------- char_trigrams
def test_char_trigrams_hand(spark):
    docs = spark.createDataFrame(
        [(0, "aaaa", "en"), (1, "abab", "de"), (2, "ab", "de")],
        "doc_id long, text string, lang string",
    )
    rows = char_trigrams(docs, top_n=10).collect()
    got = {(r.lang, r.trigram): (r.n_occurrences, r.rk) for r in rows}
    assert got[("en", "aaa")] == (2, 1)          # positions 1 and 2
    assert got[("de", "aba")] == (1, 1)          # tie broken lexicographically
    assert got[("de", "bab")] == (1, 2)
    assert ("de", "ab") not in got               # <3 chars contributes nothing


def test_char_trigrams_whitespace_normalized(spark):
    # runs of whitespace collapse to ONE space before windowing
    docs = spark.createDataFrame(
        [(0, "ab   cd", "en")], "doc_id long, text string, lang string"
    )
    trigrams = {r.trigram for r in char_trigrams(docs, top_n=10).collect()}
    assert trigrams == {"ab ", "b c", " cd"}


# ------------------------------------------------------------------ knn_hubness
def test_knn_hubness_invariants(spark, sf_dir="/root/testdata/sf0.001"):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = embs.count()
    k = 4
    rows = knn_hubness(embs, k=k).collect()
    # the histogram partitions the id universe
    assert sum(r.n_vectors for r in rows) == n
    # total k-occurrences == total kNN edges == Σ per-query top-k sizes ≤ n*k
    total_occ = sum(r.k_occurrences * r.n_vectors for r in rows)
    assert 0 < total_occ <= n * k
    assert all(r.k_occurrences >= 0 and r.n_vectors > 0 for r in rows)


def test_knn_hubness_isolated_bucket_gives_zero_row(spark):
    # 3 identical vectors share one bucket; each appears in both others'
    # top-k → k_occurrences 2 for all; no zero row
    embs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.k_occurrences: r.n_vectors for r in knn_hubness(embs, k=4).collect()}
    assert rows == {2: 3}
