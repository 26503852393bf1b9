"""Wave-26 operators: Heaps'-law vocabulary growth, nearest-centroid
label purity."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.functions.similarity import centroid_purity
from linkgraph_spark.functions.text import vocab_growth


# ---------------------------------------------------------------- vocab_growth
def test_vocab_growth_hand_curve(spark):
    docs = [
        (0, "a b"),        # bucket 0: terms a,b — 2 tokens
        (1, "a c"),        # c new — 2 tokens
        (2, "a b c"),      # nothing new — 3 tokens
        (3, "d"),          # bucket 2: d new
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.bucket: r for r in vocab_growth(df, bucket_width=2).collect()}
    b0, b1 = rows[0], rows[2]
    assert (b0.n_docs, b0.n_tokens, b0.new_terms) == (2, 4, 3)
    assert (b0.docs_cum, b0.tokens_cum, b0.vocab_cum) == (2, 4, 3)
    assert b0.heaps_exp == pytest.approx(
        round(math.log(3) / math.log(4), 6), abs=1e-9
    )
    assert (b1.n_docs, b1.n_tokens, b1.new_terms) == (2, 4, 1)
    assert (b1.docs_cum, b1.tokens_cum, b1.vocab_cum) == (4, 8, 4)
    assert b1.heaps_exp == pytest.approx(
        round(math.log(4) / math.log(8), 6), abs=1e-9
    )


def test_vocab_growth_repeat_only_corpus_flat(spark):
    # after the first bucket no new terms ever appear
    docs = [(i, "same words again") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = sorted(vocab_growth(df, bucket_width=2).collect(), key=lambda r: r.bucket)
    assert rows[0].new_terms == 3
    assert all(r.new_terms == 0 for r in rows[1:])
    assert rows[-1].vocab_cum == 3
    with pytest.raises(ValueError):
        vocab_growth(df, bucket_width=0)


# ------------------------------------------------------------- centroid_purity
def _embs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_centroid_purity_separated_clusters(spark):
    rows = [
        (0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 1), (3, [0.1, 0.9], 1),
    ]
    got = {r.label: r for r in centroid_purity(_embs(spark, rows)).collect()}
    assert got[0].purity == 1.0 and got[1].purity == 1.0
    assert got[0].n == 2 and got[0].n_correct == 2


def test_centroid_purity_flags_the_misplaced_vector(spark):
    # vec 4 is labeled 0 but sits in cluster 1's territory
    rows = [
        (0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 1), (3, [0.1, 0.9], 1),
        (4, [0.0, 0.95], 0),
    ]
    got = {r.label: r for r in centroid_purity(_embs(spark, rows)).collect()}
    # centroid 0 drags toward (0.63, 0.35) but vec 4 is still closer to
    # centroid 1 at (0.05, 0.95)
    assert got[0].n == 3 and got[0].n_correct == 2
    assert got[0].purity == pytest.approx(round(2 / 3, 6), abs=1e-9)
    assert got[1].purity == 1.0


def test_centroid_purity_single_label_is_always_pure(spark):
    rows = [(i, [float(i), 1.0], 7) for i in range(4)]
    got = centroid_purity(_embs(spark, rows)).collect()
    assert len(got) == 1 and got[0].purity == 1.0
