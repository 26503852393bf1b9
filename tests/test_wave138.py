"""Wave-138 operator: per-source Chao1 vocabulary richness."""

import math

from linkgraph_spark.functions.text import chao1_vocab

_SCHEMA = "doc_id long, text string, lang string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s) for i, (s, t) in enumerate(rows, 1)], _SCHEMA
    )


def test_chao1_hand_computed(spark):
    # source A: freqs {the:3, cat:2, dog:2, bird:1, fish:1, mouse:1}
    corpus = [
        ("A", "the cat dog bird"),
        ("A", "the cat dog fish"),
        ("A", "the mouse"),
    ]
    out = chao1_vocab(_docs(spark, corpus)).collect()[0]
    v, f1, f2, n = 6, 3, 2, 10
    chao = v + f1 * f1 / (2.0 * f2)
    r = f1 / f2
    se = math.sqrt(f2 * (0.5 * r * r + r**3 + 0.25 * r**4))
    assert (out.n_tokens, out.v_obs, out.f1, out.f2) == (n, v, f1, f2)
    assert out.chao1 == round(chao, 6)
    assert out.chao1_se == round(se, 6)
    assert out.chao1 > out.v_obs


def test_chao1_no_doubletons_bias_corrected(spark):
    corpus = [("B", "aa bb cc aa aa")]  # freqs {aa:3, bb:1, cc:1}: f2 = 0
    out = chao1_vocab(_docs(spark, corpus)).collect()[0]
    assert out.f2 == 0
    assert out.chao1 == round(3 + 2 * 1 / 2.0, 6)  # v + f1(f1-1)/2
    assert out.chao1_se is None


def test_chao1_saturated_vocab(spark):
    # every term seen 3+ times: f1 = f2 = 0 -> chao1 == v_obs
    corpus = [("C", "x y x y x y")]
    out = chao1_vocab(_docs(spark, corpus)).collect()[0]
    assert out.f1 == 0 and out.chao1 == float(out.v_obs)


def test_chao1_per_source_rows(spark):
    corpus = [("A", "a b c"), ("B", "d d e")]
    out = chao1_vocab(_docs(spark, corpus)).collect()
    assert [r.source for r in out] == ["A", "B"]
