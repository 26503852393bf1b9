"""Wave-96 operators: Good–Turing frequency-of-frequencies + missing
mass (Good 1953) and one-vs-rest chi-square term-language feature
selection (IR-textbook formulation)."""

from linkgraph_spark.functions.text import (
    chi2_terms,
    good_turing_counts,
    gt_unseen_mass,
)

_SCHEMA = "doc_id long, text string, lang string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_good_turing_hand_computed(spark):
    d = _docs(spark, [(1, "a a b", "en"), (2, "b c", "en")])
    out = {r.r: r for r in good_turing_counts(d).collect()}
    # counts: a=2, b=2, c=1 -> N_1=1, N_2=2
    assert set(out) == {1, 2}
    assert out[1].n_r == 1 and out[1].r_star == 4.0  # 2 * N_2 / N_1
    assert out[2].n_r == 2 and out[2].r_star == 0.0  # N_3 = 0 -> plain Turing 0


def test_gt_unseen_mass_hand_computed(spark):
    d = _docs(spark, [(1, "a a b", "en"), (2, "b c", "en")])
    r = gt_unseen_mass(d).collect()[0]
    assert (r.n_tokens, r.n_types, r.n_hapax) == (5, 3, 1)
    assert r.p_unseen == 0.2


def test_gt_empty_corpus_null(spark):
    d = _docs(spark, [(1, "   ", "en")])
    r = gt_unseen_mass(d).collect()[0]
    assert (r.n_tokens, r.n_types, r.p_unseen) == (0, 0, None)
    assert good_turing_counts(d).count() == 0


def test_chi2_hand_computed_and_ordering(spark):
    d = _docs(
        spark,
        [
            (1, "the hello world", "en"),
            (2, "the hello there", "en"),
            (3, "the bonjour monde", "fr"),
            (4, "the bonjour amis", "fr"),
        ],
    )
    out = chi2_terms(d, min_df=1, top_n=50).collect()
    # "the" is in every doc -> degenerate margin -> excluded
    assert all(r.term != "the" for r in out)
    assert len(out) == 12  # 6 scorable terms x 2 languages
    # perfect separators lead: chi2 = 4*16/(2*2*2*2) = 4.0, lang/term tiebreak
    head = [(r.lang, r.term, r.n_lang_with, r.chi2) for r in out[:4]]
    assert head == [
        ("en", "bonjour", 0, 4.0),  # conspicuous ABSENCE ranks too
        ("en", "hello", 2, 4.0),
        ("fr", "bonjour", 2, 4.0),
        ("fr", "hello", 0, 4.0),
    ]
    # a singleton term: a=1,b=0,c=1,d=2 -> 4*4/(1*3*2*2)
    single = {(r.lang, r.term): r.chi2 for r in out}
    assert single[("en", "world")] == round(16 / 12, 6)


def test_chi2_min_df_filters(spark):
    d = _docs(
        spark,
        [
            (1, "aa bb", "en"),
            (2, "aa bb", "en"),
            (3, "aa cc", "fr"),
        ],
    )
    out = chi2_terms(d, min_df=2, top_n=50).collect()
    assert all(r.term != "cc" for r in out)  # df=1 < min_df
