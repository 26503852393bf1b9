"""Wave-109 operators: empirical-Bayes beta-binomial shrinkage of
per-source quality rates and the Selinger join-cardinality estimator
audit (q-error)."""

from linkgraph_spark.functions.joins import join_card_audit
from linkgraph_spark.functions.text import eb_source_quality

_GOOD = "the cat sat on the mat and it was happy there for hours."
_BAD = "x" * 30  # one token, no stopwords, punct-free -> low quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_eb_shrinks_small_sources_toward_prior(spark):
    rows = []
    i = 0
    # big source: 20 docs, 10 good (rate 0.5)
    for _ in range(10):
        i += 1; rows.append((i, _GOOD, "big"))
        i += 1; rows.append((i, _BAD, "big"))
    # small source: 1 doc, 1 good (raw rate 1.0 — should NOT survive)
    i += 1; rows.append((i, _GOOD, "tiny"))
    # a third source to give the prior real variance
    for _ in range(5):
        i += 1; rows.append((i, _BAD, "junk"))
    out = {r.source: r for r in eb_source_quality(_docs(spark, rows)).collect()}
    assert out["big"].rate == 0.5
    assert out["tiny"].rate == 1.0
    # shrinkage pulls tiny toward the cross-source mean, big barely moves
    assert out["tiny"].shrunk_rate < 1.0
    assert abs(out["big"].shrunk_rate - 0.5) < abs(
        out["tiny"].shrunk_rate - 1.0
    )
    # shrunk rates stay probabilities
    for r in out.values():
        assert 0.0 <= r.shrunk_rate <= 1.0


def test_eb_degenerate_prior_falls_back_to_raw(spark):
    # two sources with IDENTICAL rates -> zero variance -> raw rates
    rows = [(1, _GOOD, "a"), (2, _BAD, "a"), (3, _GOOD, "b"), (4, _BAD, "b")]
    out = {r.source: r for r in eb_source_quality(_docs(spark, rows)).collect()}
    assert out["a"].shrunk_rate == out["a"].rate == 0.5
    assert out["b"].shrunk_rate == 0.5


def _tbl(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_join_card_exact_and_estimate(spark):
    # customers 1..4; orders: cust 1 x3, cust 2 x1, cust 9 x2 (dangling)
    orders = _tbl(
        spark, [(1,)] * 3 + [(2,)] + [(9,)] * 2, "o_custkey long"
    )
    cust = _tbl(spark, [(1,), (2,), (3,), (4,)], "c_custkey long")
    r = join_card_audit(orders, cust).collect()[0]
    assert (r.n_left, r.n_right, r.d_left, r.d_right) == (6, 4, 3, 4)
    assert r.actual == 4  # 3*1 + 1*1
    assert r.estimate == round(6 * 4 / 4, 6)  # containment: /max(3,4)
    assert r.q_error == round(6 / 4, 6)


def test_join_card_zero_actual_is_null_q_error(spark):
    orders = _tbl(spark, [(9,), (8,)], "o_custkey long")
    cust = _tbl(spark, [(1,), (2,)], "c_custkey long")
    r = join_card_audit(orders, cust).collect()[0]
    assert r.actual == 0 and r.q_error is None
    assert r.estimate == round(2 * 2 / 2, 6)
