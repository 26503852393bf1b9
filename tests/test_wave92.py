"""Wave-92 operators: exact tie-aware PR curve and step-wise average
precision (threshold semantics; nano-quantized per-threshold precision
terms so the AP sum is an order-invariant BIGINT)."""

from datetime import datetime

from linkgraph_spark.functions.ml import average_precision, pr_curve

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, 1.0, _TS) for (u, t) in rows], _SCHEMA
    )


# u1: score 3 pos / u2: score 3 neg / u5: score 2 neg / u3: score 1 pos /
# u4: score 0 pos  -> groups desc: (3: p1 n1) (2: p0 n1) (1: p1 n0) (0: p1 n0)
_ROWS = (
    [(1, "click")] * 3 + [(1, "purchase")]
    + [(2, "click")] * 3
    + [(5, "click")] * 2
    + [(3, "click"), (3, "purchase")]
    + [(4, "purchase")]
)


def test_pr_curve_hand_computed(spark):
    out = pr_curve(_ev(spark, _ROWS)).collect()
    got = [(r.score, r.tp, r.fp, r.recall, r.precision) for r in out]
    assert got == [
        (3, 1, 1, round(1 / 3, 6), 0.5),
        (2, 1, 2, round(1 / 3, 6), round(1 / 3, 6)),
        (1, 2, 2, round(2 / 3, 6), 0.5),
        (0, 3, 2, 1.0, 0.6),
    ]


def test_average_precision_hand_computed(spark):
    r = average_precision(_ev(spark, _ROWS)).collect()[0]
    assert (r.n_pos, r.n_neg) == (3, 2)
    # terms: p_g * round(1e9 * prec): 1*5e8 (s=3) + 1*5e8 (s=1) + 1*6e8 (s=0)
    assert r.ap_num_nano == 1_600_000_000
    assert r.ap == round(1.6 / 3, 6)


def test_perfect_ranking_ap_is_one(spark):
    rows = [(1, "click"), (1, "click"), (1, "purchase"), (2, "click")]
    r = average_precision(_ev(spark, rows)).collect()[0]
    assert r.ap == 1.0
    curve = pr_curve(_ev(spark, rows)).collect()
    assert [(c.tp, c.fp, c.precision) for c in curve] == [(1, 0, 1.0), (1, 1, 0.5)]


def test_no_positives_is_null_not_error(spark):
    rows = [(1, "click"), (2, "view")]
    r = average_precision(_ev(spark, rows)).collect()[0]
    assert (r.n_pos, r.n_neg, r.ap_num_nano, r.ap) == (0, 2, 0, None)
    for c in pr_curve(_ev(spark, rows)).collect():
        assert c.recall is None and c.tp == 0


def test_ap_matches_per_user_definition(spark):
    # no ties across users -> AP equals the classic per-positive mean of
    # precision-at-rank; scores 4,3,2,1,0 with positives at ranks 1,3,5
    rows = (
        [(1, "click")] * 4 + [(1, "purchase")]
        + [(2, "click")] * 3
        + [(3, "click")] * 2 + [(3, "purchase")]
        + [(4, "click")]
        + [(5, "purchase")]
    )
    r = average_precision(_ev(spark, rows)).collect()[0]
    expect = (1 / 1 + 2 / 3 + 3 / 5) / 3
    assert abs(r.ap - expect) < 2e-6
