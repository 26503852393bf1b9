"""Wave-110 operators: inverse-Simpson language diversity per source and
the order-header vs lineitem-detail reconciliation audit."""

from linkgraph_spark.functions.reconcile import order_total_reconciliation
from linkgraph_spark.functions.text import source_lang_diversity


def test_diversity_hand_computed(spark):
    rows = [(i, "t", "even", ["en", "fr"][i % 2]) for i in range(4)]
    rows += [(i + 10, "t", "skew", (["en"] * 3 + ["fr"])[i]) for i in range(4)]
    rows += [(99, "t", "mono", "zh")]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )
    out = {r.source: r for r in source_lang_diversity(d).collect()}
    assert out["even"].inv_simpson == 2.0          # 16 / (4+4)
    assert out["skew"].inv_simpson == 1.6          # 16 / (9+1)
    assert out["mono"].inv_simpson == 1.0
    assert out["skew"].n_langs == 2


def _orders(spark, rows):
    return spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )


def test_reconciliation_hand_computed(spark):
    o = _orders(spark, [(1, 110.0), (2, 50.0), (3, 10.0)])
    li = _li(
        spark,
        [
            (1, 100.0, 0.0, 0.10),   # order 1: 110.00 exactly -> matched
            (2, 50.0, 0.0, 0.0),     # order 2 first line: 50.00
            (2, 0.25, 0.0, 0.0),     # ...plus 0.25 -> gap 25 cents
        ],
    )  # order 3 has NO lines
    r = order_total_reconciliation(o, li).collect()[0]
    assert (r.n_orders, r.n_no_lines) == (3, 1)
    assert (r.n_matched, r.n_mismatched) == (1, 1)
    assert r.max_abs_gap_cents == 25
    # percentile over the two judged gaps [0, 25] -> 12.5
    assert r.p50_abs_gap_cents == 12.5


def test_reconciliation_tolerance_is_integer_cents(spark):
    o = _orders(spark, [(1, 100.01)])
    li = _li(spark, [(1, 100.0, 0.0, 0.0)])
    r1 = order_total_reconciliation(o, li, tol_cents=0).collect()[0]
    assert r1.n_mismatched == 1
    r2 = order_total_reconciliation(o, li, tol_cents=1).collect()[0]
    assert r2.n_matched == 1
