"""Wave-140 operator: Gini of spend with a delete-one jackknife SE."""

import math
from datetime import datetime

from linkgraph_spark.functions.relational import gini_jackknife

_OD = "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
_TS = datetime(2024, 1, 1)


def _gini(xs):
    xs = sorted(xs)
    n, s = len(xs), sum(xs)
    srx = sum(r * x for r, x in enumerate(xs, 1))
    return (2 * srx - (n + 1) * s) / (n * s)


def _jack_hand(xs):
    n = len(xs)
    g = _gini(xs)
    qs = []
    for i in range(n):
        rest = xs[:i] + xs[i + 1:]
        qs.append(round(1e9 * _gini(rest)))
    cn = len(qs)
    sq, sqq = sum(qs), sum(q * q for q in qs)
    se = math.sqrt((n - 1) * (n * sqq - sq * sq)) / (n * 1e9)
    return g, se


def test_gini_jackknife_hand_computed(spark):
    cents = [1000, 1000, 2500, 4000, 9000, 20000]
    rows = [(i, i, c / 100.0, _TS) for i, c in enumerate(cents, 1)]
    out = gini_jackknife(spark.createDataFrame(rows, _OD)).collect()[0]
    g, se = _jack_hand(cents)
    assert out.n_customers == 6
    assert out.gini == round(g, 6)
    assert out.se == round(se, 6)
    assert out.ci_lo == round(g - 1.959964 * se, 6)
    assert out.ci_hi == round(g + 1.959964 * se, 6)
    assert out.ci_lo < out.gini < out.ci_hi


def test_gini_jackknife_ties_share_loo_value(spark):
    # heavy ties: the cell-grain identity must equal per-member deletion
    cents = [500] * 4 + [500, 2000, 2000, 8000]
    rows = [(i, i, c / 100.0, _TS) for i, c in enumerate(cents, 1)]
    out = gini_jackknife(spark.createDataFrame(rows, _OD)).collect()[0]
    g, se = _jack_hand(cents)
    assert out.gini == round(g, 6)
    assert out.se == round(se, 6)


def test_gini_jackknife_uniform_se_zero(spark):
    rows = [(i, i, 30.0, _TS) for i in range(1, 9)]
    out = gini_jackknife(spark.createDataFrame(rows, _OD)).collect()[0]
    assert out.gini == 0.0 and out.se == 0.0
    assert out.ci_lo == 0.0 and out.ci_hi == 0.0


def test_gini_jackknife_single_customer_null(spark):
    out = gini_jackknife(
        spark.createDataFrame([(1, 1, 10.0, _TS)], _OD)
    ).collect()[0]
    assert out.se is None and out.ci_lo is None
