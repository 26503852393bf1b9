"""Wave-131 operators: Poissonness-plot basket fit and the duplicate-
payments audit."""

import math
from datetime import datetime

from linkgraph_spark.functions.relational import (
    duplicate_payments_audit,
    poissonness_basket,
)

_LI = "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double"
_OD = "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"


def _li(spark, baskets):
    rows = []
    for ok, k in baskets.items():
        rows += [(ok, i, 1.0, 0.0) for i in range(k)]
    return spark.createDataFrame(rows, _LI)


def _poissonness_hand(baskets):
    import collections

    h = collections.Counter(baskets.values())
    nn = sum(h.values())
    pts = [
        (k, round(1e6 * (math.log(math.factorial(k)) + math.log(nk)
                         - math.log(nn))))
        for k, nk in sorted(h.items())
    ]
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num = m * sxy - sx * sy
    dxx = m * sxx - sx * sx
    dyy = m * syy - sy * sy
    slope = num / dxx / 1e6
    r2 = num * num / (dxx * dyy) if dyy > 0 else None
    return nn, m, slope, r2


def test_poissonness_hand_computed(spark):
    # baskets drawn to look Poisson-ish: sizes 1..4
    baskets = {}
    ok = 1
    for k, count in [(1, 14), (2, 14), (3, 9), (4, 5)]:
        for _ in range(count):
            baskets[ok] = k
            ok += 1
    out = poissonness_basket(_li(spark, baskets)).collect()[0]
    nn, m, slope, r2 = _poissonness_hand(baskets)
    assert (out.n_orders, out.n_points) == (nn, m)
    assert out.slope == round(slope, 6)
    assert out.lambda_hat == round(math.exp(slope), 6)
    assert out.r2 == round(r2, 6)
    assert out.r2 > 0.9  # near-Poisson by construction


def test_poissonness_single_size_is_null(spark):
    baskets = {i: 3 for i in range(1, 11)}
    out = poissonness_basket(_li(spark, baskets)).collect()[0]
    assert out.n_points == 1 and out.slope is None and out.r2 is None


def test_duplicate_payments_hand(spark):
    d1, d2 = datetime(2024, 1, 5), datetime(2024, 1, 6)
    rows = [
        (1, 10, 99.99, d1), (2, 10, 99.99, d1), (3, 10, 99.99, d1),  # x3
        (4, 11, 50.00, d1), (5, 11, 50.00, d2),   # same total, other day
        (6, 12, 25.50, d2), (7, 12, 25.50, d2),   # x2
        (8, 13, 70.00, d1),                       # clean
    ]
    out = duplicate_payments_audit(
        spark.createDataFrame(rows, _OD)
    ).collect()[0]
    assert out.n_groups == 2
    assert out.n_orders_involved == 5
    assert out.excess_orders == 3
    assert out.exposure == round(2 * 99.99 + 25.50, 6)


def test_duplicate_payments_clean_is_zeros(spark):
    rows = [(i, i, 10.0 * i, datetime(2024, 1, 2)) for i in range(1, 6)]
    out = duplicate_payments_audit(
        spark.createDataFrame(rows, _OD)
    ).collect()[0]
    assert (out.n_groups, out.excess_orders) == (0, 0)
    assert out.exposure == 0.0
