"""Wave-113 operators: per-brand return rates with Wilson intervals and
EB-shrunk per-supplier return rates (shrinkage pattern reuse)."""

import math

from linkgraph_spark.functions.relational import (
    brand_return_wilson,
    eb_supplier_returns,
)


def _li(spark, rows):
    return spark.createDataFrame(
        rows, "l_partkey long, l_suppkey long, l_returnflag string"
    )


def _part(spark, rows):
    return spark.createDataFrame(rows, "p_partkey long, p_brand string")


def _wilson(x, n, z=1.96):
    p = x / n
    denom = 1.0 + z * z / n
    center = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return round((center - half) / denom, 6), round((center + half) / denom, 6)


def test_brand_wilson_hand_computed(spark):
    li = _li(
        spark,
        [(1, 1, "R"), (1, 1, "N"), (1, 1, "A"), (1, 1, "N"),  # brand X: 1/4
         (2, 1, "R")],                                        # brand Y: 1/1
    )
    part = _part(spark, [(1, "X"), (2, "Y")])
    out = {r.p_brand: r for r in brand_return_wilson(li, part).collect()}
    x = out["X"]
    assert (x.n, x.n_returned, x.rate) == (4, 1, 0.25)
    lo, hi = _wilson(1, 4)
    assert (x.wilson_lo, x.wilson_hi) == (lo, hi)
    # the 1-line brand's interval is enormous — that's the point
    y = out["Y"]
    assert y.rate == 1.0 and y.wilson_lo < 0.3


def test_eb_supplier_shrinks_small_n(spark):
    rows = []
    # supplier 1: 20 lines, 10 returned (0.5)
    rows += [(1, 1, "R")] * 10 + [(1, 1, "N")] * 10
    # supplier 2: 1 line, returned (raw 1.0)
    rows += [(2, 2, "R")]
    # supplier 3: 10 lines, none returned
    rows += [(3, 3, "N")] * 10
    out = {r.l_suppkey: r for r in eb_supplier_returns(_li(spark, rows)).collect()}
    assert out[2].rate == 1.0
    assert out[2].shrunk_rate < 1.0  # pulled toward the prior mean
    assert abs(out[1].shrunk_rate - 0.5) < abs(out[2].shrunk_rate - 1.0)
    for r in out.values():
        assert 0.0 <= r.shrunk_rate <= 1.0


def test_eb_supplier_degenerate_prior_raw(spark):
    rows = [(1, 1, "R"), (1, 1, "N"), (2, 2, "R"), (2, 2, "N")]
    out = {r.l_suppkey: r for r in eb_supplier_returns(_li(spark, rows)).collect()}
    assert out[1].shrunk_rate == 0.5 == out[2].shrunk_rate
