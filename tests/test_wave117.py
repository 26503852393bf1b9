"""Wave-117 operator: grouped simple OLS (per-brand discount elasticity
of quantity from exact integer moments)."""

from linkgraph_spark.functions.relational import discount_elasticity


def _tables(spark, lines):
    li = spark.createDataFrame(
        lines, "l_partkey long, l_discount double, l_quantity double"
    )
    parts = sorted({p for p, _, _ in lines})
    part = spark.createDataFrame(
        [(p, f"B{p}") for p in parts], "p_partkey long, p_brand string"
    )
    return li, part


def test_perfect_line_per_brand(spark):
    # brand B1: qty = 10 + 100*discount -> in native units
    # (x bps, y centi): y = 1000 + 1*x  (0.01 disc = 100bps -> qty 11)
    lines = [(1, d, 10 + 100 * d) for d in (0.00, 0.01, 0.02, 0.05)]
    li, part = _tables(spark, lines)
    r = discount_elasticity(li, part).collect()[0]
    assert r.n == 4
    assert r.slope == 1.0        # centi-qty per bp
    assert r.intercept == 1000.0
    assert r.r2 == 1.0


def test_degenerate_groups(spark):
    # brand B1: single line -> NULL fit; brand B2: constant discount
    lines = [(1, 0.05, 10.0), (2, 0.03, 5.0), (2, 0.03, 9.0)]
    li, part = _tables(spark, lines)
    out = {r.p_brand: r for r in discount_elasticity(li, part).collect()}
    assert out["B1"].slope is None and out["B1"].n == 1
    assert out["B2"].slope is None  # zero x variance


def test_flat_quantity_zero_slope_null_r2(spark):
    lines = [(1, 0.00, 7.0), (1, 0.05, 7.0), (1, 0.10, 7.0)]
    li, part = _tables(spark, lines)
    r = discount_elasticity(li, part).collect()[0]
    assert r.slope == 0.0 and r.intercept == 700.0
    assert r.r2 is None  # zero y variance: undefined, not 1


def test_negative_elasticity(spark):
    lines = [(1, 0.00, 20.0), (1, 0.10, 10.0)]
    li, part = _tables(spark, lines)
    r = discount_elasticity(li, part).collect()[0]
    # x: 0 -> 1000 bps, y: 2000 -> 1000 centi: slope = -1
    assert r.slope == -1.0 and r.r2 == 1.0
