"""Wave-60 operators: TPC-H predicate shapes (Q14 conditional agg,
Q15 max-over-agg rejoin, Q17 decorrelated avg, Q19 disjunctive)."""

from pyspark.sql import functions as F

from linkgraph_spark.functions.relational import (
    disjunctive_brand_revenue,
    promo_revenue_by_month,
    small_quantity_revenue,
    top_suppliers,
)

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_promo_share_bounded(spark):
    rows = promo_revenue_by_month(_t(spark, "lineitem"), _t(spark, "part")).collect()
    assert len(rows) == 12  # one row per ship month of the year window
    for r in rows:
        assert 0.0 <= r.promo_revenue <= r.total_revenue
        assert 0.0 <= r.promo_share_pct <= 100.0


def test_promo_share_zero_for_absent_type(spark):
    rows = promo_revenue_by_month(
        _t(spark, "lineitem"), _t(spark, "part"), promo_type="NO-SUCH-TYPE"
    ).collect()
    assert rows and all(r.promo_revenue == 0.0 for r in rows)
    assert all(r.promo_share_pct == 0.0 for r in rows)


def test_top_suppliers_is_the_argmax(spark):
    li, su = _t(spark, "lineitem"), _t(spark, "supplier")
    rows = top_suppliers(su, li).collect()
    assert len(rows) >= 1
    # recompute the per-supplier revenue independently and take the max
    manual = (
        li.where(
            "l_shipdate >= timestamp'1996-01-01'"
            " and l_shipdate < timestamp'1996-04-01'"
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.expr("l_extendedprice * (1 - l_discount)")), 2).alias("r"))
        .agg(F.max("r"))
        .collect()[0][0]
    )
    assert all(r.total_revenue == manual for r in rows)


def test_small_quantity_revenue_monotone_in_frac(spark):
    li, p = _t(spark, "lineitem"), _t(spark, "part")
    assert small_quantity_revenue(li, p, frac=0.0).count() == 0
    lo = small_quantity_revenue(li, p, frac=0.2).agg(F.sum("small_qty_lines")).collect()[0][0]
    hi = small_quantity_revenue(li, p, frac=0.5).agg(F.sum("small_qty_lines")).collect()[0][0]
    assert 0 < lo < hi
    # frac above 2x the max/avg ratio keeps every lineitem
    allin = small_quantity_revenue(li, p, frac=1e9).agg(F.sum("small_qty_lines")).collect()[0][0]
    assert allin == li.count()


def test_disjunctive_brands_only_from_arms(spark):
    li, p = _t(spark, "lineitem"), _t(spark, "part")
    rows = disjunctive_brand_revenue(li, p).collect()
    assert {r.p_brand for r in rows} <= {"Brand#4", "Brand#19", "Brand#25"}
    assert all(r.lines > 0 and r.revenue > 0 for r in rows)
    # widening one arm's quantity range can only add lines for that brand
    wide = disjunctive_brand_revenue(
        li, p, arms=(("Brand#4", 1, 15, 1, 50),)
    ).collect()
    narrow = disjunctive_brand_revenue(
        li, p, arms=(("Brand#4", 1, 15, 1, 20),)
    ).collect()
    n_wide = sum(r.lines for r in wide)
    n_narrow = sum(r.lines for r in narrow)
    assert n_narrow <= n_wide
    # an impossible arm matches nothing
    assert disjunctive_brand_revenue(li, p, arms=(("Brand#4", 60, 70, 1, 50),)).count() == 0
