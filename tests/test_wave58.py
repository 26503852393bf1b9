"""Wave-58 operators: TPC-H-derived warehouse classics (Q1/Q3/Q5/Q10)
over the star-schema tables."""

import pytest

from linkgraph_spark.functions.relational import (
    local_supplier_volume,
    pricing_summary,
    returned_item_report,
    shipping_priority,
)

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_pricing_summary_totals(spark):
    li = _t(spark, "lineitem")
    rows = pricing_summary(li).collect()
    assert 1 <= len(rows) <= 6  # (returnflag, linestatus) combos
    n_filtered = li.where("l_shipdate <= timestamp'1998-09-02'").count()
    assert sum(r.count_order for r in rows) == n_filtered
    for r in rows:
        # disc price <= base price; charge >= disc price (tax >= 0)
        assert r.sum_disc_price <= r.sum_base_price
        assert r.sum_charge >= r.sum_disc_price
        assert r.avg_qty == pytest.approx(r.sum_qty / r.count_order, rel=1e-4)


def test_pricing_summary_cutoff_excludes(spark):
    li = _t(spark, "lineitem")
    all_rows = pricing_summary(li, cutoff="2002-01-01").collect()
    some_rows = pricing_summary(li, cutoff="1996-01-01").collect()
    assert sum(r.count_order for r in some_rows) < sum(
        r.count_order for r in all_rows
    )


def test_shipping_priority_semantics(spark):
    rows = shipping_priority(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "lineitem")
    ).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # every order in the report was placed before the date
    import datetime

    d = datetime.datetime(1998, 3, 15)
    assert all(r.o_orderdate < d for r in rows)


def test_local_supplier_volume_nation_subset(spark):
    rows = local_supplier_volume(
        _t(spark, "region"),
        _t(spark, "nation"),
        _t(spark, "customer"),
        _t(spark, "supplier"),
        _t(spark, "orders"),
        _t(spark, "lineitem"),
    ).collect()
    # only ASIA nations can appear
    names = {r.n_name for r in rows}
    nat = {
        row.n_name
        for row in spark.sql(
            f"SELECT n_name FROM parquet.`{SF}/nation.parquet` n "
            f"JOIN parquet.`{SF}/region.parquet` r ON n.n_regionkey = r.r_regionkey "
            "WHERE r.r_name = 'ASIA'"
        ).collect()
    }
    assert names <= nat
    assert all(r.revenue > 0 for r in rows)


def test_returned_item_report_only_returns(spark):
    rows = returned_item_report(
        _t(spark, "customer"),
        _t(spark, "orders"),
        _t(spark, "lineitem"),
        _t(spark, "nation"),
    ).collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # widening the window can only grow the top-1 revenue
    wide = returned_item_report(
        _t(spark, "customer"),
        _t(spark, "orders"),
        _t(spark, "lineitem"),
        _t(spark, "nation"),
        date_from="1995-01-01",
        date_to="2002-01-01",
    ).collect()
    assert wide[0].revenue >= rows[0].revenue
