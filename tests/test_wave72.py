"""Wave-72 operators: TPC-H suite completion — Q6 (scan-agg scalar),
Q2 (groupwise-min join-back), Q9 (5-way join profit), Q11 (global-scalar
HAVING), Q12 (derived-bucket conditional agg), Q20 (nested semi-joins)."""

import datetime as dt

from linkgraph_spark.functions.relational import (
    forecast_revenue_delta,
    important_parts,
    min_cost_supplier,
    product_type_profit,
    promotion_suppliers,
    shipping_speed_priority,
)

_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)


def _li(spark, rows):
    """rows: (orderkey, partkey, suppkey, qty, extprice, disc, shipdate)."""
    full = [
        (o, p, s, 1, q, ep, d, 0.0, "N", "O", ship)
        for (o, p, s, q, ep, d, ship) in rows
    ]
    return spark.createDataFrame(full, _LI_SCHEMA)


def test_q6_predicate_boundaries(spark):
    d = dt.datetime
    li = _li(
        spark,
        [
            # in: all predicates satisfied -> 100 * 0.05 = 5.0
            (1, 1, 1, 10.0, 100.0, 0.05, d(1996, 6, 1)),
            # in: discount at the upper bound (inclusive) -> 100 * 0.07
            (2, 1, 1, 10.0, 100.0, 0.07, d(1996, 1, 1)),
            # out: discount below band
            (3, 1, 1, 10.0, 100.0, 0.04, d(1996, 6, 1)),
            # out: quantity at the bound (strict <)
            (4, 1, 1, 24.0, 100.0, 0.06, d(1996, 6, 1)),
            # out: shipped the day the window closes (exclusive end)
            (5, 1, 1, 10.0, 100.0, 0.06, d(1997, 1, 1)),
        ],
    )
    rows = forecast_revenue_delta(li).collect()
    assert len(rows) == 1
    assert rows[0].revenue == 12.0


def test_q6_empty_window_is_zero_not_null(spark):
    li = _li(spark, [(1, 1, 1, 10.0, 100.0, 0.06, dt.datetime(1990, 1, 1))])
    assert forecast_revenue_delta(li).collect()[0].revenue == 0.0


def _dims(spark):
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0), (1, "NATION_1", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(10, "supp_10", 0, 5.0), (11, "supp_11", 0, 9.0), (12, "supp_12", 1, 1.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "cold widget", "B", "STANDARD", 5, 1.0),
         (2, "large bolt", "B", "ECONOMY", 5, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    return region, nation, supplier, part


def test_q2_min_tie_keeps_both_suppliers_and_scopes_region(spark):
    region, nation, supplier, part = _dims(spark)
    d = dt.datetime(1996, 1, 1)
    li = _li(
        spark,
        [
            # part 1: supp 10 and 11 tie at unit cost 2.0; supp 12 (ASIA)
            # is cheaper but outside the region scope
            (1, 1, 10, 5.0, 10.0, 0.0, d),
            (2, 1, 11, 2.0, 4.0, 0.0, d),
            (3, 1, 12, 2.0, 2.0, 0.0, d),
            # part 2: wrong p_type, never appears
            (4, 2, 10, 1.0, 1.0, 0.0, d),
        ],
    )
    rows = min_cost_supplier(part, supplier, nation, region, li).collect()
    assert [(r.s_name, r.p_partkey, r.min_cost) for r in rows] == [
        ("supp_11", 1, 2.0),  # acctbal 9.0 sorts first
        ("supp_10", 1, 2.0),
    ]


def test_q2_supplier_min_is_over_its_own_shipments(spark):
    region, nation, supplier, part = _dims(spark)
    d = dt.datetime(1996, 1, 1)
    # supp 10 ships part 1 at units 3.0 then 1.5 -> its offer is 1.5,
    # beating supp 11's flat 2.0
    li = _li(
        spark,
        [
            (1, 1, 10, 2.0, 6.0, 0.0, d),
            (2, 1, 10, 2.0, 3.0, 0.0, d),
            (3, 1, 11, 2.0, 4.0, 0.0, d),
        ],
    )
    rows = min_cost_supplier(part, supplier, nation, region, li).collect()
    assert [(r.s_name, r.min_cost) for r in rows] == [("supp_10", 1.5)]


def test_q9_groups_by_supplier_nation_and_order_year(spark):
    region, nation, supplier, part = _dims(spark)
    orders = spark.createDataFrame(
        [(1, 1, "O", 0.0, dt.datetime(1996, 3, 1), "5-LOW"),
         (2, 1, "O", 0.0, dt.datetime(1997, 3, 1), "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = dt.datetime(1996, 6, 1)
    li = _li(
        spark,
        [
            (1, 1, 10, 1.0, 100.0, 0.1, d),   # widget, NATION_0, 1996 -> 90
            (1, 1, 12, 1.0, 50.0, 0.0, d),    # widget, NATION_1, 1996 -> 50
            (2, 1, 10, 1.0, 10.0, 0.0, d),    # widget, NATION_0, 1997 -> 10
            (2, 2, 10, 1.0, 999.0, 0.0, d),   # bolt: name filter drops it
        ],
    )
    rows = product_type_profit(part, supplier, nation, orders, li).collect()
    got = [(r.nation, r.o_year, r.profit) for r in rows]
    # ordered by nation asc, year desc
    assert got == [
        ("NATION_0", 1997, 10.0),
        ("NATION_0", 1996, 90.0),
        ("NATION_1", 1996, 50.0),
    ]


def test_q11_threshold_is_strict_and_scoped_to_nation(spark):
    region, nation, supplier, part = _dims(spark)
    d = dt.datetime(1996, 1, 1)
    # NATION_0 suppliers (10, 11): part 1 value 75, part 2 value 25
    # (total 100). part 3 is shipped only by supp 12 (NATION_1): ignored.
    li = _li(
        spark,
        [
            (1, 1, 10, 1.0, 50.0, 0.0, d),
            (2, 1, 11, 1.0, 25.0, 0.0, d),
            (3, 2, 10, 1.0, 25.0, 0.0, d),
            (4, 3, 12, 1.0, 1000.0, 0.0, d),
        ],
    )
    got = {
        (r.p_partkey, r.value)
        for r in important_parts(
            supplier, nation, li, nation_name="NATION_0", fraction=0.25
        ).collect()
    }
    # part 2 sits exactly AT 25% of total -> strict > excludes it
    assert got == {(1, 75.0)}


def test_q12_lag_boundary_and_priority_split(spark):
    orders = spark.createDataFrame(
        [(1, 1, "O", 0.0, dt.datetime(1996, 1, 1), "1-URGENT"),
         (2, 1, "O", 0.0, dt.datetime(1996, 1, 1), "3-MEDIUM")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = _li(
        spark,
        [
            # lag exactly 30 days -> FAST (inclusive bound), urgent
            (1, 1, 1, 1.0, 1.0, 0.0, dt.datetime(1996, 1, 31)),
            # lag 31 days -> SLOW, urgent
            (1, 1, 1, 1.0, 1.0, 0.0, dt.datetime(1996, 2, 1)),
            # lag 0 -> FAST, low priority
            (2, 1, 1, 1.0, 1.0, 0.0, dt.datetime(1996, 1, 1)),
        ],
    )
    rows = shipping_speed_priority(orders, li).collect()
    got = {(r.ship_speed, r.high_line_count, r.low_line_count) for r in rows}
    assert got == {("FAST", 1, 1), ("SLOW", 1, 0)}


def test_q20_having_boundary_nation_scope_no_fanout(spark):
    region, nation, supplier, part = _dims(spark)
    y = dt.datetime(1997, 6, 1)
    li = _li(
        spark,
        [
            # supp 10 moves 60 units of bolt (part 2) across two orders AND
            # 60 of another bolt-free part: qualifies once, appears once
            (1, 2, 10, 30.0, 1.0, 0.0, y),
            (2, 2, 10, 30.0, 1.0, 0.0, y),
            (3, 1, 10, 60.0, 1.0, 0.0, y),
            # supp 11 moves exactly 50 -> strict > excludes
            (4, 2, 11, 50.0, 1.0, 0.0, y),
            # supp 12 qualifies on volume but is NATION_1 -> scoped out
            (5, 2, 12, 99.0, 1.0, 0.0, y),
        ],
    )
    rows = promotion_suppliers(
        part, supplier, nation, li, nation_name="NATION_0"
    ).collect()
    assert [(r.s_suppkey, r.s_name) for r in rows] == [(10, "supp_10")]


def test_q20_year_window_excludes_other_years(spark):
    region, nation, supplier, part = _dims(spark)
    li = _li(spark, [(1, 2, 10, 99.0, 1.0, 0.0, dt.datetime(1996, 6, 1))])
    assert (
        promotion_suppliers(part, supplier, nation, li, nation_name="NATION_0")
        .count()
        == 0
    )


def test_table_profile_nulls_distinct_and_type_dispatch(spark):
    from linkgraph_spark.functions.reconcile import table_profile

    df = spark.createDataFrame(
        [
            (1, "a", 2.5, dt.datetime(2024, 1, 1, 0, 0, 0, 250000)),
            (1, None, -1.0, dt.datetime(2024, 1, 2)),
            (3, "b", None, None),
        ],
        "k long, s string, v double, ts timestamp",
    )
    rows = table_profile(df).collect()
    # one row per column, in the table's column order
    assert [r.col_name for r in rows] == ["k", "s", "v", "ts"]
    prof = {r.col_name: r for r in rows}
    assert (prof["k"].null_cnt, prof["k"].n_distinct) == (0, 2)
    assert (prof["k"].min_val, prof["k"].max_val) == (1.0, 3.0)
    assert (prof["s"].null_cnt, prof["s"].n_distinct) == (1, 2)
    # strings never stringify into the numeric min/max slots
    assert prof["s"].min_val is None and prof["s"].max_val is None
    assert (prof["v"].null_cnt, prof["v"].min_val, prof["v"].max_val) == (
        1,
        -1.0,
        2.5,
    )
    # timestamps profile as exact epoch MICROseconds (sub-second kept)
    assert prof["ts"].null_cnt == 1
    assert prof["ts"].min_val == 1704067200250000.0
    assert prof["ts"].max_val == 1704153600000000.0
