"""Wave-59 operators: TPC-H join-shape suite (Q4 semi, Q13 outer,
Q18 having-rejoin, Q22 anti)."""

import pytest

from linkgraph_spark.functions.relational import (
    customer_order_distribution,
    idle_rich_customers,
    large_quantity_orders,
    late_shipment_priority,
)

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_late_shipment_counts_orders_once(spark):
    # an order with MANY late lineitems counts once (semi-join semantics)
    rows = late_shipment_priority(_t(spark, "orders"), _t(spark, "lineitem")).collect()
    total = sum(r.order_count for r in rows)
    n_window_orders = (
        _t(spark, "orders")
        .where(
            "o_orderdate >= timestamp'1996-01-01' and o_orderdate < timestamp'1996-04-01'"
        )
        .count()
    )
    assert 0 < total <= n_window_orders


def test_late_shipment_grace_monotone(spark):
    o, li = _t(spark, "orders"), _t(spark, "lineitem")
    strict = sum(
        r.order_count for r in late_shipment_priority(o, li, grace_days=300).collect()
    )
    loose = sum(
        r.order_count for r in late_shipment_priority(o, li, grace_days=10).collect()
    )
    assert strict <= loose


def test_customer_order_distribution_partitions_customers(spark):
    c, o = _t(spark, "customer"), _t(spark, "orders")
    rows = customer_order_distribution(c, o).collect()
    assert sum(r.custdist for r in rows) == c.count()
    # total orders reconstructed from the histogram
    assert sum(r.c_count * r.custdist for r in rows) == o.count()


def test_customer_order_distribution_zero_bucket(spark):
    # hand case: one customer with orders, one without
    c = spark.createDataFrame(
        [(1, "a", 0, 0.0, "X"), (2, "b", 0, 0.0, "X")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    import datetime

    o = spark.createDataFrame(
        [(10, 1, "O", 5.0, datetime.datetime(1996, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {r.c_count: r.custdist for r in customer_order_distribution(c, o).collect()}
    assert got == {0: 1, 1: 1}


def test_large_quantity_orders_threshold(spark):
    rows = large_quantity_orders(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "lineitem"),
        threshold=250.0,
    ).collect()
    assert all(r.total_qty > 250.0 for r in rows)
    # raising the bar can only shrink the set
    higher = large_quantity_orders(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "lineitem"),
        threshold=350.0,
    ).count()
    assert higher <= len(rows)


def test_idle_rich_customers_excludes_active(spark):
    rows = idle_rich_customers(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "nation")
    ).collect()
    n_idle = sum(r.numcust for r in rows)
    assert n_idle > 0
    # every reported group has positive balance mass (above positive avg)
    assert all(r.totacctbal > 0 for r in rows)
    # a window covering all orders leaves fewer (or equal) idle customers
    all_window = idle_rich_customers(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "nation"),
        date_from="1990-01-01", date_to="2005-01-01",
    ).collect()
    assert sum(r.numcust for r in all_window) <= n_idle
