"""Wave-64 operators: TPC-H Q7 (symmetric pair), Q21 (lone late
supplier), Q16 (anti-join count-distinct)."""

import datetime as dt

from pyspark.sql import functions as F

from linkgraph_spark.functions.relational import (
    nation_pair_volume,
    parts_supplier_counts,
    waiting_suppliers,
)

SF = "/root/testdata/sf0.01"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_nation_pair_is_symmetric_and_exclusive(spark):
    rows = nation_pair_volume(
        _t(spark, "nation"), _t(spark, "customer"), _t(spark, "supplier"),
        _t(spark, "orders"), _t(spark, "lineitem"),
    ).collect()
    assert rows
    # only the two cross directions appear, never same-nation rows
    pairs = {(r.cust_nation, r.supp_nation) for r in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    # swapping a and b returns the identical result set
    swapped = nation_pair_volume(
        _t(spark, "nation"), _t(spark, "customer"), _t(spark, "supplier"),
        _t(spark, "orders"), _t(spark, "lineitem"),
        nation_a="NATION_2", nation_b="NATION_1",
    ).collect()
    key = lambda r: (r.supp_nation, r.cust_nation, r.ship_year, r.revenue)  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, swapped))


def test_waiting_suppliers_hand_case(spark):
    d = dt.datetime
    orders = spark.createDataFrame(
        [(1, 9, "O", 0.0, d(1996, 1, 1), "1-URGENT"),
         (2, 9, "O", 0.0, d(1996, 1, 1), "1-URGENT"),
         (3, 9, "O", 0.0, d(1996, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        # order 1: suppliers 10 (late) and 11 (on time) -> 10 counted
        [(1, 10, d(1996, 6, 1)), (1, 11, d(1996, 1, 10)),
         # order 2: both late -> nobody counted (not the ONLY late one)
         (2, 10, d(1996, 6, 1)), (2, 11, d(1996, 6, 1)),
         # order 3: single-supplier order -> excluded (needs >=2 suppliers)
         (3, 10, d(1996, 6, 1))],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(10, "supp_10", 0, 0.0), (11, "supp_11", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    got = {(r.s_name, r.numwait)
           for r in waiting_suppliers(supplier, orders, li).collect()}
    assert got == {("supp_10", 1)}


def test_parts_supplier_counts_excludes_negative_balance(spark):
    p, s, li = _t(spark, "part"), _t(spark, "supplier"), _t(spark, "lineitem")
    rows = parts_supplier_counts(p, s, li).collect()
    assert rows
    n_supp = s.count()
    n_bad = s.where("s_acctbal < 0").count()
    assert n_bad > 0  # the exclusion actually bites on this data
    assert all(0 < r.supplier_cnt <= n_supp - n_bad for r in rows)
    # buckets are multiples of the bucket width inside the size domain
    assert all(r.size_bucket % 10 == 0 and 0 <= r.size_bucket <= 50 for r in rows)
    # with no exclusion (all balances made positive) counts only grow
    s_pos = s.withColumn("s_acctbal", F.abs("s_acctbal"))
    before = {(r.p_brand, r.size_bucket): r.supplier_cnt for r in rows}
    after = {
        (r.p_brand, r.size_bucket): r.supplier_cnt
        for r in parts_supplier_counts(p, s_pos, li).collect()
    }
    assert all(after[k] >= v for k, v in before.items())
