"""Wave-84 operators: Bradley–Terry ranking, compaction planning."""

import datetime as dt

from linkgraph_spark.functions.layout import compaction_plan
from linkgraph_spark.functions.relational import brand_bt_ranking


def _star(spark, purchases):
    """purchases: (custkey, orderkey, brand, orderdate)."""
    orders = spark.createDataFrame(
        sorted({(o, c, "O", 0.0, d, "5-LOW") for (c, o, _, d) in purchases}),
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    part_ids = {
        b: i for i, b in enumerate(sorted({b for (_, _, b, _) in purchases}))
    }
    part = spark.createDataFrame(
        [(i, b) for b, i in part_ids.items()], "p_partkey long, p_brand string"
    )
    li = spark.createDataFrame(
        [(o, part_ids[b], 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
         for (c, o, b, d) in purchases],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    return orders, li, part


def test_bt_ranking_orders_by_dominance(spark):
    d = dt.datetime
    # A beats B for 3 customers, B beats C for 3, A beats C for 3:
    # transitive dominance A > B > C must come out in the strengths
    purchases = []
    oid = 0
    for c in range(1, 4):
        for first, second in (("A", "B"),):
            oid += 2
            purchases += [
                (c, oid, first, d(2024, 1, 1)),
                (c, oid + 1, second, d(2024, 1, 9)),
            ]
    for c in range(4, 7):
        oid += 2
        purchases += [
            (c, oid, "B", d(2024, 1, 1)),
            (c, oid + 1, "C", d(2024, 1, 9)),
        ]
    for c in range(7, 10):
        oid += 2
        purchases += [
            (c, oid, "A", d(2024, 1, 1)),
            (c, oid + 1, "C", d(2024, 1, 9)),
        ]
    orders, li, part = _star(spark, purchases)
    rows = brand_bt_ranking(orders, li, part).collect()
    got = [r.brand for r in rows]
    assert got == ["A", "B", "C"]
    strengths = [r.strength for r in rows]
    assert strengths[0] > strengths[1] > strengths[2] >= 0.0
    assert abs(sum(strengths) - 1.0) < 1e-4  # normalized


def test_bt_ranking_symmetric_outcomes_tie(spark):
    d = dt.datetime
    # A-before-B once and B-before-A once: strengths must tie at 0.5
    purchases = [
        (1, 11, "A", d(2024, 1, 1)), (1, 12, "B", d(2024, 1, 5)),
        (2, 21, "B", d(2024, 1, 1)), (2, 22, "A", d(2024, 1, 5)),
    ]
    orders, li, part = _star(spark, purchases)
    rows = brand_bt_ranking(orders, li, part).collect()
    assert [r.strength for r in rows] == [0.5, 0.5]


def test_compaction_plan_packs_contiguous_key_ranges(spark):
    sized = spark.createDataFrame(
        [(1, 700), (2, 700), (3, 700), (4, 700), (5, 100)],
        "day long, n long",
    )
    rows = compaction_plan(sized, "day", "n", target=1500).collect()
    got = [(r.bin, r.n_parts, r.total_size, r.first_key, r.last_key)
           for r in rows]
    # exclusive prefix: 0,700,1400,2100,2800 -> bins 0,0,0,1,1
    assert got == [(0, 3, 2100, 1, 3), (1, 2, 800, 4, 5)]


def test_compaction_plan_never_splits_a_partition(spark):
    # one oversized partition still lands whole in a single bin
    sized = spark.createDataFrame(
        [(1, 5000), (2, 10)], "day long, n long"
    )
    rows = compaction_plan(sized, "day", "n", target=1000).collect()
    assert [(r.bin, r.n_parts, r.total_size) for r in rows] == [
        (0, 1, 5000),
        (5, 1, 10),
    ]
