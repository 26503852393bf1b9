"""Wave-124 operators: ABC/Pareto brand classification and the
order-to-ship SLA percentile profile."""

from datetime import datetime

from linkgraph_spark.functions.relational import abc_brands, ship_delay_profile

_LI = (
    "l_orderkey long, l_partkey long, l_extendedprice double,"
    " l_discount double, l_shipdate timestamp"
)
_PT = "p_partkey long, p_brand string"
_OD = "o_orderkey long, o_orderpriority string, o_orderdate timestamp"


def test_abc_hand_computed(spark):
    # revenues: b1=800, b2=120, b3=50, b4=30 (total 1000)
    # cum_before: b1=0 (A), b2=800 (B: 5*800<4000 false, 20*800<19000 true),
    # b3=920 (C: 20*920=18400<19000 true -> B!), recheck: 18400 < 19000 -> B
    # b4=970 (20*970=19400 >= 19000 -> C)
    li = spark.createDataFrame(
        [
            (1, 1, 800.0, 0.0, datetime(2024, 1, 2)),
            (2, 2, 120.0, 0.0, datetime(2024, 1, 2)),
            (3, 3, 100.0, 0.5, datetime(2024, 1, 2)),
            (4, 4, 30.0, 0.0, datetime(2024, 1, 2)),
        ],
        _LI,
    )
    pt = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (3, "b3"), (4, "b4")], _PT
    )
    out = abc_brands(li, pt).collect()
    got = {r.brand: r for r in out}
    assert [r.brand for r in out] == ["b1", "b2", "b3", "b4"]
    assert got["b1"].abc_class == "A"
    assert got["b2"].abc_class == "B"
    assert got["b3"].abc_class == "B"
    assert got["b4"].abc_class == "C"
    assert got["b1"].revenue == 800.0
    assert got["b3"].revenue == 50.0  # discount applied
    assert got["b4"].cum_share == 1.0
    assert got["b1"].revenue_share == 0.8


def test_abc_boundary_is_integer_exact(spark):
    # brand at exactly 80% cumulative BEFORE it: 5*cum == 4*tot -> NOT A
    li = spark.createDataFrame(
        [
            (1, 1, 80.0, 0.0, datetime(2024, 1, 2)),
            (2, 2, 15.0, 0.0, datetime(2024, 1, 2)),
            (3, 3, 5.0, 0.0, datetime(2024, 1, 2)),
        ],
        _LI,
    )
    pt = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], _PT)
    got = {r.brand: r for r in abc_brands(li, pt).collect()}
    assert got["x"].abc_class == "A"   # cum_before 0
    assert got["y"].abc_class == "B"   # cum_before exactly 80% -> not A
    assert got["z"].abc_class == "C"   # cum_before exactly 95% -> not B


def test_ship_delay_hand_computed(spark):
    od = spark.createDataFrame(
        [
            (1, "1-URGENT", datetime(2024, 1, 1)),
            (2, "1-URGENT", datetime(2024, 1, 1)),
            (3, "5-LOW", datetime(2024, 1, 1)),
        ],
        _OD,
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1.0, 0.0, datetime(2024, 1, 3)),   # gap 2
            (1, 2, 1.0, 0.0, datetime(2024, 1, 5)),   # gap 4
            (2, 3, 1.0, 0.0, datetime(2024, 1, 11)),  # gap 10
            (3, 4, 1.0, 0.0, datetime(2024, 1, 31)),  # gap 30
        ],
        _LI,
    )
    got = {r.priority: r for r in ship_delay_profile(li, od).collect()}
    u = got["1-URGENT"]
    # gaps [2, 4, 10]: p50 = 4, p90 interpolates 4..10 at 0.8 -> 8.8
    assert u.n_lines == 3 and u.max_days == 10
    assert u.p50_days == 4.0
    assert u.p90_days == round(4 + (10 - 4) * 0.8, 6)
    assert u.avg_days == round(16 / 3, 6)
    assert got["5-LOW"].p50_days == 30.0


def test_ship_delay_priority_order(spark):
    od = spark.createDataFrame(
        [(1, "2-HIGH", datetime(2024, 1, 1)), (2, "1-URGENT", datetime(2024, 1, 1))],
        _OD,
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1.0, 0.0, datetime(2024, 1, 2)),
            (2, 2, 1.0, 0.0, datetime(2024, 1, 2)),
        ],
        _LI,
    )
    out = ship_delay_profile(li, od).collect()
    assert [r.priority for r in out] == ["1-URGENT", "2-HIGH"]
