"""Wave-114 operator: popularity-baseline recommender with temporal
split and hit-rate@k (seen-item exclusion)."""

from datetime import datetime

from linkgraph_spark.functions.relational import popularity_rec_hitrate


def _tables(spark, orders, lines, parts):
    o = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    li = spark.createDataFrame(lines, "l_orderkey long, l_partkey long")
    p = spark.createDataFrame(parts, "p_partkey long, p_brand string")
    return o, li, p


def _d(day):
    return datetime(2024, 1, 1 + day)


def test_hitrate_hand_computed(spark):
    # days 0,0,1,1 -> median 0.5 -> cutoff day floor = (epoch+0.5 floored)
    # orders 1,2 train (day 0); orders 3,4 test (day 1)
    orders = [(1, 1, _d(0)), (2, 2, _d(0)), (3, 1, _d(1)), (4, 3, _d(1))]
    # train: cust1 buys A, cust2 buys A and B -> popularity A=2, B=1
    # test: cust1 buys B (rec: top2 minus seen{A} = {B} -> HIT)
    #       cust3 buys C (rec: {A,B}, C not in -> MISS)
    lines = [(1, 1), (2, 1), (2, 2), (3, 2), (4, 3)]
    parts = [(1, "A"), (2, "B"), (3, "C")]
    o, li, p = _tables(spark, orders, lines, parts)
    r = popularity_rec_hitrate(o, li, p, k=2).collect()[0]
    assert (r.n_train_orders, r.n_test_orders) == (2, 2)
    assert (r.n_test_customers, r.n_hits) == (2, 1)
    assert r.hit_rate == 0.5


def test_seen_exclusion_blocks_trivial_hits(spark):
    # cust1's only test purchase is A, which they already bought in train:
    # the top-1 list is {A}, but recommending the seen item is no hit
    orders = [(1, 1, _d(0)), (2, 1, _d(1))]
    lines = [(1, 1), (2, 1)]
    parts = [(1, "A")]
    o, li, p = _tables(spark, orders, lines, parts)
    r = popularity_rec_hitrate(o, li, p, k=1).collect()[0]
    assert r.n_test_customers == 1 and r.n_hits == 0
    assert r.hit_rate == 0.0


def test_no_test_half_is_null(spark):
    # all orders on one day -> median == that day -> everything train
    orders = [(1, 1, _d(0)), (2, 2, _d(0))]
    lines = [(1, 1), (2, 1)]
    parts = [(1, "A")]
    o, li, p = _tables(spark, orders, lines, parts)
    r = popularity_rec_hitrate(o, li, p).collect()[0]
    assert r.n_test_customers == 0 and r.hit_rate is None
