"""Wave-82 operators: brand purchase-sequence rules, always-valid
mSPRT A/B statistic."""

import datetime as dt

import math

from linkgraph_spark.functions.events import ab_test_msprt
from linkgraph_spark.functions.relational import brand_sequence_rules

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _star(spark, purchases):
    """purchases: (custkey, orderkey, brand, orderdate)."""
    orders = spark.createDataFrame(
        sorted({(o, c, "O", 0.0, d, "5-LOW") for (c, o, _, d) in purchases}),
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    part_ids = {b: i for i, b in enumerate(sorted({b for (_, _, b, _) in purchases}))}
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


def test_sequence_rules_direction_and_tie_exclusion(spark):
    d = dt.datetime
    purchases = [
        # 3 customers buy A then B; 1 buys B then A; 1 ties (same date)
        (1, 11, "A", d(2024, 1, 1)), (1, 12, "B", d(2024, 1, 5)),
        (2, 21, "A", d(2024, 1, 2)), (2, 22, "B", d(2024, 1, 6)),
        (3, 31, "A", d(2024, 1, 3)), (3, 32, "B", d(2024, 1, 7)),
        (4, 41, "B", d(2024, 1, 1)), (4, 42, "A", d(2024, 1, 9)),
        (5, 51, "A", d(2024, 1, 4)), (5, 52, "B", d(2024, 1, 4)),
    ]
    orders, li, part = _star(spark, purchases)
    rows = brand_sequence_rules(orders, li, part, min_pairs=1).collect()
    assert [(r.brand_x, r.brand_y, r.n_xy, r.n_yx) for r in rows] == [
        ("A", "B", 3, 1)
    ]
    assert rows[0].directionality == 0.5  # (3-1)/4


def test_sequence_rules_first_purchase_per_brand_wins(spark):
    d = dt.datetime
    # customer re-buys A later than B, but A's FIRST purchase precedes B
    purchases = [
        (1, 11, "A", d(2024, 1, 1)),
        (1, 12, "B", d(2024, 1, 5)),
        (1, 13, "A", d(2024, 1, 9)),
    ]
    orders, li, part = _star(spark, purchases)
    rows = brand_sequence_rules(orders, li, part, min_pairs=1).collect()
    assert [(r.n_xy, r.n_yx) for r in rows] == [(1, 0)]


def test_msprt_matches_reference_formula_and_detects_big_lift(spark):
    d = dt.datetime(2024, 1, 10)
    rows = []
    # construct an extreme, deterministic lift: hash-split is opaque, so
    # just check the statistic against a python mirror of the formula
    vals = {u: float(u % 7 + 1) for u in range(1, 41)}
    for u, v in vals.items():
        rows.append((u, d, u, "e", v, None))
    out = ab_test_msprt(spark.createDataFrame(rows, _EV_SCHEMA), tau=0.1).collect()[0]
    # python mirror from the same definitions
    import hashlib

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    y = {u: round(v * 10000) for u, v in vals.items()}
    n = len(y)
    sy = sum(y.values())
    syy = sum(t * t for t in y.values())
    c = [y[u] for u in y if arm(u) == 0]
    n0, sy0 = len(c), sum(c)
    m0 = sy0 / n0 / 10000.0
    m1 = (sy - sy0) / (n - n0) / 10000.0
    delta = m1 - m0
    var = (syy - sy * sy / n) / (n - 1) / 1e8
    vd = var * (1 / n0 + 1 / (n - n0))
    t2 = 0.01
    ll = 0.5 * math.log(vd / (vd + t2)) + delta * delta * t2 / (
        2 * vd * (vd + t2)
    )
    assert (out.n_control, out.n_treatment) == (n0, n - n0)
    assert out.delta == round(delta, 6)
    assert out.log_lambda == round(ll, 6)
    assert out.p_value == round(min(1.0, math.exp(-ll)), 6)
