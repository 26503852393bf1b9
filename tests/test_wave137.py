"""Wave-137 operators: Hill tail-index estimator and KM RMST/median
survival scalars."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import km_rmst
from linkgraph_spark.functions.relational import hill_tail_spend

_OD = "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
_EV = "user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def test_hill_hand_computed(spark):
    # 12 customers; top-6 used with k=5: xmin = 6th largest
    spend = {c: 100.0 * (13 - c) for c in range(1, 13)}  # 1200,1100,...,100
    rows = [(c, c, spend[c], _T0) for c in spend]
    out = hill_tail_spend(
        spark.createDataFrame(rows, _OD), k=5
    ).collect()[0]
    top6 = sorted((int(v * 100) for v in spend.values()), reverse=True)[:6]
    xmin = top6[-1]
    ql = sum(round(1e6 * math.log(x / xmin)) for x in top6 if x > xmin)
    alpha = 5 / (ql / 1e6)
    assert out.k_used == 5
    assert out.xmin == round(xmin / 100.0, 6)
    assert out.alpha == round(alpha, 6)


def test_hill_too_few_customers_is_null(spark):
    rows = [(c, c, 100.0 * c, _T0) for c in range(1, 5)]
    out = hill_tail_spend(
        spark.createDataFrame(rows, _OD), k=5
    ).collect()[0]
    assert out.alpha is None


def test_hill_degenerate_ties_is_null(spark):
    rows = [(c, c, 50.0, _T0) for c in range(1, 10)]
    out = hill_tail_spend(
        spark.createDataFrame(rows, _OD), k=5
    ).collect()[0]
    # everything ties xmin -> no positive log term
    assert out.k_used == 0 and out.alpha is None


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, 1.0, _T0 + timedelta(days=d)) for u, t, d in rows], _EV
    )


def test_km_rmst_hand_computed(spark):
    # 4 subjects sign up day 0; convert at days 1, 2, 4; one censored
    # at the stream end (day 4). S: day1 -> 0.75, day2 -> 0.5, day4 -> 0.25
    rows = [(u, "signup", 0) for u in (1, 2, 3, 4)]
    rows += [(1, "purchase", 1), (2, "purchase", 2), (3, "purchase", 4)]
    out = km_rmst(_ev(spark, rows)).collect()[0]
    # step areas: [0,1)x1.0 + [1,2)x0.75 + [2,4)x0.5
    rmst = (
        round(1e6 * 1.0 * 1) + round(1e6 * 0.75 * 1) + round(1e6 * 0.5 * 2)
    ) / 1e6
    assert out.horizon_day == 4
    assert out.rmst_days == round(rmst, 6)
    assert out.median_day == 2  # S first hits 0.5 exactly at day 2


def test_km_rmst_median_never_reached(spark):
    # 10 subjects, only 2 convert -> S stays above 0.5 forever
    rows = [(u, "signup", 0) for u in range(1, 11)]
    rows += [(1, "purchase", 1), (2, "purchase", 3)]
    rows += [(99, "view", 6)]  # extends the stream end to day 6
    out = km_rmst(_ev(spark, rows)).collect()[0]
    assert out.median_day is None
    assert out.rmst_days > 0
