"""Wave-77 operators: Theil–Sen robust trend, CUSUM changepoint,
two-phase skyline (Pareto frontier)."""

import datetime as dt

from linkgraph_spark.functions.events import (
    revenue_changepoint,
    revenue_trend_theilsen,
    skyline2d,
    user_value_skyline,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _daily(spark, day_values):
    d0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (i, d0 + dt.timedelta(days=i), 1, "e", float(v), None)
        for i, v in enumerate(day_values)
    ]
    return spark.createDataFrame(rows, _EV_SCHEMA)


def test_theilsen_ignores_one_outlier_day(spark):
    # perfect slope 2/day, except one wild outlier day
    vals = [10 + 2 * i for i in range(9)] + [1000.0]
    out = revenue_trend_theilsen(_daily(spark, vals)).collect()[0]
    assert out.n_days == 10
    # median of pairwise slopes stays exactly 2 (outlier touches a
    # minority of pairs); an OLS fit would be wildly off
    assert out.slope_per_day == 2.0


def test_theilsen_exact_line_recovers_slope_and_intercept(spark):
    vals = [5 + 3 * i for i in range(6)]
    out = revenue_trend_theilsen(_daily(spark, vals)).collect()[0]
    assert out.slope_per_day == 3.0
    # intercept is in ABSOLUTE epoch-day coordinates: b = r - slope*day
    d0_day = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days
    assert out.intercept == round(5 - 3.0 * d0_day, 6)


def test_cusum_changepoint_finds_level_shift(spark):
    # 10 days at 10, then 10 days at 50 -> peak |CUSUM| at the last
    # low day (index 9)
    vals = [10.0] * 10 + [50.0] * 10
    out = revenue_changepoint(_daily(spark, vals)).collect()[0]
    d0_day = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days
    assert out.change_day == d0_day + 9
    assert out.mean_before == 10.0
    assert out.mean_after == 50.0


def test_cusum_tie_goes_to_earliest_day(spark):
    # symmetric bump: |CUSUM| ties across the plateau; earliest wins
    vals = [10.0, 20.0, 10.0]
    out = revenue_changepoint(_daily(spark, vals)).collect()[0]
    d0_day = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days
    assert out.change_day == d0_day  # day 0: |3*10 - 1*40| = 10 (max, first)


def test_skyline_drops_dominated_points_keeps_frontier(spark):
    pts = spark.createDataFrame(
        [
            (1, 100),  # frontier (max y)
            (5, 80),   # frontier
            (9, 20),   # frontier (max x)
            (4, 70),   # dominated by (5, 80)
            (5, 60),   # dominated by equal-x (5, 80)
            (9, 10),   # dominated by (9, 20)
        ],
        "x long, y long",
    )
    got = [(r.x, r.y) for r in skyline2d(pts, "x", "y").collect()]
    assert got == [(1, 100), (5, 80), (9, 20)]


def test_skyline_is_partition_invariant(spark):
    pts = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(200)], "x long, y long"
    )
    one = [(r.x, r.y) for r in skyline2d(pts.coalesce(1), "x", "y").collect()]
    many = [(r.x, r.y) for r in skyline2d(pts.repartition(16), "x", "y").collect()]
    assert one == many and len(one) >= 1


def test_user_value_skyline_single_dominator(spark):
    d = dt.datetime(2024, 1, 1)
    rows = [
        (1, d, 1, "e", 5.0, None),
        (2, d, 1, "e", 5.0, None),   # user 1: n=2, sum=10
        (3, d, 2, "e", 1.0, None),   # user 2: n=1, sum=1 (dominated)
    ]
    out = user_value_skyline(
        spark.createDataFrame(rows, _EV_SCHEMA)
    ).collect()
    assert [(r.n_events, r.value_sum) for r in out] == [(2, 10.0)]
