"""Wave-123 operators: Wald-Wolfowitz runs test and turning-points test
on the daily revenue series."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import (
    runs_test_revenue,
    turning_points_revenue,
)

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def _daily(spark, revs):
    return spark.createDataFrame(
        [
            (1, "purchase", float(v), _T0 + timedelta(days=d))
            for d, v in enumerate(revs)
        ],
        _SCHEMA,
    )


def _runs_hand(revs):
    cents4 = [round(v * 10000) for v in revs]
    med = sorted(cents4)[len(cents4) // 2] if len(cents4) % 2 else (
        sorted(cents4)[len(cents4) // 2 - 1] + sorted(cents4)[len(cents4) // 2]
    ) / 2
    s = [1 if x > med else 0 for x in cents4 if x != med]
    nu, n1 = len(s), sum(s)
    n2 = nu - n1
    r = 1 + sum(1 for a, b in zip(s, s[1:]) if a != b) if s else 0
    mu = 2.0 * n1 * n2 / nu + 1.0
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - nu)) / (nu * nu * (nu - 1.0))
    z = (r - mu) / math.sqrt(var) if n1 and n2 and var > 0 else None
    return nu, n1, n2, r, z


def test_runs_hand_computed_alternating(spark):
    revs = [10.0, 90.0, 20.0, 80.0, 30.0, 70.0, 40.0, 60.0]
    out = runs_test_revenue(_daily(spark, revs)).collect()[0]
    nu, n1, n2, r, z = _runs_hand(revs)
    assert (out.n_used, out.n_above, out.n_below, out.runs) == (nu, n1, n2, r)
    assert out.z == round(z, 6)
    assert out.z > 0  # alternation -> more runs than expected
    assert out.significant == (abs(round(z, 6)) > 1.959964)


def test_runs_trending_series_few_runs(spark):
    revs = [10.0, 20.0, 30.0, 40.0, 60.0, 70.0, 80.0, 90.0]
    out = runs_test_revenue(_daily(spark, revs)).collect()[0]
    assert out.runs == 2  # below-block then above-block
    nu, n1, n2, r, z = _runs_hand(revs)
    assert out.z == round(z, 6) and out.z < 0


def test_runs_median_days_drop(spark):
    # odd n: the middle value equals the exact median and must drop
    revs = [10.0, 50.0, 90.0]
    out = runs_test_revenue(_daily(spark, revs)).collect()[0]
    assert out.n_used == 2 and out.n_above == 1 and out.n_below == 1
    # nu = 2 -> var formula hits nu-1 = 1, runs = 2, mu = 2: z = 0/0 -> NULL
    assert out.z is None


def test_runs_one_sided_is_null(spark):
    revs = [10.0, 10.0, 99.0, 10.0]  # above set has 1 member (99)
    out = runs_test_revenue(_daily(spark, revs)).collect()[0]
    # median of {10,10,10,99}*1e4 = 10*1e4 -> three days equal median drop
    assert out.n_used == 1 and out.n_below == 0
    assert out.z is None


def test_turning_points_hand_computed(spark):
    revs = [10.0, 30.0, 20.0, 40.0, 15.0, 50.0, 45.0]
    out = turning_points_revenue(_daily(spark, revs)).collect()[0]
    # interior strict turns at 30, 20, 40, 15, 50 -> 5
    n, t = len(revs), 5
    e = 2.0 * (n - 2) / 3.0
    z = (t - e) / math.sqrt((16.0 * n - 29.0) / 90.0)
    assert (out.n_days, out.turning_points) == (n, t)
    assert out.expected == round(e, 6)
    assert out.z == round(z, 6)
    assert out.significant == (abs(round(z, 6)) > 1.959964)


def test_turning_points_plateau_not_counted(spark):
    revs = [10.0, 20.0, 20.0, 10.0]  # plateau peak: zero diff, strict -> 0
    out = turning_points_revenue(_daily(spark, revs)).collect()[0]
    assert out.turning_points == 0


def test_turning_points_short_series_null(spark):
    out = turning_points_revenue(_daily(spark, [10.0, 20.0])).collect()[0]
    assert out.n_days == 2 and out.z is None and out.expected is None
