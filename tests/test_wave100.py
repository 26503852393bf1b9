"""Wave-100 operators: longest-activity-streak distribution
(gaps-and-islands at user-day grain) and per-user hour-of-day Shannon
entropy (micro-nat quantized bot-likeness signal)."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import activity_streaks, user_hour_entropy

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_D0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, "click", 1.0, ts) for (u, ts) in rows], _SCHEMA
    )


def test_streaks_hand_computed(spark):
    rows = []
    # u1: days 0,1,2, 6,7 -> longest 3; u2: day 0 only -> 1
    for d in (0, 1, 2, 6, 7):
        rows.append((1, _D0 + timedelta(days=d)))
    rows.append((2, _D0))
    # u3: two events same day still one active day -> streak 1
    rows += [(3, _D0), (3, _D0 + timedelta(hours=5))]
    out = {r.streak_days: r.n_users for r in activity_streaks(_ev(spark, rows)).collect()}
    assert out == {1: 2, 3: 1}


def test_streaks_cross_midnight_gap(spark):
    # events 1 min apart across midnight are DIFFERENT days -> streak 2
    rows = [
        (1, _D0 + timedelta(days=1, minutes=-1)),
        (1, _D0 + timedelta(days=1, minutes=1)),
    ]
    out = activity_streaks(_ev(spark, rows)).collect()
    assert [(r.streak_days, r.n_users) for r in out] == [(2, 1)]


def test_hour_entropy_uniform_and_point(spark):
    rows = []
    # u1: one event in each of 24 hours -> entropy = ln 24
    for h in range(24):
        rows.append((1, _D0 + timedelta(hours=h)))
    # u2: 10 events all in one hour -> entropy 0
    for i in range(10):
        rows.append((2, _D0 + timedelta(minutes=i)))
    out = {r.user_id: r for r in user_hour_entropy(_ev(spark, rows)).collect()}
    u1, u2 = out[1], out[2]
    assert (u1.n_events, u1.n_hours_active) == (24, 24)
    assert abs(u1.entropy - math.log(24)) < 1e-5
    assert (u2.n_events, u2.n_hours_active, u2.entropy) == (10, 1, 0.0)


def test_hour_entropy_two_bins_hand_computed(spark):
    # 3 events at hour 0, 1 at hour 1: H = -(3/4 ln 3/4 + 1/4 ln 1/4)
    rows = [(1, _D0 + timedelta(minutes=m)) for m in (0, 1, 2)]
    rows.append((1, _D0 + timedelta(hours=1)))
    r = user_hour_entropy(_ev(spark, rows)).collect()[0]
    t1 = round(1e6 * 0.75 * math.log(0.75))
    t2 = round(1e6 * 0.25 * math.log(0.25))
    assert r.entropy == round(-(t1 + t2) / 1e6, 6)
    # hours wrap by UTC clock: a day-2 hour-0 event joins the hour-0 bin
    rows.append((1, _D0 + timedelta(days=1)))
    r2 = user_hour_entropy(_ev(spark, rows)).collect()[0]
    assert r2.n_hours_active == 2 and r2.n_events == 5
