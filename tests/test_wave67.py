"""Wave-67 operators: sliding windows + range-dimension lookup."""

import datetime as dt

from pyspark.sql import functions as F

from linkgraph_spark.functions.events import (
    sliding_window_counts,
    value_tier_profile,
)

SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_sliding_window_hand_case(spark):
    d = dt.datetime
    # one event at 10:31 with 60m/15m windows -> exactly 4 windows:
    # starts 09:45, 10:00, 10:15, 10:30
    events = _ev(spark, [(1, d(2024, 1, 1, 10, 31), 1, "click", 0.0, None)])
    rows = sliding_window_counts(events).collect()
    starts = sorted(r.window_start for r in rows)
    assert starts == [
        d(2024, 1, 1, 9, 45), d(2024, 1, 1, 10, 0),
        d(2024, 1, 1, 10, 15), d(2024, 1, 1, 10, 30),
    ]
    assert all(r.n == 1 for r in rows)
    # boundary: an event AT a window start is included there but NOT in
    # the window ending exactly at it
    at_edge = _ev(spark, [(2, d(2024, 1, 1, 10, 0), 1, "click", 0.0, None)])
    s2 = sorted(r.window_start for r in sliding_window_counts(at_edge).collect())
    assert s2[0] == d(2024, 1, 1, 9, 15) and s2[-1] == d(2024, 1, 1, 10, 0)
    assert len(s2) == 4


def test_sliding_window_mass_is_ratio(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = sliding_window_counts(events)
    total = out.agg(F.sum("n")).collect()[0][0]
    # every event lands in exactly window/slide = 4 windows
    assert total == 4 * events.count()


def test_value_tiers_partition_events(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    rows = value_tier_profile(events).collect()
    # bands cover the whole value domain, so the tiers partition events
    assert sum(r.n_events for r in rows) == events.count()
    assert {r.tier for r in rows} <= {"bronze", "silver", "gold", "platinum"}
    # boundary membership: 50.0 is silver (lo-inclusive, hi-exclusive)
    d = dt.datetime
    edge = _ev(spark, [(1, d(2024, 1, 1), 1, "click", 50.0, None)])
    got = value_tier_profile(edge).collect()
    assert len(got) == 1 and got[0].tier == "silver"
    # an uncovered value drops (no NULL-tier row)
    neg = _ev(spark, [(1, d(2024, 1, 1), 1, "click", -1.0, None)])
    assert value_tier_profile(neg).count() == 0
