"""Wave-76 operators: bidirectional nearest-event join, Kaplan–Meier
conversion survival with censoring, Z-order layout audit."""

import datetime as dt

from pyspark.sql import functions as F

from linkgraph_spark.functions.events import kaplan_meier_conversion
from linkgraph_spark.functions.joins import nearest_join
from linkgraph_spark.functions.layout import morton_key, zorder_audit

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _ev(spark, rows):
    """rows: (event_id, ts, user_id, event_type)."""
    return spark.createDataFrame(
        [(i, t, u, e, 1.0, None) for (i, t, u, e) in rows], _EV_SCHEMA
    )


# ------------------------------------------------------------ nearest join
def test_nearest_join_picks_closer_side_and_breaks_ties_earlier(spark):
    d = dt.datetime
    left = spark.createDataFrame(
        [(1, 10, d(2024, 1, 1, 12, 0))], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (100, 10, d(2024, 1, 1, 11, 58)),  # 2 min before
            (101, 10, d(2024, 1, 1, 12, 1)),   # 1 min after -> closer
        ],
        "rid long, k long, ts timestamp",
    )
    row = nearest_join(left, right, key="k", right_cols=("rid",)).collect()[0]
    assert row.near_rid == 101
    # exact tie: 2 min both sides -> earlier (backward) row wins
    right_tie = spark.createDataFrame(
        [(100, 10, d(2024, 1, 1, 11, 58)), (101, 10, d(2024, 1, 1, 12, 2))],
        "rid long, k long, ts timestamp",
    )
    row = nearest_join(left, right_tie, key="k", right_cols=("rid",)).collect()[0]
    assert row.near_rid == 100


def test_nearest_join_equal_ts_match_and_missing_key_nulls(spark):
    d = dt.datetime(2024, 1, 1, 12, 0)
    left = spark.createDataFrame(
        [(1, 10, d), (2, 99, d)], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 10, d)], "rid long, k long, ts timestamp"
    )
    rows = {r.lid: r for r in nearest_join(
        left, right, key="k", right_cols=("rid",)
    ).collect()}
    assert rows[1].near_rid == 100 and rows[1].near_ts == d  # zero gap
    assert rows[2].near_rid is None and rows[2].near_ts is None


# ------------------------------------------------------------ Kaplan-Meier
def test_kaplan_meier_censoring_shrinks_risk_set(spark):
    d = dt.datetime
    # 4 signups on day 0. u1 converts day 1; u2 censored (no purchase,
    # observation ends 2024-01-05); u3 converts day 3; u4 censored.
    # Stream end = 2024-01-05 (last event overall).
    rows = [
        (1, d(2024, 1, 1), 1, "signup"),
        (2, d(2024, 1, 1), 2, "signup"),
        (3, d(2024, 1, 1), 3, "signup"),
        (4, d(2024, 1, 1), 4, "signup"),
        (5, d(2024, 1, 2), 1, "purchase"),     # day 1
        (6, d(2024, 1, 4), 3, "purchase"),     # day 3
        (7, d(2024, 1, 5), 9, "click"),        # sets the censor horizon
    ]
    out = kaplan_meier_conversion(_ev(spark, rows)).collect()
    got = [(r.day, r.n_risk, r.n_events, r.survival) for r in out]
    # day 1: 4 at risk, 1 event -> S = 0.75
    # day 3: u2/u4 censor at day 4 (after day 3!), so still 3 at risk
    assert got == [(1, 4, 1, 0.75), (3, 3, 1, 0.5)]


def test_kaplan_meier_survival_hits_exact_zero_when_all_convert(spark):
    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1), 1, "signup"),
        (2, d(2024, 1, 2), 1, "purchase"),
    ]
    out = kaplan_meier_conversion(_ev(spark, rows)).collect()
    assert [(r.day, r.survival) for r in out] == [(1, 0.0)]


def test_kaplan_meier_purchase_before_signup_is_censored(spark):
    d = dt.datetime
    rows = [
        (1, d(2024, 1, 3), 1, "signup"),
        (2, d(2024, 1, 2), 1, "purchase"),  # precedes signup: not an event
        (3, d(2024, 1, 9), 9, "click"),
    ]
    assert kaplan_meier_conversion(_ev(spark, rows)).count() == 0


# ------------------------------------------------------------ Z-order audit
def test_morton_key_interleaves_bits(spark):
    df = spark.range(1).select(
        morton_key(F.lit(3), F.lit(5)).alias("z"),
        morton_key(F.lit(1), F.lit(0)).alias("zx"),
        morton_key(F.lit(0), F.lit(1)).alias("zy"),
    )
    row = df.collect()[0]
    assert (row.z, row.zx, row.zy) == (39, 1, 2)


def test_zorder_buckets_bound_both_dimensions(spark):
    d0 = dt.datetime(2024, 1, 1)
    # full 32x32 grid of (user, day) — uniform occupancy
    rows = [
        (u * 32 + day, d0 + dt.timedelta(days=day), u, "click")
        for u in range(32)
        for day in range(32)
    ]
    out = zorder_audit(_ev(spark, rows), bucket_bits=6).collect()
    assert sum(r.n_rows for r in out) == 32 * 32
    # top-6 Morton bits fix 3 high bits of EACH quantized dimension:
    # every bucket spans <= 1/8 of both ranges (4 of 32 values)
    for r in out:
        assert r.user_max - r.user_min <= 3
        assert r.day_max - r.day_min <= 3
