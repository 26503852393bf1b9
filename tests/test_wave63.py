"""Wave-63 operators: SCD2 changelog build + RANGE-frame rolling
anomaly."""

import datetime as dt

from pyspark.sql import functions as F

from linkgraph_spark.functions.events import rolling_daily_anomaly, scd2_user_state

SF = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_scd2_hand_case_collapses_and_versions(spark):
    events = _ev(spark, [
        (1, _ts("2024-01-01 00:00:00"), 7, "view"),
        (2, _ts("2024-01-01 01:00:00"), 7, "view"),      # repeat: collapsed
        (3, _ts("2024-01-01 02:00:00"), 7, "click"),
        (4, _ts("2024-01-01 03:00:00"), 7, "view"),      # back: NEW version
        (5, _ts("2024-01-01 00:30:00"), 8, "signup"),
    ])
    rows = sorted(
        scd2_user_state(events).collect(), key=lambda r: (r.user_id, r.version)
    )
    u7 = [r for r in rows if r.user_id == 7]
    assert [(r.state, r.version) for r in u7] == [
        ("view", 1), ("click", 2), ("view", 3)
    ]
    # intervals chain: valid_to == next valid_from, last is open
    assert u7[0].valid_to == u7[1].valid_from
    assert u7[1].valid_to == u7[2].valid_from
    assert u7[2].valid_to is None
    u8 = [r for r in rows if r.user_id == 8]
    assert len(u8) == 1 and u8[0].valid_to is None and u8[0].version == 1


def test_scd2_intervals_partition_time(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = scd2_user_state(events)
    # non-NULL intervals are strictly positive and never overlap per user
    bad = out.where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col("valid_from"))
    ).count()
    assert bad == 0
    # exactly one open (current) interval per user
    opens = out.where(F.col("valid_to").isNull()).groupBy("user_id").count()
    assert opens.where(F.col("count") != 1).count() == 0
    # versions are dense 1..n per user
    mx = out.groupBy("user_id").agg(
        F.max("version").alias("mx"), F.count("*").alias("n")
    )
    assert mx.where(F.col("mx") != F.col("n")).count() == 0


def test_rolling_anomaly_hand_case_range_not_rows(spark):
    # days 0,1,2 then a GAP to day 10: the day-10 window must contain
    # only itself (range semantics) — a rows frame would reach back
    base = _ts("2024-01-01 00:00:00")
    rows = []
    eid = 0
    for day, n in [(0, 2), (1, 4), (2, 6), (10, 100)]:
        for i in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day, minutes=i), 1, "click"))
    out = {
        r.day: r for r in rolling_daily_anomaly(_ev(spark, rows), trailing_days=7).collect()
    }
    assert out["2024-01-01"].mean_w == 2.0 and out["2024-01-01"].z_w is None
    assert out["2024-01-02"].mean_w == 3.0  # (2+4)/2
    assert out["2024-01-03"].mean_w == 4.0  # (2+4+6)/3
    # z on day 3: (6-4)/stddev([2,4,6]) = 2/2 = 1
    assert out["2024-01-03"].z_w == 1.0
    gap = out["2024-01-11"]
    assert gap.mean_w == 100.0 and gap.z_w is None  # window of ONE day


def test_rolling_anomaly_daily_totals(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = rolling_daily_anomaly(events)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # any z with a full window is finite; means are positive
    assert out.where(F.col("mean_w") <= 0).count() == 0
