"""Wave-62 operators: as-of join and keyless interval join."""

import datetime as dt

import pytest

from linkgraph_spark.functions.joins import (
    asof_join,
    asof_purchase_click,
    interval_error_purchases,
    interval_join,
)

SF = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00")),
         (2, "u", _ts("2024-01-01 12:00:00")),
         (3, "v", _ts("2024-01-01 09:00:00")),
         (4, "w", _ts("2024-01-01 09:00:00"))],
        "id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:30:00"), 100),
         ("u", _ts("2024-01-01 12:00:00"), 200),  # equal ts: must match row 2
         ("u", _ts("2024-01-01 12:00:00"), 150),  # same (key, ts): max wins
         ("v", _ts("2024-01-01 09:30:00"), 300)],  # after left row 3: no match
        "user_id string, ts timestamp, val int",
    )
    got = {
        r.id: (r.asof_ts, r.asof_val)
        for r in asof_join(left, right, "user_id", right_cols=("val",)).collect()
    }
    assert got[1] == (_ts("2024-01-01 09:30:00"), 100)
    assert got[2] == (_ts("2024-01-01 12:00:00"), 200)
    assert got[3] == (None, None)  # only future right rows
    assert got[4] == (None, None)  # key absent on the right


def test_asof_join_rejects_column_clash(spark):
    df = spark.createDataFrame([("u", _ts("2024-01-01 00:00:00"), 1)],
                               "user_id string, ts timestamp, val int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, "user_id", right_cols=("val",))


def test_asof_gate_matches_brute_force(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    rows = asof_purchase_click(events).collect()
    purchases = {r.event_id: r for r in rows}
    ev = events.select("event_id", "user_id", "ts", "event_type").collect()
    clicks = [e for e in ev if e.event_type == "click"]
    for p in (e for e in ev if e.event_type == "purchase"):
        prior = [c for c in clicks if c.user_id == p.user_id and c.ts <= p.ts]
        want = max((c.ts for c in prior), default=None)
        assert purchases[p.event_id].asof_ts == want, p.event_id
        if want is not None:
            # gap_sec counts second-BOUNDARY crossings (unix_timestamp
            # truncates sub-second parts; DuckDB date_diff'second' agrees)
            assert purchases[p.event_id].gap_sec == int(
                (
                    p.ts.replace(microsecond=0) - want.replace(microsecond=0)
                ).total_seconds()
            )


def test_interval_join_bin_boundaries(spark):
    # intervals that span bins, sit inside one bin, and are inverted
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:09:00"), _ts("2024-01-01 00:21:00")),  # spans 3 bins
         (2, _ts("2024-01-01 00:11:00"), _ts("2024-01-01 00:12:00")),  # inside one
         (3, _ts("2024-01-01 00:30:00"), _ts("2024-01-01 00:30:00")),  # empty
         (4, _ts("2024-01-01 00:40:00"), _ts("2024-01-01 00:30:00"))],  # inverted
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    pt = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:09:00")),   # == start of 1 (inclusive)
         (11, _ts("2024-01-01 00:21:00")),   # == end of 1 (exclusive)
         (12, _ts("2024-01-01 00:19:59")),   # last second of 1's middle bin
         (13, _ts("2024-01-01 00:11:30")),   # inside 1 and 2
         (14, _ts("2024-01-01 00:30:00"))],  # empty/inverted never match
        "pid long, ts timestamp",
    )
    got = {
        (r.iid, r.pid)
        for r in interval_join(iv, pt, bin_width_sec=600).collect()
    }
    assert got == {(1, 10), (1, 12), (1, 13), (2, 13)}
    # pairs are unique even though interval 1 spans three bins
    rows = interval_join(iv, pt, bin_width_sec=600).collect()
    assert len(rows) == len(got)


def test_interval_gate_bin_width_invariant(spark):
    # the bin width is an implementation knob: results must not change
    events = spark.read.parquet(f"{SF}/events.parquet")
    base = {
        (r.error_id, r.n_purchases)
        for r in interval_error_purchases(events, window_sec=600).collect()
    }
    assert base
    from pyspark.sql import functions as F
    from linkgraph_spark.functions.joins import interval_join as ij

    errors = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 600 SECONDS")).alias("end_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts"
    )
    for width in (37, 7200):
        alt = {
            (r.error_id, r.n_purchases)
            for r in ij(errors, purchases, bin_width_sec=width)
            .groupBy("error_id")
            .agg(F.count("*").alias("n_purchases"))
            .collect()
        }
        assert alt == base, width


def test_interval_join_subsecond_end(spark):
    # interval end with a sub-second fraction at a bin boundary: the
    # point in the final fractional second must still match (regression:
    # second-truncated bin arithmetic dropped it)
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:20:00.500"), _ts("2024-01-01 00:30:00.500"))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    pt = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:30:00.300")),   # inside (end is .500)
         (11, _ts("2024-01-01 00:30:00.500")),   # == end: excluded
         (12, _ts("2024-01-01 00:20:00.500"))],  # == start: included
        "pid long, ts timestamp",
    )
    got = {(r.iid, r.pid)
           for r in interval_join(iv, pt, bin_width_sec=600).collect()}
    assert got == {(1, 10), (1, 12)}


def test_asof_join_null_payload_not_torn(spark):
    # the matched right row's NULL payload must come through as NULL,
    # never backfilled from an older right row (regression: per-column
    # last(ignorenulls) tore ts and payload from different rows)
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 12:00:00"))],
        "id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:00:00"), 5),
         ("u", _ts("2024-01-01 10:00:00"), None)],
        "user_id string, ts timestamp, val int",
    )
    r = asof_join(left, right, "user_id", right_cols=("val",)).collect()[0]
    assert r.asof_ts == _ts("2024-01-01 10:00:00")
    assert r.asof_val is None
