"""Wave-28 operators: per-type value percentiles, transition reaction-time
latency."""

import datetime

import pytest

from linkgraph_spark.functions.events import transition_latency, value_percentiles


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_value_percentiles_interpolation(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [(i, t0, 1, "buy", float(v)) for i, v in enumerate([10, 20, 30, 40])]
    rows.append((9, t0, 1, "buy", None))  # NULL excluded from count and quantile
    got = value_percentiles(_ev(spark, rows), ps=(0.5, 0.9)).collect()[0]
    assert got.n == 4
    assert got.p50 == 25.0  # midpoint of 20, 30
    assert got.p90 == pytest.approx(37.0, abs=1e-9)  # 30 + 0.7·10


def test_value_percentiles_per_type(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [(0, t0, 1, "a", 1.0), (1, t0, 1, "b", 100.0)]
    got = {r.event_type: r for r in value_percentiles(_ev(spark, rows)).collect()}
    assert got["a"].p50 == 1.0 and got["b"].p50 == 100.0


def test_transition_latency_hand_gaps(spark):
    t0 = datetime.datetime(2026, 1, 1)
    mk = lambda i, u, et, s: (i, t0 + datetime.timedelta(seconds=s), u, et, 0.0)  # noqa: E731
    rows = [
        mk(0, 1, "view", 0),
        mk(1, 1, "click", 10),   # view→click gap 10
        mk(2, 1, "view", 40),    # click→view gap 30
        mk(3, 1, "click", 90),   # view→click gap 50
        mk(4, 1, "view", 99999), # beyond gap_sec: excluded
    ]
    got = {
        (r.src_type, r.dst_type): r
        for r in transition_latency(_ev(spark, rows)).collect()
    }
    vc = got[("view", "click")]
    assert vc.n == 2
    assert vc.p50_gap == 30.0  # midpoint of 10 and 50
    assert vc.p90_gap == pytest.approx(46.0, abs=1e-9)
    assert got[("click", "view")].n == 1
    assert ("view", "view") not in got  # the 99999s gap breaks the chain
