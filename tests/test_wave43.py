"""Wave-43 operators: day-of-week profile, per-tool latency, kNN label
confusion matrix."""

import datetime

import pytest

from linkgraph_spark.functions.events import dow_profile
from linkgraph_spark.functions.similarity import knn_confusion
from linkgraph_spark.transcripts import tool_latency


# ------------------------------------------------------------------ dow_profile
def test_dow_profile_known_days(spark):
    # 2026-01-01 is a Thursday (dow 3), 2026-01-03 a Saturday (dow 5)
    rows = [
        (0, datetime.datetime(2026, 1, 1, 10), 1, "view", 2.0),
        (1, datetime.datetime(2026, 1, 1, 23), 1, "view", 4.0),
        (2, datetime.datetime(2026, 1, 3, 0), 1, "view", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.dow: r for r in dow_profile(df).collect()}
    assert set(got) == {3, 5}
    assert got[3].n_events == 2 and got[3].avg_value == 3.0
    assert got[3].share == pytest.approx(round(2 / 3, 6))
    assert got[5].total_value == 10.0


# ----------------------------------------------------------------- tool_latency
def test_tool_latency_hand_gaps(spark):
    t0 = datetime.datetime(2026, 1, 1)
    mk = lambda c, i, tool, s: (c, i, "assistant", "x", tool, t0 + datetime.timedelta(seconds=s))  # noqa: E731
    rows = [
        mk("c1", 0, "search", 0),
        mk("c1", 1, None, 10),        # search gap 10
        mk("c1", 2, "search", 20),
        mk("c1", 3, None, 50),        # search gap 30
        mk("c2", 0, "code", 0),
        mk("c2", 1, None, 5),         # code gap 5
        mk("c2", 2, "code", 100),     # conversation ender: dropped
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r.tool: r for r in tool_latency(df).collect()}
    assert got["search"].n == 2
    assert got["search"].p50_gap == 20.0  # midpoint of 10, 30
    assert got["search"].max_gap == 30.0
    assert got["code"].n == 1 and got["code"].p50_gap == 5.0


# ---------------------------------------------------------------- knn_confusion
def test_knn_confusion_hand(spark):
    rows = [
        ([1.0, 0.0], 1),      # query 0 (label 1)
        ([0.99, 0.01], 2),    # close, label 2
        ([0.98, 0.02], 1),    # close, label 1
        ([0.0, 1.0], 3),      # far, label 3
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, (v, l) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r.q_label, r.n_label): r.n_votes
        for r in knn_confusion(df, n_queries=1, k=2).collect()
    }
    assert got == {(1, 2): 1, (1, 1): 1}
