"""Wave-27 operators: per-source quality drift, per-dimension embedding
variance, session entry/exit profile."""

import datetime

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.functions.events import entry_exit_profile
from linkgraph_spark.functions.similarity import dim_variance
from linkgraph_spark.functions.text import source_quality


# --------------------------------------------------------------- source_quality
def test_source_quality_separates_feeds(spark):
    good = "the quick brown fox and the lazy dog were friends for years"
    junk = "!!! ??? ### $$$ %%%"
    docs = [(i, good, "clean") for i in range(3)] + [
        (10 + i, junk, "spam") for i in range(2)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {r.source: r for r in source_quality(df).collect()}
    assert got["clean"].n_docs == 3 and got["spam"].n_docs == 2
    assert got["clean"].avg_quality > got["spam"].avg_quality
    assert got["spam"].avg_punct_ratio > 0.5


# ----------------------------------------------------------------- dim_variance
def test_dim_variance_flags_dead_dimension(spark):
    rows = [
        (0, [1.0, 5.0, 0.0]),
        (1, [3.0, 5.0, 0.0]),
        (2, [5.0, 5.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.pos: r for r in dim_variance(df).collect()}
    assert got[0].mean == 3.0
    assert got[0].var_pop == pytest.approx(round(8 / 3, 6), abs=1e-6)
    assert (got[0].mn, got[0].mx) == (1.0, 5.0)
    # dims 1 and 2 are dead (constant)
    assert got[1].var_pop == 0.0 and got[2].var_pop == 0.0
    assert got[2].mean == 0.0


# ---------------------------------------------------------- entry_exit_profile
def test_entry_exit_profile_hand_sessions(spark):
    t0 = datetime.datetime(2026, 1, 1)
    mk = lambda i, u, et, s: (i, t0 + datetime.timedelta(seconds=s), u, et, 0.0)  # noqa: E731
    rows = [
        # user 1, session A: view -> click (view entry, click exit)
        mk(0, 1, "view", 0),
        mk(1, 1, "click", 60),
        # user 1, session B after a 2h gap: single "view" bounce
        mk(2, 1, "view", 7800),
        # user 2: single "click" bounce
        mk(3, 2, "click", 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.event_type: r for r in entry_exit_profile(df).collect()}
    v, c = got["view"], got["click"]
    assert (v.n_events, v.n_entries, v.n_exits, v.n_bounces) == (2, 2, 1, 1)
    assert v.entry_rate == 1.0 and v.exit_rate == 0.5
    assert (c.n_events, c.n_entries, c.n_exits, c.n_bounces) == (2, 1, 2, 1)
    assert c.exit_rate == 1.0


def test_entry_exit_every_event_isolated_is_a_bounce(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(hours=2 * i), 1, "ping", 0.0) for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = entry_exit_profile(df).collect()[0]
    assert (r.n_events, r.n_bounces) == (3, 3)
    assert r.entry_rate == 1.0 and r.exit_rate == 1.0
