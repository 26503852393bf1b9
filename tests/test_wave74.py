"""Wave-74 operators: incremental per-user state maintenance (merge ==
full recompute), exact sliding-window distinct users, Markov removal-
effect attribution (fixed-iteration chain solve)."""

import datetime as dt

from linkgraph_spark.functions.events import (
    _attribution_transitions,
    removal_effects,
    sliding_distinct_users,
)
from linkgraph_spark.functions.reconcile import (
    merge_user_value_state,
    user_value_state,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _ev(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    return spark.createDataFrame(
        [(i, t, u, e, v, None) for (i, t, u, e, v) in rows], _EV_SCHEMA
    )


# ----------------------------------------------------- incremental state
def test_merge_equals_full_recompute_across_user_overlap(spark):
    d = dt.datetime
    hist = _ev(
        spark,
        [
            (1, d(2024, 1, 1), 1, "click", 2.5),
            (2, d(2024, 1, 2), 1, "click", -1.0),
            (3, d(2024, 1, 3), 2, "view", 4.0),   # user 2: history only
        ],
    )
    delta = _ev(
        spark,
        [
            (4, d(2024, 1, 10), 1, "click", 10.0),  # overlaps user 1
            (5, d(2024, 1, 11), 3, "view", 7.25),   # user 3: delta only
        ],
    )
    merged = merge_user_value_state(user_value_state(hist), delta)
    full = user_value_state(hist.unionByName(delta))
    key = lambda r: r.user_id  # noqa: E731
    assert sorted(merged.collect(), key=key) == sorted(
        full.collect(), key=key
    )


def test_merge_state_null_values_counted_but_not_summed(spark):
    d = dt.datetime
    hist = _ev(spark, [(1, d(2024, 1, 1), 1, "click", None)])
    delta = _ev(spark, [(2, d(2024, 1, 2), 1, "click", 3.0)])
    row = merge_user_value_state(user_value_state(hist), delta).collect()[0]
    assert (row.n_events, row.value_sum, row.value_min) == (2, 3.0, 3.0)


# -------------------------------------------------- sliding distinct users
def test_sliding_reach_window_membership_and_distinctness(spark):
    d = dt.datetime
    # user 1 active on days 0 and 2 (epoch days 19723=2024-01-01 irrelevant:
    # use explicit dates); user 2 active on day 2 twice (dedup)
    events = _ev(
        spark,
        [
            (1, d(2024, 1, 1, 5), 1, "click", 1.0),
            (2, d(2024, 1, 3, 6), 1, "click", 1.0),
            (3, d(2024, 1, 3, 7), 2, "view", 1.0),
            (4, d(2024, 1, 3, 8), 2, "view", 1.0),
        ],
    )
    rows = sliding_distinct_users(events, window_days=2, slide_days=1).collect()
    got = {str(r.window_start): r.n_users for r in rows}
    # windows [start, start+2): 12-31 sees day 1-1; 01-02..01-03 see day 3
    assert got == {
        "2023-12-31": 1,  # covers 12-31, 01-01 -> user 1
        "2024-01-01": 1,  # covers 01-01, 01-02 -> user 1
        "2024-01-02": 2,  # covers 01-02, 01-03 -> users 1, 2
        "2024-01-03": 2,  # covers 01-03, 01-04 -> users 1, 2
    }


# ------------------------------------------------- removal-effect attribution
def test_attribution_paths_truncate_at_first_conversion(spark):
    d = dt.datetime
    events = _ev(
        spark,
        [
            # u1, one session: click -> purchase -> view (view ignored)
            (1, d(2024, 1, 1, 10, 0), 1, "click", 1.0),
            (2, d(2024, 1, 1, 10, 5), 1, "purchase", 1.0),
            (3, d(2024, 1, 1, 10, 6), 1, "view", 1.0),
            # u1, second session (gap > 30 min): view only, no conversion
            (4, d(2024, 1, 1, 12, 0), 1, "view", 1.0),
            # u2: purchase as FIRST event -> START -> CONV directly
            (5, d(2024, 1, 2, 9, 0), 2, "purchase", 1.0),
        ],
    )
    trans = {
        (r.src, r.dst): r.n
        for r in _attribution_transitions(events, 1800, "purchase").collect()
    }
    assert trans == {
        ("START", "click"): 1,
        ("click", "CONV"): 1,
        ("START", "view"): 1,
        ("view", "NULL"): 1,
        ("START", "CONV"): 1,
    }


def test_removal_effect_sole_converting_channel_is_total(spark):
    d = dt.datetime
    events = _ev(
        spark,
        [
            # u1: click -> purchase (converts through click)
            (1, d(2024, 1, 1, 10, 0), 1, "click", 1.0),
            (2, d(2024, 1, 1, 10, 5), 1, "purchase", 1.0),
            # u2: view, no conversion
            (3, d(2024, 1, 2, 10, 0), 2, "view", 1.0),
        ],
    )
    got = {r.channel: r.removal_effect for r in removal_effects(events).collect()}
    # all conversion flows through click; view carries none
    assert got == {"click": 1.0, "view": 0.0}


def test_removal_effects_empty_when_no_conversions(spark):
    events = _ev(spark, [(1, dt.datetime(2024, 1, 1), 1, "view", 1.0)])
    res = removal_effects(events)
    assert res.columns == ["channel", "removal_effect"]
    assert res.count() == 0
