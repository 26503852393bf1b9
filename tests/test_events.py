"""Event-stream analytics: sessionization, funnels, anomalies, props."""

import datetime as dt

from pyspark.sql import Row

from linkgraph_spark.functions.events import (
    funnel,
    props_profile,
    rate_anomaly,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=T0 + dt.timedelta(seconds=s),
                user_id=u,
                event_type=t,
                value=0.0,
                props=p,
            )
            for i, (s, u, t, p) in enumerate(rows)
        ]
    )


def test_sessionize_gap_split(spark):
    # user 1: events at 0s, 100s, 2000s -> sessions {0,100} and {2000};
    # user 2: single event -> one singleton session
    ev = _ev(
        spark,
        [
            (0, 1, "view", "{}"),
            (100, 1, "click", "{}"),
            (2000, 1, "view", "{}"),
            (50, 2, "view", "{}"),
        ],
    )
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_sec)
        for r in sessionize(ev, gap_sec=1800).collect()
    }
    assert got == {(1, 0): (2, 100), (1, 1): (1, 0), (2, 0): (1, 0)}


def test_sessionize_tie_breaks_on_event_id(spark):
    # two events at the identical timestamp stay one deterministic session
    ev = _ev(spark, [(0, 1, "view", "{}"), (0, 1, "click", "{}")])
    [r] = sessionize(ev, gap_sec=10).collect()
    assert (r.n_events, r.session_idx, r.duration_sec) == (2, 0, 0)


def test_funnel_strict_order(spark):
    # u1 completes view->click->purchase in order; u2 purchases BEFORE
    # clicking (drops at step 3); u3 only views
    ev = _ev(
        spark,
        [
            (0, 1, "view", "{}"),
            (10, 1, "click", "{}"),
            (20, 1, "purchase", "{}"),
            (0, 2, "view", "{}"),
            (5, 2, "purchase", "{}"),
            (10, 2, "click", "{}"),
            (0, 3, "view", "{}"),
        ],
    )
    rows = {r.step: r.n_users for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert rows == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_ts_not_counted(spark):
    # strictly-after semantics: click at the same second as the first view
    # does not advance the funnel
    ev = _ev(spark, [(0, 1, "view", "{}"), (0, 1, "click", "{}")])
    rows = {r.step: r.n_users for r in funnel(ev, ["view", "click"]).collect()}
    assert rows == {"view": 1, "click": 0}


def test_rate_anomaly_flags_burst_hour(spark):
    # type 'a': 1 event/hour for 8 hours, then a 10-event burst hour;
    # type 'b': constant rate -> zero variance -> no rows
    rows = [(3600 * h, 1, "a", "{}") for h in range(8)]
    rows += [(3600 * 8 + i, 1, "a", "{}") for i in range(10)]
    rows += [(3600 * h, 2, "b", "{}") for h in range(4)]
    out = rate_anomaly(_ev(spark, rows), z_threshold=2.0).collect()
    assert len(out) == 1
    [r] = out
    assert r.event_type == "a" and r.n == 10 and r.z > 2.0
    assert r.bucket_ts == int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) + 8 * 3600


def test_props_profile_extracts_json_key(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "a", '{"k": 5}'),
            (1, 1, "a", '{"k": 7}'),
            (2, 1, "a", '{"other": 1}'),
            (3, 1, "b", '{"k": -2}'),
        ],
    )
    got = {r.event_type: r for r in props_profile(ev, key="k").collect()}
    a, b = got["a"], got["b"]
    assert (a.n, a.n_with_key, a.min_v, a.max_v, a.avg_v, a.n_distinct) == (
        3, 2, 5, 7, 6.0, 2,
    )
    assert (b.n, b.n_with_key, b.min_v, b.max_v, b.avg_v, b.n_distinct) == (
        1, 1, -2, -2, -2.0, 1,
    )


def test_retention_cohorts_hand_values(spark):
    # week0 = 2024-01-01 (a Monday). u1 active wk0+wk1, u2 wk0 only,
    # u3 joins wk1 and is active wk1+wk2.
    day = 86400
    ev = _ev(
        spark,
        [
            (0, 1, "view", "{}"),
            (8 * day, 1, "view", "{}"),
            (1 * day, 2, "view", "{}"),
            (7 * day, 3, "view", "{}"),
            (15 * day, 3, "view", "{}"),
        ],
    )
    from linkgraph_spark.functions.events import retention_cohorts

    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.retention)
        for r in retention_cohorts(ev).collect()
    }
    wk0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    wk1 = wk0 + 7 * day
    assert got == {
        (wk0, 0): (2, 1.0),
        (wk0, 1): (1, 0.5),
        (wk1, 0): (1, 1.0),
        (wk1, 1): (1, 1.0),
    }


def test_session_pairs_counts_and_lift(spark):
    # u1 session0: view+click; u1 session1: view only; u2 session0:
    # view+click+buy. Sessions N=3; supp view=3, click=2, buy=1.
    ev = _ev(
        spark,
        [
            (0, 1, "view", "{}"),
            (10, 1, "click", "{}"),
            (5000, 1, "view", "{}"),
            (0, 2, "view", "{}"),
            (5, 2, "click", "{}"),
            (9, 2, "buy", "{}"),
        ],
    )
    from linkgraph_spark.functions.events import session_pairs

    got = {
        (r.type_a, r.type_b): (r.n_sessions, r.lift)
        for r in session_pairs(ev, gap_sec=1800).collect()
    }
    # lift(a,b) = (n_ab/n_a) * (N/n_b)
    assert got == {
        ("click", "view"): (2, round((2 / 2) * (3 / 3), 6)),
        ("buy", "view"): (1, round((1 / 1) * (3 / 3), 6)),
        ("buy", "click"): (1, round((1 / 1) * (3 / 2), 6)),
    }


def test_session_pairs_same_type_never_pairs_itself(spark):
    # two views in one session must NOT yield a (view, view) pair
    ev = _ev(spark, [(0, 1, "view", "{}"), (10, 1, "view", "{}")])
    from linkgraph_spark.functions.events import session_pairs

    assert session_pairs(ev, gap_sec=1800).count() == 0
