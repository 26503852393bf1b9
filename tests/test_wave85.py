"""Wave-85 operator: uplift-by-decile (Qini-style) readout."""

import datetime as dt

from linkgraph_spark.functions.events import uplift_by_decile

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_uplift_deciles_partition_all_users_and_rates_are_sane(spark):
    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    eid = 0
    for u in range(1, 41):
        eid += 1
        rows.append((eid, pre, u, "click", float(u), None))  # score ~ u
        if u % 3 == 0:  # every third user converts post-split
            eid += 1
            rows.append((eid, post, u, "purchase", 1.0, None))
    out = uplift_by_decile(spark.createDataFrame(rows, _EV_SCHEMA)).collect()
    assert [r.decile for r in out] == list(range(10))
    assert sum(r.n_control + r.n_treatment for r in out) == 40
    for r in out:
        if r.rate_control is not None:
            assert 0.0 <= r.rate_control <= 1.0
        if r.rate_treatment is not None:
            assert 0.0 <= r.rate_treatment <= 1.0
        if r.uplift is not None:
            assert r.uplift == round(r.rate_treatment - r.rate_control, 6)


def test_uplift_decile_missing_arm_yields_null_not_inf(spark):
    # two users only: at least 8 deciles miss an arm entirely
    pre = dt.datetime(2024, 1, 10)
    rows = [
        (1, pre, 1, "click", 1.0, None),
        (2, pre, 2, "click", 100.0, None),
    ]
    out = uplift_by_decile(spark.createDataFrame(rows, _EV_SCHEMA)).collect()
    for r in out:
        if r.n_control == 0 or r.n_treatment == 0:
            assert r.uplift is None


def test_uplift_users_without_pre_events_land_in_bottom_deciles(spark):
    post = dt.datetime(2024, 1, 20)
    pre = dt.datetime(2024, 1, 10)
    rows = [
        (1, post, 1, "purchase", 1.0, None),   # no pre activity: score 0
        (2, pre, 2, "click", 50.0, None),      # strong pre score
    ]
    out = uplift_by_decile(spark.createDataFrame(rows, _EV_SCHEMA)).collect()
    by_decile = {r.decile: r for r in out}
    # the zero-score user sits strictly below the scored user's decile
    assert min(by_decile) == 0 and max(by_decile) == 9
