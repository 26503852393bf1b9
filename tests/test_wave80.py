"""Wave-80 operators: consistent-hash rebalance audit, watermark
(late-data) audit."""

import datetime as dt

from linkgraph_spark.functions.events import watermark_audit
from linkgraph_spark.functions.layout import _ring, rebalance_audit

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_ring_is_deterministic_and_grows_incrementally():
    r8 = _ring(8, 64)
    r9 = _ring(9, 64)
    assert r8 == _ring(8, 64)
    # the 9-shard ring is the 8-shard ring plus shard 8's vnodes: old
    # nodes keep their positions (the consistent-hashing property)
    assert set(r8) < set(r9)
    assert {s for _, s in r9} - {s for _, s in r8} == {8}


def test_rebalance_ring_moves_a_sliver_mod_moves_most(spark):
    keys = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    rows = {r.scheme: r for r in rebalance_audit(keys, "k").collect()}
    assert rows["mod"].n_keys == rows["ring"].n_keys == 2000
    # mod re-deals ~ n/(n+1) = 8/9 of keys; the ring only what the new
    # node claims (~1/9, vnode-jittered)
    assert rows["mod"].moved_frac > 0.8
    assert rows["ring"].moved_frac < 0.25
    assert rows["ring"].moved_frac > 0.0


def test_watermark_audit_counts_per_user_regressions(spark):
    d = dt.datetime
    rows = [
        # user 1 arrival order (event_id): t=100, t=40 (late by 60),
        # t=200, t=190 (late by 10)
        (1, d(2024, 1, 1, 0, 1, 40), 1, "e", 1.0, None),
        (2, d(2024, 1, 1, 0, 0, 40), 1, "e", 1.0, None),
        (3, d(2024, 1, 1, 0, 3, 20), 1, "e", 1.0, None),
        (4, d(2024, 1, 1, 0, 3, 10), 1, "e", 1.0, None),
        # user 2 strictly in order: contributes no lateness
        (5, d(2024, 1, 1, 0, 0, 30), 2, "e", 1.0, None),
        (6, d(2024, 1, 1, 0, 2, 0), 2, "e", 1.0, None),
    ]
    out = watermark_audit(spark.createDataFrame(rows, _EV_SCHEMA)).collect()[0]
    assert (out.n_events, out.n_late) == (6, 2)
    assert out.max_lateness_sec == 60
    assert out.p50_lateness_sec == 35.0  # interpolated between 10 and 60


def test_watermark_audit_all_ordered_gives_null_percentiles(spark):
    d = dt.datetime
    rows = [
        (i, d(2024, 1, 1, 0, i), 1, "e", 1.0, None) for i in range(1, 5)
    ]
    out = watermark_audit(spark.createDataFrame(rows, _EV_SCHEMA)).collect()[0]
    assert out.n_late == 0
    assert out.max_lateness_sec is None
    assert out.p95_lateness_sec is None
