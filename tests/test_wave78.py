"""Wave-78 operators: IBLT set reconciliation, EWMA smoothing."""

import datetime as dt

import pytest

from linkgraph_spark.functions.events import revenue_ewma
from linkgraph_spark.functions.sketches import iblt_set_diff

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


def test_iblt_recovers_exact_symmetric_difference(spark):
    common = list(range(1000, 2000))
    a_only = [7, 13, 42, 9999991]
    b_only = [5, 77]
    a = _keys(spark, common + a_only)
    b = _keys(spark, common + b_only)
    rows = iblt_set_diff(a, b, "k", cells=64).collect()
    got = {(r.k, r.side) for r in rows}
    assert got == {(k, "a_only") for k in a_only} | {
        (k, "b_only") for k in b_only
    }


def test_iblt_empty_difference_and_schema(spark):
    a = _keys(spark, range(50))
    b = _keys(spark, range(50))
    res = iblt_set_diff(a, b, "k", cells=33)
    assert res.columns == ["k", "side"]
    assert res.count() == 0


def test_iblt_moderate_diff_decodes_near_capacity(spark):
    # 120 differing keys in 256 cells: load ~1.4 per subtable-slot pair
    # is fine for 3-hash peeling with independent hashes
    a = _keys(spark, [i for i in range(5000) if i % 83 != 0])
    b = _keys(spark, [i for i in range(5000) if i % 89 != 0])
    expect_a_only = {i for i in range(5000) if i % 89 == 0 and i % 83 != 0}
    expect_b_only = {i for i in range(5000) if i % 83 == 0 and i % 89 != 0}
    rows = iblt_set_diff(a, b, "k", cells=256).collect()
    assert {r.k for r in rows if r.side == "a_only"} == expect_a_only
    assert {r.k for r in rows if r.side == "b_only"} == expect_b_only


def test_iblt_raises_loudly_when_undersized(spark):
    a = _keys(spark, range(0, 600))
    b = _keys(spark, range(300, 900))  # diff = 600 keys >> 30 cells
    with pytest.raises(ValueError, match="undecodable"):
        iblt_set_diff(a, b, "k", cells=30).collect()


def test_ewma_matches_reference_recurrence(spark):
    vals = [10.0, 20.0, 5.0, 5.0, 40.0]
    d0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (i, d0 + dt.timedelta(days=i), 1, "e", v, None)
        for i, v in enumerate(vals)
    ]
    out = revenue_ewma(
        spark.createDataFrame(rows, _EV_SCHEMA), alpha=0.3
    ).collect()
    # reference: ewma_0 = x_0; ewma_t = 0.3 x_t + 0.7 ewma_{t-1}
    ref = [vals[0]]
    for v in vals[1:]:
        ref.append(0.3 * v + 0.7 * ref[-1])
    assert [r.revenue for r in out] == vals
    assert [r.ewma for r in out] == [round(x, 4) for x in ref]


# ---------------------------------------------------- review-fix regressions
def test_asof_and_nearest_accept_empty_right_cols(spark):
    import datetime as dt

    from linkgraph_spark.functions.joins import asof_join, nearest_join

    d = dt.datetime
    left = spark.createDataFrame(
        [(1, 10, d(2024, 1, 1, 12))], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, d(2024, 1, 1, 11)), (10, d(2024, 1, 1, 14))],
        "k long, ts timestamp",
    )
    a = asof_join(left, right, key="k").collect()[0]
    assert a.asof_ts == d(2024, 1, 1, 11)
    n = nearest_join(left, right, key="k").collect()[0]
    assert n.near_ts == d(2024, 1, 1, 11)  # 1h back vs 2h forward


def test_digest_join_mixed_key_types_still_exact(spark):
    from linkgraph_spark.functions.joins import digest_pruned_join

    fact = spark.createDataFrame(
        [(i,) for i in range(20)], "k int"  # INT fact key
    )
    dim = spark.createDataFrame(
        [(3, "x"), (7, "y")], "dk long, name string"  # BIGINT dim key
    )
    got = digest_pruned_join(fact, dim, "k", "dk", bits=16)
    assert sorted((r.k, r.name) for r in got.collect()) == [(3, "x"), (7, "y")]


def test_removal_effects_empty_stream_returns_empty_frame(spark):
    from linkgraph_spark.functions.events import removal_effects

    empty = spark.createDataFrame([], _EV_SCHEMA)
    res = removal_effects(empty)
    assert res.columns == ["channel", "removal_effect"]
    assert res.count() == 0
