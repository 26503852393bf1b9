"""Wave-104 operators: exact histogram-rank trimmed mean and daily
cross-correlation by lag."""

from datetime import datetime, timedelta

from linkgraph_spark.functions.events import daily_xcorr, trimmed_mean_values

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_D0 = datetime(2024, 1, 1)


def _vals(spark, vals, etype="purchase"):
    return spark.createDataFrame(
        [(1, etype, float(v), _D0) for v in vals], _SCHEMA
    )


def test_trimmed_mean_hand_computed(spark):
    # 10 values incl. a huge outlier; trim 0.1 -> drop min and max
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    r = trimmed_mean_values(_vals(spark, vals)).collect()[0]
    assert (r.n, r.k_cut) == (10, 1)
    assert r.mean_raw == round(sum(vals) / 10, 6)
    assert r.mean_trimmed == round(sum(vals[1:-1]) / 8, 6)


def test_trimmed_mean_ties_at_cut_rank_space(spark):
    # five 1s and five 9s; k=1 -> keep four 1s and four 9s -> mean 5
    vals = [1] * 5 + [9] * 5
    r = trimmed_mean_values(_vals(spark, vals)).collect()[0]
    assert r.mean_trimmed == 5.0


def test_trimmed_mean_everything_trimmed_is_null(spark):
    r = trimmed_mean_values(_vals(spark, [3.0, 7.0]), trim=0.5).collect()[0]
    assert r.k_cut == 1 and r.mean_trimmed is None
    assert r.mean_raw == 5.0


def _series(spark, x_by_day, y_by_day):
    rows = []
    for d, n in x_by_day.items():
        rows += [(1, "view", 1.0, _D0 + timedelta(days=d))] * n
    for d, n in y_by_day.items():
        rows += [(1, "purchase", 1.0, _D0 + timedelta(days=d))] * n
    return spark.createDataFrame(rows, _SCHEMA)


def test_xcorr_perfect_lead(spark):
    # y is exactly x shifted 2 days later -> r = 1.0 at lag 2
    x = {0: 5, 1: 1, 2: 4, 3: 2, 4: 6, 5: 3, 6: 1, 7: 5}
    y = {d + 2: n for d, n in x.items()}
    out = {r.lag: r for r in daily_xcorr(_series(spark, x, y), max_lag=3).collect()}
    assert out[2].r == 1.0
    assert len(out) == 7  # lags -3..3
    # other lags are strictly weaker
    for lag, r in out.items():
        if lag != 2 and r.r is not None:
            assert r.r < 1.0


def test_xcorr_constant_side_is_null(spark):
    x = {0: 3, 1: 3, 2: 3, 3: 3}  # constant -> zero variance
    y = {0: 1, 1: 5, 2: 2, 3: 7}
    out = daily_xcorr(_series(spark, x, y), max_lag=1).collect()
    assert all(r.r is None for r in out if r.lag == 0)


def test_xcorr_short_overlap_is_null(spark):
    x = {0: 1, 1: 2}
    y = {0: 2, 1: 1}
    out = {r.lag: r for r in daily_xcorr(_series(spark, x, y), max_lag=1).collect()}
    # overlap at lag ±1 is a single day -> NULL, lag 0 has only 2 days -> NULL
    assert all(r.r is None for r in out.values())
