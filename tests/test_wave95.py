"""Wave-95 operators: classical additive seasonal decomposition (centered
7-day MA trend, epoch-anchored dow seasonal, residual) and Hyndman's STL
strength-of-component measures (FPP3 §4.3)."""

from datetime import datetime, timedelta

from linkgraph_spark.functions.events import (
    seasonal_decompose,
    seasonal_strength,
)

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_D0 = datetime(2024, 1, 1)  # epoch day 19723 -> dow 4 (Thursday = 0)


def _series(spark, day_values):
    rows = [
        (1, "purchase", float(v), _D0 + timedelta(days=int(t)))
        for t, v in day_values
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_pure_weekly_signal_zero_residual(spark):
    cycle = [10, 20, 30, 40, 50, 60, 70]
    ev = _series(spark, [(t, cycle[t % 7]) for t in range(14)])
    out = {r.day - 19723: r for r in seasonal_decompose(ev).collect()}
    assert len(out) == 14
    # edge days: no trend, no residual — but the dow seasonal still applies
    assert out[0].trend is None and out[0].residual is None
    assert out[0].seasonal == 10 - 40.0  # x(dow of day 0) − cycle mean
    # interior days: MA of a period-7 series is the cycle mean, exactly
    for t in range(3, 11):
        r = out[t]
        assert r.trend == 40.0
        assert r.seasonal == cycle[t % 7] - 40.0
        assert r.residual == 0.0
        assert r.revenue == float(cycle[t % 7])
    s = seasonal_strength(ev).collect()[0]
    assert (s.n_days, s.n_full) == (14, 8)
    assert s.strength_seasonal == 1.0
    assert s.strength_trend is None  # deseasonalized series is constant


def test_pure_linear_trend_no_seasonality(spark):
    ev = _series(spark, [(t, 100 + 10 * t) for t in range(14)])
    out = {r.day - 19723: r for r in seasonal_decompose(ev).collect()}
    for t in range(3, 11):
        # symmetric MA of a linear series recovers the center exactly
        assert out[t].trend == float(100 + 10 * t)
        assert out[t].seasonal == 0.0
        assert out[t].residual == 0.0
    s = seasonal_strength(ev).collect()[0]
    assert s.strength_trend == 1.0
    assert s.strength_seasonal is None  # detrended series is constant


def test_missing_calendar_day_densifies_to_zero(spark):
    # days 0..7 except day 3 -> the centered window at day 3 sees an
    # exact zero, not a shifted calendar
    vals = {0: 70, 1: 70, 2: 70, 4: 70, 5: 70, 6: 70, 7: 70}
    ev = _series(spark, list(vals.items()))
    out = {r.day - 19723: r for r in seasonal_decompose(ev).collect()}
    assert len(out) == 8  # densified: day 3 present
    assert out[3].revenue == 0.0
    assert out[3].trend == round(70 * 6 / 7, 4)
    assert out[4].trend == round(70 * 6 / 7, 4)
    s = seasonal_strength(ev).collect()[0]
    assert (s.n_days, s.n_full) == (7, 2)  # 7 days WITH events, 2 full windows


def test_short_series_is_all_null_not_error(spark):
    ev = _series(spark, [(t, 50) for t in range(4)])
    for r in seasonal_decompose(ev).collect():
        assert r.trend is None and r.seasonal is None and r.residual is None
    s = seasonal_strength(ev).collect()[0]
    assert s.n_full == 0
    assert s.strength_trend is None and s.strength_seasonal is None
