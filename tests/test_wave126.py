"""Wave-126 operators: Mann-Kendall trend test and Ljung-Box
white-noise test on the daily revenue series."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import (
    ljung_box_revenue,
    mann_kendall_revenue,
)

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def _daily(spark, revs, gap_days=None):
    rows = []
    for d, v in enumerate(revs):
        if v is None:
            continue  # calendar gap: no events that day
        rows.append((1, "purchase", float(v), _T0 + timedelta(days=d)))
    return spark.createDataFrame(rows, _SCHEMA)


def _mk_hand(revs):
    cents = [round(v * 10000) for v in revs]
    n = len(cents)
    s = sum(
        (cents[j] > cents[i]) - (cents[j] < cents[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(cents)
    vnum = n * (n - 1) * (2 * n + 5) - sum(
        c * (c - 1) * (2 * c + 5) for c in ties.values()
    )
    if vnum <= 0:
        return s, None
    sd = math.sqrt(vnum / 18.0)
    z = (s - 1) / sd if s > 0 else (s + 1) / sd if s < 0 else 0.0
    return s, z


def test_mann_kendall_hand_computed(spark):
    revs = [10.0, 14.0, 12.0, 18.0, 17.0, 22.0, 25.0, 24.0, 30.0]
    out = mann_kendall_revenue(_daily(spark, revs)).collect()[0]
    s, z = _mk_hand(revs)
    assert out.n_days == len(revs)
    assert out.s_stat == s
    assert out.z == round(z, 6)
    assert out.trend == (
        "increasing" if round(z, 6) > 1.959964 else "none"
    )
    assert out.s_stat > 0


def test_mann_kendall_flat_is_null(spark):
    out = mann_kendall_revenue(_daily(spark, [5.0] * 6)).collect()[0]
    assert out.s_stat == 0 and out.z is None and out.trend is None


def test_mann_kendall_decreasing(spark):
    revs = [float(100 - 7 * i) for i in range(10)]
    out = mann_kendall_revenue(_daily(spark, revs)).collect()[0]
    s, z = _mk_hand(revs)
    assert out.s_stat == -45  # all pairs discordant
    assert out.z == round(z, 6)
    assert out.trend == "decreasing"


def _lb_hand(revs, max_lag):
    x = [round(v * 10000) if v is not None else 0 for v in revs]
    n = len(x)
    s1, sxx = sum(x), sum(v * v for v in x)
    den = n * n * sxx - n * s1 * s1
    out = []
    qcum = 0
    for k in range(1, max_lag + 1):
        ak = sum(x[t] * x[t - k] for t in range(k, n))
        bk = sum(x[t] for t in range(k, n))
        ck = sum(x[t - k] for t in range(k, n))
        if n > k and den > 0:
            rk = (n * n * ak - n * s1 * (bk + ck) + (n - k) * s1 * s1) / den
            qcum += round(1e9 * rk * rk / (n - k))
            out.append((k, round(rk, 6), round(n * (n + 2.0) * qcum / 1e9, 6)))
        else:
            out.append((k, None, None))
    return out


def test_ljung_box_hand_computed_with_gap(spark):
    # day 3 has no events -> densified to an exact zero-revenue day
    revs = [10.0, 12.0, 11.0, None, 13.0, 12.5, 14.0, 11.5, 15.0, 13.0]
    out = ljung_box_revenue(_daily(spark, revs), max_lag=3).collect()
    hand = _lb_hand(revs, 3)
    assert len(out) == 3
    for r, (k, acf, q) in zip(out, hand):
        assert r.lag == k
        assert r.acf == acf
        assert r.q_lb == q
    crit = {1: 3.841459, 2: 5.991465, 3: 7.814728}
    for r in out:
        assert r.reject_white_noise == (r.q_lb > crit[r.lag])


def test_ljung_box_short_series_nulls_tail_lags(spark):
    revs = [10.0, 20.0, 15.0]  # n=3: lags >= 3 undefined
    out = {r.lag: r for r in ljung_box_revenue(_daily(spark, revs), max_lag=4).collect()}
    assert out[1].acf is not None and out[2].acf is not None
    assert out[3].acf is None and out[3].q_lb is None
    assert out[4].q_lb is None  # cumulative Q poisoned once a lag is invalid


def test_ljung_box_strong_autocorrelation_rejects(spark):
    # long alternating series: strong negative lag-1 ACF
    revs = [10.0 if i % 2 == 0 else 100.0 for i in range(24)]
    out = {r.lag: r for r in ljung_box_revenue(_daily(spark, revs), max_lag=2).collect()}
    assert out[1].acf < -0.5
    assert out[1].reject_white_noise is True
