"""Wave-120 operators: log-rank A/B survival test and max drawdown of
the daily revenue series."""

import hashlib
import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import revenue_drawdown
from linkgraph_spark.functions.ml import logrank_ab

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def _variant(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, 1.0, _T0 + timedelta(days=d)) for u, t, d in rows], _SCHEMA
    )


def _logrank_hand(subjects):
    """Classical log-rank from [(variant, event_bool, day)]."""
    days = sorted({d for _, e, d in subjects if e})
    o1 = e1q = vq = 0
    for t in days:
        at = [(v, e, d) for v, e, d in subjects if d >= t]
        n = len(at)
        if n <= 1:
            continue
        n1 = sum(1 for v, _, _ in at if v == 1)
        d_t = sum(1 for _, e, d in at if e and d == t)
        d1_t = sum(1 for v, e, d in at if e and d == t and v == 1)
        if d_t == 0:
            continue
        o1 += d1_t
        e1q += round(d_t * n1 / n * 1e6)
        vq += round(d_t * n1 * (n - n1) * (n - d_t) / (n * n * (n - 1)) * 1e6)
    chi2 = (o1 - e1q / 1e6) ** 2 / (vq / 1e6) if vq > 0 else None
    return o1, e1q, vq, chi2


def test_logrank_hand_computed(spark):
    # arm split by real md5; treatment converts fast, control slow/censored
    users = list(range(1, 41))
    rows = [(u, "signup", 0) for u in users]
    subjects = []
    for u in users:
        v = _variant(u)
        if v == 1:
            day = 1 + (u % 3)           # events on days 1..3
            rows.append((u, "purchase", day))
            subjects.append((1, True, day))
        elif u % 2 == 0:
            day = 5 + (u % 4)           # events on days 5..8
            rows.append((u, "purchase", day))
            subjects.append((0, True, day))
        else:
            subjects.append((0, False, 8))  # censored at stream end
    # stream end = max ts = day 8 (ensured by control purchases above)
    assert max(d for _, _, d in subjects) == 8
    out = logrank_ab(_ev(spark, rows)).collect()[0]
    o1, e1q, vq, chi2 = _logrank_hand(subjects)
    assert out.n_subjects == 40 and out.n1 == sum(map(_variant, users))
    assert out.o1 == o1
    assert out.e1 == round(e1q / 1e6, 6)
    assert out.chi2 == round(chi2, 6)
    assert out.significant == (round(chi2, 6) > 3.841459)
    assert out.o1 > out.e1  # treatment converts more than expected


def test_logrank_no_events_is_null(spark):
    rows = [(u, "signup", 0) for u in range(1, 11)]
    rows.append((99, "view", 5))  # sets the censor horizon, no purchases
    out = logrank_ab(_ev(spark, rows)).collect()
    # no event days -> aggregate over empty frame -> single all-NULL row
    assert len(out) == 1 and out[0].chi2 is None


def test_drawdown_hand_computed(spark):
    # daily revenue: 100, 250, 75, 220, 40 -> deepest fall 40 from peak 250
    vals = {0: 100.0, 1: 250.0, 2: 75.0, 3: 220.0, 4: 40.0}
    rows = []
    for d, v in vals.items():
        rows.append((1, "purchase", v, d))
    df = spark.createDataFrame(
        [(u, t, float(v), _T0 + timedelta(days=d)) for u, t, v, d in rows],
        _SCHEMA,
    )
    out = revenue_drawdown(df).collect()
    assert len(out) == 1
    r = out[0]
    day0 = (_T0 - datetime(1970, 1, 1)).days
    assert r.n_days == 5
    assert r.trough_day == day0 + 4
    assert r.peak_revenue == 250.0 and r.trough_revenue == 40.0
    assert r.max_drawdown == round((250.0 - 40.0) / 250.0, 6)


def test_drawdown_monotone_rise_is_zero_at_first_day(spark):
    df = spark.createDataFrame(
        [
            (1, "purchase", 10.0 * (d + 1), _T0 + timedelta(days=d))
            for d in range(4)
        ],
        _SCHEMA,
    )
    r = revenue_drawdown(df).collect()[0]
    # every day's drawdown is 0; earliest day breaks the tie
    assert r.max_drawdown == 0.0
    assert r.trough_day == (_T0 - datetime(1970, 1, 1)).days


def test_drawdown_empty_is_empty(spark):
    df = spark.createDataFrame([], _SCHEMA)
    assert revenue_drawdown(df).count() == 0
