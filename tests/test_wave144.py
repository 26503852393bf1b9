"""Wave-144 operator: Lilliefors-style exponentiality check on
inter-event gaps."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import exp_fit_gaps

_SCHEMA = "event_id long, user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def _ev(spark, gaps_by_user):
    rows, eid = [], 1
    for u, gaps in gaps_by_user.items():
        t = 0
        rows.append((eid, u, "view", 1.0, _T0))
        eid += 1
        for g in gaps:
            t += g
            rows.append((eid, u, "view", 1.0, _T0 + timedelta(seconds=t)))
            eid += 1
    return spark.createDataFrame(rows, _SCHEMA)


def _hand(gaps):
    import collections

    n, sg = len(gaps), sum(gaps)
    h = sorted(collections.Counter(gaps).items())
    hi = 0
    d = 0.0
    for x, c in h:
        hi += c
        fit = 1.0 - math.exp(-x * n / sg)
        d = max(d, abs(hi / n - fit), abs((hi - c) / n - fit))
    return n, sg / n, d


def test_exp_fit_hand_computed(spark):
    gaps = {1: [5, 12, 3, 30, 8], 2: [20, 2, 9], 3: [40]}
    out = exp_fit_gaps(_ev(spark, gaps)).collect()[0]
    flat = [g for v in gaps.values() for g in v]
    n, mu, d = _hand(flat)
    assert out.n_gaps == n
    assert out.mean_gap_s == round(mu, 6)
    assert out.d_stat == round(d, 6)
    assert out.reject_exponential == (
        round(d, 6) > 0.886 / math.sqrt(n)
    )


def test_exp_fit_constant_gaps_rejects(spark):
    # a metronome is maximally non-exponential
    gaps = {u: [10] * 8 for u in range(1, 5)}
    out = exp_fit_gaps(_ev(spark, gaps)).collect()[0]
    flat = [10] * 32
    n, _, d = _hand(flat)
    assert out.d_stat == round(d, 6)
    assert out.reject_exponential is True


def test_exp_fit_no_gaps_is_null(spark):
    rows = [(u, u, "view", 1.0, _T0) for u in range(1, 5)]
    df = spark.createDataFrame(
        [(i, u, t, v, ts) for i, (u, _, t, v, ts) in enumerate(
            [(r[0], None, r[2], r[3], r[4]) for r in rows], 1)],
        _SCHEMA,
    )
    out = exp_fit_gaps(df).collect()[0]
    assert out.n_gaps == 0 and out.d_stat is None
