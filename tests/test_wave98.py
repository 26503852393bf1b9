"""Wave-98 operators: unbiased pass@k (Chen et al. 2021) as a relational
aggregate, and Wilson score intervals (Wilson 1927) for per-metric
conversion rates."""

import math
from datetime import datetime

import pytest

from linkgraph_spark.functions.ml import conversion_wilson_ci, pass_at_k

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, 1.0, _TS) for (u, t) in rows], _SCHEMA
    )


def _user(uid, n, c):
    return [(uid, "purchase")] * c + [(uid, "click")] * (n - c)


def test_pass_at_1_hand_computed(spark):
    # u1: n=3,c=1 -> fail 2/3; u2: n=2,c=0 -> fail 1
    rows = _user(1, 3, 1) + _user(2, 2, 0)
    out = {r.k: r for r in pass_at_k(_ev(spark, rows), ks=(1, 5)).collect()}
    r1 = out[1]
    assert r1.n_users == 2
    # nano-exact: (2e9 - (round(1e9*2/3) + 1e9)) / 2e9
    expect = (2e9 - (666666667 + 1000000000)) / 2e9
    assert r1.pass_at_k == round(expect, 6)
    # nobody has 5 attempts -> no k=5 row rather than a fake zero
    assert 5 not in out


def test_pass_at_k_boundary_cases(spark):
    # all-success user: C(0,k) = 0 -> pass 1; all-fail user -> pass 0
    rows = _user(1, 4, 4)
    assert pass_at_k(_ev(spark, rows), ks=(2,)).collect()[0].pass_at_k == 1.0
    rows = _user(2, 4, 0)
    assert pass_at_k(_ev(spark, rows), ks=(2,)).collect()[0].pass_at_k == 0.0
    # n-c < k (more draws than failures available) -> fail impossible
    rows = _user(3, 5, 4)
    assert pass_at_k(_ev(spark, rows), ks=(2,)).collect()[0].pass_at_k == 1.0


def test_pass_at_k_matches_closed_form(spark):
    # n=10, c=3: pass@5 = 1 - C(7,5)/C(10,5) = 1 - 21/252
    rows = _user(1, 10, 3)
    r = pass_at_k(_ev(spark, rows), ks=(5,)).collect()[0]
    assert abs(r.pass_at_k - (1 - 21 / 252)) < 2e-6


def test_pass_at_k_rejects_large_k(spark):
    with pytest.raises(ValueError):
        pass_at_k(_ev(spark, _user(1, 3, 1)), ks=(11,))


def _wilson(x, n, z=1.96):
    p = x / n
    denom = 1.0 + z * z / n
    center = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    return round((center - half) / denom, 6), round((center + half) / denom, 6)


def test_wilson_ci_hand_computed(spark):
    # 4 users; 1 converts to purchase, all 4 click
    rows = _user(1, 2, 1) + _user(2, 1, 0) + _user(3, 1, 0) + _user(4, 1, 0)
    out = {r.metric: r for r in conversion_wilson_ci(_ev(spark, rows)).collect()}
    p = out["purchase"]
    assert (p.x, p.n, p.rate) == (1, 4, 0.25)
    lo, hi = _wilson(1, 4)
    assert (p.wilson_lo, p.wilson_hi) == (lo, hi)
    assert p.wilson_lo < p.rate < p.wilson_hi
    c = out["click"]
    # universal metric: p=1 -> the score interval's upper bound IS 1.0
    assert (c.x, c.n, c.rate, c.wilson_hi) == (4, 4, 1.0, 1.0)
    assert 0.0 < c.wilson_lo < 1.0
