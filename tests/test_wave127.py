"""Wave-127 operators: Cronbach's alpha and the tie-corrected Friedman
test over per-user event-type counts."""

import math
from datetime import datetime

from linkgraph_spark.functions.ml import (
    cronbach_alpha_types,
    friedman_event_types,
)

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _ev(spark, counts):
    """counts: {user: {type: n}}"""
    rows = []
    for u, d in counts.items():
        for t, n in d.items():
            rows += [(u, t, 1.0, _TS)] * n
    return spark.createDataFrame(rows, _SCHEMA)


def _alpha_hand(counts):
    users = sorted(counts)
    types = sorted({t for d in counts.values() for t in d})
    n, k = len(users), len(types)
    vsum = 0
    for t in types:
        xs = [counts[u].get(t, 0) for u in users]
        vsum += n * sum(v * v for v in xs) - sum(xs) ** 2
    ts = [sum(counts[u].values()) for u in users]
    vtot = n * sum(v * v for v in ts) - sum(ts) ** 2
    if k < 2 or vtot <= 0:
        return n, k, None
    return n, k, (k / (k - 1)) * (1 - vsum / vtot)


def _friedman_hand(counts):
    users = sorted(counts)
    types = sorted({t for d in counts.values() for t in d})
    n, k = len(users), len(types)
    r2 = {}
    a2p = 0
    for u in users:
        xs = sorted(counts[u].get(t, 0) for t in types)
        for t in types:
            x = counts[u].get(t, 0)
            lo = 1 + sum(1 for v in xs if v < x)
            hi = sum(1 for v in xs if v <= x)
            r2[(u, t)] = lo + hi
            a2p += (lo + hi) ** 2
    sd2 = sum(
        (sum(r2[(u, t)] for u in users) - n * (k + 1)) ** 2 for t in types
    )
    cp = n * k * (k + 1) ** 2
    if k < 2 or a2p <= cp:
        return n, k, None, None
    chi2 = (k - 1) * sd2 / (a2p - cp)
    return n, k, chi2, chi2 / (n * (k - 1))


def test_cronbach_hand_computed(spark):
    # consistent users: all three items scale together -> high alpha
    counts = {
        1: {"a": 1, "b": 2, "c": 1},
        2: {"a": 4, "b": 8, "c": 5},
        3: {"a": 2, "b": 4, "c": 2},
        4: {"a": 6, "b": 11, "c": 7},
    }
    out = cronbach_alpha_types(_ev(spark, counts)).collect()[0]
    n, k, alpha = _alpha_hand(counts)
    assert (out.n_users, out.k_items) == (n, k)
    assert out.alpha == round(alpha, 6)
    assert out.alpha > 0.9


def test_cronbach_single_item_is_null(spark):
    counts = {1: {"a": 3}, 2: {"a": 5}}
    out = cronbach_alpha_types(_ev(spark, counts)).collect()[0]
    assert out.k_items == 1 and out.alpha is None


def test_cronbach_zero_total_variance_is_null(spark):
    counts = {1: {"a": 2, "b": 1}, 2: {"a": 1, "b": 2}}  # totals tie at 3
    out = cronbach_alpha_types(_ev(spark, counts)).collect()[0]
    assert out.alpha is None


def test_friedman_hand_computed(spark):
    # users agree: b > a > c, with some ties (absent c counts as 0)
    counts = {
        1: {"a": 2, "b": 5, "c": 1},
        2: {"a": 3, "b": 7},
        3: {"a": 1, "b": 4, "c": 1},
        4: {"a": 4, "b": 9, "c": 2},
        5: {"a": 2, "b": 2, "c": 1},  # tie a == b
    }
    out = friedman_event_types(_ev(spark, counts)).collect()[0]
    n, k, chi2, w = _friedman_hand(counts)
    assert (out.n_users, out.k_types) == (n, k)
    assert out.chi2 == round(chi2, 6)
    assert out.w == round(w, 6)
    crit = 5.991465  # df = 2
    assert out.significant == (round(chi2, 6) > crit)
    assert out.w > 0.5  # strong concordance


def test_friedman_all_tied_is_null(spark):
    counts = {u: {"a": 2, "b": 2} for u in range(1, 5)}
    out = friedman_event_types(_ev(spark, counts)).collect()[0]
    assert out.chi2 is None and out.w is None and out.significant is None
