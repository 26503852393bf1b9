"""Wave-119 operators: Kendall tau-b over the daily (orders, revenue)
series and the Theil T inequality index of per-customer spend."""

import math
from datetime import datetime
from itertools import combinations

from linkgraph_spark.functions.relational import kendall_daily, theil_spend

_SCHEMA = "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"


def _orders(spark, rows):
    return spark.createDataFrame(
        [
            (i, int(c), float(p), datetime(2024, 1, int(d)))
            for i, (c, p, d) in enumerate(rows, 1)
        ],
        _SCHEMA,
    )


def _kendall_hand(series):
    """Tie-corrected tau-b from a [(x, y)] day series."""
    conc = disc = 0
    for (x1, y1), (x2, y2) in combinations(series, 2):
        s = (x1 > x2) - (x1 < x2)
        t = (y1 > y2) - (y1 < y2)
        if s * t > 0:
            conc += 1
        elif s * t < 0:
            disc += 1
    n = len(series)
    n0 = n * (n - 1) // 2

    def _ties(idx):
        from collections import Counter

        return sum(
            c * (c - 1) // 2 for c in Counter(v[idx] for v in series).values()
        )

    tx, ty = _ties(0), _ties(1)
    if n0 <= tx or n0 <= ty:
        return conc, disc, None
    return conc, disc, (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))


def test_kendall_hand_computed(spark):
    # day -> (orders, revenue): mostly concordant, one discordant, ties
    # day 1: 2 orders 30.00 | day 2: 2 orders 50.00 (x-tie) |
    # day 3: 3 orders 40.00 (y discordant vs day 2) | day 4: 4 orders 90.00
    rows = [
        (1, 10.0, 1), (2, 20.0, 1),
        (3, 25.0, 2), (4, 25.0, 2),
        (5, 10.0, 3), (6, 10.0, 3), (7, 20.0, 3),
        (8, 30.0, 4), (9, 30.0, 4), (10, 15.0, 4), (11, 15.0, 4),
    ]
    out = kendall_daily(_orders(spark, rows)).collect()[0]
    series = [(2, 3000), (2, 5000), (3, 4000), (4, 9000)]
    conc, disc, tau = _kendall_hand(series)
    assert out.n_days == 4
    assert (out.concordant, out.discordant) == (conc, disc)
    assert out.tau_b == round(tau, 6)
    assert out.tau_b > 0


def test_kendall_all_x_tied_is_null(spark):
    rows = [(1, 10.0, 1), (2, 20.0, 2), (3, 30.0, 3)]  # 1 order per day
    out = kendall_daily(_orders(spark, rows)).collect()[0]
    assert out.n_days == 3
    assert out.tau_b is None  # x fully tied -> n0 == tx


def test_kendall_perfect_negative(spark):
    # more orders <-> less revenue, strictly
    rows = [
        (1, 100.0, 1),
        (2, 40.0, 2), (3, 40.0, 2),
        (4, 20.0, 3), (5, 20.0, 3), (6, 20.0, 3),
    ]
    out = kendall_daily(_orders(spark, rows)).collect()[0]
    assert out.tau_b == -1.0


def test_theil_hand_computed(spark):
    # customers 1..4 spend 10.00, 10.00, 20.00, 60.00 (cents: 1000 x2, 2000, 6000)
    rows = [
        (1, 4.0, 1), (1, 6.0, 2),
        (2, 10.0, 1),
        (3, 20.0, 3),
        (4, 60.0, 4),
    ]
    out = theil_spend(_orders(spark, rows)).collect()[0]
    xs = [1000, 1000, 2000, 6000]
    n, s1 = len(xs), sum(xs)
    mu = s1 / n
    # the engine quantizes each x*ln(x) term to 1e-6 before summing
    sq = sum(round(x * math.log(x) * 1e6) for x in xs)
    theil = max(0.0, sq / 1e6 / s1 - math.log(mu))
    hand = sum((x / mu) * math.log(x / mu) for x in xs) / n
    assert out.n_customers == n and out.mean_cents == mu
    assert out.theil == round(theil, 6)
    assert abs(out.theil - hand) < 1e-5  # quantization stays microscopic
    assert out.theil_norm == round(theil / math.log(n), 6)


def test_theil_uniform_is_zero(spark):
    rows = [(c, 25.0, 1) for c in range(1, 9)]
    out = theil_spend(_orders(spark, rows)).collect()[0]
    assert out.n_customers == 8
    assert out.theil == 0.0 and out.theil_norm == 0.0


def test_theil_single_customer_norm_null(spark):
    out = theil_spend(_orders(spark, [(1, 10.0, 1)])).collect()[0]
    assert out.n_customers == 1
    assert out.theil == 0.0 and out.theil_norm is None
