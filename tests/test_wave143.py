"""Wave-143 operator: Goodman-Kruskal gamma and Somers' D between
activity and spend tiers."""

from datetime import datetime

from linkgraph_spark.functions.events import gk_gamma_tiers

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _ev(spark, users):
    """users: {uid: (n_events, total_dollars)} — spread value evenly."""
    rows = []
    for u, (n, total) in users.items():
        per = total / n
        rows += [(u, "view", per, _TS)] * n
    return spark.createDataFrame(rows, _SCHEMA)


def _hand(users):
    def at(n):
        return 0 if n <= 1 else 1 if n <= 4 else 2 if n <= 9 else 3

    def st(cents):
        if cents <= 0:
            return 0
        if cents < 130000:
            return 1
        if cents < 165000:
            return 2
        if cents < 200000:
            return 3
        return 4

    pts = []
    for n, total in users.values():
        cents = sum([round(total / n * 100)] * n)
        pts.append((at(n), st(cents)))
    cc = dd = ty = 0
    for i, (x1, y1) in enumerate(pts):
        for x2, y2 in pts:
            if x1 < x2 and y1 < y2:
                cc += 1
            elif x1 < x2 and y1 > y2:
                dd += 1
            elif x1 < x2 and y1 == y2:
                ty += 1
    gamma = (cc - dd) / (cc + dd) if cc + dd else None
    somers = (cc - dd) / (cc + dd + ty) if cc + dd + ty else None
    return cc, dd, gamma, somers


def test_gk_gamma_hand_computed(spark):
    # activity and spend mostly rise together, one inversion, some ties
    users = {
        1: (1, 500.0),       # tier (0, 1)
        2: (3, 1400.0),      # (1, 2)
        3: (3, 1400.0),      # (1, 2) tie
        4: (6, 1800.0),      # (2, 3)
        5: (12, 2500.0),     # (3, 4)
        6: (12, 900.0),      # (3, 1) inversion
        7: (6, 1400.0),      # (2, 2) spend-tie vs 2,3
    }
    out = gk_gamma_tiers(_ev(spark, users)).collect()[0]
    cc, dd, gamma, somers = _hand(users)
    assert out.n_users == 7
    assert (out.concordant, out.discordant) == (cc, dd)
    assert out.gamma == round(gamma, 6)
    assert out.somers_d == round(somers, 6)
    assert out.gamma > 0
    assert abs(out.somers_d) <= abs(out.gamma)  # ties only shrink D


def test_gk_gamma_perfect_order(spark):
    users = {1: (1, 500.0), 2: (3, 1400.0), 3: (6, 1800.0), 4: (12, 2500.0)}
    out = gk_gamma_tiers(_ev(spark, users)).collect()[0]
    assert out.gamma == 1.0 and out.discordant == 0


def test_gk_gamma_single_tier_is_null(spark):
    users = {u: (3, 1400.0) for u in range(1, 6)}
    out = gk_gamma_tiers(_ev(spark, users)).collect()[0]
    assert out.gamma is None and out.somers_d is None
