"""Wave-135 operators: value-tier migration matrix and day-of-week
ANOVA of daily revenue."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import dow_anova, tier_migration

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def test_tier_migration_hand_computed(spark):
    # cutoff splits day 0..3 vs 4..7 (median instant); craft halves:
    # u1: pre 1200.00 (bronze), post 1700.00 (gold)
    # u2: pre 1400.00 (silver), post 1400.00 (silver)
    # u3: pre 2100.00 (platinum), post 0 (none)
    # u4: pre 0 (none), post 2500.00 (platinum)
    rows = [
        (1, "purchase", 1200.0, _T0),
        (1, "purchase", 1700.0, _T0 + timedelta(days=7)),
        (2, "purchase", 1400.0, _T0 + timedelta(days=1)),
        (2, "purchase", 1400.0, _T0 + timedelta(days=6)),
        (3, "purchase", 2100.0, _T0 + timedelta(days=2)),
        (3, "view", 0.0, _T0 + timedelta(days=5)),
        (4, "view", 0.0, _T0 + timedelta(days=3)),
        (4, "purchase", 2500.0, _T0 + timedelta(days=4)),
    ]
    out = {
        (r.tier_from, r.tier_to): r
        for r in tier_migration(
            spark.createDataFrame(rows, _SCHEMA)
        ).collect()
    }
    assert out[("bronze", "gold")].n_users == 1
    assert out[("silver", "silver")].n_users == 1
    assert out[("platinum", "none")].n_users == 1
    assert out[("none", "platinum")].n_users == 1
    assert all(r.share_of_from == 1.0 for r in out.values())
    assert len(out) == 4  # zero cells omitted


def test_tier_migration_row_shares_sum_to_one(spark):
    rows = []
    # 3 bronze-pre users splitting to bronze/silver/gold posts
    for u, post in [(1, 500.0), (2, 1400.0), (3, 1800.0)]:
        rows.append((u, "purchase", 500.0, _T0))
        rows.append((u, "purchase", post, _T0 + timedelta(days=9)))
    out = tier_migration(spark.createDataFrame(rows, _SCHEMA)).collect()
    froms = {}
    for r in out:
        froms.setdefault(r.tier_from, 0.0)
        froms[r.tier_from] += r.share_of_from
    assert all(abs(v - 1.0) < 1e-5 for v in froms.values())


def _anova_hand(groups):
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    a = sum(sum(v) for v in groups.values())
    b = sum(x * x for v in groups.values() for x in v)
    gq = sum(round(1e6 * sum(v) ** 2 / len(v)) for v in groups.values())
    ssb = gq / 1e6 - a * a / n
    ssw = b - gq / 1e6
    sst = b - a * a / n
    if k < 2 or n <= k or ssw <= 0:
        return None, None
    return (ssb / (k - 1)) / (ssw / (n - k)), max(0.0, ssb / sst)


def test_dow_anova_hand_computed(spark):
    # 21 days: weekends (epoch-day mod 7 patterns) get higher revenue
    rows = []
    groups = {}
    day0 = (_T0 - datetime(1970, 1, 1)).days
    for d in range(21):
        dow = (day0 + d) % 7
        rev = 100.0 + dow * 40.0 + (d % 3)  # strong dow effect + noise
        rows.append((1, "purchase", rev, _T0 + timedelta(days=d)))
        groups.setdefault(dow, []).append(round(rev * 10000))
    out = dow_anova(spark.createDataFrame(rows, _SCHEMA)).collect()[0]
    f, eta = _anova_hand(groups)
    assert out.n_days == 21
    assert out.f_stat == round(f, 6)
    assert out.eta_squared == round(eta, 6)
    assert out.eta_squared > 0.9


def test_dow_anova_single_week_is_null(spark):
    rows = [
        (1, "purchase", 100.0 + d, _T0 + timedelta(days=d))
        for d in range(7)
    ]
    out = dow_anova(spark.createDataFrame(rows, _SCHEMA)).collect()[0]
    # 7 days, 7 groups of one day each: n == k -> undefined
    assert out.f_stat is None and out.eta_squared is None
