"""Wave-118 operators: Mann-Whitney U over the md5 A/B arms and
McNemar's paired test on per-user click/purchase flags."""

import hashlib
import math
from datetime import datetime

from linkgraph_spark.functions.ml import ab_mannwhitney, mcnemar_click_purchase

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _variant(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, float(v), _TS) for u, t, v in rows], _SCHEMA
    )


def _mwu_hand(spend_by_user):
    """Classical tie-corrected Mann-Whitney from a {uid: cents} map."""
    import collections

    pooled = sorted(spend_by_user.values())
    # mid-rank per value
    pos = {}
    i = 0
    counts = collections.Counter(pooled)
    for v in sorted(counts):
        c = counts[v]
        pos[v] = (2 * (i + c) - c + 1) / 2  # (lo + hi) / 2
        i += c
    n1 = sum(1 for u in spend_by_user if _variant(u) == 1)
    n0 = len(spend_by_user) - n1
    r1 = sum(pos[v] for u, v in spend_by_user.items() if _variant(u) == 1)
    u1 = r1 - n1 * (n1 + 1) / 2
    nn = n0 + n1
    t3 = sum(c**3 - c for c in counts.values())
    var = (n0 * n1 / 12.0) * ((nn + 1.0) - t3 / (nn * (nn - 1.0)))
    z = (2.0 * u1 - n1 * n0) / (2.0 * math.sqrt(var)) if var > 0 else None
    return n0, n1, u1, z


def test_mannwhitney_hand_computed(spark):
    # arm 1 users spend strictly more, with deliberate cross-arm ties
    users = list(range(1, 61))
    spend = {}
    for u in users:
        base = 100 if _variant(u) == 1 else 50
        spend[u] = base + (u % 3) * 25  # ties inside and across arms
    rows = [(u, "purchase", v / 100.0) for u, v in spend.items()]
    out = ab_mannwhitney(_ev(spark, rows)).collect()[0]
    n0, n1, u1, z = _mwu_hand(spend)
    assert (out.n0, out.n1) == (n0, n1)
    assert out.u1 == round(u1, 1)
    assert out.z == round(z, 6)
    assert out.significant == (abs(round(z, 6)) > 1.959964)
    assert out.z > 0  # treatment ranked higher


def test_mannwhitney_all_tied_is_null(spark):
    rows = [(u, "view", 2.0) for u in range(1, 31)]
    out = ab_mannwhitney(_ev(spark, rows)).collect()[0]
    assert out.n0 + out.n1 == 30
    assert out.z is None and out.significant is None
    # U is still defined: every comparison is a half-tie
    assert out.u1 == round(out.n0 * out.n1 / 2.0, 1)


def test_mannwhitney_empty_arm_is_null(spark):
    users = [u for u in range(1, 41) if _variant(u) == 0][:5]
    rows = [(u, "view", float(u), ) for u in users]
    out = ab_mannwhitney(_ev(spark, rows)).collect()[0]
    assert out.n1 == 0 and out.z is None


def _evd(spark, rows):
    from datetime import datetime as _dt

    return spark.createDataFrame(
        [(u, t, 1.0, _dt(2024, 1, d)) for u, t, d in rows], _SCHEMA
    )


def test_mcnemar_hand_computed(spark):
    # pairs are (user, day): user 1 contributes 3 pairs with different cells
    rows = [
        (1, "click", 1), (1, "purchase", 1),   # both on Jan 1
        (1, "click", 2), (1, "click", 2),      # only click on Jan 2 (repeat)
        (1, "purchase", 3),                    # only purchase on Jan 3
        (2, "click", 1),                       # only click
        (3, "click", 1),                       # only click
        (4, "view", 1),                        # neither
        (5, "purchase", 2),                    # only purchase
    ]
    out = mcnemar_click_purchase(_evd(spark, rows)).collect()[0]
    assert (out.n_pairs, out.n_both, out.only_a, out.only_b) == (7, 1, 3, 2)
    chi2 = (3 - 2) ** 2 / (3 + 2)
    assert out.chi2 == round(chi2, 6)
    assert out.significant == (round(chi2, 6) > 3.841459)
    assert out.significant is False


def test_mcnemar_significant_flag_tracks_rounded_chi2(spark):
    # 16 only-click days vs 0 only-purchase days -> chi2 = 16 > 3.841459
    rows = [(u, "click", 1) for u in range(1, 17)]
    out = mcnemar_click_purchase(_evd(spark, rows)).collect()[0]
    assert (out.only_a, out.only_b) == (16, 0)
    assert out.chi2 == 16.0 and out.significant is True


def test_mcnemar_no_discordant_is_null(spark):
    rows = []
    for u in range(1, 6):
        rows += [(u, "click", 1), (u, "purchase", 1)]
    out = mcnemar_click_purchase(_evd(spark, rows)).collect()[0]
    assert out.only_a == 0 and out.only_b == 0
    assert out.chi2 is None and out.significant is None
