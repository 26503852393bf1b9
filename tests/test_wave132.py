"""Wave-132 operators: difference-in-differences A/B estimator and the
price-consistency audit."""

import hashlib
import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.ml import ab_diff_in_diff
from linkgraph_spark.functions.relational import price_consistency_audit

_EV = "user_id long, event_type string, value double, ts timestamp"
_LI = "l_orderkey long, l_partkey long, l_extendedprice double, l_quantity double"
_T0 = datetime(2024, 1, 1)


def _variant(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def test_did_hand_computed(spark):
    # users have a pre event (day 0-4) and a post event (day 6-10);
    # treatment users lift by +20.00 post, control flat
    rows, d_by_user = [], {}
    for u in range(1, 41):
        pre = 1000 + (u % 5) * 100       # cents
        lift = 2000 if _variant(u) == 1 else 0
        post = pre + lift + (u % 3) * 50
        rows.append((u, "purchase", pre / 100.0, _T0 + timedelta(days=u % 5)))
        rows.append(
            (u, "purchase", post / 100.0, _T0 + timedelta(days=6 + u % 5))
        )
        d_by_user[u] = post - pre
    df = spark.createDataFrame(rows, _EV)
    out = ab_diff_in_diff(df).collect()[0]
    g = {0: [], 1: []}
    for u, d in d_by_user.items():
        g[_variant(u)].append(d)
    n0, n1 = len(g[0]), len(g[1])
    m0, m1 = sum(g[0]) / n0, sum(g[1]) / n1
    did = (m1 - m0) / 100.0
    v0 = (n0 * sum(x * x for x in g[0]) - sum(g[0]) ** 2) / (n0 * (n0 - 1))
    v1 = (n1 * sum(x * x for x in g[1]) - sum(g[1]) ** 2) / (n1 * (n1 - 1))
    t = (m1 - m0) / math.sqrt(v1 / n1 + v0 / n0)
    assert (out.n0, out.n1) == (n0, n1)
    assert out.did == round(did, 6)
    assert out.t == round(t, 6)
    assert out.significant == (abs(round(t, 6)) > 1.959964)
    assert out.did > 15  # the +20.00 lift shows net of noise
    # hand-check the cutoff: median of all event micros separates the eras
    all_us = sorted(
        int((_T0 + timedelta(days=d)).timestamp() * 1e6)
        for d in [u % 5 for u in range(1, 41)]
        + [6 + u % 5 for u in range(1, 41)]
    )
    med = math.floor((all_us[39] + all_us[40]) / 2)
    assert out.cutoff_us == med


def test_did_no_effect_small_t(spark):
    rows = []
    for u in range(1, 61):
        rows.append((u, "purchase", 10.0 + u % 4, _T0))
        # identical shift in both arms plus arm-independent noise
        rows.append(
            (u, "purchase", 12.0 + (u % 7) * 0.5, _T0 + timedelta(days=9))
        )
    out = ab_diff_in_diff(spark.createDataFrame(rows, _EV)).collect()[0]
    assert abs(out.did) < 1.0
    assert out.significant is False


def test_did_constant_diff_is_null(spark):
    rows = []
    for u in range(1, 31):
        rows.append((u, "purchase", 10.0, _T0))
        rows.append((u, "purchase", 12.0, _T0 + timedelta(days=9)))
    out = ab_diff_in_diff(spark.createDataFrame(rows, _EV)).collect()[0]
    # d == 200 cents for every user: zero spread, the t is undefined
    assert out.did == 0.0 and out.t is None and out.significant is None


def test_price_consistency_hand(spark):
    rows = [
        (1, 1, 100.0, 2.0),   # unit 50.00
        (2, 1, 150.0, 3.0),   # unit 50.00 -> consistent
        (3, 2, 100.0, 2.0),   # unit 50.00
        (4, 2, 120.0, 2.0),   # unit 60.00 -> inconsistent, spread 10.00
        (5, 3, 30.0, 1.0),    # single line
        (6, 4, 10.0, 0.0),    # zero qty: excluded entirely
    ]
    out = price_consistency_audit(
        spark.createDataFrame(rows, _LI)
    ).collect()[0]
    assert out.n_parts == 3
    assert out.n_inconsistent == 1
    assert out.share == round(1 / 3, 6)
    assert out.max_spread == 10.0


def test_price_consistency_clean(spark):
    rows = [(i, i, 10.0 * i, 1.0) for i in range(1, 6)]
    out = price_consistency_audit(
        spark.createDataFrame(rows, _LI)
    ).collect()[0]
    assert out.n_inconsistent == 0 and out.share == 0.0
    assert out.max_spread == 0.0
