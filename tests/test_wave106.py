"""Wave-106 operators: A/B power analysis — per-metric minimum
detectable effect at the current md5 arms, and required sample size per
arm for a target relative lift (classical two-proportion formula,
z-quantiles as exact literals)."""

import hashlib
import math
from datetime import datetime

from linkgraph_spark.functions.ml import ab_power_mde, ab_required_n

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)
_ZSUM = 2.801585


def _ev(spark, rows):
    return spark.createDataFrame([(u, t, 1.0, _TS) for u, t in rows], _SCHEMA)


def _variant(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def test_mde_hand_computed(spark):
    users = list(range(1, 41))
    rows = [(u, "view") for u in users]
    rows += [(u, "click") for u in users[:10]]
    out = {r.metric: r for r in ab_power_mde(_ev(spark, rows)).collect()}
    n0 = sum(1 for u in users if _variant(u) == 0)
    n1 = 40 - n0
    c = out["click"]
    assert c.n_per_arm == min(n0, n1)
    assert c.base_rate == 0.25
    expect = _ZSUM * math.sqrt(2 * 0.25 * 0.75 / min(n0, n1))
    assert c.mde_abs == round(expect, 6)
    assert c.mde_rel == round(expect / 0.25, 6)
    # universal metric: pooled rate 1 -> NULL, not infinity
    v = out["view"]
    assert v.base_rate == 1.0 and v.mde_abs is None and v.mde_rel is None


def test_required_n_hand_computed_and_ready_flag(spark):
    users = list(range(1, 41))
    rows = [(u, "view") for u in users] + [(u, "click") for u in users[:10]]
    out = {r.metric: r for r in
           ab_required_n(_ev(spark, rows), rel_lift=0.1).collect()}
    c = out["click"]
    p = 0.25
    need = math.ceil(2 * p * (1 - p) * _ZSUM**2 / (0.1 * p) ** 2)
    assert c.n_required_per_arm == need
    assert need > 4000  # a 10% lift on a 25% rate needs thousands per arm
    assert c.ready is False  # 40 users cannot clear it
    assert out["view"].n_required_per_arm is None
    assert out["view"].ready is None


def test_required_n_ready_when_lift_is_huge(spark):
    users = list(range(1, 41))
    rows = [(u, "view") for u in users] + [(u, "click") for u in users[:20]]
    out = {r.metric: r for r in
           ab_required_n(_ev(spark, rows), rel_lift=5.0).collect()}
    c = out["click"]
    assert c.n_required_per_arm <= 20
    assert c.ready is True
