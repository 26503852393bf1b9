"""Wave-116 operator: per-metric odds ratios with Woolf log-OR 95% CIs
under the md5 A/B split."""

import hashlib
import math
from datetime import datetime

from linkgraph_spark.functions.ml import ab_odds_ratio

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _variant(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def _ev(spark, rows):
    return spark.createDataFrame([(u, t, 1.0, _TS) for u, t in rows], _SCHEMA)


def test_odds_ratio_hand_computed(spark):
    users = list(range(1, 201))
    treat = [u for u in users if _variant(u) == 1]
    ctrl = [u for u in users if _variant(u) == 0]
    rows = [(u, "view") for u in users]
    k0, k1 = len(ctrl) // 4, len(treat) // 2
    rows += [(u, "click") for u in ctrl[:k0] + treat[:k1]]
    out = {r.metric: r for r in ab_odds_ratio(_ev(spark, rows)).collect()}
    c = out["click"]
    n0, n1 = len(ctrl), len(treat)
    lor = math.log((k1 * (n0 - k0)) / (k0 * (n1 - k1)))
    se = math.sqrt(1 / k1 + 1 / (n1 - k1) + 1 / k0 + 1 / (n0 - k0))
    assert c.odds_ratio == round(math.exp(lor), 6)
    assert c.or_lo == round(math.exp(lor - 1.96 * se), 6)
    assert c.or_hi == round(math.exp(lor + 1.96 * se), 6)
    assert c.or_lo < c.odds_ratio < c.or_hi
    assert c.odds_ratio > 1  # treatment lifted


def test_odds_ratio_zero_cell_is_null(spark):
    users = list(range(1, 41))
    treat = [u for u in users if _variant(u) == 1]
    rows = [(u, "view") for u in users]
    rows += [(u, "click") for u in treat]  # control cell x0 = 0
    out = {r.metric: r for r in ab_odds_ratio(_ev(spark, rows)).collect()}
    c = out["click"]
    assert c.x0 == 0
    assert c.odds_ratio is None and c.or_lo is None and c.or_hi is None
    # universal metric: x == n on both arms -> also undefined
    v = out["view"]
    assert v.odds_ratio is None
