"""Wave-115 operators: Cramér's V (type x value-tier association) and
Cohen's h effect sizes under the md5 A/B split."""

import hashlib
import math
from datetime import datetime

from linkgraph_spark.functions.events import cramers_v_type_tier
from linkgraph_spark.functions.ml import ab_cohens_h

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_cramers_v_perfect_association(spark):
    # type A always tier 0, type B always tier 1 -> V = 1
    rows = [(1, "A", 1.0, _TS)] * 5 + [(1, "B", 15.0, _TS)] * 5
    r = cramers_v_type_tier(_ev(spark, rows)).collect()[0]
    assert (r.n, r.n_rows_types, r.n_cols_tiers) == (10, 2, 2)
    assert r.cramers_v == 1.0
    assert r.chi2 == 10.0  # chi2 == n at perfect association (2x2)


def test_cramers_v_independent_is_zero(spark):
    rows = []
    for t in ("A", "B"):
        rows += [(1, t, 1.0, _TS)] * 3 + [(1, t, 15.0, _TS)] * 3
    r = cramers_v_type_tier(_ev(spark, rows)).collect()[0]
    assert r.chi2 == 0.0 and r.cramers_v == 0.0


def test_cramers_v_degenerate_single_column(spark):
    rows = [(1, "A", 1.0, _TS), (1, "B", 2.0, _TS)]  # one tier only
    r = cramers_v_type_tier(_ev(spark, rows)).collect()[0]
    assert r.n_cols_tiers == 1 and r.cramers_v is None


def _variant(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def test_cohens_h_hand_computed(spark):
    users = list(range(1, 41))
    treat = [u for u in users if _variant(u) == 1]
    ctrl = [u for u in users if _variant(u) == 0]
    rows = [(u, "view", 1.0, _TS) for u in users]
    rows += [(u, "click", 1.0, _TS) for u in treat]  # perfect lift
    out = {r.metric: r for r in ab_cohens_h(_ev(spark, rows)).collect()}
    c = out["click"]
    assert c.p_control == 0.0 and c.p_treatment == 1.0
    # h = 2 asin(1) - 2 asin(0) = pi
    assert c.h == round(math.pi, 6)
    assert c.magnitude == "large"
    v = out["view"]
    assert v.h == 0.0 and v.magnitude == "negligible"


def test_cohens_h_magnitude_thresholds(spark):
    # craft p0, p1 with |h| just under 0.2: p0=0.25, p1 such that h≈0.19
    users = list(range(1, 201))
    treat = [u for u in users if _variant(u) == 1]
    ctrl = [u for u in users if _variant(u) == 0]
    rows = [(u, "view", 1.0, _TS) for u in users]
    k0 = len(ctrl) // 4
    k1 = len(treat) // 3
    rows += [(u, "click", 1.0, _TS) for u in ctrl[:k0] + treat[:k1]]
    out = {r.metric: r for r in ab_cohens_h(_ev(spark, rows)).collect()}
    c = out["click"]
    p0, p1 = k0 / len(ctrl), k1 / len(treat)
    h = round(2 * math.asin(math.sqrt(p1)) - 2 * math.asin(math.sqrt(p0)), 6)
    assert c.h == h
    expect = (
        "negligible" if abs(h) < 0.2 else
        "small" if abs(h) < 0.5 else
        "medium" if abs(h) < 0.8 else "large"
    )
    assert c.magnitude == expect
