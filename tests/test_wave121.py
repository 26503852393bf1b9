"""Wave-121 operators: Cochran-Armitage trend test on activity tiers vs
daily purchase, and the index-of-dispersion (Poisson) test on daily
event counts."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import dispersion_daily
from linkgraph_spark.functions.ml import cochran_armitage_trend

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, 1.0, _T0 + timedelta(days=d)) for u, t, d in rows], _SCHEMA
    )


def _ca_hand(units):
    """Classical CA z from [(score, purchased)]."""
    import collections

    by = collections.defaultdict(lambda: [0, 0])
    for s, y in units:
        by[s][0] += 1
        by[s][1] += y
    nn = sum(v[0] for v in by.values())
    rr = sum(v[1] for v in by.values())
    ssn = sum(s * v[0] for s, v in by.items())
    ssr = sum(s * v[1] for s, v in by.items())
    sns2 = sum(s * s * v[0] for s, v in by.items())
    tn = nn * ssr - rr * ssn
    mm = nn * sns2 - ssn * ssn
    if rr == 0 or rr == nn or mm <= 0:
        return nn, rr, None
    return nn, rr, tn * math.sqrt(nn) / math.sqrt(rr * (nn - rr) * mm)


def test_cochran_armitage_hand_computed(spark):
    rows, units = [], []
    uid = 1
    # tier 1 (1 other event): 10 units, 2 purchase
    for i in range(10):
        rows.append((uid, "view", 0))
        y = 1 if i < 2 else 0
        if y:
            rows.append((uid, "purchase", 0))
        units.append((1, y))
        uid += 1
    # tier 2 (3 other events): 10 units, 5 purchase
    for i in range(10):
        rows += [(uid, "view", 0), (uid, "click", 0), (uid, "view", 0)]
        y = 1 if i < 5 else 0
        if y:
            rows.append((uid, "purchase", 0))
        units.append((2, y))
        uid += 1
    # tier 3 (5 other events): 10 units, 9 purchase
    for i in range(10):
        rows += [(uid, "view", 0)] * 5
        y = 1 if i < 9 else 0
        if y:
            rows.append((uid, "purchase", 0))
        units.append((3, y))
        uid += 1
    # tier 0 (purchase-only day): 2 units, both purchase
    for _ in range(2):
        rows.append((uid, "purchase", 0))
        units.append((0, 1))
        uid += 1
    out = cochran_armitage_trend(_ev(spark, rows)).collect()[0]
    nn, rr, z = _ca_hand(units)
    assert (out.n_units, out.n_purchase) == (nn, rr)
    assert out.z == round(z, 6)
    assert out.significant == (abs(round(z, 6)) > 1.959964)
    assert out.z > 0  # rising trend


def test_cochran_armitage_saturated_is_null(spark):
    rows = []
    for u in range(1, 11):
        rows += [(u, "view", 0), (u, "purchase", 0)]
    out = cochran_armitage_trend(_ev(spark, rows)).collect()[0]
    assert out.n_purchase == out.n_units == 10
    assert out.z is None and out.significant is None


def test_cochran_armitage_single_tier_is_null(spark):
    rows = []
    for u in range(1, 11):
        rows.append((u, "view", 0))
        if u <= 5:
            rows.append((u, "purchase", 0))
    out = cochran_armitage_trend(_ev(spark, rows)).collect()[0]
    assert out.z is None  # zero tier spread (all units tier 1)


def test_dispersion_hand_computed(spark):
    # daily counts: 2, 6, 1, 11 -> clearly overdispersed vs Poisson
    counts = {0: 2, 1: 6, 2: 1, 3: 11}
    rows = []
    for d, c in counts.items():
        rows += [(u, "view", d) for u in range(1, c + 1)]
    out = dispersion_daily(_ev(spark, rows)).collect()[0]
    xs = list(counts.values())
    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    chi2 = (n * sxx - sx * sx) / sx
    z = math.sqrt(2 * chi2) - math.sqrt(2 * (n - 1) - 1)
    assert out.n_days == n and out.mean_per_day == sx / n
    assert out.chi2 == round(chi2, 6)
    assert out.vmr == round(chi2 / (n - 1), 6)
    assert out.z == round(z, 6)
    assert out.overdispersed == (round(z, 6) > 1.644854)
    assert out.overdispersed is True


def test_dispersion_constant_series_underdisperses(spark):
    rows = []
    for d in range(5):
        rows += [(u, "view", d) for u in range(1, 4)]  # 3 per day
    out = dispersion_daily(_ev(spark, rows)).collect()[0]
    assert out.chi2 == 0.0 and out.vmr == 0.0
    assert out.overdispersed is False


def test_dispersion_single_day_is_null(spark):
    out = dispersion_daily(_ev(spark, [(1, "view", 0)])).collect()[0]
    assert out.n_days == 1 and out.chi2 is None and out.vmr is None
