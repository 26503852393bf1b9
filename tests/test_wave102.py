"""Wave-102 operators: exact two-sample KS test (value-grain ECDF gap,
Stephens-corrected asymptotic p) and Q-Q decile table."""

import math
from datetime import datetime

from linkgraph_spark.functions.events import ks_test_values, qq_deciles

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _ev(spark, a_vals, b_vals):
    rows = [(1, "purchase", float(v), _TS) for v in a_vals]
    rows += [(2, "click", float(v), _TS) for v in b_vals]
    return spark.createDataFrame(rows, _SCHEMA)


def _ks_p(d, na, nb):
    ne = na * nb / (na + nb)
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
    s = sum((-1) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam) for j in range(1, 6))
    return round(min(1.0, max(0.0, 2.0 * s)), 6)


def test_ks_hand_computed(spark):
    r = ks_test_values(_ev(spark, [1, 2, 3], [2, 3, 4])).collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.d == round(1 / 3, 6)
    assert r.p_value == _ks_p(1 / 3, 3, 3)


def test_ks_identical_samples(spark):
    r = ks_test_values(_ev(spark, [5, 6, 7], [5, 6, 7])).collect()[0]
    assert r.d == 0.0 and r.p_value == 1.0  # series clamps at 1


def test_ks_disjoint_samples(spark):
    r = ks_test_values(_ev(spark, [1] * 20, [100] * 20)).collect()[0]
    assert r.d == 1.0
    assert r.p_value < 1e-4


def test_ks_empty_side_is_null(spark):
    r = ks_test_values(_ev(spark, [1, 2], [])).collect()[0]
    assert r.n_b == 0 and r.d is None and r.p_value is None


def test_qq_deciles_linear_shift(spark):
    a = list(range(1, 10))           # quantile_cont: q(p) = 1 + 8p
    b = [v + 10 for v in a]
    out = qq_deciles(_ev(spark, a, b)).collect()
    assert len(out) == 9
    for r in out:
        assert r.q_a == round(1 + 8 * r.p, 6)
        assert r.q_b == round(11 + 8 * r.p, 6)
        assert r.gap == -10.0
