"""Wave-130 operators: Welch's t-test and the Brown-Forsythe variance
test between the md5 A/B arms."""

import hashlib
import math
from datetime import datetime

from linkgraph_spark.functions.ml import ab_levene_bf, ab_welch_t

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _variant(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def _ev(spark, spend):
    return spark.createDataFrame(
        [(u, "purchase", v / 100.0, _TS) for u, v in spend.items()], _SCHEMA
    )


def _welch_hand(spend):
    g = {0: [], 1: []}
    for u, v in spend.items():
        g[_variant(u)].append(v)
    n0, n1 = len(g[0]), len(g[1])
    m0, m1 = sum(g[0]) / n0, sum(g[1]) / n1
    v0 = (n0 * sum(x * x for x in g[0]) - sum(g[0]) ** 2) / (n0 * (n0 - 1))
    v1 = (n1 * sum(x * x for x in g[1]) - sum(g[1]) ** 2) / (n1 * (n1 - 1))
    se2 = v1 / n1 + v0 / n0
    t = (m1 - m0) / math.sqrt(se2)
    df = se2 * se2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v0 / n0) ** 2 / (n0 - 1)
    )
    return n0, n1, m0, m1, t, df


def _levene_hand(spend):
    g = {0: [], 1: []}
    for u, v in spend.items():
        g[_variant(u)].append(v)

    def _med2(xs):
        xs = sorted(xs)
        n = len(xs)
        if n % 2:
            return 2 * xs[n // 2]
        return xs[n // 2 - 1] + xs[n // 2]

    d = {k: [abs(2 * x - _med2(xs)) for x in xs] for k, xs in g.items()}
    n0, n1 = len(d[0]), len(d[1])
    a0, a1 = sum(d[0]), sum(d[1])
    b0, b1 = sum(x * x for x in d[0]), sum(x * x for x in d[1])
    ssb = a0 * a0 / n0 + a1 * a1 / n1 - (a0 + a1) ** 2 / (n0 + n1)
    ssw = b0 - a0 * a0 / n0 + b1 - a1 * a1 / n1
    if ssw <= 0:
        return None
    return (n0 + n1 - 2.0) * ssb / ssw


def test_welch_hand_computed(spark):
    spend = {}
    for u in range(1, 61):
        base = 5000 if _variant(u) == 1 else 3000
        spend[u] = base + (u % 7) * 250  # cents
    out = ab_welch_t(_ev(spark, spend)).collect()[0]
    n0, n1, m0, m1, t, df = _welch_hand(spend)
    assert (out.n0, out.n1) == (n0, n1)
    assert out.mean0 == round(m0 / 100.0, 6)
    assert out.mean1 == round(m1 / 100.0, 6)
    assert out.t == round(t, 6)
    assert out.df == round(df, 6)
    assert out.significant == (abs(round(t, 6)) > 1.959964)
    assert out.t > 0  # arm 1 spends more


def test_welch_tiny_arm_is_null(spark):
    ctrl = [u for u in range(1, 60) if _variant(u) == 0][:5]
    treat = [u for u in range(1, 60) if _variant(u) == 1][:1]
    spend = {u: 1000 + u for u in ctrl + treat}
    out = ab_welch_t(_ev(spark, spend)).collect()[0]
    assert out.n1 == 1 and out.t is None and out.df is None


def test_levene_hand_computed(spark):
    spend = {}
    for u in range(1, 81):
        if _variant(u) == 1:
            spend[u] = 5000 + (u % 11) * 900   # wide spread
        else:
            spend[u] = 5000 + (u % 3) * 100    # tight spread
    out = ab_levene_bf(_ev(spark, spend)).collect()[0]
    f = _levene_hand(spend)
    assert out.f_stat == round(f, 6)
    assert out.significant == (round(f, 6) > 3.841459)
    assert out.f_stat > 0


def test_levene_equal_spreads_small_f(spark):
    spend = {u: 1000 + (u % 5) * 100 for u in range(1, 101)}
    out = ab_levene_bf(_ev(spark, spend)).collect()[0]
    f = _levene_hand(spend)
    assert out.f_stat == round(f, 6)
    assert out.significant is False


def test_levene_degenerate_spread_is_null(spark):
    spend = {u: 2000 for u in range(1, 31)}  # all identical
    out = ab_levene_bf(_ev(spark, spend)).collect()[0]
    assert out.f_stat is None and out.significant is None
