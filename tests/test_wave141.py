"""Wave-141 operators: James-Stein brand-mean shrinkage and the Kish
effective sample size of dedup weights."""

import math
from datetime import datetime

from linkgraph_spark.functions.dedup import dedup_effective_n
from linkgraph_spark.functions.relational import js_brand_price

_LI = "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double"
_PT = "p_partkey long, p_brand string"
_DOC = "doc_id long, text string, lang string, source string"


def _js_hand(groups):
    """groups: {brand: [cents]}"""
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    a = sum(sum(v) for v in groups.values())
    gmean = a / n
    qv = qd = 0
    for v in groups.values():
        ni, ai, bi = len(v), sum(v), sum(x * x for x in v)
        vt = ((ni * bi - ai * ai) / (ni * (ni - 1))) / ni if ni >= 2 else 0.0
        qv += round(1e6 * vt)
        qd += round(1e6 * (ai / ni - gmean) ** 2)
    out = {}
    for b, v in groups.items():
        mi = sum(v) / len(v)
        if k >= 4 and qd > 0:
            f = max(0.0, 1.0 - (k - 3.0) * (qv / 1e6 / k) / (qd / 1e6))
            out[b] = (gmean + f * (mi - gmean)) / 100.0
        elif k >= 4:
            out[b] = gmean / 100.0
        else:
            out[b] = mi / 100.0
    return out


def test_js_hand_computed(spark):
    groups = {
        "b1": [1000, 1200, 1100],
        "b2": [5000, 5200],
        "b3": [3000, 2900, 3100, 3000],
        "b4": [9000],          # single line: extreme mean, no variance info
        "b5": [2000, 2100],
    }
    li_rows, pt_rows, pk, ok = [], [], 1, 1
    for b, vals in groups.items():
        pt_rows.append((pk, b))
        for v in vals:
            li_rows.append((ok, pk, v / 100.0, 0.0))
            ok += 1
        pk += 1
    out = {
        r.brand: r
        for r in js_brand_price(
            spark.createDataFrame(li_rows, _LI),
            spark.createDataFrame(pt_rows, _PT),
        ).collect()
    }
    hand = _js_hand(groups)
    for b, r in out.items():
        assert r.shrunk_mean == round(hand[b], 6), b
    # shrinkage moves the extreme single-line brand toward the middle
    assert out["b4"].shrunk_mean < out["b4"].raw_mean
    assert out["b1"].shrunk_mean > out["b1"].raw_mean


def test_js_under_four_brands_returns_raw(spark):
    li = spark.createDataFrame(
        [(1, 1, 10.0, 0.0), (2, 2, 20.0, 0.0), (3, 3, 30.0, 0.0)], _LI
    )
    pt = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], _PT)
    out = js_brand_price(li, pt).collect()
    for r in out:
        assert r.shrunk_mean == r.raw_mean


def test_dedup_effective_n_hand(spark):
    # 3 identical docs (one keeper, w=3) + 2 unique docs (w=1 each)
    dup = " ".join(f"t{i}" for i in range(30))
    rows = [
        (1, dup, "en", "s"), (2, dup, "en", "s"), (3, dup, "en", "s"),
        (4, "alpha beta gamma delta", "en", "s"),
        (5, "eins zwei drei vier fuenf", "de", "s"),
    ]
    out = dedup_effective_n(
        spark.createDataFrame(rows, _DOC)
    ).collect()[0]
    ws = [3, 1, 1]
    neff = sum(ws) ** 2 / sum(w * w for w in ws)
    assert out.n_kept == 3 and out.sum_w == 5
    assert out.n_eff == round(neff, 6)
    assert out.efficiency == round(neff / 3, 6)
    assert out.efficiency < 1.0


def test_dedup_effective_n_dup_free_is_one(spark):
    rows = [
        (1, "totally unique first document", "en", "s"),
        (2, "a very different second text", "en", "s"),
    ]
    out = dedup_effective_n(
        spark.createDataFrame(rows, _DOC)
    ).collect()[0]
    assert out.efficiency == 1.0
