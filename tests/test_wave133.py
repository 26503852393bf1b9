"""Wave-133 operators: supplier ship-delay ANOVA and the open-order
aging profile."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.relational import (
    order_aging_profile,
    ship_delay_anova,
)

_LI = "l_orderkey long, l_suppkey long, l_shipdate timestamp"
_OD = "o_orderkey long, o_orderstatus string, o_orderpriority string, o_orderdate timestamp"
_T0 = datetime(2024, 1, 1)


def _anova_hand(groups):
    """groups: {supp: [gaps]}"""
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
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return f, max(0.0, ssb / sst)


def test_anova_hand_computed(spark):
    # supplier 1 ships fast (1-3d), supplier 2 slow (8-12d), 3 mixed
    groups = {
        1: [1, 2, 3, 2, 1, 3],
        2: [8, 10, 12, 9, 11],
        3: [4, 6, 5, 7],
    }
    od_rows, li_rows, ok = [], [], 1
    for supp, gaps in groups.items():
        for gp in gaps:
            od_rows.append((ok, "F", "1-URGENT", _T0))
            li_rows.append((ok, supp, _T0 + timedelta(days=gp)))
            ok += 1
    out = ship_delay_anova(
        spark.createDataFrame(li_rows, _LI),
        spark.createDataFrame(od_rows, _OD),
    ).collect()[0]
    f, eta = _anova_hand(groups)
    assert (out.k_suppliers, out.n_lines) == (3, 15)
    assert out.f_stat == round(f, 6)
    assert out.eta_squared == round(eta, 6)
    assert out.eta_squared > 0.8  # suppliers explain most of it


def test_anova_single_supplier_is_null(spark):
    od = spark.createDataFrame(
        [(i, "F", "1-URGENT", _T0) for i in range(1, 5)], _OD
    )
    li = spark.createDataFrame(
        [(i, 1, _T0 + timedelta(days=i)) for i in range(1, 5)], _LI
    )
    out = ship_delay_anova(li, od).collect()[0]
    assert out.k_suppliers == 1 and out.f_stat is None


def test_anova_zero_within_spread_is_null(spark):
    od = spark.createDataFrame(
        [(i, "F", "1-URGENT", _T0) for i in range(1, 7)], _OD
    )
    li = spark.createDataFrame(
        [(i, 1 + i % 2, _T0 + timedelta(days=3 + i % 2)) for i in range(1, 7)],
        _LI,
    )
    # every line in a supplier has the identical gap -> ssw == 0
    out = ship_delay_anova(li, od).collect()[0]
    assert out.f_stat is None


def test_aging_hand_computed(spark):
    rows = [
        (1, "O", "1-URGENT", _T0),                       # age 20
        (2, "O", "1-URGENT", _T0 + timedelta(days=10)),  # age 10
        (3, "O", "1-URGENT", _T0 + timedelta(days=18)),  # age 2
        (4, "F", "1-URGENT", _T0 + timedelta(days=5)),   # closed: excluded
        (5, "O", "5-LOW", _T0 + timedelta(days=20)),     # age 0, sets as-of
    ]
    out = {
        r.priority: r
        for r in order_aging_profile(
            spark.createDataFrame(rows, _OD)
        ).collect()
    }
    u = out["1-URGENT"]
    assert u.n_open == 3 and u.max_age == 20
    assert u.p50_age == 10.0
    assert u.p90_age == round(10 + (20 - 10) * 0.8, 6)
    assert out["5-LOW"].max_age == 0


def test_aging_no_open_orders_is_empty(spark):
    rows = [(1, "F", "1-URGENT", _T0), (2, "P", "5-LOW", _T0)]
    assert order_aging_profile(
        spark.createDataFrame(rows, _OD)
    ).count() == 0
