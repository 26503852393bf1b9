"""Wave-139 operators: return-rate trend across ship-delay buckets and
the window DAU/MAU stickiness scalar."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.events import stickiness_ratio
from linkgraph_spark.functions.relational import return_delay_trend

_LI = "l_orderkey long, l_returnflag string, l_shipdate timestamp"
_OD = "o_orderkey long, o_orderdate timestamp"
_EV = "user_id long, event_type string, value double, ts timestamp"
_T0 = datetime(2024, 1, 1)


def _ca_z(cells):
    """cells: {score: (n, r)}"""
    nn = sum(n for n, _ in cells.values())
    rr = sum(r for _, r in cells.values())
    ssn = sum(s * n for s, (n, _) in cells.items())
    ssr = sum(s * r for s, (_, r) in cells.items())
    sns2 = sum(s * s * n for s, (n, _) in cells.items())
    tn = nn * ssr - rr * ssn
    mm = nn * sns2 - ssn * ssn
    if rr == 0 or rr == nn or mm <= 0:
        return None
    return tn * math.sqrt(nn) / math.sqrt(rr * (nn - rr) * mm)


def test_return_delay_trend_hand(spark):
    # bucket 0 (gap 1): 10 lines 1 return; bucket 1 (gap 4): 10 lines 3;
    # bucket 2 (gap 8): 10 lines 5; bucket 3 (gap 15): 10 lines 8
    li_rows, od_rows, ok = [], [], 1
    cells = {}
    for s, (gap, ret) in enumerate([(1, 1), (4, 3), (8, 5), (15, 8)]):
        cells[s] = (10, ret)
        for i in range(10):
            od_rows.append((ok, _T0))
            flag = "R" if i < ret else "N"
            li_rows.append((ok, flag, _T0 + timedelta(days=gap)))
            ok += 1
    out = return_delay_trend(
        spark.createDataFrame(li_rows, _LI),
        spark.createDataFrame(od_rows, _OD),
    ).collect()[0]
    z = _ca_z(cells)
    assert (out.n_lines, out.n_returned) == (40, 17)
    assert out.z == round(z, 6)
    assert out.z > 0
    assert out.significant == (abs(round(z, 6)) > 1.959964)


def test_return_delay_no_returns_is_null(spark):
    od = spark.createDataFrame([(i, _T0) for i in range(1, 7)], _OD)
    li = spark.createDataFrame(
        [(i, "N", _T0 + timedelta(days=i)) for i in range(1, 7)], _LI
    )
    out = return_delay_trend(li, od).collect()[0]
    assert out.n_returned == 0 and out.z is None


def test_stickiness_hand(spark):
    # 3 days; users: u1 all 3 days, u2 one day, u3 two days
    rows = []
    for d in (0, 1, 2):
        rows.append((1, "view", 1.0, _T0 + timedelta(days=d)))
    rows.append((2, "view", 1.0, _T0 + timedelta(days=1)))
    for d in (0, 2):
        rows.append((3, "view", 1.0, _T0 + timedelta(days=d)))
    out = stickiness_ratio(spark.createDataFrame(rows, _EV)).collect()[0]
    assert (out.n_days, out.window_users) == (3, 3)
    assert out.avg_dau == round(6 / 3, 6)
    assert out.stickiness == round(6 / 3 / 3, 6)


def test_stickiness_everyone_every_day_is_one(spark):
    rows = [
        (u, "view", 1.0, _T0 + timedelta(days=d, seconds=u))
        for u in (1, 2)
        for d in (0, 1, 2, 3)
    ]
    out = stickiness_ratio(spark.createDataFrame(rows, _EV)).collect()[0]
    assert out.stickiness == 1.0
