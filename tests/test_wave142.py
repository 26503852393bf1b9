"""Wave-142 operator: Laspeyres/Paasche/Fisher price indices between
time halves."""

import math
from datetime import datetime, timedelta

from linkgraph_spark.functions.relational import price_index_halves

_LI = "l_orderkey long, l_partkey long, l_extendedprice double, l_quantity double, l_shipdate timestamp"
_T0 = datetime(2024, 1, 1)


def test_price_index_hand_computed(spark):
    # part 1: price 10 -> 12 (qty 2 then 3); part 2: price 5 -> 5 (qty 4, 1)
    # half 0 = days 0-1, half 1 = days 8-9 (median splits cleanly)
    rows = [
        (1, 1, 20.0, 2.0, _T0),                       # p=10, h0
        (2, 2, 20.0, 4.0, _T0 + timedelta(days=1)),   # p=5, h0
        (3, 1, 36.0, 3.0, _T0 + timedelta(days=8)),   # p=12, h1
        (4, 2, 5.0, 1.0, _T0 + timedelta(days=9)),    # p=5, h1
    ]
    out = price_index_halves(
        spark.createDataFrame(rows, _LI)
    ).collect()[0]
    # cents/centi: a0 = [2000, 2000], q0 = [200, 400]
    #              a1 = [3600, 500],  q1 = [300, 100]
    sa0, sa1 = 4000, 4100
    x10 = round(1e6 * 3600 * 200 / 300) + round(1e6 * 500 * 400 / 100)
    x01 = round(1e6 * 2000 * 300 / 200) + round(1e6 * 2000 * 100 / 400)
    lasp = x10 / 1e6 / sa0
    paas = sa1 / (x01 / 1e6)
    assert out.n_parts_common == 2
    assert out.laspeyres == round(lasp, 6)
    assert out.paasche == round(paas, 6)
    assert out.fisher == round(math.sqrt(lasp * paas), 6)
    assert out.laspeyres > 1.0  # prices rose on the base basket


def test_price_index_flat_prices_is_one(spark):
    rows = [
        (1, 1, 10.0, 1.0, _T0),
        (2, 1, 20.0, 2.0, _T0 + timedelta(days=9)),  # same unit price
    ]
    out = price_index_halves(
        spark.createDataFrame(rows, _LI)
    ).collect()[0]
    assert out.laspeyres == 1.0 and out.paasche == 1.0 and out.fisher == 1.0


def test_price_index_no_common_basket_is_null(spark):
    rows = [
        (1, 1, 10.0, 1.0, _T0),
        (2, 2, 10.0, 1.0, _T0 + timedelta(days=9)),
    ]
    out = price_index_halves(
        spark.createDataFrame(rows, _LI)
    ).collect()[0]
    assert out.n_parts_common == 0
    assert out.laspeyres is None and out.fisher is None
