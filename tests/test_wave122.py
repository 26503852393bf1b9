"""Wave-122 operators: Lorenz-curve deciles and the Gini coefficient of
per-customer spend (exact rank-space arithmetic)."""

from datetime import datetime

from linkgraph_spark.functions.relational import gini_spend, lorenz_deciles

_SCHEMA = "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
_TS = datetime(2024, 1, 1)


def _orders(spark, spend_by_cust):
    rows, i = [], 1
    for c, vals in spend_by_cust.items():
        for v in vals:
            rows.append((i, c, float(v), _TS))
            i += 1
    return spark.createDataFrame(rows, _SCHEMA)


def _lorenz_hand(cents):
    """Reference Lorenz/Gini from a list of per-customer cents."""
    xs = sorted(cents)
    n, s = len(xs), sum(xs)
    dec = {}
    for r, x in enumerate(xs, 1):
        k = (r - 1) * 10 // n + 1
        dec.setdefault(k, [0, 0])
        dec[k][0] += 1
        dec[k][1] += x
    srx = sum(r * x for r, x in enumerate(xs, 1))
    gini = (2 * srx - (n + 1) * s) / (n * s)
    return dec, s, gini


def test_lorenz_hand_computed(spark):
    # 20 customers with skewed spend and deliberate ties at 10.00
    spend = {c: [10.0] for c in range(1, 11)}
    spend.update({c: [25.0] for c in range(11, 16)})
    spend.update({c: [50.0, 30.0] for c in range(16, 20)})  # 80.00 each
    spend[20] = [400.0]
    df = _orders(spark, spend)
    cents = [sum(int(round(v * 100)) for v in vals) for vals in spend.values()]
    dec, s, _ = _lorenz_hand(cents)
    out = {r.decile: r for r in lorenz_deciles(df).collect()}
    assert sorted(out) == list(range(1, 11))
    cum = 0
    for k in range(1, 11):
        nk, spendk = dec.get(k, (0, 0))
        cum += spendk
        assert out[k].n_customers == nk
        assert out[k].spend == round(spendk / 100.0, 6)
        assert out[k].spend_share == round(spendk / s, 6)
        assert out[k].cum_share == round(cum / s, 6)
    assert out[10].cum_share == 1.0
    assert out[10].spend_share > out[1].spend_share  # skew shows


def test_lorenz_fewer_than_ten_customers(spark):
    df = _orders(spark, {1: [10.0], 2: [20.0], 3: [70.0]})
    out = {r.decile: r for r in lorenz_deciles(df).collect()}
    # N=3: ranks map to deciles 1, 4, 7 under ((r-1)*10) DIV N + 1
    assert [out[k].n_customers for k in range(1, 11)] == [
        1, 0, 0, 1, 0, 0, 1, 0, 0, 0,
    ]
    assert out[7].spend == 70.0
    assert out[10].cum_share == 1.0  # empty tail deciles carry the total


def test_gini_hand_computed(spark):
    spend = {1: [10.0], 2: [10.0], 3: [30.0], 4: [150.0]}
    df = _orders(spark, spend)
    cents = [1000, 1000, 3000, 15000]
    _, s, gini = _lorenz_hand(cents)
    out = gini_spend(df).collect()[0]
    assert out.n_customers == 4
    assert out.total_revenue == round(s / 100.0, 6)
    assert out.gini == round(gini, 6)
    assert 0 < out.gini < 1


def test_gini_uniform_is_zero(spark):
    df = _orders(spark, {c: [25.0] for c in range(1, 9)})
    out = gini_spend(df).collect()[0]
    assert out.gini == 0.0


def test_gini_tie_order_free(spark):
    # all mass on one customer, rest tied at epsilon -> near-max gini
    spend = {c: [0.01] for c in range(1, 10)}
    spend[10] = [1000.0]
    out = gini_spend(_orders(spark, spend)).collect()[0]
    cents = [1] * 9 + [100000]
    _, _, gini = _lorenz_hand(cents)
    assert out.gini == round(gini, 6)
    assert out.gini > 0.85
