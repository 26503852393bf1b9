"""Wave-48 operators: Burt structural-holes constraint, temporal triadic
closure, weekly growth accounting."""

import datetime

import pytest

from linkgraph_spark.edges import build_graph, graph_from_edges
from linkgraph_spark.functions.events import growth_accounting
from linkgraph_spark.kernels.stats import burt_constraint
from linkgraph_spark.kernels.temporal import triadic_closure


def _transcripts(spark, rows):
    """rows: (conv_id, turn_idx, role, tool, epoch_sec)."""
    data = [
        (c, i, r, f"{c}:{i}", tool, datetime.datetime.utcfromtimestamp(ts))
        for (c, i, r, tool, ts) in rows
    ]
    return spark.createDataFrame(
        data,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


# -------------------------------------------------------------- burt_constraint
def test_burt_constraint_triangle(spark):
    # undirected triangle: p = 1/2 everywhere, one indirect path per tie:
    # c_ij = (1/2 + 1/4)^2 = 0.5625, C_i = 2 * 0.5625 = 1.125 (textbook)
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])
    rows = burt_constraint(g).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.deg == 2 and r.constraint_score == pytest.approx(1.125)


def test_burt_constraint_star(spark):
    # star center 0 with 3 leaves: C_0 = 3*(1/3)^2 = 1/3 (pure broker);
    # each leaf's only tie is the center: C_leaf = 1^2 = 1 (fully constrained)
    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3)])
    got = {r.id: r for r in burt_constraint(g).collect()}
    assert got[0].constraint_score == pytest.approx(round(1 / 3, 6))
    assert got[0].deg == 3
    for leaf in (1, 2, 3):
        assert got[leaf].constraint_score == pytest.approx(1.0)


def test_burt_constraint_middleman_cap(spark):
    # cap below the triangle degree removes every indirect path:
    # C_i = 2 * (1/2)^2 = 0.5; direct ties (and deg) must stay exact
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])
    rows = burt_constraint(g, max_degree=1).collect()
    for r in rows:
        assert r.deg == 2 and r.constraint_score == pytest.approx(0.5)


# -------------------------------------------------------------- triadic_closure
def test_triadic_closure_hand(spark):
    # one conv, roles u→a→s→u: fe(u,a)=1000, fe(a,s)=2000, fe(s,u)=9000.
    # t_split = 1000 + (9000-1000)//2 = 5000; early = {(u,a),(a,s)};
    # the single open wedge (u,s) closes at 9000 → rate 1.0
    t = _transcripts(
        spark,
        [
            ("c1", 0, "u", None, 500),
            ("c1", 1, "a", None, 1000),
            ("c1", 2, "s", None, 2000),
            ("c1", 3, "u", None, 9000),
        ],
    )
    g = build_graph(t)
    r = triadic_closure(g, t).collect()[0]
    assert r.t_split == 5000
    assert r.n_open_wedges == 1
    assert r.n_closed_later == 1
    assert r.closure_rate == pytest.approx(1.0)


def test_triadic_closure_open_wedge_stays_open(spark):
    # u→a→s only: wedge (u,s) never closes → rate 0.0; split still emitted
    t = _transcripts(
        spark,
        [
            ("c1", 0, "u", None, 500),
            ("c1", 1, "a", None, 1000),
            ("c1", 2, "s", None, 9000),
        ],
    )
    g = build_graph(t)
    r = triadic_closure(g, t).collect()[0]
    # fe(u,a)=1000, fe(a,s)=9000 → split 5000, early={(u,a)}: no wedge at all
    assert r.n_open_wedges == 0 and r.n_closed_later == 0
    assert r.closure_rate is None or r.closure_rate == 0.0


# ------------------------------------------------------------ growth_accounting
def test_growth_accounting_hand(spark):
    w = 604800
    mk = lambda i, u, wk: (  # noqa: E731
        i,
        datetime.datetime.utcfromtimestamp(wk * w + 100),
        u,
        "view",
        0.0,
    )
    ev = spark.createDataFrame(
        [
            mk(0, 1, 0), mk(1, 1, 1),          # A: w0, w1  (retained at w1)
            mk(2, 2, 0),                        # B: w0 only (churns at w1)
            mk(3, 3, 0), mk(4, 3, 2),           # C: w0, w2  (resurrected at w2)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {r.week: r for r in growth_accounting(ev).collect()}
    assert got[0].n_new == 3 and got[0].n_churned == 0
    assert got[1].n_retained == 1          # A
    assert got[1].n_churned == 2           # B and C inactive at w1
    assert got[2].n_resurrected == 1       # C returns
    assert got[2].n_churned == 1           # A inactive at w2
    assert got[2].quick_ratio == pytest.approx(1.0)
    # no churn row past the last observed week
    assert 3 not in got


def test_growth_accounting_single_week(spark):
    ev = spark.createDataFrame(
        [(0, datetime.datetime.utcfromtimestamp(1000), 7, "view", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    rows = growth_accounting(ev).collect()
    assert len(rows) == 1
    assert rows[0].n_new == 1 and rows[0].n_churned == 0
    assert rows[0].quick_ratio is None
