"""Wave-32 operators: heat-kernel diffusion, k-step hitting probability,
per-window edge novelty."""

import math

import pytest

from linkgraph_spark.edges import build_graph, graph_from_edges
from linkgraph_spark.kernels.diffusion import (
    _poisson_weights,
    heat_kernel,
    hitting_probability,
)
from linkgraph_spark.kernels.temporal import edge_novelty
from linkgraph_spark.transcripts import synthesize_transcripts


# ----------------------------------------------------------------- heat_kernel
def test_heat_kernel_hand_path(spark):
    # 0→1, t=1, 2 terms: x1 = [0, .5], x2 = [0, 0]
    g = graph_from_edges(spark, [(0, 1)])
    got = {r.id: r.heat for r in heat_kernel(g, t=1.0, terms=2).scores.collect()}
    w = _poisson_weights(1.0, 2)
    assert got[0] == pytest.approx(round(w[0] * 0.5, 6))
    assert got[1] == pytest.approx(round(w[0] * 0.5 + w[1] * 0.5, 6))


def test_heat_kernel_cycle_uniform(spark):
    # directed 3-cycle: uniform is stationary, every vertex gets inv_n·Σw
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])
    res = heat_kernel(g, t=2.0, terms=8)
    vals = [r.heat for r in res.scores.collect()]
    expect = round(sum(_poisson_weights(2.0, 8)) / 3, 6)
    assert all(v == pytest.approx(expect, abs=2e-6) for v in vals)
    assert res.iterations == 8 and len(res.metrics) == 8


def test_heat_kernel_rejects_bad_args(spark):
    g = graph_from_edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        heat_kernel(g, terms=0)
    with pytest.raises(ValueError):
        heat_kernel(g, t=0.0)


# --------------------------------------------------------- hitting_probability
def test_hitting_probability_path(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2)])
    p1 = {
        r.id: r.p
        for r in hitting_probability(g, seeds=[2], iterations=1).scores.collect()
    }
    assert p1 == {0: 0.0, 1: 1.0, 2: 1.0}
    p2 = {
        r.id: r.p
        for r in hitting_probability(g, seeds=[2], iterations=2).scores.collect()
    }
    assert p2 == {0: 1.0, 1: 1.0, 2: 1.0}


def test_hitting_probability_branching_and_dangling(spark):
    # 0→{1,3}, 1→2; walk from 0 hits seed 2 with prob 1/2 in 2 hops;
    # dangling 3 never does
    g = graph_from_edges(spark, [(0, 1), (0, 3), (1, 2)])
    got = {
        r.id: r.p
        for r in hitting_probability(g, seeds=[2], iterations=2).scores.collect()
    }
    assert got[0] == pytest.approx(0.5)
    assert got[3] == 0.0 and got[2] == 1.0


def test_hitting_probability_rejects_empty_seeds(spark):
    g = graph_from_edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        hitting_probability(g, seeds=[])


# ---------------------------------------------------------------- edge_novelty
def test_edge_novelty_invariants(spark):
    t = synthesize_transcripts(spark, n_convs=40, hub_turns=50)
    g = build_graph(t)
    rows = edge_novelty(g, t, window_sec=3600).collect()
    assert rows, "no windows produced"
    # every distinct edge is new in exactly one window
    total_new = sum(r.new_edges for r in rows)
    from linkgraph_spark.kernels.temporal import temporal_edges

    te = temporal_edges(g, t)
    assert total_new == te.select("src", "dst").distinct().count()
    first_win = min(r.win for r in rows)
    first = next(r for r in rows if r.win == first_win)
    assert first.novelty_frac == 1.0  # nothing seen before the first window
    for r in rows:
        assert 0.0 <= r.novelty_frac <= 1.0
        assert r.new_edges <= r.n_edges <= r.n_events


def test_edge_novelty_rejects_bad_window(spark):
    t = synthesize_transcripts(spark, n_convs=2, hub_turns=5)
    g = build_graph(t)
    with pytest.raises(ValueError):
        edge_novelty(g, t, window_sec=0)
