"""Wave-34 operators: consecutive-window edge Jaccard, reciprocity
latency, hub activity trajectory."""

import datetime

import pytest

from linkgraph_spark.edges import build_graph
from linkgraph_spark.kernels.temporal import (
    hub_trajectory,
    reciprocity_latency,
    window_edge_jaccard,
)
from linkgraph_spark.transcripts import synthesize_transcripts


def _t(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def _ts(sec):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec)


# --------------------------------------------------------- window_edge_jaccard
def test_window_edge_jaccard_hand(spark):
    # conv c2: A(1) B(2) A(17) B(18) with W=16:
    #   adjacent edges: A→B@2 (win0), B→A@17 (win1), A→B@18 (win1)
    rows = [
        ("c2", 0, "A", "w", None, _ts(1)),
        ("c2", 1, "B", "w", None, _ts(2)),
        ("c2", 2, "A", "w", None, _ts(17)),
        ("c2", 3, "B", "w", None, _ts(18)),
    ]
    t = _t(spark, rows)
    g = build_graph(t)
    base = int(_ts(0).timestamp())
    w0 = (base + 2) // 16
    got = {r.win: r for r in window_edge_jaccard(g, t, window_sec=16).collect()}
    first, second = got[w0], got[w0 + 1]
    assert first.n_cur == 1 and first.n_prev == 0 and first.jaccard == 0.0
    assert second.n_cur == 2 and second.n_prev == 1
    assert second.inter == 1 and second.jaccard == 0.5


def test_window_edge_jaccard_rejects_bad_window(spark):
    t = synthesize_transcripts(spark, n_convs=2, hub_turns=4)
    g = build_graph(t)
    with pytest.raises(ValueError):
        window_edge_jaccard(g, t, window_sec=0)


# --------------------------------------------------------- reciprocity_latency
def test_reciprocity_latency_hand_gap(spark):
    # A→B first fires @10, B→A first fires @20 (the @30 repeat is ignored)
    rows = [
        ("c1", 0, "A", "w", None, _ts(0)),
        ("c1", 1, "B", "w", None, _ts(10)),
        ("c1", 2, "A", "w", None, _ts(20)),
        ("c1", 3, "B", "w", None, _ts(30)),
    ]
    t = _t(spark, rows)
    g = build_graph(t)
    r = reciprocity_latency(g, t).collect()[0]
    assert r.n_mutual == 1
    assert r.p50_gap == 10.0 and r.p90_gap == 10.0 and r.max_gap == 10.0


def test_reciprocity_latency_no_mutual(spark):
    # single hand-off, never reciprocated
    rows = [
        ("c1", 0, "A", "w", None, _ts(0)),
        ("c1", 1, "B", "w", None, _ts(5)),
    ]
    t = _t(spark, rows)
    g = build_graph(t)
    r = reciprocity_latency(g, t).collect()[0]
    assert r.n_mutual == 0 and r.p50_gap is None and r.max_gap is None


# ------------------------------------------------------------- hub_trajectory
def test_hub_trajectory_top_hub_only(spark):
    t = synthesize_transcripts(spark, n_convs=30, hub_turns=60)
    g = build_graph(t)
    rows = hub_trajectory(g, t, window_sec=3600, k=1).collect()
    assert rows, "top hub produced no windows"
    hubs = {r.hub for r in rows}
    assert len(hubs) == 1  # k=1: a single hub traces the trajectory
    assert all(r.n_edges >= 1 for r in rows)


def test_hub_trajectory_rejects_bad_args(spark):
    t = synthesize_transcripts(spark, n_convs=2, hub_turns=4)
    g = build_graph(t)
    with pytest.raises(ValueError):
        hub_trajectory(g, t, window_sec=0)
    with pytest.raises(ValueError):
        hub_trajectory(g, t, k=0)
