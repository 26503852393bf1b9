"""Wave-44 operators: Barrat weighted clustering, session-depth survival
curve, conversation arc."""

import datetime

import pytest

from linkgraph_spark.edges import LinkGraph, graph_from_edges
from linkgraph_spark.functions.events import session_depth_curve
from linkgraph_spark.kernels.triangles import barrat_clustering, clustering_coefficient
from linkgraph_spark.transcripts import conv_arc


def _wgraph(spark, triples):
    edges = spark.createDataFrame(triples, "src long, dst long, weight long")
    ids = sorted({s for s, _, _ in triples} | {d for _, d, _ in triples})
    vertices = spark.createDataFrame(
        [(i, f"v{i}") for i in ids], "id long, actor_key string"
    )
    degrees = spark.createDataFrame(
        [(i, 0, 0, 1) for i in ids],
        "id long, out_deg long, in_deg long, relation_length long",
    )
    return LinkGraph(vertices, edges, degrees, len(ids))


# ------------------------------------------------------------ barrat_clustering
def test_barrat_hand_weights(spark):
    # triangle 0-1 (2), 1-2 (4), 0-2 (6) plus pendant 2-3 (10)
    g = _wgraph(spark, [(0, 1, 2), (1, 2, 4), (0, 2, 6), (2, 3, 10)])
    got = {r.id: r for r in barrat_clustering(g).collect()}
    assert got[0].cw == 1.0 and got[0].k == 2 and got[0].strength == 8.0
    assert got[1].cw == 1.0
    assert got[2].cw == 0.25  # 10 / (20 * 2): weight flows down the spoke
    assert got[3].cw == 0.0 and got[3].k == 1


def test_barrat_uniform_weights_reduce_to_lcc(spark):
    triples = [(0, 1, 1), (1, 2, 1), (0, 2, 1), (2, 3, 1), (3, 4, 1), (2, 4, 1)]
    g = _wgraph(spark, triples)
    gu = graph_from_edges(spark, [(s, d) for s, d, _ in triples])
    cw = {r.id: r.cw for r in barrat_clustering(g).collect()}
    lcc = {r.id: r.lcc for r in clustering_coefficient(gu).collect()}
    for i in lcc:
        assert cw[i] == pytest.approx(lcc[i], abs=1e-6), i


def test_barrat_rejects_unweighted(spark):
    g = graph_from_edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        barrat_clustering(g)


# --------------------------------------------------------- session_depth_curve
def test_session_depth_curve_hand(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # u1: one session of 3 events; u2: two sessions (2 events, 1 event)
    for u, bursts in [(1, [3]), (2, [2, 1])]:
        base = 0
        for b in bursts:
            for i in range(b):
                rows.append((eid, t0 + datetime.timedelta(seconds=base + i), u, "view", 0.0))
                eid += 1
            base += 10_000  # beyond the 1800s gap
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.depth: r for r in session_depth_curve(df, max_depth=4).collect()}
    assert got[1].n_sessions == 3 and got[1].survival == 1.0
    assert got[2].n_sessions == 2 and got[2].survival == pytest.approx(round(2 / 3, 6))
    assert got[3].n_sessions == 1
    assert got[4].n_sessions == 0 and got[4].survival == 0.0


# ----------------------------------------------------------------------- conv_arc
def test_conv_arc_bins_and_shares(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "system", "x", None, t0),
        ("c1", 1, "user", "x", None, t0),
        ("c1", 2, "assistant", "x", None, t0),
        ("c1", 3, "user", "x", None, t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {(r.bin, r.role): r for r in conv_arc(df, n_bins=2).collect()}
    # turns 0,1 -> bin 0; turns 2,3 -> bin 1
    assert got[(0, "system")].share == 0.5 and got[(0, "user")].share == 0.5
    assert got[(1, "assistant")].share == 0.5 and got[(1, "user")].share == 0.5
    with pytest.raises(ValueError):
        conv_arc(df, n_bins=0)
