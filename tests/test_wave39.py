"""Wave-39 operators: int8 quantize recall, edge persistence histogram,
weighted strength percentiles."""

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph, build_graph, graph_from_edges
from linkgraph_spark.functions.similarity import quantize_recall
from linkgraph_spark.kernels.stats import strength_percentiles
from linkgraph_spark.kernels.temporal import edge_persistence, temporal_edges
from linkgraph_spark.transcripts import synthesize_transcripts


# -------------------------------------------------------------- quantize_recall
def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_quantize_recall_wellseparated_is_perfect(spark):
    # clusters far apart: int8 reconstruction cannot flip the top-k
    vecs = [
        [10, 0, 0], [11, 0.5, 0], [10.5, 0.2, 0],   # cluster A (query 0)
        [0, 10, 0], [0, 11, 0.5],                   # cluster B
    ]
    rows = quantize_recall(_embs(spark, vecs), n_queries=1, k=2).collect()
    assert len(rows) == 1
    assert rows[0].n_exact == 2 and rows[0].recall == 1.0


def test_quantize_recall_emits_all_queries(spark):
    vecs = [[1, 0], [0.9, 0.1], [0, 1], [0.1, 0.9]]
    rows = quantize_recall(_embs(spark, vecs), n_queries=2, k=2).collect()
    assert {r.query_id for r in rows} == {0, 1}
    assert all(0.0 <= r.recall <= 1.0 for r in rows)


# ------------------------------------------------------------- edge_persistence
def test_edge_persistence_totals(spark):
    t = synthesize_transcripts(spark, n_convs=40, hub_turns=60)
    g = build_graph(t)
    rows = edge_persistence(g, t, window_sec=3600).collect()
    assert rows
    total = sum(r.n_edges for r in rows)
    te = temporal_edges(g, t)
    assert total == te.select("src", "dst").distinct().count()
    assert all(r.n_windows >= 1 for r in rows)


def test_edge_persistence_rejects_bad_window(spark):
    t = synthesize_transcripts(spark, n_convs=2, hub_turns=4)
    g = build_graph(t)
    with pytest.raises(ValueError):
        edge_persistence(g, t, window_sec=0)


# --------------------------------------------------------- strength_percentiles
def _wgraph(spark, triples):
    edges = spark.createDataFrame(triples, "src long, dst long, weight long")
    ids = sorted(
        {s for s, _, _ in triples} | {d for _, d, _ in triples}
    )
    vertices = spark.createDataFrame(
        [(i, f"v{i}") for i in ids], "id long, actor_key string"
    )
    degrees = spark.createDataFrame(
        [(i, 0, 0, 1) for i in ids],
        "id long, out_deg long, in_deg long, relation_length long",
    )
    return LinkGraph(vertices, edges, degrees, len(ids))


def test_strength_percentiles_hand(spark):
    # out strengths: v0 = 5 (3+2), v1 = 1, v2 = 0
    g = _wgraph(spark, [(0, 1, 3), (0, 2, 2), (1, 2, 1)])
    got = {r.p: r for r in strength_percentiles(g, ps=(0.5, 1.0)).collect()}
    assert got[1.0].out_str_pct == 5.0
    assert got[0.5].out_str_pct == 1.0  # median of [0, 1, 5]
    assert got[1.0].in_str_pct == 3.0  # v2 receives 2+1
    assert got[0.5].in_str_pct == 3.0  # median of [0, 3, 3]


def test_strength_percentiles_rejects_unweighted(spark):
    g = graph_from_edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        strength_percentiles(g)
