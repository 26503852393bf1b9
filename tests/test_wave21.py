"""Wave-21 operators: Weisfeiler–Lehman color refinement and per-role-pair
turn latency percentiles."""

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.wl import wl_colors
from linkgraph_spark.transcripts import turn_latency


# ----------------------------------------------------------------------- WL
def test_wl_separates_roles_on_a_star(spark):
    # hub vs spokes: degree alone separates them, refinement keeps it
    edges = [(i, 0) for i in range(1, 6)]
    rows = wl_colors(graph_from_edges(spark, edges), rounds=3).collect()
    by_id = {r.id: (r.wl_color, r.class_size) for r in rows}
    spoke_colors = {by_id[i][0] for i in range(1, 6)}
    assert len(spoke_colors) == 1  # all spokes one class
    assert by_id[0][0] not in spoke_colors
    assert by_id[0][1] == 1 and by_id[1][1] == 5


def test_wl_distinguishes_what_degree_cannot(spark):
    # path P6: 0-1-2-3-4-5. Degrees: ends 1, middles 2 — but round-2 WL
    # separates (1,4) [adjacent to an end] from (2,3) [not].
    edges = [(i, i + 1) for i in range(5)]
    rows = wl_colors(graph_from_edges(spark, edges), rounds=2).collect()
    by_id = {r.id: r.wl_color for r in rows}
    assert by_id[0] == by_id[5]
    assert by_id[1] == by_id[4]
    assert by_id[2] == by_id[3]
    assert len({by_id[0], by_id[1], by_id[2]}) == 3


def test_wl_regular_graph_stays_one_class(spark):
    # a cycle is vertex-transitive: 1-WL can never split it
    n = 8
    ring = [(i, (i + 1) % n) for i in range(n)]
    rows = wl_colors(graph_from_edges(spark, ring), rounds=4).collect()
    assert len({r.wl_color for r in rows}) == 1
    assert all(r.class_size == n for r in rows)


def test_wl_refinement_is_monotone(spark):
    # color classes only ever split, never merge
    from tests.fixtures_graphs import web64

    edges = web64(40, 3)
    g = graph_from_edges(spark, edges)
    k1 = {r.id: r.wl_color for r in wl_colors(g, rounds=1).collect()}
    k3 = {r.id: r.wl_color for r in wl_colors(g, rounds=3).collect()}
    # same k3 color -> same k1 color (partition refinement)
    from collections import defaultdict

    back = defaultdict(set)
    for vid, c3 in k3.items():
        back[c3].add(k1[vid])
    assert all(len(s) == 1 for s in back.values())


# -------------------------------------------------------------- turn latency
def test_turn_latency_percentiles(spark):
    rows = [
        # conv A: user@0s -> assistant@10s -> user@40s
        ("A", 0, "user", "2024-01-01 00:00:00"),
        ("A", 1, "assistant", "2024-01-01 00:00:10"),
        ("A", 2, "user", "2024-01-01 00:00:40"),
        # conv B: user@0s -> assistant@20s
        ("B", 0, "user", "2024-01-01 00:00:00"),
        ("B", 1, "assistant", "2024-01-01 00:00:20"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.src_role, r.dst_role): (r.n, r.p50, r.p90)
        for r in turn_latency(df).collect()
    }
    # user->assistant gaps: [10, 20]; interpolated p50 = 15, p90 = 19
    assert got[("user", "assistant")] == (2, 15.0, 19.0)
    assert got[("assistant", "user")] == (1, 30.0, 30.0)
    assert set(got) == {("user", "assistant"), ("assistant", "user")}
