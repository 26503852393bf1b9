"""Wave-153 operators: harmonic label spreading and the stuck-agent
loop audit."""

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.diffusion import label_spreading
from linkgraph_spark.transcripts import stuck_loops


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _spread_ref(edges, seeds, iters):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    f = {v: (1.0 if v in seeds else 0.0) for v in adj}
    for _ in range(iters):
        nf = {}
        for v in adj:
            if v in seeds:
                nf[v] = 1.0
            else:
                nf[v] = sum(f[u] for u in adj[v]) / len(adj[v])
        f = nf
    return {v: round(s, 6) for v, s in f.items()}


def test_spreading_matches_reference_and_monotone(spark):
    # path 0-1-2-3-4 with seed 0: scores decay with distance, every round
    # only raises them (harmonic from the zero init)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)]
    g = graph_from_edges(spark, edges)
    prev = None
    for it in (2, 4, 8):
        got = {
            r.id: r.score
            for r in label_spreading(g, _seeds(spark, [0]), iterations=it).collect()
        }
        want = _spread_ref(edges, {0}, it)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=2e-6)
        assert got[0] == 1.0
        assert got[1] > got[2] > got[3] >= got[4]
        assert got[5] == got[6] == 0.0  # seedless component stays 0
        if prev is not None:
            for v in got:
                assert got[v] >= prev[v] - 1e-9
        prev = got


def test_spreading_all_seeds_is_identity(spark):
    edges = [(0, 1), (1, 2)]
    got = {
        r.id: r.score
        for r in label_spreading(
            graph_from_edges(spark, edges), _seeds(spark, [0, 1, 2])
        ).collect()
    }
    assert set(got.values()) == {1.0}


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )


def test_stuck_loops_detects_retry_runs(spark):
    rows = [
        ("c1", 0, "user", None),
        ("c1", 1, "assistant", "search"),
        ("c1", 2, "assistant", "search"),
        ("c1", 3, "assistant", "search"),
        ("c1", 4, "user", None),
        ("c1", 5, "assistant", "search"),  # separate run, len 1
        ("c2", 0, "user", None),
        ("c2", 1, "assistant", None),
    ]
    got = {r.conv_id: r for r in stuck_loops(_t(spark, rows)).collect()}
    assert got["c1"].max_run == 3
    assert got["c1"].max_run_state == "assistant|search"
    assert got["c1"].n_loops == 1
    assert got["c1"].n_turns == 6
    assert got["c2"].max_run == 1 and got["c2"].n_loops == 0


def test_stuck_loops_same_tool_different_role_breaks_run(spark):
    rows = [
        ("c1", 0, "assistant", "bash"),
        ("c1", 1, "user", "bash"),
        ("c1", 2, "assistant", "bash"),
    ]
    (r,) = stuck_loops(_t(spark, rows)).collect()
    assert r.max_run == 1 and r.n_loops == 0


def test_stuck_loops_earliest_run_wins_ties(spark):
    rows = [
        ("c1", 0, "a", "x"), ("c1", 1, "a", "x"),
        ("c1", 2, "u", None),
        ("c1", 3, "b", "y"), ("c1", 4, "b", "y"),
    ]
    (r,) = stuck_loops(_t(spark, rows), min_run=2).collect()
    assert r.max_run == 2 and r.max_run_state == "a|x"
    assert r.n_loops == 2
