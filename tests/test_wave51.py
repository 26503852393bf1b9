"""Wave-51 operators: Radicchi edge clustering coefficient, near-dup
source matrix, inter-session gap distribution."""

import datetime

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.dedup import dup_source_matrix
from linkgraph_spark.functions.events import session_gap_dist
from linkgraph_spark.kernels.truss import edge_ecc


# --------------------------------------------------------------------- edge_ecc
def test_edge_ecc_triangle_with_pendant(spark):
    # triangle 0-1-2 plus pendant edge 0-3:
    # degrees 0:3, 1:2, 2:2, 3:1; every triangle edge has support 1
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0), (0, 3)])
    got = {(r.a, r.b): r for r in edge_ecc(g).collect()}
    assert got[(0, 1)].support == 1
    # ecc(0,1) = (1+1)/min(3-1, 2-1) = 2.0 (same for the other tri edges)
    assert got[(0, 1)].ecc == pytest.approx(2.0)
    assert got[(1, 2)].ecc == pytest.approx(2.0)
    assert got[(0, 2)].ecc == pytest.approx(2.0)
    # pendant: min(k)-1 = 0 → undefined
    assert got[(0, 3)].support == 0 and got[(0, 3)].ecc is None


def test_edge_ecc_square_no_triangles(spark):
    # 4-cycle: support 0 everywhere, all degrees 2 → ecc = 1/1 = 1.0
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    rows = edge_ecc(g).collect()
    assert len(rows) == 4
    assert all(r.support == 0 and r.ecc == pytest.approx(1.0) for r in rows)


# ------------------------------------------------------------- dup_source_matrix
def test_dup_source_matrix_hand(spark):
    # three byte-identical docs (A, A, B) → dup pairs (0,1) A-A, (0,2)
    # and (1,2) A-B; doc 3 (C) is unique and contributes nothing
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, text, "A"),
            (1, text, "A"),
            (2, text, "B"),
            (3, "completely different content with no overlap at all", "C"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source_a, r.source_b): r
        for r in dup_source_matrix(docs, threshold=0.5).collect()
    }
    assert got[("A", "A")].n_pairs == 1
    assert got[("A", "B")].n_pairs == 2
    assert got[("A", "A")].share == pytest.approx(round(1 / 3, 6))
    assert got[("A", "B")].share == pytest.approx(round(2 / 3, 6))
    assert len(got) == 2


# -------------------------------------------------------------- session_gap_dist
def test_session_gap_dist_hand(spark):
    # one user, single-event sessions at t=0, 3600, 3600+8192:
    # gaps 3600 (log2→11) and 8192 (log2→13, exact power)
    mk = lambda i, s: (  # noqa: E731
        i,
        datetime.datetime.utcfromtimestamp(s),
        1,
        "view",
        0.0,
    )
    ev = spark.createDataFrame(
        [mk(0, 0), mk(1, 3600), mk(2, 3600 + 8192)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {r.log2_gap: r for r in session_gap_dist(ev, gap_sec=1800).collect()}
    assert got[11].n_gaps == 1 and got[13].n_gaps == 1
    assert got[11].share == pytest.approx(0.5)


def test_session_gap_dist_no_gaps_empty(spark):
    # a single session per user → no between-session gaps → empty frame
    ev = spark.createDataFrame(
        [(0, datetime.datetime.utcfromtimestamp(100), 1, "view", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    assert session_gap_dist(ev).count() == 0
