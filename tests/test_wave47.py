"""Wave-47 operators: in/out degree self-correlation, word-length
histogram, session entry×exit matrix."""

import datetime

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.events import entry_exit_matrix
from linkgraph_spark.functions.text import word_length_dist
from linkgraph_spark.kernels.stats import inout_corr


# ------------------------------------------------------------------ inout_corr
def test_inout_corr_hand(spark):
    # 0→1, 1→2, 2→0, 0→2: degrees (od, id): 0:(2,1), 1:(1,1), 2:(1,2)
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0), (0, 2)])
    r = inout_corr(g).collect()[0]
    assert r.n_vertices == 3
    assert r.corr == pytest.approx(-0.5)
    assert r.frac_in_heavy == pytest.approx(round(1 / 3, 6))
    assert r.frac_balanced == pytest.approx(round(1 / 3, 6))


def test_inout_corr_constant_null(spark):
    # directed cycle: od = id = 1 everywhere -> zero variance -> NULL
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)])
    r = inout_corr(g).collect()[0]
    assert r.corr is None and r.frac_balanced == 1.0


# ------------------------------------------------------------- word_length_dist
def test_word_length_dist_hand(spark):
    docs = spark.createDataFrame(
        [(0, "a bb ccc a"), (1, "dddd")], "doc_id long, text string"
    )
    got = {r.wlen: r for r in word_length_dist(docs).collect()}
    assert got[1].n_tokens == 2 and got[1].share == 0.4
    assert got[2].n_tokens == 1 and got[3].n_tokens == 1 and got[4].n_tokens == 1


def test_word_length_dist_clamps(spark):
    docs = spark.createDataFrame(
        [(0, "x" * 50 + " yy")], "doc_id long, text string"
    )
    got = {r.wlen: r.n_tokens for r in word_length_dist(docs, max_len=5).collect()}
    assert got == {5: 1, 2: 1}
    with pytest.raises(ValueError):
        word_length_dist(docs, max_len=0)


# ------------------------------------------------------------ entry_exit_matrix
def test_entry_exit_matrix_hand(spark):
    t0 = datetime.datetime(2026, 1, 1)
    mk = lambda i, u, et, s: (i, t0 + datetime.timedelta(seconds=s), u, et, 0.0)  # noqa: E731
    rows = [
        # u1 session 1: view ... error (gap breaks before the next)
        mk(0, 1, "view", 0),
        mk(1, 1, "click", 10),
        mk(2, 1, "error", 20),
        # u1 session 2: single purchase (diagonal cell)
        mk(3, 1, "purchase", 10_000),
        # u2 session: view -> view
        mk(4, 2, "view", 0),
        mk(5, 2, "view", 5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        (r.entry_type, r.exit_type): r for r in entry_exit_matrix(df).collect()
    }
    assert got[("view", "error")].n_sessions == 1
    assert got[("purchase", "purchase")].n_sessions == 1
    assert got[("view", "view")].n_sessions == 1
    assert sum(r.share for r in got.values()) == pytest.approx(1.0, abs=1e-5)
