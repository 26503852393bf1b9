"""Wave-38 operators: question/answer length correlation, cross-modal
quality-vs-norm, directed flow-role census."""

import datetime

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.similarity import quality_vs_norm
from linkgraph_spark.kernels.stats import flow_roles
from linkgraph_spark.transcripts import qa_length_corr


# --------------------------------------------------------------- qa_length_corr
def _t(spark, rows):
    t0 = datetime.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(c, i, r, x, None, t0) for c, i, r, x in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_qa_length_corr_perfect(spark):
    # answer = 2x question length → corr 1.0
    rows = [
        ("c1", 0, "user", "ab"), ("c1", 1, "assistant", "abcd"),
        ("c1", 2, "user", "abcdef"), ("c1", 3, "assistant", "abcdefghijkl"),
        ("c2", 0, "user", "a"), ("c2", 1, "assistant", "ab"),
        # non-adjacent or wrong-role pairs must not count
        ("c2", 2, "assistant", "zzz"), ("c2", 3, "user", "zz"),
    ]
    r = qa_length_corr(_t(spark, rows)).collect()[0]
    assert r.n_pairs == 3
    assert r.corr == pytest.approx(1.0)
    assert r.avg_q_chars == 3.0 and r.avg_a_chars == 6.0


def test_qa_length_corr_constant_null(spark):
    rows = [("c1", 0, "user", "aa"), ("c1", 1, "assistant", "bbb")]
    r = qa_length_corr(_t(spark, rows)).collect()[0]
    assert r.n_pairs == 1 and r.corr is None


# --------------------------------------------------------------- quality_vs_norm
def test_quality_vs_norm_joins_on_id(spark):
    docs = spark.createDataFrame(
        [
            (0, "the of and to a in is it quick brown fox jumps", "en", "s", 47),
            (1, "x", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    embs = spark.createDataFrame(
        [(0, [3.0, 4.0], 0), (1, [6.0, 8.0], 0), (9, [1.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    r = quality_vs_norm(docs, embs).collect()[0]
    assert r.n == 2  # vec 9 has no doc
    assert r.avg_norm == 7.5  # (5 + 10) / 2
    # doc 0 is high quality, doc 1 low; norms 5 vs 10 → perfect anti-corr
    assert r.corr == pytest.approx(-1.0)


def test_quality_vs_norm_zero_variance_null(spark):
    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 1), (1, "y", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    embs = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    r = quality_vs_norm(docs, embs).collect()[0]
    assert r.corr is None  # same quality AND same norm


# ------------------------------------------------------------------- flow_roles
def test_flow_roles_census(spark):
    # 0→1→2, 0→2: 0 = source, 2 = sink, 1 = relay
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2)])
    got = {r.role: r for r in flow_roles(g).collect()}
    assert got["source"].n_vertices == 1 and got["source"].avg_out == 2.0
    assert got["sink"].n_vertices == 1 and got["sink"].avg_in == 2.0
    assert got["relay"].n_vertices == 1
    assert "isolated" not in got
