"""Wave-31 operators: joint degree matrix, Benford first-digit audit,
variance participation ratio, Zipf head token share."""

import math

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.events import benford_values
from linkgraph_spark.functions.similarity import variance_participation
from linkgraph_spark.functions.text import head_token_share
from linkgraph_spark.kernels.stats import joint_degree_matrix


# -------------------------------------------------------- joint_degree_matrix
def test_joint_degree_matrix_star(spark):
    # star 0-{1,2,3}: hub deg 3 <-> leaves deg 1, both orientations
    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3)])
    got = {(r.deg_a, r.deg_b): r.n_edges for r in joint_degree_matrix(g).collect()}
    assert got == {(3, 1): 3, (1, 3): 3}


def test_joint_degree_matrix_symmetric_and_total(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    rows = joint_degree_matrix(g).collect()
    total = sum(r.n_edges for r in rows)
    assert total == 8  # 2 * |E_und|
    got = {(r.deg_a, r.deg_b): r.n_edges for r in rows}
    for (a, b), n in got.items():
        assert got[(b, a)] == n  # e_jk symmetry


# -------------------------------------------------------------- benford_values
def _ev(spark, values):
    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(i, t0, 1, "buy", float(v)) for i, v in enumerate(values)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_benford_first_digits(spark):
    # 123.4 -> 1, 0.05 -> 5, 9.99 -> 9, 10.0 -> 1, 0.9 -> 9; -3 and 0 excluded
    got = {
        r.digit: r
        for r in benford_values(
            _ev(spark, [123.4, 0.05, 9.99, 10.0, 0.9, -3.0, 0.0])
        ).collect()
    }
    assert len(got) == 9  # dense spine
    assert got[1].n == 2 and got[5].n == 1 and got[9].n == 2
    assert got[2].n == 0 and got[2].frac == 0.0
    assert got[1].frac == 0.4
    assert got[1].benford == pytest.approx(round(math.log10(2), 6))
    assert got[9].benford == pytest.approx(round(math.log10(10 / 9), 6))


def test_benford_all_excluded_null_frac(spark):
    got = benford_values(_ev(spark, [-1.0, 0.0])).collect()
    assert all(r.n == 0 and r.frac is None for r in got)


# ------------------------------------------------------ variance_participation
def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_variance_participation_even_spread(spark):
    # two dims with equal variance -> eff_dims = 2, eff_frac = 1
    r = variance_participation(_embs(spark, [[0, 0], [1, 1]])).collect()[0]
    assert r.dim == 2 and r.eff_dims == pytest.approx(2.0)
    assert r.eff_frac == pytest.approx(1.0)
    assert r.total_var == pytest.approx(0.5)  # 0.25 + 0.25


def test_variance_participation_single_axis(spark):
    # all variance on dim 0 -> eff_dims = 1
    r = variance_participation(_embs(spark, [[0, 5], [2, 5]])).collect()[0]
    assert r.eff_dims == pytest.approx(1.0) and r.eff_frac == pytest.approx(0.5)


def test_variance_participation_constant_null(spark):
    r = variance_participation(_embs(spark, [[3, 3], [3, 3]])).collect()[0]
    assert r.eff_dims is None and r.total_var == 0.0


# ------------------------------------------------------------ head_token_share
def _docs(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_head_token_share_hand(spark):
    # counts: a=4, b=2, c=1, d=1 (8 tokens)
    docs = [(0, "a a b"), (1, "a a b c d")]
    r = head_token_share(_docs(spark, docs), ks=(1, 2)).collect()[0]
    assert r.n_terms == 4 and r.n_tokens == 8
    assert r.share_top1 == pytest.approx(0.5)
    assert r.share_top2 == pytest.approx(0.75)


def test_head_token_share_tiebreak(spark):
    # b and c tie at 1; top2 takes a then b (term ascending)
    docs = [(0, "a a b c")]
    r = head_token_share(_docs(spark, docs), ks=(2,)).collect()[0]
    assert r.share_top2 == pytest.approx(0.75)


def test_head_token_share_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        head_token_share(_docs(spark, [(0, "x")]), ks=())
