"""Wave-23 operators: motif significance (clustering vs ER null),
temperature-smoothed corpus mixing, Markov stationary distribution."""

import datetime

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.events import markov_stationary
from linkgraph_spark.functions.sampling import temperature_mixture
from linkgraph_spark.kernels.stats import motif_significance


# -------------------------------------------------------- motif_significance
def _ms(spark, edges):
    return motif_significance(graph_from_edges(spark, edges)).collect()[0]


def test_motif_triangle_is_fully_clustered(spark):
    r = _ms(spark, [(0, 1), (1, 2), (2, 0)])
    assert (r.n_vertices, r.n_edges_und, r.n_triangles, r.n_wedges) == (3, 3, 1, 3)
    assert r.clustering == 1.0
    assert r.er_p == 1.0
    assert r.lift == 1.0


def test_motif_star_has_wedges_no_triangles(spark):
    r = _ms(spark, [(1, 0), (2, 0), (3, 0)])
    assert (r.n_vertices, r.n_edges_und) == (4, 3)
    assert (r.n_triangles, r.n_wedges) == (0, 3)
    assert r.clustering == 0.0 and r.lift == 0.0
    assert r.er_p == 0.5  # 2·3 / (4·3)


def test_motif_single_edge_null_clustering(spark):
    r = _ms(spark, [(0, 1)])
    assert r.n_wedges == 0
    assert r.clustering is None and r.lift is None
    assert r.er_p == 1.0


def test_motif_lift_exceeds_one_on_sparse_clustered_graph(spark):
    # two disjoint triangles: C = 1 but density is low → lift > 1
    r = _ms(spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    assert r.clustering == 1.0
    assert r.er_p == pytest.approx(round(12 / 30, 9), abs=1e-9)
    assert r.lift == pytest.approx(2.5, abs=1e-6)


# ------------------------------------------------------- temperature_mixture
def _docs_df(spark, counts: dict):
    rows, i = [], 0
    for lang, n in sorted(counts.items()):
        for _ in range(n):
            rows.append((i, f"text {i}", lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_temperature_alpha1_is_proportional(spark):
    df = _docs_df(spark, {"en": 8, "de": 2})
    out = temperature_mixture(df, ["doc_id"], "lang", total_n=5, alpha=1.0)
    by = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert by == {"en": 4, "de": 1}


def test_temperature_sqrt_upweights_tail(spark):
    df = _docs_df(spark, {"en": 64, "de": 4})
    out = temperature_mixture(df, ["doc_id"], "lang", total_n=10, alpha=0.5)
    by = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    # w = (8, 2) → ratios (0.8, 0.2) → (8, 2); proportional would give
    # de floor(10·4/68) = 0 — the tail language only survives via α
    assert by == {"en": 8, "de": 2}


def test_temperature_floor_undershoot_is_documented(spark):
    # round-9 ratio 1/3 → 0.333333333; 6·r = 1.999999998 floors to 1
    df = _docs_df(spark, {"en": 16, "de": 4})
    out = temperature_mixture(df, ["doc_id"], "lang", total_n=6, alpha=0.5)
    by = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert by == {"en": 4, "de": 1}


def test_temperature_budget_capped_by_stratum_size(spark):
    df = _docs_df(spark, {"en": 3, "de": 3})
    out = temperature_mixture(df, ["doc_id"], "lang", total_n=100, alpha=0.5)
    assert out.count() == 6  # can't exceed availability


def test_temperature_deterministic_and_validated(spark):
    df = _docs_df(spark, {"en": 10, "de": 5})
    a = sorted(r.doc_id for r in temperature_mixture(df, ["doc_id"], "lang", 8).collect())
    b = sorted(r.doc_id for r in temperature_mixture(df, ["doc_id"], "lang", 8).collect())
    assert a == b and len(a) > 0
    with pytest.raises(ValueError):
        temperature_mixture(df, ["doc_id"], "lang", 8, alpha=0.0)
    with pytest.raises(ValueError):
        temperature_mixture(df, ["doc_id"], "lang", -1)


# -------------------------------------------------------- markov_stationary
def _events_df(spark, seq, user=1, step=60):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i * step), user, et, 0.0)
        for i, et in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_markov_stationary_alternating_chain(spark):
    # a↔b deterministic alternation: uniform is stationary
    df = _events_df(spark, ["a", "b"] * 6)
    got = {r.event_type: r.pi for r in markov_stationary(df, iterations=10).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_markov_stationary_matches_python_power_iteration(spark):
    # chain a→a, a→a, a→b, b→a (from "a a a b a"): replay in python
    seq = ["a", "a", "a", "b", "a", "a", "a", "b", "a"]
    df = _events_df(spark, seq)
    # transitions from seq
    trans = {}
    for s, d in zip(seq, seq[1:]):
        trans[(s, d)] = trans.get((s, d), 0) + 1
    states = sorted({s for s, _ in trans})
    P = {
        s: {
            d: trans.get((s, d), 0)
            / sum(v for (ss, dd), v in trans.items() if ss == s and dd in states)
            for d in states
        }
        for s in states
    }
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(10):
        pi = {
            d: sum(pi[s] * P[s][d] for s in states) for d in states
        }
    got = {r.event_type: r.pi for r in markov_stationary(df, iterations=10).collect()}
    for s in states:
        assert got[s] == pytest.approx(round(pi[s], 6), abs=2e-6)


def test_markov_stationary_drops_sink_states(spark):
    # c has no outgoing transition → excluded; a↔b mass re-normalized
    df = _events_df(spark, ["a", "b", "a", "b", "a", "c"])
    got = {r.event_type: r.pi for r in markov_stationary(df, iterations=10).collect()}
    assert "c" not in got
    assert got["a"] + got["b"] == pytest.approx(1.0, abs=1e-5)


def test_markov_stationary_validates_iterations(spark):
    df = _events_df(spark, ["a", "b"])
    with pytest.raises(ValueError):
        markov_stationary(df, iterations=0)
