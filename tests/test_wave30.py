"""Wave-30 operators: k-core shell profile, Church–Gale term burstiness,
hourly-count autocorrelation."""

import datetime

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.events import hourly_autocorr
from linkgraph_spark.functions.text import term_burstiness
from linkgraph_spark.kernels.kcore import core_profile


# --------------------------------------------------------------- core_profile
def test_core_profile_star_plus_triangle(spark):
    # star 0-{1,2,3}: every vertex coreness 1 (hub deg 3, leaves deg 1);
    # triangle 4-5-6: coreness 2, deg 2
    g = graph_from_edges(
        spark, [(0, 1), (0, 2), (0, 3), (4, 5), (5, 6), (6, 4)]
    )
    got = {r.core: r for r in core_profile(g).collect()}
    assert got[1].n_vertices == 4
    assert got[1].avg_deg == 1.5 and got[1].max_deg == 3
    assert got[2].n_vertices == 3
    assert got[2].avg_deg == 2.0 and got[2].max_deg == 2


def test_core_profile_hub_without_depth(spark):
    # pure star: one shell, hub's degree without depth shows as max_deg >> core
    g = graph_from_edges(spark, [(0, i) for i in range(1, 6)])
    rows = core_profile(g).collect()
    assert len(rows) == 1 and rows[0].core == 1
    assert rows[0].max_deg == 5 and rows[0].n_vertices == 6


# ------------------------------------------------------------ term_burstiness
def _docs(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_term_burstiness_hand_counts(spark):
    docs = [
        (0, "spam spam spam eggs"),
        (1, "spam eggs"),
        (2, "eggs"),
    ]
    got = {r.term: r for r in term_burstiness(_docs(spark, docs), top_n=10).collect()}
    assert got["eggs"].df == 3 and got["eggs"].cf == 3
    assert got["eggs"].burstiness == 1.0
    assert got["spam"].df == 2 and got["spam"].cf == 4
    assert got["spam"].burstiness == 2.0
    assert got["spam"].df_frac == pytest.approx(2 / 3, abs=1e-6)


def test_term_burstiness_topn_tiebreak(spark):
    # df ties broken by term ascending: with top_n=2, "a" and "b" survive
    docs = [(0, "a b c"), (1, "a b c")]
    got = term_burstiness(_docs(spark, docs), top_n=2).collect()
    assert sorted(r.term for r in got) == ["a", "b"]


def test_term_burstiness_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        term_burstiness(_docs(spark, [(0, "x")]), top_n=0)


# ------------------------------------------------------------ hourly_autocorr
def _ev(spark, hour_counts):
    t0 = datetime.datetime(2026, 1, 1)
    rows, i = [], 0
    for h, c in enumerate(hour_counts):
        for _ in range(c):
            rows.append(
                (i, t0 + datetime.timedelta(hours=h, minutes=1), 1, "view", 0.0)
            )
            i += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_hourly_autocorr_alternating(spark):
    # counts 1,2,1,2 — perfect anti-correlation at lag 1, perfect at lag 2
    r = hourly_autocorr(_ev(spark, [1, 2, 1, 2]), lags=(1, 2)).collect()[0]
    assert r.n_hours == 4
    assert r.acf1 == pytest.approx(-1.0)
    assert r.acf2 == pytest.approx(1.0)


def test_hourly_autocorr_missing_hour_is_zero(spark):
    # events only in hours 0 and 2 — the dense series is [1, 0, 1]
    r = hourly_autocorr(_ev(spark, [1, 0, 1]), lags=(1,)).collect()[0]
    assert r.n_hours == 3
    assert r.acf1 == pytest.approx(-1.0)  # pairs (1,0),(0,1)


def test_hourly_autocorr_degenerate_null(spark):
    # constant series: zero variance -> NULL; lag beyond span -> NULL
    r = hourly_autocorr(_ev(spark, [2, 2, 2]), lags=(1, 5)).collect()[0]
    assert r.acf1 is None and r.acf5 is None


def test_hourly_autocorr_rejects_bad_lag(spark):
    with pytest.raises(ValueError):
        hourly_autocorr(_ev(spark, [1]), lags=(0,))
