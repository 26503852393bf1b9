"""Wave-83 operators: Poisson bootstrap CI, sorted-neighborhood ER."""

import datetime as dt

from linkgraph_spark.functions.dedup import sorted_neighborhood_pairs
from linkgraph_spark.functions.events import _poisson_cum, bootstrap_mean_ci

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_poisson_cum_matches_distribution():
    import math

    c = _poisson_cum()
    assert len(c) == 7
    assert abs(c[0] - math.exp(-1)) < 1e-15
    assert abs(c[1] - 2 * math.exp(-1)) < 1e-15
    assert c[-1] > 0.9999  # truncation tail ~8e-5
    assert c == sorted(c)


def test_bootstrap_ci_brackets_the_mean_and_is_deterministic(spark):
    d = dt.datetime(2024, 1, 5)
    rows = [
        (i, d, i % 10, "e", float(1 + (i * 7) % 13), None) for i in range(400)
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    out1 = bootstrap_mean_ci(df).collect()[0]
    out2 = bootstrap_mean_ci(df).collect()[0]
    assert out1 == out2  # hash-deterministic, no RNG
    assert out1.n_events == 400 and out1.n_replicates == 50
    assert out1.ci_lo < out1.mean < out1.ci_hi
    # a 400-row mean of values in [1, 13] has a tight CI
    assert out1.ci_hi - out1.ci_lo < 1.5


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_sorted_neighborhood_catches_mid_signature_divergence(spark):
    # these two differ at char 3 — an 8-char prefix equality block would
    # MISS them; sorted adjacency pairs them
    docs = _docs(
        spark,
        [
            "abcdef common tail here",
            "abzdef common tail here",
            "zz totally unrelated document",
        ],
    )
    rows = sorted_neighborhood_pairs(docs, window=3, max_dist=4).collect()
    assert [(r.doc_id_a, r.doc_id_b, r.edit_dist) for r in rows] == [(0, 1, 1)]


def test_sorted_neighborhood_window_limits_candidates(spark):
    # four near-identical docs in one block: window=2 pairs only sorted
    # neighbors (3 pairs), window=4 pairs all C(4,2)=6
    docs = _docs(spark, [f"aa doc {i}" for i in range(4)])
    assert sorted_neighborhood_pairs(docs, window=2, max_dist=10).count() == 3
    assert sorted_neighborhood_pairs(docs, window=4, max_dist=10).count() == 6


def test_sorted_neighborhood_never_crosses_block_boundary(spark):
    # identical signatures but different 2-char block prefixes: no pair
    docs = _docs(spark, ["aa same same same", "bb same same same"])
    assert sorted_neighborhood_pairs(docs, window=4, max_dist=50).count() == 0
