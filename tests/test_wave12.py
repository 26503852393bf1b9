"""Wave-12 operators: LSH recall@k evaluation, time-to-convert latency,
quality retention curve, degree power-law fit. (The wave's GIF decode is
covered in test_multimodal.py; streaming dedup in test_streaming.py.)"""

from datetime import datetime, timezone

from linkgraph_spark.edges import graph_from_edges


# --------------------------------------------------------------- lsh recall
def test_lsh_recall_colinear_vectors(spark):
    from linkgraph_spark.functions.similarity import lsh_recall

    # all vectors share one direction -> one LSH bucket -> perfect recall
    rows = [(i, [float(i + 1), 2.0 * (i + 1)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = lsh_recall(df, n_queries=4, k=3).collect()
    assert len(got) == 4
    for r in got:
        assert r["n_exact"] == 3
        assert r["recall"] == 1.0


def test_lsh_recall_bounded(spark):
    from linkgraph_spark.functions.similarity import lsh_recall

    # antipodal clusters land in different buckets; recall stays in [0, 1]
    rows = [(i, [1.0 + i * 0.01, 1.0]) for i in range(10)] + [
        (10 + i, [-1.0 - i * 0.01, -1.0]) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for r in lsh_recall(df, n_queries=5, k=4).collect():
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hits"] <= r["n_exact"]


# ---------------------------------------------------------- time to convert
def test_time_to_convert_latencies(spark):
    from linkgraph_spark.functions.events import time_to_convert

    rows = [
        (1, 1, "signup", 0),
        (2, 1, "purchase", 100),     # u1: lat 100
        (3, 2, "purchase", 30),      # before signup: ignored
        (4, 2, "signup", 50),
        (5, 2, "purchase", 250),     # u2: lat 200
        (6, 3, "purchase", 10),      # no signup: excluded
        (7, 4, "signup", 10),        # never converts: excluded
    ]
    df = spark.createDataFrame(
        [
            (eid, uid, et, datetime.fromtimestamp(ts, tz=timezone.utc))
            for eid, uid, et, ts in rows
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {r["stat"]: r["value"] for r in time_to_convert(df).collect()}
    assert got["n_converted"] == 2.0
    assert got["mean_sec"] == 150.0
    assert got["p50_sec"] == 150.0  # interpolated median of {100, 200}
    assert got["max_sec"] == 200.0


# ------------------------------------------------------------ quality curve
def test_quality_curve_matches_scores(spark):
    from linkgraph_spark.functions.text import quality_curve, quality_score

    texts = [
        "the quick brown fox jumps over the lazy dog and runs on",
        "a b",  # too short
        "the and is of to in it " * 4,
        "!!!! ???? ;;;; @@@@ #### $$$$",  # punctuation soup
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    scores = [r["quality"] for r in quality_score(docs).collect()]
    got = {r["threshold"]: r.asDict() for r in quality_curve(docs).collect()}
    assert set(got) == {0.25, 0.5, 0.75, 1.0}
    prev = None
    for t in (0.25, 0.5, 0.75, 1.0):
        want_n = sum(1 for s in scores if s >= t)
        assert got[t]["n_retained"] == want_n
        assert got[t]["frac_retained"] == round(want_n / len(scores), 6)
        if prev is not None:
            assert got[t]["n_retained"] <= prev  # monotone curve
        prev = got[t]["n_retained"]


# ---------------------------------------------------------- degree powerlaw
def test_degree_powerlaw_exact_fit(spark):
    from linkgraph_spark.kernels.stats import degree_powerlaw

    # out-degree histogram: 8 vertices deg 1, 4 deg 2, 2 deg 4 — an exact
    # alpha=1 power law (cnt = 8/deg), so the fit is alpha=1, r2=1
    edges, tgt = [], 1000
    src = 0
    for deg, n in ((1, 8), (2, 4), (4, 2)):
        for _ in range(n):
            for _ in range(deg):
                edges.append((src, tgt))
                tgt += 1
            src += 1
    g = graph_from_edges(spark, edges)
    got = {r["metric"]: r.asDict() for r in degree_powerlaw(g).collect()}
    assert got["out"]["alpha"] == 1.0
    assert got["out"]["r2"] == 1.0
    assert got["out"]["n_points"] == 3
    # in-degrees are all 1 (every target hit once): zero x-variance -> 0
    assert got["in"]["alpha"] == 0.0 and got["in"]["r2"] == 0.0
    g.unpersist()
