"""Wave-11 operators: local bridges, per-user session stats, first-touch
attribution, PII counts, embedding norm profile, product-quantization
codes, cross-source shingle overlap."""

from datetime import datetime, timezone

from linkgraph_spark.edges import graph_from_edges


# ----------------------------------------------------------- local bridges
def test_local_bridges_pendant_edge(spark):
    from linkgraph_spark.kernels.truss import local_bridges

    # triangle 0-1-2 (support 1 each) + pendant 2-3 (support 0 = bridge)
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    got = [tuple(r) for r in local_bridges(g).collect()]
    assert got == [(2, 3, 3, 1)]
    g.unpersist()


def test_local_bridges_none_in_clique(spark):
    from linkgraph_spark.kernels.truss import local_bridges

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    g = graph_from_edges(spark, k4)
    assert local_bridges(g).count() == 0
    g.unpersist()


# ----------------------------------------------------------- session stats
def test_session_stats_bounce_and_means(spark):
    from linkgraph_spark.functions.events import session_stats

    def ev(eid, ts_s):
        return (eid, 1, "x", datetime.fromtimestamp(ts_s, tz=timezone.utc))

    df = spark.createDataFrame(
        [ev(1, 0), ev(2, 10), ev(3, 10000)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = session_stats(df, gap_sec=1800).collect()[0]
    assert got["n_sessions"] == 2 and got["n_events"] == 3
    assert got["avg_session_events"] == 1.5
    assert got["avg_duration_sec"] == 5.0  # (10 + 0) / 2
    assert got["bounce_rate"] == 0.5


# ------------------------------------------------------------- attribution
def test_attribution_first_touch(spark):
    from linkgraph_spark.functions.events import attribution

    rows = [
        (1, 1, "click", 0),
        (2, 1, "purchase", 10),
        (3, 2, "click", 0),
        (4, 2, "view", 5),
        (5, 3, "view", 0),
    ]
    df = spark.createDataFrame(
        [
            (eid, uid, et, datetime.fromtimestamp(ts, tz=timezone.utc))
            for eid, uid, et, ts in rows
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {r["first_touch"]: r.asDict() for r in attribution(df).collect()}
    assert (got["click"]["n_users"], got["click"]["n_converted"]) == (2, 1)
    assert got["click"]["conversion_rate"] == 0.5
    assert (got["view"]["n_users"], got["view"]["n_converted"]) == (1, 0)


# -------------------------------------------------------------- PII counts
def test_pii_counts_sequential_semantics(spark):
    from linkgraph_spark.functions.text import pii_counts

    docs = spark.createDataFrame(
        [
            (0, "mail a@b.com ip 10.0.0.1 call +1 (555) 123-4567"),
            (1, "just an ip 192.168.1.100 here"),  # must NOT count as phone
            (2, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in pii_counts(docs).collect()}
    assert (got[0]["n_email"], got[0]["n_ip"], got[0]["n_phone"]) == (1, 1, 1)
    assert got[0]["has_pii"] is True
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (0, 1, 0)
    assert (got[2]["n_email"], got[2]["n_ip"], got[2]["n_phone"]) == (0, 0, 0)
    assert got[2]["has_pii"] is False


# --------------------------------------------------------- embedding stats
def test_embedding_stats_known_norms(spark):
    from linkgraph_spark.functions.similarity import embedding_stats

    rows = [(0, [0.0, 0.0]), (1, [3.0, 0.0]), (2, [0.0, 4.0]), (3, [3.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["stat"]: r["value"] for r in embedding_stats(df).collect()}
    assert got["n_vecs"] == 4.0 and got["n_dims"] == 2.0
    assert got["zero_vecs"] == 1.0
    assert got["norm_mean"] == 3.0  # (0 + 3 + 4 + 5) / 4
    assert got["norm_p50"] == 3.5
    assert got["norm_max"] == 5.0


# ----------------------------------------------------------------- PQ codes
def test_pq_codes_separable_halves(spark):
    from linkgraph_spark.kernels.kmeans import pq_codes

    # width-1 subvectors; init centroids = vec_id 0/1 slices
    rows = [
        (0, [0.0, 10.0]),
        (1, [10.0, 0.0]),
        (2, [0.1, 9.9]),   # near vec 0 in both halves
        (3, [9.9, 0.1]),   # near vec 1 in both halves
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_codes(df, subvectors=2, k=2, iterations=1).collect()
    }
    assert got[(2, 0)] == got[(0, 0)] and got[(2, 1)] == got[(0, 1)]
    assert got[(3, 0)] == got[(1, 0)] and got[(3, 1)] == got[(1, 1)]
    assert got[(0, 0)] != got[(1, 0)]


def test_pq_codes_rejects_ragged_dims(spark):
    from linkgraph_spark.kernels.kmeans import pq_codes

    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>")
    try:
        pq_codes(df, subvectors=2)
        assert False, "odd dims must raise"
    except ValueError:
        pass


# ------------------------------------------------------------ source overlap
def test_source_overlap_partial_and_disjoint(spark):
    from linkgraph_spark.functions.dedup import source_overlap

    docs = spark.createDataFrame(
        [
            (0, "a b c d", "A"),   # shingles {abc, bcd}
            (1, "a b c x", "B"),   # shares {abc} with A
            (2, "p q r s", "C"),   # disjoint
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_x"], r["source_y"]): (r["n_shared"], r["frac_x"])
        for r in source_overlap(docs).collect()
    }
    assert got[("A", "B")] == (1, 0.5)
    assert got[("B", "A")] == (1, 0.5)
    assert ("A", "C") not in got and ("C", "A") not in got
