"""Wave-7 operators: random-failure resilience, char entropy, Zipf slope,
user activity features, Markov-scored sessions, embedding outliers."""

import math
from datetime import datetime, timezone

import pytest

from linkgraph_spark.edges import graph_from_edges
from tests.fixtures_graphs import web64


def _mk_events(spark, rows):
    """rows: (event_id, user_id, event_type, epoch_sec, value)."""
    data = [
        (eid, uid, et, datetime.fromtimestamp(ts, tz=timezone.utc), val)
        for eid, uid, et, ts, val in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )


# -------------------------------------------------- random failure resilience
def test_random_failure_zero_rate_is_intact_graph(spark):
    from linkgraph_spark.kernels.components import random_failure_resilience

    edges = web64(32, 3)
    g = graph_from_edges(spark, edges)
    row = random_failure_resilience(g, rate=0.0).collect()[0]
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    assert row["n_removed"] == 0
    assert row["n_vertices_left"] == g.num_vertices
    assert row["n_edges_left"] == len(und)


def test_random_failure_full_rate_removes_everything(spark):
    from linkgraph_spark.kernels.components import random_failure_resilience

    g = graph_from_edges(spark, web64(24, 3))
    row = random_failure_resilience(g, rate=1.0).collect()[0]
    assert row["n_vertices_left"] == 0
    assert row["n_edges_left"] == 0
    assert row["n_components"] == 0
    assert row["largest_component"] is None  # max over empty label set


def test_random_failure_deterministic_and_salted(spark):
    from linkgraph_spark.kernels.components import random_failure_resilience

    g = graph_from_edges(spark, web64(48, 3))
    a = random_failure_resilience(g, rate=0.3, salt="s1").collect()[0]
    b = random_failure_resilience(g, rate=0.3, salt="s1").collect()[0]
    assert a.asDict() == b.asDict()
    with pytest.raises(ValueError):
        random_failure_resilience(g, rate=1.5)


# -------------------------------------------------------------- char entropy
def test_char_entropy_known_values(spark):
    from linkgraph_spark.functions.text import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),          # zero entropy
            (2, "abab"),          # ln 2
            (3, "abcd"),          # ln 4
            (4, None),            # NULL → 0 chars
            (5, ""),              # empty → 0 chars
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chars_used"], r["distinct_chars"], r["entropy"])
        for r in char_entropy(docs).collect()
    }
    assert got[1] == (4, 1, 0.0)
    assert got[2] == (4, 2, round(math.log(2), 6))
    assert got[3] == (4, 4, round(math.log(4), 6))
    assert got[4] == (0, 0, 0.0)
    assert got[5] == (0, 0, 0.0)


# ---------------------------------------------------------------- zipf slope
def test_zipf_slope_exact_two_point(spark):
    from linkgraph_spark.functions.text import zipf_slope

    # vocabulary: "a" ×4, "b" ×2 → points (ln1, ln4), (ln2, ln2);
    # slope = (ln2-ln4)/(ln2-ln1) = -1 exactly
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a a b")], "doc_id long, text string"
    )
    row = zipf_slope(docs).collect()[0]
    assert row["n_terms"] == 2
    assert abs(row["zipf_slope"] - (-1.0)) < 1e-6


def test_zipf_slope_top_n_caps_vocabulary(spark):
    from linkgraph_spark.functions.text import zipf_slope

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(20)],
        "doc_id long, text string",
    )
    row = zipf_slope(docs, top_n=5).collect()[0]
    assert row["n_terms"] == 5


# -------------------------------------------------------------- user features
def test_user_features_values(spark):
    from linkgraph_spark.functions.events import user_features

    day = 86400
    rows = [
        (1, 1, "a", 0 * day + 10, 1.5),
        (2, 1, "b", 0 * day + 20, 2.5),
        (3, 1, "b", 2 * day, 1.0),
        (4, 2, "a", 5 * day, 4.0),   # dataset max ts
    ]
    got = {
        r["user_id"]: r.asDict()
        for r in user_features(_mk_events(spark, rows)).collect()
    }
    u1 = got[1]
    assert u1["n_events"] == 3 and u1["n_active_days"] == 2
    assert u1["first_ts"] == 10 and u1["last_ts"] == 2 * day
    assert u1["recency_days"] == 3          # (5d − 2d) / 1d
    assert u1["total_value"] == 5.0
    assert u1["top_type"] == "b"            # 2 b's beat 1 a
    u2 = got[2]
    assert u2["recency_days"] == 0 and u2["top_type"] == "a"


def test_user_features_top_type_tie_breaks_asc(spark):
    from linkgraph_spark.functions.events import user_features

    rows = [(1, 7, "z", 100, 0.0), (2, 7, "a", 200, 0.0)]
    got = user_features(_mk_events(spark, rows)).collect()[0]
    assert got["top_type"] == "a"


# ----------------------------------------------------------- session LM score
def test_session_lm_score_uniform_model(spark):
    from linkgraph_spark.functions.events import session_lm_score

    # one user, transitions a->b, b->a, a->b: model P(b|a)=1, P(a|b)=1
    rows = [
        (1, 1, "a", 100, 0.0),
        (2, 1, "b", 110, 0.0),
        (3, 1, "a", 120, 0.0),
        (4, 1, "b", 130, 0.0),
    ]
    got = session_lm_score(_mk_events(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_trans"] == 3 and r["lm_score"] == 0.0  # ln 1 = 0


def test_session_lm_score_flags_rare_flow(spark):
    from linkgraph_spark.functions.events import session_lm_score

    # user 1 (twice) runs a->b; user 3 runs a->c once: P(b|a)=2/3, P(c|a)=1/3
    rows = [
        (1, 1, "a", 100, 0.0), (2, 1, "b", 110, 0.0),
        (3, 2, "a", 100, 0.0), (4, 2, "b", 110, 0.0),
        (5, 3, "a", 100, 0.0), (6, 3, "c", 110, 0.0),
    ]
    got = {
        r["user_id"]: r["lm_score"]
        for r in session_lm_score(_mk_events(spark, rows)).collect()
    }
    assert got[1] == got[2] == round(math.log(2 / 3), 6)
    assert got[3] == round(math.log(1 / 3), 6)
    assert got[3] < got[1]


def test_session_lm_score_breaks_at_gap(spark):
    from linkgraph_spark.functions.events import session_lm_score

    rows = [
        (1, 1, "a", 100, 0.0),
        (2, 1, "b", 110, 0.0),
        (3, 1, "c", 99999, 0.0),  # own session, no transition
    ]
    got = session_lm_score(_mk_events(spark, rows)).collect()
    assert len(got) == 1 and got[0]["session_idx"] == 0
    assert got[0]["n_trans"] == 1


# --------------------------------------------------------- embedding outliers
def test_embedding_outliers_flags_planted_outlier(spark):
    from linkgraph_spark.functions.similarity import embedding_outliers

    # label 0: 9 vectors near the origin + 1 far away
    rows = [(i, [0.0, float(i % 3) * 0.01], 0) for i in range(9)]
    rows.append((9, [100.0, 100.0], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["vec_id"]: r for r in embedding_outliers(df).collect()}
    assert got[9]["is_outlier"] and got[9]["z"] > 2.0
    assert sum(1 for r in got.values() if r["is_outlier"]) == 1


def test_embedding_outliers_degenerate_label_zero_spread(spark):
    from linkgraph_spark.functions.similarity import embedding_outliers

    df = spark.createDataFrame(
        [(i, [1.0, 2.0], 5) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    got = embedding_outliers(df).collect()
    assert all(r["z"] == 0.0 and not r["is_outlier"] for r in got)
    assert all(r["dist"] == 0.0 for r in got)
