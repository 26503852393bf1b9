"""Wave-9 operators: shingle novelty, inter-event time percentiles, label
centroid distances, tool bigrams."""

import math
from datetime import datetime, timezone


# ------------------------------------------------------------ shingle novelty
def test_shingle_novelty_duplicate_vs_unique(spark):
    from linkgraph_spark.functions.dedup import shingle_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # shares all shingles with doc 2
            (2, "a b c d e"),
            (3, "p q r s t"),        # fully unique
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["novel_frac"])
        for r in shingle_novelty(docs).collect()
    }
    assert got[1] == (3, 0.0) and got[2] == (3, 0.0)
    assert got[3] == (3, 1.0)


def test_shingle_novelty_partial(spark):
    from linkgraph_spark.functions.dedup import shingle_novelty

    # doc 1: shingles {abc, bcd}; doc 2 shares {abc} only
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["novel_frac"])
        for r in shingle_novelty(docs).collect()
    }
    assert got[1] == (2, 0.5)
    assert got[2] == (2, 0.5)


# --------------------------------------------------------- inter-event times
def test_inter_event_times_same_type_gaps_only(spark):
    from linkgraph_spark.functions.events import inter_event_times

    rows = [
        (1, 1, "a", 100),
        (2, 1, "b", 105),   # different type: not a gap for 'a'
        (3, 1, "a", 130),   # a-gap = 30
        (4, 1, "a", 190),   # a-gap = 60
        (5, 2, "a", 1000),  # other user: no cross-user gap
    ]
    df = spark.createDataFrame(
        [
            (eid, uid, et, datetime.fromtimestamp(ts, tz=timezone.utc))
            for eid, uid, et, ts in rows
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {r["event_type"]: r.asDict() for r in inter_event_times(df).collect()}
    a = got["a"]
    assert a["n_gaps"] == 2
    assert a["p50_gap"] == 45.0  # interpolated median of {30, 60}
    assert "b" not in got  # single b event → no gap


# ----------------------------------------------------- label centroid dists
def test_label_centroid_dists_known_geometry(spark):
    from linkgraph_spark.functions.similarity import label_centroid_dists

    rows = (
        [(i, [0.0, 0.0], 0) for i in range(4)]
        + [(10 + i, [3.0, 4.0], 1) for i in range(4)]
        + [(20 + i, [0.0, 8.0], 2) for i in range(2)]
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["label_a"], r["label_b"]): r["dist"]
        for r in label_centroid_dists(df).collect()
    }
    assert got[(0, 1)] == 5.0
    assert got[(0, 2)] == 8.0
    assert got[(1, 2)] == 5.0
    assert len(got) == 3


# ---------------------------------------------------------------- tool bigrams
def test_tool_bigrams_skip_toolless_turns(spark):
    from linkgraph_spark.transcripts import tool_bigrams

    t = spark.createDataFrame(
        [
            ("c1", 0, "assistant", "x", "search"),
            ("c1", 1, "user", "y", None),          # skipped
            ("c1", 2, "assistant", "z", "calc"),   # search→calc
            ("c1", 3, "assistant", "w", "calc"),   # calc→calc
            ("c2", 0, "assistant", "v", "exec"),   # lone tool, no bigram
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    got = {
        (r["tool_a"], r["tool_b"]): (r["n"], r["frac"])
        for r in tool_bigrams(t).collect()
    }
    assert got[("search", "calc")] == (1, 0.5)
    assert got[("calc", "calc")] == (1, 0.5)
    assert len(got) == 2
