"""Wave-50 operators: preferential-attachment curve, embedding triplet
accuracy, active-days histogram."""

import datetime

import pytest

from linkgraph_spark.edges import build_graph
from linkgraph_spark.functions.events import active_days_hist
from linkgraph_spark.functions.similarity import triplet_accuracy
from linkgraph_spark.kernels.temporal import pref_attach_test


def _transcripts(spark, rows):
    data = [
        (c, i, r, f"{c}:{i}", tool, datetime.datetime.utcfromtimestamp(ts))
        for (c, i, r, tool, ts) in rows
    ]
    return spark.createDataFrame(
        data,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


# ------------------------------------------------------------- pref_attach_test
def test_pref_attach_test_hand(spark):
    # early (≤ split 5000): (u,a)@1000, (a,s)@2000 → degrees u:1, a:2, s:1.
    # later: (s,u)@9000 attaches to both endpoints → deg-1 bucket gets 2
    # attachments over 2 vertices (rate 1.0); deg-2 bucket (a) gets none.
    t = _transcripts(
        spark,
        [
            ("c1", 0, "u", None, 500),
            ("c1", 1, "a", None, 1000),
            ("c1", 2, "s", None, 2000),
            ("c1", 3, "u", None, 9000),
        ],
    )
    g = build_graph(t)
    got = {r.deg: r for r in pref_attach_test(g, t).collect()}
    assert got[1].n_vertices == 2 and got[1].n_new_attach == 2
    assert got[1].rate == pytest.approx(1.0)
    assert got[2].n_vertices == 1 and got[2].n_new_attach == 0
    assert got[2].rate == pytest.approx(0.0)


def test_pref_attach_test_no_later_edges(spark):
    # everything early → every bucket reports zero attachments
    t = _transcripts(
        spark,
        [
            ("c1", 0, "u", None, 1000),
            ("c1", 1, "a", None, 1000),
            ("c1", 2, "u", None, 1000),
        ],
    )
    g = build_graph(t)
    rows = pref_attach_test(g, t).collect()
    assert rows and all(r.n_new_attach == 0 and r.rate == 0.0 for r in rows)


# ------------------------------------------------------------- triplet_accuracy
def test_triplet_accuracy_separable(spark):
    # two tight clusters; one bucket so every anchor has a pos and a neg →
    # 4 triplets, all ranked correctly
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 1),
            (3, [0.1, 0.9], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    r = triplet_accuracy(embs, n_buckets=1).collect()[0]
    assert r.n_triplets == 4
    assert r.n_correct == 4
    assert r.accuracy == pytest.approx(1.0)


def test_triplet_accuracy_skips_lonely_labels(spark):
    # label 2 has a single vector: no positive exists → not evaluated
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 1),
            (3, [0.1, 0.9], 1),
            (4, [-1.0, 0.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    r = triplet_accuracy(embs, n_buckets=1).collect()[0]
    assert r.n_triplets == 4


# ------------------------------------------------------------- active_days_hist
def test_active_days_hist_hand(spark):
    d = 86400
    mk = lambda i, u, day: (  # noqa: E731
        i,
        datetime.datetime.utcfromtimestamp(day * d + 50),
        u,
        "view",
        0.0,
    )
    ev = spark.createDataFrame(
        [
            mk(0, 1, 0), mk(1, 1, 0),          # user 1: 1 day (dup collapses)
            mk(2, 2, 0), mk(3, 2, 1), mk(4, 2, 5),  # user 2: 3 days
            mk(5, 3, 2),                        # user 3: 1 day
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {r.n_active_days: r for r in active_days_hist(ev).collect()}
    assert got[1].n_users == 2 and got[3].n_users == 1
    assert got[1].share == pytest.approx(round(2 / 3, 6))
    assert got[3].share == pytest.approx(round(1 / 3, 6))
