"""Wave-81 operators: exponential time-decay engagement, KWIC
concordance."""

import datetime as dt

from linkgraph_spark.functions.events import decayed_engagement
from linkgraph_spark.functions.text import kwic

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_decayed_engagement_halves_per_half_life(spark):
    d = dt.datetime
    rows = [
        # user 1: 10.0 exactly one half-life (7 days) before as_of -> 5.0
        (1, d(2024, 1, 24), 1, "e", 10.0, None),
        # user 2: 10.0 at as_of -> 10.0 (weight 1)
        (2, d(2024, 1, 31), 2, "e", 10.0, None),
        # user 3: two events, 14 days back (quarter weight) + at as_of
        (3, d(2024, 1, 17), 3, "e", 8.0, None),
        (4, d(2024, 1, 31), 3, "e", 1.0, None),
    ]
    out = decayed_engagement(
        spark.createDataFrame(rows, _EV_SCHEMA), half_life_days=7.0
    ).collect()
    got = [(r.user_id, r.score) for r in out]
    # sorted by score desc: u2 10.0, u1 5.0, u3 8*0.25 + 1 = 3.0
    assert got == [(2, 10.0), (1, 5.0), (3, 3.0)]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_kwic_window_clamps_at_document_edges(spark):
    docs = _docs(spark, ["table at the start", "ends with the table"])
    rows = kwic(docs, "table", window=2).collect()
    got = [(r.doc_id, r.pos, r.left_ctx, r.right_ctx) for r in rows]
    assert got == [
        (0, 0, "", "at the"),       # no left context at the head
        (1, 3, "with the", ""),     # no right context at the tail
    ]


def test_kwic_counts_every_occurrence_and_case_folds(spark):
    docs = _docs(spark, ["Table a Table b"])
    rows = kwic(docs, "TABLE", window=1).collect()
    assert [(r.pos, r.left_ctx, r.right_ctx) for r in rows] == [
        (0, "", "a"),
        (2, "a", "b"),
    ]
