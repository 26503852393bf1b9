"""Wave-79 operators: sweep-line peak concurrency, A-priori frequent
pairs, CDF-inversion negative sampling."""

import datetime as dt

from pyspark.sql import functions as F

from linkgraph_spark.functions.events import peak_concurrency
from linkgraph_spark.functions.relational import frequent_pairs_apriori
from linkgraph_spark.functions.text import negative_samples

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _ev(spark, rows):
    """rows: (event_id, ts, user_id)."""
    return spark.createDataFrame(
        [(i, t, u, "e", 1.0, None) for (i, t, u) in rows], _EV_SCHEMA
    )


def test_peak_concurrency_counts_closed_interval_overlap(spark):
    d = dt.datetime
    events = _ev(
        spark,
        [
            # u1 session: 10:00-10:10; u2 session: 10:10-10:20 — a session
            # ending at t still overlaps one starting at t (closed ends)
            (1, d(2024, 1, 1, 10, 0), 1),
            (2, d(2024, 1, 1, 10, 10), 1),
            (3, d(2024, 1, 1, 10, 10), 2),
            (4, d(2024, 1, 1, 10, 20), 2),
            # u3 far away, alone
            (5, d(2024, 1, 2, 9, 0), 3),
        ],
    )
    row = peak_concurrency(events).collect()[0]
    assert row.peak_sessions == 2
    # earliest instant reaching the peak: 10:10 on Jan 1
    assert row.at_ts == int(dt.datetime(2024, 1, 1, 10, 10).timestamp())


def test_peak_concurrency_gap_splits_sessions(spark):
    d = dt.datetime
    # one user, two sessions an hour apart: never concurrent with itself
    events = _ev(
        spark,
        [(1, d(2024, 1, 1, 10), 1), (2, d(2024, 1, 1, 12), 1)],
    )
    assert peak_concurrency(events).collect()[0].peak_sessions == 1


def test_apriori_pruning_preserves_the_unpruned_answer(spark):
    li = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
         for (o, p) in [
             # brands A,B co-occur in 3 orders; C appears once (infrequent)
             (1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (3, 30),
         ]],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(10, "A"), (20, "B"), (30, "C")], "p_partkey long, p_brand string"
    )
    got = frequent_pairs_apriori(li, part, min_support=3).collect()
    assert [(r.brand_a, r.brand_b, r.n_ab) for r in got] == [("A", "B", 3)]


def test_apriori_prunes_before_the_self_join(spark):
    # the pair-join input must be the support-filtered baskets: assert a
    # left-semi join sits in the plan
    li = spark.createDataFrame(
        [(1, 10, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    part = spark.createDataFrame([(10, "A")], "p_partkey long, p_brand string")
    plan = (
        frequent_pairs_apriori(li, part)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan


def test_negative_samples_deterministic_and_from_vocabulary(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa bb")], "doc_id long, text string"
    )
    out1 = negative_samples(docs, k=2).collect()
    out2 = negative_samples(docs, k=2).collect()
    assert out1 == out2  # hash-deterministic, no RNG
    vocab = {"aa", "bb", "cc"}
    assert all(r.neg_term in vocab for r in out1)
    # exactly k draws per (doc, pos): 6 tokens * 2 draws
    assert len(out1) == 12
    assert {(r.doc_id, r.pos, r.draw) for r in out1} == {
        (d, p, i)
        for (d, plen) in [(1, 4), (2, 2)]
        for p in range(plen)
        for i in range(2)
    }


def test_negative_samples_follow_powered_distribution_bands(spark):
    # one dominant token: its cdf band ~ (8^0.75)/(8^0.75+1) ≈ 0.826 —
    # most draws should be 'aa' but 'zz' must remain reachable
    docs = spark.createDataFrame(
        [(1, "aa aa aa aa aa aa aa aa zz")], "doc_id long, text string"
    )
    out = negative_samples(docs, k=3).collect()
    terms = [r.neg_term for r in out]
    assert terms.count("aa") > terms.count("zz") > 0
