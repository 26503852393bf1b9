"""Wave-36 operators: discrete conversion hazard, pairwise source JSD,
RFM tercile segmentation."""

import datetime
import math

import pytest

from linkgraph_spark.functions.events import conversion_hazard, rfm_segments
from linkgraph_spark.functions.text import source_term_divergence


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _ts(sec):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec)


# ----------------------------------------------------------- conversion_hazard
def test_conversion_hazard_hand(spark):
    D = 86400
    rows = [
        # u1: view@0, purchase@0.5d  -> day 0
        (0, _ts(0), 1, "view", 0.0),
        (1, _ts(D // 2), 1, "purchase", 1.0),
        # u2: view@0, purchase@1.5d  -> day 1
        (2, _ts(0), 2, "view", 0.0),
        (3, _ts(D + D // 2), 2, "purchase", 1.0),
        # u3: view@0, never converts
        (4, _ts(0), 3, "view", 0.0),
        # u4: purchase BEFORE first view: not a conversion
        (5, _ts(100), 4, "purchase", 1.0),
        (6, _ts(200), 4, "view", 0.0),
    ]
    got = {r.day: r for r in conversion_hazard(_ev(spark, rows)).collect()}
    assert set(got) == {0, 1}
    # 4 users at risk on day 0, 1 converts; 3 left, 1 converts day 1
    assert got[0].n_at_risk == 4 and got[0].n_converted == 1
    assert got[0].hazard == 0.25 and got[0].survival == 0.75
    assert got[1].n_at_risk == 3 and got[1].hazard == pytest.approx(round(1 / 3, 6))
    assert got[1].survival == 0.5


def test_conversion_hazard_rejects_bad_bucket(spark):
    with pytest.raises(ValueError):
        conversion_hazard(_ev(spark, [(0, _ts(0), 1, "view", 0.0)]), bucket_sec=0)


# ------------------------------------------------------- source_term_divergence
def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_source_jsd_identical_and_disjoint(spark):
    docs = [
        (0, "a b", "en", "s1", 3),
        (1, "a b", "en", "s2", 3),   # identical distribution to s1
        (2, "c d", "en", "s3", 3),   # disjoint from both
    ]
    got = {
        (r.source_a, r.source_b): r
        for r in source_term_divergence(_docs(spark, docs)).collect()
    }
    assert got[("s1", "s2")].jsd_bits == 0.0
    assert got[("s1", "s2")].n_shared_terms == 2
    assert got[("s1", "s3")].jsd_bits == 1.0
    assert got[("s1", "s3")].n_shared_terms == 0


def test_source_jsd_partial_overlap(spark):
    # s1 = {a:1}, s2 = {a:.5, b:.5}: JSD = 0.5·ln(4/3)/ln2 + 0.25·log2(2) ...
    docs = [(0, "a", "en", "s1", 1), (1, "a b", "en", "s2", 3)]
    r = source_term_divergence(_docs(spark, docs)).collect()[0]
    pa, pb = 1.0, 0.5
    shared = 0.5 * pa * math.log(2 * pa / (pa + pb)) + 0.5 * pb * math.log(
        2 * pb / (pa + pb)
    )
    expect = (shared + 0.5 * math.log(2) * (1 - pa + 1 - pb)) / math.log(2)
    assert r.jsd_bits == pytest.approx(round(expect, 6), abs=2e-6)


# ----------------------------------------------------------------- rfm_segments
def test_rfm_segments_partition_users(spark):
    D = 86400
    rows = []
    eid = 0
    # 3 users with clearly separated R, F, M profiles
    for u, (last_day, n_ev, val) in enumerate(
        [(0, 9, 100.0), (5, 3, 10.0), (10, 1, 1.0)], start=1
    ):
        for i in range(n_ev):
            rows.append((eid, _ts(last_day * D - i), u, "view", val))
            eid += 1
    got = rfm_segments(_ev(spark, rows)).collect()
    assert sum(r.n_users for r in got) == 3
    cells = {(r.r, r.f, r.m) for r in got}
    # user 1: most recent? last event day 0 of 10 → recency 10d → r=3;
    # highest freq and monetary → f=3, m=3
    assert (3, 3, 3) in cells
    # user 3: last at day 10 → recency 0 → r=1, lowest f/m → (1,1,1)
    assert (1, 1, 1) in cells
