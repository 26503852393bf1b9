"""Wave-65 operators: typed JSON extraction, unpivot densification,
prefix-blocked fuzzy pairs."""

import datetime as dt

from pyspark.sql import functions as F

from linkgraph_spark.functions.dedup import fuzzy_text_pairs
from linkgraph_spark.functions.events import (
    EVENT_TYPES,
    event_counts_long,
    json_props_stats,
)

SF = "/root/testdata/sf0.001"


def test_json_malformed_rows_are_null_not_errors(spark):
    d = dt.datetime
    events = spark.createDataFrame(
        [(1, d(2024, 1, 1), 1, "click", 0.0, '{"k": 5}'),
         (2, d(2024, 1, 1), 1, "click", 0.0, '{"k": 7}'),
         (3, d(2024, 1, 1), 1, "click", 0.0, "not json at all"),
         (4, d(2024, 1, 1), 1, "click", 0.0, '{"other": 1}'),
         (5, d(2024, 1, 1), 1, "click", 0.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = json_props_stats(events).collect()[0]
    assert r.n_events == 5 and r.n_with_k == 2
    assert r.min_k == 5 and r.max_k == 7 and r.avg_k == 6.0


def test_json_stats_counts_reconcile(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    rows = json_props_stats(events).collect()
    assert sum(r.n_events for r in rows) == events.count()
    for r in rows:
        assert 0 <= r.n_with_k <= r.n_events
        if r.n_with_k:
            assert r.min_k <= r.avg_k <= r.max_k


def test_event_counts_long_densifies(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    rows = event_counts_long(events).collect()
    dows = {r.dow for r in rows}
    # a full grid: every observed dow x every type, zeros included
    assert len(rows) == len(dows) * len(EVENT_TYPES)
    assert {r.event_type for r in rows} == set(EVENT_TYPES)
    assert sum(r.n for r in rows) == events.count()
    # melt of a type absent from the data yields explicit zero rows
    odd = event_counts_long(events, types=("click", "no_such"))
    zero = [r for r in odd.collect() if r.event_type == "no_such"]
    assert zero and all(r.n == 0 for r in zero)


def test_fuzzy_pairs_hand_case_blocking_and_cap(spark):
    docs = spark.createDataFrame(
        [(1, "prefix__ hello world", "en", "s", 20),
         (2, "prefix__ hello worlt", "en", "s", 20),   # dist 1: pair (1,2)
         (3, "prefix__ goodbye all", "en", "s", 20),   # too far from 1,2
         (4, "differnt opening txt", "en", "s", 20),   # other block
         (5, "prefix__ hello world", "fr", "s", 20)],  # other lang
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {(r.doc_id_a, r.doc_id_b): r.edit_dist
           for r in fuzzy_text_pairs(docs, max_dist=4).collect()}
    assert (1, 2) in got and got[(1, 2)] == 1
    assert all(a < b for a, b in got)
    assert not any(5 in p for p in got)        # lang blocks
    assert not any(4 in p for p in got)        # prefix blocks
    # a block over the cap is dropped whole
    assert fuzzy_text_pairs(docs, block_cap=1).count() == 0


def test_fuzzy_pairs_symmetric_bound(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = fuzzy_text_pairs(docs).collect()
    assert all(0 <= r.edit_dist <= 4 and r.doc_id_a < r.doc_id_b for r in rows)
    # loosening the distance can only add pairs
    loose = fuzzy_text_pairs(docs, max_dist=10).count()
    assert loose >= len(rows)
    # dist 0 pairs really are identical on the signature prefix
    ids = {r.doc_id_a for r in rows if r.edit_dist == 0} | {
        r.doc_id_b for r in rows if r.edit_dist == 0
    }
    if ids:
        sigs = (
            docs.where(F.col("doc_id").isin(list(ids)))
            .select(F.substring("text", 1, 32).alias("s"))
            .distinct()
            .count()
        )
        assert sigs < len(ids) + 1
