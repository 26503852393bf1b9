"""Wave-52 operators: cohort LTV triangle, LSH bucket balance audit,
per-source length drift."""

import datetime

import pytest

from linkgraph_spark.functions.events import cohort_value
from linkgraph_spark.functions.similarity import lsh_bucket_stats
from linkgraph_spark.functions.text import source_length_drift


# ----------------------------------------------------------------- cohort_value
def test_cohort_value_hand(spark):
    w = 604800
    base = 4 * w  # Thursday 1970-01-29 is NOT a week start; use Monday math
    # date_trunc('week') is Monday-start; epoch 0 is a Thursday, so pick
    # timestamps inside known weeks and read cohort keys back from rows.
    mk = lambda i, u, wk, v: (  # noqa: E731
        i,
        datetime.datetime.utcfromtimestamp(base + wk * w),
        u,
        "purchase",
        v,
    )
    ev = spark.createDataFrame(
        [
            mk(0, 1, 0, 10.0),
            mk(1, 1, 1, 20.0),
            mk(2, 2, 0, 5.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    rows = cohort_value(ev).collect()
    assert len(rows) == 2  # one cohort, offsets 0 and 1
    got = {r.week_offset: r for r in rows}
    assert got[0].total_value == pytest.approx(15.0)
    assert got[0].value_per_user == pytest.approx(7.5)
    assert got[0].cum_value_per_user == pytest.approx(7.5)
    assert got[1].total_value == pytest.approx(20.0)
    assert got[1].value_per_user == pytest.approx(10.0)
    assert got[1].cum_value_per_user == pytest.approx(17.5)
    assert got[0].cohort_week == got[1].cohort_week


# -------------------------------------------------------------- lsh_bucket_stats
def test_lsh_bucket_stats_identical_vectors(spark):
    embs = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    rows = lsh_bucket_stats(embs).collect()
    assert len(rows) == 1
    assert rows[0].bucket_size == 3 and rows[0].n_buckets == 1
    assert rows[0].share_of_vectors == pytest.approx(1.0)


def test_lsh_bucket_stats_partitions_universe(spark):
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = embs.count()
    rows = lsh_bucket_stats(embs).collect()
    assert sum(r.bucket_size * r.n_buckets for r in rows) == n
    assert sum(r.share_of_vectors for r in rows) == pytest.approx(1.0, abs=1e-4)
    # 6 planes → at most 64 occupied buckets
    assert sum(r.n_buckets for r in rows) <= 64


# ----------------------------------------------------------- source_length_drift
def test_source_length_drift_uniform_is_zero(spark):
    # every doc has 2 tokens → every decile equals the global → drift 0
    docs = spark.createDataFrame(
        [(0, "a b", "A"), (1, "c d", "A"), (2, "e f", "B")],
        "doc_id long, text string, source string",
    )
    rows = source_length_drift(docs).collect()
    assert {r.source for r in rows} == {"A", "B"}
    assert all(r.drift == pytest.approx(0.0) for r in rows)


def test_source_length_drift_detects_long_source(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b", "A"),
            (1, "a b", "A"),
            (2, " ".join(["w"] * 12), "B"),
            (3, " ".join(["w"] * 12), "B"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_length_drift(docs).collect()}
    # global deciles sit between 2 and 12; both sources drift equally
    assert got["A"].drift == got["B"].drift
    assert got["A"].drift > 0
    assert got["A"].n_docs == 2
