"""Wave-24 operators: directed shingle containment, rank-mass
concentration, per-tool usage profile."""

import datetime

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.functions.dedup import shingle_containment
from linkgraph_spark.kernels.stats import rank_concentration
from linkgraph_spark.transcripts import tool_usage


# -------------------------------------------------------- shingle_containment
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_detects_doc_inside_doc(spark):
    small = "alpha beta gamma delta epsilon"
    big = small + " zeta eta theta iota kappa lam mu nu xi omicron pi rho"
    out = shingle_containment(
        _docs(spark, [(1, small), (2, big)]), threshold=0.9
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r.containment for r in out}
    # every 3-gram of `small` appears in `big` → containment(1 in 2) = 1.0
    assert pairs[(1, 2)] == 1.0
    # big is NOT contained in small
    assert (2, 1) not in pairs


def test_containment_asymmetric_vs_jaccard(spark):
    # same pair: symmetric Jaccard is low (3/17 shared shingles of big)
    small = "alpha beta gamma delta epsilon"
    big = small + " zeta eta theta iota kappa lam mu nu xi omicron pi rho"
    out = shingle_containment(
        _docs(spark, [(1, small), (2, big)]), threshold=0.0
    ).collect()
    by = {(r.doc_a, r.doc_b): r.containment for r in out}
    assert by[(1, 2)] == 1.0
    assert by[(2, 1)] < 0.25  # 3 shared / 15 shingles of big


def test_containment_exact_duplicates_both_ways(spark):
    out = shingle_containment(
        _docs(spark, [(1, "a b c d e"), (2, "a b c d e")]), threshold=0.5
    ).collect()
    by = {(r.doc_a, r.doc_b): r.containment for r in out}
    assert by[(1, 2)] == 1.0 and by[(2, 1)] == 1.0


def test_containment_hot_shingle_cap(spark):
    # with max_doc_freq=2 a shingle shared by 3 docs generates no candidates
    docs = [(i, "common phrase here") for i in range(3)]
    none = shingle_containment(
        _docs(spark, docs), threshold=0.5, max_doc_freq=2
    ).collect()
    assert none == []
    some = shingle_containment(_docs(spark, docs), threshold=0.5).collect()
    assert len(some) == 6  # all directed pairs


# ------------------------------------------------------- rank_concentration
def test_rank_concentration_uniform(spark):
    ranks = spark.createDataFrame(
        [(i, 1.0) for i in range(100)], "id long, rank double"
    )
    r = rank_concentration(ranks, fracs=(0.10,)).collect()[0]
    assert r.n == 100
    assert r.hhi == pytest.approx(0.01, abs=1e-9)  # 100 · (1/100)²
    assert r.max_share == pytest.approx(0.01, abs=1e-9)
    # all values tie at the quantile threshold → nothing strictly above
    assert r.share_top10pct == 0.0


def test_rank_concentration_one_hub(spark):
    # one vertex holds 91/100 of the mass
    rows = [(0, 91.0)] + [(i, 1.0) for i in range(1, 10)]
    ranks = spark.createDataFrame(rows, "id long, rank double")
    r = rank_concentration(ranks, fracs=(0.10, 0.5)).collect()[0]
    assert r.max_share == 0.91
    assert r.hhi == pytest.approx(round((91.0**2 + 9) / 100.0**2, 6), abs=1e-9)
    # 0.9-quantile of {91,1×9} interpolates between 1 and 91 → only the
    # hub sits above it
    assert r.share_top10pct == 0.91
    assert r.share_top50pct == 0.91


def test_rank_concentration_validates_fracs(spark):
    ranks = spark.createDataFrame([(0, 1.0)], "id long, rank double")
    with pytest.raises(ValueError):
        rank_concentration(ranks, fracs=())
    with pytest.raises(ValueError):
        rank_concentration(ranks, fracs=(1.5,))


# ----------------------------------------------------------------- tool_usage
def test_tool_usage_profile(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "q", None, t0),
        ("c1", 1, "assistant", "a", "search", t0),
        ("c1", 3, "assistant", "a", "search", t0),
        ("c2", 5, "assistant", "a", "search", t0),
        ("c2", 7, "assistant", "a", "calc", t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r.tool: r for r in tool_usage(df).collect()}
    assert set(got) == {"search", "calc"}
    s = got["search"]
    assert (s.n_calls, s.n_convs) == (3, 2)
    assert s.call_share == 0.75
    assert s.avg_turn_idx == pytest.approx(3.0, abs=1e-9)  # (1+3+5)/3
    assert got["calc"].call_share == 0.25
