"""Wave-56 operators: SRM chi-square, top-k token coverage, per-component
structure profile."""

import datetime

import pytest

from linkgraph_spark.functions.events import ab_test_srm
from linkgraph_spark.functions.text import ngram_coverage


def _ev(i, u):
    return (i, datetime.datetime.utcfromtimestamp(i), u, "view", 1.0)


EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


# ------------------------------------------------------------------ ab_test_srm
def test_ab_test_srm_balanced_hash(spark):
    ev = spark.createDataFrame([_ev(i, i) for i in range(400)], EV_SCHEMA)
    r = ab_test_srm(ev).collect()[0]
    assert r.n_control + r.n_treatment == 400
    # the md5 split is an A/A by construction: no mismatch expected
    assert r.srm_detected is False
    # chi2 = (n0-200)^2/200 + (n1-200)^2/200, check exactly
    want = (r.n_control - 200) ** 2 / 200 + (r.n_treatment - 200) ** 2 / 200
    assert r.chi2 == pytest.approx(want, abs=1e-6)


def test_ab_test_srm_detects_skewed_design(spark):
    # a 50/50 hash audited against a 90/10 DESIGN must scream
    ev = spark.createDataFrame([_ev(i, i) for i in range(400)], EV_SCHEMA)
    r = ab_test_srm(ev, expected_control=0.9).collect()[0]
    assert r.srm_detected is True
    assert r.chi2 > 100


def test_ab_test_srm_validates_frac(spark):
    ev = spark.createDataFrame([_ev(0, 1)], EV_SCHEMA)
    with pytest.raises(ValueError):
        ab_test_srm(ev, expected_control=1.0)


# --------------------------------------------------------------- ngram_coverage
def test_ngram_coverage_hand(spark):
    # counts: a=6, b=3, c=1 -> total 10
    docs = spark.createDataFrame(
        [(0, "a a a b b", "A"), (1, "a a a b c", "A")],
        "doc_id long, text string, source string",
    )
    got = {r.k: r for r in ngram_coverage(docs, ks=[1, 2, 3]).collect()}
    assert got[1].covered_tokens == 6 and got[1].coverage == pytest.approx(0.6)
    assert got[2].covered_tokens == 9 and got[2].coverage == pytest.approx(0.9)
    assert got[3].coverage == pytest.approx(1.0)


def test_ngram_coverage_k_beyond_vocab(spark):
    docs = spark.createDataFrame(
        [(0, "x y", "A")], "doc_id long, text string, source string"
    )
    got = {r.k: r for r in ngram_coverage(docs, ks=[10]).collect()}
    assert got[10].coverage == pytest.approx(1.0)
    with pytest.raises(ValueError):
        ngram_coverage(docs, ks=[0])


def test_ngram_coverage_monotone_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(ngram_coverage(docs).collect(), key=lambda r: r.k)
    covs = [r.covered_tokens for r in rows]
    assert covs == sorted(covs)
    assert all(0 < r.coverage <= 1.0 for r in rows)


# ------------------------------------------------------------- component_profile
def test_component_profile_consistency(spark):
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    rows = e.queries()["component_profile"](spark, sf).collect()
    assert 0 < len(rows) <= 20
    sizes = [r.n_vertices for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    for r in rows:
        assert r.n_edges >= r.n_vertices - 1  # connected
        assert r.avg_out_degree == pytest.approx(r.n_edges / r.n_vertices, abs=1e-5)
        if r.n_vertices > 1:
            assert 0 < r.density <= 1.0
