"""Wave-158 operator: per-document zlib compression ratio (Arrow-batched
mapInPandas) vs python zlib exactly."""

import zlib

import pytest

from linkgraph_spark.functions.text import compression_ratio


def _docs(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_ratio_matches_python_zlib_exactly(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "abc " * 500),                      # highly repetitive
        (3, "x7$q9@z!m2#w5&v8*k1%j4^h6(g3)f0"),  # incompressible-ish
        (4, ""),                                # empty → NULL ratio
    ]
    got = {r.doc_id: r for r in compression_ratio(_docs(spark, docs)).collect()}
    for doc_id, text in docs:
        b = text.encode("utf-8")
        assert got[doc_id].n_bytes == len(b)
        assert got[doc_id].n_compressed == len(zlib.compress(b, 6))
        if b:
            assert got[doc_id].ratio == round(len(zlib.compress(b, 6)) / len(b), 6)
        else:
            assert got[doc_id].ratio is None


def test_repetitive_text_compresses_below_prose(spark):
    docs = [
        (1, "buy now click here " * 200),
        (2, "Mr. Dursley was the director of a firm called Grunnings, "
            "which made drills. He was a big, beefy man with hardly any "
            "neck, although he did have a very large mustache."),
    ]
    got = {r.doc_id: r.ratio for r in compression_ratio(_docs(spark, docs)).collect()}
    assert got[1] < 0.1 < got[2]


def test_plan_is_arrow_map_only(spark):
    df = compression_ratio(_docs(spark, [(1, "hello world")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # map-only: no shuffle anywhere
