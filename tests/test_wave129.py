"""Wave-129 operators: sliding-window chunking plan and dedup token
savings."""

import math

import pytest

from linkgraph_spark.functions.dedup import dedup_token_savings
from linkgraph_spark.functions.text import chunking_plan

_SCHEMA = "doc_id long, text string, lang string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "s") for i, (lang, t) in enumerate(rows, 1)], _SCHEMA
    )


def _brute_chunks(n, w, s):
    if n <= w:
        return 1, 0
    k = 1 + math.ceil((n - w) / s)
    lens = [min(w, n - i * s) for i in range(k)]
    return k, sum(lens) - n


def test_chunking_hand_computed(spark):
    # en: 5, 10, 23 tokens at window 10 stride 4; de: 3 tokens
    rows = [
        ("en", " ".join(["w"] * 5)),
        ("en", " ".join(["w"] * 10)),
        ("en", " ".join(["w"] * 23)),
        ("de", " ".join(["w"] * 3)),
    ]
    out = {
        r.lang: r
        for r in chunking_plan(_docs(spark, rows), window=10, stride=4).collect()
    }
    en = [_brute_chunks(n, 10, 4) for n in (5, 10, 23)]
    assert out["en"].n_docs == 3
    assert out["en"].n_tokens == 38
    assert out["en"].n_chunks == sum(k for k, _ in en)
    assert out["en"].overlap_tokens == sum(o for _, o in en)
    assert out["en"].avg_chunks_per_doc == round(
        sum(k for k, _ in en) / 3, 6
    )
    assert out["de"].n_chunks == 1 and out["de"].overlap_tokens == 0


def test_chunking_matches_bruteforce_sweep(spark):
    rows = [("en", " ".join(["t"] * n)) for n in range(1, 40)]
    out = chunking_plan(_docs(spark, rows), window=7, stride=3).collect()[0]
    hand = [_brute_chunks(n, 7, 3) for n in range(1, 40)]
    assert out.n_chunks == sum(k for k, _ in hand)
    assert out.overlap_tokens == sum(o for _, o in hand)


def test_chunking_rejects_bad_stride(spark):
    with pytest.raises(ValueError):
        chunking_plan(_docs(spark, [("en", "a b")]), window=4, stride=5)


def test_dedup_token_savings_hand(spark):
    # two identical long docs (one drops), two distinct short docs
    long = " ".join(f"tok{i}" for i in range(40))
    rows = [
        ("en", long),
        ("en", long),
        ("en", "alpha beta gamma"),
        ("de", "eins zwei drei vier"),
    ]
    out = dedup_token_savings(_docs(spark, rows)).collect()[0]
    assert out.n_docs == 4 and out.n_docs_kept == 3
    assert out.tokens == 40 + 40 + 3 + 4
    assert out.tokens_kept == 40 + 3 + 4
    assert out.doc_savings == round(1 - 3 / 4, 6)
    assert out.token_savings == round(1 - 47 / 87, 6)
    # duplicates were long, so token savings exceed doc savings... here
    # doc_savings = 0.25, token_savings ~ 0.46: the two numbers diverge
    assert out.token_savings > out.doc_savings


def test_dedup_token_savings_no_dups(spark):
    rows = [
        ("en", "totally unique first text"),
        ("de", "ganz anderer zweiter text hier"),
    ]
    out = dedup_token_savings(_docs(spark, rows)).collect()[0]
    assert out.n_docs_kept == 2 and out.doc_savings == 0.0
    assert out.token_savings == 0.0
