"""Wave-35 operators: retrieval MRR over exact kNN, per-language token
fertility, tool-chain depth histogram."""

import datetime

import pytest

from linkgraph_spark.functions.similarity import knn_mrr
from linkgraph_spark.functions.text import token_fertility
from linkgraph_spark.transcripts import tool_chain_depth


# --------------------------------------------------------------------- knn_mrr
def _embs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, (v, l) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )


def test_knn_mrr_hand_ranks(spark):
    # query 0 (label 1): nearest is vec 1 (label 2, cos 1·), then vec 2
    # (label 1) — first same-label hit at rank 2 → rr 0.5
    rows = [
        ([1.0, 0.0], 1),       # query
        ([2.0, 0.002], 2),     # cos ≈ 1.0 (rank 1, wrong label)
        ([1.0, 0.1], 1),       # rank 2, right label
        ([0.0, 1.0], 3),       # orthogonal
    ]
    got = {r.query_id: r for r in knn_mrr(_embs(spark, rows), n_queries=1, k=3).collect()}
    r0 = got[0]
    assert r0.label == 1 and r0.first_hit == 2 and r0.rr == 0.5


def test_knn_mrr_no_hit_zero(spark):
    rows = [([1.0, 0.0], 1), ([0.9, 0.1], 2), ([0.8, 0.2], 2)]
    r = knn_mrr(_embs(spark, rows), n_queries=1, k=2).collect()[0]
    assert r.first_hit is None and r.rr == 0.0


# --------------------------------------------------------------- token_fertility
def test_token_fertility_hand(spark):
    docs = spark.createDataFrame(
        [
            (0, "aa bb", "en", "s", 5),     # 2 tokens / 5 chars
            (1, "c d e", "en", "s", 5),     # 3 tokens / 5 chars
            (2, "xyzxyzxyzx", "zh", "s", 10),  # 1 token / 10 chars
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.lang: r for r in token_fertility(docs).collect()}
    assert got["en"].n_docs == 2 and got["en"].n_tokens == 5
    assert got["en"].tokens_per_100_chars == 50.0
    assert got["zh"].tokens_per_100_chars == 10.0


# -------------------------------------------------------------- tool_chain_depth
def test_tool_chain_depth_hand(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        # c1: tool turns at 0,1,2 and 4 → longest run 3
        ("c1", 0, "assistant", "x", "search", t0),
        ("c1", 1, "assistant", "x", "code", t0),
        ("c1", 2, "assistant", "x", "search", t0),
        ("c1", 3, "user", "x", None, t0),
        ("c1", 4, "assistant", "x", "search", t0),
        # c2: no tools → depth 0
        ("c2", 0, "user", "x", None, t0),
        # c3: single tool turn → depth 1
        ("c3", 0, "assistant", "x", "code", t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r.depth: r.n_convs for r in tool_chain_depth(df).collect()}
    assert got == {3: 1, 0: 1, 1: 1}
