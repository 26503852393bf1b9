"""Wave-57 operators: edge dispersion, brevity law, dup chain audit."""

import math

import pytest

from linkgraph_spark.functions.dedup import dup_chain_audit
from linkgraph_spark.functions.text import brevity_law
from linkgraph_spark.kernels.truss import edge_dispersion_over_pairs


# -------------------------------------------------------------- edge_dispersion
def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a long, b long")


def test_edge_dispersion_hand(spark):
    # edge (1,2) has common neighbors {3,4,5}; 3-4 linked, 3-5 / 4-5 not
    edges = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (1, 5), (2, 5), (3, 4)]
    rows = {
        (r.a, r.b): r
        for r in edge_dispersion_over_pairs(_pairs(spark, edges)).collect()
    }
    r12 = rows[(1, 2)]
    assert r12.embeddedness == 3
    assert r12.dispersion == 2  # (3,5) and (4,5) unlinked
    assert r12.norm_dispersion == pytest.approx(2 / 3, abs=1e-6)
    # edge (1,3): common nbrs {2,4}, 2-4 linked -> dispersion 0
    r13 = rows[(1, 3)]
    assert r13.embeddedness == 2 and r13.dispersion == 0
    # edges with < 2 common neighbors are absent
    assert (1, 5) not in rows or rows[(1, 5)].embeddedness >= 2


def test_edge_dispersion_cap_excludes(spark):
    edges = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (1, 5), (2, 5), (3, 4)]
    rows = {
        (r.a, r.b): r
        for r in edge_dispersion_over_pairs(
            _pairs(spark, edges), max_embeddedness=2
        ).collect()
    }
    assert (1, 2) not in rows  # embeddedness 3 > cap
    assert (1, 3) in rows
    with pytest.raises(ValueError):
        edge_dispersion_over_pairs(_pairs(spark, edges), max_embeddedness=1)


def test_edge_dispersion_orientation_and_dups_tolerated(spark):
    # same graph given reversed + duplicated pairs -> same result
    edges = [(2, 1), (3, 1), (3, 2), (4, 1), (4, 2), (5, 1), (5, 2), (4, 3), (1, 2)]
    rows = {
        (r.a, r.b): r
        for r in edge_dispersion_over_pairs(_pairs(spark, edges)).collect()
    }
    assert rows[(1, 2)].dispersion == 2


# ------------------------------------------------------------------ brevity_law
def test_brevity_law_hand(spark):
    # vocab: 'aa' (m=2, len 2), 'b' (m=1, len 1) -> two points, r = +1
    docs = spark.createDataFrame(
        [(0, "aa aa b", "A")], "doc_id long, text string, source string"
    )
    r = brevity_law(docs).collect()[0]
    assert r.n_terms == 2
    assert r.r_lnfreq_len == pytest.approx(1.0)
    assert r.avg_len_types == pytest.approx(1.5)
    assert r.avg_len_tokens == pytest.approx(5 / 3, abs=1e-6)


def test_brevity_law_degenerate_null(spark):
    # all terms the same length -> zero length variance -> NULL r
    docs = spark.createDataFrame(
        [(0, "aa bb aa cc", "A")], "doc_id long, text string, source string"
    )
    r = brevity_law(docs).collect()[0]
    assert r.r_lnfreq_len is None
    assert r.avg_len_types == pytest.approx(2.0)


def test_brevity_law_negative_on_natural_shape(spark):
    # frequent-short / rare-long, the natural-language shape -> r < 0
    text = " ".join(["a"] * 50 + ["of"] * 30 + ["paradigm"] * 2 + ["sesquipedalian"])
    docs = spark.createDataFrame(
        [(0, text, "A")], "doc_id long, text string, source string"
    )
    r = brevity_law(docs).collect()[0]
    assert r.r_lnfreq_len < -0.8
    assert r.avg_len_tokens < r.avg_len_types


# --------------------------------------------------------------- dup_chain_audit
def test_dup_chain_audit_clique_clusters(spark):
    body = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, body, "A"), (1, body, "A"), (2, body, "A"),
         (3, "completely different text entirely here now", "B")],
        "doc_id long, text string, source string",
    )
    r = dup_chain_audit(docs, threshold=0.5).collect()[0]
    # one 3-cluster, all 3 intra pairs verified directly -> no chaining
    assert r.n_clusters == 1
    assert r.n_intra_pairs == 3 and r.n_direct_pairs == 3
    assert r.chaining_frac == pytest.approx(0.0)


def test_dup_chain_audit_no_dups(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"a{i}" for i in range(30)), "A"),
         (1, " ".join(f"b{i}" for i in range(30)), "B")],
        "doc_id long, text string, source string",
    )
    r = dup_chain_audit(docs, threshold=0.5).collect()[0]
    assert r.n_clusters == 0 and r.n_intra_pairs == 0
    assert r.chaining_frac is None
    with pytest.raises(ValueError):
        dup_chain_audit(docs, max_cluster=1)


def test_dup_chain_audit_direct_bounded_by_intra(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = dup_chain_audit(docs, threshold=0.5).collect()[0]
    assert 0 <= r.n_direct_pairs <= r.n_intra_pairs
    if r.n_intra_pairs:
        assert 0.0 <= r.chaining_frac <= 1.0
