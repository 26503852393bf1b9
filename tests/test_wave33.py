"""Wave-33 operators: directed assortativity suite, hub neighborhood
overlap, exact-dup cluster size histogram."""

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.dedup import dup_cluster_sizes
from linkgraph_spark.kernels.stats import directed_assortativity, hub_overlap


# ---------------------------------------------------- directed_assortativity
def test_directed_assortativity_hand(spark):
    # edges 0→1, 0→2, 1→2: closed-form (−0.5, 0.5, 0.5, −0.5)
    g = graph_from_edges(spark, [(0, 1), (0, 2), (1, 2)])
    r = directed_assortativity(g).collect()[0]
    assert r.r_out_in == pytest.approx(-0.5)
    assert r.r_out_out == pytest.approx(0.5)
    assert r.r_in_in == pytest.approx(0.5)
    assert r.r_in_out == pytest.approx(-0.5)


def test_directed_assortativity_constant_null(spark):
    # star: src out-degree constant, src in-degree constant 0 -> all NULL
    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3)])
    r = directed_assortativity(g).collect()[0]
    assert all(
        v is None for v in (r.r_out_in, r.r_out_out, r.r_in_in, r.r_in_out)
    )


# ----------------------------------------------------------------- hub_overlap
def test_hub_overlap_pairs(spark):
    g = graph_from_edges(
        spark,
        [(0, 1), (0, 2), (0, 3), (4, 2), (4, 3), (4, 5), (6, 1)],
    )
    got = {
        (r.hub_a, r.hub_b): r for r in hub_overlap(g, k=3).collect()
    }
    assert set(got) == {(0, 4), (0, 6), (4, 6)}
    assert got[(0, 4)].inter == 2 and got[(0, 4)].jaccard == 0.5
    assert got[(0, 6)].inter == 1 and got[(0, 6)].jaccard == pytest.approx(
        round(1 / 3, 6)
    )
    assert got[(4, 6)].inter == 0 and got[(4, 6)].jaccard == 0.0
    assert got[(0, 4)].deg_a == 3 and got[(0, 6)].deg_b == 1


def test_hub_overlap_rejects_small_k(spark):
    g = graph_from_edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        hub_overlap(g, k=1)


# ----------------------------------------------------------- dup_cluster_sizes
def test_dup_cluster_sizes_hand(spark):
    docs = spark.createDataFrame(
        [(0, "x"), (1, "x "), (2, " X"), (3, "y"), (4, "z")],
        "doc_id long, text string",
    )
    got = {r.group_size: r for r in dup_cluster_sizes(docs).collect()}
    assert got[3].n_groups == 1 and got[3].n_docs == 3
    assert got[1].n_groups == 2 and got[1].n_docs == 2


def test_dup_cluster_sizes_all_unique(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(5)], "doc_id long, text string"
    )
    rows = dup_cluster_sizes(docs).collect()
    assert len(rows) == 1 and rows[0].group_size == 1
    assert rows[0].n_groups == 5 and rows[0].n_docs == 5
