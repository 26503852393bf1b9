"""Wave-134 operators: degree-distribution entropy and the
configuration-model clustering lift."""

import math

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.stats import (
    clustering_null_model,
    degree_entropy,
)


def _graph_from_pairs(spark, pairs):
    return graph_from_edges(spark, pairs)


def _entropy(ps):
    # mirror the engine's per-cell micro-nat quantization
    q = sum(round(1e6 * p * math.log(p)) for p in ps if p > 0)
    return round(max(0.0, -q / 1e6), 6)


def test_degree_entropy_hand_computed(spark):
    # star on 1-2,1-3,1-4 plus edge 5-6: degrees 3,1,1,1,1,1
    g = _graph_from_pairs(spark, [(1, 2), (1, 3), (1, 4), (5, 6)])
    out = degree_entropy(g).collect()[0]
    assert out.n_vertices == 6
    # degree histogram: d=1 x5, d=3 x1
    hd = _entropy([5 / 6, 1 / 6])
    assert out.h_degree == hd
    # excess weights: class d=1 mass 5*1/8, class d=3 mass 3/8
    hx = _entropy([5 / 8, 3 / 8])
    assert out.h_excess == hx
    # here the edge-weighted classes (5/8, 3/8) are MORE balanced than
    # the vertex classes (5/6, 1/6), so the excess entropy is higher
    assert out.h_excess > out.h_degree


def test_degree_entropy_regular_graph_is_zero(spark):
    # 4-cycle: all degrees 2 -> single class, H = 0 for both
    g = _graph_from_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    out = degree_entropy(g).collect()[0]
    assert out.h_degree == 0.0 and out.h_excess == 0.0


def test_null_model_triangle_vs_star(spark):
    # triangle: observed gcc = 1; config expectation well below 1
    g = _graph_from_pairs(spark, [(1, 2), (2, 3), (1, 3)])
    out = clustering_null_model(g).collect()[0]
    assert out.n_vertices == 3 and out.m_edges == 3
    assert out.observed_gcc == 1.0
    # degrees all 2: m1=6, m2=12 -> expected = 36/216
    assert out.expected_gcc == round(36 / 216, 6)
    assert out.lift == round(1.0 / (36 / 216), 6)


def test_null_model_star_has_no_triangles(spark):
    g = _graph_from_pairs(spark, [(1, 2), (1, 3), (1, 4)])
    out = clustering_null_model(g).collect()[0]
    assert out.observed_gcc == 0.0
    assert out.lift == 0.0


def test_null_model_duplicate_and_self_edges_collapse(spark):
    g = _graph_from_pairs(
        spark, [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3), (1, 3)]
    )
    out = clustering_null_model(g).collect()[0]
    assert out.m_edges == 3  # 1-2, 2-3, 1-3 after cleanup
    assert out.observed_gcc == 1.0
