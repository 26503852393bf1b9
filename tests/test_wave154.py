"""Wave-154 operator: partition coverage + performance (closed form)."""

import itertools

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.modularity import partition_quality


def _labels_df(spark, labels):
    return spark.createDataFrame(sorted(labels.items()), "id long, label long")


def _ref(edges, labels):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted(labels)
    n, m = len(verts), len(und)
    m_intra = sum(1 for a, b in und if labels[a] == labels[b])
    pairs = n * (n - 1) // 2
    intra_pairs = 0
    from collections import Counter

    for c in Counter(labels.values()).values():
        intra_pairs += c * (c - 1) // 2
    correct = m_intra + (pairs - intra_pairs) - (m - m_intra)
    return (
        round(m_intra / m, 6) if m else None,
        round(correct / pairs, 6) if n >= 2 else None,
    )


def test_perfect_partition_scores_one(spark):
    # two disjoint triangles labeled by component: coverage = performance = 1
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    (r,) = partition_quality(
        graph_from_edges(spark, edges), _labels_df(spark, labels)
    ).collect()
    assert (r.communities, r.n, r.m, r.intra_edges) == (2, 6, 6, 6)
    assert r.coverage == 1.0 and r.performance == 1.0


def test_single_community_counts_every_nonedge_wrong(spark):
    # everything in one community: coverage 1, performance = edge density
    edges = [(0, 1), (1, 2)]
    labels = {0: 0, 1: 0, 2: 0}
    (r,) = partition_quality(
        graph_from_edges(spark, edges), _labels_df(spark, labels)
    ).collect()
    assert r.coverage == 1.0
    assert r.performance == pytest.approx(2 / 3, abs=1e-6)
    cov, perf = _ref(edges, labels)
    assert (r.coverage, r.performance) == (cov, perf)


def test_matches_reference_on_mixed_partition(spark):
    import random

    rng = random.Random(154)
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(12), 2)
        if rng.random() < 0.3
    ]
    verts = sorted({v for e in edges for v in e})
    labels = {v: rng.randint(0, 2) for v in verts}
    (r,) = partition_quality(
        graph_from_edges(spark, edges), _labels_df(spark, labels)
    ).collect()
    cov, perf = _ref(edges, labels)
    assert r.coverage == pytest.approx(cov, abs=1e-6)
    assert r.performance == pytest.approx(perf, abs=1e-6)


def test_singleton_partition_performance_is_nonedge_density(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    labels = {v: v for v in range(4)}  # all singletons
    (r,) = partition_quality(
        graph_from_edges(spark, edges), _labels_df(spark, labels)
    ).collect()
    assert r.coverage == 0.0
    assert r.performance == pytest.approx((6 - 3) / 6, abs=1e-6)
