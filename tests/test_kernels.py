from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels import (
    connected_components,
    label_propagation,
    triangle_count,
    triangles_per_vertex,
)
from tests.fixtures_graphs import DIRTY, STAR10, TRI3, TWO_COMPS, web64
from tests.oracles import components_oracle, labelprop_oracle, triangles_oracle

import pytest


@pytest.mark.parametrize(
    "edges", [TRI3, STAR10, TWO_COMPS, DIRTY, web64()],
    ids=["tri3", "star10", "two_comps", "dirty", "web64"],
)
def test_components_exact(spark, edges):
    g = graph_from_edges(spark, edges)
    got = {r["id"]: r["component"] for r in connected_components(g).labels.collect()}
    assert got == components_oracle(edges)
    g.unpersist()


def test_two_comps_shape(spark):
    g = graph_from_edges(spark, TWO_COMPS)
    got = {r["id"]: r["component"] for r in connected_components(g).labels.collect()}
    assert {v for k, v in got.items() if k in (0, 1, 2)} == {0}
    assert {v for k, v in got.items() if k in (10, 11, 12)} == {10}
    g.unpersist()


@pytest.mark.parametrize(
    "edges", [TRI3, STAR10, TWO_COMPS, web64()],
    ids=["tri3", "star10", "two_comps", "web64"],
)
def test_labelprop_matches_sync_oracle(spark, edges):
    g = graph_from_edges(spark, edges)
    got = {r["id"]: r["label"] for r in label_propagation(g, max_iterations=5).collect()}
    assert got == labelprop_oracle(edges, max_iters=5)
    g.unpersist()


@pytest.mark.parametrize(
    "edges,expected",
    [(TRI3, 1), (STAR10, None), (TWO_COMPS, 1), (DIRTY, 1), (web64(), None)],
    ids=["tri3", "star10", "two_comps", "dirty", "web64"],
)
def test_triangles_exact(spark, edges, expected):
    g = graph_from_edges(spark, edges)
    want = triangles_oracle(edges) if expected is None else expected
    assert triangle_count(g) == want
    g.unpersist()


def test_triangles_per_vertex(spark):
    g = graph_from_edges(spark, TRI3 + [(10, 11)])
    got = {r["id"]: r["triangles"] for r in triangles_per_vertex(g).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 10: 0, 11: 0}
    g.unpersist()


def test_components_converged_flag_trips_at_cap(spark):
    """A path graph's diameter exceeds a tiny iteration cap — the result
    must SAY so instead of silently returning split components."""
    from linkgraph_spark.kernels import connected_components_star

    path = [(i, i + 1) for i in range(20)]
    g = graph_from_edges(spark, path)
    capped = connected_components(g, max_iterations=3)
    assert capped.converged is False
    full = connected_components(g, max_iterations=50)
    assert full.converged is True
    assert {r["component"] for r in full.labels.collect()} == {0}
    # large-star/small-star: O(log n) rounds on the same diameter-20 path
    star = connected_components_star(g)
    assert star.converged is True
    assert star.iterations < 10
    got = {r["id"]: r["component"] for r in star.labels.collect()}
    assert got == {r["id"]: r["component"] for r in full.labels.collect()}
    g.unpersist()


@pytest.mark.parametrize(
    "edges", [TRI3, STAR10, TWO_COMPS, DIRTY, web64()],
    ids=["tri3", "star10", "two_comps", "dirty", "web64"],
)
def test_components_star_matches_hashmin(spark, edges):
    from linkgraph_spark.kernels import connected_components_star

    g = graph_from_edges(spark, edges)
    res = connected_components_star(g)
    assert res.converged is True
    got = {r["id"]: r["component"] for r in res.labels.collect()}
    assert got == components_oracle(edges)
    g.unpersist()
