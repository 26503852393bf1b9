"""Graph slicing: induced subgraphs and k-hop ego graphs.

The extraction APIs a graph user reaches for constantly — "only the active
actors", "everything within 2 hops of this hub" — expressed as pure
left-semi joins so they compose with every kernel (the returned
``LinkGraph`` has recomputed degrees and runs PageRank/components/etc.
unchanged).

Scale shapes:

- :func:`induced_subgraph`: one predicate evaluation over the vertex table
  + two left-semi joins on the edge table (src-in-set, dst-in-set) — the
  O(E) side streams, the kept vertex set broadcasts below the threshold
  and hash-joins beyond; no shuffle of dropped rows.
- :func:`ego_graph`: a k-round BFS frontier expansion (O(edges touched),
  not O(E·k) — ``kernels/paths.py``) followed by the same induced-edge
  semi-joins. The reference has no slicing at all (it always rescans the
  full edge file); here a hub investigation touches only the hub's
  neighborhood.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph, vertex_degrees


def _induce(graph: LinkGraph, keep_ids: DataFrame) -> LinkGraph:
    """Induced LinkGraph on the ``keep_ids`` [id] vertex set (ids preserved)."""
    vertices = graph.vertices.join(keep_ids, "id", "left_semi").persist()
    edges = (
        graph.edges.join(
            keep_ids.withColumnRenamed("id", "src"), "src", "left_semi"
        )
        .join(keep_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .persist()
    )
    degrees = vertex_degrees(vertices, edges).persist()
    return LinkGraph(
        vertices=vertices,
        edges=edges,
        degrees=degrees,
        num_vertices=vertices.count(),
    )


def induced_subgraph(graph: LinkGraph, vertex_pred: Column) -> LinkGraph:
    """→ the induced subgraph on vertices satisfying ``vertex_pred`` (a
    boolean Column over the joined vertices⋈degrees row: ``actor_key``,
    ``out_deg``, ``in_deg``, ... are all in scope). Edges survive iff BOTH
    endpoints do; vertex ids are preserved."""
    keep = (
        graph.vertices.join(graph.degrees, "id")
        .where(vertex_pred)
        .select("id")
    )
    return _induce(graph, keep)


def ego_graph(
    graph: LinkGraph, sources: list, k: int, directed: bool = False
) -> LinkGraph:
    """→ the induced subgraph on vertices within ``k`` hops of ``sources``
    (undirected reach by default — conversation chains bridged by shared
    tools; ``directed=True`` follows edge direction). The returned edges
    keep their original direction."""
    from linkgraph_spark.kernels.paths import shortest_paths

    res = shortest_paths(graph, sources=sources, directed=directed, max_iterations=k)
    keep = res.distances.where(F.col("distance") <= k).select("id")
    return _induce(graph, keep)
