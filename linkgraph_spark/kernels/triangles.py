"""Triangle counting via oriented edge self-join (north_star kernel #4).

Classic two-join algorithm: symmetrize/dedup, orient every undirected edge
low→high id, then count paths a<b<c whose closing edge (a,c) exists. Each
triangle is counted exactly once. The orientation bounds the join fan-out by
each vertex's *oriented* out-degree (≤ total degree), the standard trick
that keeps hub vertices from exploding the self-join at scale; AQE skew-join
covers residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected dedup'd edges oriented low→high: [a, b] with a < b."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_count(graph: LinkGraph) -> int:
    """Total number of distinct triangles in the undirected graph."""
    return _triangles(graph.edges).count()


def _triangles(edges: DataFrame) -> DataFrame:
    """→ one row [a, b, c] per triangle, a < b < c."""
    e = _oriented(edges)
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")  # x<y<z path
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    return wedges.join(closing, ["x", "z"], "left_semi").select(
        F.col("x").alias("a"), F.col("y").alias("b"), F.col("z").alias("c")
    )


def triangles_per_vertex(graph: LinkGraph) -> DataFrame:
    """→ ``DataFrame[id, triangles]`` — number of triangles through each vertex."""
    tris = _triangles(graph.edges)
    members = (
        tris.select(F.col("a").alias("id"))
        .unionAll(tris.select(F.col("b").alias("id")))
        .unionAll(tris.select(F.col("c").alias("id")))
    )
    counts = members.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        graph.vertices.select("id")
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )
