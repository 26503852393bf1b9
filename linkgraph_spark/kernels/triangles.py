"""Triangle counting via degree-ordered oriented self-join (north_star
kernel #4).

Classic compact-forward algorithm: symmetrize/dedup, orient every
undirected edge from its lower-(degree, id) endpoint to its higher one,
enumerate wedges at each edge's common LOWEST endpoint, and keep wedges
whose closing edge exists. Each triangle is found exactly once.

Why degree ordering (not id ordering): the wedge join's fan-out at vertex u
is C(outdeg⁺(u), 2) where outdeg⁺ counts ORIENTED out-edges. Ordering by
(degree, id) bounds every outdeg⁺ by O(√E) (arboricity bound), so a
10^8-degree tool hub — whose id is arbitrary — contributes no wedges at
all beyond its few higher-degree peers. Id ordering leaves a low-id hub
with outdeg⁺ ≈ its full degree and a quadratic wedge explosion. The output
is remapped to (a < b < c by id), identical to the all-pairs definition
(oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected dedup'd edges oriented low→high id: [a, b] with a < b."""
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
    """→ one row [a, b, c] per triangle, a < b < c (by id)."""
    und = _oriented(edges)
    # undirected degree of every endpoint (one O(E) agg, iteration-free)
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("degb"))
    keyed = und.join(da, "a").join(db, "b")
    ka = F.struct(F.col("dega").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("degb").alias("d"), F.col("b").alias("i"))
    # orient lower-(deg, id) → higher; carry the destination key for the
    # wedge-pair ordering below
    directed = keyed.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(ka < kb, kb).otherwise(ka).alias("kw"),
    )
    e1 = directed.select(F.col("u").alias("x"), F.col("w").alias("y"), F.col("kw").alias("ky"))
    e2 = directed.select(F.col("u").alias("x"), F.col("w").alias("z"), F.col("kw").alias("kz"))
    wedges = (
        e1.join(e2, "x")
        .where(F.col("ky") < F.col("kz"))  # each unordered wedge once
        .select("x", "y", "z")
    )
    closing = directed.select(F.col("u").alias("y"), F.col("w").alias("z"))
    tri = wedges.join(closing, ["y", "z"], "left_semi")
    lo = F.least("x", "y", "z")
    hi = F.greatest("x", "y", "z")
    return tri.select(
        lo.alias("a"),
        (F.col("x") + F.col("y") + F.col("z") - lo - hi).alias("b"),
        hi.alias("c"),
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
