"""k=3 clique-percolation communities (CPM) — overlapping communities
from adjacent triangles.

Palla, Derényi, Farkas & Vicsek (Nature 2005, public technique): two
triangles are adjacent iff they share an edge; a community is a connected
component of the triangle-adjacency graph, and a VERTEX belongs to every
community whose triangles contain it (overlap is the point — a broker
actor sits in several tight pods at once, which disjoint components and
label propagation structurally cannot express).

Scale design — the triangle-adjacency graph is never materialized:
a hub EDGE shared by S triangles would contribute C(S, 2) adjacency
pairs, so instead the hash-min label exchange runs on the BIPARTITE
triangle–edge incidence (3 rows per triangle, exact):

    per round:  edge_label(e)  = min label over triangles containing e
                label(t)      ← min(label(t), min over t's 3 edges)

which converges to the same fixpoint (an edge relays the minimum between
all its triangles in one hop) in O(diameter of the triangle graph)
rounds — each round two grouped-min shuffles, change count rides the
rotate via ``observe()``.  Labels are zero-padded fixed-width strings
("lpad-19" triple keys — the overflow-safe total order the MIS/matching
kernels use), so min() agrees bit-for-bit between Spark and DuckDB at any
id magnitude.

Reference provenance: engine extension; composes the degree-ordered
triangle enumeration (kernels/triangles.py) with the components kernel's
hash-min loop shape (kernels/components.py, north_star kernel #2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class CpmResult:
    memberships: DataFrame  # [id, community] — one row per (vertex, community)
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def _tkey(a, b, c) -> F.Column:
    return F.concat_ws(
        ":",
        F.lpad(a.cast("string"), 19, "0"),
        F.lpad(b.cast("string"), 19, "0"),
        F.lpad(c.cast("string"), 19, "0"),
    )


def _ekey(x, y) -> F.Column:
    return F.concat_ws(
        ":",
        F.lpad(x.cast("string"), 19, "0"),
        F.lpad(y.cast("string"), 19, "0"),
    )


def clique_percolation3(graph: LinkGraph, max_iterations: int = 30) -> CpmResult:
    """→ ``[id, community]`` — one row per (vertex, community) membership;
    ``community`` is the converged minimum triangle key (a stable,
    engine-portable community id).  Vertices in no triangle appear in no
    community.  ``converged`` is False on a cap stop."""
    from linkgraph_spark.kernels.triangles import _oriented, _triangles_und

    spark = graph.vertices.sparkSession
    tri = _triangles_und(_oriented(graph.edges)).select(
        _tkey(F.col("a"), F.col("b"), F.col("c")).alias("tid"), "a", "b", "c"
    )
    # bipartite incidence: 3 edge rows per triangle
    inc = (
        tri.select("tid", _ekey(F.col("a"), F.col("b")).alias("e"))
        .unionAll(tri.select("tid", _ekey(F.col("a"), F.col("c")).alias("e")))
        .unionAll(tri.select("tid", _ekey(F.col("b"), F.col("c")).alias("e")))
    )
    st_inc = RotatingState(spark)
    inc = st_inc.rotate(inc)
    n_inc = inc.count()

    st_lab = RotatingState(spark)
    labels = st_lab.rotate(inc.select("tid").distinct().withColumn("label", F.col("tid")))

    converged = False
    metrics: list = []
    it = 0
    with pinned_superstep_confs(spark, n_inc, graph.num_vertices):
        for it in range(1, max_iterations + 1):
            elab = (
                inc.join(labels, "tid")
                .groupBy("e")
                .agg(F.min("label").alias("elab"))
            )
            nxt = (
                inc.join(elab, "e")
                .groupBy("tid")
                .agg(F.min("elab").alias("new"))
            )
            upd = labels.join(nxt, "tid", "left").select(
                "tid",
                F.least(F.col("label"), F.coalesce("new", F.col("label"))).alias(
                    "label"
                ),
                F.col("label").alias("_old"),
            )
            obs = Observation(f"cpm_{id(st_lab)}_{it}")
            upd = upd.observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("_old"), 1).otherwise(0)
                ).alias("n"),
            )
            labels = st_lab.rotate(upd.select("tid", "label"))
            changed = int(obs.get["n"] or 0)
            metrics.append({"iteration": it, "changed": changed})
            if changed == 0:
                converged = True
                break
    members = (
        tri.join(labels, "tid")
        .select(F.explode(F.array("a", "b", "c")).alias("id"), F.col("label").alias("community"))
        .distinct()
        .localCheckpoint()
    )
    st_inc.release()
    st_lab.release()
    return CpmResult(
        memberships=members, iterations=it, converged=converged, metrics=metrics
    )


def clique_percolation3_sql(unroll: int = 12) -> str:
    """DuckDB oracle body (expects ``edges``): the identical incidence
    hash-min, unrolled.  ``unroll`` must cover the convergence rounds of
    the gate graph (the Spark side's converged flag is the guard)."""

    def tk(a, b, c):
        return (
            f"lpad(CAST({a} AS VARCHAR), 19, '0') || ':' || "
            f"lpad(CAST({b} AS VARCHAR), 19, '0') || ':' || "
            f"lpad(CAST({c} AS VARCHAR), 19, '0')"
        )

    def ek(x, y):
        return (
            f"lpad(CAST({x} AS VARCHAR), 19, '0') || ':' || "
            f"lpad(CAST({y} AS VARCHAR), 19, '0')"
        )

    ctes = [
        """cpm_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    )""",
        f"""cpm_tri AS MATERIALIZED (
      SELECT {tk("e1.a", "e1.b", "e2.b")} AS tid,
             e1.a AS a, e1.b AS b, e2.b AS c
      FROM cpm_und e1
      JOIN cpm_und e2 ON e1.b = e2.a
      JOIN cpm_und e3 ON e3.a = e1.a AND e3.b = e2.b
    )""",
        f"""cpm_inc AS MATERIALIZED (
      SELECT tid, {ek("a", "b")} AS e FROM cpm_tri
      UNION ALL SELECT tid, {ek("a", "c")} FROM cpm_tri
      UNION ALL SELECT tid, {ek("b", "c")} FROM cpm_tri
    )""",
        "cpm_l0 AS (SELECT DISTINCT tid, tid AS label FROM cpm_inc)",
    ]
    for k in range(1, unroll + 1):
        ctes.append(
            f"""cpm_l{k} AS MATERIALIZED (
      SELECT l.tid, least(l.label, coalesce(n.new, l.label)) AS label
      FROM cpm_l{k - 1} l
      LEFT JOIN (
        SELECT i2.tid, min(em.elab) AS new
        FROM cpm_inc i2
        JOIN (
          SELECT i.e, min(p.label) AS elab
          FROM cpm_inc i JOIN cpm_l{k - 1} p ON p.tid = i.tid
          GROUP BY i.e
        ) em ON em.e = i2.e
        GROUP BY i2.tid
      ) n ON n.tid = l.tid
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT DISTINCT v.id, l.label AS community
    FROM cpm_tri t
    JOIN cpm_l{unroll} l ON l.tid = t.tid
    CROSS JOIN LATERAL (VALUES (t.a), (t.b), (t.c)) AS v(id)
    """
