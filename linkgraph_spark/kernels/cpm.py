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
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    spark = graph.vertices.sparkSession
    # checkpoint the triangle table: it feeds the incidence AND the final
    # membership join — as a raw plan the enumeration ran twice (and every
    # percolation round re-analyzed the full enumeration lineage)
    tri, tri_blocks = checkpoint_tracked(
        _triangles_und(_oriented(graph.edges)).select(
            _tkey(F.col("a"), F.col("b"), F.col("c")).alias("tid"), "a", "b", "c"
        )
    )
    # bipartite incidence: 3 edge rows per triangle
    inc = (
        tri.select("tid", _ekey(F.col("a"), F.col("b")).alias("e"))
        .unionAll(tri.select("tid", _ekey(F.col("a"), F.col("c")).alias("e")))
        .unionAll(tri.select("tid", _ekey(F.col("b"), F.col("c")).alias("e")))
    )
    labels, it, converged, metrics, st_lab = _percolate(
        spark, inc, graph.num_vertices, max_iterations
    )
    members = (
        tri.join(labels, "tid")
        .select(F.explode(F.array("a", "b", "c")).alias("id"), F.col("label").alias("community"))
        .distinct()
        .localCheckpoint()
    )
    st_lab.release()
    free_tracked(spark.sparkContext, tri_blocks)
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


def _percolate(spark, inc: DataFrame, n_scale: int, max_iterations: int):
    """Shared hash-min label exchange over a bipartite ``[tid, e]``
    incidence (tid = clique id, e = shared-face key) → ``(labels,
    iterations, converged, metrics)``.  Labels start as each tid itself;
    see module docstring for why the face relay beats pairwise clique
    adjacency at scale."""
    st_inc = RotatingState(spark)
    inc = st_inc.rotate(inc)
    n_inc = inc.count()
    st_lab = RotatingState(spark)
    converged = False
    metrics: list = []
    it = 0
    with pinned_superstep_confs(spark, n_inc, n_scale) as big:
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # two pre-partitioned incidence copies (tid-keyed and e-keyed):
        # rotate preserves the hash partitioning, so neither per-round join
        # ever re-shuffles the O(inc) side — only the label/edge-min frames
        # move (and in the small regime those ride broadcasts instead)
        st_tid, st_e = RotatingState(spark), RotatingState(spark)
        inc_tid = st_tid.rotate(inc.repartition(sp_eff, "tid"))
        inc_e = st_e.rotate(inc.repartition(sp_eff, "e"))
        labels = st_lab.rotate(
            inc_tid.select("tid").distinct().withColumn("label", F.col("tid"))
        )
        for it in range(1, max_iterations + 1):
            lab_in = labels if big else F.broadcast(labels)
            elab = (
                inc_tid.join(lab_in, "tid")
                .groupBy("e")
                .agg(F.min("label").alias("elab"))
            )
            elab_in = elab if big else F.broadcast(elab)
            nxt = (
                inc_e.join(elab_in, "e").groupBy("tid").agg(F.min("elab").alias("new"))
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
        st_tid.release()
        st_e.release()
    st_inc.release()
    return labels, it, converged, metrics, st_lab


def clique_percolation4(graph: LinkGraph, max_iterations: int = 30) -> CpmResult:
    """→ ``[id, community]`` — k=4 clique percolation: communities are
    chains of 4-CLIQUES sharing a TRIANGLE face (k−1 = 3 common vertices,
    the Palla et al. definition).  Stricter than :func:`clique_percolation3`
    — two pods glued by a single edge stay separate here — so the two
    levels bracket community cohesion.  Same bipartite face-relay design:
    4 face rows per K4, a face shared by S cliques costs S rows per round,
    never C(S, 2) pairs.  Clique enumeration is the degree-ordered
    Chiba–Nishizeki extension (kernels/triangles.py), so hubs contribute
    no fan-out."""
    return clique_percolation4_over_pairs(
        graph.edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        max_iterations=max_iterations,
    )


def clique_percolation4_over_pairs(
    pairs: DataFrame, max_iterations: int = 30
) -> CpmResult:
    """k=4 CPM over an arbitrary undirected pair list ``[a, b]`` (any
    orientation / duplicates tolerated) — the entry point for derived
    graphs such as the shared-tool affinity projection, where the actor
    graph's K4s actually live (the transcript graph itself is K4-free:
    tool stars make triangles, not 4-cliques)."""
    from linkgraph_spark.kernels.triangles import _deg_oriented, _four_cliques
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    spark = pairs.sparkSession
    blocks: set = set()
    und, _b = checkpoint_tracked(
        pairs.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    blocks |= _b
    n_und = und.count()  # pin before the six-reference clique plan fans out
    directed, _b = checkpoint_tracked(_deg_oriented(und))
    blocks |= _b
    arr = F.array_sort(F.array("x", "y", "z", "d"))
    # checkpoint the clique table too: it feeds the 4-face incidence AND
    # the final membership join (as a raw plan the six-join enumeration
    # would run twice)
    fc, _b = checkpoint_tracked(
        _four_cliques(directed)
        .select(arr.alias("vs"))
        .select(
            F.concat_ws(
                ":",
                *[
                    F.lpad(F.element_at("vs", i).cast("string"), 19, "0")
                    for i in (1, 2, 3, 4)
                ],
            ).alias("tid"),
            "vs",
        )
    )
    blocks |= _b

    def face(i, j, k):
        return F.concat_ws(
            ":",
            F.lpad(F.element_at("vs", i).cast("string"), 19, "0"),
            F.lpad(F.element_at("vs", j).cast("string"), 19, "0"),
            F.lpad(F.element_at("vs", k).cast("string"), 19, "0"),
        )

    inc = (
        fc.select("tid", face(1, 2, 3).alias("e"))
        .unionAll(fc.select("tid", face(1, 2, 4).alias("e")))
        .unionAll(fc.select("tid", face(1, 3, 4).alias("e")))
        .unionAll(fc.select("tid", face(2, 3, 4).alias("e")))
    )
    labels, it, converged, metrics, st_lab = _percolate(
        spark, inc, n_und, max_iterations
    )
    members = (
        fc.join(labels, "tid")
        .select(F.explode("vs").alias("id"), F.col("label").alias("community"))
        .distinct()
        .localCheckpoint()
    )
    st_lab.release()
    free_tracked(spark.sparkContext, blocks)
    return CpmResult(
        memberships=members, iterations=it, converged=converged, metrics=metrics
    )


def clique_percolation4_sql(unroll: int = 8, pairs_rel: str = "edges") -> str:
    """DuckDB oracle body: id-ordered K4 enumeration over ``pairs_rel``
    (``edges``-style src/dst columns when "edges", else a derived pair
    relation with columns a, b), identical face-relay hash-min, unrolled."""

    def lp(x):
        return f"lpad(CAST({x} AS VARCHAR), 19, '0')"

    if pairs_rel == "edges":
        und_src = """SELECT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst GROUP BY 1, 2"""
    else:
        und_src = f"""SELECT least(a, b) AS a, greatest(a, b) AS b
      FROM {pairs_rel} WHERE a <> b GROUP BY 1, 2"""

    tid = " || ':' || ".join(lp(c) for c in ("t.a", "t.b", "t.c", "p1.b"))
    ctes = [
        f"""cp4_und AS MATERIALIZED (
      {und_src}
    )""",
        """cp4_tri AS MATERIALIZED (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM cp4_und e1
      JOIN cp4_und e2 ON e1.b = e2.a
      JOIN cp4_und e3 ON e3.a = e1.a AND e3.b = e2.b
    )""",
        f"""cp4_k4 AS MATERIALIZED (
      SELECT {tid} AS tid, t.a, t.b, t.c, p1.b AS d
      FROM cp4_tri t
      JOIN cp4_und p1 ON p1.a = t.a AND p1.b > t.c
      JOIN cp4_und p2 ON p2.a = t.b AND p2.b = p1.b
      JOIN cp4_und p3 ON p3.a = t.c AND p3.b = p1.b
    )""",
        f"""cp4_inc AS MATERIALIZED (
      SELECT tid, {lp('a')} || ':' || {lp('b')} || ':' || {lp('c')} AS e FROM cp4_k4
      UNION ALL SELECT tid, {lp('a')} || ':' || {lp('b')} || ':' || {lp('d')} FROM cp4_k4
      UNION ALL SELECT tid, {lp('a')} || ':' || {lp('c')} || ':' || {lp('d')} FROM cp4_k4
      UNION ALL SELECT tid, {lp('b')} || ':' || {lp('c')} || ':' || {lp('d')} FROM cp4_k4
    )""",
        "cp4_l0 AS (SELECT DISTINCT tid, tid AS label FROM cp4_inc)",
    ]
    for k in range(1, unroll + 1):
        ctes.append(
            f"""cp4_l{k} AS MATERIALIZED (
      SELECT l.tid, least(l.label, coalesce(n.new, l.label)) AS label
      FROM cp4_l{k - 1} l
      LEFT JOIN (
        SELECT i2.tid, min(em.elab) AS new
        FROM cp4_inc i2
        JOIN (
          SELECT i.e, min(p.label) AS elab
          FROM cp4_inc i JOIN cp4_l{k - 1} p ON p.tid = i.tid
          GROUP BY i.e
        ) em ON em.e = i2.e
        GROUP BY i2.tid
      ) n ON n.tid = l.tid
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT DISTINCT v.id, l.label AS community
    FROM cp4_k4 t
    JOIN cp4_l{unroll} l ON l.tid = t.tid
    CROSS JOIN LATERAL (VALUES (t.a), (t.b), (t.c), (t.d)) AS v(id)
    """
