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
    return _triangles_und(_oriented(edges))


def _deg_oriented(und: DataFrame, small: bool = False) -> DataFrame:
    """Orient each undirected edge from its lower-(deg, id) endpoint to the
    higher: → ``[u, w, kw]`` where ``kw`` is the destination's (deg, id)
    struct key (the total order used for wedge/clique enumeration).

    ``small=True`` broadcasts the O(V) degree table into the two attach
    joins — for iterative peels (k-truss) that re-orient a small surviving
    edge set every round under AQE-off pinned confs, where the static
    planner would otherwise sort-merge both attaches per round."""
    # undirected degree of every endpoint (one O(E) agg, iteration-free)
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("degb"))
    if small:
        da, db = F.broadcast(da), F.broadcast(db)
    keyed = und.join(da, "a").join(db, "b")
    ka = F.struct(F.col("dega").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("degb").alias("d"), F.col("b").alias("i"))
    # orient lower-(deg, id) → higher; carry the destination key for the
    # wedge-pair ordering below
    return keyed.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(ka < kb, kb).otherwise(ka).alias("kw"),
    )


def _keyed_triangles(directed: DataFrame, small: bool = False) -> DataFrame:
    """Key-ordered triangles over :func:`_deg_oriented` edges: → ``[x, y,
    z, kz]`` with key(x) < key(y) < key(z); each triangle appears exactly
    once, anchored at its lowest-key vertex. ``small=True`` broadcasts the
    wedge-closing edge list (peel-loop regime, see :func:`_deg_oriented`)."""
    e1 = directed.select(F.col("u").alias("x"), F.col("w").alias("y"), F.col("kw").alias("ky"))
    e2 = directed.select(F.col("u").alias("x"), F.col("w").alias("z"), F.col("kw").alias("kz"))
    wedges = (
        e1.join(e2, "x")
        .where(F.col("ky") < F.col("kz"))  # each unordered wedge once
        .select("x", "y", "z", "kz")
    )
    closing = directed.select(F.col("u").alias("y"), F.col("w").alias("z"))
    if small:
        closing = F.broadcast(closing)
    return wedges.join(closing, ["y", "z"], "left_semi")


def _triangles_und(und: DataFrame, small: bool = False) -> DataFrame:
    """Triangles over an already-oriented distinct undirected edge list
    [a, b] (a < b) — the loop-friendly entry point (k-truss peels call
    this per round without re-paying the dedup shuffle)."""
    tri = _keyed_triangles(_deg_oriented(und, small=small), small=small)
    lo = F.least("x", "y", "z")
    hi = F.greatest("x", "y", "z")
    return tri.select(
        lo.alias("a"),
        (F.col("x") + F.col("y") + F.col("z") - lo - hi).alias("b"),
        hi.alias("c"),
    )


def _four_clique_members(directed: DataFrame) -> DataFrame:
    """4-clique membership rows ``[id]`` (one per clique per member) over a
    :func:`_deg_oriented` edge list ``[u, w, kw]`` (the caller may persist
    it — this plan references it six times).

    Extends the degree-ordered triangle enumeration one level (the
    Chiba–Nishizeki k-clique pattern): a 4-clique with key order
    k(x) < k(y) < k(z) < k(d) has all six edges oriented low-key →
    high-key, so it is found exactly once by extending the key-ordered
    triangle (x, y, z) with an out-neighbor ``d`` of ``x`` whose key
    exceeds k(z) and that ``y`` and ``z`` also point to (two semi-joins).
    Per-vertex candidate work is C(outdeg⁺, 2) per triangle anchor with
    outdeg⁺ bounded O(√E) by the degree orientation — hubs contribute no
    fan-out, so the enumeration survives power-law degree skew at scale.
    """
    fc = _four_cliques(directed)
    # explode, not a 4-way self-union: a union would re-evaluate the whole
    # clique-join subtree once per member column
    return fc.select(
        F.explode(F.array("x", "y", "z", "d")).alias("id")
    )


def _four_cliques(directed: DataFrame) -> DataFrame:
    """→ one row ``[x, y, z, d]`` per 4-clique (key order — see
    :func:`_four_clique_members`, whose enumeration this is)."""
    tri = _keyed_triangles(directed)
    cand = tri.join(
        directed.select(
            F.col("u").alias("x"), F.col("w").alias("d"), F.col("kw").alias("kd")
        ),
        "x",
    ).where(F.col("kd") > F.col("kz"))
    yd = directed.select(F.col("u").alias("y"), F.col("w").alias("d"))
    zd = directed.select(F.col("u").alias("z"), F.col("w").alias("d"))
    return (
        cand.join(yd, ["y", "d"], "left_semi")
        .join(zd, ["z", "d"], "left_semi")
        .select("x", "y", "z", "d")
    )


def four_cliques_per_vertex(graph: LinkGraph) -> DataFrame:
    """→ ``[id, four_cliques]`` — number of 4-cliques through each vertex
    of the undirected simple graph (0 for vertices in none)."""
    members = _four_clique_members(_deg_oriented(_oriented(graph.edges)))
    counts = members.groupBy("id").agg(F.count("*").alias("four_cliques"))
    return (
        graph.vertices.select("id")
        .join(counts, "id", "left")
        .select("id", F.coalesce("four_cliques", F.lit(0)).alias("four_cliques"))
    )


def four_cliques_over_pairs(pairs: DataFrame) -> DataFrame:
    """→ ``[id, four_cliques]`` over an arbitrary undirected pair list
    ``[a, b]`` (any orientation / duplicates tolerated); the vertex
    universe is the pair endpoints — the entry point for derived graphs
    such as the shared-tool affinity projection, whose co-usage cliques
    are exactly what this counts."""
    # the pair list may be an expensive derived graph (e.g. the bipartite
    # projection join), and the clique enumeration references the oriented
    # edge set six times — pin both once, detach the (vertex-sized) result
    # eagerly, then free the blocks
    und = (
        pairs.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    und.count()  # materialize BEFORE fan-out: the clique plan's parallel
    directed = _deg_oriented(und).persist()
    directed.count()  # stages would otherwise race-populate the cache
    try:
        verts = (
            und.select(F.col("a").alias("id"))
            .union(und.select(F.col("b").alias("id")))
            .distinct()
        )
        counts = _four_clique_members(directed).groupBy("id").agg(
            F.count("*").alias("four_cliques")
        )
        return (
            verts.join(counts, "id", "left")
            .select(
                "id", F.coalesce("four_cliques", F.lit(0)).alias("four_cliques")
            )
            .localCheckpoint()
        )
    finally:
        directed.unpersist()
        und.unpersist()


def four_cliques_sql(pairs_rel: str) -> str:
    """DuckDB oracle body for :func:`four_cliques_over_pairs` —
    ``pairs_rel`` names an in-scope relation with columns ``a, b``
    (id-ordered enumeration: a different but equivalent total order from
    the engine's degree keys)."""
    return f"""
    fc_und AS MATERIALIZED (
      SELECT least(a, b) AS a, greatest(a, b) AS b FROM {pairs_rel}
      WHERE a <> b GROUP BY 1, 2
    ),
    fc_verts AS (
      SELECT a AS id FROM fc_und UNION SELECT b AS id FROM fc_und
    ),
    fc_tri AS (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM fc_und e1
      JOIN fc_und e2 ON e1.b = e2.a
      JOIN fc_und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    fc4 AS (
      SELECT t.a, t.b, t.c, p1.b AS d
      FROM fc_tri t
      JOIN fc_und p1 ON p1.a = t.a AND p1.b > t.c
      JOIN fc_und p2 ON p2.a = t.b AND p2.b = p1.b
      JOIN fc_und p3 ON p3.a = t.c AND p3.b = p1.b
    ),
    fc_mem AS (
      SELECT a AS id FROM fc4
      UNION ALL SELECT b FROM fc4
      UNION ALL SELECT c FROM fc4
      UNION ALL SELECT d FROM fc4
    )
    SELECT v.id, coalesce(m.n, 0) AS four_cliques
    FROM fc_verts v
    LEFT JOIN (SELECT id, count(*) AS n FROM fc_mem GROUP BY id) m USING (id)
    """


def triangles_per_vertex(graph: LinkGraph) -> DataFrame:
    """→ ``DataFrame[id, triangles]`` — number of triangles through each vertex."""
    tris = _triangles(graph.edges)
    # explode, not a 3-way self-union: a union re-evaluates the triangle
    # join subtree once per member column
    members = tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
    counts = members.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        graph.vertices.select("id")
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def clustering_coefficient(graph: LinkGraph) -> DataFrame:
    """→ [id, lcc]: local clustering coefficient — 2·T(v) / (d(v)·(d(v)−1))
    over the undirected simple graph (0.0 for degree < 2), rounded to 6
    decimals. Composes the degree-ordered triangle enumeration (O(√E)
    wedge bound per vertex) with one undirected-degree aggregate — the
    standard graph-quality feature a curation pipeline attaches per node.
    """
    und = _oriented(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    tpv = triangles_per_vertex(graph)
    lcc = F.when(
        F.col("deg") >= 2,
        F.round(
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)), 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        tpv.join(deg, "id", "left")
        .select("id", F.coalesce(lcc, F.lit(0.0)).alias("lcc"))
    )


def clustering_coefficient_sql() -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs + the shared
    triangle CTE shape inlined here for self-containment)."""
    return """
    cc_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    cc_tri AS MATERIALIZED (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM cc_und e1
      JOIN cc_und e2 ON e1.b = e2.a
      JOIN cc_und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    cc_tpv AS (
      SELECT id, count(*) AS t FROM (
        SELECT a AS id FROM cc_tri
        UNION ALL SELECT b FROM cc_tri
        UNION ALL SELECT c FROM cc_tri
      ) GROUP BY id
    ),
    cc_deg AS (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM cc_und UNION ALL SELECT b FROM cc_und
      ) GROUP BY id
    )
    SELECT v.id,
           CASE WHEN coalesce(d.deg, 0) >= 2
                THEN round(2.0 * coalesce(t.t, 0) / (d.deg * (d.deg - 1)), 6)
                ELSE 0.0 END AS lcc
    FROM verts v
    LEFT JOIN cc_deg d ON d.id = v.id
    LEFT JOIN cc_tpv t ON t.id = v.id
    """


def directed_triangle_census(graph: LinkGraph) -> DataFrame:
    """→ one-row ``[cyclic, transitive]`` — the directed 3-cycle count
    (a→b→c→a; each cycle counted once via the min-id rotation a < b AND
    a < c) and the transitive-triangle count (a→b, b→c, a→c; each labeled
    triple is already unique) over distinct simple directed edges.

    In a transcript graph, cyclic triads are closed hand-off loops
    (u→v→w→u turn cycles) and transitive triads are delegation shortcuts
    (u hands to v hands to w, and u also reached w directly) — the classic
    triad-census signal for hierarchy vs reciprocity (Holland & Leinhardt
    lineage, public technique).

    Scale: two hash-join chains over the edge list, wedge-bounded at the
    shared middle vertex — the same hub caution as :func:`~linkgraph_spark.
    kernels.linkpred.adamic_adar` applies (a degree-D hub contributes
    O(D²) wedges; at 100 TB run it on the hub-capped subgraph, the census
    is a topology statistic not a per-row feature)."""
    from linkgraph_spark.kernels.stats import _simple_directed

    e = _simple_directed(graph.edges)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    cyc = (
        e1.join(e2, "b")
        .join(e3, ["c", "a"])
        .where((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .agg(F.count("*").alias("cyclic"))
    )
    e3t = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tr = (
        e1.join(e2, "b")
        .join(e3t, ["a", "c"])
        .agg(F.count("*").alias("transitive"))
    )
    return cyc.crossJoin(tr)


def directed_triangle_census_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return """
    dt_e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    ),
    dt_cyc AS (
      SELECT count(*) AS cyclic
      FROM dt_e e1
      JOIN dt_e e2 ON e2.src = e1.dst
      JOIN dt_e e3 ON e3.src = e2.dst AND e3.dst = e1.src
      WHERE e1.src < e1.dst AND e1.src < e2.dst
    ),
    dt_tr AS (
      SELECT count(*) AS transitive
      FROM dt_e e1
      JOIN dt_e e2 ON e2.src = e1.dst
      JOIN dt_e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT cyclic, transitive FROM dt_cyc CROSS JOIN dt_tr
    """


def square_count(graph: LinkGraph, max_degree: int | None = None) -> DataFrame:
    """→ one-row ``[squares: bigint]`` — the number of 4-cycles (C4
    subgraphs) in the undirected simple graph: ``Σ_{x<y} C(common(x,y), 2)
    / 2`` over all vertex pairs (each square contributes its two opposite
    pairs). The bipartite-flavored motif the triangle family can't see —
    a tool graph full of squares but no triangles is two-mode structure
    (actors sharing tools without talking to each other).

    Scale shape: ONE wedge self-join at the common neighbor (the
    link_scores plan) + a grouped count + one scalar aggregate.
    ``max_degree`` caps which vertices may be wedge CENTERS (the standard
    hub discipline: a degree-D hub contributes C(D, 2) wedges).
    """
    from linkgraph_spark.kernels.components import undirected

    und = undirected(graph.edges)
    nbrs = und.select(F.col("src").alias("m"), F.col("dst").alias("n"))
    if max_degree is not None:
        ok = (
            nbrs.groupBy("m")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") <= max_degree)
            .select("m")
        )
        nbrs = nbrs.join(ok, "m")
    common = (
        nbrs.select("m", F.col("n").alias("x"))
        .join(nbrs.select("m", F.col("n").alias("y")), "m")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("w"))
    )
    return common.agg(
        (F.coalesce(F.sum(F.col("w") * (F.col("w") - 1)), F.lit(0)) / 4)
        .cast("long")
        .alias("squares")
    )


def square_count_sql(max_degree: int | None = None) -> str:
    """DuckDB oracle body for :func:`square_count` (expects ``edges``)."""
    cap = (
        f"""
    sq_ok AS (SELECT src AS m FROM sq_und GROUP BY src
              HAVING count(*) <= {max_degree}),
    sq_nb AS (SELECT src AS m, dst AS n FROM sq_und JOIN sq_ok ON sq_ok.m = sq_und.src),"""
        if max_degree is not None
        else """
    sq_nb AS (SELECT src AS m, dst AS n FROM sq_und),"""
    )
    return f"""
    sq_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    ),{cap}
    sq_common AS (
      SELECT a.n AS x, b.n AS y, count(*) AS w
      FROM sq_nb a JOIN sq_nb b ON a.m = b.m AND a.n < b.n
      GROUP BY 1, 2
    )
    SELECT CAST(coalesce(sum(w * (w - 1)), 0) / 4 AS BIGINT) AS squares
    FROM sq_common
    """


def clustering_by_degree(graph: LinkGraph) -> DataFrame:
    """→ ``[deg, n_vertices, avg_lcc]`` — the Watts–Strogatz C(k) curve:
    mean local clustering coefficient per undirected degree. A flat
    curve is random-graph-like mixing; a falling ``C(k) ~ k⁻¹`` is the
    hierarchical-modularity signature (Ravasz–Barabási) — dense small
    modules glued by sparse hubs — and the curve's knee pins which
    degree band the modules live in. The per-degree readout of
    :func:`clustering_coefficient`'s per-vertex labels.

    Scale shape: the degree-ordered triangle enumeration (O(√E) wedge
    bound), one undirected-degree aggregate, one O(V) join, then the
    tiny degree-keyed histogram aggregate (vertex-level lcc is rounded
    to 6dp first, exactly as the per-vertex operator emits it).
    """
    und = _oriented(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    lcc = clustering_coefficient(graph)
    j = lcc.join(deg, "id", "left").select(
        F.coalesce("deg", F.lit(0)).alias("deg"), "lcc"
    )
    return j.groupBy("deg").agg(
        F.count("*").alias("n_vertices"),
        F.round(F.avg("lcc"), 6).alias("avg_lcc"),
    )


def clustering_by_degree_sql() -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs in scope)."""
    return """
    cd_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    cd_tri AS MATERIALIZED (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM cd_und e1
      JOIN cd_und e2 ON e1.b = e2.a
      JOIN cd_und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    cd_tpv AS (
      SELECT id, count(*) AS t FROM (
        SELECT a AS id FROM cd_tri
        UNION ALL SELECT b FROM cd_tri
        UNION ALL SELECT c FROM cd_tri
      ) GROUP BY id
    ),
    cd_deg AS (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM cd_und UNION ALL SELECT b FROM cd_und
      ) GROUP BY id
    ),
    cd_lcc AS (
      SELECT v.id, coalesce(d.deg, 0) AS deg,
             CASE WHEN coalesce(d.deg, 0) >= 2
                  THEN round(2.0 * coalesce(t.t, 0)
                             / (d.deg * (d.deg - 1)), 6)
                  ELSE 0.0 END AS lcc
      FROM verts v
      LEFT JOIN cd_deg d ON d.id = v.id
      LEFT JOIN cd_tpv t ON t.id = v.id
    )
    SELECT deg, count(*) AS n_vertices, round(avg(lcc), 6) AS avg_lcc
    FROM cd_lcc GROUP BY deg
    """


def barrat_clustering(graph: LinkGraph) -> DataFrame:
    """→ ``[id, k, strength, cw]`` — the Barrat et al. (PNAS 2004)
    weighted local clustering coefficient over the symmetrised weighted
    graph (undirected edge weight = summed multiplicity of both
    directions): ``c_w(v) = 1/(s_v·(k_v−1)) · Σ_{triangles (v,j,h)}
    (w_vj + w_vh)/2``. Against the unweighted
    :func:`clustering_coefficient`, ``cw > lcc`` says a vertex's
    triangles carry its HEAVY edges (cohesive community traffic),
    ``cw < lcc`` that its weight flows down tree-like spokes while the
    triangles are incidental — the distinction a weighted-graph
    sampler or community detector actually cares about. Requires
    ``build_graph(..., weighted=True)``; vertices with k < 2 emit 0.0.

    Scale shape: the degree-ordered triangle enumeration with the two
    v-incident weights carried through (explode to per-member rows —
    the same one-pass trick as :func:`triangles_per_vertex`), plus one
    strength/degree aggregate and an O(V) join.
    """
    if "weight" not in graph.edges.columns:
        raise ValueError("barrat_clustering needs a weighted graph "
                         "(build_graph(..., weighted=True))")
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("weight").cast("double").alias("w"))
    )
    e1 = und.select("a", "b", F.col("w").alias("w_ab"))
    e2 = und.select(
        F.col("a").alias("b"), F.col("b").alias("c"), F.col("w").alias("w_bc")
    )
    e3 = und.select(
        F.col("a").alias("a3"), F.col("b").alias("c3"), F.col("w").alias("w_ac")
    )
    tri = (
        e1.join(e2, "b")
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c", "w_ab", "w_bc", "w_ac")
    )
    # ordered-pair sum: each triangle contributes (w_ij + w_ih) at vertex i
    # ((w_ij+w_ih)/2 summed over BOTH orders of (j,h)) — with uniform
    # weights this reduces exactly to the unweighted lcc
    member = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("id"), (F.col("w_ab") + F.col("w_ac")).alias("x")),
                F.struct(F.col("b").alias("id"), (F.col("w_ab") + F.col("w_bc")).alias("x")),
                F.struct(F.col("c").alias("id"), (F.col("w_bc") + F.col("w_ac")).alias("x")),
            )
        ).alias("m")
    ).select("m.id", "m.x")
    tw = member.groupBy("id").agg(F.sum("x").alias("tw"))
    both = und.select("a", "b", "w").unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    sk = both.groupBy(F.col("a").alias("id")).agg(
        F.count("*").alias("k"), F.sum("w").alias("s")
    )
    cw = F.when(
        (F.col("k") >= 2) & (F.col("s") > 0),
        F.round(
            F.coalesce("tw", F.lit(0.0)) / (F.col("s") * (F.col("k") - 1)), 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        graph.vertices.select("id")
        .join(sk, "id", "left")
        .join(tw, "id", "left")
        .select(
            "id",
            F.coalesce("k", F.lit(0)).alias("k"),
            F.round(F.coalesce("s", F.lit(0.0)), 6).alias("strength"),
            F.coalesce(cw, F.lit(0.0)).alias("cw"),
        )
    )


def barrat_clustering_sql() -> str:
    """DuckDB oracle body (expects ``verts`` + ``edges_w`` CTEs in scope)."""
    return """
    bw_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             CAST(sum(weight) AS DOUBLE) AS w
      FROM edges_w WHERE src <> dst GROUP BY 1, 2
    ),
    bw_tri AS MATERIALIZED (
      SELECT e1.a, e1.b, e2.b AS c, e1.w AS w_ab, e2.w AS w_bc, e3.w AS w_ac
      FROM bw_und e1
      JOIN bw_und e2 ON e2.a = e1.b
      JOIN bw_und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    bw_tw AS (
      SELECT id, sum(x) AS tw FROM (
        SELECT a AS id, w_ab + w_ac AS x FROM bw_tri
        UNION ALL SELECT b, w_ab + w_bc FROM bw_tri
        UNION ALL SELECT c, w_bc + w_ac FROM bw_tri
      ) GROUP BY id
    ),
    bw_sk AS (
      SELECT id, count(*) AS k, sum(w) AS s FROM (
        SELECT a AS id, w FROM bw_und UNION ALL SELECT b, w FROM bw_und
      ) GROUP BY id
    )
    SELECT v.id,
           coalesce(sk.k, 0) AS k,
           round(coalesce(sk.s, 0.0), 6) AS strength,
           CASE WHEN coalesce(sk.k, 0) >= 2 AND sk.s > 0
                THEN round(coalesce(t.tw, 0.0) / (sk.s * (sk.k - 1)), 6)
                ELSE 0.0 END AS cw
    FROM verts v
    LEFT JOIN bw_sk sk ON sk.id = v.id
    LEFT JOIN bw_tw t ON t.id = v.id
    """
