"""k-truss decomposition: edge triangle support + iterative peel.

The k-truss is the maximal subgraph in which every (undirected) edge
participates in at least k−2 triangles — the standard cohesive-subgraph
refinement of triangle counting (the "dense collaboration cores" a graph
curation pipeline extracts where k-core is too permissive). Engine
addition over the reference (which has no subgraph mining at all; its one
kernel is PageRank — ``pagerank_lambda/dynamodb/pagerank.py``).

Scale shape: each peel round is one degree-ordered triangle enumeration
(``kernels/triangles.py`` — wedge fan-out bounded O(√E) per vertex by the
arboricity orientation, hub-safe) + one groupBy on edge keys + one filter.
Rounds are monotone (the edge set only shrinks), state is the edge list
itself, rotated through ``localCheckpoint`` so lineage stays flat, and the
drop count rides the same materialization via ``observe()`` — one Spark
job per round. Worst-case rounds = peel depth (tiny in practice: the
densest SNAP graphs converge in < 20).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.kernels.triangles import _oriented, _triangles_und
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class TrussResult:
    edges: DataFrame  # [a: long, b: long, support: long] surviving edges, a < b
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def _support_und(und: DataFrame, small: bool = False) -> DataFrame:
    """→ [a, b, support] for EVERY edge of the oriented list ``und``
    (a < b): the number of triangles the edge closes (0 included)."""
    tri = _triangles_und(und, small=small)
    tri_edges = (
        tri.select("a", "b")
        .unionAll(tri.select("a", F.col("c").alias("b")))
        .unionAll(tri.select(F.col("b").alias("a"), F.col("c").alias("b")))
    )
    sup = tri_edges.groupBy("a", "b").agg(F.count("*").alias("t"))
    return und.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce("t", F.lit(0)).alias("support")
    )


def edge_support(graph: LinkGraph) -> DataFrame:
    """→ [a, b, support] — triangle support of every undirected simple
    edge (a < b by id). Round 1 of the peel, useful standalone as the
    per-edge cohesion feature."""
    return _support_und(_oriented(graph.edges))


def k_truss(graph: LinkGraph, k: int, max_iterations: int = 50) -> TrussResult:
    """→ the k-truss: repeatedly drop edges with support < k−2 and
    recount until no edge drops (or ``max_iterations``). ``converged``
    is False on a cap stop; ``edges`` carries each surviving edge with
    its support as of the last recount."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k-2 >= 1 triangle per edge)")
    if max_iterations < 1:
        raise ValueError("k-truss needs max_iterations >= 1 (the result carries support)")
    spark = graph.edges.sparkSession
    thresh = k - 2
    state = RotatingState(spark)
    n_edges = graph.edges.count()
    cur = state.rotate(_oriented(graph.edges))
    converged = False
    metrics: list = []
    it = 0
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big:
        for it in range(1, max_iterations + 1):
            sup = _support_und(cur.select("a", "b"), small=not big)
            from pyspark.sql import Observation

            obs = Observation(f"truss_drop_{id(state)}_{it}")
            sup = sup.observe(
                obs,
                F.sum(F.when(F.col("support") < thresh, 1).otherwise(0)).alias("d"),
            )
            keep = sup.where(F.col("support") >= thresh)
            keep = state.rotate(keep)  # one job: materialize + drop count
            dropped = obs.get["d"] or 0
            metrics.append({"iteration": it, "dropped": dropped})
            cur = keep
            if dropped == 0:
                converged = True
                break

    return TrussResult(
        edges=cur, iterations=it, converged=converged, metrics=metrics
    )


_TRI_SQL = """(
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM {t} e1
      JOIN {t} e2 ON e1.b = e2.a
      JOIN {t} e3 ON e3.a = e1.a AND e3.b = e2.b
    )"""


def _sup_sql(prev: str, this: str) -> str:
    """One support-count CTE over edge set ``prev`` → ``this`` [a,b,support]."""
    tri = _TRI_SQL.format(t=prev)
    return f"""{this} AS MATERIALIZED (
      SELECT e.a, e.b, coalesce(s.t, 0) AS support
      FROM {prev} e
      LEFT JOIN (
        SELECT a, b, count(*) AS t FROM (
          SELECT a, b FROM {tri} x
          UNION ALL SELECT a, c AS b FROM {tri} y
          UNION ALL SELECT b AS a, c AS b FROM {tri} z
        ) GROUP BY a, b
      ) s ON s.a = e.a AND s.b = e.b
    )"""


def edge_support_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    und = """ts_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    )"""
    return f"""{und},
    {_sup_sql("ts_und", "ts_sup")}
    SELECT a, b, support FROM ts_sup
    """


def k_truss_sql(k: int, rounds: int) -> str:
    """DuckDB oracle body for ``k_truss(..., max_iterations=rounds)``.

    Unrolls exactly ``rounds`` peel iterations; because the peel is
    idempotent at its fixpoint, this matches the Spark kernel whether it
    converged early or ran all ``rounds``."""
    thresh = k - 2
    parts = [
        """kt0 AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(_sup_sql(f"kt{i - 1}", f"kts{i}"))
        parts.append(
            f"kt{i} AS MATERIALIZED (SELECT a, b, support FROM kts{i} WHERE support >= {thresh})"
        )
    body = ",\n    ".join(parts)
    return f"""{body}
    SELECT a, b, support FROM kt{rounds}
    """


def local_bridges(graph: LinkGraph) -> DataFrame:
    """→ [a, b, deg_a, deg_b] — the LOCAL BRIDGES of the undirected simple
    graph: edges whose endpoints share no common neighbor (triangle
    support 0, i.e. span > 2 in Easley–Kleinberg's sense). These are the
    weak-tie shortcuts between otherwise-disjoint neighborhoods — the
    edges whose removal most lengthens local paths, and the classic
    candidates for "information brokerage" features. Endpoint degrees
    ride along so a consumer can rank bridges by the mass they connect.
    Engine addition (the reference has no structural edge features).

    Scale shape: reuses :func:`edge_support`'s oriented triangle
    enumeration (hub-oriented join, no cartesian), filters support = 0,
    and attaches degrees from one O(E) count aggregate — two hash joins,
    no window, no iteration.
    """
    und = _oriented(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    zero = _support_und(und).where(F.col("support") == 0).select("a", "b")
    return (
        zero.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select("a", "b", "deg_a", "deg_b")
    )


def local_bridges_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    und = """lb_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    )"""
    return f"""{und},
    {_sup_sql("lb_und", "lb_sup")},
    lb_deg AS (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM lb_und UNION ALL SELECT b AS id FROM lb_und
      ) GROUP BY id
    )
    SELECT s.a, s.b, da.deg AS deg_a, db.deg AS deg_b
    FROM lb_sup s
    JOIN lb_deg da ON da.id = s.a
    JOIN lb_deg db ON db.id = s.b
    WHERE s.support = 0
    """


def edge_ecc(graph: LinkGraph) -> DataFrame:
    """→ ``[a, b, support, ecc]`` — Radicchi's edge clustering coefficient
    (Radicchi et al., PNAS 2004): ecc(u,v) = (z_uv + 1) / min(k_u − 1,
    k_v − 1) over the simple undirected graph, where z is the edge's
    triangle support and k the undirected degree. Low-ecc edges are the
    inter-community bridges Radicchi's divisive algorithm cuts first —
    this is the scoring pass, the per-edge complement of
    :func:`edge_support` (raw z) and the truss peel (thresholded z).
    Edges where min(k)−1 = 0 (a leaf endpoint can't close a triangle)
    emit NULL, matching the formula's undefined case.

    Scale shape: the same oriented triangle-support join as
    :func:`edge_support` plus one endpoint-explode degree agg and two
    degree-attach equi-joins. No windows, no driver loop.
    """
    und = _oriented(graph.edges)
    sup = _support_und(und)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    denom = F.least(F.col("deg_a"), F.col("deg_b")) - F.lit(1)
    return (
        sup.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "support",
            F.round(
                F.when(denom > 0, (F.col("support") + F.lit(1.0)) / denom), 6
            ).alias("ecc"),
        )
    )


def edge_ecc_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    und = """ec_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    )"""
    return f"""{und},
    {_sup_sql("ec_und", "ec_sup")},
    ec_deg AS (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM ec_und UNION ALL SELECT b AS id FROM ec_und
      ) GROUP BY id
    )
    SELECT s.a, s.b, s.support,
           CASE WHEN least(da.deg, db.deg) - 1 > 0
                THEN round((s.support + 1.0) / (least(da.deg, db.deg) - 1), 6)
           END AS ecc
    FROM ec_sup s
    JOIN ec_deg da ON da.id = s.a
    JOIN ec_deg db ON db.id = s.b
    """


def edge_dispersion(graph: LinkGraph, max_embeddedness: int = 64) -> DataFrame:
    """:func:`edge_dispersion_over_pairs` over the graph's own edge list
    (see there for semantics). On the raw actor graph every edge closes at
    most one triangle (tool stars make disjoint wedges), so the registry
    gates the operator on the denser shared-tool affinity projection
    instead — same pattern as the K4 census."""
    return edge_dispersion_over_pairs(
        graph.edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        max_embeddedness=max_embeddedness,
    )


def edge_dispersion_over_pairs(
    pairs: DataFrame, max_embeddedness: int = 64
) -> DataFrame:
    """→ ``[a, b, embeddedness, dispersion, norm_dispersion]`` — the
    absolute dispersion of each undirected edge (Backstrom & Kleinberg,
    WSDM 2014, simplified to the "common neighbors not directly linked"
    form) over an arbitrary pair list ``[a, b]`` (any orientation,
    duplicates tolerated): embeddedness = |common neighbors of a and b|;
    dispersion = the number of common-neighbor PAIRS (s, t) with no s–t
    edge. High dispersion at modest embeddedness is the cross-context
    tie signature — the endpoints share neighbors drawn from several
    otherwise-unconnected circles — where plain embeddedness
    (:func:`edge_support`) can't tell a clique tie from a
    bridge-of-circles tie.

    Only edges with embeddedness in [2, ``max_embeddedness``] are
    emitted: below 2 there is no pair to measure; above the cap the
    C(emb, 2) pair fan-out is the quadratic blow-up a 100 TB run must
    bound (same hot-cap discipline as the capped shingle join). The cap
    drops only near-clique edges, whose dispersion is ~0 by definition.

    Scale shape: the wedge equi-join for common neighbors, one
    (a, b)-keyed count, the pair self-join RESTRICTED to capped edges,
    one anti-probe against the edge set, two hash aggregates. The input
    may be an expensive derived projection and is referenced five times,
    so it is pinned once and freed after an eager detach (the K4-census
    lifecycle). No cartesian, no iteration.
    """
    if max_embeddedness < 2:
        raise ValueError("max_embeddedness must be >= 2")
    und = (
        pairs.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    und.count()  # materialize BEFORE the fan-out (cache-race discipline)
    try:
        nbr = und.select(F.col("a").alias("u"), F.col("b").alias("n")).unionAll(
            und.select(F.col("b").alias("u"), F.col("a").alias("n"))
        )
        cn = und.join(
            nbr.select(F.col("u").alias("a"), F.col("n").alias("c")), "a"
        ).join(nbr.select(F.col("u").alias("b"), F.col("n").alias("c")), ["b", "c"])
        emb = cn.groupBy("a", "b").agg(F.count("*").alias("embeddedness"))
        keep = emb.where(
            (F.col("embeddedness") >= 2)
            & (F.col("embeddedness") <= max_embeddedness)
        )
        cnk = cn.join(keep.select("a", "b"), ["a", "b"])
        cpairs = (
            cnk.select("a", "b", F.col("c").alias("s"))
            .join(cnk.select("a", "b", F.col("c").alias("t")), ["a", "b"])
            .where(F.col("s") < F.col("t"))
        )
        conn = und.select(F.col("a").alias("s"), F.col("b").alias("t")).withColumn(
            "_e", F.lit(1)
        )
        disp = (
            cpairs.join(conn, ["s", "t"], "left")
            .groupBy("a", "b")
            .agg(
                F.sum(F.when(F.col("_e").isNull(), 1).otherwise(0)).alias(
                    "dispersion"
                )
            )
        )
        npairs = F.col("embeddedness") * (F.col("embeddedness") - 1) / 2
        return (
            keep.join(disp, ["a", "b"])
            .select(
                "a",
                "b",
                "embeddedness",
                "dispersion",
                F.round(F.col("dispersion") / npairs, 6).alias("norm_dispersion"),
            )
            .localCheckpoint()
        )
    finally:
        und.unpersist()


def edge_dispersion_sql(pairs_rel: str, max_embeddedness: int = 64) -> str:
    """DuckDB oracle body for :func:`edge_dispersion_over_pairs` —
    ``pairs_rel`` names an in-scope relation with columns ``a, b``."""
    return f"""ed_und AS MATERIALIZED (
      SELECT least(a, b) AS a, greatest(a, b) AS b FROM {pairs_rel}
      WHERE a <> b GROUP BY 1, 2
    ),
    ed_nbr AS MATERIALIZED (
      SELECT a AS u, b AS n FROM ed_und
      UNION ALL SELECT b AS u, a AS n FROM ed_und
    ),
    ed_cn AS MATERIALIZED (
      SELECT e.a, e.b, x.n AS c
      FROM ed_und e
      JOIN ed_nbr x ON x.u = e.a
      JOIN ed_nbr y ON y.u = e.b AND y.n = x.n
    ),
    ed_emb AS (
      SELECT a, b, count(*) AS embeddedness FROM ed_cn GROUP BY a, b
    ),
    ed_keep AS MATERIALIZED (
      SELECT * FROM ed_emb
      WHERE embeddedness BETWEEN 2 AND {int(max_embeddedness)}
    ),
    ed_cnk AS MATERIALIZED (
      SELECT c.* FROM ed_cn c JOIN ed_keep k ON k.a = c.a AND k.b = c.b
    ),
    ed_disp AS (
      SELECT p.a, p.b,
             sum(CASE WHEN u.a IS NULL THEN 1 ELSE 0 END) AS dispersion
      FROM (
        SELECT x.a, x.b, x.c AS s, y.c AS t
        FROM ed_cnk x JOIN ed_cnk y ON y.a = x.a AND y.b = x.b AND x.c < y.c
      ) p
      LEFT JOIN ed_und u ON u.a = p.s AND u.b = p.t
      GROUP BY p.a, p.b
    )
    SELECT k.a, k.b, k.embeddedness,
           CAST(d.dispersion AS BIGINT) AS dispersion,
           round(d.dispersion / (k.embeddedness * (k.embeddedness - 1) / 2.0), 6)
             AS norm_dispersion
    FROM ed_keep k JOIN ed_disp d ON d.a = k.a AND d.b = k.b
    """
