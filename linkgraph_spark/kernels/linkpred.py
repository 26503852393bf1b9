"""Link prediction over the undirected actor graph (engine extension).

Adamic–Adar: for each non-adjacent pair (x, y), score = Σ_z 1/ln(deg(z))
over common neighbors z. The classic common-neighbor family (AA / Jaccard /
common-count) shares one plan: a wedge self-join at the common neighbor —
the same shape as triangle counting, so the same scale discipline applies:

- wedge fan-out at z is C(deg(z), 2); ``max_degree`` caps the degree of
  vertices allowed to GENERATE wedges (a 10^8-degree tool hub would emit
  10^16 candidate pairs; capping hubs is standard practice — a hub shared
  by everyone carries ~zero AA evidence anyway, 1/ln(10^8) per pair);
- existing edges are removed with one left-anti join;
- output is top-k per vertex (a bounded result, not the O(V²) score
  matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.kernels.components import undirected


def adamic_adar(
    graph: LinkGraph,
    max_degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """→ [vec x, y, score]: Adamic–Adar scores for non-adjacent pairs with
    ≥1 common neighbor, x < y. ``top_k`` keeps the k best candidates per x
    (ties broken by smaller y; scores compared after the 6-decimal round).

    **Defaults are EXACT and only safe on small graphs**: with
    ``max_degree=None`` a single degree-D hub emits C(D, 2) wedges —
    quadratic. Any at-scale run MUST set ``max_degree`` (hubs carry ~zero
    AA evidence) and should set ``top_k`` (bounded output). The gate /
    bench entries run capped; ``adamic_adar_exact`` is the small-graph
    oracle variant."""
    und = undirected(graph.edges)  # symmetric [src, dst]
    deg = und.groupBy(F.col("src").alias("z")).agg(F.count("*").alias("deg"))
    if max_degree is not None:
        deg = deg.where(F.col("deg") <= max_degree)
    # wedges x—z—y through each (degree-capped) common neighbor z
    nbrs = und.select(F.col("src").alias("z"), F.col("dst").alias("n"))
    w1 = nbrs.select("z", F.col("n").alias("x"))
    w2 = nbrs.select("z", F.col("n").alias("y"))
    wedges = (
        w1.join(w2, "z")
        .where(F.col("x") < F.col("y"))
        .join(deg, "z")  # caps + attaches deg(z) in one join
        .groupBy("x", "y")
        .agg(F.round(F.sum(1.0 / F.log("deg")), 6).alias("score"))
    )
    existing = und.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    cand = wedges.join(existing, ["x", "y"], "left_anti")
    if top_k is not None:
        w = Window.partitionBy("x").orderBy(F.desc("score"), F.asc("y"))
        cand = (
            cand.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= top_k)
            .drop("_rk")
        )
    return cand


def link_scores(graph: LinkGraph, max_degree: int | None = None) -> DataFrame:
    """→ [x, y, common, jaccard, adamic_adar, resource_alloc, pref_attach]:
    the classic common-neighbor score family for non-adjacent pairs, ONE
    wedge pass (the five scores share the join; computing them separately
    would quintuple the shuffle). ``resource_alloc`` is Zhou–Lü–Zhang's
    Σ 1/deg(z) (the harder-decaying AA sibling), ``pref_attach`` the
    deg(x)·deg(y) popularity baseline — both fall out of columns already in
    flight, zero extra joins.

    Same scale warning as :func:`adamic_adar`: ``max_degree=None`` is
    exact-but-quadratic at a hub; set it for any at-scale run (the gate /
    bench entries do)."""
    und = undirected(graph.edges)
    deg_all = und.groupBy(F.col("src").alias("z")).agg(F.count("*").alias("deg"))
    zdeg = deg_all
    if max_degree is not None:
        zdeg = zdeg.where(F.col("deg") <= max_degree)
    nbrs = und.select(F.col("src").alias("z"), F.col("dst").alias("n"))
    wedges = (
        nbrs.select("z", F.col("n").alias("x"))
        .join(nbrs.select("z", F.col("n").alias("y")), "z")
        .where(F.col("x") < F.col("y"))
        .join(zdeg, "z")
        .groupBy("x", "y")
        .agg(
            F.count("*").alias("common"),
            F.round(F.sum(1.0 / F.log("deg")), 6).alias("adamic_adar"),
            F.round(F.sum(1.0 / F.col("deg")), 6).alias("resource_alloc"),
        )
    )
    dx = deg_all.select(F.col("z").alias("x"), F.col("deg").alias("degx"))
    dy = deg_all.select(F.col("z").alias("y"), F.col("deg").alias("degy"))
    existing = und.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    jac = F.col("common") / (F.col("degx") + F.col("degy") - F.col("common"))
    return (
        wedges.join(existing, ["x", "y"], "left_anti")
        .join(dx, "x")
        .join(dy, "y")
        .select(
            "x",
            "y",
            "common",
            F.round(jac, 6).alias("jaccard"),
            "adamic_adar",
            "resource_alloc",
            (F.col("degx") * F.col("degy")).alias("pref_attach"),
        )
    )


def link_scores_sql(max_degree: int | None = None) -> str:
    """DuckDB oracle body for :func:`link_scores` (expects ``edges``)."""
    cap = f"WHERE deg <= {max_degree}" if max_degree is not None else ""
    return f"""
    ls_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    ),
    ls_deg AS MATERIALIZED (
      SELECT src AS z, count(*) AS deg FROM ls_und GROUP BY src
    ),
    ls_zdeg AS (SELECT * FROM ls_deg {cap}),
    ls_wedges AS MATERIALIZED (
      SELECT w1.dst AS x, w2.dst AS y,
             count(*) AS common,
             round(sum(1.0 / ln(d.deg)), 6) AS adamic_adar,
             round(sum(1.0 / d.deg), 6) AS resource_alloc
      FROM ls_und w1
      JOIN ls_und w2 ON w1.src = w2.src AND w1.dst < w2.dst
      JOIN ls_zdeg d ON d.z = w1.src
      GROUP BY 1, 2
    )
    SELECT w.x, w.y, w.common,
           round(w.common / CAST(dx.deg + dy.deg - w.common AS DOUBLE), 6) AS jaccard,
           w.adamic_adar, w.resource_alloc,
           dx.deg * dy.deg AS pref_attach
    FROM ls_wedges w
    JOIN ls_deg dx ON dx.z = w.x
    JOIN ls_deg dy ON dy.z = w.y
    LEFT JOIN ls_und e ON e.src = w.x AND e.dst = w.y
    WHERE e.src IS NULL
    """


def neighborhood_overlap(graph: LinkGraph) -> DataFrame:
    """→ [a, b, support, overlap] for every undirected simple edge (a < b):
    Granovetter tie strength. ``support`` is the edge's triangle count and
    ``overlap = support / (deg(a) + deg(b) - 2 - support)`` — the Jaccard
    of the endpoints' neighborhoods with the endpoints themselves excluded
    (Onnela et al. PNAS 2007). NULL when the denominator is 0 (both
    endpoints degree-1: overlap is undefined, not zero).

    Unlike :func:`link_scores` (non-adjacent candidate pairs) this scores
    EXISTING edges — the weak-tie/bridge detector a graph curation pass
    runs before cutting inter-community edges.

    Scale shape: triangle support rides the arboricity-oriented wedge join
    (``kernels/triangles.py`` — hub fan-out bounded O(√E)); the two degree
    attaches are vertex-keyed shuffle joins. No all-pairs anywhere."""
    from linkgraph_spark.kernels.triangles import _oriented
    from linkgraph_spark.kernels.truss import _support_und

    sup = _support_und(_oriented(graph.edges))
    und = undirected(graph.edges)
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    denom = F.col("dega") + F.col("degb") - F.lit(2) - F.col("support")
    return (
        sup.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "support",
            F.when(denom > 0, F.round(F.col("support") / denom, 6))
            .otherwise(F.lit(None).cast("double"))
            .alias("overlap"),
        )
    )


def neighborhood_overlap_sql() -> str:
    """DuckDB oracle body for :func:`neighborhood_overlap` (expects the
    ``edges`` CTE in scope; reuses the truss support CTE builder)."""
    from linkgraph_spark.kernels.truss import _sup_sql

    return f"""
    no_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    {_sup_sql("no_und", "no_sup")},
    no_deg AS MATERIALIZED (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM no_und UNION ALL SELECT b AS id FROM no_und
      ) GROUP BY id
    )
    SELECT s.a, s.b, s.support,
           CASE WHEN da.deg + db.deg - 2 - s.support > 0
                THEN round(s.support / CAST(da.deg + db.deg - 2 - s.support
                                            AS DOUBLE), 6)
                ELSE NULL END AS overlap
    FROM no_sup s
    JOIN no_deg da ON da.id = s.a
    JOIN no_deg db ON db.id = s.b
    """


def adamic_adar_sql(max_degree: int | None = None, top_k: int | None = None) -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    cap = f"WHERE deg <= {max_degree}" if max_degree is not None else ""
    body = f"""
    aa_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    ),
    aa_deg AS MATERIALIZED (
      SELECT * FROM (SELECT src AS z, count(*) AS deg FROM aa_und GROUP BY src) {cap}
    ),
    aa_wedges AS MATERIALIZED (
      SELECT w1.dst AS x, w2.dst AS y,
             round(sum(1.0 / ln(d.deg)), 6) AS score
      FROM aa_und w1
      JOIN aa_und w2 ON w1.src = w2.src AND w1.dst < w2.dst
      JOIN aa_deg d ON d.z = w1.src
      GROUP BY 1, 2
    ),
    aa_cand AS MATERIALIZED (
      SELECT w.x, w.y, w.score
      FROM aa_wedges w
      LEFT JOIN aa_und e ON e.src = w.x AND e.dst = w.y
      WHERE e.src IS NULL
    )"""
    if top_k is None:
        return f"{body}\n    SELECT x, y, score FROM aa_cand\n    "
    return f"""{body}
    SELECT x, y, score FROM (
      SELECT x, y, score,
             row_number() OVER (PARTITION BY x
                                ORDER BY score DESC, y ASC) AS rk
      FROM aa_cand
    ) WHERE rk <= {top_k}
    """
