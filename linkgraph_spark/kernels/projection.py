"""Co-occurrence projection: the shared-tool affinity graph.

Tool actors are the global connectors of the transcript graph (every
conversation that invokes ``tool:X`` touches the same vertex). Projecting
over them — "connect two conversation actors iff they invoked the same
tool, weighted by how many tools they share" — is the classic bipartite
projection (actor × tool → actor × actor), the affinity signal that feeds
clustering and recommendation downstream.

Scale shape: the projection's fan-out at tool t is C(users(t), 2) — the
SAME quadratic hub risk as wedge enumeration in link prediction, and the
same remedy (``kernels/linkpred.py``): ``max_tool_users`` drops tools
whose audience exceeds the cap BEFORE the self-join, bounding every
tool's contribution to C(cap, 2) pairs. A ubiquitous tool shared by 10^7
actors carries no affinity signal anyway (it's the stopword of tools) —
capping is both the performance and the relevance fix. The gate runs
capped; ``None`` gives the exact uncapped projection for small graphs.
Everything else is distinct + equi-join + count: one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph

TOOL_PREFIX = "tool:"


def shared_tool_affinity(
    graph: LinkGraph,
    max_tool_users: int | None = None,
    min_shared: int = 1,
) -> DataFrame:
    """→ ``[a, b, shared_tools]`` (a < b by id): pairs of non-tool actors
    that invoked at least ``min_shared`` common tools. ``max_tool_users``
    excludes tools with a larger distinct audience (hub cap — see module
    docstring)."""
    tools = graph.vertices.where(
        F.col("actor_key").startswith(TOOL_PREFIX)
    ).select(F.col("id").alias("tool_id"))
    # distinct (user, tool) memberships: who invoked what
    member = (
        graph.edges.join(
            tools.withColumnRenamed("tool_id", "dst"), "dst", "left_semi"
        )
        .select(F.col("src").alias("user"), F.col("dst").alias("tool"))
        .distinct()
    )
    if max_tool_users is not None:
        audible = (
            member.groupBy("tool")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") <= max_tool_users)
            .select("tool")
        )
        member = member.join(audible, "tool", "left_semi")
    m1 = member.select(F.col("user").alias("a"), "tool")
    m2 = member.select(F.col("user").alias("b"), "tool")
    pairs = (
        m1.join(m2, "tool")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared_tools"))
    )
    if min_shared > 1:
        pairs = pairs.where(F.col("shared_tools") >= min_shared)
    return pairs


def shared_tool_affinity_sql(
    max_tool_users: int | None = None, min_shared: int = 1,
    cte_name: str | None = None,
) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs in scope).
    With ``cte_name``, the pair projection is emitted as a named CTE
    instead of the final SELECT, for composition (e.g. the 4-clique
    oracle enumerates over it)."""
    cap = (
        f"""pj_keep AS (
      SELECT tool FROM pj_member GROUP BY tool HAVING count(*) <= {max_tool_users}
    ),
    pj_m AS (SELECT m.* FROM pj_member m JOIN pj_keep k USING (tool))"""
        if max_tool_users is not None
        else "pj_m AS (SELECT * FROM pj_member)"
    )
    having = f"HAVING count(*) >= {min_shared}" if min_shared > 1 else ""
    select = f"""SELECT m1."user" AS a, m2."user" AS b, count(*) AS shared_tools
    FROM pj_m m1 JOIN pj_m m2 ON m1.tool = m2.tool AND m1."user" < m2."user"
    GROUP BY 1, 2
    {having}"""
    # a named CTE needs a comma after the preceding cap CTE; the plain
    # final SELECT does not
    tail = (
        f", {cte_name} AS MATERIALIZED ({select})"
        if cte_name is not None
        else select
    )
    return f"""
    pj_member AS MATERIALIZED (
      SELECT DISTINCT e.src AS "user", e.dst AS tool
      FROM edges e
      JOIN verts v ON v.id = e.dst
      WHERE v.actor_key LIKE 'tool:%'
    ),
    {cap}
    {tail}
    """


def contract_vertices(graph: LinkGraph) -> DataFrame:
    """→ [src_group, dst_group, n_edges, n_src, n_dst] — the host-graph
    contraction of the link graph: every vertex collapses to its GROUP
    (for conversation actors ``conv#role`` the role suffix; for global
    ``tool:X`` actors the full key), and edges re-aggregate to
    group-level weights with distinct-endpoint counts. The web-graph
    analogue is page graph → host graph (Broder et al. 2000 report the
    bow-tie at both granularities; Boldi–Vigna's host graphs are the
    standard PageRank preconditioner) — the first thing an operator does
    to a billion-page crawl to see its macro flow. Intra-group edges are
    kept as self-loop rows (``src_group = dst_group``): the intra-host
    mass is the signal, not noise.

    Scale shape: the group key is a scalar projection on the vertex
    table (no extra table), attached to edges by the same two hash joins
    every labelled-edge op uses; the rollup is one aggregate onto
    |groups|² cells with map-side combine. Distinct-endpoint counts ride
    the SAME aggregate (two count-distincts, Spark expands them in one
    pass). No window, no iteration.
    """
    grp = F.when(
        F.col("actor_key").contains("#"),
        F.element_at(F.split(F.col("actor_key"), "#"), 2),
    ).otherwise(F.col("actor_key"))
    vmap = graph.vertices.select("id", grp.alias("_grp"))
    e2 = (
        graph.edges.select("src", "dst")
        .join(
            vmap.select(F.col("id").alias("src"), F.col("_grp").alias("src_group")),
            "src",
        )
        .join(
            vmap.select(F.col("id").alias("dst"), F.col("_grp").alias("dst_group")),
            "dst",
        )
    )
    return e2.groupBy("src_group", "dst_group").agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("src").alias("n_src"),
        F.countDistinct("dst").alias("n_dst"),
    )


def contract_vertices_sql() -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs in scope)."""
    return """
    cv_map AS (
      SELECT id,
             CASE WHEN position('#' IN actor_key) > 0
                  THEN split_part(actor_key, '#', 2)
                  ELSE actor_key END AS grp
      FROM verts
    )
    SELECT ms.grp AS src_group, md.grp AS dst_group,
           count(*) AS n_edges,
           count(DISTINCT e.src) AS n_src,
           count(DISTINCT e.dst) AS n_dst
    FROM edges e
    JOIN cv_map ms ON ms.id = e.src
    JOIN cv_map md ON md.id = e.dst
    GROUP BY 1, 2
    """
