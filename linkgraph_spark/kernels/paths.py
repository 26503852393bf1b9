"""Frontier-based BFS / unweighted shortest paths (engine extension).

Distances from a source set over the directed edge table. Unlike the
label-exchange kernels, each superstep joins ONLY the frontier (vertices
improved last round) against the edge table, so total work is
O(Σ frontier-adjacent edges) = O(E) across the whole run — the standard
scale trick for sparse traversals (a full-state join per level would be
O(E · diameter)).

Same contract as the other kernels: converged flag, per-iteration metrics,
optional per-level checkpoint/resume, confs pinned per loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs

UNREACHED = 1_000_000_000  # sentinel (mirrored in the SQL oracle)


@dataclass
class PathsResult:
    distances: DataFrame  # [id: long, distance: long] — reachable ids only
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def shortest_paths(
    graph: LinkGraph,
    sources: list,
    max_iterations: int = 50,
    directed: bool = True,
    checkpoint: CheckpointStore | None = None,
    resume: bool = False,
) -> PathsResult:
    """→ BFS hop distance from any of ``sources``.

    ``directed=False`` symmetrizes first (transcript graphs: directed reach
    is conversation-local, while undirected reach crosses conversations
    through shared tool actors)."""
    spark = graph.vertices.sparkSession
    src_set = [int(s) for s in sources]
    state = RotatingState(spark)

    init = graph.vertices.select(
        "id",
        F.when(F.col("id").isin(src_set), F.lit(0))
        .otherwise(F.lit(UNREACHED))
        .cast("long")
        .alias("distance"),
    )
    start = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("bfs")
        if latest is not None:
            init = checkpoint.load_state(spark, "bfs", latest)
            start = latest
    dist = state.rotate(init)

    if directed:
        edges = graph.edges.select("src", "dst")
    else:
        from linkgraph_spark.kernels.components import undirected

        edges = undirected(graph.edges)
    n_edges = graph.edges.count()
    converged = False
    metrics: list = []
    it = start
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        frontier = dist.where(F.col("distance") < UNREACHED)
        for it in range(start + 1, max_iterations + 1):
            # only the frontier's out-edges are touched this level; small
            # graphs broadcast the frontier (bounded by V), big graphs
            # shuffle it (a single level's frontier can be O(V) rows)
            fr = frontier.select(F.col("id").alias("src"), "distance")
            if not big_state:
                fr = F.broadcast(fr)
            cand = (
                edges.join(fr, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg((F.min("distance") + 1).alias("cand"))
            )
            new = dist.join(cand, "id", "left").select(
                "id",
                F.least(F.col("distance"), F.coalesce("cand", F.col("distance"))).alias(
                    "distance"
                ),
                (F.coalesce("cand", F.lit(UNREACHED)) < F.col("distance")).alias(
                    "_improved"
                ),
            )
            from pyspark.sql import Observation

            obs = Observation(f"bfs_improved_{id(state)}_{it}")
            new = new.observe(
                obs, F.sum(F.when(F.col("_improved"), 1).otherwise(0)).alias("n")
            )
            new = state.rotate(new)  # one job: materialize + improved count
            changed = obs.get["n"] or 0
            frontier = new.where(F.col("_improved")).select("id", "distance")
            dist = new.select("id", "distance")
            metrics.append({"iteration": it, "improved": changed})
            if checkpoint is not None:
                checkpoint.write_state(
                    "bfs", it, dist, key_col="id", metrics={"level": it}
                )
            if changed == 0:
                converged = True
                break

    return PathsResult(
        distances=dist.where(F.col("distance") < UNREACHED),
        iterations=it,
        converged=converged,
        metrics=metrics,
    )


def shortest_paths_weighted(
    graph: LinkGraph,
    sources: list,
    max_iterations: int = 50,
) -> PathsResult:
    """→ min-cost distance from ``sources`` along directed weighted edges
    (edge length = ``weight``; requires ``build_graph(weighted=True)``).

    Frontier-based Bellman–Ford: each round relaxes only the out-edges of
    vertices improved last round, so total work is O(E · improved-rounds)
    with the frontier typically collapsing fast; non-negative weights make
    the fixpoint the exact single-source distances. Same converged-flag
    contract as BFS.
    """
    if "weight" not in graph.edges.columns:
        raise ValueError("weighted shortest paths need build_graph(weighted=True)")
    spark = graph.vertices.sparkSession
    src_set = [int(s) for s in sources]
    state = RotatingState(spark)

    dist = state.rotate(
        graph.vertices.select(
            "id",
            F.when(F.col("id").isin(src_set), F.lit(0))
            .otherwise(F.lit(UNREACHED))
            .cast("long")
            .alias("distance"),
        )
    )
    n_edges = graph.edges.count()
    converged = False
    metrics: list = []
    it = 0
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        frontier = dist.where(F.col("distance") < UNREACHED)
        for it in range(1, max_iterations + 1):
            fr = frontier.select(F.col("id").alias("src"), "distance")
            if not big_state:
                fr = F.broadcast(fr)
            cand = (
                graph.edges.join(fr, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.col("distance") + F.col("weight")).alias("cand"))
            )
            new = dist.join(cand, "id", "left").select(
                "id",
                F.least(F.col("distance"), F.coalesce("cand", F.col("distance"))).alias(
                    "distance"
                ),
                (F.coalesce("cand", F.lit(UNREACHED)) < F.col("distance")).alias(
                    "_improved"
                ),
            )
            from pyspark.sql import Observation

            obs = Observation(f"sssp_improved_{id(state)}_{it}")
            new = new.observe(
                obs, F.sum(F.when(F.col("_improved"), 1).otherwise(0)).alias("n")
            )
            new = state.rotate(new)
            changed = obs.get["n"] or 0
            frontier = new.where(F.col("_improved")).select("id", "distance")
            dist = new.select("id", "distance")
            metrics.append({"iteration": it, "improved": changed})
            if changed == 0:
                converged = True
                break

    return PathsResult(
        distances=dist.where(F.col("distance") < UNREACHED),
        iterations=it,
        converged=converged,
        metrics=metrics,
    )


def hub_distance(graph: LinkGraph, k: int = 5, max_iterations: int = 50) -> DataFrame:
    """→ ``[distance, n_vertices]`` — how far the graph sits from its own
    infrastructure: the histogram of undirected BFS hop distance from
    the nearest of the top-``k`` out-degree hubs (degree over the simple
    directed edge list, ties by id ascending; unreached vertices are
    excluded, so the histogram total vs |V| is the hub-unreachable
    count). Mass at distance ≤ 2 says the hubs really do cover the
    graph (a k-seed crawl or cache plan works); a fat tail says
    coverage needs more seeds than the degree ranking suggests.

    Scale shape: a k-row TakeOrdered hub list (O(k) driver collect —
    the BFS init needs literal sources), then the standard multi-source
    frontier BFS (one gather join per round over geometrically shrinking
    frontiers), then a tiny distance-keyed histogram.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    hubs = [
        r.id
        for r in deg.orderBy(F.desc("deg"), F.asc("id")).limit(k).collect()
    ]
    res = shortest_paths(
        graph, sources=hubs, max_iterations=max_iterations, directed=False
    )
    return res.distances.groupBy("distance").agg(
        F.count("*").alias("n_vertices")
    )


def hub_distance_sql(k: int = 5, unroll: int = 20) -> str:
    """DuckDB oracle body for :func:`hub_distance` (expects
    ``verts``/``edges`` CTEs): hub selection + the unrolled undirected
    multi-source BFS + the histogram."""
    sent = UNREACHED
    K = int(k)
    ctes = [
        """hd_e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    )""",
        """hd_deg AS (SELECT src AS id, count(*) AS deg FROM hd_e GROUP BY src)""",
        f"""hd_hubs AS (SELECT id FROM hd_deg ORDER BY deg DESC, id LIMIT {K})""",
        """hd_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        f"""hd0 AS (
      SELECT id, CASE WHEN id IN (SELECT id FROM hd_hubs) THEN 0
                      ELSE {sent} END AS d
      FROM verts
    )""",
    ]
    for t in range(1, int(unroll) + 1):
        ctes.append(
            f"""hd{t} AS MATERIALIZED (
      SELECT d.id, least(d.d, coalesce(m.c, {sent})) AS d
      FROM hd{t - 1} d
      LEFT JOIN (
        SELECT e.dst AS id, min(p.d) + 1 AS c
        FROM hd_und e JOIN hd{t - 1} p ON e.src = p.id
        WHERE p.d < {sent}
        GROUP BY e.dst
      ) m ON m.id = d.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT CAST(d AS BIGINT) AS distance, count(*) AS n_vertices
    FROM hd{int(unroll)} WHERE d < {sent} GROUP BY 1
    """
