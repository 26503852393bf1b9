"""Densest subgraph — parallel (1+ε)-peeling (Bahmani, Kumar & Vassilvitskii,
VLDB 2012, public algorithm; 2(1+ε)-approximation of Goldberg's optimum).

Round k over the surviving undirected subgraph S: compute density
ρ = |E(S)|/|S|, peel EVERY vertex whose degree in S is ≤ 2(1+ε)ρ, record
the round. At least a (ε/(1+ε))-fraction of S peels each round (the
average degree is 2ρ), so rounds = O(log_{1+ε} V) and the whole sweep is
a handful of degree-gather supersteps — the reason this is THE at-scale
densest-subgraph algorithm. The densest prefix (the surviving set just
before the best-density round was peeled) is within 2(1+ε) of optimal.

Everything is deterministic — no tie-breaking is even needed (all
sub-threshold vertices peel together) — so the per-vertex peel rounds are
exactly replayable by an unrolled SQL chain whose per-round thresholds are
scalar subqueries.

Per round: one degree gather over surviving edges (equi-join + grouped
count — the PageRank shuffle shape) + one threshold filter; the (n, m)
scalars ride the degree materialization via ``observe()``. The surviving
edge set shrinks geometrically, so round cost decays.

Engine addition over the reference (whose one kernel is PageRank —
``pagerank_lambda/dynamodb/pagerank.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class DensestResult:
    peel_rounds: DataFrame  # [id: long, removed_round: long] — every vertex peels
    best_round: int  # density is maximized ENTERING this round
    best_density: float
    densest_vertices: DataFrame  # [id] — the surviving set entering best_round
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)  # per round: n, m, rho


def densest_subgraph(
    graph: LinkGraph, epsilon: float = 0.5, max_iterations: int = 40
) -> DensestResult:
    """→ peel rounds + the best-density surviving set.

    ``epsilon`` trades rounds for quality: 2(1+ε) approximation in
    O(log_{1+ε} V) rounds (ε=0.5 → factor 3, ~log_1.5 V rounds — the
    published sweet spot for massive graphs). ``converged`` False means
    the round budget ran out with vertices left (their ``removed_round``
    is NULL; the SQL oracle matches round-for-round either way)."""
    from linkgraph_spark.kernels.components import undirected

    if epsilon <= 0:
        raise ValueError("epsilon must be > 0 (termination bound needs it)")
    spark = graph.vertices.sparkSession
    # separate rotations per long-lived frame: rotate() frees the previous
    # rotation's blocks, so the peel-round labels, the transient stats
    # frame, and the surviving edge set each own their lifecycle
    cur_state = RotatingState(spark)
    tmp_state = RotatingState(spark)
    edge_state = RotatingState(spark)
    n_edges_graph = graph.edges.count()

    # canonical undirected simple edges — density counts each pair once
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    converged = False
    metrics: list = []
    best_rho, best_round = -1.0, 1
    it = 0
    factor = 2.0 * (1.0 + float(epsilon))
    live_edges = edge_state.rotate(canon)
    with pinned_superstep_confs(spark, n_edges_graph, graph.num_vertices) as big:
        # align the label state's partitioning with the per-round degree
        # agg exchange once (no second exchange in the stats join)
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        cur = cur_state.rotate(
            graph.vertices.select(
                "id", F.lit(None).cast("long").alias("removed_round")
            ).repartition(sp_eff, "id")
        )
        for it in range(1, max_iterations + 1):
            surv = cur.where(F.col("removed_round").isNull()).select("id")
            deg = (
                live_edges.select(F.col("a").alias("id"))
                .unionByName(live_edges.select(F.col("b").alias("id")))
                .groupBy("id")
                .agg(F.count("*").alias("deg"))
            )
            stats = surv.join(deg, "id", "left").select(
                "id", F.coalesce("deg", F.lit(0)).alias("deg")
            )
            obs = Observation(f"densest_{id(cur_state)}_{it}")
            stats = stats.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                (F.sum("deg") / 2).alias("m"),
            )
            stats = tmp_state.rotate(stats)
            n = int(obs.get["n"] or 0)
            m = float(obs.get["m"] or 0.0)
            if n == 0:
                converged = True
                it -= 1  # the emptying round was the previous one
                break
            rho = m / n
            metrics.append({"iteration": it, "n": n, "m": m, "rho": rho})
            if rho > best_rho:
                best_rho, best_round = rho, it
            thresh = factor * rho
            peeled = stats.where(F.col("deg") <= thresh).select("id")
            if not big:
                # small regime: the peel set rides one broadcast through
                # the label update and both edge anti-joins
                peeled = F.broadcast(peeled)
            cur = cur_state.rotate(
                cur.join(peeled.withColumn("_p", F.lit(1)), "id", "left").select(
                    "id",
                    F.when(
                        F.col("removed_round").isNull() & F.col("_p").isNotNull(),
                        F.lit(it),
                    )
                    .otherwise(F.col("removed_round"))
                    .alias("removed_round"),
                )
            )
            live_edges = edge_state.rotate(
                live_edges.join(
                    peeled.withColumnRenamed("id", "a"), "a", "left_anti"
                ).join(peeled.withColumnRenamed("id", "b"), "b", "left_anti")
            )

    if not converged and it == max_iterations:
        # the final allowed round may have peeled the last survivors — the
        # next-round n==0 probe that normally detects emptiness never ran
        converged = (
            cur.where(F.col("removed_round").isNull()).limit(1).count() == 0
        )
    if best_rho < 0.0:
        # no survey round ever saw a vertex (empty graph): the -1.0
        # sentinel must not escape — an empty graph's densest subgraph is
        # empty with density 0
        best_rho = 0.0
    densest = cur.where(
        F.col("removed_round").isNull() | (F.col("removed_round") >= best_round)
    ).select("id")
    edge_state.release()
    tmp_state.release()
    return DensestResult(
        peel_rounds=cur,
        best_round=best_round,
        best_density=best_rho,
        densest_vertices=densest,
        iterations=it,
        converged=converged,
        metrics=metrics,
    )


def densest_peel_sql(epsilon: float = 0.5, rounds: int = 40) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the peel
    chain unrolled with per-round scalar-subquery thresholds; emits
    ``[id, removed_round]`` (NULL where the round budget ran out)."""
    factor = 2.0 * (1.0 + float(epsilon))
    ctes = [
        """dsg_e0 AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst
    )""",
        "dsg0 AS (SELECT id, CAST(NULL AS BIGINT) AS removed_round FROM verts)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""dsg_d{k} AS MATERIALIZED (
      SELECT s.id, coalesce(d.deg, 0) AS deg
      FROM (SELECT id FROM dsg{k - 1} WHERE removed_round IS NULL) s
      LEFT JOIN (
        SELECT id, count(*) AS deg FROM (
          SELECT a AS id FROM dsg_e{k - 1} UNION ALL SELECT b FROM dsg_e{k - 1}
        ) GROUP BY id
      ) d ON d.id = s.id
    ),
    dsg_r{k} AS (
      SELECT CASE WHEN count(*) = 0 THEN NULL
                  ELSE (sum(deg) / 2.0) / count(*) END AS rho
      FROM dsg_d{k}
    ),
    dsg_p{k} AS MATERIALIZED (
      SELECT d.id FROM dsg_d{k} d CROSS JOIN dsg_r{k} r
      WHERE r.rho IS NOT NULL AND d.deg <= {factor!r} * r.rho
    ),
    dsg{k} AS MATERIALIZED (
      SELECT s.id,
             CASE WHEN s.removed_round IS NULL AND p.id IS NOT NULL
                  THEN {k} ELSE s.removed_round END AS removed_round
      FROM dsg{k - 1} s LEFT JOIN dsg_p{k} p ON p.id = s.id
    ),
    dsg_e{k} AS MATERIALIZED (
      SELECT e.a, e.b FROM dsg_e{k - 1} e
      WHERE e.a NOT IN (SELECT id FROM dsg_p{k})
        AND e.b NOT IN (SELECT id FROM dsg_p{k})
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, removed_round FROM dsg{rounds}
    """
