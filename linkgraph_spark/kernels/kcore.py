"""K-core decomposition: per-vertex coreness over the undirected graph.

Uses the iterated neighborhood-h-index operator (Lü, Zhou, Zhang, Stanley
2016 — public result): start from degree; each round replace every vertex's
estimate with the h-index of its neighbors' estimates (the largest h such
that ≥ h neighbors have estimate ≥ h). The sequence is non-increasing and
converges EXACTLY to coreness — a synchronous-superstep formulation of the
classic peel, so it fits the engine's scaffold (no sequential peeling).

Plan shape per round: one gather join (estimates along undirected edges) +
one per-vertex ranked window (partitioned by vertex — the hub-partition
window is the O(max-degree) hot spot; at extreme hub degrees swap the
window for a two-phase counting agg). Change count rides the rotate via
``observe()``; explicit converged flag like the other kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.kernels.components import undirected
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class KCoreResult:
    coreness: DataFrame  # [id: long, core: long]
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def k_core(graph: LinkGraph, max_iterations: int = 100) -> KCoreResult:
    """→ exact coreness per vertex (isolated vertices have core 0)."""
    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    sym = undirected(graph.edges).persist()
    n_sym = sym.count()

    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("core"))
    est = state.rotate(
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("core", F.lit(0)).cast("long").alias("core"))
    )

    converged = False
    metrics: list = []
    it = 0
    with pinned_superstep_confs(spark, n_sym, graph.num_vertices) as big_state:
        for it in range(1, max_iterations + 1):
            cur = est if big_state else F.broadcast(est)
            nbr = sym.join(
                cur.select(F.col("id").alias("dst"), F.col("core").alias("nbr_core")),
                "dst",
            ).select(F.col("src").alias("id"), "nbr_core")
            w = Window.partitionBy("id").orderBy(F.desc("nbr_core"))
            h = (
                nbr.withColumn("_rn", F.row_number().over(w))
                .groupBy("id")
                .agg(F.max(F.least(F.col("_rn"), F.col("nbr_core"))).alias("h"))
            )
            new = est.join(h, "id", "left").select(
                "id",
                F.coalesce("h", F.lit(0)).cast("long").alias("core"),
                F.col("core").alias("_old"),
            )
            obs = Observation(f"kcore_changed_{id(state)}_{it}")
            new = new.observe(
                obs, F.sum(F.when(F.col("core") != F.col("_old"), 1).otherwise(0)).alias("n")
            )
            new = state.rotate(new)
            changed = obs.get["n"] or 0
            est = new.select("id", "core")
            metrics.append({"iteration": it, "changed": changed})
            if changed == 0:
                converged = True
                break

    sym.unpersist()
    return KCoreResult(coreness=est, iterations=it, converged=converged, metrics=metrics)


def k_core_sql(unroll: int = 12) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the identical
    h-index iteration, unrolled. ``unroll`` must cover the convergence
    rounds of the gate graph (asserted by the converged flag in tests)."""
    ctes = [
        """kc_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        """k0 AS MATERIALIZED (
      SELECT v.id, coalesce(d.c, 0) AS core
      FROM verts v
      LEFT JOIN (SELECT src AS id, count(*) AS c FROM kc_und GROUP BY src) d
        ON d.id = v.id
    )""",
    ]
    for k in range(1, unroll + 1):
        ctes.append(
            f"""k{k} AS MATERIALIZED (
      SELECT e.id, coalesce(hh.h, 0) AS core
      FROM k{k - 1} e
      LEFT JOIN (
        SELECT id, max(least(rn, nbr_core)) AS h
        FROM (
          SELECT u.src AS id, p.core AS nbr_core,
                 row_number() OVER (PARTITION BY u.src
                                    ORDER BY p.core DESC) AS rn
          FROM kc_und u JOIN k{k - 1} p ON u.dst = p.id
        )
        GROUP BY id
      ) hh ON hh.id = e.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, CAST(core AS BIGINT) AS core FROM k{unroll}
    """
