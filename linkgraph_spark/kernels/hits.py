"""HITS (hubs & authorities) — engine extension on the shared superstep
scaffold (Kleinberg 1999, public algorithm).

Per iteration over the directed edge table:
``auth(v) = Σ_{u→v} hub(u)`` then L2-normalize; ``hub(u) = Σ_{u→v} auth(v)``
then L2-normalize. Init hub = auth = 1. Deterministic, synchronous, fixed
iteration count (the Jacobi discipline all kernels here pin).

Scale shape: two gather joins + two grouped sums per iteration — the same
movement as one PageRank superstep each way; the L2 norm is a scalar
aggregate fused into the rotate via ``observe()`` where possible (the norm
must be APPLIED to the next iteration's input, so it rides in-plan as a
literal after the one materialization).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from math import sqrt

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class HitsResult:
    scores: DataFrame  # [id: long, hub: double, authority: double]
    iterations: int
    metrics: list = field(default_factory=list)


def hits(graph: LinkGraph, iterations: int = 5) -> HitsResult:
    """→ L2-normalized hub/authority scores after ``iterations`` rounds."""
    spark = graph.vertices.sparkSession
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    state = RotatingState(spark)
    n_edges = graph.edges.count()

    metrics: list = []
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        # leaf edge table + state partitioning aligned with the half-round
        # agg exchanges (same treatment as the PageRank loop)
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        edges, edge_blocks = checkpoint_tracked(graph.edges.select("src", "dst"))
        scores = state.rotate(
            graph.vertices.select(
                "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
            ).repartition(sp_eff, "id")
        )
        for it in range(1, iterations + 1):
            cur = scores if big_state else F.broadcast(scores)
            # authority pass: gather hub mass along in-edges
            a_raw = (
                edges.join(cur.select(F.col("id").alias("src"), "hub"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("hub").alias("a_raw"))
            )
            half = scores.join(a_raw, "id", "left").select(
                "id", "hub", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
            )
            obs_a = Observation(f"hits_a_{id(state)}_{it}")
            half = half.observe(obs_a, F.sum(F.col("a_raw") * F.col("a_raw")).alias("ss"))
            half = state.rotate(half)
            a_norm = sqrt(obs_a.get["ss"] or 0.0) or 1.0

            # hub pass: gather normalized authority along out-edges
            cur_h = half if big_state else F.broadcast(half)
            h_raw = (
                edges.join(
                    cur_h.select(F.col("id").alias("dst"), "a_raw"), "dst"
                )
                .groupBy(F.col("src").alias("id"))
                .agg((F.sum("a_raw") / F.lit(a_norm)).alias("h_raw"))
            )
            nxt = half.join(h_raw, "id", "left").select(
                "id",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                (F.col("a_raw") / F.lit(a_norm)).alias("authority"),
            )
            obs_h = Observation(f"hits_h_{id(state)}_{it}")
            nxt = nxt.observe(obs_h, F.sum(F.col("h_raw") * F.col("h_raw")).alias("ss"))
            nxt = state.rotate(nxt)
            h_norm = sqrt(obs_h.get["ss"] or 0.0) or 1.0
            # LAZY hub rescale over the round's final checkpoint (salsa
            # convention: rotate frees it only after the NEXT rotation
            # materializes) — two checkpoints per round, not three
            scores = nxt.select(
                "id", (F.col("h_raw") / F.lit(h_norm)).alias("hub"), "authority"
            )
            metrics.append({"iteration": it, "a_norm": a_norm, "h_norm": h_norm})
        free_tracked(spark.sparkContext, edge_blocks)

    return HitsResult(scores=scores, iterations=iterations, metrics=metrics)
