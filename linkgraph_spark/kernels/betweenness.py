"""Betweenness centrality — batched multi-source Brandes.

Betweenness of v = Σ_{s≠v≠t} σ_st(v)/σ_st: the fraction of shortest paths
passing through v — the "broker" score that finds the actors bridging
otherwise-separate conversation clusters (tool gateways, shared-role
connectors). Exact all-pairs betweenness is Θ(V·E) (Brandes 2001) — at
web scale the standard estimator is Brandes from a SOURCE SAMPLE
(Brandes & Pich 2007): unbiased up to the V/|S| scale factor.

Spark shape — both Brandes phases are level-synchronous joins, batched
across ALL sources at once (state keyed by ``(vertex, source)``):

1. **Forward sweep** (BFS with path counting): per level, one join of the
   frontier against the edge table + one (dst, source) sum of parent path
   counts + one anti-join against the visited set. Exactly the frontier-
   BFS shuffle of ``kernels/paths.py`` with σ riding along; each level is
   materialized once (``localCheckpoint``) and kept — the backward sweep
   needs it.
2. **Backward sweep** (dependency accumulation, deepest level first): per
   level, one join (level-L vertices → their level-L+1 successors) + one
   grouped sum of σ_v/σ_w · (1 + δ_w). No windows, no per-vertex loops.

Cost: O(diameter) supersteps each way, O(E · |S| / V)-ish rows moved per
level (each source's BFS touches each edge once across the whole sweep);
state peaks at O(V · |S|) rows — the sample size dials memory and cost
linearly. All intermediate level blocks are freed before returning.

No SQL oracle (per-source shortest-path DAGs are not expressible without
recursion); pytest pins the values against a pure-Python Brandes on
closed-form and randomized graphs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import free_tracked
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class BetweennessResult:
    scores: DataFrame  # [id: long, betweenness: double]
    sources: list  # the source sample actually used
    depth: int  # deepest BFS level reached
    converged: bool  # False iff max_depth truncated a BFS
    metrics: list = field(default_factory=list)


def betweenness(
    graph: LinkGraph,
    sources: list | None = None,
    n_samples: int = 16,
    directed: bool = False,
    max_depth: int = 50,
    normalize: bool = False,
) -> BetweennessResult:
    """→ :class:`BetweennessResult` with per-vertex dependency sums over
    the source set (``sources`` explicit, else the ``n_samples`` smallest
    vertex ids — deterministic, no RNG). ``normalize=True`` scales by
    V/|S| (the Brandes–Pich unbiased estimate of full betweenness; on
    undirected graphs, halve externally if you want the each-pair-once
    convention). Vertices on no sampled shortest path score 0.0."""
    spark = graph.vertices.sparkSession
    if sources is None:
        src_rows = graph.vertices.select("id").orderBy("id").limit(n_samples).collect()
        sources = [r["id"] for r in src_rows]
    sources = [int(s) for s in sources]
    if not sources:
        return BetweennessResult(
            scores=graph.vertices.select(
                "id", F.lit(0.0).alias("betweenness")
            ),
            sources=[],
            depth=0,
            converged=True,
        )

    if directed:
        edges = (
            graph.edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
    else:
        from linkgraph_spark.kernels.components import undirected

        edges = undirected(graph.edges)
    edges = edges.persist()  # read every forward AND backward level
    n_edges = graph.edges.count()

    tracked: set = set()

    def _ck(df: DataFrame) -> DataFrame:
        from linkgraph_spark.lineage import checkpoint_tracked

        ck, ids = checkpoint_tracked(df)
        tracked.update(ids)
        return ck

    metrics: list = []
    converged = True
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices):
        # ---- forward: BFS levels with path counts --------------------------
        src_df = spark.createDataFrame([(s,) for s in sources], "id long")
        f0 = _ck(
            src_df.select(
                "id", F.col("id").alias("s"), F.lit(1.0).alias("sigma")
            )
        )
        levels = [f0]
        visited = _ck(f0.select("id", "s"))
        depth = 0
        for lvl in range(1, max_depth + 1):
            prev = levels[-1]
            cand = (
                edges.join(
                    prev.select(F.col("id").alias("src"), "s", "sigma"), "src"
                )
                .groupBy(F.col("dst").alias("id"), F.col("s"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            newf = cand.join(visited, ["id", "s"], "left_anti")
            newf = _ck(newf)
            n_new = newf.count()
            metrics.append({"level": lvl, "frontier": n_new})
            if n_new == 0:
                break
            levels.append(newf)
            visited = _ck(visited.unionAll(newf.select("id", "s")))
            depth = lvl
        else:
            converged = False  # max_depth truncated some BFS

        # ---- backward: dependency accumulation, deepest level first --------
        # delta at the deepest level is 0 for every (id, s) there
        bc_parts: list[DataFrame] = []
        delta_next: DataFrame | None = None  # [id, s, delta] at level L+1
        for lvl in range(depth - 1, -1, -1):
            succ = levels[lvl + 1].select(
                F.col("id").alias("w"), "s", F.col("sigma").alias("sigma_w")
            )
            if delta_next is not None:
                succ = succ.join(
                    delta_next.select(
                        F.col("id").alias("w"), "s", F.col("delta").alias("dw")
                    ),
                    ["w", "s"],
                    "left",
                ).select(
                    "w", "s", "sigma_w", F.coalesce("dw", F.lit(0.0)).alias("dw")
                )
            else:
                succ = succ.select("w", "s", "sigma_w", F.lit(0.0).alias("dw"))
            # edges v → w (v at level L, w at level L+1, same source)
            vw = edges.select(F.col("src").alias("id"), F.col("dst").alias("w"))
            contrib = (
                vw.join(succ, "w")
                .join(levels[lvl].select("id", "s", "sigma"), ["id", "s"])
                .groupBy("id", "s")
                .agg(
                    F.sum(
                        (F.col("sigma") / F.col("sigma_w")) * (1.0 + F.col("dw"))
                    ).alias("delta")
                )
            )
            delta_next = _ck(contrib)
            if lvl >= 1:  # level 0 = the sources themselves: endpoints excluded
                bc_parts.append(delta_next)

        if bc_parts:
            from functools import reduce

            all_delta = reduce(DataFrame.unionAll, bc_parts)
            agg = all_delta.groupBy("id").agg(F.sum("delta").alias("b"))
        else:
            agg = spark.createDataFrame([], "id long, b double")
        scale = float(graph.num_vertices) / len(sources) if normalize else 1.0
        scores = (
            graph.vertices.select("id")
            .join(agg, "id", "left")
            .select(
                "id",
                F.round(F.coalesce("b", F.lit(0.0)) * F.lit(scale), 6).alias(
                    "betweenness"
                ),
            )
        )
        scores = scores.localCheckpoint()  # detach from the level blocks

    free_tracked(spark.sparkContext, tracked)
    edges.unpersist()
    return BetweennessResult(
        scores=scores,
        sources=sources,
        depth=depth,
        converged=converged,
        metrics=metrics,
    )
