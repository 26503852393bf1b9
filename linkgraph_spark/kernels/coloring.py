"""Greedy graph coloring — Jones–Plassmann parallel rounds with the MIS
module's deterministic affine priorities (Jones & Plassmann 1993, public
algorithm).

A vertex colors itself in the first round where every HIGHER-priority
neighbor is already colored, taking the mex (smallest non-negative integer
absent) of its colored neighbors' colors. With the unique affine-permutation
priorities the fixpoint is EXACTLY the sequential greedy coloring in
decreasing-priority order — deterministic, so the unrolled SQL oracle
replays it round-for-round (including a non-converged 'uncolored' tail at
the round budget).

Per round, over the undirected neighbor relation:

- readiness: one equi-join + per-vertex max over UNCOLORED neighbors'
  priorities (same gather shape as a PageRank superstep);
- color pick: one equi-join collecting colored neighbors' colors, then a
  per-row array mex (``filter(sequence(0, |colors|), k ∉ colors)[0]`` —
  pigeonhole guarantees a gap) — JVM-side, no Python.

Expected rounds = longest decreasing-priority path = O(log V) for
random-looking priorities; each round's joins shrink with the uncolored
set. Colors used = greedy bound (≤ max degree + 1). The classic resource/
schedule-assignment kernel: conflict-free slots for actors that share an
edge. Engine addition over the reference (whose one kernel is PageRank —
``pagerank_lambda/dynamodb/pagerank.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.kernels.mis import _priority, _priority_sql
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class ColoringResult:
    colors: DataFrame  # [id: long, color: long] — color NULL while uncolored
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def _mex(colors_arr):
    """Smallest k in 0..len(colors) absent from the array (pigeonhole).
    The sequence is built in long so array_contains type-matches the
    long color array."""
    return F.array_min(
        F.filter(
            F.sequence(F.lit(0).cast("long"), F.size(colors_arr).cast("long")),
            lambda k: ~F.array_contains(colors_arr, k),
        )
    )


def greedy_coloring(
    graph: LinkGraph,
    max_iterations: int = 30,
    checkpoint=None,
    resume: bool = False,
) -> ColoringResult:
    """→ per-vertex greedy colors after at most ``max_iterations``
    Jones–Plassmann rounds (NULL colors mean the round budget ran out —
    ``converged`` says so). Isolated vertices color 0 in round one.

    ``checkpoint``/``resume``: the per-vertex (pr, color) state snapshots
    each round under kernel name ``coloring``; the rounds are a
    deterministic function of the state, so a resumed run ends exactly
    where the uninterrupted one would."""
    from linkgraph_spark.kernels.components import undirected

    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    # localCheckpoint (not persist): leaf-plan per round instead of
    # re-analyzing the symmetrized-edge lineage every round
    edges, edge_blocks = checkpoint_tracked(undirected(graph.edges))
    n_edges = graph.edges.count()

    init = graph.vertices.select(
        "id",
        _priority(F.col("id")).alias("pr"),
        F.lit(None).cast("long").alias("color"),
    )
    start = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("coloring")
        if latest is not None:
            init = checkpoint.load_state(spark, "coloring", latest)
            start = latest
    converged = False
    metrics: list = []
    it = start
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big:
        # align state partitioning with the per-round agg exchanges once
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        cur = state.rotate(init.repartition(sp_eff, "id"))
        # scan the checkpointed edge table at the loop's scaled partition
        # count (narrow coalesce; it materialized at the session's)
        edges = edges.coalesce(sp_eff)
        for it in range(start + 1, max_iterations + 1):
            unc = cur.where(F.col("color").isNull())
            if not big:
                # small regime: the state slices ride broadcasts so the
                # O(E) symmetric edge table never shuffles per round
                unc = F.broadcast(unc)
            # max uncolored-neighbor priority per uncolored vertex
            blocker = (
                edges.join(unc.select(F.col("id").alias("src"), "pr"), "src")
                .join(unc.select(F.col("id").alias("dst")), "dst")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("pr").alias("max_unc_pr"))
            )
            colored = cur.where(F.col("color").isNotNull()).select(
                F.col("id").alias("src"), "color"
            )
            if not big:
                colored = F.broadcast(colored)
            # colors already taken in each vertex's neighborhood
            taken = (
                edges.join(colored, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.collect_set("color").alias("cl"))
            )
            nxt = (
                cur.join(blocker, "id", "left")
                .join(taken, "id", "left")
                .select(
                    "id",
                    "pr",
                    F.when(F.col("color").isNotNull(), F.col("color"))
                    .when(
                        # ready: no uncolored neighbor outranks this vertex
                        # ('' sorts before every real string priority)
                        F.coalesce("max_unc_pr", F.lit("")) < F.col("pr"),
                        _mex(F.coalesce("cl", F.array().cast("array<long>"))).cast(
                            "long"
                        ),
                    )
                    .otherwise(F.lit(None).cast("long"))
                    .alias("color"),
                )
            )
            from pyspark.sql import Observation

            obs = Observation(f"color_{id(state)}_{it}")
            nxt = nxt.observe(
                obs,
                F.sum(F.when(F.col("color").isNull(), 1).otherwise(0)).alias(
                    "uncolored"
                ),
            )
            cur = state.rotate(nxt)
            uncolored = int(obs.get["uncolored"] or 0)
            metrics.append({"iteration": it, "uncolored": uncolored})
            if checkpoint is not None:
                checkpoint.write_state(
                    "coloring", it, cur, key_col="id", metrics={"uncolored": uncolored}
                )
            if uncolored == 0:
                converged = True
                break

    free_tracked(spark.sparkContext, edge_blocks)
    return ColoringResult(
        colors=cur.select("id", "color"),
        iterations=it,
        converged=converged,
        metrics=metrics,
    )


def greedy_coloring_sql(rounds: int = 30) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the same
    readiness + mex round unrolled, matching the Spark kernel
    round-for-round (including a non-converged NULL tail)."""
    pr = _priority_sql()
    ctes = [
        """col_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        f"""col0 AS (
      SELECT id, {pr} AS pr, CAST(NULL AS BIGINT) AS color FROM verts
    )""",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""colb{k} AS MATERIALIZED (
      SELECT e.dst AS id, max(p.pr) AS max_unc_pr
      FROM col_und e
      JOIN col{k - 1} p ON e.src = p.id AND p.color IS NULL
      JOIN col{k - 1} q ON e.dst = q.id AND q.color IS NULL
      GROUP BY e.dst
    ),
    colt{k} AS MATERIALIZED (
      SELECT e.dst AS id, list(p.color) AS cl
      FROM col_und e
      JOIN col{k - 1} p ON e.src = p.id AND p.color IS NOT NULL
      GROUP BY e.dst
    ),
    col{k} AS MATERIALIZED (
      SELECT s.id, s.pr,
             CASE WHEN s.color IS NOT NULL THEN s.color
                  WHEN coalesce(b.max_unc_pr, '') < s.pr THEN
                    CAST(list_min(list_filter(
                      range(0, len(coalesce(t.cl, [])) + 1),
                      x -> NOT list_contains(coalesce(t.cl, []), x)
                    )) AS BIGINT)
                  ELSE CAST(NULL AS BIGINT) END AS color
      FROM col{k - 1} s
      LEFT JOIN colb{k} b ON b.id = s.id
      LEFT JOIN colt{k} t ON t.id = s.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, color FROM col{rounds}
    """
