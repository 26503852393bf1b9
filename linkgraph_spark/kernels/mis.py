"""Maximal independent set — Luby-style parallel rounds with DETERMINISTIC
unique priorities (Luby 1986, public algorithm).

Priority ``p(v)`` is a fixed-width string: a 31-bit affine hash of the id
(order scrambling, overflow-free on the FULL int64 id domain) followed by
the zero-padded id itself (uniqueness by construction). Priorities are
therefore unique with no tie cases, and the parallel fixpoint equals the
sequential greedy MIS taken in ascending-priority order — which makes the
operator exactly replayable in SQL (no RNG; lexicographic string order is
engine-identical).

Per round, over the undirected neighbor relation:

- an undecided vertex ENTERS the set iff its priority beats every
  undecided neighbor's (one equi-join + per-vertex min — the same
  shuffle shape as a PageRank gather);
- an undecided neighbor of an enterer leaves as OUT (one more equi-join
  against the O(|joiners|) set).

Rounds needed: O(log V) expected for random-looking priorities (the
affine permutation scatters ids); each round is two joins + two grouped
aggregates over the remaining undecided subgraph, which shrinks
geometrically — the 100 TB story is the gather kernel's, on a shrinking
edge set.

The classic symmetry-breaking primitive: MIS seeds distributed coloring,
clustering, and scheduling (pick one non-conflicting actor per
neighborhood). Engine addition over the reference (whose one kernel is
PageRank — ``pagerank_lambda/dynamodb/pagerank.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs

MIS_P = 2_147_483_647  # 2^31 - 1: A*(P-1)+B < 2^63, so int64 NEVER overflows
MIS_A = 2654435761  # Knuth multiplicative constant, coprime with P
MIS_B = 17


def _priority(id_col):
    """Fixed-width string priority: a 31-bit affine hash prefix (scrambles
    the id order; overflow-free for EVERY int64 id since the id is reduced
    mod P before the multiply) + the zero-padded id as tie-break suffix —
    unique by construction on the full id domain, and lexicographic string
    comparison is identical in Spark and DuckDB. A plain 61-bit affine
    permutation would silently overflow (Spark wraps, DuckDB errors) once
    ids pass ~3.5e9 — which dense-ranked actor ids DO at 10^12 turns."""
    h = (F.lit(MIS_A) * (id_col % F.lit(MIS_P)) + F.lit(MIS_B)) % F.lit(MIS_P)
    return F.concat_ws(
        "-",
        F.lpad(h.cast("string"), 10, "0"),
        F.lpad(id_col.cast("string"), 19, "0"),
    )


def _priority_sql() -> str:
    """DuckDB mirror of :func:`_priority` over a column named ``id``."""
    h = f"((({MIS_A} * (id % {MIS_P})) + {MIS_B}) % {MIS_P})"
    return (
        f"concat_ws('-', lpad(CAST({h} AS VARCHAR), 10, '0'),"
        " lpad(CAST(id AS VARCHAR), 19, '0'))"
    )


@dataclass
class MisResult:
    labels: DataFrame  # [id: long, status: string] — 'in' | 'out' | 'undecided'
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def maximal_independent_set(
    graph: LinkGraph,
    max_iterations: int = 20,
    checkpoint=None,
    resume: bool = False,
) -> MisResult:
    """→ per-vertex MIS status after at most ``max_iterations`` rounds
    ('undecided' survivors mean the round budget ran out — ``converged``
    says so; the unrolled SQL oracle matches round-for-round either way).
    Isolated vertices enter immediately (no undecided neighbors).

    ``checkpoint``/``resume``: the per-vertex (pr, status) state snapshots
    each round under kernel name ``mis``; a resumed run restarts at the
    latest committed round and — the rounds being a deterministic function
    of the state — ends exactly where the uninterrupted run would."""
    from linkgraph_spark.kernels.components import undirected

    spark = graph.vertices.sparkSession
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    state = RotatingState(spark)
    # leaf-plan per round (no re-analysis of the symmetrized-edge lineage)
    edges, edge_blocks = checkpoint_tracked(undirected(graph.edges))
    n_edges = graph.edges.count()

    init = graph.vertices.select(
        "id", _priority(F.col("id")).alias("pr"), F.lit("undecided").alias("status")
    )
    start = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("mis")
        if latest is not None:
            init = checkpoint.load_state(spark, "mis", latest)
            start = latest
    converged = False
    metrics: list = []
    it = start
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big:
        # aligned state partitioning + loop-layout edge scan (narrow
        # coalesce of the checkpointed table)
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        cur = state.rotate(init.repartition(sp_eff, "id"))
        edges = edges.coalesce(sp_eff)
        for it in range(start + 1, max_iterations + 1):
            und = cur.where(F.col("status") == "undecided")
            if not big:
                # small regime: the undecided slice rides broadcasts so
                # the edge table never shuffles per round
                und = F.broadcast(und)
            nbr_pr = (
                edges.join(und.select(F.col("id").alias("src"), "pr"), "src")
                .join(
                    und.select(F.col("id").alias("dst")).withColumn("_d", F.lit(1)),
                    "dst",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("pr").alias("min_nbr_pr"))
            )
            joiners = (
                cur.where(F.col("status") == "undecided").join(nbr_pr, "id", "left")
                .where(
                    F.col("min_nbr_pr").isNull()
                    | (F.col("pr") < F.col("min_nbr_pr"))
                )
                .select("id")
            )
            if not big:
                joiners = F.broadcast(joiners)
            knocked = (
                edges.join(joiners.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            nxt = (
                cur.join(joiners.withColumn("_in", F.lit(1)), "id", "left")
                .join(knocked.withColumn("_out", F.lit(1)), "id", "left")
                .select(
                    "id",
                    "pr",
                    F.when(F.col("status") != "undecided", F.col("status"))
                    .when(F.col("_in").isNotNull(), F.lit("in"))
                    .when(F.col("_out").isNotNull(), F.lit("out"))
                    .otherwise(F.lit("undecided"))
                    .alias("status"),
                )
            )
            from pyspark.sql import Observation

            obs = Observation(f"mis_{id(state)}_{it}")
            nxt = nxt.observe(
                obs,
                F.sum(
                    F.when(F.col("status") == "undecided", 1).otherwise(0)
                ).alias("undecided"),
            )
            cur = state.rotate(nxt)
            undecided = int(obs.get["undecided"] or 0)
            metrics.append({"iteration": it, "undecided": undecided})
            if checkpoint is not None:
                checkpoint.write_state(
                    "mis", it, cur, key_col="id", metrics={"undecided": undecided}
                )
            if undecided == 0:
                converged = True
                break

    free_tracked(spark.sparkContext, edge_blocks)
    return MisResult(
        labels=cur.select("id", "status"),
        iterations=it,
        converged=converged,
        metrics=metrics,
    )


def maximal_independent_set_sql(rounds: int = 20) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the same
    two-phase round unrolled — joiners from the previous state, then the
    knocked-out neighbors — matching the Spark kernel round-for-round
    (including a non-converged tail of 'undecided')."""
    pr = _priority_sql()
    ctes = [
        """mis_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        f"""mis0 AS (
      SELECT id, {pr} AS pr, 'undecided' AS status FROM verts
    )""",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""misj{k} AS MATERIALIZED (
      SELECT s.id
      FROM mis{k - 1} s
      LEFT JOIN (
        SELECT e.dst AS id, min(p.pr) AS mp
        FROM mis_und e
        JOIN mis{k - 1} p ON e.src = p.id AND p.status = 'undecided'
        JOIN mis{k - 1} q ON e.dst = q.id AND q.status = 'undecided'
        GROUP BY e.dst
      ) m ON m.id = s.id
      WHERE s.status = 'undecided' AND (m.mp IS NULL OR s.pr < m.mp)
    ),
    misk{k} AS MATERIALIZED (
      SELECT DISTINCT e.dst AS id
      FROM mis_und e JOIN misj{k} j ON e.src = j.id
    ),
    mis{k} AS MATERIALIZED (
      SELECT s.id, s.pr,
             CASE WHEN s.status <> 'undecided' THEN s.status
                  WHEN j.id IS NOT NULL THEN 'in'
                  WHEN o.id IS NOT NULL THEN 'out'
                  ELSE 'undecided' END AS status
      FROM mis{k - 1} s
      LEFT JOIN misj{k} j ON j.id = s.id
      LEFT JOIN misk{k} o ON o.id = s.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, status FROM mis{rounds}
    """
