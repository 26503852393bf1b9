"""node2vec: second-order biased walk corpus (Grover & Leskovec, KDD 2016).

DeepWalk's uniform step (``kernels/walks.py``) ignores where the walk came
from; node2vec biases the choice by the distance of each candidate x from
the PREVIOUS vertex: return (x = prev), in-between (prev → x edge exists),
or outward — the BFS/DFS dial that makes walk corpora encode either
community structure or structural roles.

Determinism & oracle: weights are INTEGERS (``w_back : w_common :
w_forward`` — the node2vec 1/p : 1 : 1/q ratios scaled to integers), so
the cumulative weights are exact in any engine, and the pick is
``md5-hash(walk_id, step) mod total-weight`` against integer cumsum
boundaries — bit-identical in Spark and DuckDB, no floating-point
tie-break risk. The corpus is fully replayed by the SQL oracle.

Plan shape per step: one equi-join frontier ⋈ adjacency (ALL of cur's
out-neighbors — second-order bias inherently needs the neighbor set, the
O(1)-per-step indexed pick of DeepWalk is not available), one left join
against the edge set for the prev→x membership flag, one per-walk window
cumsum (partition = one walk's ≤ deg(cur) candidate rows), one filter.
A walk sitting at a 10^8-degree hub would put 10^8 rows in its window —
``max_degree`` truncates the candidate set to the first ``cap`` neighbors
(dst-ascending), bounding every window; the gate ships capped. First step:
prev = start, so every candidate is "in-between" → uniform, no special
case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.functions.hashing import md5_long, md5_long_sql
from linkgraph_spark.kernels.walks import _indexed_adjacency
from linkgraph_spark.lineage import checkpoint_tracked, free_tracked
from linkgraph_spark.session import pinned_superstep_confs


def node2vec_walks(
    graph: LinkGraph,
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    w_back: int = 1,
    w_common: int = 2,
    w_forward: int = 4,
    max_degree: int | None = None,
) -> DataFrame:
    """→ [walk_id, step, vertex] — same corpus contract as
    :func:`~linkgraph_spark.kernels.walks.random_walks`, biased choice.
    Defaults (1:2:4) lean outward (DFS-ish / structural); swap to e.g.
    (4:2:1) for BFS-ish community walks."""
    if min(w_back, w_common, w_forward) < 1:
        raise ValueError("weights must be positive integers")
    spark = graph.vertices.sparkSession
    n_edges = graph.edges.count()

    adj = _indexed_adjacency(graph.edges, graph.num_vertices)
    if max_degree is not None:
        adj = adj.where(F.col("idx") < max_degree)
    adj = adj.persist()  # the windowed ranking must not re-run per step
    memb = (
        graph.edges.select("src", "dst")
        .distinct()
        .select(
            F.col("src").alias("prev"),
            F.col("dst").alias("x"),
            F.lit(True).alias("_cm"),
        )
        .persist()
    )

    starts = graph.vertices.select("id")
    if walks_per_vertex > 1:
        starts = starts.crossJoin(
            spark.range(walks_per_vertex).select(F.col("id").alias("w"))
        )
    else:
        starts = starts.withColumn("w", F.lit(0))
    frontier = starts.select(
        (F.col("id") * walks_per_vertex + F.col("w")).alias("walk_id"),
        F.col("id").alias("prev"),  # prev = start → step 1 is uniform
        F.col("id").alias("cur"),
    )

    out_steps = [
        frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex"))
    ]
    interim_ids: set = set()
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices):
        for s in range(1, walk_length + 1):
            cand = frontier.join(
                adj.select(F.col("src").alias("cur"), "idx", F.col("dst").alias("x")),
                "cur",
            ).join(memb, ["prev", "x"], "left")
            w = (
                F.when(F.col("x") == F.col("prev"), F.lit(w_back))
                .when(F.col("_cm"), F.lit(w_common))
                .otherwise(F.lit(w_forward))
                .cast("long")
            )
            win = Window.partitionBy("walk_id").orderBy("idx")
            cum = F.sum(w).over(
                win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            total = F.sum(w).over(Window.partitionBy("walk_id"))
            r = (
                md5_long(
                    F.concat(
                        F.col("walk_id").cast("string"), F.lit("_"), F.lit(str(s))
                    )
                )
                % total
            )
            picked = (
                cand.select(
                    "walk_id",
                    "cur",
                    "x",
                    w.alias("_w"),
                    cum.alias("_cum"),
                    r.alias("_r"),
                )
                .where(
                    (F.col("_r") >= F.col("_cum") - F.col("_w"))
                    & (F.col("_r") < F.col("_cum"))
                )
            )
            frontier = picked.select(
                "walk_id", F.col("cur").alias("prev"), F.col("x").alias("cur")
            )
            frontier, ids = checkpoint_tracked(frontier)  # every step is output
            interim_ids |= ids
            out_steps.append(
                frontier.select(
                    "walk_id", F.lit(s).alias("step"), F.col("cur").alias("vertex")
                )
            )

        out = out_steps[0]
        for df in out_steps[1:]:
            out = out.unionByName(df)
        if interim_ids:
            out, _ = checkpoint_tracked(out)
            free_tracked(spark.sparkContext, interim_ids)
    adj.unpersist()
    memb.unpersist()
    return out


def node2vec_walks_sql(
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    w_back: int = 1,
    w_common: int = 2,
    w_forward: int = 4,
    max_degree: int | None = None,
) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): replays the
    identical integer-weighted hash-driven walks."""
    cap = f"WHERE idx < {max_degree}" if max_degree is not None else ""
    ctes = [
        f"""n2adj AS MATERIALIZED (
      SELECT * FROM (
        SELECT src, row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
               dst
        FROM (SELECT DISTINCT src, dst FROM edges)
      ) {cap}
    )""",
        """n2memb AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)""",
        f"""n2f0 AS (
      SELECT v.id * {walks_per_vertex} + g.w AS walk_id, v.id AS prev, v.id AS cur
      FROM verts v CROSS JOIN (
        SELECT unnest(range({walks_per_vertex})) AS w
      ) g
    )""",
    ]
    for s in range(1, walk_length + 1):
        h = md5_long_sql(f"concat(CAST(c.walk_id AS VARCHAR), '_', '{s}')")
        ctes.append(
            f"""n2f{s} AS MATERIALIZED (
      SELECT walk_id, cur AS prev, x AS cur FROM (
        SELECT c.walk_id, c.cur, c.x, c.w,
               sum(c.w) OVER (PARTITION BY c.walk_id ORDER BY c.idx
                              ROWS UNBOUNDED PRECEDING) AS cum,
               ({h}) % (sum(c.w) OVER (PARTITION BY c.walk_id)) AS r
        FROM (
          SELECT f.walk_id, f.cur, a.idx, a.dst AS x,
                 CASE WHEN a.dst = f.prev THEN {w_back}
                      WHEN m.src IS NOT NULL THEN {w_common}
                      ELSE {w_forward} END AS w
          FROM n2f{s - 1} f
          JOIN n2adj a ON a.src = f.cur
          LEFT JOIN n2memb m ON m.src = f.prev AND m.dst = a.dst
        ) c
      ) WHERE r >= cum - w AND r < cum
    )"""
        )
    body = ",\n    ".join(ctes)
    selects = "\n    UNION ALL ".join(
        f"SELECT walk_id, {s} AS step, cur AS vertex FROM n2f{s}"
        for s in range(0, walk_length + 1)
    )
    return f"""{body}
    {selects}
    """
