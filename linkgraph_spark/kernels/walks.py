"""Deterministic random-walk corpus generation (DeepWalk/node2vec-style
training-data op — the walk corpus is what embedding trainers consume).

"Random" is a fixed, engine-portable hash: at step s, walk w moves from its
current vertex to neighbor index ``md5_60bit(f"{w}_{s}") % out_deg(cur)``.
No RNG anywhere, so the corpus is bit-identical across runs, parallelism
levels, AND engines — the DuckDB oracle replays every step exactly (the
same determinism-over-convenience rule as the LSH operators).

Plan shape per step: one equi-join of the live walk frontier against the
indexed adjacency ``(src, idx) → dst`` (idx = rank of dst among src's
out-neighbors, computed ONCE). The index is TWO-LEVEL so no single window
partition ever holds a hub's whole neighborhood: dst ids are dense
(assigned 0..V-1 by the ETL), so bucketing by ``dst // ceil(√V)`` bounds
the within-bucket rank window at √V rows per (src, bucket) and the per-src
bucket-offset window at √V bucket rows — a degree-10^8 hub becomes 10^4
bounded partitions instead of one 10^8-row sort task. idx = bucket offset
(prefix count of earlier buckets) + within-bucket rank; identical to the
flat per-src rank because buckets are dst-range-ordered.

Walks terminate at dangling vertices. Work is O(walks) per step, O(L·W)
total; at 100 TB the adjacency join is the standard shuffle (or zero
shuffle with a src-bucketed adjacency table).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.functions.hashing import md5_long
from linkgraph_spark.lineage import checkpoint_tracked, free_tracked
from linkgraph_spark.session import pinned_superstep_confs


def _indexed_adjacency(edges: DataFrame, n_vertices: int) -> DataFrame:
    """→ [src, idx, dst]: idx = rank of dst among src's out-neighbors
    (dst-ascending), via the two-level bucketed scheme (module docstring) —
    every window partition is bounded by ~√V rows, hub degree nonwithstanding."""
    width = math.isqrt(max(n_vertices, 1)) + 1
    adj0 = edges.select("src", "dst").withColumn(
        "_b", F.floor(F.col("dst") / F.lit(width)).cast("long")
    )
    w_in = Window.partitionBy("src", "_b").orderBy("dst")
    ranked = adj0.withColumn("_r", F.row_number().over(w_in) - 1)
    w_pre = (
        Window.partitionBy("src")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        adj0.groupBy("src", "_b")
        .agg(F.count("*").alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(w_pre), F.lit(0)))
        .select("src", "_b", "_off")
    )
    return ranked.join(offsets, ["src", "_b"]).select(
        "src", (F.col("_off") + F.col("_r")).alias("idx"), "dst"
    )


def random_walks(
    graph: LinkGraph, walk_length: int = 4, walks_per_vertex: int = 1
) -> DataFrame:
    """→ [walk_id, step, vertex]: ``walks_per_vertex`` walks from every
    vertex, each up to ``walk_length`` hops (shorter if it hits a dangling
    vertex). step 0 is the start vertex."""
    spark = graph.vertices.sparkSession
    n_edges = graph.edges.count()

    adj = _indexed_adjacency(graph.edges, graph.num_vertices)
    deg = graph.degrees.select(F.col("id").alias("cur"), "out_deg")

    starts = graph.vertices.select("id")
    if walks_per_vertex > 1:
        starts = starts.crossJoin(
            spark.range(walks_per_vertex).select(F.col("id").alias("w"))
        )
    else:
        starts = starts.withColumn("w", F.lit(0))
    frontier = starts.select(
        (F.col("id") * walks_per_vertex + F.col("w")).alias("walk_id"),
        F.col("id").alias("cur"),
    )

    out_steps = [frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex"))]
    interim_ids: set = set()
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        for s in range(1, walk_length + 1):
            # deterministic neighbor pick: hash(walk_id "_" step) % out_deg
            k = md5_long(
                F.concat(
                    F.col("walk_id").cast("string"), F.lit("_"), F.lit(str(s))
                )
            ) % F.col("out_deg")
            stepped = (
                frontier.join(F.broadcast(deg) if not big_state else deg, "cur")
                .where(F.col("out_deg") > 0)  # dangling walks terminate
                .select("walk_id", "cur", k.alias("idx"))
            )
            frontier = stepped.join(
                adj.select(F.col("src").alias("cur"), "idx", "dst"), ["cur", "idx"]
            ).select("walk_id", F.col("dst").alias("cur"))
            # EVERY step materializes (eager localCheckpoint — the same
            # one-job-per-superstep discipline as the other kernels): every
            # step's frontier is an output row set, so lazy chains would
            # recompute step k's joins k times when the corpus union is
            # consumed (O(L²) joins total; measured 76s vs ~8s at L=16 on
            # the gate graph). NOT RotatingState — all steps stay referenced
            # by the final union; blocks are tracked and freed below.
            frontier, ids = checkpoint_tracked(frontier)
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
            # materialize the corpus once, then free every per-step block
            # set — the returned DataFrame owns exactly ONE block set (like
            # every kernel's final rotated state)
            out, _ = checkpoint_tracked(out)
            free_tracked(spark.sparkContext, interim_ids)
    return out


def random_walks_sql(walk_length: int = 4, walks_per_vertex: int = 1) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs in scope):
    replays the identical hash-driven walks."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    ctes = [
        """wadj AS MATERIALIZED (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
      FROM edges
    )""",
        """wdeg AS MATERIALIZED (
      SELECT v.id AS cur, coalesce(o.c, 0) AS out_deg
      FROM verts v
      LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) o
        ON o.src = v.id
    )""",
        f"""w0 AS (
      SELECT v.id * {walks_per_vertex} + g.w AS walk_id, v.id AS cur
      FROM verts v CROSS JOIN (
        SELECT unnest(range({walks_per_vertex})) AS w
      ) g
    )""",
    ]
    for s in range(1, walk_length + 1):
        h = md5_long_sql(f"concat(CAST(f.walk_id AS VARCHAR), '_', '{s}')")
        ctes.append(
            f"""w{s} AS MATERIALIZED (
      SELECT f.walk_id, a.dst AS cur
      FROM w{s - 1} f
      JOIN wdeg d ON d.cur = f.cur AND d.out_deg > 0
      JOIN wadj a ON a.src = f.cur AND a.idx = ({h}) % d.out_deg
    )"""
        )
    body = ",\n    ".join(ctes)
    selects = "\n    UNION ALL ".join(
        f"SELECT walk_id, {s} AS step, cur AS vertex FROM w{s}"
        for s in range(0, walk_length + 1)
    )
    return f"""{body}
    {selects}
    """


def skipgram_pairs(corpus: DataFrame, window: int = 2) -> DataFrame:
    """→ [center, context, n]: skip-gram co-occurrence counts over a walk
    corpus ([walk_id, step, vertex]) — the training pairs DeepWalk-style
    embedding jobs consume. The context join is an EQUI-join on
    (walk_id, step + δ) for the 2·window explicit offsets (explode of a
    constant array), so fan-out is exactly 2·window per corpus row — never
    the O(L²)-per-walk blowup of a bare walk_id join. One aggregate
    (map-side combinable) compacts repeated pairs."""
    offs = [d for d in range(-window, window + 1) if d != 0]
    a = corpus.select(
        "walk_id", F.col("step").alias("i"), F.col("vertex").alias("center")
    ).withColumn("delta", F.explode(F.array(*[F.lit(d) for d in offs])))
    b = corpus.select(
        "walk_id", (F.col("step")).alias("j"), F.col("vertex").alias("context")
    )
    pairs = a.withColumn("j", F.col("i") + F.col("delta")).join(
        b, ["walk_id", "j"]
    )
    return pairs.groupBy("center", "context").agg(F.count("*").alias("n"))


def skipgram_pairs_sql(
    walk_length: int = 4, walks_per_vertex: int = 1, window: int = 2
) -> str:
    """DuckDB oracle body: the walks replay + the windowed pair join."""
    walks = random_walks_sql(walk_length, walks_per_vertex)
    # wrap the walk replay's final UNION ALL into a corpus CTE
    idx = walks.rindex("SELECT walk_id, 0 AS step")
    body, selects = walks[:idx].rstrip().rstrip(","), walks[idx:]
    return f"""{body},
    wcorpus AS MATERIALIZED (
    {selects}
    )
    SELECT a.vertex AS center, b.vertex AS context, count(*) AS n
    FROM wcorpus a
    JOIN wcorpus b
      ON b.walk_id = a.walk_id
     AND b.step BETWEEN a.step - {window} AND a.step + {window}
     AND b.step <> a.step
    GROUP BY 1, 2
    """
