"""Graph ETL: transcripts → cleaned integer edge table + vertex universe.

This is the Spark-native re-expression of the reference's ETL
(``pagerank_lambda/dynamodb/init_to_s3.py``):

- parse/derive edges           (reference: ``init_to_s3.py:60-62``, tab split)
- self-loop filter             (reference: ``init_to_s3.py:63-64``)
- (src, dst) dedup             (reference: ``init_to_s3.py:75-76``, first-wins)
- vertex universe = src ∪ dst  (reference: ``init_to_s3.py:74,77,112-115``)
- in-degree ("relation_length") per destination (reference: ``driver.py:124``)

Edge semantics (BASELINE.json north_star): vertices are conv-scoped role
actors (``{conv_id}#{role}``) and global tool actors (``tool:{tool}``);
edges are (a) adjacent-turn links ``actor(role@turn_k) → actor(role@turn_k+1)``
within each conversation under stable ``(conv_id, turn_idx)`` ordering, and
(b) tool-invocation links ``actor → tool`` where ``tool`` is non-null.

Where the reference rescans the whole sorted edge file once per partition
(O(P·E), ``init_to_s3.py:59,97-107``), Spark does the same work in one
shuffle.

Scale notes:

- the adjacent-turn window shuffles once on ``conv_id`` — the natural
  partitioning key of the transcript table, so with an Iceberg table
  bucketed by conv_id this is shuffle-free (storage-partitioned join/window);
- actor-id assignment is a global sort (range shuffle, terasort-style — no
  single-partition window) followed by a per-partition offset add, so it
  scales to arbitrarily many distinct actors and is deterministic across
  parallelism levels (ids = rank in sorted key order, independent of
  partition boundaries).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def derive_edge_keys(transcripts: DataFrame) -> DataFrame:
    """Transcripts → raw string-keyed edges (pre-cleaning).

    Returns ``DataFrame[src_key: string, dst_key: string, kind: string]``
    with kind ∈ {adjacent_turn, tool_invocation}.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    actor = F.concat(F.col("conv_id"), F.lit("#"), F.col("role"))
    adjacent = (
        transcripts.select(
            actor.alias("src_key"),
            F.concat(F.col("conv_id"), F.lit("#"), F.lead("role").over(w)).alias("dst_key"),
        )
        .where(F.col("dst_key").isNotNull())
        .withColumn("kind", F.lit("adjacent_turn"))
    )
    tool = (
        transcripts.where(F.col("tool").isNotNull())
        .select(
            actor.alias("src_key"),
            F.concat(F.lit("tool:"), F.col("tool")).alias("dst_key"),
        )
        .withColumn("kind", F.lit("tool_invocation"))
    )
    return adjacent.unionByName(tool)


def clean_edges_weighted(raw: DataFrame) -> DataFrame:
    """Like :func:`clean_edges` but keeps multi-edge multiplicity as a
    ``weight`` column (the reference's first-wins dedup discards it,
    ``init_to_s3.py:75-76``; weighted mode is an engine extension — e.g.
    how often a role actually invoked a tool)."""
    return (
        raw.where(F.col("src_key").isNotNull() & F.col("dst_key").isNotNull())
        .where(F.col("src_key") != F.col("dst_key"))
        .groupBy("src_key", "dst_key")
        .agg(F.count("*").alias("weight"))
    )


def clean_edges(raw: DataFrame) -> DataFrame:
    """Self-loop filter + (src, dst) dedup — reference ``init_to_s3.py:63-64,75-76``.

    Malformed rows (null endpoints) are dropped, matching the reference's
    bare ``except: pass`` around the line parse (``init_to_s3.py:78-79``).
    """
    return (
        raw.where(F.col("src_key").isNotNull() & F.col("dst_key").isNotNull())
        .where(F.col("src_key") != F.col("dst_key"))
        .select("src_key", "dst_key")
        .dropDuplicates(["src_key", "dst_key"])
    )


def assign_actor_ids(
    clean: DataFrame, num_partitions: int | None = None, track_blocks: set | None = None
) -> DataFrame:
    """Dense deterministic ids for the vertex universe.

    Semantics: ``id = rank of actor_key in global sorted order`` (0-based) —
    exactly ``row_number() OVER (ORDER BY actor_key) - 1``, but executed as a
    range-partitioned sort + per-partition offset add so no single task ever
    holds the whole universe (the single-partition window would die at
    10^12-turn scale). Deterministic across parallelism levels because the
    result depends only on the sorted order, not on boundary placement.

    The sorted universe is pinned with ``localCheckpoint`` (not ``persist``)
    before the offsets are collected: the offset map is only valid for the
    exact partition boundaries it was computed from, and a recomputation
    through ``repartitionByRange``'s *sampled* boundaries could silently
    shift rows between partitions. A checkpoint makes a lost block a LOUD
    job failure instead of silently duplicated/skipped ids; callers free the
    blocks via :func:`linkgraph_spark.lineage.free_tracked` once the id
    table is materialized (``build_graph`` does).
    """
    from linkgraph_spark.lineage import checkpoint_tracked

    spark = clean.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = (
        clean.select(F.col("src_key").alias("actor_key"))
        .unionByName(clean.select(F.col("dst_key").alias("actor_key")))
        .distinct()
    )
    sorted_keys, block_ids = checkpoint_tracked(
        keys.repartitionByRange(n, "actor_key").sortWithinPartitions("actor_key")
    )
    if track_blocks is not None:
        track_blocks.update(block_ids)
    part_counts = (
        sorted_keys.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = {r["pid"]: r["count"] for r in part_counts}
    offsets = {}
    acc = 0
    for pid in range(max(counts, default=-1) + 1):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    def add_ids(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        pos = 0
        for pdf in iterator:
            out = pdf.copy()
            out["id"] = range(base + pos, base + pos + len(pdf))
            pos += len(pdf)
            yield out

    return sorted_keys.mapInPandas(add_ids, schema="actor_key string, id long")


@dataclass
class LinkGraph:
    """A cleaned integer link graph plus the static per-vertex degree table.

    ``degrees`` carries both true out-degree (textbook PageRank divisor) and
    the reference's ``relation_length`` = in-degree-or-1
    (``driver.py:124,127-135``) so either semantics is a column pick.
    """

    vertices: DataFrame  # [id: long, actor_key: string]
    edges: DataFrame  # [src: long, dst: long]
    degrees: DataFrame  # [id, out_deg, in_deg, relation_length]
    num_vertices: int
    # localCheckpoint block ids owned by this graph (edge-lineage
    # truncation in build_graph); freed by unpersist()
    ckpt_blocks: frozenset = frozenset()

    def persist(self) -> "LinkGraph":
        self.vertices.persist()
        self.edges.persist()
        self.degrees.persist()
        return self

    def unpersist(self) -> "LinkGraph":
        for df in (self.vertices, self.edges, self.degrees):
            df.unpersist()
        if self.ckpt_blocks:
            from linkgraph_spark.lineage import free_tracked

            free_tracked(
                self.vertices.sparkSession.sparkContext, self.ckpt_blocks
            )
        return self


def build_graph(transcripts: DataFrame, weighted: bool = False) -> LinkGraph:
    """Full ETL: transcripts → LinkGraph (edges/vertices/degrees persisted).

    ``weighted=True`` keeps multi-edge multiplicity as ``edges.weight`` and
    adds ``degrees.w_out_deg`` (total outgoing weight) for weighted kernels.
    """
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    raw = derive_edge_keys(transcripts)
    clean = clean_edges_weighted(raw) if weighted else clean_edges(raw)
    # the cleaned table is read three times below (two key-universe scans +
    # the id-attach join): pin it with a LAZY columnar cache for the
    # duration of the build (an eager localCheckpoint here measured SLOWER
    # — the barrier + row-block reads cost more than the recomputes)
    clean = clean.persist()
    key_blocks: set = set()
    vertices = assign_actor_ids(
        clean.select("src_key", "dst_key"), track_blocks=key_blocks
    ).persist()
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    edges_plan = (
        clean.join(vertices.withColumnRenamed("actor_key", "src_key"), "src_key")
        .withColumnRenamed("id", "src")
        .join(
            vertices.withColumnRenamed("actor_key", "dst_key").withColumnRenamed("id", "dst"),
            "dst_key",
        )
        .select(*cols)
    )
    # TRUNCATE the edge lineage to a leaf (eager localCheckpoint), then put
    # the columnar cache on top.  Every downstream kernel re-analyzes the
    # edge plan at each reference — multi-branch one-shot kernels (census,
    # triangle family) re-embed it dozens of times, and the Catalyst
    # re-analysis of the full window+join ETL tree was costing seconds of
    # DRIVER time per query (measured: the 4-graphlet census over a
    # truncated edge leaf runs 7.5 s vs 17-24 s over the raw lineage at
    # sf0.1).  The blocks are tracked on the LinkGraph and freed by
    # unpersist().
    edges, edge_blocks = checkpoint_tracked(edges_plan)
    edges = edges.persist()
    degrees = vertex_degrees(vertices, edges).persist()
    n = vertices.count()
    edges.count()  # materialize eagerly: persisted-but-lazy tables would
    degrees.count()  # otherwise bill their first compute to the first kernel
    # the sorted key universe has served its purpose — free its checkpoint
    # blocks (previously leaked one copy per build_graph call)
    free_tracked(transcripts.sparkSession.sparkContext, key_blocks)
    clean.unpersist()  # edges/vertices/degrees are materialized; drop the cache
    return LinkGraph(
        vertices=vertices,
        edges=edges,
        degrees=degrees,
        num_vertices=n,
        ckpt_blocks=frozenset(edge_blocks),
    )


def graph_from_edges(spark: SparkSession, pairs) -> LinkGraph:
    """Build a LinkGraph from raw integer ``(src, dst)`` pairs (fixture path,
    mirroring the reference's raw SNAP edge-list input) or from an existing
    two-column DataFrame. Applies the same cleaning as the transcript path:
    null/malformed drop (``init_to_s3.py:78-79``), self-loop filter
    (``:63-64``), dedup (``:75-76``). Vertex ids are kept as given (the
    reference keys state by the raw page id)."""
    if isinstance(pairs, DataFrame):
        a, b = pairs.columns[:2]
        raw = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    else:
        raw = spark.createDataFrame(pairs, "src long, dst long")
    edges = (
        raw.where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("actor_key", F.col("id").cast("string"))
        .select("id", "actor_key")
        .persist()
    )
    degrees = vertex_degrees(vertices, edges).persist()
    return LinkGraph(vertices=vertices, edges=edges, degrees=degrees, num_vertices=vertices.count())


def vertex_degrees(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """Static degree table — computed once, reused across all supersteps
    (the reference recomputes ``relation_length`` into every state row,
    ``pagerank.py:91``; here it is an iteration-invariant join input)."""
    weighted = "weight" in edges.columns
    w = F.col("weight") if weighted else F.lit(1)
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg"), F.sum(w).alias("w_out_deg")
    )
    in_deg = edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg"))
    return (
        vertices.select("id")
        .join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("w_out_deg", F.lit(0)).alias("w_out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            # reference default: vertices never seen as a destination get
            # relation_length 1 (driver.py:127-135)
            F.coalesce(F.when(F.col("in_deg") > 0, F.col("in_deg")), F.lit(1)).alias(
                "relation_length"
            ),
        )
    )


def edges_sql(transcripts_relation: str) -> str:
    """DuckDB SQL reproducing the full ETL over a transcript relation — the
    oracle for the DataFrame pipeline above.

    ``||`` (not ``concat``) so NULL propagation matches across engines.
    ``MATERIALIZED`` CTE hints prevent DuckDB from re-inlining the chain
    exponentially in downstream iterative oracles.
    """
    return f"""
    WITH t AS MATERIALIZED ({transcripts_relation}),
    adj AS (
      SELECT (conv_id || '#' || role) AS src_key,
             (conv_id || '#' || lead(role) OVER
                (PARTITION BY conv_id ORDER BY turn_idx)) AS dst_key
      FROM t
    ),
    tool_e AS (
      SELECT (conv_id || '#' || role) AS src_key,
             ('tool:' || tool) AS dst_key
      FROM t WHERE tool IS NOT NULL
    ),
    raw AS (
      SELECT src_key, dst_key FROM adj WHERE dst_key IS NOT NULL
      UNION ALL
      SELECT src_key, dst_key FROM tool_e
    ),
    clean AS MATERIALIZED (
      SELECT DISTINCT src_key, dst_key FROM raw WHERE src_key <> dst_key
    ),
    verts AS MATERIALIZED (
      SELECT actor_key,
             row_number() OVER (ORDER BY actor_key) - 1 AS id
      FROM (
        SELECT src_key AS actor_key FROM clean
        UNION
        SELECT dst_key AS actor_key FROM clean
      ) u
    ),
    edges AS MATERIALIZED (
      SELECT vs.id AS src, vd.id AS dst
      FROM clean
      JOIN verts vs ON clean.src_key = vs.actor_key
      JOIN verts vd ON clean.dst_key = vd.actor_key
    )
    """
