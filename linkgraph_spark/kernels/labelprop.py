"""Synchronous label propagation (community detection; north_star kernel #3).

Per superstep every vertex adopts the most frequent label among its
undirected neighbors, ties broken by the smallest label (deterministic — no
RNG, so results are identical across runs and parallelism levels, unlike
classic async LPA). Vertices with no neighbors keep their label. Runs to a
fixed max iteration count (LPA on symmetric graphs can 2-cycle, so a
fixpoint test alone would not terminate; the fixed cap matches the
reference's fixed-iteration discipline, ``dynamodb/driver.py:157``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.kernels.components import undirected
from linkgraph_spark.session import pinned_superstep_confs


def _undirected_weighted(edges: DataFrame) -> DataFrame:
    """Symmetrize keeping weights: influence between two actors = total
    interaction weight across both directions."""
    both = edges.select("src", "dst", "weight").unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    return (
        both.where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def label_propagation(
    graph: LinkGraph,
    max_iterations: int = 5,
    weighted: bool = False,
    checkpoint: CheckpointStore | None = None,
    resume: bool = False,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """→ ``DataFrame[id: long, label: long]``.

    ``weighted=True`` (needs ``build_graph(weighted=True)``): neighbor
    labels vote with total interaction weight instead of neighbor count —
    a tool invoked 100x by one actor outweighs one invoked once; ties still
    break on the smallest label, so the result stays deterministic.

    ``init_labels`` (``[id, label]``): warm start from yesterday's
    communities — today's additions default to their own id, everyone else
    resumes their previous label, so a few supersteps re-mix the new
    vertices instead of re-running the full cap from singletons. Same
    contract as the PageRank/components warm starts (the label VALUES come
    from the prior run; LPA semantics per superstep are unchanged)."""
    spark = graph.vertices.sparkSession
    if weighted:
        if "weight" not in graph.edges.columns:
            raise ValueError("weighted label propagation needs build_graph(weighted=True)")
        sym = _undirected_weighted(graph.edges).persist()
    else:
        sym = undirected(graph.edges).persist()
    n_sym = sym.count()

    labels = graph.vertices.select("id", F.col("id").alias("label"))
    if init_labels is not None:
        # defensive per-id min (deterministic, matches the kernel's
        # smallest-label tie-break): duplicated init ids would otherwise
        # double that vertex's vote in every superstep
        warm = init_labels.groupBy("id").agg(F.min("label").alias("_init"))
        labels = (
            graph.vertices.select("id")
            .join(warm, "id", "left")
            .select("id", F.coalesce("_init", F.col("id")).alias("label"))
        )
    start = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("labelprop")
        if latest is not None:
            labels = checkpoint.load_state(spark, "labelprop", latest)
            start = latest
    state = RotatingState(spark)
    labels = state.rotate(labels)  # truncate lineage per superstep

    with pinned_superstep_confs(spark, n_sym, graph.num_vertices) as big_state:
        for it in range(start + 1, max_iterations + 1):
            lbl = labels if big_state else F.broadcast(labels)
            vote = F.sum("weight") if weighted else F.count("*")
            counts = (
                sym.join(lbl, sym.dst == lbl.id, "inner")
                .groupBy(F.col("src").alias("id"), F.col("label").alias("nbr_label"))
                .agg(vote.alias("freq"))
            )
            w = Window.partitionBy("id").orderBy(F.desc("freq"), F.asc("nbr_label"))
            best = (
                counts.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select("id", F.col("nbr_label").alias("new_label"))
            )
            labels = state.rotate(
                labels.join(best, "id", "left")
                .select("id", F.coalesce("new_label", F.col("label")).alias("label"))
            )
            if checkpoint is not None:
                checkpoint.write_state("labelprop", it, labels, key_col="id", metrics={})

    sym.unpersist()
    return labels


def seed_spread(
    graph: LinkGraph, seeds: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """→ ``[id, label]`` (label NULL where no seed is reachable) —
    semi-supervised label spreading: only labels originating at ``seeds``
    (``[id, label]``) propagate; every other vertex adopts the MINIMUM
    label among itself and its undirected neighbors each round. The
    fixpoint labels each vertex with the smallest seed label reachable
    from it — deterministic influence domains around curated seed actors
    (moderation spheres, team territories), distinct from components
    (singleton init) and LPA (plurality vote).

    Scale shape: identical to the hash-min components kernel — one gather
    join + grouped min per round over the symmetrized edges, converging in
    O(component diameter) rounds with an early exit on zero changes; the
    monotone-min update makes a fixed-round SQL unroll match exactly."""
    from pyspark.sql import Observation

    spark = graph.vertices.sparkSession
    sym = undirected(graph.edges).persist()
    n_sym = sym.count()
    seed_min = seeds.groupBy("id").agg(F.min("label").alias("_s"))
    labels = (
        graph.vertices.select("id")
        .join(seed_min, "id", "left")
        .select("id", F.col("_s").cast("long").alias("label"))
    )
    state = RotatingState(spark)
    labels = state.rotate(labels)
    with pinned_superstep_confs(spark, n_sym, graph.num_vertices) as big_state:
        for it in range(1, max_iterations + 1):
            lbl = labels if big_state else F.broadcast(labels)
            gathered = (
                sym.join(
                    lbl.select(F.col("id").alias("dst"), F.col("label").alias("nl")),
                    "dst",
                )
                .where(F.col("nl").isNotNull())
                .groupBy(F.col("src").alias("id"))
                .agg(F.min("nl").alias("mn"))
            )
            nxt = labels.join(gathered, "id", "left").select(
                "id",
                F.least(
                    F.coalesce("label", F.col("mn")), F.coalesce("mn", F.col("label"))
                ).alias("label"),
                (
                    F.col("mn").isNotNull()
                    & (F.col("label").isNull() | (F.col("mn") < F.col("label")))
                ).alias("_chg"),
            )
            obs = Observation(f"seed_spread_{id(state)}_{it}")
            nxt = nxt.observe(
                obs, F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("c")
            )
            labels = state.rotate(nxt.drop("_chg"))
            if int(obs.get["c"] or 0) == 0:
                break
    sym.unpersist()
    return labels


def seed_spread_sql(seed_max_id: int, rounds: int = 20) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs) for
    :func:`seed_spread` with the gate's seed rule ``id < seed_max_id``
    labeled with their own id: the min-update unrolled ``rounds`` times
    (must cover the gate graph's diameter — monotone min makes extra
    rounds no-ops, so over-unrolling is safe)."""
    ctes = [
        """ss_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        f"""ss0 AS (
      SELECT id, CASE WHEN id < {int(seed_max_id)} THEN id END AS label
      FROM verts
    )""",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""ss{k} AS MATERIALIZED (
      SELECT p.id,
             least(coalesce(p.label, m.mn), coalesce(m.mn, p.label)) AS label
      FROM ss{k - 1} p
      LEFT JOIN (
        SELECT e.src AS id, min(n.label) AS mn
        FROM ss_und e JOIN ss{k - 1} n ON n.id = e.dst
        WHERE n.label IS NOT NULL
        GROUP BY e.src
      ) m ON m.id = p.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, CAST(label AS BIGINT) AS label FROM ss{rounds}
    """
