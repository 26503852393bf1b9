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
