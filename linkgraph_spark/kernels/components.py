"""Connected components via hash-min label exchange (north_star kernel #2).

Same superstep scaffold as PageRank: per iteration every vertex adopts the
minimum label among itself and its (undirected) neighbors; fixpoint when no
label changes. Labels start as vertex ids, so each component converges to
its minimum member id — exact, deterministic, parallelism-independent.

Scale notes: iterations = graph diameter. Transcript graphs are
shallow-diameter (conversations are chains of ≤ a few hundred turns bridged
by tool hubs), so hash-min converges in a few supersteps; each superstep is
one co-partitioned join + min-agg, checkpointed like PageRank so a crashed
run resumes mid-fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState


def undirected(edges: DataFrame) -> DataFrame:
    """Symmetrize + dedup: each undirected neighbor pair appears both ways."""
    return (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    graph: LinkGraph,
    max_iterations: int = 50,
    checkpoint: CheckpointStore | None = None,
    resume: bool = False,
) -> DataFrame:
    """→ ``DataFrame[id: long, component: long]`` (component = min member id)."""
    spark = graph.vertices.sparkSession
    sym = undirected(graph.edges).persist()
    sym.count()

    labels = graph.vertices.select("id", F.col("id").alias("component"))
    start = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("components")
        if latest is not None:
            labels = checkpoint.load_state(spark, "components", latest)
            start = latest
    state = RotatingState(spark)
    labels = state.rotate(labels)  # truncate lineage per superstep

    for it in range(start + 1, max_iterations + 1):
        nbr_min = (
            sym.join(labels, sym.dst == labels.id, "inner")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
            F.col("component").alias("_old"),
        )
        new = state.rotate(new)
        changed = new.where(F.col("component") != F.col("_old")).count()
        labels = new.select("id", "component")
        if checkpoint is not None:
            checkpoint.write_state(
                "components", it, labels, key_col="id", metrics={"changed": changed}
            )
        if changed == 0:
            break

    sym.unpersist()
    return labels
