"""Bow-tie decomposition of a directed graph (Broder et al., WWW 2000).

The canonical macro-structure report for a link graph: the largest
strongly connected component (CORE), the vertices that can reach it (IN),
the vertices it can reach (OUT), everything else weakly attached
(TENDRILS — includes Broder's tubes), and the weakly disconnected rest
(DISCONNECTED). The reference computes PageRank over exactly this kind of
web-style link graph (``pagerank_lambda/dynamodb/pagerank.py``) but has no
structure report; this is the engine addition that tells a user what shape
their crawl actually has before they rank it.

Composition, not a new fixpoint:

1. :func:`strongly_connected_components` labels SCCs (FW-BW-min peeling).
2. The largest SCC is a 1-row ``TakeOrdered`` over the label histogram.
3. Forward/backward reachability from the CORE runs the standard
   frontier BFS — only the *newly reached* rows join the edge table each
   level (geometric frontier, the BFS convention of ``paths.py``), with
   lineage truncated per level via :class:`RotatingState`.
4. Weak connectivity reuses :func:`connected_components` to split
   TENDRILS from DISCONNECTED.
5. Category assignment is one pass of left-semi flags over the vertex
   table; sizes are a 5-row aggregate.

Scale shape: every step is a hash join + aggregate already proven at
scale by its parent kernel; no transitive closure, no per-pair state.
A vertex both reaching and reached by the CORE is *in* the CORE (mutual
reachability), so IN/OUT/CORE are disjoint by construction.

No SQL oracle (SCC + two BFS fixpoints are recursion DuckDB cannot
replay); the gate records the rows-only check and correctness is pinned
by the pure-python Kosaraju+BFS pytest oracle on closed-form and
randomized graphs (``tests/test_wave13.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState


@dataclass
class BowtieResult:
    sizes: DataFrame  # [category: string, n_vertices: long] — 5 rows
    core_scc: int  # label (min member id) of the CORE
    converged: bool
    metrics: list = field(default_factory=list)


def _reach(spark, edges: DataFrame, seeds: DataFrame, max_levels: int, tag: str):
    """Frontier BFS: → ([id] reached set incl. seeds, levels, converged).

    ``edges`` is joined only against the frontier (rows first reached last
    level), so per-level work is O(frontier out-degree), not O(reached);
    the newly-reached count rides the rotation via ``observe()`` — exactly
    ONE Spark job per level."""
    state = RotatingState(spark)
    reached = state.rotate(seeds.select("id").distinct())
    frontier = reached
    levels = 0
    converged = False
    for levels in range(1, max_levels + 1):
        cand = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new_frontier = cand.join(reached.select("id"), "id", "left_anti")
        obs = Observation(f"bowtie_{tag}_{id(state)}_{levels}")
        grown = (
            reached.select("id", F.lit(False).alias("_new"))
            .unionByName(new_frontier.select("id", F.lit(True).alias("_new")))
            .observe(
                obs,
                F.sum(F.when(F.col("_new"), 1).otherwise(0)).alias("n"),
            )
        )
        nxt = state.rotate(grown)
        n_new = obs.get["n"] or 0
        # lazy selects over the latest rotation are safe (blocks are freed
        # only after the NEXT rotation materializes — lineage.py contract)
        frontier = nxt.where(F.col("_new")).select("id")
        reached = nxt.select("id")
        if n_new == 0:
            converged = True
            break
    return reached, levels, converged


def bowtie(
    graph: LinkGraph,
    max_rounds: int = 20,
    max_levels: int = 100,
) -> BowtieResult:
    """→ :class:`BowtieResult` with ``sizes[category, n_vertices]`` over
    categories ``core | in | out | tendrils | disconnected`` (all 5 rows
    always present, zero-count categories included — stable schema for the
    driver gate). ``converged`` is False iff the SCC peel or a BFS level
    cap was hit; sizes are then partial and must not be trusted."""
    from linkgraph_spark.kernels.components import connected_components
    from linkgraph_spark.kernels.scc import strongly_connected_components

    spark = graph.vertices.sparkSession
    scc_res = strongly_connected_components(graph, max_rounds=max_rounds)

    # largest SCC: label histogram → TakeOrdered limit(1) (O(1) driver rows)
    top = (
        scc_res.labels.groupBy("scc")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .limit(1)
        .collect()
    )
    core_scc = int(top[0]["scc"])
    core = scc_res.labels.where(F.col("scc") == core_scc).select("id")
    core = core.localCheckpoint()  # seeds read by both sweeps + the flags

    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    edges.count()
    bwd_edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    fwd, lf, cf = _reach(spark, edges, core, max_levels, "fwd")
    bwd, lb, cb = _reach(spark, bwd_edges, core, max_levels, "bwd")

    wcc_res = connected_components(graph)
    wcc = wcc_res.labels  # [id, component]
    core_wcc = (
        wcc.join(core.limit(1), "id").select("component").limit(1).collect()
    )[0]["component"]

    flag = lambda df, name: df.select("id", F.lit(True).alias(name))  # noqa: E731
    cats = (
        graph.vertices.select("id")
        .join(flag(core, "_core"), "id", "left")
        .join(flag(fwd, "_fwd"), "id", "left")
        .join(flag(bwd, "_bwd"), "id", "left")
        .join(wcc.select("id", "component"), "id")
        .select(
            "id",
            F.when(F.col("_core").isNotNull(), "core")
            .when(F.col("_fwd").isNotNull(), "out")
            .when(F.col("_bwd").isNotNull(), "in")
            .when(F.col("component") == core_wcc, "tendrils")
            .otherwise("disconnected")
            .alias("category"),
        )
    )
    counted = cats.groupBy("category").agg(F.count("*").alias("n_vertices"))
    all_cats = spark.createDataFrame(
        [(c,) for c in ("core", "in", "out", "tendrils", "disconnected")],
        "category string",
    )
    sizes = (
        all_cats.join(counted, "category", "left")
        .select(
            "category", F.coalesce("n_vertices", F.lit(0)).alias("n_vertices")
        )
        .localCheckpoint()  # tiny result; frees the cached edge table below
    )
    edges.unpersist()
    return BowtieResult(
        sizes=sizes,
        core_scc=core_scc,
        converged=scc_res.converged and cf and cb and wcc_res.converged,
        metrics=scc_res.metrics + [{"fwd_levels": lf, "bwd_levels": lb}],
    )
