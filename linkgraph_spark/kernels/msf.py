"""Borůvka minimum spanning forest over the weighted actor graph.

Engine addition (the reference's one kernel is PageRank —
``pagerank_lambda/dynamodb/pagerank.py``; it has no spanning structure at
all). The MSF is the classic backbone extraction for a 100 TB link graph:
the lightest edge set connecting everything that is connectable, the
skeleton used for clustering (cut the k-1 heaviest MSF edges = single-link
k-clustering), visual summarization, and network-cost planning.

Algorithm = distributed Borůvka (1926, the original parallel MST
algorithm; the standard choice for Pregel/MapReduce — each round EVERY
component picks its minimum incident edge, so the component count at least
halves per round ⇒ ≤ log2(V) rounds, no sequential edge scan like Kruskal
or Prim):

1. every component selects its minimum outgoing edge under the TOTAL order
   ``(weight, a, b)`` — the lexicographic tie-break makes all edge weights
   effectively distinct, so the MSF is UNIQUE and equals Kruskal's with the
   same tie-break (the pytest oracle replays exactly that);
2. selected edges join the forest; the selection digraph (comp → other
   endpoint's comp) has, by the distinct-weight argument, only 2-cycles at
   mutual-min pairs — resolving those to ``min(c, partner)`` turns it into
   a rooted forest;
3. components merge by POINTER DOUBLING on that forest (``p ← p∘p`` until
   fixpoint, ≤ log2(depth) self-joins of the O(components) parent table —
   a chain-shaped selection graph would take O(V) hash-min rounds, the
   doubling takes ~20 for a billion);
4. live edges are relabeled to merged components, intra-component edges
   drop, and parallel edges between a component pair collapse to the
   lightest (cut property: only the lightest can ever be chosen) — the
   live edge set shrinks with the component count.

Scale shape: every step is an equi-join or group-min on component keys;
per-frame lifetimes via RotatingState (separate states for the ACCUMULATING
forest and the SHRINKING live set — rotate() frees the previous rotation);
one cheap count per round on already-checkpointed blocks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState, checkpoint_tracked, free_tracked
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class MSFResult:
    """``edges`` is the forest [a: long, b: long, weight] (a < b); unique
    given the (weight, a, b) total order, so value-testable against a
    sequential Kruskal with the same tie-break."""

    edges: DataFrame
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def boruvka_msf(graph: LinkGraph, max_iterations: int = 40) -> MSFResult:
    """Minimum spanning forest of the undirected weighted simple graph
    (parallel edges collapse to their minimum weight; self-loops drop).
    ``graph.edges`` must carry a ``weight`` column."""
    if "weight" not in graph.edges.columns:
        raise ValueError("boruvka_msf needs weighted edges ([src, dst, weight])")
    spark = graph.edges.sparkSession

    # simple undirected weighted edges, a < b, min weight per pair
    simple = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("double").alias("weight"),
        )
        .groupBy("a", "b")
        .agg(F.min("weight").alias("weight"))
    )
    # live inter-component edges: component endpoints + original identity
    live_state = RotatingState(spark)
    live = live_state.rotate(
        simple.select(
            F.col("a").alias("ca"), F.col("b").alias("cb"), "weight", "a", "b"
        )
    )
    forest_state = RotatingState(spark)
    forest = forest_state.rotate(
        spark.createDataFrame([], "a long, b long, weight double")
    )

    n_edges = live.count()
    converged = False
    metrics: list = []
    rnd = 0
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big:
        for rnd in range(1, max_iterations + 1):
            n_live = live.count()  # cheap: reads the checkpointed blocks
            if n_live == 0:
                converged = True
                rnd -= 1
                break

            # 1. per-component minimum incident edge under (weight, a, b)
            sym = live.select(
                F.col("ca").alias("c"), F.col("cb").alias("oc"), "weight", "a", "b"
            ).unionByName(
                live.select(
                    F.col("cb").alias("c"), F.col("ca").alias("oc"), "weight", "a", "b"
                )
            )
            # checkpoint sel once: BOTH consumers below (forest append and
            # the parent init) would otherwise re-run the round's dominant
            # group-min shuffle; freed at end of round (O(components) rows)
            sel, sel_ids = checkpoint_tracked(
                sym.groupBy("c")
                .agg(F.min(F.struct("weight", "a", "b", "oc")).alias("m"))
                .select(
                    "c",
                    F.col("m.oc").alias("oc"),
                    F.col("m.weight").alias("weight"),
                    F.col("m.a").alias("a"),
                    F.col("m.b").alias("b"),
                )
            )

            # 2. chosen edges join the forest (both endpoints may pick the
            # same edge → distinct; a later round can never re-pick one:
            # its endpoints share a component and intra edges are filtered)
            forest = forest_state.rotate(
                forest.unionByName(sel.select("a", "b", "weight").distinct())
            )

            # 3. selection digraph → rooted forest → pointer doubling.
            # Mutual-min 2-cycles (the only cycles, by the total order)
            # root at min(c, partner); everything else keeps its pointer.
            p = sel.select("c", F.col("oc").alias("p"))
            x, y = p.alias("x"), p.alias("y")
            if not big:
                # small regime: the O(components) pointer frames ride
                # broadcasts — the doubling loop never shuffles
                y = F.broadcast(y)
            parent = x.join(y, F.col("x.p") == F.col("y.c")).select(
                F.col("x.c").alias("c"),
                F.when(
                    F.col("y.p") == F.col("x.c"),  # mutual pair
                    F.least(F.col("x.c"), F.col("x.p")),
                )
                .otherwise(F.col("x.p"))
                .alias("p"),
            )
            inner = RotatingState(spark)
            parent = inner.rotate(parent)
            for j in range(64):  # ≤ log2(depth) iterations
                px, py = parent.alias("x"), parent.alias("y")
                if not big:
                    py = F.broadcast(py)
                nxt = px.join(py, F.col("x.p") == F.col("y.c")).select(
                    F.col("x.c").alias("c"),
                    F.col("y.p").alias("p"),
                    F.col("x.p").alias("_old"),
                )
                obs = Observation(f"msf_jump_{id(inner)}_{rnd}_{j}")
                nxt = nxt.observe(
                    obs,
                    F.sum(
                        F.when(F.col("p") != F.col("_old"), 1).otherwise(0)
                    ).alias("changed"),
                )
                parent = inner.rotate(nxt).select("c", "p")
                if (obs.get["changed"] or 0) == 0:
                    break

            # 4. relabel live edges, drop intra-component, keep the lightest
            # per merged pair (cut property: heavier parallels are dead)
            root_a = parent.select(F.col("c").alias("ca"), F.col("p").alias("_ra"))
            root_b = parent.select(F.col("c").alias("cb"), F.col("p").alias("_rb"))
            if not big:
                root_a = F.broadcast(root_a)
                root_b = F.broadcast(root_b)
            relabeled = (
                live.join(root_a, "ca", "left")
                .join(root_b, "cb", "left")
                .select(
                    F.coalesce("_ra", F.col("ca")).alias("na"),
                    F.coalesce("_rb", F.col("cb")).alias("nb"),
                    "weight",
                    "a",
                    "b",
                )
                .where(F.col("na") != F.col("nb"))
                .select(
                    F.least("na", "nb").alias("ca"),
                    F.greatest("na", "nb").alias("cb"),
                    "weight",
                    "a",
                    "b",
                )
                .groupBy("ca", "cb")
                .agg(F.min(F.struct("weight", "a", "b")).alias("m"))
                .select(
                    "ca",
                    "cb",
                    F.col("m.weight").alias("weight"),
                    F.col("m.a").alias("a"),
                    F.col("m.b").alias("b"),
                )
            )
            live = live_state.rotate(relabeled)
            inner.release()
            free_tracked(spark.sparkContext, sel_ids)
            metrics.append({"round": rnd, "live_edges": n_live})
        else:
            converged = live.count() == 0

    return MSFResult(
        edges=forest.orderBy("a", "b"),
        iterations=rnd,
        converged=converged,
        metrics=metrics,
    )


def msf_clusters(
    graph: LinkGraph, cuts: int, max_iterations: int = 40
) -> DataFrame:
    """→ [id, cluster]: SINGLE-LINK clustering via the MSF — cut the
    ``cuts`` heaviest forest edges (under the same (weight, a, b) total
    order, descending), then label the remaining forest's components
    (cluster = min member id). Standard equivalence: with all-distinct
    effective weights, removing the k heaviest MSF edges yields exactly
    the single-linkage partition with components + k clusters — the
    similarity-graph clustering step of a curation pipeline, without ever
    materializing a dendrogram.

    Scale shape: the cut is a TakeOrdered over the O(V) forest (never a
    full sort); labels come from the large-star/small-star components
    kernel (O(log n) rounds) on the forest — a graph with ≤ V-1 edges
    regardless of input edge count."""
    if cuts < 0:
        raise ValueError("cuts must be >= 0")
    from dataclasses import replace

    from linkgraph_spark.kernels.components import connected_components_star

    res = boruvka_msf(graph, max_iterations=max_iterations)
    if not res.converged:
        raise RuntimeError("boruvka_msf did not converge; raise max_iterations")
    forest = res.edges
    keep = forest
    if cuts > 0:
        cut = forest.orderBy(
            F.desc("weight"), F.desc("a"), F.desc("b")
        ).limit(cuts)
        keep = forest.join(cut, ["a", "b"], "left_anti")
    sub = replace(graph, edges=keep.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    cc = connected_components_star(sub)
    if not cc.converged:
        raise RuntimeError("components over the cut forest did not converge")
    return cc.labels.select("id", F.col("component").alias("cluster"))
