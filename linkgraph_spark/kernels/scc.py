"""Strongly connected components: forward/backward hash-min peeling.

SCC is the directed analogue of :mod:`components` — mutual reachability,
the structure that tells a transcript-graph user which actor groups form
genuine feedback loops (user⇄assistant alternation, tool round-trips)
versus one-way flow. Engine addition over the reference (one PageRank
kernel, no graph mining — ``pagerank_lambda/dynamodb/pagerank.py``).

Algorithm — iterated FW-BW-min (the MapReduce-friendly SCC family of
Orzan's coloring, with min labels in both directions):

1. On the active subgraph, propagate min labels FORWARD to fixpoint:
   ``fmin(v)`` = min id that reaches v. Same on reversed edges:
   ``bmin(v)`` = min id v reaches.
2. Vertices with ``fmin(v) == bmin(v) == m`` are assigned SCC ``m`` —
   m reaches v and v reaches m, so they are mutually reachable, and the
   whole SCC of m completes together (no smaller id can reach one member
   without reaching all).
3. Peel the assigned vertices; repeat on the remainder. Each round
   finalizes at least the SCC of the minimum active id, and in practice
   every "locally minimal" SCC in parallel — rounds ≈ the length of the
   longest chain of SCCs with descending-id sources, not #SCCs.

Scale shape: every inner superstep is one edge⋈label join + min-agg
(identical shuffle to hash-min components); the active-subgraph restriction
is two left-semi joins; assignments accumulate via union of
localCheckpoint-ed rounds. State is O(V), never O(reachability pairs) —
the transitive-closure blowup that makes naive SCC infeasible at scale is
avoided entirely.

No SQL oracle: exact SCC needs a transitive-closure fixpoint DuckDB can
only express as a recursive path enumeration (combinatorial on cyclic
graphs), so the gate records the rows-only check and correctness is pinned
by pytest against a Tarjan oracle on closed-form + randomized graphs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class SccResult:
    labels: DataFrame  # [id: long, scc: long] — scc = min member id
    rounds: int  # outer peel rounds
    iterations: int  # total inner supersteps (both directions, all rounds)
    converged: bool
    metrics: list = field(default_factory=list)


def _min_prop(
    state: RotatingState,
    ids: DataFrame,
    edges: DataFrame,
    max_iterations: int,
    tag: str,
) -> tuple[DataFrame, int, bool]:
    """Directed hash-min to fixpoint: label(v) = min(v, labels flowing in
    along ``edges``). → ([id, lbl], supersteps, converged)."""
    lbl = state.rotate(ids.select("id", F.col("id").alias("lbl")))
    it = 0
    converged = False
    for it in range(1, max_iterations + 1):
        cand = (
            edges.join(lbl.select(F.col("id").alias("src"), "lbl"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("cand"))
        )
        new = lbl.join(cand, "id", "left").select(
            "id",
            F.least(F.col("lbl"), F.coalesce("cand", F.col("lbl"))).alias("lbl"),
            (F.coalesce("cand", F.col("lbl")) < F.col("lbl")).alias("_chg"),
        )
        obs = Observation(f"scc_{tag}_{id(state)}_{it}")
        new = new.observe(obs, F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("n"))
        lbl = state.rotate(new.select("id", "lbl", "_chg"))
        changed = obs.get["n"] or 0
        lbl = lbl.select("id", "lbl")
        if changed == 0:
            converged = True
            break
    return lbl, it, converged


def strongly_connected_components(
    graph: LinkGraph,
    max_rounds: int = 20,
    max_inner_iterations: int = 100,
) -> SccResult:
    """→ :class:`SccResult` with ``labels[id, scc]`` (scc = min member id,
    matching the components convention). ``converged`` is False iff an
    outer or inner cap was hit — labels are then only partial/unproven and
    callers must not trust them (same contract as components)."""
    spark = graph.vertices.sparkSession
    fwd_all = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()  # read by every inner superstep of every round
    )
    n_edges = graph.edges.count()

    state = RotatingState(spark)
    active = state.rotate(graph.vertices.select("id"))
    assigned_parts: list[DataFrame] = []
    total_inner = 0
    converged = False
    metrics: list = []
    rnd = 0
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices):
        for rnd in range(1, max_rounds + 1):
            # restrict to the active subgraph (both endpoints still active)
            fwd = fwd_all.join(
                active.withColumnRenamed("id", "src"), "src", "left_semi"
            ).join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            bwd = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

            # one state holder per direction: bmin's rotations must not free
            # fmin's final blocks (both are read below)
            fstate = RotatingState(spark)
            bstate = RotatingState(spark)
            fmin, i1, c1 = _min_prop(
                fstate, active, fwd, max_inner_iterations, f"f{rnd}"
            )
            bmin, i2, c2 = _min_prop(
                bstate, active, bwd, max_inner_iterations, f"b{rnd}"
            )
            total_inner += i1 + i2
            if not (c1 and c2):
                # inner cap hit: fmin/bmin are under-propagated; equal
                # labels would still be mutually reachable, but the peel
                # could split an SCC across rounds — stop, unconverged
                metrics.append({"round": rnd, "inner_capped": True})
                fstate.release()
                bstate.release()
                break

            joined = fmin.join(
                bmin.withColumnRenamed("lbl", "blbl"), "id"
            )
            done = joined.where(F.col("lbl") == F.col("blbl")).select(
                "id", F.col("lbl").alias("scc")
            )
            rest = joined.where(F.col("lbl") != F.col("blbl")).select("id")

            obs = Observation(f"scc_rest_{id(state)}_{rnd}")
            rest = rest.observe(obs, F.count("*").alias("n"))
            new_active = state.rotate(rest)  # one job: materialize + count
            n_rest = obs.get["n"] or 0
            # keep this round's assignments alive independently of the
            # inner-loop rotations (done's plan reads fmin/bmin, whose
            # blocks the next round's rotate would free)
            assigned_parts.append(done.localCheckpoint())
            fstate.release()  # done/rest are checkpointed; fmin/bmin blocks
            bstate.release()  # would otherwise leak one O(V) state per round
            metrics.append({"round": rnd, "assigned_remaining": n_rest})
            active = new_active
            if n_rest == 0:
                converged = True
                break

    labels: DataFrame
    parts = assigned_parts
    if not converged:
        # unfinished remainder: surface it with a null-free sentinel label
        # of its own id so the schema stays total (contract: converged
        # gates trust, as in components)
        parts = parts + [active.select("id", F.col("id").alias("scc"))]
    from functools import reduce

    labels = reduce(DataFrame.unionAll, parts).localCheckpoint()
    fwd_all.unpersist()
    return SccResult(
        labels=labels,
        rounds=rnd,
        iterations=total_inner,
        converged=converged,
        metrics=metrics,
    )
