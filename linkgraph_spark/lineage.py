"""Lineage management for iterative superstep state.

Two problems every iterative Spark job hits, and how this module solves
them:

1. **Quadratic plan growth** — each superstep's DataFrame embeds the whole
   previous plan; Catalyst re-analysis cost grows per iteration until the
   job appears hung. Fix: ``localCheckpoint(eager=True)`` per superstep
   truncates the logical plan to a ``LogicalRDD``.
2. **Block leak** — localCheckpoint blocks are never freed automatically,
   so a 40-iteration run keeps 40 copies of the state vector in
   memory/disk, causing eviction storms (measured: per-iteration wall
   oscillating 6s → 28s on a 10M-edge graph). Fix: :class:`RotatingState`
   frees the previous iteration's blocks (via the SparkContext persistent-
   RDD registry) as soon as the next iteration is materialized.

The reference never hits either problem only because it re-reads the whole
state from an external store every superstep (``pagerank_lambda/dynamodb/
pagerank.py:51-64``) — this module is what makes the in-memory Spark loop
both fast and bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _persistent_rdd_ids(sc) -> set:
    jmap = sc._jsc.sc().getPersistentRDDs()
    ids = set()
    it = jmap.iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def checkpoint_tracked(df: DataFrame):
    """Eager localCheckpoint returning ``(checkpointed_df, block_ids)`` so
    the caller controls exactly when the blocks are freed — for loops (like
    large-star/small-star) that must keep BOTH the previous and current
    state alive across an iteration, which :class:`RotatingState`'s
    free-previous-on-rotate policy would break."""
    sc = df.sparkSession.sparkContext
    pre = _persistent_rdd_ids(sc)
    ck = df.localCheckpoint()
    post = _persistent_rdd_ids(sc)
    return ck, post - pre


def free_tracked(sc, block_ids) -> None:
    """Free blocks returned by :func:`checkpoint_tracked`."""
    for rid in block_ids:
        sc._jsc.sc().unpersistRDD(rid, False)


class RotatingState:
    """Holds the current superstep's localCheckpoint; frees the previous
    one's blocks on each rotation. The final state (last rotate) is never
    freed — callers hand it to the user."""

    def __init__(self, spark):
        self._sc = spark.sparkContext
        self._live_ids: set = set()

    def rotate(self, df: DataFrame) -> DataFrame:
        """Materialize ``df`` (eager localCheckpoint), then free the blocks
        of the previously rotated state (no longer reachable)."""
        pre = _persistent_rdd_ids(self._sc)
        ck = df.localCheckpoint()
        post = _persistent_rdd_ids(self._sc)
        for rid in self._live_ids:
            # private[spark] is public in bytecode — stable across 3.x/4.x
            self._sc._jsc.sc().unpersistRDD(rid, False)
        self._live_ids = post - pre
        return ck

    def release(self) -> None:
        """Free the CURRENT state's blocks — for callers that consumed the
        final state into something checkpointed of their own (e.g. the SCC
        peel folds each round's fmin/bmin into the assigned set) and would
        otherwise leak one O(V) state per loop for the session lifetime."""
        for rid in self._live_ids:
            self._sc._jsc.sc().unpersistRDD(rid, False)
        self._live_ids = set()
