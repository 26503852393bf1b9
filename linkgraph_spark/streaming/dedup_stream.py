"""Streaming deduplication — the ingest-side twin of the batch dedup
family (``functions.dedup``).

Two operators, two state stories:

- :func:`stream_dedup_turns` — EXACTLY-ONCE turn ingestion over an
  at-least-once transport: drops replayed transcript rows by their natural
  key within an event-time watermark. Pure built-in
  (``dropDuplicatesWithinWatermark``), so state is Spark-managed and
  bounded by the watermark horizon — the production answer whenever the
  duplicate window is time-bounded (queue redeliveries, retried writers).
- :func:`stream_exact_dedup` — first-occurrence CONTENT dedup of a
  document stream by normalized-text digest (the streaming analogue of
  ``functions.dedup.exact_dedup``), built on ``applyInPandasWithState``.
  State is one (keeper_id, n_seen) pair per distinct digest and is
  evicted on a processing-time TTL: within the TTL horizon the dedup is
  exact; a duplicate arriving after its digest's state expired is
  re-admitted (the standard recall/state trade every streaming deduper
  makes — unbounded-horizon dedup belongs to the batch pass, which is why
  the batch ``exact_dedup`` remains the periodic compaction path).

Reference provenance: the reference engine has no streaming at all (its
Lambda fan-out is batch supersteps, ``pagerank_lambda/dynamodb/
pagerank.py:51-99``); engine additions for the ingest tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_OUT_SCHEMA = "doc_id long, content_fp string, n_prior_dups long"


def stream_dedup_turns(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Drop replayed transcript turns (same ``(conv_id, turn_idx)``) within
    the event-time ``watermark`` — exactly-once turn ingestion over
    at-least-once delivery. Built-in operator: Spark keys state by the
    subset columns and expires it at the watermark, so state is bounded by
    the duplicate horizon, not the stream length."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def stream_exact_dedup(
    stream: DataFrame, state_ttl_ms: int = 60 * 60 * 1000
) -> DataFrame:
    """First-occurrence content dedup of a ``documents``-shaped stream
    (needs ``doc_id``, ``text``) → rows ``[doc_id, content_fp,
    n_prior_dups]`` — one row per digest the FIRST time it is seen
    (``n_prior_dups`` = duplicates already dropped within the same
    micro-batch; later batches drop silently while the state lives).

    The digest is the batch :func:`~linkgraph_spark.functions.dedup.
    exact_dedup` fingerprint (md5 of whitespace-normalized lowercase
    text), computed JVM-side before the stateful step, so batch and stream
    agree on what "identical" means.

    State story: one tiny tuple per distinct digest, keyed by the digest
    (so the stateful shuffle is the same hash partition the batch groupBy
    uses), evicted after ``state_ttl_ms`` of processing-time inactivity.
    Per-batch work is vectorized pandas (sort + head), no per-row Python.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = stream.select("doc_id", F.md5(norm).alias("content_fp"))

    def update(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        frames = [pdf[["doc_id"]] for pdf in pdf_iter]
        rows = pd.concat(frames) if frames else pd.DataFrame(columns=["doc_id"])
        state.setTimeoutDuration(state_ttl_ms)
        if state.exists:
            keeper, n_seen = state.get
            state.update((int(keeper), int(n_seen) + len(rows)))
            return
        if rows.empty:
            return
        rows = rows.sort_values("doc_id")
        keeper = int(rows["doc_id"].iloc[0])
        state.update((keeper, len(rows)))
        yield pd.DataFrame(
            {
                "doc_id": [keeper],
                "content_fp": [key[0]],
                "n_prior_dups": [len(rows) - 1],
            }
        )

    return fp.groupBy("content_fp").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType="keeper_id long, n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
