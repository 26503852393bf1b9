"""Bounded-memory frequency sketches with EXACT final answers.

The 100 TB problem these solve: "which values are frequent" over a
column whose cardinality is too large to aggregate exactly as a first
step (trillions of tokens, billions of URLs). A plain
``groupBy(value).count()`` shuffles one row per distinct value; when the
question is only about values above a frequency threshold, almost all
of that shuffle is waste.

``heavy_hitters`` is the classic two-phase answer (Misra–Gries 1982;
mergeable-summaries form in Agarwal et al., PODS 2012 — public
algorithms, original implementation):

  phase A  per-partition Misra–Gries summary with k counters, run as an
           Arrow-batched ``mapInPandas`` whose state is a k-entry dict —
           O(k) memory per task regardless of input size. Each batch is
           pre-reduced with a vectorized ``value_counts`` and merged by
           the summary-merge rule (sum, then subtract the k-th largest
           and drop non-positive) — the per-item undercount stays
           < n_p/k, so any value with partition frequency > n_p/k
           SURVIVES its partition summary.
  phase B  exact counts for the surviving candidates only: a broadcast
           semi-join of the input against ≤ k·P candidate values, then
           one tiny aggregate.

Correctness of the candidate set: if a value's GLOBAL count exceeds
n/k, then by pigeonhole some partition has count_p > n_p/k (otherwise
summing the per-partition bounds gives count ≤ n/k), so the value is in
that partition's summary and its exact count is taken in phase B. The
final output is therefore EXACT — every value with count·k > n, with
its true count — which is what lets a DuckDB ``GROUP BY ... HAVING``
oracle check it bit-for-bit.

Reference parity: the reference's analytics layer materializes full
per-key count tables and filters them (``pagerank_lambda/dynamodb/
pagerank.py:51-99`` reads per-key state rows); this module is the
bounded-memory formulation of the same "frequent keys" question.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch_counts: dict, k: int) -> dict:
    """Mergeable-summaries Misra–Gries merge: pointwise sum, then if more
    than k-1 counters remain, subtract the k-th largest count from all
    and drop the non-positive ones (Agarwal et al. 2012, §3)."""
    for v, c in batch_counts.items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > k - 1:
        kth = sorted(counters.values(), reverse=True)[k - 1]
        counters = {v: c - kth for v, c in counters.items() if c > kth}
    return counters


def heavy_hitters(df: DataFrame, col: str, k: int = 50) -> DataFrame:
    """All values of ``col`` whose count strictly exceeds n/k (NULLs
    excluded from both the values and n), with EXACT counts and corpus
    share. → ``[value, cnt, share]`` ordered by cnt desc, value asc.

    Two-phase Misra–Gries + exact-verify; see the module docstring for
    the memory bound and the superset proof. The threshold compare is
    ``cnt * k > n`` in exact integers — no float boundary.
    """
    proj = (
        df.select(F.col(col).cast("string").alias("value"))
        .where(F.col(col).isNotNull())
    )

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            vals = pdf["value"]
            n += len(vals)
            counters = _mg_merge(counters, vals.value_counts().to_dict(), k)
        # candidate rows carry the value; ONE extra row (value NULL)
        # carries the partition's row count for the exact n total.
        yield pd.DataFrame(
            {
                "value": list(counters.keys()) + [None],
                "part_rows": [0] * len(counters) + [n],
            }
        )

    summary = proj.mapInPandas(_mg, "value string, part_rows long")
    summary = summary.localCheckpoint(eager=True)  # one pass, reused twice
    total = summary.agg(F.sum("part_rows").alias("_n"))
    cands = summary.where(F.col("value").isNotNull()).select("value").distinct()
    return (
        proj.join(F.broadcast(cands), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(int(k)) > F.col("_n"))
        .select(
            "value",
            "cnt",
            F.round(F.col("cnt") / F.col("_n").cast("double"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), F.asc("value"))
    )


def heavy_hitter_terms(documents: DataFrame, k: int = 30) -> DataFrame:
    """Heavy-hitter TERMS of the corpus: tokens appearing in more than
    1/k of all token occurrences. Shares :func:`..text.vocab_stats`'s
    whitespace tokenization so the two views stay consistent.
    → ``[value, cnt, share]``."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(F.explode(F.split(norm, " ")).alias("term"))
    return heavy_hitters(tok, "term", k=k)


def heavy_hitter_terms_sql(table: str = "documents", k: int = 30) -> str:
    """Oracle: the exact definition the sketch provably reproduces."""
    return f"""
    WITH tok AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS value
      FROM {table}
    ),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT value, count(*) AS cnt,
           round(count(*) / CAST(n AS DOUBLE), 6) AS share
    FROM tok CROSS JOIN tot
    GROUP BY value, n
    HAVING count(*) * {int(k)} > n
    ORDER BY cnt DESC, value ASC
    """
