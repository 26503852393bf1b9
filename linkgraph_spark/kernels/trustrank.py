"""TrustRank and spam mass (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004).

The web-spam companion to PageRank: run ordinary PageRank, run PageRank
again with the teleport vector concentrated on a hand-audited trusted
seed set (= personalized PageRank over the seeds), and report the
*relative spam mass* ``(pr - tr) / pr`` — the share of a vertex's rank
that does NOT flow from trusted sources. High spam mass ⇒ the vertex's
rank is propped up by the untrusted part of the graph. The reference
ranks exactly this kind of link graph (``pagerank_lambda/dynamodb/
pagerank.py:67-88``) with no provenance signal; this is the engine
addition a crawl operator reaches for next.

Pure composition: two :func:`linkgraph_spark.kernels.pagerank.pagerank`
runs (both the flagship superstep — one Spark job per iteration,
observe-fused stats, broadcast/shuffle-hash gather by state size) plus
ONE final hash join. No new iteration machinery, so every 100 TB
property of the flagship kernel is inherited unchanged; the join output
is O(V) with both sides already partitioned by ``id``.

``pr`` is bounded below by the uniform teleport ``(1-d)/N > 0``, so the
ratio is always defined. Trusted vertices typically get ``tr > pr`` —
spam mass is then negative, which is the signal (rank over-covered by
trust), not an error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.kernels.pagerank import pagerank


def spam_mass(
    graph: LinkGraph,
    trusted_ids: list,
    iterations: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """→ ``[id, pr, tr, spam_mass]`` (all rounded ``round_to`` dp).

    ``pr`` = textbook PageRank (uniform teleport), ``tr`` = TrustRank
    (teleport mass split uniformly over ``trusted_ids``), both run the
    same fixed ``iterations`` so the DuckDB oracle can unroll them
    round-exactly; ``spam_mass = (pr - tr) / pr`` computed on the
    UNROUNDED values, rounded last (the cross-engine convention)."""
    pr = pagerank(graph, mode="textbook", iterations=iterations).ranks
    tr = pagerank(
        graph, mode="textbook", iterations=iterations, personalize_ids=trusted_ids
    ).ranks
    return (
        pr.withColumnRenamed("rank", "_pr")
        .join(tr.withColumnRenamed("rank", "_tr"), "id")
        .select(
            "id",
            F.round("_pr", round_to).alias("pr"),
            F.round("_tr", round_to).alias("tr"),
            F.round(
                (F.col("_pr") - F.col("_tr")) / F.col("_pr"), round_to
            ).alias("spam_mass"),
        )
    )
