"""Explicit skew machinery: degree-based hub split + broadcast, salted aggs.

The reference's skew story is implicit (range partitions of 1,000 dst ids
each, ``init_to_s3.py:57``, so a hub destination's whole in-neighbor list
lands in one Lambda — it has NO mitigation for a 10^8-degree hub). At
10^12-turn scale a handful of tool/hub actors dominate the edge table, so
the engine splits the plan explicitly:

- **hub-broadcast gather**: rank rows of vertices whose out-degree exceeds
  a threshold are broadcast; edges whose src is a hub join map-side (the
  heavy join keys never shuffle). The shuffled remainder is further covered
  by AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``).
- **salted aggregation**: the per-dst contribution sum for hub *in*-degree
  vertices is pre-aggregated on ``(dst, salt)`` then re-aggregated on
  ``dst``, bounding any single reducer's input. (Spark's partial hash agg
  already combines map-side; the explicit salt guards the pathological case
  where a single dst's partials exceed one reducer.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hub_vertices(degrees: DataFrame, threshold: int) -> DataFrame:
    """Vertices with out-degree above the hub threshold → [id]."""
    return degrees.where(F.col("out_deg") > threshold).select("id")


def gather_contribs(
    edges_div: DataFrame,
    ranks: DataFrame,
    hub_ids: DataFrame | None = None,
    shuffle_hint: bool = False,
    broadcast_hint: bool = False,
) -> DataFrame:
    """The PageRank gather join: contribution of each edge's src to its dst.

    ``edges_div`` is the iteration-invariant ``[src, dst, div]`` table
    (divisor pre-attached — the reference stores the divisor inside every
    state row instead, ``pagerank.py:91``). ``ranks`` is ``[id, rank]``.
    Missing-key semantics = inner join = "contribute nothing", matching the
    reference's point-get misses (``pagerank.py:71-79``).

    With ``hub_ids``, the hub slice joins against a broadcast of only the
    hub vertices' ranks — the skew-critical path never shuffles.

    ``shuffle_hint=True`` forces a shuffle-hash join (build side = ranks):
    for large rank vectors, re-broadcasting the whole state every superstep
    is slower than shuffling it (measured ~3x on a 2M-vertex graph).
    ``broadcast_hint=True`` pins a broadcast of the rank vector instead —
    the small-state loop runs with AQE off (per-superstep re-planning costs
    more than it saves), so the broadcast must be explicit: the state is a
    LogicalRDD whose size the static planner can't estimate.
    """
    if shuffle_hint:
        ranks = ranks.hint("shuffle_hash")
    elif broadcast_hint:
        ranks = F.broadcast(ranks)
    if hub_ids is None:
        joined = edges_div.join(ranks, edges_div.src == ranks.id, "inner")
        return joined.select("dst", (F.col("rank") / F.col("div")).alias("contrib"), "src")

    hub_ranks = ranks.join(hub_ids, "id", "left_semi")
    is_hub = F.col("src_is_hub")
    tagged = edges_div.join(
        hub_ids.withColumnRenamed("id", "src").withColumn("src_is_hub", F.lit(True)),
        "src",
        "left",
    )
    rest = tagged.where(is_hub.isNull()).drop("src_is_hub")
    hubs = tagged.where(is_hub.isNotNull()).drop("src_is_hub")
    rest_c = rest.join(ranks, rest.src == ranks.id, "inner").select(
        "dst", (F.col("rank") / F.col("div")).alias("contrib"), "src"
    )
    hub_c = hubs.join(F.broadcast(hub_ranks), hubs.src == hub_ranks.id, "inner").select(
        "dst", (F.col("rank") / F.col("div")).alias("contrib"), "src"
    )
    return rest_c.unionByName(hub_c)


def split_edges_by_hub(
    edges_div: DataFrame, hub_ids: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Split the iteration-invariant edge table ONCE into ``(rest, hubs)``
    by whether ``src`` is a hub — hoisting :func:`gather_contribs`'s
    per-superstep tag join out of iterative loops (the split is itself
    iteration-invariant, so re-tagging O(E) rows every superstep was pure
    repeated work). The caller persists/unpersists both slices."""
    tagged = edges_div.join(
        F.broadcast(
            hub_ids.withColumnRenamed("id", "src").withColumn(
                "src_is_hub", F.lit(True)
            )
        ),
        "src",
        "left",
    )
    is_hub = F.col("src_is_hub")
    return (
        tagged.where(is_hub.isNull()).drop("src_is_hub"),
        tagged.where(is_hub.isNotNull()).drop("src_is_hub"),
    )


def gather_contribs_presplit(
    rest: DataFrame, hubs: DataFrame, ranks: DataFrame, hub_ids: DataFrame
) -> DataFrame:
    """Big-state gather over a :func:`split_edges_by_hub` pre-split edge
    table: the rest slice shuffle-hash joins the rank vector; the hub slice
    joins a broadcast of ONLY the hub vertices' ranks (extracted by a
    broadcast semi-join against the tiny hub-id set — never a shuffle of
    the O(V) rank state). Same rows as :func:`gather_contribs` with
    ``hub_ids`` + ``shuffle_hint``."""
    r = ranks.hint("shuffle_hash")
    rest_c = rest.join(r, rest.src == r.id, "inner").select(
        "dst", (F.col("rank") / F.col("div")).alias("contrib"), "src"
    )
    hub_ranks = ranks.join(F.broadcast(hub_ids), "id", "left_semi")
    hub_c = hubs.join(
        F.broadcast(hub_ranks), hubs.src == hub_ranks.id, "inner"
    ).select("dst", (F.col("rank") / F.col("div")).alias("contrib"), "src")
    return rest_c.unionByName(hub_c)


def salted_sum(
    contribs: DataFrame, salt_buckets: int = 8, salt_col: str = "src"
) -> DataFrame:
    """Two-phase (dst, salt) → dst sum, bounding per-reducer fan-in.

    Salt is derived from the contributing src id (deterministic, no RNG) so
    results are reproducible across runs and parallelism levels.
    """
    partial = contribs.groupBy(
        "dst", F.pmod(F.col(salt_col), F.lit(salt_buckets)).alias("_salt")
    ).agg(F.sum("contrib").alias("_partial"))
    return partial.groupBy("dst").agg(F.sum("_partial").alias("contrib_sum"))


def plain_sum(contribs: DataFrame) -> DataFrame:
    """Single-phase per-dst sum (Spark's partial hash agg handles the rest)."""
    return contribs.groupBy("dst").agg(F.sum("contrib").alias("contrib_sum"))
