"""CSR-blocked gather: Arrow-vectorized per-block contribution reduction.

The reference range-partitions the inverted adjacency into blocks of 1,000
destination ids and hands each block to one Lambda
(``pagerank_lambda/dynamodb/init_to_s3.py:57,65-69``; ``driverconfig.json:12``).
The Spark-native equivalent: after the JVM-side gather join distributes
ranks onto edges, contributions are range-blocked by ``floor(dst /
block_width)`` and each block is reduced inside ONE Arrow batch by numpy —
a CSR-style segmented sum (`np.unique` inverse index + `np.bincount`
weights), zero per-row Python (north_star / input_hint mandate).

When to prefer which gather:

- ``builtin`` (default): Spark's partial+final hash aggregate — whole-stage
  codegen, map-side combine, AQE-coalesced. Usually fastest.
- ``csr``: demonstrates the custom vectorized-operator path and wins when
  per-dst group counts are tiny and the hash agg's per-group overhead
  dominates, or when downstream wants block-aligned output (e.g. writing
  block-partitioned state). ``bench.py`` measures both.

The rank *distribution* (which rank reaches which block) stays a JVM hash
join in both paths — replicating the rank vector into blocks through Python
would serialize the whole state per superstep.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
    """Segmented sum of contribs per dst within one adjacency block.

    ``np.unique(..., return_inverse=True)`` builds the block's CSR row index
    (sorted unique dsts = indptr domain); ``np.bincount`` with weights is the
    vectorized segmented reduction over it.
    """
    dst = pdf["dst"].to_numpy()
    contrib = pdf["contrib"].to_numpy()
    uniq, inv = np.unique(dst, return_inverse=True)
    sums = np.bincount(inv, weights=contrib)
    return pd.DataFrame({"dst": uniq, "contrib_sum": sums})


def csr_block_sum(contribs: DataFrame, block_width: int = 1000) -> DataFrame:
    """contribs[dst, contrib] → per-dst sums via range-blocked numpy reduce.

    One shuffle on the block id (range partitioning of the dst space — the
    reference's ``divided_page_num`` scheme), then one Arrow batch per block.
    """
    blocked = contribs.withColumn(
        "_block", F.floor(F.col("dst") / F.lit(block_width)).cast("long")
    )
    return blocked.groupBy("_block").applyInPandas(
        lambda pdf: _block_reduce(pdf), schema="dst long, contrib_sum double"
    )
