"""Reference-format sources/sinks (SURVEY.md §2.1 S1-S4).

- :func:`read_edge_list` — the reference's raw input: a text file of
  ``src\\tdst`` lines (SNAP web-graph format, ``pagerank_lambda/dynamodb/
  driverconfig.json:4``), parsed like ``init_to_s3.py:60-62`` (tab split,
  trailing ``\\r`` strip) with malformed lines silently dropped, matching
  its bare ``except: pass`` (``init_to_s3.py:78-79``) via ``try_cast``.
- :func:`write_adjacency_json` — the reference's materialized adjacency:
  one JSON object ``{dst: [srcs...]}`` per destination-id range partition
  (``init_to_s3.py:55-86``, partition width ``driverconfig.json:12``),
  empty partitions skipped (``:82``). Here each range partition is one
  output file written distributively (no driver collect).
- :func:`read_adjacency_json` — loads those partitions back to a flat
  edge DataFrame (the worker-side load, ``pagerank.py:29-31,106``).

These exist for interop/parity: the engine's native storage is flat
Parquet/checkpoint tables, which at 100 TB are strictly better (columnar,
splittable, predicate-pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_list(spark: SparkSession, path: str, delimiter: str = "\t") -> DataFrame:
    """Text edge-list scan → ``DataFrame[src: long, dst: long]`` (uncleaned;
    feed through ``edges.clean_edges``-equivalent via ``graph_from_edges``
    or ``clean_int_edges``)."""
    lines = spark.read.text(path)
    parts = F.split(F.regexp_replace(F.col("value"), "\r$", ""), delimiter)
    return (
        lines.select(
            F.try_element_at(parts, F.lit(1)).try_cast("long").alias("src"),
            F.try_element_at(parts, F.lit(2)).try_cast("long").alias("dst"),
        )
        # malformed-line drop — reference's `except: pass` (init_to_s3.py:78-79)
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )


def clean_int_edges(raw: DataFrame) -> DataFrame:
    """Self-loop filter + dedup on integer edges (init_to_s3.py:63-64,75-76)."""
    return (
        raw.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
    )


def write_adjacency_json(
    edges: DataFrame, path: str, partition_width: int = 1000
) -> None:
    """Materialize the inverted adjacency as JSON range partitions.

    Reference layout: partition ``i`` holds destinations in
    ``[i*width, (i+1)*width)`` as a dict ``{dst: [src, ...]}``, one object
    per partition (``init_to_s3.py:57,65-77,82-84``). The reference builds
    this by rescanning the whole sorted file once per partition (O(P·E));
    here it is one shuffle: groupBy(dst) → collect src list → group by range
    partition → assemble the dict per partition. Ids serialize as strings,
    matching the reference's string-keyed JSON.
    """
    inverted = (
        edges.groupBy("dst")
        .agg(F.sort_array(F.collect_list("src")).alias("srcs"))
        .withColumn("part", F.floor(F.col("dst") / partition_width).cast("long"))
    )
    per_part = inverted.groupBy("part").agg(
        F.to_json(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("dst").cast("string").alias("key"),
                            F.transform("srcs", lambda s: s.cast("string")).alias("value"),
                        )
                    )
                )
            )
        ).alias("adjacency_json")
    )
    # empty partitions never materialize (no rows → no files), matching
    # the reference's `if len(page_relations) > 0` skip (init_to_s3.py:82)
    per_part.repartitionByRange(
        max(1, per_part.rdd.getNumPartitions()), "part"
    ).write.mode("overwrite").partitionBy("part").json(path)


def read_adjacency_json(spark: SparkSession, path: str) -> DataFrame:
    """Adjacency JSON partitions → flat ``DataFrame[src, dst]``."""
    raw = spark.read.json(f"{path}/part=*", schema="adjacency_json string")
    entries = F.explode(
        F.from_json(F.col("adjacency_json"), "map<string, array<string>>")
    ).alias("dst", "srcs")
    kv = raw.select(entries)
    return kv.select(
        F.explode("srcs").alias("src"), F.col("dst")
    ).select(F.col("src").cast("long"), F.col("dst").cast("long"))
