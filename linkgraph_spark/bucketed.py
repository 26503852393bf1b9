"""Bucketed graph storage: the zero-edge-shuffle superstep at cluster scale.

SCALE.md's 100 TB plan states that with the edge table bucketed on ``src``
the per-superstep data movement is O(V) only — the O(E) edge side never
shuffles. This module makes that claim executable instead of prose:

- :func:`write_bucketed_graph` persists a ``LinkGraph`` as bucketed tables
  (edges bucketed by ``src``, degrees/vertices by ``id``, same bucket
  count) — the catalog equivalent of the Iceberg ``bucket(src)`` partition
  transform a production deployment would use.
- :func:`read_bucketed_graph` reloads it; the bucketed scans report
  ``HashPartitioning(src, B)``, so Catalyst plans

  * the divisor attach (``edges ⋈ degrees`` on src) with ZERO exchanges
    (both sides bucket-aligned), and
  * every superstep's gather (``edges_div ⋈ ranks`` on src) with exactly
    ONE exchange — the O(V) rank vector shuffling into the bucket layout;
    the O(E) side is read in place.

``tests/test_plans.py::test_bucketed_gather_shuffles_only_ranks`` asserts
the exchange counts on the physical plan and value-verifies PageRank over
the bucketed graph against the in-memory one.

The reference has no analogue: it re-reads and re-sorts the whole edge
file per partition per run (``pagerank_lambda/dynamodb/init_to_s3.py:
59,97-107``); here the layout cost is paid once at write time.

Catalog caveat (environmental, same class as the absent Iceberg jars):
this sandbox's default in-memory catalog scopes table METADATA to the
session — the bucketed parquet files persist under the warehouse dir, but
a fresh JVM can't resolve the table names without a shared metastore
(Hive/Glue/Iceberg), which any production cluster has. Write + read within
one session (what the plan-assert test and CLI do) exercises the full
bucketed-scan machinery.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from linkgraph_spark.edges import LinkGraph


def write_bucketed_graph(graph: LinkGraph, prefix: str, buckets: int = 32) -> None:
    """Persist ``graph`` as bucketed catalog tables ``{prefix}_edges`` /
    ``{prefix}_degrees`` / ``{prefix}_vertices``.

    ``buckets`` plays the role of the cluster's parallelism unit (one bucket
    ≈ one reducer's slice); all three tables share it so every src/id
    equi-join is bucket-aligned. Buckets are additionally sorted so a
    sort-merge plan could skip its sorts too (the engine's pinned loops use
    shuffle-hash joins, which need no sort).
    """
    (
        graph.edges.write.bucketBy(buckets, "src")
        .sortBy("src")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{prefix}_edges")
    )
    (
        graph.degrees.write.bucketBy(buckets, "id")
        .sortBy("id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{prefix}_degrees")
    )
    (
        graph.vertices.write.bucketBy(buckets, "id")
        .sortBy("id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{prefix}_vertices")
    )


def read_bucketed_graph(spark: SparkSession, prefix: str) -> LinkGraph:
    """Reload a :func:`write_bucketed_graph` layout. The returned graph's
    DataFrames are bucketed scans — kernels run on them unchanged, but the
    src/id joins plan without an edge-side exchange."""
    vertices = spark.table(f"{prefix}_vertices")
    return LinkGraph(
        vertices=vertices,
        edges=spark.table(f"{prefix}_edges"),
        degrees=spark.table(f"{prefix}_degrees"),
        num_vertices=vertices.count(),
    )


def drop_bucketed_graph(spark: SparkSession, prefix: str) -> None:
    for t in ("edges", "degrees", "vertices"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
