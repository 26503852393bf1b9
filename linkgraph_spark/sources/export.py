"""Final-state export/interop sinks — the engine-grade replacement for the
reference's external readout scripts.

The reference leaves rank state in a keyed store and reads it out with
ad-hoc scripts (``pagerank_lambda/dynamodb/dynamodb_get_json.py:8-11`` dumps
the DynamoDB table to JSON; ``mysql/jg-mysql-pagerank.py:67-71`` leaves it
in MySQL for SQL readout). A migrating user expects the same exits:

- :func:`write_ranks_jdbc` / :func:`read_ranks_jdbc` — any JDBC database
  (MySQL/Postgres/SQLite/Derby — whatever driver jar the cluster ships).
  Distributed: each partition opens its own connection and writes its rows;
  ``num_partitions`` caps connection fan-in for small databases.
- :func:`write_ranks_json` — newline-delimited JSON files (the direct
  analogue of ``dynamodb_get_json.py``'s dump, but written in parallel by
  executors instead of paginated through the driver).
- :func:`write_ranks_csv` — plain CSV with header.

All are thin, typed wrappers over Spark's native writers, so every sink
inherits the same scale story (no driver-side collect anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_ranks_jdbc(
    ranks: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "overwrite",
    num_partitions: int | None = None,
    **properties: str,
) -> None:
    """Write a final state vector (e.g. ``[id, rank]``) to a JDBC table.

    ``num_partitions`` bounds concurrent connections (each Spark partition
    writes over its own connection — a small single-node database wants a
    handful, a partitioned warehouse can take hundreds).
    """
    props = dict(properties)
    if driver:
        props["driver"] = driver
    df = ranks.repartition(num_partitions) if num_partitions else ranks
    df.write.jdbc(url, table, mode=mode, properties=props)


def read_ranks_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    **properties: str,
) -> DataFrame:
    """Read a previously exported state table back (round-trip check /
    downstream consumption)."""
    props = dict(properties)
    if driver:
        props["driver"] = driver
    return spark.read.jdbc(url, table, properties=props)


def write_ranks_json(ranks: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Newline-delimited JSON export (reference:
    ``dynamodb_get_json.py:8-11``, parallelized)."""
    ranks.write.mode(mode).json(path)


def write_ranks_csv(ranks: DataFrame, path: str, mode: str = "overwrite") -> None:
    ranks.write.mode(mode).option("header", "true").csv(path)


def write_ranks_orc(ranks: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC export — the Hive-ecosystem sibling of the parquet
    checkpoints; zlib-compressed stripes, schema embedded, splittable on
    read (one task per stripe at scale)."""
    ranks.write.mode(mode).orc(path)


def read_ranks_orc(spark, path: str) -> DataFrame:
    return spark.read.orc(path)
