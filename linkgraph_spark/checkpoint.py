"""Per-superstep state checkpointing with lineage + metrics + resume.

The reference externalizes rank state to a keyed mutable store every
superstep (DynamoDB ``put_item`` at ``pagerank_lambda/dynamodb/pagerank.py:
56-64,91``; byte-range-locked EFS writes at ``efs/jg-efs-pagerank.py:73-86``)
and needs locks / single-writer sharding to make concurrent writes safe
(``file_write_parallel/``, ``sqlite_many_db/`` experiments). The Spark-native
analogue is **immutable per-iteration snapshots**: each superstep appends a
complete state table under ``iteration=k``; a commit is atomic because the
iteration directory is only considered committed once its ``_COMMIT``
manifest exists. That gives the same capability the reference's locks
protect (consistent concurrent state updates) with no locking at all, plus
resume-from-any-iteration, which the reference cannot do.

On a production cluster this maps 1:1 onto an Iceberg table partitioned by
``(kernel, iteration)`` with snapshot-isolated commits; the Parquet layout
here keeps the identical protocol without the Iceberg runtime jars.

Layout::

    {base}/{kernel}/state/iteration={k}/*.parquet   # the state vector
    {base}/{kernel}/state/iteration={k}/_COMMIT     # atomic commit manifest
    {base}/{kernel}/metrics/it_{k}/*.parquet     # per-superstep metrics
    {base}/{kernel}/lineage/it_{k}/*.parquet     # per-partition lineage
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    """Durable superstep state with lineage + metrics + atomic commits."""

    def __init__(self, base_path: str, lineage_partitions: int = 32):
        self.base = base_path.rstrip("/")
        self.lineage_partitions = lineage_partitions

    # ---------------------------------------------------------------- paths
    def _state_dir(self, kernel: str, iteration: int) -> str:
        return f"{self.base}/{kernel}/state/iteration={iteration}"

    def _commit_marker(self, kernel: str, iteration: int) -> str:
        return os.path.join(self._state_dir(kernel, iteration), "_COMMIT")

    # ---------------------------------------------------------------- write
    def write_state(
        self,
        kernel: str,
        iteration: int,
        state: DataFrame,
        key_col: str,
        metrics: dict | None = None,
    ) -> None:
        """Write one superstep's state + lineage + metrics, then commit.

        Lineage is per *logical* partition (``pmod(key, P)`` — the hash
        partitioning the state shuffles on), so it is stable across physical
        parallelism: (iteration, partition_id, rows, key span). This is the
        engine-grade version of the reference's per-worker metric dicts
        (``pagerank.py:93-99``; ``sqlite/jg-sqlite-pagerank.py:162-172``).
        """
        spark = state.sparkSession
        sdir = self._state_dir(kernel, iteration)
        state.write.mode("overwrite").parquet(sdir)

        lineage = (
            state.groupBy(
                F.pmod(F.col(key_col), F.lit(self.lineage_partitions)).alias("partition_id")
            )
            .agg(
                F.count("*").alias("rows"),
                F.min(key_col).alias("min_key"),
                F.max(key_col).alias("max_key"),
            )
            .withColumn("iteration", F.lit(iteration))
        )
        lineage.write.mode("overwrite").parquet(
            f"{self.base}/{kernel}/lineage/it_{iteration}"
        )

        if metrics:
            mrow = [(iteration, json.dumps(metrics, sort_keys=True))]
            spark.createDataFrame(mrow, "iteration int, metrics_json string").coalesce(
                1
            ).write.mode("overwrite").parquet(
                f"{self.base}/{kernel}/metrics/it_{iteration}"
            )

        # atomic commit: readers ignore iterations without this manifest
        with open(self._commit_marker(kernel, iteration), "w") as fh:
            json.dump({"kernel": kernel, "iteration": iteration}, fh)

    # ----------------------------------------------------------------- read
    def committed_iterations(self, kernel: str) -> list[int]:
        root = f"{self.base}/{kernel}/state"
        if not os.path.isdir(root):
            return []
        out = []
        for name in os.listdir(root):
            if name.startswith("iteration="):
                k = int(name.split("=", 1)[1])
                if os.path.exists(self._commit_marker(kernel, k)):
                    out.append(k)
        return sorted(out)

    def latest_iteration(self, kernel: str) -> int | None:
        its = self.committed_iterations(kernel)
        return its[-1] if its else None

    def load_state(self, spark: SparkSession, kernel: str, iteration: int) -> DataFrame:
        if not os.path.exists(self._commit_marker(kernel, iteration)):
            raise FileNotFoundError(
                f"iteration {iteration} of kernel {kernel} has no commit manifest"
            )
        return spark.read.parquet(self._state_dir(kernel, iteration))

    def load_metrics(self, spark: SparkSession, kernel: str) -> DataFrame:
        return spark.read.parquet(f"{self.base}/{kernel}/metrics/it_*")

    def load_lineage(self, spark: SparkSession, kernel: str) -> DataFrame:
        return spark.read.parquet(f"{self.base}/{kernel}/lineage/it_*")
