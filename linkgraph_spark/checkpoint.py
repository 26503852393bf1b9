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

Two backends behind the same ``write_state / latest_iteration / load_state /
load_metrics`` protocol (kernels are backend-agnostic — they only call
``write_state`` / ``latest_iteration`` / ``load_state``; any object with
that surface works, see the fake-backend contract test). ``load_lineage``
is Parquet-backend-specific: on Iceberg the table's own snapshot/partition
metadata IS the lineage surface, so the method points there instead:

- :class:`CheckpointStore` — Parquet + ``_COMMIT`` manifest. ALL filesystem
  control operations (marker create, existence check, directory listing) go
  through the Hadoop FileSystem API resolved from the path's scheme, so the
  protocol works identically on ``file://``, ``hdfs://``, ``s3a://`` — never
  driver-local ``open()``/``os.listdir()`` (which would silently never see
  commits on a remote FS).
- :class:`IcebergCheckpointStore` — the production mapping: one Iceberg
  table partitioned by (kernel, iteration); the commit manifest collapses
  into Iceberg's snapshot commit. Activates only when an Iceberg catalog is
  configured on the session (the runtime jars are not in this sandbox, so
  construction is capability-guarded, not assumed).

Layout (Parquet backend)::

    {base}/{kernel}/state/iteration={k}/*.parquet   # the state vector
    {base}/{kernel}/state/iteration={k}/_COMMIT     # atomic commit manifest
    {base}/{kernel}/metrics/it_{k}/*.parquet     # per-superstep metrics
    {base}/{kernel}/lineage/it_{k}/*.parquet     # per-partition lineage
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _active_spark() -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession for checkpoint-store I/O")
    return s


class _HadoopFS:
    """Thin wrapper over the JVM Hadoop FileSystem for control-plane ops
    (markers, listings) so the commit protocol works on any Spark-supported
    filesystem, not just the driver's local disk."""

    def __init__(self, spark: SparkSession, path: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(path).getFileSystem(spark._jsc.hadoopConfiguration())

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._Path(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._Path(path))
        try:
            chunks = []
            while True:
                b = stream.read()
                if b < 0:
                    break
                chunks.append(b)
            return bytes(chunks).decode("utf-8")
        finally:
            stream.close()

    def delete(self, path: str) -> None:
        self._fs.delete(self._Path(path), True)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def list_names(self, path: str) -> list[str]:
        p = self._Path(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]


class CheckpointStore:
    """Durable superstep state with lineage + metrics + atomic commits
    (Parquet + ``_COMMIT`` manifest over the Hadoop FileSystem API)."""

    def __init__(self, base_path: str, lineage_partitions: int = 32):
        self.base = base_path.rstrip("/")
        self.lineage_partitions = lineage_partitions

    # ---------------------------------------------------------------- paths
    def _state_dir(self, kernel: str, iteration: int) -> str:
        return f"{self.base}/{kernel}/state/iteration={iteration}"

    def _commit_marker(self, kernel: str, iteration: int) -> str:
        return f"{self._state_dir(kernel, iteration)}/_COMMIT"

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

        # atomic commit: readers ignore iterations without this manifest.
        # Written through the Hadoop FS of the base path's scheme, so the
        # protocol holds on hdfs:// and s3a:// exactly as on local disk.
        _HadoopFS(spark, self.base).write_text(
            self._commit_marker(kernel, iteration),
            json.dumps({"kernel": kernel, "iteration": iteration}),
        )

    # ----------------------------------------------------------------- read
    def committed_iterations(self, kernel: str) -> list[int]:
        fs = _HadoopFS(_active_spark(), self.base)
        out = []
        for name in fs.list_names(f"{self.base}/{kernel}/state"):
            if name.startswith("iteration="):
                k = int(name.split("=", 1)[1])
                if fs.exists(self._commit_marker(kernel, k)):
                    out.append(k)
        return sorted(out)

    def latest_iteration(self, kernel: str) -> int | None:
        its = self.committed_iterations(kernel)
        return its[-1] if its else None

    def load_state(self, spark: SparkSession, kernel: str, iteration: int) -> DataFrame:
        if not _HadoopFS(spark, self.base).exists(self._commit_marker(kernel, iteration)):
            raise FileNotFoundError(
                f"iteration {iteration} of kernel {kernel} has no commit manifest"
            )
        return spark.read.parquet(self._state_dir(kernel, iteration))

    def load_metrics(self, spark: SparkSession, kernel: str) -> DataFrame:
        return spark.read.parquet(f"{self.base}/{kernel}/metrics/it_*")

    def load_lineage(self, spark: SparkSession, kernel: str) -> DataFrame:
        return spark.read.parquet(f"{self.base}/{kernel}/lineage/it_*")


def _lineage_from_files(
    files: DataFrame, kernel: str, key_col: str | None = None
) -> DataFrame:
    """Project an Iceberg ``{table}.files`` metadata DataFrame into the
    engine's lineage shape. Pure plan construction (no catalog access), so
    the contract test drives it with a synthesized ``.files``-shaped frame
    even though the sandbox has no Iceberg jars to produce a real one.

    Expects the documented ``.files`` columns: ``partition`` struct with
    ``kernel``/``iteration`` fields, ``file_path``, ``record_count``, and
    (Iceberg ≥ 1.2) ``readable_metrics.<col>.{lower_bound,upper_bound}``."""
    from pyspark.sql.window import Window

    has_bounds = key_col is not None and "readable_metrics" in files.columns
    min_key = (
        F.col(f"readable_metrics.{key_col}.lower_bound")
        if has_bounds
        else F.lit(None)
    )
    max_key = (
        F.col(f"readable_metrics.{key_col}.upper_bound")
        if has_bounds
        else F.lit(None)
    )
    w = Window.partitionBy("iteration").orderBy("file_path")
    return (
        files.where(F.col("partition.kernel") == kernel)
        .select(
            F.col("partition.iteration").alias("iteration"),
            F.col("file_path"),
            F.col("record_count").alias("rows"),
            min_key.alias("min_key"),
            max_key.alias("max_key"),
        )
        .withColumn("partition_id", F.row_number().over(w) - 1)
        .select("partition_id", "rows", "min_key", "max_key", "iteration", "file_path")
    )


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True iff an Iceberg catalog implementation is on the session's
    classpath and configured — the capability gate for
    :class:`IcebergCheckpointStore` (the sandbox ships no Iceberg jars)."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if not impl or "iceberg" not in impl.lower():
            return False
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergCheckpointStore:
    """Iceberg-native checkpoint backend (drop-in for :class:`CheckpointStore`).

    Mapping: the Parquet layout's ``iteration={k}`` directory + ``_COMMIT``
    manifest collapse into ONE Iceberg table partitioned by
    ``(kernel, iteration)`` — every ``write_state`` is a snapshot-isolated
    ``overwritePartitions`` commit, so "committed" = "visible in the current
    snapshot" and the marker protocol disappears. Readers get time travel
    (resume from ANY iteration = partition predicate; inspect any historical
    snapshot) for free.

    Requires Iceberg runtime jars + a configured catalog
    (``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``);
    construction raises otherwise so a misconfigured cluster fails loudly,
    never silently falling back to uncommitted writes.
    """

    def __init__(self, table: str, catalog: str = "spark_catalog"):
        spark = _active_spark()
        if not iceberg_available(spark, catalog):
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured on this session "
                "(runtime jars absent or spark.sql.catalog.* unset); use "
                "CheckpointStore (Parquet + manifest) instead"
            )
        self.table = table

    def write_state(
        self,
        kernel: str,
        iteration: int,
        state: DataFrame,
        key_col: str,
        metrics: dict | None = None,
    ) -> None:
        df = (
            state.withColumn("kernel", F.lit(kernel))
            .withColumn("iteration", F.lit(iteration))
            .withColumn(
                "metrics_json", F.lit(json.dumps(metrics or {}, sort_keys=True))
            )
        )
        writer = df.writeTo(self.table)
        # existence probe picks create vs overwrite — never except-all, so a
        # genuine commit failure on an existing table propagates with its
        # real cause instead of resurfacing as "table already exists"
        if df.sparkSession.catalog.tableExists(self.table):
            # idempotent re-run of a crashed superstep replaces its partition
            writer.overwritePartitions()
        else:
            writer.using("iceberg").partitionedBy(
                F.col("kernel"), F.col("iteration")
            ).create()

    def committed_iterations(self, kernel: str) -> list[int]:
        spark = _active_spark()
        rows = (
            spark.read.table(self.table)
            .where(F.col("kernel") == kernel)
            .select("iteration")
            .distinct()
            .collect()
        )
        return sorted(r["iteration"] for r in rows)

    def latest_iteration(self, kernel: str) -> int | None:
        its = self.committed_iterations(kernel)
        return its[-1] if its else None

    def load_state(self, spark: SparkSession, kernel: str, iteration: int) -> DataFrame:
        return (
            spark.read.table(self.table)
            .where((F.col("kernel") == kernel) & (F.col("iteration") == iteration))
            .drop("kernel", "iteration", "metrics_json")
        )

    def load_metrics(self, spark: SparkSession, kernel: str) -> DataFrame:
        # metrics_json is constant per (kernel, iteration) partition
        return (
            spark.read.table(self.table)
            .where(F.col("kernel") == kernel)
            .select("iteration", "metrics_json")
            .distinct()
        )

    def load_lineage(
        self, spark: SparkSession, kernel: str, key_col: str | None = None
    ) -> DataFrame:
        """→ per-data-file lineage from the table's OWN metadata: Iceberg
        already tracks (partition, record_count, column bounds) per file in
        the ``{table}.files`` metadata table, so lineage is a projection of
        it — no side-channel lineage writes, and it is exact for any
        historical snapshot via time travel. Columns mirror the Parquet
        backend's ``[partition_id, rows, min_key, max_key, iteration]``,
        with ``partition_id`` the file ordinal within its iteration and
        min/max keys from the file's ``readable_metrics`` bounds for
        ``key_col`` (null when bounds aren't tracked for that column)."""
        files = spark.read.table(f"{self.table}.files")
        return _lineage_from_files(files, kernel, key_col)
