"""Hive-style partitioned corpus sink/source (SURVEY.md §2.1 family,
engine add).

At 100 TB the corpus lives as ``path/lang=en/...parquet`` so every
per-language job reads ONLY its slice via partition pruning — the
directory layout IS the index. Two classic failure modes are handled
explicitly:

- **small-files explosion**: a naive ``write.partitionBy(col)`` makes
  every task write a file into every partition value it sees (tasks x
  values files). The writer repartitions on (partition col, a hash
  bucket) first, so each partition value gets exactly
  ``files_per_partition`` files no matter how many input tasks there
  were.
- **partition skew**: one hot value (``en`` is ~44% of the corpus)
  would serialize into one writer task; ``files_per_partition > 1``
  splits the hot value across UP TO that many parallel writers. The
  split is hash-placed, so two (value, bucket) combos can collide into
  one shuffle partition and merge — raise ``files_per_partition`` (or
  ``spark.sql.shuffle.partitions``) if the hot value must be spread
  with certainty; the file count per partition value never EXCEEDS
  ``files_per_partition``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_corpus(
    docs: DataFrame,
    path: str,
    partition_col: str = "lang",
    files_per_partition: int = 2,
) -> None:
    """Write ``docs`` as Hive-partitioned parquet: one subdirectory per
    ``partition_col`` value, at most ``files_per_partition`` files each
    (see the module docstring on hash-collision merging)."""
    n = int(files_per_partition)
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in docs.columns]), F.lit(n))
    (
        docs.repartition(partition_col, bucket.alias("_b"))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_corpus_partition(
    spark: SparkSession, path: str, partition_col: str, value: str
) -> DataFrame:
    """Read ONE partition of a corpus written by
    :func:`write_partitioned_corpus`. The equality filter is a literal
    on the partition column, so it resolves at PLANNING time against
    the directory listing (``PartitionFilters`` in the scan) — zero
    bytes of any other partition are opened."""
    return spark.read.parquet(path).where(F.col(partition_col) == value)
