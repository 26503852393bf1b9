"""Lloyd's k-means over the embedding table — the trained-codebook
companion :func:`~linkgraph_spark.functions.similarity.ivf_knn` promises
("a production deployment would train the codebook with k-means — same
plumbing, different centroid table").

Reference provenance: the reference engine has no vector ops at all (its
only state is the DynamoDB/EFS rank table,
``pagerank_lambda/dynamodb/pagerank.py:51-99``); this is an engine
addition for the training-data pipeline tier — coarse quantization for
ANN codebooks, corpus clustering for mixture balancing, and semantic
dedup all start from exactly this kernel.

Determinism contract (what makes the SQL oracle replay exactly):

- init: centroid ``j`` = the vector with ``vec_id == j`` (RNG-free,
  same rule as ``ivf_knn``'s fixed codebook);
- assignment: argmin of squared L2, ties broken by cluster id asc;
- update: element-wise mean **rounded to 9 decimals in-engine** (both
  Spark ``F.round`` and DuckDB ``round`` — the rounding collapses
  summation-order ulp noise so both engines iterate identical
  centroids);
- a cluster that loses all members keeps its previous centroid
  (mirrored as ``LEFT JOIN … coalesce`` in the oracle).

Scale shape (100 TB lens): per iteration ONE map-side-combine hash
aggregate — the assignment is a broadcast cross join against the k-row
codebook (map-only, no shuffle of the vector table), and the centroid
update pos-explodes to ``(cluster, pos)`` keys whose partial aggregates
are k·D cells per task, so the shuffle carries O(k·D·partitions) rows,
not O(N·D). Driver state is the k·D-float codebook (KB–MB — the
canonical broadcast-table size); there is no O(N) collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, StructField, StructType


def _base(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def _sqdist(vcol, ccol):
    diff2 = F.zip_with(vcol, ccol, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


_CENT_SCHEMA = StructType(
    [
        StructField("cluster", IntegerType(), False),
        StructField("cv", ArrayType(DoubleType(), False), False),
    ]
)


def _assign(base: DataFrame, cents_df: DataFrame) -> DataFrame:
    """→ [vec_id, v, cluster, sqd] — nearest centroid per vector (squared
    L2, ties by cluster asc). Broadcast cross join: map-only over base."""
    sqd = _sqdist(F.col("v"), F.col("cv"))
    w = Window.partitionBy("vec_id").orderBy(F.asc("sqd"), F.asc("cluster"))
    return (
        base.crossJoin(F.broadcast(cents_df))
        .select("vec_id", "v", "cluster", sqd.alias("sqd"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _lloyd_centroids(base: DataFrame, k: int, iterations: int) -> list:
    """Run ``iterations`` Lloyd updates; → [(cluster, [float, ...])] final
    codebook. Each iteration is one Spark job (the k·D-cell mean agg);
    the codebook round-trips through the driver as k·D floats only."""
    spark = base.sparkSession
    init = base.where(F.col("vec_id") < k).collect()
    if len(init) < k:
        raise ValueError(
            f"k-means init needs vectors with vec_id 0..{k - 1}; found {len(init)}"
        )
    cents = {int(r["vec_id"]): [float(x) for x in r["v"]] for r in init}
    for _ in range(iterations):
        cdf = spark.createDataFrame(
            [(c, v) for c, v in sorted(cents.items())], _CENT_SCHEMA
        )
        means = (
            _assign(base, cdf)
            .select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 9).alias("m"))
            .collect()
        )
        by_cluster: dict = {}
        for r in means:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(r["m"])
        # empty cluster → keep its previous centroid
        cents = {
            c: [by_cluster[c][p] for p in range(len(v))] if c in by_cluster else v
            for c, v in cents.items()
        }
    return sorted(cents.items())


def kmeans(embeddings: DataFrame, k: int = 8, iterations: int = 4) -> DataFrame:
    """→ [vec_id, cluster, sqdist] — final Lloyd assignment after
    ``iterations`` centroid updates from the deterministic init
    (centroid j = vector vec_id==j). ``sqdist`` is squared L2 to the
    winning centroid, rounded to 6."""
    base = _base(embeddings).persist()
    try:
        cents = _lloyd_centroids(base, k, iterations)
    finally:
        base.unpersist()
    # final assignment from a FRESH scan: the returned frame's lineage is
    # parquet + the literal codebook only — no persisted block, nothing to
    # checkpoint, and at scale it re-plans as one map-only broadcast pass
    cdf = embeddings.sparkSession.createDataFrame(cents, _CENT_SCHEMA)
    return _assign(_base(embeddings), cdf).select(
        "vec_id", "cluster", F.round("sqd", 6).alias("sqdist")
    )


def kmeans_profile(embeddings: DataFrame, k: int = 8, iterations: int = 4) -> DataFrame:
    """→ [cluster, n_members, inertia] — cluster sizes and within-cluster
    sum of squared distances (rounded to 3 — well above cross-engine
    summation-order noise) for the same run as :func:`kmeans`."""
    base = _base(embeddings).persist()
    try:
        cents = _lloyd_centroids(base, k, iterations)
    finally:
        base.unpersist()
    cdf = embeddings.sparkSession.createDataFrame(cents, _CENT_SCHEMA)
    return (
        _assign(_base(embeddings), cdf)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.sum("sqd"), 3).alias("inertia"),
        )
    )


# ------------------------------------------------------------------ oracles
def _sq_sql(a: str, c: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}.v) + 1),"
        f" i -> ({a}.v[i] - {c}.v[i]) * ({a}.v[i] - {c}.v[i])), (x, y) -> x + y)"
    )


def _kmeans_ctes(table: str, k: int, iterations: int) -> str:
    """Shared CTE chain: base, cents0, and one (asg, mean, newc, cents)
    block per Lloyd iteration — the exact unrolled replay of
    :func:`_lloyd_centroids`."""
    parts = [
        f"""base AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), cents0 AS (
      SELECT vec_id AS cluster, v FROM base WHERE vec_id < {k}
    )"""
    ]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"""asg{t} AS (
      SELECT vec_id, v, cluster FROM (
        SELECT b.vec_id, b.v, c.cluster,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY {_sq_sql('b', 'c')} ASC, c.cluster ASC) AS rn
        FROM base b CROSS JOIN cents{p} c)
      WHERE rn = 1
    ), mean{t} AS (
      SELECT cluster, pos, round(avg(val), 9) AS m FROM (
        SELECT cluster, unnest(range(len(v))) AS pos, unnest(v) AS val
        FROM asg{t})
      GROUP BY cluster, pos
    ), newc{t} AS (
      SELECT cluster, list(m ORDER BY pos) AS v FROM mean{t} GROUP BY cluster
    ), cents{t} AS MATERIALIZED (
      SELECT c.cluster, coalesce(n.v, c.v) AS v
      FROM cents{p} c LEFT JOIN newc{t} n USING (cluster)
    )"""
        )
    parts.append(
        f"""kfinal AS (
      SELECT vec_id, cluster, sqd FROM (
        SELECT b.vec_id, c.cluster, {_sq_sql('b', 'c')} AS sqd,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY {_sq_sql('b', 'c')} ASC, c.cluster ASC) AS rn
        FROM base b CROSS JOIN cents{iterations} c)
      WHERE rn = 1
    )"""
    )
    return "WITH " + ",\n    ".join(parts)


def kmeans_sql(table: str = "embeddings", k: int = 8, iterations: int = 4) -> str:
    """DuckDB oracle for :func:`kmeans`."""
    return f"""
    {_kmeans_ctes(table, k, iterations)}
    SELECT vec_id, cluster, round(sqd, 6) AS sqdist FROM kfinal
    """


def kmeans_profile_sql(table: str = "embeddings", k: int = 8, iterations: int = 4) -> str:
    """DuckDB oracle for :func:`kmeans_profile`."""
    return f"""
    {_kmeans_ctes(table, k, iterations)}
    SELECT cluster, count(*) AS n_members, round(sum(sqd), 3) AS inertia
    FROM kfinal GROUP BY cluster
    """
