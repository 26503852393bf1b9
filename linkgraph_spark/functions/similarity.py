"""Similarity search over the ``embeddings`` table (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k neighbors for a query set.
  The dot product is a JVM-side ``zip_with`` + ``aggregate`` in index order
  with double accumulation, so DuckDB reproduces it bit-for-bit.
- :func:`lsh_knn` — the scale path: deterministic random-hyperplane LSH
  buckets; candidates only within matching buckets, then exact re-rank.
  At 100 TB the bucket join replaces the cross product; recall is tuned by
  the number of hyperplanes / tables.
- :func:`embedding_near_dups` — near-duplicate pairs by cosine ≥ threshold.

Scale notes: the brute-force path broadcasts the (small) query set against
the full table — a map-only scan, no shuffle. The LSH path shuffles once on
the bucket id. Norms are computed once and reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.functions.hashing import MERSENNE_P


def _as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _with_norm(embeddings: DataFrame) -> DataFrame:
    v = _as_double(F.col("embedding"))
    return embeddings.select(
        "vec_id", v.alias("v"), F.sqrt(_dot(v, v)).alias("norm")
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """→ [query_id, neighbor_id, cosine, rk]: exact top-k cosine neighbors
    for the first ``n_queries`` vec_ids (excluding self)."""
    base = _with_norm(embeddings)
    q = (
        base.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        F.broadcast(q)
        .crossJoin(base)
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def cosine_topk_sql(table: str = "embeddings", n_queries: int = 10, k: int = 5) -> str:
    dot = (
        "list_reduce(list_transform(range(1, len(q.v) + 1),"
        " i -> q.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), normed AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm
      FROM base
    ), q AS (
      SELECT vec_id AS query_id, v, norm FROM normed WHERE vec_id < {n_queries}
    ), scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             round({dot} / (q.norm * b.norm), 6) AS cosine
      FROM q JOIN normed b ON b.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {k}
    """


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """→ [vec_a, vec_b, cosine]: pairs with cosine ≥ threshold (exact)."""
    base = _with_norm(embeddings)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_dups_sql(table: str = "embeddings", threshold: float = 0.95) -> str:
    dot = (
        "list_reduce(list_transform(range(1, len(a.v) + 1),"
        " i -> a.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), normed AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm
      FROM base
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({dot} / (a.norm * b.norm), 6) AS cosine
    FROM normed a JOIN normed b ON a.vec_id < b.vec_id
    WHERE {dot} / (a.norm * b.norm) >= {threshold} - 5e-7
      AND round({dot} / (a.norm * b.norm), 6) >= {threshold}
    """


N_PLANES = 6  # 2^6 = 64 buckets; tune up with table size (more planes = higher precision, lower recall)


def _plane_sign(p: int, i_col):
    """Deterministic ±1 for hyperplane p, dimension i — pure arithmetic,
    identical in any engine."""
    v = (F.lit(1 + 7 * p) * (i_col * F.lit(2654435761) % F.lit(MERSENNE_P))) % F.lit(MERSENNE_P)
    return (v % 2) * 2 - 1


def lsh_knn(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join + exact re-rank.

    Bucket = sign pattern of ``n_planes`` fixed pseudo-random hyperplanes.
    Only same-bucket candidates are scored — the candidate generation is a
    single equi-join on the bucket id, which is what survives at 100 TB.
    """
    base = _with_norm(embeddings)

    def _proj(vcol, p):
        # binary lambda factory: PySpark inspects lambda arity, so the
        # plane index must be closed over via this helper, not a default arg
        return F.aggregate(
            F.zip_with(
                vcol,
                F.sequence(F.lit(1), F.size(vcol)),
                lambda x, i: x * _plane_sign(p, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def bucket_of(vcol):
        bits = None
        for p in range(n_planes):
            bit = F.when(_proj(vcol, p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        return bits.cast("long")

    bucketed = base.withColumn("bucket", bucket_of(F.col("v")))
    q = bucketed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        q.join(bucketed, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
