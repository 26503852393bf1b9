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


NEAR_DUP_TABLES = 8  # LSH tables for embedding_near_dups
NEAR_DUP_PLANES = 2  # hyperplanes per table (4 buckets/table)


def embedding_near_dups_exact(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """→ [vec_a, vec_b, cosine]: ALL pairs with cosine ≥ threshold.

    Brute-force all-pairs — O(n²), small-table verification tool only (used
    as the recall oracle for the LSH variant in tests); the shipped operator
    is :func:`embedding_near_dups`.
    """
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


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_tables: int = NEAR_DUP_TABLES,
    n_planes: int = NEAR_DUP_PLANES,
) -> DataFrame:
    """→ [vec_a, vec_b, cosine]: near-duplicate pairs by cosine ≥ threshold.

    Candidates come from ``n_tables`` independent random-hyperplane LSH
    tables (deterministic plane arithmetic — :func:`_plane_sign`), OR-ed
    together, then verified with the exact cosine; emitted pairs are always
    true positives. No cross join anywhere: candidate generation is one
    equi-join on (table, bucket). Recall at the threshold boundary is
    1-(1-p^n_planes)^n_tables with p = 1-θ/π; the defaults give ~0.977 at
    cosine 0.35 and >0.999996 at production near-dup thresholds (≥0.9 —
    raise n_planes there to cut candidate volume). The DuckDB oracle mirrors
    the plane arithmetic bit-for-bit, so the approximate result is exactly
    reproducible.
    """
    base = _with_norm(embeddings)

    def bucket_of(vcol, t):
        bits = None
        for p in range(n_planes):
            bit = F.when(_proj(vcol, t * n_planes + p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        return bits.cast("long")

    tables = F.array(*[bucket_of(F.col("v"), t) for t in range(n_tables)])
    bucketed = base.select("vec_id", F.posexplode(tables).alias("tbl", "bucket"))
    cand = (
        bucketed.withColumnRenamed("vec_id", "vec_a")
        .join(bucketed.withColumnRenamed("vec_id", "vec_b"), ["tbl", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_dups_sql(
    table: str = "embeddings",
    threshold: float = 0.95,
    n_tables: int = NEAR_DUP_TABLES,
    n_planes: int = NEAR_DUP_PLANES,
) -> str:
    """DuckDB oracle for :func:`embedding_near_dups` — mirrors the LSH
    bucket arithmetic exactly (same portable integer plane signs), so the
    candidate set and the verified output are engine-identical."""

    def bucket(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN {_proj_sql(t * n_planes + p)} > 0 THEN {2 ** p} ELSE 0 END)"
            for p in range(n_planes)
        )

    flat = "\n      UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, CAST({bucket(t)} AS BIGINT) AS bucket FROM normed"
        for t in range(n_tables)
    )
    dot = (
        "list_reduce(list_transform(range(1, len(a.v) + 1),"
        " i -> a.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), normed AS MATERIALIZED (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm
      FROM base
    ), flat AS MATERIALIZED (
      {flat}
    ), cand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM flat x JOIN flat y
        ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           round({dot} / (a.norm * b.norm), 6) AS cosine
    FROM cand c
    JOIN normed a ON a.vec_id = c.vec_a
    JOIN normed b ON b.vec_id = c.vec_b
    WHERE round({dot} / (a.norm * b.norm), 6) >= {threshold}
    """


N_PLANES = 6  # 2^6 = 64 buckets; tune up with table size (more planes = higher precision, lower recall)


def _plane_sign(p: int, i_col):
    """Deterministic ±1 for hyperplane p, dimension i — pure arithmetic,
    identical in any engine."""
    v = (F.lit(1 + 7 * p) * (i_col * F.lit(2654435761) % F.lit(MERSENNE_P))) % F.lit(MERSENNE_P)
    return (v % 2) * 2 - 1


def _proj(vcol, p: int):
    """Signed projection of a vector column onto deterministic hyperplane p.

    Binary lambda factory: PySpark inspects lambda arity, so the plane index
    must be closed over via this helper, not a default arg."""
    return F.aggregate(
        F.zip_with(
            vcol,
            F.sequence(F.lit(1), F.size(vcol)),
            lambda x, i: x * _plane_sign(p, i),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _proj_sql(p: int) -> str:
    """DuckDB mirror of :func:`_proj` over a column named ``v``."""
    sign = (
        f"CAST((((({1 + 7 * p}) * ((i * 2654435761) % {MERSENNE_P})) % {MERSENNE_P}) % 2) * 2 - 1"
        " AS DOUBLE)"
    )
    return (
        f"list_reduce(list_transform(range(1, len(v) + 1),"
        f" i -> v[i] * {sign}), (x, y) -> x + y)"
    )


def lsh_knn(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join + exact re-rank.

    Bucket = sign pattern of ``n_planes`` fixed pseudo-random hyperplanes.
    Only same-bucket candidates are scored — the candidate generation is a
    single equi-join on the bucket id, which is what survives at 100 TB.
    """
    base = _with_norm(embeddings)

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
    return _rank_candidates(q, bucketed, k)


def _rank_candidates(q: DataFrame, bucketed: DataFrame, k: int) -> DataFrame:
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

def lsh_knn_sql(
    table: str = "embeddings", n_queries: int = 10, k: int = 5, n_planes: int = N_PLANES
) -> str:
    """DuckDB oracle for :func:`lsh_knn` — the bucket arithmetic is the same
    engine-portable integer formula, so the 'approximate' result is exactly
    reproducible."""
    bucket = " + ".join(
        f"(CASE WHEN {_proj_sql(p)} > 0 THEN {2 ** p} ELSE 0 END)" for p in range(n_planes)
    )
    dot = (
        "list_reduce(list_transform(range(1, len(q.v) + 1),"
        " i -> q.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), normed AS MATERIALIZED (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm,
             CAST({bucket} AS BIGINT) AS bucket
      FROM base
    ), q AS (
      SELECT vec_id AS query_id, v, norm, bucket FROM normed WHERE vec_id < {n_queries}
    ), scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             round({dot} / (q.norm * b.norm), 6) AS cosine
      FROM q JOIN normed b ON b.bucket = q.bucket AND b.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {k}
    """

def ivf_knn(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, n_cells: int = 8, n_probe: int = 2
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantize to the nearest of
    ``n_cells`` deterministic centroids (the first ``n_cells`` vectors —
    a fixed, data-dependent but RNG-free codebook), then search only the
    query's ``n_probe`` closest cells and re-rank exactly.

    At 100 TB: the assignment pass is a broadcast join against the tiny
    codebook (map-only); the search is an equi-join on cell id. Recall is
    tuned by ``n_probe``; a production deployment would train the codebook
    with k-means (same plumbing, different centroid table).
    """
    base = _with_norm(embeddings)
    cents = base.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    sim_c = _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("_csim"), F.asc("cell"))
    assigned = (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "norm", "cell", sim_c.alias("_csim"))
        .withColumn("_rn", F.row_number().over(w_assign))
    )
    cells = assigned.where(F.col("_rn") == 1).select("vec_id", "v", "norm", "cell")
    probes = assigned.where(F.col("_rn") <= n_probe).select("vec_id", "cell")
    q = (
        cells.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qnorm"))
        .join(probes.withColumnRenamed("vec_id", "query_id"), "query_id")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        q.join(cells, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def ivf_knn_sql(
    table: str = "embeddings", n_queries: int = 10, k: int = 5, n_cells: int = 8, n_probe: int = 2
) -> str:
    """DuckDB oracle for :func:`ivf_knn`."""
    dotc = (
        "list_reduce(list_transform(range(1, len(b.v) + 1),"
        " i -> b.v[i] * c.v[i]), (x, y) -> x + y)"
    )
    dot = (
        "list_reduce(list_transform(range(1, len(q.v) + 1),"
        " i -> q.v[i] * n.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), normed AS MATERIALIZED (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm
      FROM base
    ), cents AS (
      SELECT vec_id AS cell, v, norm FROM normed WHERE vec_id < {n_cells}
    ), assigned AS MATERIALIZED (
      SELECT b.vec_id, c.cell,
             row_number() OVER (PARTITION BY b.vec_id
               ORDER BY {dotc} / (b.norm * c.norm) DESC, c.cell ASC) AS rn
      FROM normed b CROSS JOIN cents c
    ), cells AS (
      SELECT n.vec_id, n.v, n.norm, a.cell
      FROM normed n JOIN assigned a ON a.vec_id = n.vec_id AND a.rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cell FROM assigned WHERE rn <= {n_probe}
    ), q AS (
      SELECT c.vec_id AS query_id, c.v, c.norm, p.cell
      FROM cells c JOIN probes p ON p.query_id = c.vec_id
      WHERE c.vec_id < {n_queries}
    ), scored AS (
      SELECT DISTINCT q.query_id, n.vec_id AS neighbor_id,
             round({dot} / (q.norm * n.norm), 6) AS cosine
      FROM q JOIN cells n ON n.cell = q.cell AND n.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {k}
    """



# ------------------------------------------------------- semantic clusters
def embedding_clusters(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_tables: int = NEAR_DUP_TABLES,
    n_planes: int = NEAR_DUP_PLANES,
) -> DataFrame:
    """→ [vec_id, keeper_id, cluster_size]: semantic clusters — the
    transitive closure of the :func:`embedding_near_dups` pair relation —
    with one keeper (min vec_id) per cluster, covering every vector
    (non-duplicates are singleton clusters).

    The embedding-space sibling of ``dedup.near_dup_clusters`` (same
    reason to exist: pairs alone can't curate a corpus — A~B and B~C must
    collapse to one keeper even when A~C was never emitted), composed from
    the same two scale-safe pieces: hyperplane-LSH candidate generation
    (bucketed equi-joins, no cross join) feeding the hash-min
    connected-components kernel (O(pair-graph diameter) supersteps).
    Refuses loudly when the closure did not converge."""
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels.components import connected_components

    spark = embeddings.sparkSession
    pairs = embedding_near_dups(embeddings, threshold, n_tables, n_planes).select(
        "vec_a", "vec_b"
    )
    g = graph_from_edges(spark, pairs)
    cc = connected_components(g)
    if not cc.converged:
        raise RuntimeError(
            f"embedding_clusters: components did not converge in "
            f"{cc.iterations} supersteps; raise max_iterations"
        )
    labels = cc.labels
    sizes = labels.groupBy("component").agg(F.count("*").alias("cluster_size"))
    clustered = labels.join(sizes, "component").select(
        F.col("id").alias("vec_id"),
        F.col("component").alias("keeper_id"),
        "cluster_size",
    )
    out = (
        embeddings.select("vec_id")
        .join(clustered, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("keeper_id", F.col("vec_id")).alias("keeper_id"),
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
        )
    )
    g.unpersist()
    return out


def embedding_clusters_sql(
    table: str = "embeddings",
    threshold: float = 0.95,
    n_tables: int = NEAR_DUP_TABLES,
    n_planes: int = NEAR_DUP_PLANES,
    unroll: int = 40,
) -> str:
    """DuckDB oracle: the LSH near-dup pair SQL + unrolled hash-min
    closure (same shape as ``dedup.near_dup_clusters_sql``).

    ``unroll`` must cover the pair-graph diameter or the oracle itself
    under-converges and red-flags a CORRECT engine result (observed at
    sf0.001: a 39-member cluster needed >10 rounds). The Spark side
    raises on non-convergence; static SQL can't, so the default is a
    40-round margin — LSH cluster pair graphs are dense, keeping real
    diameters far below it."""
    pair_sql = embedding_near_dups_sql(table, threshold, n_tables, n_planes)
    ctes = [
        f"epairs AS MATERIALIZED ({pair_sql})",
        """everts AS MATERIALIZED (
      SELECT vec_a AS id FROM epairs UNION SELECT vec_b FROM epairs
    )""",
        """eund AS MATERIALIZED (
      SELECT vec_a AS a, vec_b AS b FROM epairs
      UNION
      SELECT vec_b AS a, vec_a AS b FROM epairs
    )""",
        "ec0 AS (SELECT id, id AS component FROM everts)",
    ]
    for k in range(1, unroll + 1):
        ctes.append(
            f"""ec{k} AS MATERIALIZED (
      SELECT c.id,
             least(c.component, coalesce(m.mn, c.component)) AS component
      FROM ec{k - 1} c
      LEFT JOIN (
        SELECT eund.a AS id, min(c2.component) AS mn
        FROM eund JOIN ec{k - 1} c2 ON eund.b = c2.id
        GROUP BY eund.a
      ) m ON m.id = c.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body},
    esizes AS (
      SELECT component, count(*) AS cluster_size FROM ec{unroll} GROUP BY component
    )
    SELECT e.vec_id,
           coalesce(c.component, e.vec_id) AS keeper_id,
           coalesce(s.cluster_size, 1) AS cluster_size
    FROM {table} e
    LEFT JOIN ec{unroll} c ON c.id = e.vec_id
    LEFT JOIN esizes s ON s.component = c.component
    """


def embedding_outliers(
    embeddings: DataFrame, z_threshold: float = 2.0
) -> DataFrame:
    """→ ``[vec_id, label, dist, z, is_outlier]`` — per-label centroid
    outlier detection: each vector's Euclidean distance to its label's
    mean embedding, z-scored within the label (population stddev;
    ``is_outlier`` iff |z| ≥ ``z_threshold``). The embedding-space
    mislabel / contamination triage every labeled corpus runs before
    training. Degenerate labels (zero distance spread) score z = 0.

    Plan shape: one posexplode to (vec, dim) rows, a (label, dim)
    centroid aggregate (map-side combinable, |labels|·D rows), an
    equi-join back on (label, dim) sharing the same key space, then two
    label-keyed aggregates — all hash aggregates, no windows, no
    all-pairs. Centroids and spreads are rounded (9 dp) before reuse so
    both engines feed identical doubles downstream (the k-means
    convention, ``kernels/kmeans.py``).
    """
    ex = embeddings.select(
        "vec_id",
        "label",
        F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val"),
    )
    cent = ex.groupBy("label", "pos").agg(F.round(F.avg("val"), 9).alias("mu"))
    diff = F.col("val") - F.col("mu")
    d = (
        ex.join(cent, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.round(F.sqrt(F.sum(diff * diff)), 6).alias("dist"))
    )
    stats = d.groupBy("label").agg(
        F.round(F.avg("dist"), 9).alias("_mu_d"),
        F.round(F.stddev_pop("dist"), 9).alias("_sd"),
    )
    z = F.when(
        F.col("_sd") > 0,
        F.round((F.col("dist") - F.col("_mu_d")) / F.col("_sd"), 4),
    ).otherwise(F.lit(0.0))
    return (
        d.join(F.broadcast(stats), "label")
        .select(
            "vec_id",
            "label",
            "dist",
            z.alias("z"),
            (F.abs(z) >= F.lit(float(z_threshold))).alias("is_outlier"),
        )
    )


def embedding_outliers_sql(
    table: str = "embeddings", z_threshold: float = 2.0
) -> str:
    """DuckDB oracle for :func:`embedding_outliers` (standalone query)."""
    return f"""
    WITH eo_b AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ),
    eo_ex AS (
      SELECT vec_id, label, unnest(range(len(v))) AS pos, unnest(v) AS val
      FROM eo_b
    ),
    eo_c AS (
      SELECT label, pos, round(avg(val), 9) AS mu
      FROM eo_ex GROUP BY label, pos
    ),
    eo_d AS (
      SELECT e.vec_id, e.label,
             round(sqrt(sum((e.val - c.mu) * (e.val - c.mu))), 6) AS dist
      FROM eo_ex e JOIN eo_c c ON c.label = e.label AND c.pos = e.pos
      GROUP BY e.vec_id, e.label
    ),
    eo_s AS (
      SELECT label, round(avg(dist), 9) AS mu_d,
             round(stddev_pop(dist), 9) AS sd
      FROM eo_d GROUP BY label
    )
    SELECT d.vec_id, d.label, d.dist,
           CASE WHEN s.sd > 0 THEN round((d.dist - s.mu_d) / s.sd, 4)
                ELSE 0.0 END AS z,
           abs(CASE WHEN s.sd > 0 THEN round((d.dist - s.mu_d) / s.sd, 4)
                    ELSE 0.0 END) >= {float(z_threshold)!r} AS is_outlier
    FROM eo_d d JOIN eo_s s USING (label)
    """


def label_centroid_dists(embeddings: DataFrame) -> DataFrame:
    """→ ``[label_a, label_b, dist]`` (label_a < label_b) — pairwise
    Euclidean distances between per-label centroid embeddings: the
    class-confusion structure of a labeled corpus (labels whose
    centroids nearly coincide are the ones a classifier will mix up and
    a stratified sampler should not treat as distinct). Centroids are
    rounded (9 dp) before the pair distance so both engines feed
    identical doubles (the k-means convention).

    Plan shape: one posexplode + (label, dim) centroid aggregate, then
    an all-pairs join over the |labels|-sized centroid table — quadratic
    only in the label count (a constant), never in rows.
    """
    ex = embeddings.select(
        "label", F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val")
    )
    cent = ex.groupBy("label", "pos").agg(F.round(F.avg("val"), 9).alias("mu"))
    a = cent.select(
        F.col("label").alias("label_a"), "pos", F.col("mu").alias("ma")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "pos", F.col("mu").alias("mb")
    )
    diff = F.col("ma") - F.col("mb")
    return (
        a.join(b, "pos")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.round(F.sqrt(F.sum(diff * diff)), 6).alias("dist"))
    )


def label_centroid_dists_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`label_centroid_dists` (standalone query)."""
    return f"""
    WITH lc_b AS (
      SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ),
    lc_ex AS (
      SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS val FROM lc_b
    ),
    lc_c AS (
      SELECT label, pos, round(avg(val), 9) AS mu
      FROM lc_ex GROUP BY label, pos
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(sum((a.mu - b.mu) * (a.mu - b.mu))), 6) AS dist
    FROM lc_c a JOIN lc_c b ON a.pos = b.pos AND a.label < b.label
    GROUP BY a.label, b.label
    """


def embedding_quantize(embeddings: DataFrame, bits: int = 8) -> DataFrame:
    """→ [dim, mn, mx, mse, max_abs_err] — per-dimension scalar
    quantization audit: global min/max per dimension, then each value is
    coded to ``2**bits − 1`` levels (``code = floor((v−mn)/scale + 0.5)``,
    clamped) and the reconstruction ``mn + code·scale`` is compared back.
    This is the storage decision an embedding pipeline makes before
    writing 100 TB of vectors (fp32 → int8 is 4× smaller; the mse/max
    columns say what it costs), and the exact code path a scalar-quantized
    ANN index (FAISS SQ8) uses.

    Determinism: min/max are exact; the code uses ``floor(x + 0.5)``
    (identical FP ops in both engines — no round-half mode divergence);
    per-value errors are bitwise identical, so only the mse mean carries
    summation-order noise (≈1e-16, absorbed by round 9).

    Scale shape: two passes over the posexploded (dim, val) pairs — a
    D-cell min/max aggregate (map-side combinable), then a broadcast join
    of the D-row range table back onto the pairs and a second D-cell
    aggregate. No window, no driver collect (the range table stays a
    broadcast frame).
    """
    levels = float(2**bits - 1)
    ex = embeddings.select(
        "vec_id", F.posexplode(_as_double(F.col("embedding"))).alias("dim", "val")
    )
    rng = ex.groupBy("dim").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    scale = (F.col("mx") - F.col("mn")) / F.lit(levels)
    code = F.least(
        F.lit(levels),
        F.greatest(F.lit(0.0), F.floor((F.col("val") - F.col("mn")) / scale + 0.5)),
    )
    err = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        F.col("val") - (F.col("mn") + code * scale)
    )
    q = ex.join(F.broadcast(rng), "dim").select("dim", "mn", "mx", err.alias("err"))
    return q.groupBy("dim").agg(
        F.round(F.first("mn"), 6).alias("mn"),
        F.round(F.first("mx"), 6).alias("mx"),
        F.round(F.avg(F.col("err") * F.col("err")), 9).alias("mse"),
        F.round(F.max(F.abs("err")), 9).alias("max_abs_err"),
    )


def embedding_quantize_sql(table: str = "embeddings", bits: int = 8) -> str:
    """DuckDB oracle for :func:`embedding_quantize` (standalone query)."""
    levels = float(2**bits - 1)
    return f"""
    WITH eq_ex AS (
      SELECT vec_id,
             unnest(range(len(embedding))) AS dim,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val
      FROM {table}
    ), eq_rng AS (
      SELECT dim, min(val) AS mn, max(val) AS mx FROM eq_ex GROUP BY dim
    ), eq_err AS (
      SELECT e.dim, r.mn, r.mx,
             CASE WHEN r.mx = r.mn THEN 0.0
                  ELSE e.val - (r.mn
                       + least({levels}, greatest(0.0,
                           floor((e.val - r.mn) / ((r.mx - r.mn) / {levels}) + 0.5)))
                         * ((r.mx - r.mn) / {levels})) END AS err
      FROM eq_ex e JOIN eq_rng r USING (dim)
    )
    SELECT dim, round(min(mn), 6) AS mn, round(min(mx), 6) AS mx,
           round(avg(err * err), 9) AS mse,
           round(max(abs(err)), 9) AS max_abs_err
    FROM eq_err GROUP BY dim
    """


def embedding_stats(embeddings: DataFrame) -> DataFrame:
    """→ [stat, value] — the data-quality profile an embedding pipeline
    runs before indexing 100 TB of vectors: corpus size, dimensionality,
    zero-vector count (broken encoder outputs), and the L2-norm
    distribution (mean + exact p25/p50/p75/p99/max). Norm collapse or a
    fat zero bucket is the classic sign of an upstream encoding bug;
    un-normalised embeddings with wide norm spread mean cosine and dot
    ranking will disagree.

    Determinism: norms use the module's in-order fold (bitwise identical
    across engines); percentiles are exact linear interpolation (Spark
    ``percentile`` == DuckDB ``quantile_cont``); the mean rounds to 6
    over summation-order noise.

    Scale shape: one map-only norm projection + ONE global aggregate
    (percentile sorts the single norm column once); output is 9 rows.
    """
    n = _with_norm(embeddings).select("norm", F.size("v").alias("nd"))
    ps = [0.25, 0.5, 0.75, 0.99]
    arr = ", ".join(f"{p}D" for p in ps)
    one = n.agg(
        F.count("*").cast("double").alias("n_vecs"),
        F.max("nd").cast("double").alias("n_dims"),
        F.sum(F.when(F.col("norm") == 0, 1).otherwise(0))
        .cast("double")
        .alias("zero_vecs"),
        F.round(F.avg("norm"), 6).alias("norm_mean"),
        F.expr(f"percentile(norm, array({arr}))").alias("pct"),
        F.round(F.max("norm"), 6).alias("norm_max"),
    )
    rows = [
        F.struct(F.lit(k).alias("stat"), F.col(k).alias("value"))
        for k in ("n_vecs", "n_dims", "zero_vecs", "norm_mean")
    ] + [
        F.struct(
            F.lit(f"norm_p{int(p * 100)}").alias("stat"),
            F.round(F.element_at("pct", i + 1), 6).alias("value"),
        )
        for i, p in enumerate(ps)
    ] + [F.struct(F.lit("norm_max").alias("stat"), F.col("norm_max").alias("value"))]
    return one.select(F.explode(F.array(*rows)).alias("z")).select("z.*")


def embedding_stats_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`embedding_stats` (standalone query)."""
    dot = (
        "list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y)"
    )
    pcts = "\n    UNION ALL ".join(
        f"SELECT 'norm_p{int(p * 100)}' AS stat,"
        f" round(quantile_cont(norm, {p}), 6) AS value FROM es_n"
        for p in [0.25, 0.5, 0.75, 0.99]
    )
    return f"""
    WITH es_v AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), es_n AS (
      SELECT sqrt({dot}) AS norm, len(v) AS nd FROM es_v
    )
    SELECT 'n_vecs' AS stat, CAST(count(*) AS DOUBLE) AS value FROM es_n
    UNION ALL SELECT 'n_dims', CAST(max(nd) AS DOUBLE) FROM es_n
    UNION ALL SELECT 'zero_vecs',
      CAST(sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM es_n
    UNION ALL SELECT 'norm_mean', round(avg(norm), 6) FROM es_n
    UNION ALL {pcts}
    UNION ALL SELECT 'norm_max', round(max(norm), 6) FROM es_n
    """


def lsh_recall(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, n_planes: int = N_PLANES
) -> DataFrame:
    """→ [query_id, n_exact, n_hits, recall] — recall@k of the
    :func:`lsh_knn` approximate path against the :func:`cosine_topk`
    exact ground truth, per query. THE acceptance metric for any ANN
    index before it replaces brute force at scale (you tune
    ``n_planes``/tables until this says ≥0.9, then ship the bucketed
    path); computing it inside the engine keeps the evaluation on the
    same data, same distance, same tie-breaks as production.

    Scale shape: composes the two existing plans (broadcast brute force
    over the query subset — the ground truth is only ever computed for a
    SAMPLE of queries, never all-pairs — and the bucket equi-join), then
    one (query, neighbor) equi-join + an O(n_queries)-row aggregate.
    """
    exact = cosine_topk(embeddings, n_queries, k).select("query_id", "neighbor_id")
    approx = lsh_knn(embeddings, n_queries, k, n_planes).select(
        F.col("query_id").alias("_qa"), F.col("neighbor_id").alias("_na")
    )
    cnt = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    hits = (
        exact.join(
            approx,
            (F.col("query_id") == F.col("_qa"))
            & (F.col("neighbor_id") == F.col("_na")),
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return cnt.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.round(F.coalesce("n_hits", F.lit(0)) * 1.0 / F.col("n_exact"), 6).alias(
            "recall"
        ),
    )


def lsh_recall_sql(
    table: str = "embeddings", n_queries: int = 10, k: int = 5, n_planes: int = N_PLANES
) -> str:
    """DuckDB oracle for :func:`lsh_recall` — the exact and approximate
    top-k oracles run in isolated subquery scopes and join."""
    return f"""
    WITH lr_ex AS (
      SELECT query_id, neighbor_id FROM (
        {cosine_topk_sql(table, n_queries, k)}
      )
    ), lr_ap AS (
      SELECT query_id, neighbor_id FROM (
        {lsh_knn_sql(table, n_queries, k, n_planes)}
      )
    ), lr_cnt AS (
      SELECT query_id, count(*) AS n_exact FROM lr_ex GROUP BY query_id
    ), lr_hit AS (
      SELECT e.query_id, count(*) AS n_hits
      FROM lr_ex e JOIN lr_ap a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.query_id
    )
    SELECT c.query_id, c.n_exact, coalesce(h.n_hits, 0) AS n_hits,
           round(coalesce(h.n_hits, 0) * 1.0 / c.n_exact, 6) AS recall
    FROM lr_cnt c LEFT JOIN lr_hit h USING (query_id)
    """


def mutual_knn(embeddings: DataFrame, k: int = 4, n_planes: int = N_PLANES) -> DataFrame:
    """→ [vec_a, vec_b, cosine] (vec_a < vec_b) — the mutual-kNN graph:
    an undirected edge survives iff each endpoint is in the OTHER's
    approximate top-k. Mutual-kNN is the standard graph-construction
    step before density clustering / dedup-community detection on an
    embedding corpus: one-directional kNN edges into hubs are exactly
    the edges mutuality prunes, so the graph stays sparse and
    cluster-pure even with a skewed embedding distribution.

    Scale shape: same hyperplane-bucket candidate generation as
    :func:`lsh_knn` but with EVERY vector as a query — still one
    equi-join on the bucket id (never all-pairs), per-vector top-k over
    candidates bounded by the bucket population, then the mutuality
    check as a self-equi-join on the (lo, hi) id pair. All JVM-side;
    the only shuffles are the bucket join, the per-vector window, and
    the final pair join.
    """
    base = _with_norm(embeddings)

    bits = None
    for p in range(n_planes):
        bit = F.when(_proj(F.col("v"), p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    bucketed = base.withColumn("bucket", bits.cast("long"))

    q = bucketed.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    topk = _rank_candidates(q, bucketed, k)
    lo = topk.where(F.col("query_id") < F.col("neighbor_id")).select(
        F.col("query_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        "cosine",
    )
    hi = topk.where(F.col("query_id") > F.col("neighbor_id")).select(
        F.col("neighbor_id").alias("vec_a"), F.col("query_id").alias("vec_b")
    )
    return lo.join(hi, ["vec_a", "vec_b"]).select("vec_a", "vec_b", "cosine")


def mutual_knn_sql(
    table: str = "embeddings", k: int = 4, n_planes: int = N_PLANES
) -> str:
    """DuckDB oracle for :func:`mutual_knn` — same bucket arithmetic,
    same rounded-cosine/id tie-break, same mutuality self-join."""
    bucket = " + ".join(
        f"(CASE WHEN {_proj_sql(p)} > 0 THEN {2 ** p} ELSE 0 END)" for p in range(n_planes)
    )
    dot = (
        "list_reduce(list_transform(range(1, len(q.v) + 1),"
        " i -> q.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH mk_base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), mk_normed AS MATERIALIZED (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm,
             CAST({bucket} AS BIGINT) AS bucket
      FROM mk_base
    ), mk_scored AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             round({dot} / (q.norm * b.norm), 6) AS cosine
      FROM mk_normed q JOIN mk_normed b
        ON b.bucket = q.bucket AND b.vec_id <> q.vec_id
    ), mk_topk AS (
      SELECT query_id, neighbor_id, cosine FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC) AS rk
        FROM mk_scored
      ) WHERE rk <= {k}
    )
    SELECT lo.query_id AS vec_a, lo.neighbor_id AS vec_b, lo.cosine
    FROM mk_topk lo JOIN mk_topk hi
      ON hi.query_id = lo.neighbor_id AND hi.neighbor_id = lo.query_id
    WHERE lo.query_id < lo.neighbor_id
    """


def matryoshka_audit(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, dims: int = 16
) -> DataFrame:
    """→ [query_id, n_full, n_trunc_hits, overlap] — retrieval-quality
    audit of Matryoshka-style dimension truncation: for each query, the
    exact cosine top-k under the FULL vector vs under only the first
    ``dims`` coordinates, reported as overlap@k. This is the acceptance
    gate for the standard embedding-cost lever (store/search a prefix,
    re-rank with the full vector): you pick the smallest ``dims`` whose
    overlap here stays acceptable, exactly like :func:`lsh_recall` does
    for the bucketed index.

    Scale shape: two broadcast brute-force top-k runs over the sampled
    query set (ground-truth evaluation is always query-sampled, never
    all-pairs) + one (query, neighbor) equi-join + an O(n_queries)-row
    aggregate. The truncated pass reads the same vector column and
    slices in-expression — no second table, no Python.
    """
    base = _with_norm(embeddings)
    tv = F.slice(F.col("v"), 1, dims)
    tnorm = F.sqrt(
        F.aggregate(tv, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    trunc = base.select("vec_id", tv.alias("tv"), tnorm.alias("tnorm"))
    q = trunc.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("tv").alias("qv"),
        F.col("tnorm").alias("qnorm"),
    )
    cos = _dot(F.col("qv"), F.col("tv")) / (F.col("qnorm") * F.col("tnorm"))
    scored = (
        F.broadcast(q)
        .crossJoin(trunc)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    trunc_topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col("neighbor_id").alias("_nt"))
    )
    exact = cosine_topk(embeddings, n_queries, k).select("query_id", "neighbor_id")
    cnt = exact.groupBy("query_id").agg(F.count("*").alias("n_full"))
    hits = (
        exact.join(
            trunc_topk,
            (exact.query_id == trunc_topk.query_id)
            & (exact.neighbor_id == trunc_topk._nt),
        )
        .groupBy(exact.query_id)
        .agg(F.count("*").alias("n_trunc_hits"))
    )
    return cnt.join(hits, "query_id", "left").select(
        "query_id",
        "n_full",
        F.coalesce("n_trunc_hits", F.lit(0)).alias("n_trunc_hits"),
        F.round(
            F.coalesce("n_trunc_hits", F.lit(0)) * 1.0 / F.col("n_full"), 6
        ).alias("overlap"),
    )


def matryoshka_audit_sql(
    table: str = "embeddings", n_queries: int = 10, k: int = 5, dims: int = 16
) -> str:
    """DuckDB oracle for :func:`matryoshka_audit`."""
    dot = (
        "list_reduce(list_transform(range(1, len(q.tv) + 1),"
        " i -> q.tv[i] * b.tv[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH ma_ex AS (
      SELECT query_id, neighbor_id FROM (
        {cosine_topk_sql(table, n_queries, k)}
      )
    ), ma_trunc AS MATERIALIZED (
      SELECT vec_id,
             list_slice(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                        1, {dims}) AS tv
      FROM {table}
    ), ma_normed AS (
      SELECT vec_id, tv,
             sqrt(list_reduce(list_transform(range(1, len(tv) + 1),
                  i -> tv[i] * tv[i]), (x, y) -> x + y)) AS tnorm
      FROM ma_trunc
    ), ma_q AS (
      SELECT vec_id AS query_id, tv, tnorm FROM ma_normed
      WHERE vec_id < {n_queries}
    ), ma_scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             round({dot} / (q.tnorm * b.tnorm), 6) AS cosine
      FROM ma_q q JOIN ma_normed b ON b.vec_id <> q.query_id
    ), ma_tk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC) AS rk
        FROM ma_scored
      ) WHERE rk <= {k}
    ), ma_cnt AS (
      SELECT query_id, count(*) AS n_full FROM ma_ex GROUP BY query_id
    ), ma_hit AS (
      SELECT e.query_id, count(*) AS n_trunc_hits
      FROM ma_ex e JOIN ma_tk t
        ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
      GROUP BY e.query_id
    )
    SELECT c.query_id, c.n_full,
           coalesce(h.n_trunc_hits, 0) AS n_trunc_hits,
           round(coalesce(h.n_trunc_hits, 0) * 1.0 / c.n_full, 6) AS overlap
    FROM ma_cnt c LEFT JOIN ma_hit h USING (query_id)
    """


def dbscan(
    embeddings: DataFrame,
    threshold: float = 0.35,
    min_pts: int = 3,
    n_tables: int = NEAR_DUP_TABLES,
    n_planes: int = NEAR_DUP_PLANES,
) -> DataFrame:
    """→ [vec_id, role, cluster]: DBSCAN density clustering (Ester et al.,
    KDD 1996) in cosine space — ``role`` ∈ {core, border, noise};
    ``cluster`` is the cluster label (min member core id) and NULL for
    noise. Where :func:`embedding_clusters` merges ANY chain of near-dup
    pairs, DBSCAN only lets DENSE points (≥ ``min_pts`` neighbors at
    cosine ≥ ``threshold``) carry connectivity — sparse chain links
    between two dense regions become border/noise instead of gluing the
    regions together.

    Deterministic variant: classic DBSCAN assigns a border point reachable
    from several clusters to whichever core scanned it first; here a
    border point takes the MIN cluster label among its core neighbors, so
    output is scan-order-free (and oracle-checkable).

    The neighbor relation is the LSH-recalled verified pair set of
    :func:`embedding_near_dups` (deterministic hyperplanes, mirrored
    bit-for-bit in the oracle) — so at scale candidate generation stays a
    bucketed equi-join, the density count one groupBy, and cluster
    formation a hash-min components loop over CORE-CORE edges only
    (O(core-graph diameter) supersteps; raises if unconverged).
    """
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels.components import connected_components
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    spark = embeddings.sparkSession
    # checkpoint the verified pair set: the symmetrizing union below
    # references it twice, so as a raw plan the whole LSH candidate
    # generation + exact verification pipeline executed TWICE
    pairs, pair_blocks = checkpoint_tracked(
        embedding_near_dups(embeddings, threshold, n_tables, n_planes)
    )
    sym = (
        pairs.select(F.col("vec_a").alias("id"), F.col("vec_b").alias("nb"))
        .unionByName(
            pairs.select(F.col("vec_b").alias("id"), F.col("vec_a").alias("nb"))
        )
        .persist()
    )
    cores = (
        sym.groupBy("id")
        .agg(F.count("*").alias("n_nbrs"))
        .where(F.col("n_nbrs") >= min_pts)
        .select("id")
        .persist()
    )
    core_edges = (
        sym.join(cores, "id")
        .join(cores.select(F.col("id").alias("nb")), "nb")
        .where(F.col("id") < F.col("nb"))
        .select(F.col("id").alias("src"), F.col("nb").alias("dst"))
    )
    g = graph_from_edges(spark, core_edges)
    cc = connected_components(g)
    if not cc.converged:
        raise RuntimeError(
            f"dbscan: core-graph components did not converge in "
            f"{cc.iterations} supersteps; raise max_iterations"
        )
    # cores with no core neighbor are singleton clusters (their own label)
    core_lab = (
        cores.join(cc.labels, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("cluster"))
        .persist()
    )
    # border: non-core touching >=1 core; deterministic min-label assignment
    border = (
        sym.join(cores, "id", "left_anti")
        .join(core_lab.select(F.col("id").alias("nb"), "cluster"), "nb")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    labeled = core_lab.select(
        "id", F.lit("core").alias("role"), "cluster"
    ).unionByName(border.select("id", F.lit("border").alias("role"), "cluster"))
    out = (
        embeddings.select(F.col("vec_id").alias("id"))
        .join(labeled, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.coalesce("role", F.lit("noise")).alias("role"),
            "cluster",
        )
        .localCheckpoint()
    )
    for df in (core_lab, cores, sym):
        df.unpersist()
    free_tracked(spark.sparkContext, pair_blocks)
    g.unpersist()
    return out


def dbscan_sql(
    table: str = "embeddings",
    threshold: float = 0.35,
    min_pts: int = 3,
    n_tables: int = NEAR_DUP_TABLES,
    n_planes: int = NEAR_DUP_PLANES,
    unroll: int = 40,
) -> str:
    """DuckDB oracle for :func:`dbscan` — LSH pair SQL + unrolled hash-min
    closure over the core-core subgraph (same 40-round convergence margin
    as :func:`embedding_clusters_sql`)."""
    pair_sql = embedding_near_dups_sql(table, threshold, n_tables, n_planes)
    ctes = [
        f"dbp AS MATERIALIZED ({pair_sql})",
        """dbsym AS MATERIALIZED (
      SELECT vec_a AS id, vec_b AS nb FROM dbp
      UNION ALL
      SELECT vec_b AS id, vec_a AS nb FROM dbp
    )""",
        f"""dbcore AS MATERIALIZED (
      SELECT id FROM dbsym GROUP BY id HAVING count(*) >= {min_pts}
    )""",
        """dbce AS MATERIALIZED (
      SELECT s.id AS a, s.nb AS b FROM dbsym s
      JOIN dbcore c1 ON c1.id = s.id
      JOIN dbcore c2 ON c2.id = s.nb
    )""",
        "dbc0 AS (SELECT id, id AS component FROM dbcore WHERE id IN (SELECT a FROM dbce))",
    ]
    for k in range(1, unroll + 1):
        ctes.append(
            f"""dbc{k} AS MATERIALIZED (
      SELECT c.id,
             least(c.component, coalesce(m.mn, c.component)) AS component
      FROM dbc{k - 1} c
      LEFT JOIN (
        SELECT dbce.a AS id, min(c2.component) AS mn
        FROM dbce JOIN dbc{k - 1} c2 ON dbce.b = c2.id
        GROUP BY dbce.a
      ) m ON m.id = c.id
    )"""
        )
    ctes.append(
        f"""dblab AS MATERIALIZED (
      SELECT c.id, coalesce(l.component, c.id) AS cluster
      FROM dbcore c LEFT JOIN dbc{unroll} l ON l.id = c.id
    )"""
    )
    ctes.append(
        """dbborder AS (
      SELECT s.id, min(l.cluster) AS cluster
      FROM dbsym s
      JOIN dblab l ON l.id = s.nb
      WHERE s.id NOT IN (SELECT id FROM dbcore)
      GROUP BY s.id
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body},
    dbroles AS (
      SELECT id, 'core' AS role, cluster FROM dblab
      UNION ALL
      SELECT id, 'border' AS role, cluster FROM dbborder
    )
    SELECT e.vec_id,
           coalesce(r.role, 'noise') AS role,
           r.cluster
    FROM {table} e
    LEFT JOIN dbroles r ON r.id = e.vec_id
    """


def label_outliers(
    embeddings: DataFrame, k: int = 4, n_planes: int = N_PLANES
) -> DataFrame:
    """→ [vec_id, label, n_nbrs, n_agree, agreement] — kNN label-noise
    detection: for every vector, the fraction of its approximate top-k
    cosine neighbors sharing its label. Low ``agreement`` = a suspected
    mislabel (the embedding sits inside another class's region) — the
    standard first-pass audit before training on labeled data; NULL
    ``agreement`` when the vector has no bucket neighbor at all.

    Scale shape: identical candidate generation to :func:`mutual_knn`
    (one hyperplane-bucket equi-join, never all-pairs; per-vector top-k
    over the bucket population), then one label equi-join + grouped sum.
    The label attach is vec_id-keyed — broadcastable whenever the label
    table fits, co-partitioned otherwise.
    """
    base = _with_norm(embeddings)
    bits = None
    for p in range(n_planes):
        bit = F.when(_proj(F.col("v"), p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    bucketed = base.withColumn("bucket", bits.cast("long"))
    q = bucketed.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    topk = _rank_candidates(q, bucketed, k)
    lab = embeddings.select("vec_id", "label")
    nlab = lab.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl"))
    agg = (
        topk.join(nlab, "neighbor_id")
        .join(lab.select(F.col("vec_id").alias("query_id"), "label"), "query_id")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_nbrs"),
            F.sum(F.when(F.col("nl") == F.col("label"), 1).otherwise(0)).alias(
                "n_agree"
            ),
        )
    )
    return (
        lab.join(agg.withColumnRenamed("query_id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("n_nbrs", F.lit(0)).alias("n_nbrs"),
            F.coalesce("n_agree", F.lit(0)).alias("n_agree"),
            F.when(
                F.col("n_nbrs").isNotNull(),
                F.round(F.col("n_agree") / F.col("n_nbrs"), 6),
            ).alias("agreement"),
        )
    )


def label_outliers_sql(
    table: str = "embeddings", k: int = 4, n_planes: int = N_PLANES
) -> str:
    """DuckDB oracle for :func:`label_outliers` — same bucket arithmetic
    and tie-breaks as :func:`mutual_knn_sql`, plus the label joins."""
    bucket = " + ".join(
        f"(CASE WHEN {_proj_sql(p)} > 0 THEN {2 ** p} ELSE 0 END)" for p in range(n_planes)
    )
    dot = (
        "list_reduce(list_transform(range(1, len(q.v) + 1),"
        " i -> q.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH lo_base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), lo_normed AS MATERIALIZED (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm,
             CAST({bucket} AS BIGINT) AS bucket
      FROM lo_base
    ), lo_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round({dot} / (q.norm * b.norm), 6)
                                           DESC, b.vec_id ASC) AS rk
        FROM lo_normed q JOIN lo_normed b
          ON b.bucket = q.bucket AND b.vec_id <> q.vec_id
      ) WHERE rk <= {k}
    ), lo_agg AS (
      SELECT t.query_id AS vec_id, count(*) AS n_nbrs,
             sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS n_agree
      FROM lo_topk t
      JOIN {table} nl ON nl.vec_id = t.neighbor_id
      JOIN {table} ql ON ql.vec_id = t.query_id
      GROUP BY t.query_id
    )
    SELECT e.vec_id, e.label,
           coalesce(a.n_nbrs, 0) AS n_nbrs,
           coalesce(a.n_agree, 0) AS n_agree,
           CASE WHEN a.n_nbrs IS NOT NULL
                THEN round(a.n_agree * 1.0 / a.n_nbrs, 6)
           END AS agreement
    FROM {table} e
    LEFT JOIN lo_agg a ON a.vec_id = e.vec_id
    """


def random_projection(embeddings: DataFrame, k: int = 16) -> DataFrame:
    """→ ``[vec_id, proj]`` — Johnson–Lindenstrauss random projection of
    every embedding to ``k`` dimensions with the deterministic ±1
    hyperplane family (Achlioptas 2003: ±1/√k entries preserve pairwise
    distances in expectation; the same sign family backs the LSH
    planes, so Spark and DuckDB compute bit-identical projections).
    Coordinates are ``proj_j = Σ_d v_d·s_{j,d} / √k`` rounded to 9 dp —
    the cheap dimensionality-reduction front-end for downstream kNN /
    clustering when 64 dims is 4× more bytes than the task needs.

    Plan shape: pure per-row projection (k folds over the vector array,
    JVM higher-order functions) — NO shuffle, no UDF.
    """
    if k < 1 or int(k) ** 0.5 != int(int(k) ** 0.5):
        raise ValueError(f"random_projection: k must be a perfect square >= 1, got {k}")
    root = float(int(k) ** 0.5)
    v = _as_double(F.col("embedding"))
    proj = F.array(
        *[F.round(_proj(v, p) / F.lit(root), 9) for p in range(k)]
    )
    return embeddings.select("vec_id", proj.alias("proj"))


def _rp_proj_sql(k: int) -> str:
    root = float(int(k) ** 0.5)
    coords = ",\n             ".join(
        f"round(({_proj_sql(p)}) / {root}, 9)" for p in range(k)
    )
    return f"[{coords}]"


def rp_distortion(embeddings: DataFrame, k: int = 16) -> DataFrame:
    """→ ``[vec_id_a, vec_id_b, d2_orig, d2_proj, ratio]`` — the
    JL-distortion audit for :func:`random_projection`: over the
    deterministic chain of consecutive ``vec_id`` pairs, the original
    vs projected squared L2 distance and their ratio (≈1 ± O(1/√k) when
    the projection is healthy; a ratio histogram far from 1 means k is
    too small for the corpus). ``ratio`` is NULL for identical vectors.

    Plan shape: projection is per-row; the pair chain is ONE lead window
    over ``vec_id`` (a single range-partitioned sort at scale — sample
    the chain by hash first if even that is too much); distances are
    array folds. No join, no cartesian.
    """
    if k < 1 or int(k) ** 0.5 != int(int(k) ** 0.5):
        raise ValueError(f"rp_distortion: k must be a perfect square >= 1, got {k}")
    root = float(int(k) ** 0.5)
    v = _as_double(F.col("embedding"))
    proj = F.array(*[F.round(_proj(v, p) / F.lit(root), 9) for p in range(k)])
    base = embeddings.select("vec_id", v.alias("v"), proj.alias("p"))
    w = Window.orderBy("vec_id")
    pairs = base.select(
        F.col("vec_id").alias("vec_id_a"),
        F.lead("vec_id").over(w).alias("vec_id_b"),
        "v",
        "p",
        F.lead("v").over(w).alias("nv"),
        F.lead("p").over(w).alias("np"),
    ).where(F.col("vec_id_b").isNotNull())

    def sqd(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    d2o = F.round(sqd(F.col("v"), F.col("nv")), 6)
    d2p = F.round(sqd(F.col("p"), F.col("np")), 6)
    return pairs.select(
        "vec_id_a",
        "vec_id_b",
        d2o.alias("d2_orig"),
        d2p.alias("d2_proj"),
        F.when(d2o > 0, F.round(d2p / d2o, 6)).alias("ratio"),
    )


def rp_distortion_sql(table: str = "embeddings", k: int = 16) -> str:
    """DuckDB oracle for :func:`rp_distortion` — same sign family,
    fold order, and rounding as the engine."""
    if k < 1 or int(k) ** 0.5 != int(int(k) ** 0.5):
        raise ValueError(f"rp_distortion_sql: k must be a perfect square >= 1, got {k}")
    sqd_orig = (
        "list_reduce(list_transform(range(1, len(v) + 1),"
        " i -> (v[i] - nv[i]) * (v[i] - nv[i])), (x, y) -> x + y)"
    )
    sqd_proj = (
        "list_reduce(list_transform(range(1, len(p) + 1),"
        " i -> (p[i] - np[i]) * (p[i] - np[i])), (x, y) -> x + y)"
    )
    return f"""
    WITH rp_b AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), rp_p AS MATERIALIZED (
      SELECT vec_id, v, {_rp_proj_sql(k)} AS p FROM rp_b
    ), rp_pairs AS (
      SELECT vec_id AS vec_id_a,
             lead(vec_id) OVER w AS vec_id_b,
             v, p,
             lead(v) OVER w AS nv,
             lead(p) OVER w AS np
      FROM rp_p WINDOW w AS (ORDER BY vec_id)
    ), rp_d AS (
      SELECT vec_id_a, vec_id_b,
             round({sqd_orig}, 6) AS d2_orig,
             round({sqd_proj}, 6) AS d2_proj
      FROM rp_pairs WHERE vec_id_b IS NOT NULL
    )
    SELECT vec_id_a, vec_id_b, d2_orig, d2_proj,
           CASE WHEN d2_orig > 0 THEN round(d2_proj / d2_orig, 6) END AS ratio
    FROM rp_d
    """


def ivf_recall(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """→ ``[query_id, n_exact, n_hits, recall]`` — recall@k of the
    :func:`ivf_knn` coarse-quantized path against the
    :func:`cosine_topk` exact ground truth, per query: the
    :func:`lsh_recall` acceptance audit for the OTHER ANN index. The
    two recall curves together answer the production question "probe
    more cells or add hash tables?" on the same data, distance, and
    tie-breaks.

    Scale shape: composes two existing plans plus one equi-join and an
    O(n_queries)-row aggregate — ground truth only for the query
    sample, never all-pairs.
    """
    exact = cosine_topk(embeddings, n_queries, k).select("query_id", "neighbor_id")
    approx = ivf_knn(embeddings, n_queries, k, n_cells, n_probe).select(
        F.col("query_id").alias("_qa"), F.col("neighbor_id").alias("_na")
    )
    cnt = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    hits = (
        exact.join(
            approx,
            (F.col("query_id") == F.col("_qa"))
            & (F.col("neighbor_id") == F.col("_na")),
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return cnt.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.round(F.coalesce("n_hits", F.lit(0)) * 1.0 / F.col("n_exact"), 6).alias(
            "recall"
        ),
    )


def ivf_recall_sql(
    table: str = "embeddings",
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
) -> str:
    """DuckDB oracle for :func:`ivf_recall` (same isolated-subquery
    composition as :func:`lsh_recall_sql`)."""
    return f"""
    WITH ir_ex AS (
      SELECT query_id, neighbor_id FROM (
        {cosine_topk_sql(table, n_queries, k)}
      )
    ), ir_ap AS (
      SELECT query_id, neighbor_id FROM (
        {ivf_knn_sql(table, n_queries, k, n_cells, n_probe)}
      )
    ), ir_cnt AS (
      SELECT query_id, count(*) AS n_exact FROM ir_ex GROUP BY query_id
    ), ir_hit AS (
      SELECT e.query_id, count(*) AS n_hits
      FROM ir_ex e JOIN ir_ap a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.query_id
    )
    SELECT c.query_id, c.n_exact, coalesce(h.n_hits, 0) AS n_hits,
           round(coalesce(h.n_hits, 0) * 1.0 / c.n_exact, 6) AS recall
    FROM ir_cnt c LEFT JOIN ir_hit h USING (query_id)
    """


def centroid_purity(embeddings: DataFrame) -> DataFrame:
    """→ ``[label, n, n_correct, purity]`` — nearest-centroid label
    agreement: per-label centroids (coordinate means rounded to 9 dp,
    the k-means convention), then every vector is assigned to its
    closest centroid (squared L2 rounded 9, ties to the smaller label)
    and scored against its own label. The separability audit that pairs
    with :func:`label_centroid_dists` — THAT says which class centroids
    nearly coincide, THIS says how much of each class actually lives on
    the wrong side; a label below ~0.5 purity is one a nearest-centroid
    router (or a stratified sampler treating labels as distinct) will
    scramble.

    Plan shape: one posexplode + (label, dim) mean for the centroids
    (|labels|·D rows), centroid arrays rebuilt in sorted-dim order
    (deterministic fold order — the kcenter convention), ONE broadcast
    cross join of the tiny centroid table against the vectors with a
    per-vector rank window, then a |labels|-row aggregate.
    """
    base = embeddings.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )
    ex = embeddings.select(
        "label", F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val")
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 9).alias("mu"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                lambda s: s["mu"],
            ).alias("cv")
        )
        .select(F.col("label").alias("clabel"), "cv")
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("_d2"), F.asc("clabel"))
    assigned = (
        base.crossJoin(F.broadcast(cent))
        .select("vec_id", "label", "clabel", d2.alias("_d2"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    return assigned.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum((F.col("clabel") == F.col("label")).cast("long")).alias("n_correct"),
        F.round(
            F.sum((F.col("clabel") == F.col("label")).cast("long"))
            * 1.0
            / F.count("*"),
            6,
        ).alias("purity"),
    )


def centroid_purity_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`centroid_purity` — same rounded
    centroids, sorted-dim fold order, and tie-breaks."""
    sqd = (
        "list_reduce(list_transform(range(1, len(b.v) + 1),"
        " i -> (b.v[i] - c.cv[i]) * (b.v[i] - c.cv[i])), (x, y) -> x + y)"
    )
    return f"""
    WITH cp_b AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ),
    cp_ex AS (
      SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS val FROM cp_b
    ),
    cp_c AS (
      SELECT label AS clabel,
             list(mu ORDER BY pos) AS cv
      FROM (SELECT label, pos, round(avg(val), 9) AS mu
            FROM cp_ex GROUP BY label, pos)
      GROUP BY label
    ),
    cp_assign AS (
      SELECT b.vec_id, b.label, c.clabel,
             row_number() OVER (
               PARTITION BY b.vec_id
               ORDER BY round({sqd}, 9) ASC, c.clabel ASC) AS rn
      FROM cp_b b CROSS JOIN cp_c c
    )
    SELECT label, count(*) AS n,
           CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS purity
    FROM cp_assign WHERE rn = 1
    GROUP BY label
    """


def dim_variance(embeddings: DataFrame) -> DataFrame:
    """→ ``[pos, mean, var_pop, mn, mx]`` — the per-dimension activation
    profile of the embedding matrix: coordinate mean, population
    variance, min and max for each of the D dimensions. Dead dimensions
    (var ≈ 0) are the classic sign of a truncated/buggy encoder export
    or an over-aggressive quantization step, and a handful of
    dominant-variance dims means distances are effectively
    low-dimensional — both checked here before anyone builds an index
    on the corpus. Complements :func:`embedding_stats` (global norm
    profile) with the per-axis view.

    Plan shape: ONE posexplode + a hash aggregate keyed on the D
    dimension indices (constant cardinality — map-side combinable, no
    skew possible). Output is D rows.
    """
    ex = embeddings.select(
        F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val")
    )
    return ex.groupBy("pos").agg(
        F.round(F.avg("val"), 6).alias("mean"),
        F.round(F.var_pop("val"), 6).alias("var_pop"),
        F.round(F.min("val"), 6).alias("mn"),
        F.round(F.max("val"), 6).alias("mx"),
    )


def dim_variance_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`dim_variance` (standalone query)."""
    return f"""
    WITH dv_ex AS (
      SELECT unnest(range(len(v))) AS pos, unnest(v) AS val
      FROM (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM {table})
    )
    SELECT pos, round(avg(val), 6) AS mean,
           round(var_pop(val), 6) AS var_pop,
           round(min(val), 6) AS mn,
           round(max(val), 6) AS mx
    FROM dv_ex GROUP BY pos
    """


def anisotropy(embeddings: DataFrame) -> DataFrame:
    """→ one-row ``[n, dim, mean_norm, mean_pairwise_cos]`` — the
    embedding-space anisotropy audit: the EXACT mean cosine similarity
    over all n·(n−1) ordered pairs of (L2-normalized) vectors, computed
    WITHOUT a cross join via the sum-vector identity
    Σ_{i≠j} v̂ᵢ·v̂ⱼ = ‖Σᵢ v̂ᵢ‖² − Σᵢ‖v̂ᵢ‖² (and Σᵢ‖v̂ᵢ‖² = n for unit
    vectors). Ethayarajh (EMNLP 2019) showed contextual encoders are
    highly anisotropic — mean pairwise cos ≫ 0 means cosine scores are
    inflated by a common bias direction and retrieval thresholds tuned
    on one corpus won't transfer; near 0 means the space is isotropic
    and cosine behaves. The one number to check before fixing any
    similarity threshold in a dedup or retrieval config.

    Zero-norm vectors cannot be normalized and are excluded from ``n``
    (both engines). ``mean_pairwise_cos`` is NULL when n < 2.

    Scale shape: one posexplode + two hash aggregates (per-vector norm,
    then per-dimension sums of the normalized coordinates — D keys,
    constant cardinality) and an O(D)-row reduction. Nothing pairwise
    materializes; the cost is one scan of the n·D cells at any corpus
    size.
    """
    ex = embeddings.select(
        "vec_id", F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val")
    )
    nrm = ex.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm"),
        F.count("*").alias("d"),
    )
    ok = nrm.where(F.col("nrm") > 0)
    dsum = (
        ex.join(ok.select("vec_id", "nrm"), "vec_id")
        .groupBy("pos")
        .agg(F.sum(F.col("val") / F.col("nrm")).alias("s"))
    )
    ss = dsum.agg(F.sum(F.col("s") * F.col("s")).alias("ss"))
    stats = ok.agg(
        F.count("*").alias("n"),
        F.max("d").alias("dim"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
    )
    return stats.crossJoin(ss).select(
        "n",
        "dim",
        "mean_norm",
        F.round(
            F.when(
                F.col("n") > 1,
                (F.col("ss") - F.col("n")) / (F.col("n") * (F.col("n") - F.lit(1.0))),
            ),
            6,
        ).alias("mean_pairwise_cos"),
    )


def anisotropy_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`anisotropy` (standalone query)."""
    return f"""
    WITH an_ex AS (
      SELECT vec_id, unnest(range(len(v))) AS pos, unnest(v) AS val
      FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM {table})
    ),
    an_nrm AS (
      SELECT vec_id, sqrt(sum(val * val)) AS nrm, count(*) AS d
      FROM an_ex GROUP BY vec_id
    ),
    an_ok AS (SELECT * FROM an_nrm WHERE nrm > 0),
    an_ds AS (
      SELECT pos, sum(val / nrm) AS s
      FROM an_ex e JOIN an_ok n USING (vec_id)
      GROUP BY pos
    ),
    an_ss AS (SELECT sum(s * s) AS ss FROM an_ds),
    an_st AS (
      SELECT count(*) AS n, max(d) AS dim, round(avg(nrm), 6) AS mean_norm
      FROM an_ok
    )
    SELECT n, dim, mean_norm,
           CASE WHEN n > 1
                THEN round((ss - n) / (n * (n - 1.0)), 6) END
             AS mean_pairwise_cos
    FROM an_st CROSS JOIN an_ss
    """


def variance_participation(embeddings: DataFrame) -> DataFrame:
    """→ one-row ``[dim, total_var, eff_dims, eff_frac]`` — the
    coordinate-variance participation ratio (Σλ)² / Σλ² over the
    per-dimension population variances: the "effective number of
    dimensions" the embedding actually uses (D if variance is spread
    evenly, →1 if one axis dominates). The one-number companion of
    :func:`dim_variance`'s per-axis profile and the cheap diagonal
    proxy for PCA spectrum flatness — ``eff_dims ≪ D`` says distances
    live in a low-rank subspace and an aggressive
    :func:`random_projection` / PQ config is safe; NULL when every
    coordinate is constant.

    Scale shape: one posexplode + a D-keyed variance aggregate
    (constant cardinality, map-side combinable) + an O(D)-row
    reduction. One scan of the n·D cells at any corpus size.
    """
    ex = embeddings.select(
        F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val")
    )
    pv = ex.groupBy("pos").agg(F.var_pop("val").alias("v"))
    agg = pv.agg(
        F.count("*").alias("dim"),
        F.sum("v").alias("_s"),
        F.sum(F.col("v") * F.col("v")).alias("_s2"),
    )
    eff = F.when(
        F.col("_s2") > 0, (F.col("_s") * F.col("_s")) / F.col("_s2")
    )
    return agg.select(
        "dim",
        F.round("_s", 6).alias("total_var"),
        F.round(eff, 6).alias("eff_dims"),
        F.round(eff / F.col("dim"), 6).alias("eff_frac"),
    )


def variance_participation_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`variance_participation` (standalone)."""
    return f"""
    WITH vp_ex AS (
      SELECT unnest(range(len(v))) AS pos, unnest(v) AS val
      FROM (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM {table})
    ),
    vp_pv AS (SELECT pos, var_pop(val) AS v FROM vp_ex GROUP BY pos),
    vp_agg AS (
      SELECT count(*) AS dim, sum(v) AS s, sum(v * v) AS s2 FROM vp_pv
    )
    SELECT dim, round(s, 6) AS total_var,
           CASE WHEN s2 > 0 THEN round(s * s / s2, 6) END AS eff_dims,
           CASE WHEN s2 > 0 THEN round(s * s / s2 / dim, 6) END AS eff_frac
    FROM vp_agg
    """


def knn_mrr(embeddings: DataFrame, n_queries: int = 10, k: int = 10) -> DataFrame:
    """→ ``[query_id, label, first_hit, rr]`` — retrieval quality as mean
    reciprocal rank components: for each of the first ``n_queries``
    vectors, the rank of the FIRST exact-cosine top-``k`` neighbor that
    shares its label (NULL + rr 0.0 if none lands in the top k). The
    eval that turns :func:`cosine_topk`'s raw neighbor lists into the
    number retrieval teams actually track — read next to
    :func:`lsh_recall`/:func:`ivf_recall` it separates "the index
    misses neighbors" from "the embedding puts wrong labels on top".

    Scale shape: composes the broadcast-query exact top-k (ground truth
    for the query sample only — never all-pairs) with two O(V) label
    equi-joins and an O(n_queries)-row aggregate.
    """
    topk = cosine_topk(embeddings, n_queries, k)
    lab = embeddings.select("vec_id", "label")
    j = (
        topk.join(
            lab.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("q_lab")
            ),
            "query_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_lab"),
            ),
            "neighbor_id",
        )
    )
    per = j.groupBy("query_id", "q_lab").agg(
        F.min(
            F.when(F.col("n_lab") == F.col("q_lab"), F.col("rk"))
        ).alias("first_hit")
    )
    return per.select(
        "query_id",
        F.col("q_lab").alias("label"),
        "first_hit",
        F.round(
            F.when(
                F.col("first_hit").isNotNull(), 1.0 / F.col("first_hit")
            ).otherwise(0.0),
            6,
        ).alias("rr"),
    )


def knn_mrr_sql(table: str = "embeddings", n_queries: int = 10, k: int = 10) -> str:
    """DuckDB oracle for :func:`knn_mrr` (standalone query)."""
    return f"""
    WITH km_topk AS (
      SELECT query_id, neighbor_id, rk FROM (
        {cosine_topk_sql(table, n_queries, k)}
      )
    ),
    km_j AS (
      SELECT t.query_id, ql.label AS q_lab, nl.label AS n_lab, t.rk
      FROM km_topk t
      JOIN {table} ql ON ql.vec_id = t.query_id
      JOIN {table} nl ON nl.vec_id = t.neighbor_id
    ),
    km_per AS (
      SELECT query_id, q_lab,
             min(CASE WHEN n_lab = q_lab THEN rk END) AS first_hit
      FROM km_j GROUP BY query_id, q_lab
    )
    SELECT query_id, q_lab AS label, first_hit,
           round(CASE WHEN first_hit IS NOT NULL
                      THEN 1.0 / first_hit ELSE 0.0 END, 6) AS rr
    FROM km_per
    """


def quality_vs_norm(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """→ one-row ``[n, corr, avg_quality, avg_norm]`` — the cross-modal
    sanity check: Pearson correlation between the heuristic text
    quality score and the document's embedding L2 norm, over the
    embedded subset (``vec_id`` keys the same documents as ``doc_id``;
    docs without vectors drop out). Encoders famously give junk inputs
    extreme norms — a strong correlation here means norm is a free
    quality prefilter; none means the embedding ignores the quality
    axis and curation must stay text-side. Norms are rounded to 9dp
    before the moments so both engines correlate identical inputs;
    zero variance → NULL.

    Scale shape: one map-only quality projection, one per-vector norm
    aggregate, one equi-join on the shared id, one global moment
    aggregate — all linear scans.
    """
    from linkgraph_spark.functions.text import quality_score

    q = quality_score(documents).select(
        F.col("doc_id").alias("vec_id"), F.col("quality").cast("double").alias("ql")
    )
    ex = embeddings.select(
        "vec_id", F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val")
    )
    nrm = ex.groupBy("vec_id").agg(
        F.round(F.sqrt(F.sum(F.col("val") * F.col("val"))), 9).alias("nrm")
    )
    j = q.join(nrm, "vec_id")
    mom = j.agg(
        F.count("*").alias("n"),
        F.covar_pop("ql", "nrm").alias("cv"),
        F.stddev_pop("ql").alias("sq"),
        F.stddev_pop("nrm").alias("sn"),
        F.round(F.avg("ql"), 6).alias("avg_quality"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
    )
    return mom.select(
        "n",
        F.round(
            F.when(
                (F.col("sq") > 0) & (F.col("sn") > 0),
                F.col("cv") / (F.col("sq") * F.col("sn")),
            ),
            6,
        ).alias("corr"),
        "avg_quality",
        "avg_norm",
    )


def quality_vs_norm_sql(
    docs_table: str = "documents", emb_table: str = "embeddings"
) -> str:
    """DuckDB oracle for :func:`quality_vs_norm` (standalone query)."""
    from linkgraph_spark.functions.text import quality_score_sql

    return f"""
    WITH qn_q AS (
      SELECT doc_id AS vec_id, CAST(quality AS DOUBLE) AS ql FROM (
        {quality_score_sql(docs_table)}
      )
    ),
    qn_ex AS (
      SELECT vec_id, unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val
      FROM {emb_table}
    ),
    qn_n AS (
      SELECT vec_id, round(sqrt(sum(val * val)), 9) AS nrm
      FROM qn_ex GROUP BY vec_id
    ),
    qn_m AS (
      SELECT count(*) AS n, covar_pop(ql, nrm) AS cv,
             stddev_pop(ql) AS sq, stddev_pop(nrm) AS sn,
             round(avg(ql), 6) AS avg_quality, round(avg(nrm), 6) AS avg_norm
      FROM qn_q q JOIN qn_n e USING (vec_id)
    )
    SELECT n,
           CASE WHEN sq > 0 AND sn > 0 THEN round(cv / (sq * sn), 6) END AS corr,
           avg_quality, avg_norm
    FROM qn_m
    """


def quantize_recall(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, bits: int = 8
) -> DataFrame:
    """→ ``[query_id, n_exact, n_hits, recall]`` — recall@k of exact
    cosine search over the int-``bits`` scalar-quantized RECONSTRUCTION
    against the fp ground truth, per query. Completes the index-eval
    triad — :func:`lsh_recall` (hash tables), :func:`ivf_recall`
    (coarse cells), and this (storage precision): together they say
    whether a production miss comes from bucketing or from the 4×
    compression itself. Uses :func:`embedding_quantize`'s exact code
    path (per-dimension min/max, ``floor(x+0.5)`` coding) so the audit
    evaluates precisely what would be written to disk.

    Scale shape: ground truth via the broadcast-query exact top-k;
    reconstruction is one posexplode + a D-row broadcast range join;
    the quantized scores join the n_queries·D broadcast query slice to
    the long-form corpus on the dimension key — n_queries·N·D products,
    linear in N with constant factors. Per-query rank windows partition
    on query_id.
    """
    levels = float(2**bits - 1)
    exact = cosine_topk(embeddings, n_queries, k).select("query_id", "neighbor_id")
    ex = embeddings.select(
        "vec_id", F.posexplode(_as_double(F.col("embedding"))).alias("dim", "val")
    )
    rng = ex.groupBy("dim").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    scale = (F.col("mx") - F.col("mn")) / F.lit(levels)
    code = F.least(
        F.lit(levels),
        F.greatest(F.lit(0.0), F.floor((F.col("val") - F.col("mn")) / scale + 0.5)),
    )
    rv = F.when(F.col("mx") == F.col("mn"), F.col("val")).otherwise(
        F.col("mn") + code * scale
    )
    rl = ex.join(F.broadcast(rng), "dim").select("vec_id", "dim", rv.alias("rv"))
    nrm = rl.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("rv") * F.col("rv"))).alias("rn")
    )
    q = rl.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "dim", F.col("rv").alias("qv")
    )
    dots = (
        F.broadcast(q)
        .join(rl, "dim")
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("qv") * F.col("rv")).alias("dot"))
    )
    qn = nrm.select(F.col("vec_id").alias("query_id"), F.col("rn").alias("qn"))
    scored = (
        dots.join(nrm, "vec_id")
        .join(qn, "query_id")
        .where((F.col("rn") > 0) & (F.col("qn") > 0))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("dot") / (F.col("qn") * F.col("rn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    approx = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("query_id").alias("_qa"), F.col("neighbor_id").alias("_na"))
    )
    cnt = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    hits = (
        exact.join(
            approx,
            (F.col("query_id") == F.col("_qa"))
            & (F.col("neighbor_id") == F.col("_na")),
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return cnt.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce("n_hits", F.lit(0)) * 1.0 / F.col("n_exact"), 6
        ).alias("recall"),
    )


def quantize_recall_sql(
    table: str = "embeddings", n_queries: int = 10, k: int = 5, bits: int = 8
) -> str:
    """DuckDB oracle for :func:`quantize_recall` (standalone query)."""
    levels = float(2**bits - 1)
    return f"""
    WITH qr_ex_t AS (
      SELECT query_id, neighbor_id FROM (
        {cosine_topk_sql(table, n_queries, k)}
      )
    ),
    qr_long AS (
      SELECT vec_id, unnest(range(len(embedding))) AS dim,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val
      FROM {table}
    ),
    qr_rng AS (
      SELECT dim, min(val) AS mn, max(val) AS mx FROM qr_long GROUP BY dim
    ),
    qr_rl AS MATERIALIZED (
      SELECT l.vec_id, l.dim,
             CASE WHEN r.mx = r.mn THEN l.val
                  ELSE r.mn + least({levels!r}, greatest(0.0,
                         floor((l.val - r.mn) / ((r.mx - r.mn) / {levels!r}) + 0.5)))
                       * ((r.mx - r.mn) / {levels!r})
             END AS rv
      FROM qr_long l JOIN qr_rng r USING (dim)
    ),
    qr_nrm AS (
      SELECT vec_id, sqrt(sum(rv * rv)) AS rn FROM qr_rl GROUP BY vec_id
    ),
    qr_dots AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             sum(q.rv * b.rv) AS dot
      FROM qr_rl q JOIN qr_rl b ON b.dim = q.dim AND b.vec_id <> q.vec_id
      WHERE q.vec_id < {int(n_queries)}
      GROUP BY q.vec_id, b.vec_id
    ),
    qr_scored AS (
      SELECT d.query_id, d.neighbor_id,
             round(d.dot / (qn.rn * bn.rn), 6) AS cosine
      FROM qr_dots d
      JOIN qr_nrm qn ON qn.vec_id = d.query_id
      JOIN qr_nrm bn ON bn.vec_id = d.neighbor_id
      WHERE qn.rn > 0 AND bn.rn > 0
    ),
    qr_ap AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rk
        FROM qr_scored
      ) WHERE rk <= {int(k)}
    ),
    qr_cnt AS (
      SELECT query_id, count(*) AS n_exact FROM qr_ex_t GROUP BY query_id
    ),
    qr_hits AS (
      SELECT e.query_id, count(*) AS n_hits
      FROM qr_ex_t e JOIN qr_ap a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.query_id
    )
    SELECT c.query_id, c.n_exact, coalesce(h.n_hits, 0) AS n_hits,
           round(coalesce(h.n_hits, 0) * 1.0 / c.n_exact, 6) AS recall
    FROM qr_cnt c LEFT JOIN qr_hits h ON h.query_id = c.query_id
    """


def centroid_stability(embeddings: DataFrame) -> DataFrame:
    """→ ``[label, n_even, n_odd, centroid_cos]`` — the split-half
    stability audit: per label, the cosine between the mean vector of
    its even-``vec_id`` half and its odd half. A label whose halves
    barely agree (cos ≪ 1) has no coherent centroid — its
    :func:`label_centroid_dists` / :func:`centroid_purity` numbers are
    sampling noise, and any nearest-centroid routing built on it will
    not reproduce on the next ingest. The deterministic stand-in for a
    bootstrap, exact in both engines (NULL when a half is empty or
    zero-norm).

    Scale shape: one posexplode + a (label, parity, pos)-keyed mean
    aggregate (constant ≤ |labels|·2·D cells), then O(labels·D)-row
    arithmetic. One scan.
    """
    ex = embeddings.select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("even"),
        F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val"),
    )
    cent = ex.groupBy("label", "even", "pos").agg(
        F.avg("val").alias("m"), F.count("*").alias("nd")
    )
    e = cent.where(F.col("even")).select(
        "label", "pos", F.col("m").alias("me"), F.col("nd").alias("ne")
    )
    o = cent.where(~F.col("even")).select(
        "label", "pos", F.col("m").alias("mo"), F.col("nd").alias("no")
    )
    j = e.join(o, ["label", "pos"])
    agg = j.groupBy("label").agg(
        F.first("ne").alias("ne"),
        F.first("no").alias("no"),
        F.sum(F.col("me") * F.col("mo")).alias("dot"),
        F.sqrt(F.sum(F.col("me") * F.col("me"))).alias("nrm_e"),
        F.sqrt(F.sum(F.col("mo") * F.col("mo"))).alias("nrm_o"),
    )
    return agg.select(
        "label",
        F.col("ne").cast("long").alias("n_even"),
        F.col("no").cast("long").alias("n_odd"),
        F.round(
            F.when(
                (F.col("nrm_e") > 0) & (F.col("nrm_o") > 0),
                F.col("dot") / (F.col("nrm_e") * F.col("nrm_o")),
            ),
            6,
        ).alias("centroid_cos"),
    )


def centroid_stability_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`centroid_stability` (standalone query)."""
    return f"""
    WITH cs_ex AS (
      SELECT label, vec_id % 2 = 0 AS even,
             unnest(range(len(v))) AS pos, unnest(v) AS val
      FROM (SELECT label, vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM {table})
    ),
    cs_c AS (
      SELECT label, even, pos, avg(val) AS m, count(*) AS nd
      FROM cs_ex GROUP BY label, even, pos
    ),
    cs_j AS (
      SELECT e.label, e.pos, e.m AS me, o.m AS mo, e.nd AS ne, o.nd AS no
      FROM (SELECT * FROM cs_c WHERE even) e
      JOIN (SELECT * FROM cs_c WHERE NOT even) o
        ON o.label = e.label AND o.pos = e.pos
    ),
    cs_a AS (
      SELECT label, first(ne) AS ne, first(no) AS no,
             sum(me * mo) AS dot,
             sqrt(sum(me * me)) AS nrm_e, sqrt(sum(mo * mo)) AS nrm_o
      FROM cs_j GROUP BY label
    )
    SELECT label, CAST(ne AS BIGINT) AS n_even, CAST(no AS BIGINT) AS n_odd,
           CASE WHEN nrm_e > 0 AND nrm_o > 0
                THEN round(dot / (nrm_e * nrm_o), 6) END AS centroid_cos
    FROM cs_a
    """


def knn_confusion(embeddings: DataFrame, n_queries: int = 10, k: int = 10) -> DataFrame:
    """→ ``[q_label, n_label, n_votes]`` — the kNN label confusion
    matrix: over the first ``n_queries`` vectors' exact cosine
    top-``k`` neighbors, how many votes flow from each query label to
    each neighbor label. The matrix view behind :func:`knn_mrr`'s
    per-query scalar — a heavy off-diagonal cell names WHICH two
    labels the embedding space actually confuses (the pair to merge,
    re-annotate, or hard-negative-mine), where MRR only says
    retrieval is poor.

    Scale shape: the broadcast-query exact top-k plus two O(V) label
    equi-joins and a ≤ |labels|² aggregate.
    """
    topk = cosine_topk(embeddings, n_queries, k)
    lab = embeddings.select("vec_id", "label")
    j = (
        topk.join(
            lab.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
            ),
            "query_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
    )
    return j.groupBy("q_label", "n_label").agg(F.count("*").alias("n_votes"))


def knn_confusion_sql(
    table: str = "embeddings", n_queries: int = 10, k: int = 10
) -> str:
    """DuckDB oracle for :func:`knn_confusion` (standalone query)."""
    return f"""
    WITH kc_topk AS (
      SELECT query_id, neighbor_id FROM (
        {cosine_topk_sql(table, n_queries, k)}
      )
    )
    SELECT ql.label AS q_label, nl.label AS n_label, count(*) AS n_votes
    FROM kc_topk t
    JOIN {table} ql ON ql.vec_id = t.query_id
    JOIN {table} nl ON nl.vec_id = t.neighbor_id
    GROUP BY 1, 2
    """


def knn_hubness(
    embeddings: DataFrame, k: int = 4, n_planes: int = N_PLANES
) -> DataFrame:
    """→ ``[k_occurrences, n_vectors]`` — the hubness histogram of the
    approximate kNN graph: for every vector, how many OTHER vectors list
    it in their top-``k`` (its k-occurrence), histogrammed — including
    the 0-occurrence anti-hubs, which the kNN edge list alone can't
    show. A heavy right tail (hubs appearing in thousands of lists) is
    the classic high-dimensional pathology (Radovanović et al., JMLR
    2010) that silently poisons kNN classification, dedup and retrieval;
    this is the one-query diagnostic to run before trusting
    :func:`mutual_knn` or :func:`lsh_knn` output downstream.

    Scale shape: the same hyperplane-bucket candidate join as
    :func:`mutual_knn` (never all-pairs), per-query top-k window bounded
    by bucket population, then a neighbor-keyed count, a left join
    against the id universe for the zeros, and a ≤ |distinct occ|
    histogram agg. All JVM-side.
    """
    base = _with_norm(embeddings)
    bits = None
    for p in range(n_planes):
        bit = F.when(_proj(F.col("v"), p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    bucketed = base.withColumn("bucket", bits.cast("long"))
    q = bucketed.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    topk = _rank_candidates(q, bucketed, k)
    occ = topk.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count("*").alias("k_occurrences")
    )
    per_vec = embeddings.select("vec_id").join(occ, "vec_id", "left").select(
        F.coalesce("k_occurrences", F.lit(0)).alias("k_occurrences")
    )
    return per_vec.groupBy("k_occurrences").agg(
        F.count("*").alias("n_vectors")
    )


def knn_hubness_sql(
    table: str = "embeddings", k: int = 4, n_planes: int = N_PLANES
) -> str:
    """DuckDB oracle for :func:`knn_hubness` — same bucket arithmetic and
    rounded-cosine/id tie-break as :func:`mutual_knn_sql`."""
    bucket = " + ".join(
        f"(CASE WHEN {_proj_sql(p)} > 0 THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    )
    dot = (
        "list_reduce(list_transform(range(1, len(q.v) + 1),"
        " i -> q.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH kh_base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), kh_normed AS MATERIALIZED (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm,
             CAST({bucket} AS BIGINT) AS bucket
      FROM kh_base
    ), kh_scored AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             round({dot} / (q.norm * b.norm), 6) AS cosine
      FROM kh_normed q JOIN kh_normed b
        ON b.bucket = q.bucket AND b.vec_id <> q.vec_id
    ), kh_topk AS (
      SELECT neighbor_id FROM (
        SELECT neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC) AS rk
        FROM kh_scored
      ) WHERE rk <= {int(k)}
    ), kh_occ AS (
      SELECT neighbor_id AS vec_id, count(*) AS k_occurrences
      FROM kh_topk GROUP BY neighbor_id
    ), kh_per AS (
      SELECT coalesce(o.k_occurrences, 0) AS k_occurrences
      FROM kh_base b LEFT JOIN kh_occ o ON o.vec_id = b.vec_id
    )
    SELECT k_occurrences, count(*) AS n_vectors
    FROM kh_per GROUP BY k_occurrences
    """


def triplet_accuracy(embeddings: DataFrame, n_buckets: int = 16) -> DataFrame:
    """→ one-row ``[n_triplets, n_correct, accuracy]`` — does the
    embedding respect its labels metrically? For each anchor vector we
    form a deterministic triplet inside its md5 bucket: the positive is
    the same-label bucket-mate with the smallest anchor-salted md5, the
    negative the different-label bucket-mate by the same rule; the
    triplet scores correct iff cos(a, pos) > cos(a, neg) (rounded to
    6 dp — ties count as failures in both engines). Anchors whose bucket
    lacks a positive or a negative are skipped; ``n_triplets`` reports
    the evaluated count. This is the training-loss-shaped complement of
    :func:`~linkgraph_spark.kernels.kmeans.silhouette`: it needs no
    centroids and directly measures ranking order, which is what
    retrieval uses.

    Scale shape: bucketing is a map-only hash; candidate enumeration is
    a bucket equi-join (per-bucket |bucket|² pairs, never all-pairs and
    never a global window); positive/negative selection is a
    row_number window per (anchor) over bucket-bounded candidates; the
    verdict is one global count agg.
    """
    from linkgraph_spark.functions.hashing import md5_long

    base = _with_norm(embeddings.select("vec_id", "embedding")).join(
        embeddings.select("vec_id", "label"), "vec_id"
    )
    b = base.withColumn(
        "bucket", F.pmod(md5_long(F.col("vec_id").cast("string")), F.lit(int(n_buckets)))
    )
    anchors = b.select(
        F.col("vec_id").alias("aid"),
        F.col("v").alias("av"),
        F.col("norm").alias("anorm"),
        F.col("label").alias("albl"),
        "bucket",
    )
    cands = b.select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
        F.col("label").alias("clbl"),
        "bucket",
    )
    pairs = anchors.join(cands, "bucket").where(F.col("cid") != F.col("aid"))
    pick = md5_long(
        F.concat(F.col("aid").cast("string"), F.lit("#"), F.col("cid").cast("string"))
    )
    cos = F.round(
        _dot(F.col("av"), F.col("cv")) / (F.col("anorm") * F.col("cnorm")), 6
    )
    scored = pairs.select(
        "aid",
        (F.col("clbl") == F.col("albl")).alias("is_pos"),
        pick.alias("pick"),
        cos.alias("cosine"),
    )
    w = Window.partitionBy("aid", "is_pos").orderBy("pick", "cosine")
    best = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    pos = best.where(F.col("is_pos")).select("aid", F.col("cosine").alias("pos_cos"))
    neg = best.where(~F.col("is_pos")).select("aid", F.col("cosine").alias("neg_cos"))
    trip = pos.join(neg, "aid")
    return trip.agg(
        F.count("*").alias("n_triplets"),
        F.sum(F.when(F.col("pos_cos") > F.col("neg_cos"), 1).otherwise(0)).alias(
            "n_correct"
        ),
    ).select(
        "n_triplets",
        "n_correct",
        F.round(
            F.when(
                F.col("n_triplets") > 0, F.col("n_correct") / F.col("n_triplets")
            ),
            6,
        ).alias("accuracy"),
    )


def triplet_accuracy_sql(table: str = "embeddings", n_buckets: int = 16) -> str:
    """DuckDB oracle for :func:`triplet_accuracy` — same bucket hash,
    same anchor-salted pick hash, same rounded-cosine verdict."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    bkt = md5_long_sql("CAST(vec_id AS VARCHAR)")
    pick = md5_long_sql(
        "(CAST(a.vec_id AS VARCHAR) || '#' || CAST(c.vec_id AS VARCHAR))"
    )
    dot = (
        "list_reduce(list_transform(range(1, len(a.v) + 1),"
        " i -> a.v[i] * c.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH ta_base AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             ((({bkt}) % {int(n_buckets)}) + {int(n_buckets)})
               % {int(n_buckets)} AS bucket
      FROM {table}
    ),
    ta_n AS MATERIALIZED (
      SELECT vec_id, label, v, bucket,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm
      FROM ta_base
    ),
    ta_sc AS (
      SELECT a.vec_id AS aid, (c.label = a.label) AS is_pos,
             {pick} AS pick,
             round({dot} / (a.norm * c.norm), 6) AS cosine
      FROM ta_n a JOIN ta_n c
        ON c.bucket = a.bucket AND c.vec_id <> a.vec_id
    ),
    ta_best AS (
      SELECT aid, is_pos, cosine FROM (
        SELECT aid, is_pos, cosine,
               row_number() OVER (PARTITION BY aid, is_pos
                                  ORDER BY pick, cosine) AS rk
        FROM ta_sc
      ) WHERE rk = 1
    ),
    ta_trip AS (
      SELECT p.aid, p.cosine AS pos_cos, n.cosine AS neg_cos
      FROM (SELECT aid, cosine FROM ta_best WHERE is_pos) p
      JOIN (SELECT aid, cosine FROM ta_best WHERE NOT is_pos) n
        ON n.aid = p.aid
    ),
    ta_agg AS (
      SELECT count(*) AS n_triplets,
             sum(CASE WHEN pos_cos > neg_cos THEN 1 ELSE 0 END) AS n_correct
      FROM ta_trip
    )
    SELECT n_triplets, n_correct,
           CASE WHEN n_triplets > 0
                THEN round(n_correct * 1.0 / n_triplets, 6) END AS accuracy
    FROM ta_agg
    """


def lsh_bucket_stats(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """→ ``[bucket_size, n_buckets, share_of_vectors]`` — the balance
    audit of the hyperplane LSH index every kNN operator here builds
    (:func:`lsh_knn` / :func:`mutual_knn` / :func:`knn_hubness`):
    occupied buckets histogrammed by population, with each row's share
    of all vectors. A healthy index is near-uniform (≈ n/2^planes per
    bucket); one mega-bucket means the hyperplanes don't split the data
    (anisotropic embeddings) and the "bucket-bounded" cost story of the
    candidate joins silently degrades toward all-pairs — this is the
    query to run BEFORE trusting them, the index-side complement of
    :func:`lsh_recall` (which audits result quality).

    Scale shape: the bucket id is a map-only projection; then one
    per-bucket count (≤ 2^planes groups) and a ≤ |distinct sizes|
    histogram with a share window over aggregated cells. No joins.
    """
    base = _with_norm(embeddings)
    bits = None
    for p in range(n_planes):
        bit = F.when(_proj(F.col("v"), p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    sizes = (
        base.select(bits.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("bucket_size"))
    )
    hist = sizes.groupBy("bucket_size").agg(F.count("*").alias("n_buckets"))
    w = Window.partitionBy()
    total = F.sum(F.col("bucket_size") * F.col("n_buckets")).over(w)
    return hist.select(
        "bucket_size",
        "n_buckets",
        F.round(
            F.col("bucket_size") * F.col("n_buckets") / total, 6
        ).alias("share_of_vectors"),
    )


def lsh_bucket_stats_sql(table: str = "embeddings", n_planes: int = N_PLANES) -> str:
    """DuckDB oracle for :func:`lsh_bucket_stats` — same bucket formula."""
    bucket = " + ".join(
        f"(CASE WHEN {_proj_sql(p)} > 0 THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"""
    WITH lb_base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ),
    lb_b AS (
      SELECT CAST({bucket} AS BIGINT) AS bucket FROM lb_base
    ),
    lb_sizes AS (
      SELECT bucket, count(*) AS bucket_size FROM lb_b GROUP BY bucket
    ),
    lb_h AS (
      SELECT bucket_size, count(*) AS n_buckets
      FROM lb_sizes GROUP BY bucket_size
    )
    SELECT bucket_size, n_buckets,
           round(bucket_size * n_buckets * 1.0 /
                 (sum(bucket_size * n_buckets) OVER ()), 6) AS share_of_vectors
    FROM lb_h
    """


def label_ch_index(embeddings: DataFrame) -> DataFrame:
    """→ one-row ``[n_vectors, n_labels, ch_index]`` — the
    Calinski–Harabasz pseudo-F of the label partition over the FULL
    vectors: CH = (SSB/(k−1)) / (SSW/(n−k)) with SSB = Σ_g n_g‖μ_g−μ‖²
    and SSW = Σ_i ‖v_i−μ_{g(i)}‖² (Calinski & Harabasz 1974). The
    variance-ratio label-separation score — the centroid-based
    complement of :func:`triplet_accuracy` (ranking view) and
    ``silhouette`` (margin view): CH ≈ 1 means the labels explain no
    geometry at all. NULL when k < 2, n ≤ k, or SSW = 0.

    Scale shape: one posexplode to (label, dim, val) cells, a
    (label, dim)-keyed mean agg (≤ k·D groups, map-side combinable), a
    D-keyed global mean agg, SSW via a broadcast join of the tiny
    centroid table back onto the cells, and two scalar reduces. No
    windows, nothing pairwise.
    """
    cells = embeddings.select(
        "label", F.posexplode(_as_double(F.col("embedding"))).alias("d", "x")
    )
    cent = cells.groupBy("label", "d").agg(
        F.avg("x").alias("c"), F.count("*").alias("n_g")
    )
    glob = cells.groupBy("d").agg(F.avg("x").alias("gc"))
    ssb = (
        cent.join(F.broadcast(glob), "d")
        .agg(
            F.sum(
                F.col("n_g") * (F.col("c") - F.col("gc")) * (F.col("c") - F.col("gc"))
            ).alias("ssb")
        )
    )
    ssw = (
        cells.join(F.broadcast(cent.select("label", "d", "c")), ["label", "d"])
        .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("ssw"))
    )
    sizes = embeddings.agg(
        F.count("*").alias("n"), F.countDistinct("label").alias("k")
    )
    return (
        sizes.join(F.broadcast(ssb), F.lit(True))
        .join(F.broadcast(ssw), F.lit(True))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("k").alias("n_labels"),
            F.round(
                F.when(
                    (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (F.col("ssw") > 0),
                    (F.col("ssb") / (F.col("k") - 1))
                    / (F.col("ssw") / (F.col("n") - F.col("k"))),
                ),
                6,
            ).alias("ch_index"),
        )
    )


def label_ch_index_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`label_ch_index` — same cell explode and
    centroid joins."""
    return f"""
    WITH ch_cells AS MATERIALIZED (
      SELECT label, unnest(range(len(v))) AS d, unnest(v) AS x
      FROM (SELECT label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM {table})
    ),
    ch_cent AS MATERIALIZED (
      SELECT label, d, avg(x) AS c, count(*) AS n_g
      FROM ch_cells GROUP BY label, d
    ),
    ch_glob AS (SELECT d, avg(x) AS gc FROM ch_cells GROUP BY d),
    ch_ssb AS (
      SELECT sum(n_g * (c - gc) * (c - gc)) AS ssb
      FROM ch_cent JOIN ch_glob USING (d)
    ),
    ch_ssw AS (
      SELECT sum((x - c) * (x - c)) AS ssw
      FROM ch_cells e JOIN ch_cent m ON m.label = e.label AND m.d = e.d
    ),
    ch_sz AS (
      SELECT count(*) AS n, count(DISTINCT label) AS k FROM {table}
    )
    SELECT n AS n_vectors, k AS n_labels,
           CASE WHEN k >= 2 AND n > k AND ssw > 0
                THEN round((ssb / (k - 1)) / (ssw / (n - k)), 6)
           END AS ch_index
    FROM ch_sz, ch_ssb, ch_ssw
    """


def davies_bouldin(embeddings: DataFrame) -> DataFrame:
    """→ one-row ``[n_labels, db_index]`` — the Davies–Bouldin index of
    the label partition (Davies & Bouldin 1979): with S_i the mean
    Euclidean distance of label i's members to their centroid and
    M_ij = ‖c_i − c_j‖, DB = (1/k)·Σ_i max_{j≠i} (S_i+S_j)/M_ij. Lower is
    better-separated; ~1 means clusters as wide as their gaps. The
    worst-pair complement to :func:`label_ch_index` (global variance
    ratio) and ``silhouette`` (per-point margins). NULL when k < 2 or any
    two centroids coincide (DB is infinite there).

    Scale shape: one posexplode to cells, a (label, dim) centroid
    aggregate (≤ k·D groups), per-vector distances via a broadcast join
    of the tiny centroid table + a vec_id re-aggregate, per-label S via
    one more agg, and a k²-row centroid self-join that never touches the
    data again. No windows over raw rows, nothing pairwise on vectors.

    S and M are rounded to 9 dp before the ratio so the engine and the
    DuckDB oracle agree bit-for-bit despite float summation order.
    """
    cells = embeddings.select(
        "vec_id", "label", F.posexplode(_as_double(F.col("embedding"))).alias("d", "x")
    )
    cent = cells.groupBy("label", "d").agg(F.avg("x").alias("c"))
    # per-member distance to own centroid, then per-label mean scatter S_i
    dist = (
        cells.join(F.broadcast(cent), ["label", "d"])
        .groupBy("label", "vec_id")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))).alias("dd"))
    )
    s = dist.groupBy("label").agg(F.round(F.avg("dd"), 9).alias("s"))
    # k^2 centroid separation matrix (tiny: k labels)
    ci = cent.select(F.col("label").alias("li"), "d", F.col("c").alias("cci"))
    cj = cent.select(F.col("label").alias("lj"), "d", F.col("c").alias("ccj"))
    m = (
        ci.join(cj, "d")
        .where(F.col("li") != F.col("lj"))
        .groupBy("li", "lj")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("cci") - F.col("ccj")) * (F.col("cci") - F.col("ccj")))),
                9,
            ).alias("m")
        )
    )
    r = (
        m.join(s.select(F.col("label").alias("li"), F.col("s").alias("si")), "li")
        .join(s.select(F.col("label").alias("lj"), F.col("s").alias("sj")), "lj")
        .groupBy("li")
        .agg(
            F.max(
                F.when(F.col("m") > 0, (F.col("si") + F.col("sj")) / F.col("m"))
            ).alias("r_max"),
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("n_zero"),
        )
    )
    # k comes from the label universe, not the pair table (k<2 -> no pairs)
    return r.agg(
        F.avg("r_max").alias("_db"),
        F.sum("n_zero").alias("_nz"),
    ).join(
        F.broadcast(embeddings.agg(F.countDistinct("label").alias("n_labels"))),
        F.lit(True),
    ).select(
        "n_labels",
        F.round(
            F.when((F.col("n_labels") >= 2) & (F.col("_nz") == 0), F.col("_db")),
            6,
        ).alias("db_index"),
    )


def davies_bouldin_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`davies_bouldin` — same 9-dp-rounded S/M."""
    return f"""
    WITH db_cells AS MATERIALIZED (
      SELECT vec_id, label, unnest(range(len(v))) AS d, unnest(v) AS x
      FROM (SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM {table})
    ),
    db_cent AS MATERIALIZED (
      SELECT label, d, avg(x) AS c FROM db_cells GROUP BY label, d
    ),
    db_dist AS (
      SELECT e.label, e.vec_id, sqrt(sum((e.x - m.c) * (e.x - m.c))) AS dd
      FROM db_cells e JOIN db_cent m ON m.label = e.label AND m.d = e.d
      GROUP BY e.label, e.vec_id
    ),
    db_s AS (SELECT label, round(avg(dd), 9) AS s FROM db_dist GROUP BY label),
    db_m AS (
      SELECT a.label AS li, b.label AS lj,
             round(sqrt(sum((a.c - b.c) * (a.c - b.c))), 9) AS m
      FROM db_cent a JOIN db_cent b ON a.d = b.d AND a.label <> b.label
      GROUP BY a.label, b.label
    ),
    db_r AS (
      SELECT m.li,
             max(CASE WHEN m.m > 0 THEN (si.s + sj.s) / m.m END) AS r_max,
             sum(CASE WHEN m.m = 0 THEN 1 ELSE 0 END) AS n_zero
      FROM db_m m
      JOIN db_s si ON si.label = m.li
      JOIN db_s sj ON sj.label = m.lj
      GROUP BY m.li
    ),
    db_agg AS (
      SELECT avg(r_max) AS db, sum(n_zero) AS nz FROM db_r
    ),
    db_k AS (SELECT count(DISTINCT label) AS n_labels FROM {table})
    SELECT n_labels,
           CASE WHEN n_labels >= 2 AND coalesce(nz, 0) = 0
                THEN round(db, 6) END AS db_index
    FROM db_k, db_agg
    """


def intrinsic_dim(embeddings: DataFrame, n_queries: int = 64) -> DataFrame:
    """→ one-row ``[n_used, intrinsic_dim]`` — the Two-NN maximum-
    likelihood intrinsic-dimension estimate (Facco et al., Scientific
    Reports 2017): for each probe point, μ = r₂/r₁ (distance ratio of
    its two nearest neighbors); the MLE is d = n / Σ ln μ. Embeddings
    that fill only a low-dimensional manifold of their ambient space
    answer "how many PCA dims / how aggressive a matryoshka truncation
    is safe" — the geometric complement of :func:`dim_variance` (axis
    view) and :func:`rp_distortion` (projection view).

    Estimated over a deterministic md5-ordered probe sample, never
    all-pairs: each probe scans the corpus once via a broadcast join
    (the :func:`cosine_topk` shape), so cost is O(n_queries · N).
    Probes with r₁ = 0 (exact duplicates) are excluded per the paper;
    NULL when Σ ln μ ≤ 0 (all ratios 1 — a lattice or duplicate set).

    Distances are rounded to 9 dp before ranking and the ratio, so the
    engine and oracle agree despite float summation order.
    """
    base = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    q = (
        base.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(q)
        .join(base, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(F.sqrt(d2), 9).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    r12 = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .groupBy("query_id")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("dist"))).alias("r1"),
            F.min(F.when(F.col("rk") == 2, F.col("dist"))).alias("r2"),
        )
        .where((F.col("r1") > 0) & F.col("r2").isNotNull())
    )
    return r12.agg(
        F.count("*").alias("n_used"),
        F.sum(F.log(F.col("r2") / F.col("r1"))).alias("_sl"),
    ).select(
        "n_used",
        F.round(
            F.when(F.col("_sl") > 0, F.col("n_used") / F.col("_sl")), 6
        ).alias("intrinsic_dim"),
    )


def intrinsic_dim_sql(table: str = "embeddings", n_queries: int = 64) -> str:
    """DuckDB oracle for :func:`intrinsic_dim` — same probe sample,
    9-dp-rounded distances, and MLE."""
    return f"""
    WITH id_base AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ),
    id_q AS (
      SELECT vec_id AS query_id, v AS qv FROM id_base
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {int(n_queries)}
    ),
    id_scored AS (
      SELECT q.query_id, b.vec_id,
             round(sqrt(list_reduce(list_transform(range(1, len(q.qv) + 1),
                   i -> (q.qv[i] - b.v[i]) * (q.qv[i] - b.v[i])),
                   (x, y) -> x + y)), 9) AS dist
      FROM id_q q JOIN id_base b ON b.vec_id <> q.query_id
    ),
    id_r12 AS (
      SELECT query_id,
             min(CASE WHEN rk = 1 THEN dist END) AS r1,
             min(CASE WHEN rk = 2 THEN dist END) AS r2
      FROM (
        SELECT query_id, dist,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist ASC, vec_id ASC) AS rk
        FROM id_scored
      ) WHERE rk <= 2
      GROUP BY query_id
      HAVING min(CASE WHEN rk = 1 THEN dist END) > 0
         AND min(CASE WHEN rk = 2 THEN dist END) IS NOT NULL
    )
    SELECT count(*) AS n_used,
           CASE WHEN sum(ln(r2 / r1)) > 0
                THEN round(count(*) / sum(ln(r2 / r1)), 6) END AS intrinsic_dim
    FROM id_r12
    """


def pair_cosine_hist(embeddings: DataFrame, n_sample: int = 128) -> DataFrame:
    """→ ``[bucket_lo, n_pairs, share]`` — the corpus's pairwise-cosine
    distribution, histogrammed at 0.1 resolution over a deterministic
    md5-ordered sample of ``n_sample`` vectors (all C(n,2) pairs among
    the sample, never the corpus). The one-glance "how similar is this
    embedding space to itself" diagnostic: a mass near 1.0 predicts
    near-dup blowup and anisotropy; a clean unimodal bump near 0 is a
    healthy isotropic space. Pairs with a zero-norm side are skipped.

    Scale shape: a TakeOrdered sample (bounded by n_sample at any corpus
    size), one broadcast self-join of the tiny sample (≤ n_sample² rows),
    a map-side histogram agg. The corpus itself is scanned exactly once.
    Cosines are rounded to 9 dp before bucketing; bucket 0.9 includes 1.0.
    """
    base = _with_norm(embeddings).where(F.col("norm") > 0)
    s = (
        base.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_sample)
    )
    a = s.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = s.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 9)
    pairs = (
        F.broadcast(a)
        .join(b, F.col("ia") < F.col("ib"))
        .select(F.least(F.floor(cos * 10).cast("long"), F.lit(9)).alias("_b"))
    )
    total = F.sum("n_pairs").over(Window.partitionBy())
    return (
        pairs.groupBy("_b")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            (F.col("_b") / 10.0).alias("bucket_lo"),
            "n_pairs",
            F.round(F.col("n_pairs") / total, 6).alias("share"),
        )
    )


def pair_cosine_hist_sql(table: str = "embeddings", n_sample: int = 128) -> str:
    """DuckDB oracle for :func:`pair_cosine_hist` — same sample, rounding
    and clamp."""
    dot = (
        "list_reduce(list_transform(range(1, len(a.v) + 1),"
        " i -> a.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH pch_base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ),
    pch_n AS MATERIALIZED (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm
      FROM pch_base
    ),
    pch_s AS MATERIALIZED (
      SELECT * FROM pch_n WHERE norm > 0
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {int(n_sample)}
    ),
    pch_p AS (
      SELECT least(CAST(floor(round({dot} / (a.norm * b.norm), 9) * 10)
                   AS BIGINT), 9) AS b
      FROM pch_s a JOIN pch_s b ON a.vec_id < b.vec_id
    ),
    pch_c AS (SELECT b, count(*) AS n_pairs FROM pch_p GROUP BY b)
    SELECT b / 10.0 AS bucket_lo, n_pairs,
           round(n_pairs * 1.0 / (sum(n_pairs) OVER ()), 6) AS share
    FROM pch_c
    """


# --------------------------------------------------------------- wave 128
def mmr_rerank(
    embeddings: DataFrame,
    k: int = 5,
    n_candidates: int = 30,
    lam: float = 0.7,
) -> DataFrame:
    """→ [rk, vec_id, relevance, mmr_score] — Maximal Marginal
    Relevance reranking (Carbonell & Goldstein, SIGIR 1998): greedily
    pick ``k`` results that are relevant to the query but diverse
    among themselves, score(v) = λ·rel(v) − (1−λ)·max_{s∈picked}
    sim(v,s). The retrieval post-processor that turns "5 near-copies
    of the best hit" into a useful answer set; the query is the vector
    with the smallest vec_id (deterministic stand-in for an external
    query embedding).

    Determinism: every cosine (query-relevance AND candidate-pair
    similarity) is ROUNDED to 6 dp before any comparison (the
    :func:`cosine_topk` convention — index-ordered double
    accumulation, engine-identical); the MMR score combines two
    rounded numbers with literal λ weights and is itself rounded
    before the argmax, vec_id asc breaking ties — so the greedy pick
    sequence cannot diverge engines. The first pick maximizes λ·rel
    (max-sim to the empty set is 0, the standard convention).

    Scale shape: one broadcast query-vs-all scan (map-only) feeds a
    TakeOrdered(n_candidates); the greedy loop then runs k − 1 joins
    on the BOUNDED candidate frame (n_candidates² pair sims at most) —
    nothing iterative ever touches the full table. The oracle unrolls
    the same k steps as a CTE chain (house round-exact convention).

    Reference parity: no ANN surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    kk, nc, lm = int(k), int(n_candidates), float(lam)
    base = _with_norm(embeddings)
    q = (
        base.orderBy(F.asc("vec_id"))
        .limit(1)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    rel = F.round(
        _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")), 6
    )
    cand = (
        F.broadcast(q)
        .crossJoin(base)
        .where(F.col("vec_id") != F.col("qid"))
        .select("vec_id", rel.alias("rel"), "v", "norm")
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(nc)
    )
    ca = cand.select(
        F.col("vec_id").alias("ia"), F.col("rel").alias("rel_a"),
        F.col("v").alias("va"), F.col("norm").alias("na"),
    )
    cb = cand.select(
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"), F.col("norm").alias("nb"),
    )
    sims = ca.join(cb, F.col("ia") != F.col("ib")).select(
        "ia",
        "ib",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
        ).alias("sim"),
    )
    state = cand.select(
        "vec_id", "rel", F.lit(0.0).alias("maxsim")
    ).localCheckpoint()
    sims = sims.localCheckpoint()
    picks = []
    for i in range(1, kk + 1):
        score = F.round(
            F.lit(lm) * F.col("rel") - F.lit(1.0 - lm) * F.col("maxsim"), 6
        )
        pick = (
            state.select("vec_id", "rel", score.alias("mmr_score"))
            .orderBy(F.desc("mmr_score"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.lit(i).alias("rk"),
                "vec_id",
                F.col("rel").alias("relevance"),
                "mmr_score",
            )
            .localCheckpoint()
        )
        picks.append(pick)
        pid = pick.select(F.col("vec_id").alias("pid"))
        state = (
            state.join(F.broadcast(pid), state.vec_id == F.col("pid"), "left_anti")
            .join(
                F.broadcast(
                    pick.select(F.col("vec_id").alias("ib")).join(
                        sims, "ib"
                    ).select("ia", F.col("sim").alias("new_sim"))
                ),
                state.vec_id == F.col("ia"),
                "left",
            )
            .select(
                "vec_id",
                "rel",
                F.greatest(
                    F.col("maxsim"), F.coalesce(F.col("new_sim"), F.lit(0.0))
                ).alias("maxsim"),
            )
            .localCheckpoint()
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.orderBy("rk")


def mmr_rerank_sql(
    table: str = "embeddings",
    k: int = 5,
    n_candidates: int = 30,
    lam: float = 0.7,
) -> str:
    """DuckDB oracle for :func:`mmr_rerank` — the same greedy sequence
    unrolled as a k-step CTE chain over rounded cosines."""
    kk, nc, lm = int(k), int(n_candidates), float(lam)
    dot_qb = (
        "list_reduce(list_transform(range(1, len(q.v) + 1),"
        " i -> q.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    dot_ab = (
        "list_reduce(list_transform(range(1, len(a.v) + 1),"
        " i -> a.v[i] * b.v[i]), (x, y) -> x + y)"
    )
    ctes = [
        f"""mmr_base AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), mmr_n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(range(1, len(v) + 1),
                  i -> v[i] * v[i]), (x, y) -> x + y)) AS norm
      FROM mmr_base
    ), mmr_q AS (
      SELECT vec_id AS qid, v, norm FROM mmr_n
      ORDER BY vec_id ASC LIMIT 1
    ), mmr_cand AS (
      SELECT b.vec_id, round({dot_qb} / (q.norm * b.norm), 6) AS rel,
             b.v, b.norm
      FROM mmr_q q JOIN mmr_n b ON b.vec_id <> q.qid
      ORDER BY rel DESC, b.vec_id ASC LIMIT {nc}
    ), mmr_sims AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round({dot_ab} / (a.norm * b.norm), 6) AS sim
      FROM mmr_cand a JOIN mmr_cand b ON a.vec_id <> b.vec_id
    ), mmr_s0 AS (
      SELECT vec_id, rel, 0.0 AS maxsim FROM mmr_cand
    )"""
    ]
    for i in range(1, kk + 1):
        prev = f"mmr_s{i - 1}"
        ctes.append(f"""mmr_p{i} AS (
      SELECT {i} AS rk, vec_id, rel AS relevance,
             round({lm!r} * rel - {1.0 - lm!r} * maxsim, 6) AS mmr_score
      FROM {prev}
      ORDER BY round({lm!r} * rel - {1.0 - lm!r} * maxsim, 6) DESC,
               vec_id ASC
      LIMIT 1
    )""")
        if i < kk:
            ctes.append(f"""mmr_s{i} AS (
      SELECT s.vec_id, s.rel,
             greatest(s.maxsim, coalesce(m.sim, 0.0)) AS maxsim
      FROM {prev} s
      LEFT JOIN mmr_sims m
        ON m.ia = s.vec_id AND m.ib = (SELECT vec_id FROM mmr_p{i})
      WHERE s.vec_id <> (SELECT vec_id FROM mmr_p{i})
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT rk, vec_id, relevance, mmr_score FROM mmr_p{i}"
        for i in range(1, kk + 1)
    )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"\n    {unions}\n    ORDER BY rk\n    "
    )
