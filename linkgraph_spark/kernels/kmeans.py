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
aggregate — the assignment embeds the k·D-float codebook as literals and
takes ``array_min`` over (sqd, cluster) structs, a pure projection with
ZERO shuffle of the vector table (the expression-level analogue of
broadcasting the codebook; at k·D beyond literal-expression comfort,
~10⁵, swap in a broadcast join — same semantics). The centroid update
pos-explodes to ``(cluster, pos)`` keys whose partial aggregates are
k·D cells per task, so the shuffle carries O(k·D·partitions) rows, not
O(N·D). Driver state is the k·D-float codebook (KB–MB — the canonical
broadcast-table size); there is no O(N) collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _base(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def _sqdist(vcol, ccol):
    diff2 = F.zip_with(vcol, ccol, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def _assign(base: DataFrame, cents: list) -> DataFrame:
    """→ [vec_id, v, cluster, sqd] — nearest centroid per vector (squared
    L2, ties by cluster asc). The codebook ships as k ARRAY LITERALS (data
    in the plan, not a k·D expression tree — keeps codegen small) and the
    argmin is ``array_min`` over (sqd, index) structs — a pure PROJECTION:
    no join, no window, ZERO shuffle of the vector table (the
    expression-level analogue of broadcasting the codebook)."""
    # init pins cluster ids to 0..k-1, so the codebook position IS the id
    assert [c for c, _ in cents] == list(range(len(cents)))
    codebook = F.array(*[F.lit([float(x) for x in cv]) for _, cv in cents])
    structs = F.transform(
        codebook,
        lambda cv, i: F.struct(
            _sqdist(F.col("v"), cv).alias("sqd"), i.cast("int").alias("cluster")
        ),
    )
    best = F.array_min(structs)
    return base.select(
        "vec_id", "v", best["cluster"].alias("cluster"), best["sqd"].alias("sqd")
    )


def _lloyd_centroids(base: DataFrame, k: int, iterations: int) -> list:
    """Run ``iterations`` Lloyd updates; → [(cluster, [float, ...])] final
    codebook. Each iteration is one Spark job (the k·D-cell mean agg);
    the codebook round-trips through the driver as k·D floats only."""
    init = base.where(F.col("vec_id") < k).collect()
    if len(init) < k:
        raise ValueError(
            f"k-means init needs vectors with vec_id 0..{k - 1}; found {len(init)}"
        )
    cents = {int(r["vec_id"]): [float(x) for x in r["v"]] for r in init}
    for _ in range(iterations):
        means = (
            _assign(base, sorted(cents.items()))
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
    # checkpoint, and at scale it re-plans as one map-only pass
    return _assign(_base(embeddings), cents).select(
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
    return (
        _assign(_base(embeddings), cents)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.sum("sqd"), 3).alias("inertia"),
        )
    )


def silhouette(embeddings: DataFrame, k: int = 8, iterations: int = 4) -> DataFrame:
    """→ ``[cluster, n_members, mean_silhouette]`` — simplified
    (centroid-based) silhouette for the same deterministic Lloyd run as
    :func:`kmeans`: per point, ``a`` = euclidean distance to its own
    centroid, ``b`` = distance to the nearest OTHER centroid, and
    ``s = (b - a) / max(a, b)`` (0 when both are 0). The per-cluster mean
    is the standard "is k right / which clusters are mushy" diagnostic —
    O(N·k) instead of the O(N²) full silhouette, the variant every
    large-scale library ships (sklearn calls it Davies-Bouldin-adjacent;
    Spark MLlib's ClusteringEvaluator computes exactly this squared form).

    Determinism: distances reuse the in-order fold of :func:`kmeans`
    (bitwise identical across engines on the 9dp-rounded centroids);
    per-point ``s`` is rounded to 9 before the mean collapses
    summation-order noise, the mean to 6.

    Scale shape: identical to the assignment pass — the codebook rides as
    array literals, best/second-best is an ``array_sort`` head over k
    (sqd, cluster) structs, a pure projection with ZERO shuffle; the only
    shuffle is the k-group final aggregate (map-side combinable).
    """
    if k < 2:
        raise ValueError("silhouette needs k >= 2 (no 'other centroid' at k=1)")
    base = _base(embeddings).persist()
    try:
        cents = _lloyd_centroids(base, k, iterations)
    finally:
        base.unpersist()
    assert [c for c, _ in cents] == list(range(len(cents)))
    codebook = F.array(*[F.lit([float(x) for x in cv]) for _, cv in cents])
    structs = F.transform(
        codebook,
        lambda cv, i: F.struct(
            _sqdist(F.col("v"), cv).alias("sqd"), i.cast("int").alias("cluster")
        ),
    )
    two = F.slice(F.array_sort(structs), 1, 2)  # (sqd asc, cluster asc)
    a = F.sqrt(F.element_at(two, 1)["sqd"])
    b = F.sqrt(F.element_at(two, 2)["sqd"])
    s = F.when(F.greatest(a, b) == 0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    pts = _base(embeddings).select(
        F.element_at(two, 1)["cluster"].alias("cluster"),
        F.round(s, 9).alias("s"),
    )
    return pts.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("s"), 6).alias("mean_silhouette"),
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


def silhouette_sql(table: str = "embeddings", k: int = 8, iterations: int = 4) -> str:
    """DuckDB oracle for :func:`silhouette` — the same unrolled Lloyd CTEs
    plus a rn<=2 ranking for (own, nearest-other) centroid distances."""
    return f"""
    {_kmeans_ctes(table, k, iterations)},
    sil_two AS (
      SELECT vec_id, cluster, sqd, rn FROM (
        SELECT b.vec_id, c.cluster, {_sq_sql('b', 'c')} AS sqd,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY {_sq_sql('b', 'c')} ASC, c.cluster ASC) AS rn
        FROM base b CROSS JOIN cents{iterations} c)
      WHERE rn <= 2
    ), sil_pts AS (
      SELECT own.cluster,
             round(CASE WHEN greatest(sqrt(own.sqd), sqrt(oth.sqd)) = 0
                        THEN 0.0
                        ELSE (sqrt(oth.sqd) - sqrt(own.sqd))
                             / greatest(sqrt(own.sqd), sqrt(oth.sqd)) END,
                   9) AS s
      FROM (SELECT * FROM sil_two WHERE rn = 1) own
      JOIN (SELECT * FROM sil_two WHERE rn = 2) oth USING (vec_id)
    )
    SELECT cluster, count(*) AS n_members,
           round(avg(s), 6) AS mean_silhouette
    FROM sil_pts GROUP BY cluster
    """


def pq_codes(
    embeddings: DataFrame, subvectors: int = 2, k: int = 8, iterations: int = 2
) -> DataFrame:
    """→ [vec_id, sub, code] — PRODUCT QUANTIZATION codes: the embedding
    is split into ``subvectors`` contiguous slices and each slice is
    assigned to its own ``k``-centroid deterministic-Lloyd codebook
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011 — the workhorse of every 100 TB-scale ANN index: m
    sub-codes of log2(k) bits replace the fp32 vector, here 2×3 bits per
    64-float vector). Same determinism contract as :func:`kmeans`
    (init = vec_id<k slice, 9dp-rounded means, ties by cluster asc), so
    the oracle replays every sub-codebook exactly.

    Scale shape: per subvector, the :func:`kmeans` plan on a SLICED
    (narrower) vector — zero-shuffle literal-codebook assignment, k·D/m
    cell mean aggregates; the final union is plan-level only. Driver
    state: m codebooks of k·(D/m) floats.
    """
    head = embeddings.select(F.size("embedding").alias("d")).head()
    if head is None:
        raise ValueError("pq_codes needs a non-empty embeddings frame")
    dims = int(head["d"])
    if dims % subvectors != 0:
        raise ValueError(f"dims {dims} not divisible by {subvectors} subvectors")
    width = dims // subvectors
    outs = []
    for s in range(subvectors):
        sub = embeddings.select(
            "vec_id", F.slice("embedding", s * width + 1, width).alias("embedding")
        )
        base = _base(sub).persist()
        try:
            cents = _lloyd_centroids(base, k, iterations)
        finally:
            base.unpersist()
        outs.append(
            _assign(_base(sub), cents).select(
                "vec_id",
                F.lit(s).cast("int").alias("sub"),
                F.col("cluster").alias("code"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def pq_codes_sql(
    table: str = "embeddings",
    subvectors: int = 2,
    k: int = 8,
    iterations: int = 2,
    dims: int = 64,
) -> str:
    """DuckDB oracle for :func:`pq_codes` — one unrolled Lloyd chain per
    subvector slice, unioned (each chain lives in its own subquery scope,
    so the fixed CTE names don't collide)."""
    width = dims // subvectors
    parts = []
    for s in range(subvectors):
        sub = (
            f"(SELECT vec_id, embedding[{s * width + 1}:{(s + 1) * width}]"
            f" AS embedding FROM {table})"
        )
        parts.append(
            f"SELECT vec_id, {s} AS sub, cluster AS code FROM (\n"
            f"{_kmeans_ctes(sub, k, iterations)}\n"
            f"    SELECT vec_id, cluster FROM kfinal)"
        )
    return "\n    UNION ALL\n    ".join(parts)


def kcenter(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """→ ``[center_rank, vec_id, dist2]`` — greedy farthest-point k-center
    selection (Gonzalez 1985, the 2-approximation): start from the min
    ``vec_id``, then repeatedly pick the vector farthest (squared L2) from
    everything already selected. The selection IS a diversity coreset —
    the data-curation pass that picks maximally-spread exemplars for
    labeling/eval — and ``dist2`` at each rank is the coverage radius²
    the selection guarantees at that budget (the marginal-value curve:
    stop adding centers when it flattens).

    Deterministic: distances are rounded to 9 dp before the argmax
    (snapping cross-engine FP wobble) with ties broken by min ``vec_id``;
    the first center's dist2 is 0.0.

    Scale shape: the selected set lives driver-side (k·D floats, the
    kmeans codebook convention); each round is ONE projection over the
    vector table (min over ≤k literal-array distances — no join, no
    shuffle) plus a TakeOrdered(1) argmax. k rounds total, O(k·N·D) work.
    """
    if k < 1:
        raise ValueError(f"kcenter: k must be >= 1, got {k}")
    base = _base(embeddings).persist()
    first = base.orderBy("vec_id").limit(1).collect()
    if not first:
        base.unpersist()
        raise ValueError("kcenter: empty embeddings table")
    sel_ids = [int(first[0]["vec_id"])]
    sel_vecs = [[float(x) for x in first[0]["v"]]]
    rows = [(1, sel_ids[0], 0.0)]
    for r in range(2, k + 1):
        codebook = F.array(*[F.lit(cv) for cv in sel_vecs])
        dists = F.transform(codebook, lambda cv: _sqdist(F.col("v"), cv))
        d2 = F.round(F.array_min(dists), 9)
        far = (
            base.where(~F.col("vec_id").isin(sel_ids))
            .select("vec_id", "v", d2.alias("d2"))
            .orderBy(F.desc("d2"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not far:
            break  # fewer than k vectors
        sel_ids.append(int(far[0]["vec_id"]))
        sel_vecs.append([float(x) for x in far[0]["v"]])
        rows.append((r, sel_ids[-1], float(far[0]["d2"])))
    base.unpersist()
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        rows, "center_rank long, vec_id long, dist2 double"
    )


def kcenter_sql(table: str = "embeddings", k: int = 8) -> str:
    """DuckDB oracle for :func:`kcenter` (standalone query): the greedy
    selection unrolled — each round joins the running selected set
    relationally instead of shipping literals, same rounded argmax."""
    if k < 1:
        raise ValueError(f"kcenter_sql: k must be >= 1, got {k}")
    sqd = (
        "list_reduce(list_transform(range(1, len(b.v) + 1),"
        " i -> (b.v[i] - c.v[i]) * (b.v[i] - c.v[i])), (x, y) -> x + y)"
    )
    ctes = [
        f"""kc_b AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    )""",
        """kc_s1 AS (
      SELECT 1 AS center_rank, vec_id, 0.0 AS dist2 FROM kc_b
      ORDER BY vec_id LIMIT 1
    )""",
        "kc_sel1 AS (SELECT center_rank, vec_id, dist2 FROM kc_s1)",
    ]
    for r in range(2, k + 1):
        ctes.append(
            f"""kc_d{r} AS MATERIALIZED (
      SELECT b.vec_id, round(min({sqd}), 9) AS d2
      FROM kc_b b
      JOIN kc_sel{r - 1} s ON TRUE
      JOIN kc_b c ON c.vec_id = s.vec_id
      WHERE b.vec_id NOT IN (SELECT vec_id FROM kc_sel{r - 1})
      GROUP BY b.vec_id
    )"""
        )
        ctes.append(
            f"""kc_s{r} AS MATERIALIZED (
      SELECT {r} AS center_rank, vec_id, d2 AS dist2 FROM kc_d{r}
      ORDER BY d2 DESC, vec_id LIMIT 1
    )"""
        )
        ctes.append(
            f"""kc_sel{r} AS MATERIALIZED (
      SELECT * FROM kc_sel{r - 1} UNION ALL SELECT * FROM kc_s{r}
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT center_rank, vec_id, dist2 FROM kc_sel{k}
    """


def elbow_curve(
    embeddings: DataFrame, ks: tuple = (2, 4, 8), iterations: int = 4
) -> DataFrame:
    """→ ``[k, inertia]`` — the k-means elbow curve: total within-cluster
    sum of squared distances after the deterministic Lloyd run, one row
    per requested ``k``. The capacity-choice chart behind every "why
    k=8?" — the elbow (marginal inertia gain collapsing) is where extra
    centroids stop buying structure, and a curve with NO elbow says the
    corpus has no cluster granularity at these scales (consistent with
    a flat :func:`~linkgraph_spark.kernels.pca.pca_power` spectrum).
    Each run uses the same deterministic init (centroid j = vec_id j),
    so the curve is reproducible and engine-portable.

    Scale shape: |ks| independent Lloyd chains — each one literal-
    codebook map-only assignment + a k-cell aggregate per iteration
    (the :func:`kmeans` shape); the curve itself is |ks| rows.
    """
    if not ks or any(int(k) < 1 for k in ks):
        raise ValueError(f"ks must be positive ints, got {ks!r}")
    out = None
    for k in sorted(int(k) for k in ks):
        prof = kmeans_profile(embeddings, k=k, iterations=iterations)
        one = prof.agg(
            F.round(F.sum("inertia"), 3).alias("inertia")
        ).select(F.lit(k).alias("k"), "inertia")
        out = one if out is None else out.unionAll(one)
    return out


def elbow_curve_sql(
    table: str = "embeddings", ks: tuple = (2, 4, 8), iterations: int = 4
) -> str:
    """DuckDB oracle for :func:`elbow_curve` — one unrolled Lloyd chain
    per k, unioned."""
    parts = [
        f"""SELECT {int(k)} AS k, round(sum(inertia), 3) AS inertia FROM (
      {kmeans_profile_sql(table, k=int(k), iterations=iterations)}
    )"""
        for k in sorted(int(k) for k in ks)
    ]
    return "\n    UNION ALL ".join(parts)


def pq_distortion(
    embeddings: DataFrame, subvectors: int = 2, k: int = 8, iterations: int = 2
) -> DataFrame:
    """→ one-row ``[n_vectors, subvectors, total_sq, mse_per_dim]`` —
    the product-quantization reconstruction audit: total squared error
    of the :func:`pq_codes` codebooks (sum over every vector's slices of
    its distance² to the assigned sub-centroid) and the per-dimension
    MSE. The PQ twin of
    :func:`~linkgraph_spark.functions.similarity.embedding_quantize`'s
    scalar-quantization columns — together they price the two standard
    compression choices on the same corpus, BEFORE
    :func:`~linkgraph_spark.functions.similarity.quantize_recall`
    prices the retrieval impact. Per-slice sqd is rounded to 6dp (the
    :func:`kmeans` output contract) so both engines aggregate identical
    cells.

    Scale shape: per subvector the zero-shuffle literal-codebook
    assignment; the audit adds one global aggregate over the
    (vector × subvector) sqd cells.
    """
    head = embeddings.select(F.size("embedding").alias("d")).head()
    if head is None:
        raise ValueError("pq_distortion needs a non-empty embeddings frame")
    dims = int(head["d"])
    if dims % subvectors != 0:
        raise ValueError(f"dims {dims} not divisible by {subvectors} subvectors")
    width = dims // subvectors
    outs = []
    for s in range(subvectors):
        sub = embeddings.select(
            "vec_id", F.slice("embedding", s * width + 1, width).alias("embedding")
        )
        base = _base(sub).persist()
        try:
            cents = _lloyd_centroids(base, k, iterations)
        finally:
            base.unpersist()
        outs.append(
            _assign(_base(sub), cents).select(F.round("sqd", 6).alias("sqd"))
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.agg(
        (F.count("*") / subvectors).cast("long").alias("n_vectors"),
        F.lit(int(subvectors)).alias("subvectors"),
        F.round(F.sum("sqd"), 3).alias("total_sq"),
        F.round(F.sum("sqd") / (F.count("*") / subvectors) / dims, 9).alias(
            "mse_per_dim"
        ),
    )


def pq_distortion_sql(
    table: str = "embeddings",
    subvectors: int = 2,
    k: int = 8,
    iterations: int = 2,
    dims: int = 64,
) -> str:
    """DuckDB oracle for :func:`pq_distortion` — the per-slice unrolled
    chains of :func:`pq_codes_sql` with the sqd column kept."""
    width = dims // subvectors
    parts = []
    for s in range(subvectors):
        sub = (
            f"(SELECT vec_id, embedding[{s * width + 1}:{(s + 1) * width}]"
            f" AS embedding FROM {table})"
        )
        parts.append(
            f"SELECT round(sqd, 6) AS sqd FROM (\n"
            f"{_kmeans_ctes(sub, k, iterations)}\n"
            f"    SELECT sqd FROM kfinal)"
        )
    union = "\n    UNION ALL\n    ".join(parts)
    return f"""
    WITH pqd AS (
      {union}
    )
    SELECT CAST(count(*) / {int(subvectors)} AS BIGINT) AS n_vectors,
           {int(subvectors)} AS subvectors,
           round(sum(sqd), 3) AS total_sq,
           round(sum(sqd) / (count(*) / {int(subvectors)}) / {int(dims)}, 9)
             AS mse_per_dim
    FROM pqd
    """
