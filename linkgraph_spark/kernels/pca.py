"""Top principal component of the embedding table via power iteration —
the covariance-spectrum probe of the corpus's embedding space (anisotropy
check, whitening direction, the first step of any spectral diagnostic on
a representation model's output).

Reference provenance: no vector analytics exist in the reference (its
state is the rank table, ``pagerank_lambda/dynamodb/pagerank.py:51-99``);
engine addition for the training-data tier, sharing
``kernels/kmeans.py``'s determinism discipline.

Determinism contract (what makes the SQL oracle replay exactly):

- data is mean-centered; the per-dimension mean is rounded to 9 decimals
  in-engine (both Spark ``F.round`` and DuckDB ``round``);
- the start vector is the CENTERED vector of ``vec_id == 0``, L2
  normalized, components rounded to 9;
- each iteration computes ``w = Σ_i (x_i·v) x_i`` (components rounded to
  9), then normalizes ``v ← w/‖w‖`` (rounded to 9) — the rounding
  collapses summation-order ulp noise so both engines iterate the same
  vector;
- the returned eigenvalue is the Rayleigh quotient ``Σ_i (x_i·v)²`` of
  the final unit vector, rounded to 3.

Scale shape (100 TB lens): per iteration ONE map-side-combine hash
aggregate — the dot products are a map-only projection against the
D-float literal direction vector, and the ``w`` accumulation
pos-explodes to D keys whose partial aggregates are D cells per task
(shuffle carries O(D·partitions) rows, not O(N·D)). Driver state is two
D-float vectors; there is no O(N) collect anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _centered(embeddings: DataFrame, mu: list) -> DataFrame:
    """→ [vec_id, cx] — double-cast, mean-centered vectors (mean as a
    D-float array literal: map-only)."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    return embeddings.select(
        "vec_id", F.zip_with(v, F.lit(mu), lambda x, m: x - m).alias("cx")
    )


def _dot_lit(col, vec: list):
    return F.aggregate(
        F.zip_with(col, F.lit(vec), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _unit(w: list) -> list:
    nrm = math.sqrt(sum(x * x for x in w))
    if nrm == 0.0:
        raise ValueError("power iteration collapsed to the zero vector")
    return [float(x) for x in _round9_div(w, nrm)]


def _round9_div(w: list, nrm: float) -> list:
    # mirrors SQL round(w / norm, 9): IEEE division then decimal rounding
    return [round(x / nrm, 9) for x in w]


def pca_power(embeddings: DataFrame, iterations: int = 8) -> DataFrame:
    """→ ``[pos, loading, eigenvalue]`` — the top principal direction
    (one row per dimension, loadings rounded to 6) and its Rayleigh
    eigenvalue (same value on every row, rounded to 3) after
    ``iterations`` power steps from the deterministic start."""
    mu_rows = (
        embeddings.select(
            F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
                "pos", "val"
            )
        )
        .groupBy("pos")
        .agg(F.round(F.avg("val"), 9).alias("m"))
        .collect()
    )
    mu = [float(m) for _, m in sorted((int(r["pos"]), r["m"]) for r in mu_rows)]

    seed = embeddings.where(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).collect()
    if not seed:
        raise ValueError("pca_power needs a seed vector with vec_id == 0")
    v = _unit([float(x) - m for x, m in zip(seed[0]["v"], mu)])

    base = _centered(embeddings, mu).persist()
    try:
        v = _power_loop(base, v, iterations)
        eig = base.select(
            F.round(
                F.sum(_dot_lit(F.col("cx"), v) * _dot_lit(F.col("cx"), v)), 3
            ).alias("eigenvalue")
        )
    finally:
        base.unpersist()
    spark = embeddings.sparkSession
    loadings = spark.createDataFrame(
        [(p, round(x, 6)) for p, x in enumerate(v)], "pos int, loading double"
    )
    return loadings.crossJoin(F.broadcast(eig)).select("pos", "loading", "eigenvalue")


def pca_power_sql(table: str = "embeddings", iterations: int = 8) -> str:
    """DuckDB oracle for :func:`pca_power` — the exact unrolled replay in
    (vec_id, pos, val) long form."""
    parts = [
        f"""plong AS MATERIALIZED (
      SELECT vec_id, unnest(range(len(embedding))) AS pos,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val
      FROM {table}
    ), pmu AS (
      SELECT pos, round(avg(val), 9) AS m FROM plong GROUP BY pos
    ), pcx AS MATERIALIZED (
      SELECT l.vec_id, l.pos, l.val - u.m AS cval
      FROM plong l JOIN pmu u USING (pos)
    ), pv0r AS (
      SELECT pos, cval FROM pcx WHERE vec_id = 0
    ), pv0 AS MATERIALIZED (
      SELECT pos, round(cval / (SELECT sqrt(sum(cval * cval)) FROM pv0r), 9) AS l
      FROM pv0r
    )"""
    ]
    prev = "pv0"
    for t in range(1, iterations + 1):
        parts.append(
            f"""ps{t} AS MATERIALIZED (
      SELECT c.vec_id, sum(c.cval * v.l) AS s
      FROM pcx c JOIN {prev} v USING (pos) GROUP BY c.vec_id
    ), pw{t} AS MATERIALIZED (
      SELECT c.pos, round(sum(s.s * c.cval), 9) AS w
      FROM pcx c JOIN ps{t} s USING (vec_id) GROUP BY c.pos
    ), pv{t} AS MATERIALIZED (
      SELECT pos, round(w / (SELECT sqrt(sum(w * w)) FROM pw{t}), 9) AS l
      FROM pw{t}
    )"""
        )
        prev = f"pv{t}"
    parts.append(
        f"""pfs AS MATERIALIZED (
      SELECT c.vec_id, sum(c.cval * v.l) AS s
      FROM pcx c JOIN {prev} v USING (pos) GROUP BY c.vec_id
    ), peig AS (
      SELECT round(sum(s * s), 3) AS eigenvalue FROM pfs
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT v.pos, round(v.l, 6) AS loading, e.eigenvalue
    FROM {prev} v CROSS JOIN peig e
    """
    )


def _power_loop(base: DataFrame, v0: list, iterations: int) -> list:
    """The shared rounded power-iteration loop over long-form-equivalent
    centered rows ``[vec_id, cx]`` — returns the converged unit vector
    (each per-pos sum rounded to 9dp before normalization, the exact
    discipline the SQL oracle unrolls)."""
    v = v0
    for _ in range(iterations):
        w_rows = (
            base.withColumn("_s", _dot_lit(F.col("cx"), v))
            .select("_s", F.posexplode("cx").alias("pos", "val"))
            .groupBy("pos")
            .agg(F.round(F.sum(F.col("_s") * F.col("val")), 9).alias("w"))
            .collect()
        )
        w = [float(x) for _, x in sorted((int(r["pos"]), r["w"]) for r in w_rows)]
        v = _unit(w)
    return v


def pca2_power(embeddings: DataFrame, iterations: int = 8) -> DataFrame:
    """→ ``[pos, loading, eigenvalue]`` — the SECOND principal direction
    via Hotelling deflation: run the rounded power loop to the top
    component u₁, project it out of every centered row
    (``cx₂ = cx − round(cx·u₁, 9)·u₁``, re-rounded to 9dp per
    coordinate so both engines feed identical numbers downstream), and
    power-iterate again from the deflated ``vec_id == 1`` seed. The
    λ₂ Rayleigh eigenvalue against :func:`pca_power`'s λ₁ is the
    spectral-decay readout that tells an index designer whether one
    axis dominates (λ₂ ≪ λ₁ — a 1-D corpus in disguise) — the
    off-diagonal complement of ``variance_participation``'s diagonal
    proxy.

    Scale shape: identical to :func:`pca_power` — each step is one
    map-only literal dot + one D-keyed aggregate collected as D rows to
    the driver (O(D) driver state); the deflation is one extra map-only
    projection. 2·iterations + 2 jobs total.
    """
    mu_rows = (
        embeddings.select(
            F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
                "pos", "val"
            )
        )
        .groupBy("pos")
        .agg(F.round(F.avg("val"), 9).alias("m"))
        .collect()
    )
    mu = [float(m) for _, m in sorted((int(r["pos"]), r["m"]) for r in mu_rows)]

    seed1 = embeddings.where(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).collect()
    if not seed1:
        raise ValueError("pca2_power needs a seed vector with vec_id == 0")
    v1 = _unit([float(x) - m for x, m in zip(seed1[0]["v"], mu)])

    base = _centered(embeddings, mu).persist()
    try:
        u1 = _power_loop(base, v1, iterations)
        s9 = F.round(_dot_lit(F.col("cx"), u1), 9)
        base2 = base.select(
            "vec_id",
            F.zip_with(
                F.col("cx"),
                F.lit(u1),
                lambda x, l: F.round(x - s9 * l, 9),
            ).alias("cx"),
        ).persist()
        try:
            seed2 = base2.where(F.col("vec_id") == 1).select("cx").collect()
            if not seed2:
                raise ValueError("pca2_power needs a seed vector with vec_id == 1")
            v2 = _unit([float(x) for x in seed2[0]["cx"]])
            u2 = _power_loop(base2, v2, iterations)
            eig = base2.select(
                F.round(
                    F.sum(_dot_lit(F.col("cx"), u2) * _dot_lit(F.col("cx"), u2)), 3
                ).alias("eigenvalue")
            )
            spark = embeddings.sparkSession
            loadings = spark.createDataFrame(
                [(p, round(x, 6)) for p, x in enumerate(u2)],
                "pos int, loading double",
            )
            return loadings.crossJoin(F.broadcast(eig)).select(
                "pos", "loading", "eigenvalue"
            )
        finally:
            base2.unpersist()
    finally:
        base.unpersist()


def pca2_power_sql(table: str = "embeddings", iterations: int = 8) -> str:
    """DuckDB oracle for :func:`pca2_power` — the first chain, the 9dp
    deflation, then the second chain, all unrolled in long form."""
    parts = [
        f"""plong AS MATERIALIZED (
      SELECT vec_id, unnest(range(len(embedding))) AS pos,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val
      FROM {table}
    ), pmu AS (
      SELECT pos, round(avg(val), 9) AS m FROM plong GROUP BY pos
    ), pcx AS MATERIALIZED (
      SELECT l.vec_id, l.pos, l.val - u.m AS cval
      FROM plong l JOIN pmu u USING (pos)
    ), pv0r AS (
      SELECT pos, cval FROM pcx WHERE vec_id = 0
    ), pv0 AS MATERIALIZED (
      SELECT pos, round(cval / (SELECT sqrt(sum(cval * cval)) FROM pv0r), 9) AS l
      FROM pv0r
    )"""
    ]
    prev = "pv0"
    for t in range(1, iterations + 1):
        parts.append(
            f"""ps{t} AS MATERIALIZED (
      SELECT c.vec_id, sum(c.cval * v.l) AS s
      FROM pcx c JOIN {prev} v USING (pos) GROUP BY c.vec_id
    ), pw{t} AS MATERIALIZED (
      SELECT c.pos, round(sum(s.s * c.cval), 9) AS w
      FROM pcx c JOIN ps{t} s USING (vec_id) GROUP BY c.pos
    ), pv{t} AS MATERIALIZED (
      SELECT pos, round(w / (SELECT sqrt(sum(w * w)) FROM pw{t}), 9) AS l
      FROM pw{t}
    )"""
        )
        prev = f"pv{t}"
    parts.append(
        f"""pds AS MATERIALIZED (
      SELECT c.vec_id, round(sum(c.cval * v.l), 9) AS s
      FROM pcx c JOIN {prev} v USING (pos) GROUP BY c.vec_id
    ), pcx2 AS MATERIALIZED (
      SELECT c.vec_id, c.pos, round(c.cval - d.s * v.l, 9) AS cval
      FROM pcx c
      JOIN pds d USING (vec_id)
      JOIN {prev} v USING (pos)
    ), qv0r AS (
      SELECT pos, cval FROM pcx2 WHERE vec_id = 1
    ), qv0 AS MATERIALIZED (
      SELECT pos, round(cval / (SELECT sqrt(sum(cval * cval)) FROM qv0r), 9) AS l
      FROM qv0r
    )"""
    )
    prev = "qv0"
    for t in range(1, iterations + 1):
        parts.append(
            f"""qs{t} AS MATERIALIZED (
      SELECT c.vec_id, sum(c.cval * v.l) AS s
      FROM pcx2 c JOIN {prev} v USING (pos) GROUP BY c.vec_id
    ), qw{t} AS MATERIALIZED (
      SELECT c.pos, round(sum(s.s * c.cval), 9) AS w
      FROM pcx2 c JOIN qs{t} s USING (vec_id) GROUP BY c.pos
    ), qv{t} AS MATERIALIZED (
      SELECT pos, round(w / (SELECT sqrt(sum(w * w)) FROM qw{t}), 9) AS l
      FROM qw{t}
    )"""
        )
        prev = f"qv{t}"
    parts.append(
        f"""qfs AS MATERIALIZED (
      SELECT c.vec_id, sum(c.cval * v.l) AS s
      FROM pcx2 c JOIN {prev} v USING (pos) GROUP BY c.vec_id
    ), qeig AS (
      SELECT round(sum(s * s), 3) AS eigenvalue FROM qfs
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT v.pos, round(v.l, 6) AS loading, e.eigenvalue
    FROM {prev} v CROSS JOIN qeig e
    """
    )
