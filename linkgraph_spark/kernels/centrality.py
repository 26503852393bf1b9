"""Centrality beyond PageRank: exact landmark harmonic centrality and a
HyperBall-style all-vertex estimator.

Harmonic centrality of v = Σ_{u ≠ v} 1 / d(u, v) — the distance-based
"how close is v to everything" score (Boldi & Vigna, "Axioms for
Centrality", 2014). Two scale regimes, two operators:

- :func:`harmonic_landmarks` — EXACT, for a small set of candidate
  vertices ("which of these hub actors is most central"): one frontier
  BFS (``kernels/paths.py`` — O(E) total touched edges, not O(E·depth))
  per landmark, truncated at radius ``k``, then a one-row aggregate.
  Cost is landmarks × BFS — the right tool when you can enumerate the
  candidates.
- :func:`hyperball` — APPROXIMATE, for EVERY vertex at once: the
  HyperBall algorithm (Boldi, Rosa & Vigna, WWW 2011 / "HyperBall" 2013)
  over Spark's native Apache DataSketches HLL aggregates
  (``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_union`` — JVM-side,
  no Python in the loop). State is one O(2^lgk)-byte sketch per vertex;
  each round is ONE edge join + groupBy union — the same shuffle shape
  as a PageRank superstep, so the 100 TB story is identical to the
  gather kernel's. Exact all-pairs BFS is Θ(V·E); this is Θ(rounds·E)
  with ~1.6 % ball-size error at the default lgk=12 (and exact at toy
  cardinalities, where the DataSketches HLL is still in sparse mode).

Engine addition over the reference (whose one kernel is PageRank —
``pagerank_lambda/dynamodb/pagerank.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


def harmonic_landmarks(
    graph: LinkGraph, landmarks: list, k: int, directed: bool = False
) -> DataFrame:
    """→ ``[id, harmonic]`` — exact harmonic centrality of each landmark,
    truncated at radius ``k`` (vertices farther than ``k`` contribute 0;
    BFS level i is final after i supersteps, so ``max_iterations=k``
    yields exactly the ≤ k ball). Undirected reach by default, matching
    the ego/paths convention for transcript graphs."""
    from linkgraph_spark.kernels.paths import shortest_paths

    spark = graph.vertices.sparkSession
    parts = []
    for lm in landmarks:
        res = shortest_paths(
            graph, sources=[int(lm)], directed=directed, max_iterations=k
        )
        h = (
            res.distances.where(
                (F.col("distance") >= 1) & (F.col("distance") <= k)
            )
            .agg(F.sum(1.0 / F.col("distance")).alias("h"))
            .select(
                F.lit(int(lm)).cast("long").alias("id"),
                F.round(F.coalesce("h", F.lit(0.0)), 6).alias("harmonic"),
            )
        )
        parts.append(h)
    return reduce(DataFrame.unionAll, parts)


def harmonic_landmarks_sql(landmarks: list, k: int) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): one unrolled
    min-update BFS chain with the landmark as a state column."""
    sent = 1_000_000_000
    vals = ", ".join(f"({int(lm)})" for lm in landmarks)
    ctes = [
        """hc_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        f"""hc0 AS (
      SELECT v.id, lm.lm, CASE WHEN v.id = lm.lm THEN 0 ELSE {sent} END AS d
      FROM verts v CROSS JOIN (VALUES {vals}) lm(lm)
    )""",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""hc{i} AS MATERIALIZED (
      SELECT d.id, d.lm, least(d.d, coalesce(m.c, {sent})) AS d
      FROM hc{i - 1} d
      LEFT JOIN (
        SELECT e.dst AS id, p.lm, min(p.d) + 1 AS c
        FROM hc_und e JOIN hc{i - 1} p ON e.src = p.id
        WHERE p.d < {sent}
        GROUP BY e.dst, p.lm
      ) m ON m.id = d.id AND m.lm = d.lm
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT lm AS id,
           round(coalesce(sum(CASE WHEN d BETWEEN 1 AND {k} THEN 1.0 / d END), 0.0), 6)
             AS harmonic
    FROM hc{k} GROUP BY lm
    """


def eccentricity_landmarks(
    graph: LinkGraph, landmarks: list, k: int, directed: bool = False
) -> DataFrame:
    """→ ``[id, eccentricity]`` — exact k-truncated eccentricity of each
    landmark: the farthest hop distance reached within radius ``k``
    (saturates at ``k``; 0 for an isolated landmark). Same cost shape as
    :func:`harmonic_landmarks` — one frontier BFS per landmark, one-row
    aggregate each — and the pair share a sweep in practice (run both
    aggregates over one BFS when you need both)."""
    from functools import reduce as _reduce

    from linkgraph_spark.kernels.paths import shortest_paths

    parts = []
    for lm in landmarks:
        res = shortest_paths(
            graph, sources=[int(lm)], directed=directed, max_iterations=k
        )
        e = (
            res.distances.where(F.col("distance") >= 1)
            .agg(F.max("distance").alias("e"))
            .select(
                F.lit(int(lm)).cast("long").alias("id"),
                F.coalesce("e", F.lit(0)).cast("long").alias("eccentricity"),
            )
        )
        parts.append(e)
    return _reduce(DataFrame.unionAll, parts)


def eccentricity_landmarks_sql(landmarks: list, k: int) -> str:
    """DuckDB oracle body — the harmonic landmark BFS chain with a max
    aggregate instead of the 1/d sum."""
    base = harmonic_landmarks_sql(landmarks, k)
    idx = base.rindex("SELECT lm AS id,")
    head = base[:idx]
    return f"""{head}SELECT lm AS id,
           CAST(coalesce(max(CASE WHEN d BETWEEN 1 AND {k} THEN d END), 0) AS BIGINT)
             AS eccentricity
    FROM hc{k} GROUP BY lm
    """


def closeness_landmarks(
    graph: LinkGraph, landmarks: list, k: int, directed: bool = False
) -> DataFrame:
    """→ ``[id, n_reached, closeness]`` — exact k-truncated closeness of
    each landmark: ``n_reached`` vertices within hop distance 1..k and
    ``closeness = n_reached / Σ d`` over those distances (0.0 for an
    isolated landmark). The reciprocal-of-average-distance convention,
    truncated like :func:`harmonic_landmarks` (same per-landmark frontier
    BFS cost; in practice run the pair over one BFS when you need both —
    harmonic weighs near vertices, closeness penalizes far ones)."""
    from functools import reduce as _reduce

    from linkgraph_spark.kernels.paths import shortest_paths

    parts = []
    for lm in landmarks:
        res = shortest_paths(
            graph, sources=[int(lm)], directed=directed, max_iterations=k
        )
        c = (
            res.distances.where(
                (F.col("distance") >= 1) & (F.col("distance") <= k)
            )
            .agg(
                F.count("*").alias("n"),
                F.sum("distance").alias("s"),
            )
            .select(
                F.lit(int(lm)).cast("long").alias("id"),
                F.coalesce("n", F.lit(0)).cast("long").alias("n_reached"),
                F.round(
                    F.when(
                        F.coalesce("s", F.lit(0)) > 0, F.col("n") / F.col("s")
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("closeness"),
            )
        )
        parts.append(c)
    return _reduce(DataFrame.unionAll, parts)


def closeness_landmarks_sql(landmarks: list, k: int) -> str:
    """DuckDB oracle body — the harmonic landmark BFS chain with the
    count/sum closeness aggregate."""
    base = harmonic_landmarks_sql(landmarks, k)
    idx = base.rindex("SELECT lm AS id,")
    head = base[:idx]
    return f"""{head}SELECT lm AS id,
           CAST(coalesce(sum(CASE WHEN d BETWEEN 1 AND {k} THEN 1 END), 0) AS BIGINT)
             AS n_reached,
           round(CASE WHEN coalesce(sum(CASE WHEN d BETWEEN 1 AND {k} THEN d END), 0) > 0
                      THEN sum(CASE WHEN d BETWEEN 1 AND {k} THEN 1 END)
                           / CAST(sum(CASE WHEN d BETWEEN 1 AND {k} THEN d END) AS DOUBLE)
                      ELSE 0.0 END, 6) AS closeness
    FROM hc{k} GROUP BY lm
    """


def double_sweep_diameter(
    graph: LinkGraph, seed: int = 0, k: int = 16, directed: bool = False
) -> DataFrame:
    """→ one-row ``[far_id, diameter_lb]`` — the classic double-sweep
    diameter LOWER bound (Magnien, Latapy & Habib 2009, public technique):
    BFS from ``seed``, hop to the farthest vertex found (ties broken by
    min id, so the sweep is deterministic), BFS again from there; the
    second sweep's eccentricity is ≥ half the true diameter and in
    practice usually exact on real graphs. Both sweeps truncate at radius
    ``k``, so the bound is additionally capped at k. Cost: exactly two
    frontier BFS passes — the cheap sanity check next to the O(rounds·E)
    :func:`hyperball` sweep.

    The far-vertex handoff between sweeps is a one-row ``collect()``
    (an O(1) scalar by the engine's driver-side rules)."""
    from linkgraph_spark.kernels.paths import shortest_paths

    first = shortest_paths(
        graph, sources=[int(seed)], directed=directed, max_iterations=k
    )
    far_row = (
        first.distances.orderBy(F.desc("distance"), F.asc("id")).limit(1).collect()
    )
    far_id = int(far_row[0]["id"]) if far_row else int(seed)
    second = shortest_paths(
        graph, sources=[far_id], directed=directed, max_iterations=k
    )
    return second.distances.agg(
        F.lit(far_id).cast("long").alias("far_id"),
        F.coalesce(F.max("distance"), F.lit(0)).cast("long").alias("diameter_lb"),
    )


def double_sweep_diameter_sql(seed: int = 0, k: int = 16) -> str:
    """DuckDB oracle body (expects ``verts``/``edges``): two unrolled
    min-update BFS chains, the second seeded from the first's
    (max-distance, min-id) vertex."""
    sent = 1_000_000_000
    ctes = [
        """ds_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        f"""ds1_0 AS (
      SELECT id, CASE WHEN id = {int(seed)} THEN 0 ELSE {sent} END AS d FROM verts
    )""",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""ds1_{i} AS MATERIALIZED (
      SELECT d.id, least(d.d, coalesce(m.c, {sent})) AS d
      FROM ds1_{i - 1} d
      LEFT JOIN (
        SELECT e.dst AS id, min(p.d) + 1 AS c
        FROM ds_und e JOIN ds1_{i - 1} p ON e.src = p.id
        WHERE p.d < {sent}
        GROUP BY e.dst
      ) m ON m.id = d.id
    )"""
        )
    ctes.append(
        # coalesce to the seed so the degenerate cases (seed absent from
        # verts, empty graph) still yield ONE (seed, 0) row — matching the
        # Spark side's far_id fallback instead of an empty cross join
        f"""ds_far AS (
      SELECT coalesce(
        (SELECT id FROM ds1_{k} WHERE d < {sent}
         ORDER BY d DESC, id ASC LIMIT 1),
        {int(seed)}) AS id
    )"""
    )
    ctes.append(
        f"""ds2_0 AS (
      SELECT v.id, CASE WHEN v.id = f.id THEN 0 ELSE {sent} END AS d
      FROM verts v CROSS JOIN ds_far f
    )"""
    )
    for i in range(1, k + 1):
        ctes.append(
            f"""ds2_{i} AS MATERIALIZED (
      SELECT d.id, least(d.d, coalesce(m.c, {sent})) AS d
      FROM ds2_{i - 1} d
      LEFT JOIN (
        SELECT e.dst AS id, min(p.d) + 1 AS c
        FROM ds_und e JOIN ds2_{i - 1} p ON e.src = p.id
        WHERE p.d < {sent}
        GROUP BY e.dst
      ) m ON m.id = d.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT f.id AS far_id,
           CAST(coalesce(
             (SELECT max(CASE WHEN d.d < {sent} THEN d.d END) FROM ds2_{k} d),
             0) AS BIGINT) AS diameter_lb
    FROM ds_far f
    """


@dataclass
class HyperBallResult:
    centrality: DataFrame  # [id, ball_est, harmonic_est]
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)
    # radius the sweep started from (> 0 for a checkpoint-resumed run —
    # such a run's ``metrics`` begin mid-sweep and cannot seed
    # :func:`effective_diameter`'s N(r) curve)
    start_radius: int = 0


def hyperball(
    graph: LinkGraph,
    max_r: int = 16,
    directed: bool = False,
    lgk: int = 12,
    checkpoint=None,
    resume: bool = False,
) -> HyperBallResult:
    """→ HyperBall neighborhood-function sweep: per vertex, the estimated
    ball size |B(v, r)| at the final radius (``ball_est``) and the
    harmonic-centrality estimate Σ_r (|B(v,r)|−|B(v,r−1)|)/r
    (``harmonic_est``), both from HLL sketches updated in supersteps.

    Each round: neighbors' sketches are HLL-unioned into each vertex's
    (one join on the edge table + one groupBy — sketch union is
    associative, so map-side partial aggregation applies), the ball
    estimate is re-read, and the harmonic sum absorbs the increment.
    Converges when no vertex's estimate changes (sketch fixpoint).

    ``checkpoint``/``resume``: same contract as the other iterative
    kernels — the full per-vertex state (sketch bytes + harmonic
    accumulator) snapshots each round, so a long sweep restarts from the
    latest committed radius (DataSketches HLL bytes round-trip parquet).
    """
    spark = graph.vertices.sparkSession
    if directed:
        edges = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    else:
        from linkgraph_spark.kernels.components import undirected

        edges = undirected(graph.edges)
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    state = RotatingState(spark)
    n_edges = graph.edges.count()
    init = (
        graph.vertices.groupBy("id")
        .agg(F.hll_sketch_agg("id", F.lit(lgk)).alias("sk"))
        .select(
            "id",
            "sk",
            F.lit(0.0).alias("h"),
            # |B(v,0)| = 1 exactly; seed prev with the sketch's own estimate
            # so round-1 increments are measured against the same scale
            F.hll_sketch_estimate("sk").cast("double").alias("prev"),
        )
    )
    start = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("hyperball")
        if latest is not None:
            init = checkpoint.load_state(spark, "hyperball", latest)
            start = latest
    cur = state.rotate(init)
    converged = False
    metrics: list = []
    it = start
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        # checkpoint INSIDE the pinned confs: leaf-plan per sketch round
        # (no re-analysis of the edge-derivation lineage), materialized at
        # the loop's scaled partition count rather than the session's
        edges, edge_blocks = checkpoint_tracked(edges)
        for it in range(start + 1, max_r + 1):
            nbr = cur.select(F.col("id").alias("src"), "sk")
            if not big_state:
                nbr = F.broadcast(nbr)
            gathered = (
                edges.join(nbr, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.hll_union_agg("sk", True).alias("nsk"))
            )
            est = F.hll_sketch_estimate(
                F.when(
                    F.col("nsk").isNotNull(),
                    F.hll_union("sk", "nsk", True),
                ).otherwise(F.col("sk"))
            ).cast("double")
            new = cur.join(gathered, "id", "left").select(
                "id",
                F.when(
                    F.col("nsk").isNotNull(),
                    F.hll_union("sk", "nsk", True),
                )
                .otherwise(F.col("sk"))
                .alias("sk"),
                (
                    F.col("h")
                    + F.greatest(est - F.col("prev"), F.lit(0.0)) / F.lit(float(it))
                ).alias("h"),
                est.alias("prev"),
                (est > F.col("prev")).alias("_grew"),
            )
            from pyspark.sql import Observation

            obs = Observation(f"hyperball_grew_{id(state)}_{it}")
            new = new.observe(
                obs,
                F.sum(F.when(F.col("_grew"), 1).otherwise(0)).alias("n"),
                # neighborhood function N(r) = Σ_v |B(v, r)| rides the same
                # materialization — fuels effective_diameter for free
                F.sum("prev").alias("nf"),
            )
            new = state.rotate(new.drop("_grew"))
            st = obs.get
            grew = st["n"] or 0
            metrics.append(
                {"iteration": it, "grew": grew, "nf": float(st["nf"] or 0.0)}
            )
            cur = new
            if checkpoint is not None:
                checkpoint.write_state(
                    "hyperball", it, cur, key_col="id",
                    metrics={"grew": grew, "nf": float(st["nf"] or 0.0)},
                )
            if grew == 0:
                converged = True
                break

    out = cur.select(
        "id",
        F.round("prev", 6).alias("ball_est"),
        F.round("h", 6).alias("harmonic_est"),
    )
    free_tracked(spark.sparkContext, edge_blocks)
    return HyperBallResult(
        centrality=out,
        iterations=it,
        converged=converged,
        metrics=metrics,
        start_radius=start,
    )


def effective_diameter(
    graph: LinkGraph,
    q: float = 0.9,
    max_r: int = 64,
    directed: bool = False,
    lgk: int = 12,
    result: HyperBallResult | None = None,
) -> float:
    """→ the HyperANF effective diameter estimate: the (interpolated)
    radius r at which the neighborhood function N(r) = Σ_v |B(v, r)|
    reaches fraction ``q`` of its final value — i.e. q of all connected
    pairs are within distance r. Rides the per-round N(r) totals the
    :func:`hyperball` sweep already observes, so the cost is exactly one
    HyperBall run (O(rounds · E), O(V) sketch state). The whole-graph
    "how far apart is everything" number next to reciprocity/assortativity.
    """
    # pass a finished sweep via ``result`` to reuse its N(r) metrics
    # instead of paying a second O(rounds·E) HyperBall run
    res = result or hyperball(graph, max_r=max_r, directed=directed, lgk=lgk)
    # A checkpoint-resumed sweep's metrics begin at the resumed radius, so
    # ``[V] + metrics`` would misalign radii and interpolate a wrong
    # diameter — require a fresh full sweep (metrics from r=1 on).
    if res.start_radius != 0 or (
        res.metrics and res.metrics[0]["iteration"] != 1
    ):
        raise ValueError(
            "effective_diameter needs a FRESH HyperBall sweep (metrics from "
            f"radius 1); got one resumed at radius {res.start_radius} — rerun "
            "hyperball() without resume, or keep the original run's result."
        )
    # N(0) = V exactly (every ball starts as {v})
    nf = [float(graph.num_vertices)] + [m["nf"] for m in res.metrics]
    target = q * nf[-1]
    for r in range(len(nf)):
        if nf[r] >= target:
            if r == 0:
                return 0.0
            prev_nf, cur_nf = nf[r - 1], nf[r]
            if cur_nf == prev_nf:
                return float(r)
            return round((r - 1) + (target - prev_nf) / (cur_nf - prev_nf), 6)
    return float(len(nf) - 1)  # cap hit before q of pairs closed


def effective_diameter_landmarks(
    graph: LinkGraph,
    landmarks: list,
    k: int,
    q: float = 0.9,
    directed: bool = False,
) -> DataFrame:
    """→ one-row ``[effective_diameter]`` — the EXACT interpolated
    q-effective diameter of the distance distribution from a landmark
    sample, truncated at radius ``k``: the radius at which the cumulative
    pair count N(r) = |{(lm, v): d(lm, v) ≤ r}| (self-pairs included, as
    in :func:`effective_diameter`'s N(0) = V convention) reaches fraction
    ``q`` of N(k), linearly interpolated between integer radii.

    This is the oracle-checkable companion to the HLL-estimated
    :func:`effective_diameter`: same interpolation, but exact distances
    from an enumerable landmark set (landmarks × one truncated frontier
    BFS each, O(L·E) total) instead of all-vertex sketches — so DuckDB
    can replay it row-for-row. On the full graph the two agree up to HLL
    error whenever the landmark sample is distance-representative.

    The whole pipeline stays declarative: per-landmark distances union,
    histogram groupBy, window cumsum + lag for the interpolation — the
    final frame is ≤ k rows, no driver-side math."""
    from functools import reduce as _reduce

    from pyspark.sql import Window

    from linkgraph_spark.kernels.paths import shortest_paths

    parts = []
    for lm in landmarks:
        res = shortest_paths(
            graph, sources=[int(lm)], directed=directed, max_iterations=k
        )
        parts.append(
            res.distances.where(F.col("distance") <= k).select("distance")
        )
    dist = _reduce(DataFrame.unionAll, parts)
    hist = dist.groupBy("distance").agg(F.count("*").alias("c"))
    wc = Window.orderBy("distance").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("nf", F.sum("c").over(wc)).withColumn(
        "prev", F.lag("nf").over(Window.orderBy("distance"))
    )
    total = cum.agg(F.max("nf").alias("t"))
    # first radius whose cumulative count reaches q·N(k); N is flat across
    # absent radii, so lag(nf) over present rows IS N(r-1) at that radius
    hit = (
        cum.crossJoin(total)
        .where(F.col("nf") >= q * F.col("t"))
        .orderBy("distance")
        .limit(1)
    )
    return hit.select(
        F.round(
            F.when(F.col("distance") == 0, F.lit(0.0))
            .when(F.col("nf") == F.col("prev"), F.col("distance").cast("double"))
            .otherwise(
                (F.col("distance") - 1)
                + (q * F.col("t") - F.col("prev")) / (F.col("nf") - F.col("prev"))
            ),
            6,
        ).alias("effective_diameter")
    )


def effective_diameter_landmarks_sql(landmarks: list, k: int, q: float = 0.9) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the
    harmonic-landmark BFS chain feeding the same histogram → cumsum →
    interpolation arithmetic as the Spark plan."""
    base = harmonic_landmarks_sql(landmarks, k)
    head = base[: base.rindex("SELECT lm AS id,")].rstrip().rstrip(",")
    return f"""{head},
    ed_hist AS (
      SELECT d, count(*) AS c FROM hc{k} WHERE d <= {k} GROUP BY d
    ),
    ed_cum0 AS (
      SELECT d, sum(c) OVER (ORDER BY d) AS nf FROM ed_hist
    ),
    ed_cum AS (
      SELECT d, nf, lag(nf) OVER (ORDER BY d) AS prev FROM ed_cum0
    ),
    ed_tot AS (SELECT max(nf) AS t FROM ed_cum),
    ed_hit AS (
      SELECT d, nf, prev, t FROM ed_cum CROSS JOIN ed_tot
      WHERE nf >= {q!r} * t ORDER BY d LIMIT 1
    )
    SELECT round(CASE WHEN d = 0 THEN 0.0
                      WHEN nf = prev THEN CAST(d AS DOUBLE)
                      ELSE (d - 1) + ({q!r} * t - prev) / (nf - prev)
                 END, 6) AS effective_diameter
    FROM ed_hit
    """


def ball_sizes(graph: LinkGraph, max_degree: int | None = None) -> DataFrame:
    """→ ``[id, ball1, ball2]`` — the EXACT neighborhood function at radii
    1 and 2 for every vertex (self included: an isolated vertex is
    (1, 1)), over the undirected simple graph. The small-radius exact
    companion to :func:`hyperball` (which estimates all radii with HLL
    sketches): "how many distinct actors are within two hops" is the
    friends-of-friends statistic dedup/audience estimation asks for, and
    at radius 2 the exact distinct-count is still a bounded join.

    Scale shape: ball2 candidates are one wedge self-join (the fan-out at
    a middle vertex m is deg(m)² — the same hub quadratic every wedge
    kernel here has), then ONE distinct + count per endpoint.
    ``max_degree`` caps which middle vertices RELAY (a 10^6-degree hub
    makes every pair 2-hop-reachable; past the cap, use the HyperBall
    estimate). Gate/tests run uncapped on the sparse actor graph.
    """
    from linkgraph_spark.kernels.components import undirected

    und = undirected(graph.edges)  # symmetric distinct [src, dst], no loops
    selfr = graph.vertices.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    reach1 = und.unionByName(selfr)
    mid = und.select(F.col("src").alias("m"), F.col("dst").alias("n"))
    if max_degree is not None:
        ok = (
            mid.groupBy("m")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") <= max_degree)
            .select("m")
        )
        mid = mid.join(ok, "m")
    hop2 = (
        mid.select(F.col("n").alias("src"), "m")
        .join(mid.select("m", F.col("n").alias("dst")), "m")
        .select("src", "dst")
    )
    b1 = reach1.groupBy("src").agg(F.count("*").alias("ball1"))  # already distinct
    b2 = (
        reach1.unionByName(hop2)
        .distinct()
        .groupBy("src")
        .agg(F.count("*").alias("ball2"))
    )
    return (
        b1.join(b2, "src")
        .select(F.col("src").alias("id"), "ball1", "ball2")
    )


def ball_sizes_sql(max_degree: int | None = None) -> str:
    """DuckDB oracle body for :func:`ball_sizes` (expects ``verts`` and
    ``edges`` CTEs in scope)."""
    cap = (
        f"""
    bs_ok AS (SELECT src AS m FROM bs_und GROUP BY src
              HAVING count(*) <= {max_degree}),
    bs_mid AS (SELECT src AS m, dst AS n FROM bs_und JOIN bs_ok ON bs_ok.m = bs_und.src),"""
        if max_degree is not None
        else """
    bs_mid AS (SELECT src AS m, dst AS n FROM bs_und),"""
    )
    return f"""
    bs_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    ),{cap}
    bs_r1 AS MATERIALIZED (
      SELECT src, dst FROM bs_und
      UNION ALL
      SELECT id AS src, id AS dst FROM verts
    ),
    bs_r2 AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM bs_r1
        UNION ALL
        SELECT a.n AS src, b.n AS dst
        FROM bs_mid a JOIN bs_mid b ON a.m = b.m
      )
    )
    SELECT b1.src AS id, b1.ball1, b2.ball2
    FROM (SELECT src, count(*) AS ball1 FROM bs_r1 GROUP BY src) b1
    JOIN (SELECT src, count(*) AS ball2 FROM bs_r2 GROUP BY src) b2
      ON b1.src = b2.src
    """


def walk_counts(graph: LinkGraph, n_hubs: int = 10) -> DataFrame:
    """→ ``[id, walks1, walks2, walks3]`` — the number of DIRECTED walks
    of length exactly 1, 2 and 3 starting at each of the ``n_hubs``
    highest-out-degree vertices (ties broken by min id). Walks count
    multiplicity and may revisit vertices — walks_k(v) = (Aᵏ·1)[v], the
    truncated-communicability mass :func:`katz` discounts and
    :func:`ball_sizes` deduplicates; the raw counts are the "how much
    does this hub amplify per extra hop" fan-out audit for seed/spam
    hubs.

    Scale shape: the hub frontier starts at ``n_hubs`` rows and each hop
    is ONE equi-join against the edge list followed by a map-side
    combinable grouped sum keyed on (hub, vertex) — per-hop state is
    bounded by n_hubs × |reached set|, never |V|². No windows, no
    distinct.
    """
    hubs = (
        graph.edges.groupBy("src")
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), F.asc("src"))
        .limit(n_hubs)
        .select(F.col("src").alias("hub"))
    )
    e = graph.edges.select("src", "dst")
    cur = (
        F.broadcast(hubs)
        .join(e, F.col("hub") == F.col("src"))
        .groupBy("hub", F.col("dst").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    totals = None
    for k in (1, 2, 3):
        wk = cur.groupBy("hub").agg(F.sum("c").alias(f"walks{k}"))
        totals = wk if totals is None else totals.join(wk, "hub", "left")
        if k < 3:
            cur = (
                cur.join(e, F.col("v") == F.col("src"))
                .groupBy("hub", F.col("dst").alias("nv"))
                .agg(F.sum("c").alias("c"))
                .select("hub", F.col("nv").alias("v"), "c")
            )
    return totals.select(
        F.col("hub").alias("id"),
        F.coalesce("walks1", F.lit(0)).alias("walks1"),
        F.coalesce("walks2", F.lit(0)).alias("walks2"),
        F.coalesce("walks3", F.lit(0)).alias("walks3"),
    )


def walk_counts_sql(n_hubs: int = 10) -> str:
    """DuckDB oracle body for :func:`walk_counts` (expects ``edges`` in
    scope)."""
    return f"""
    wc_hubs AS MATERIALIZED (
      SELECT src AS hub FROM edges GROUP BY src
      ORDER BY count(*) DESC, src LIMIT {int(n_hubs)}
    ),
    wc_c1 AS MATERIALIZED (
      SELECT h.hub, e.dst AS v, count(*) AS c
      FROM wc_hubs h JOIN edges e ON e.src = h.hub GROUP BY 1, 2
    ),
    wc_c2 AS MATERIALIZED (
      SELECT c1.hub, e.dst AS v, sum(c1.c) AS c
      FROM wc_c1 c1 JOIN edges e ON e.src = c1.v GROUP BY 1, 2
    ),
    wc_c3 AS (
      SELECT c2.hub, e.dst AS v, sum(c2.c) AS c
      FROM wc_c2 c2 JOIN edges e ON e.src = c2.v GROUP BY 1, 2
    )
    SELECT h.hub AS id,
           CAST(coalesce(w1.s, 0) AS BIGINT) AS walks1,
           CAST(coalesce(w2.s, 0) AS BIGINT) AS walks2,
           CAST(coalesce(w3.s, 0) AS BIGINT) AS walks3
    FROM wc_hubs h
    LEFT JOIN (SELECT hub, sum(c) AS s FROM wc_c1 GROUP BY hub) w1 ON w1.hub = h.hub
    LEFT JOIN (SELECT hub, sum(c) AS s FROM wc_c2 GROUP BY hub) w2 ON w2.hub = h.hub
    LEFT JOIN (SELECT hub, sum(c) AS s FROM wc_c3 GROUP BY hub) w3 ON w3.hub = h.hub
    """


def avg_distance_landmarks(
    graph: LinkGraph, landmarks: list, k: int, directed: bool = False
) -> DataFrame:
    """→ one-row ``[n_landmarks, n_pairs, avg_distance, reached_frac]``
    — the landmark estimate of the graph's mean shortest-path distance:
    over every (landmark, vertex) pair within hop distance 1..k, the
    average distance and the fraction of possible pairs reached
    (landmarks × (V−1)). The "how many hops is this graph" number next
    to :func:`double_sweep_diameter`'s worst case and
    :func:`effective_diameter_landmarks`'s 90th percentile — small-world
    graphs sit near ln V; a drifting average after an ingest is the
    cheap structural-change alarm.

    Scale shape: |landmarks| truncated frontier BFS runs (O(E) touched
    edges each), one union, ONE global aggregate — no per-vertex output.
    """
    from functools import reduce as _reduce

    from linkgraph_spark.kernels.paths import shortest_paths

    if not landmarks:
        raise ValueError("avg_distance_landmarks: need at least one landmark")
    parts = [
        shortest_paths(
            graph, sources=[int(lm)], directed=directed, max_iterations=k
        ).distances.where(
            (F.col("distance") >= 1) & (F.col("distance") <= k)
        ).select("distance")
        for lm in landmarks
    ]
    alld = _reduce(DataFrame.unionAll, parts)
    possible = float(len(landmarks)) * (graph.num_vertices - 1)
    return alld.agg(
        F.lit(len(landmarks)).cast("long").alias("n_landmarks"),
        F.count("*").alias("n_pairs"),
        F.round(F.sum("distance") / F.count("*"), 6).alias("avg_distance"),
        F.round(F.count("*") / F.lit(possible), 6).alias("reached_frac"),
    )


def avg_distance_landmarks_sql(landmarks: list, k: int) -> str:
    """DuckDB oracle body for :func:`avg_distance_landmarks` — the
    harmonic landmark BFS chain with one global aggregate."""
    base = harmonic_landmarks_sql(landmarks, k)
    idx = base.rindex("SELECT lm AS id,")
    head = base[:idx]
    return f"""{head}SELECT {len(landmarks)} AS n_landmarks,
           CAST(coalesce(sum(CASE WHEN d BETWEEN 1 AND {k} THEN 1 END), 0)
                AS BIGINT) AS n_pairs,
           round(sum(CASE WHEN d BETWEEN 1 AND {k} THEN d END)
                 / CAST(sum(CASE WHEN d BETWEEN 1 AND {k} THEN 1 END) AS DOUBLE),
                 6) AS avg_distance,
           round(sum(CASE WHEN d BETWEEN 1 AND {k} THEN 1 END)
                 / ({len(landmarks)}.0 * ((SELECT count(*) FROM verts) - 1)),
                 6) AS reached_frac
    FROM hc{k}
    """


def subgraph_centrality4(graph: LinkGraph) -> DataFrame:
    """→ ``[id, sc4]`` — Estrada subgraph centrality (Estrada &
    Rodríguez-Velázquez, Phys. Rev. E 2005, public technique) truncated at
    walk length 4: ``SC4(v) = Σ_{k≤4} (A^k)_vv / k!`` over the undirected
    simple graph.  Closed-walk counts come from closed forms, never a
    matrix power: ``(A²)_vv = d_v``, ``(A³)_vv = 2·t_v`` (each triangle at
    v closes two directed 3-walks), ``(A⁴)_vv = d_v² + Σ_{u≠v} cn(v,u)²``
    (4-walks pivot through a common-neighbor count).  So

        SC4(v) = 1 + d_v/2 + t_v/3 + (d_v² + Σ_u cn(v,u)²) / 24

    — the "how embedded in small closed structure" centrality that
    separates vertices equal on degree AND triangles (brute-force matrix
    check in the tests).  The truncation is the documented contract: it is
    the motif-weighted centrality, not the full matrix exponential (whose
    spectral computation does not belong on a relational engine).

    Scale shape: one degree aggregate, the arboricity-bounded triangle
    enumeration, and ONE wedge self-join for the cn table — the
    ``square_count`` shape with the same hub caution (a degree-D common
    neighbor contributes C(D,2) wedge rows; cap hubs first at 100 TB).
    All counts are exact integers; the single staged division chain is
    shared with the SQL mirror and rounded to 6."""
    from linkgraph_spark.kernels.triangles import _oriented, _triangles_und

    und = _oriented(graph.edges).persist()
    und.count()
    try:
        deg = (
            und.select(F.col("a").alias("id"))
            .unionAll(und.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("d"))
        )
        tri = _triangles_und(und)
        tv = (
            tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
            .groupBy("id")
            .agg(F.count("*").alias("t"))
        )
        nbrs = und.select(F.col("a").alias("m"), F.col("b").alias("n")).unionAll(
            und.select(F.col("b").alias("m"), F.col("a").alias("n"))
        )
        # cn(x, y) for ordered pairs x≠y sharing ≥1 neighbor, then Σ_y cn²
        cn2 = (
            nbrs.select("m", F.col("n").alias("x"))
            .join(nbrs.select("m", F.col("n").alias("y")), "m")
            .where(F.col("x") != F.col("y"))
            .groupBy("x", "y")
            .agg(F.count("*").alias("w"))
            .groupBy(F.col("x").alias("id"))
            .agg(F.sum(F.col("w") * F.col("w")).alias("s2"))
        )
        out = (
            graph.vertices.select("id")
            .join(deg, "id", "left")
            .join(tv, "id", "left")
            .join(cn2, "id", "left")
            .select(
                "id",
                F.expr(
                    "round(1.0 + CAST(coalesce(d, 0) AS DOUBLE) / 2"
                    " + CAST(coalesce(t, 0) AS DOUBLE) / 3"
                    " + (CAST(coalesce(d, 0) AS DOUBLE) * coalesce(d, 0)"
                    "    + coalesce(s2, 0)) / 24, 6)"
                ).alias("sc4"),
            )
        )
        return out.localCheckpoint()
    finally:
        und.unpersist()


def subgraph_centrality4_sql() -> str:
    """DuckDB oracle body (expects ``verts``/``edges``): identical closed
    forms with the id-ordered triangle enumeration."""
    return """
    sc_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    sc_deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM sc_und UNION ALL SELECT b AS v FROM sc_und
      ) GROUP BY v
    ),
    sc_tri AS MATERIALIZED (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM sc_und e1
      JOIN sc_und e2 ON e1.b = e2.a
      JOIN sc_und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    sc_tv AS (
      SELECT v, count(*) AS t FROM (
        SELECT a AS v FROM sc_tri
        UNION ALL SELECT b FROM sc_tri
        UNION ALL SELECT c FROM sc_tri
      ) GROUP BY v
    ),
    sc_nb AS MATERIALIZED (
      SELECT a AS m, b AS n FROM sc_und
      UNION ALL SELECT b AS m, a AS n FROM sc_und
    ),
    sc_cn2 AS (
      SELECT x AS id, sum(CAST(w AS HUGEINT) * w) AS s2 FROM (
        SELECT l.n AS x, r.n AS y, count(*) AS w
        FROM sc_nb l JOIN sc_nb r ON l.m = r.m AND l.n <> r.n
        GROUP BY 1, 2
      ) GROUP BY x
    )
    SELECT v.id,
           round(1.0 + CAST(coalesce(dg.d, 0) AS DOUBLE) / 2
                 + CAST(coalesce(tv.t, 0) AS DOUBLE) / 3
                 + (CAST(coalesce(dg.d, 0) AS DOUBLE) * coalesce(dg.d, 0)
                    + coalesce(c2.s2, 0)) / 24, 6) AS sc4
    FROM verts v
    LEFT JOIN sc_deg dg ON dg.v = v.id
    LEFT JOIN sc_tv tv ON tv.v = v.id
    LEFT JOIN sc_cn2 c2 ON c2.id = v.id
    """
