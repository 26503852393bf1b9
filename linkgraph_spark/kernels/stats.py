"""Whole-graph structure statistics: reciprocity and degree assortativity.

The two standard "is this graph healthy / what shape is it" numbers a
link-graph pipeline reports next to the degree distribution (the reference
computes nothing like this — its only whole-graph scalar is the vertex
count baked into rank initialisation, ``pagerank_lambda/dynamodb/
init_to_s3.py:55-86``; these are engine additions over it).

Both are single-pass aggregates:

- :func:`reciprocity` — one self-equi-join of the deduplicated directed
  edge list against its transpose (left-semi, so the probe side never
  materialises matches) + one count. Shuffle is one hash partition of E
  on (src, dst); no per-vertex state.
- :func:`degree_assortativity` — one degree aggregate, two broadcast-or-
  hash joins to attach endpoint degrees, one ``corr`` aggregate (Spark's
  Pearson corr is a single-pass numerically-stable co-moment — map-side
  partials, O(1) state per partition). At 100 TB both are a couple of
  scans with no iteration and no skew-sensitive fan-out (a hub's edges
  are just E rows like any other; nothing groups BY vertex except the
  O(V) degree count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph


def _simple_directed(edges: DataFrame) -> DataFrame:
    """Distinct non-loop directed edges [src, dst]."""
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def reciprocity(graph: LinkGraph) -> DataFrame:
    """→ one-row ``[reciprocity: double]`` — the fraction of distinct
    non-loop directed edges (u, v) whose reverse (v, u) is also present
    (0.0 on an empty edge set — the 0/0 case is pinned, and the SQL
    oracle emits the same).

    In a transcript graph this is the turn-taking symmetry rate: how often
    actor u handing off to v is matched by v handing back to u.
    """
    e = _simple_directed(graph.edges)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(rev, ["src", "dst"], "left_semi")
    total = e.agg(F.count("*").alias("n"))
    m = mutual.agg(F.count("*").alias("m"))
    return total.crossJoin(m).select(
        F.round(
            F.when(F.col("n") > 0, F.col("m") / F.col("n")).otherwise(F.lit(0.0)), 6
        ).alias("reciprocity")
    )


def degree_assortativity(graph: LinkGraph) -> DataFrame:
    """→ one-row ``[assortativity: double]`` — Pearson correlation between
    the undirected degrees of the two endpoints, over the symmetrised
    simple edge list with both orientations counted (the standard Newman
    degree-assortativity estimator). NULL (undefined: fewer than two
    distinct degree pairs) is emitted as-is.

    Negative values are the expected hub-and-spoke signature of transcript
    graphs (high-degree tool actors attach to low-degree conversation
    actors).
    """
    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    # both orientations: each undirected edge contributes (da, db) and (db, da)
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy(F.col("a").alias("id")).agg(F.count("*").alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    # explicit Pearson estimator: ANSI-mode corr() raises DIVIDE_BY_ZERO on
    # constant columns; DuckDB's corr (the oracle) returns NULL there — so
    # guard the zero-variance case to NULL ourselves
    joined = both.join(da, "a").join(db, "b")
    stats = joined.agg(
        F.covar_pop("deg_a", "deg_b").alias("cv"),
        F.stddev_pop("deg_a").alias("sa"),
        F.stddev_pop("deg_b").alias("sb"),
    )
    return stats.select(
        F.round(
            F.when(
                (F.col("sa") > 0) & (F.col("sb") > 0),
                F.col("cv") / (F.col("sa") * F.col("sb")),
            ),
            6,
        ).alias("assortativity")
    )


def reciprocity_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return """
    rc_e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    ),
    rc_m AS (
      SELECT count(*) AS m FROM rc_e e
      WHERE EXISTS (SELECT 1 FROM rc_e r WHERE r.src = e.dst AND r.dst = e.src)
    ),
    rc_n AS (SELECT count(*) AS n FROM rc_e)
    SELECT round(CASE WHEN n > 0 THEN m * 1.0 / n ELSE 0.0 END, 6) AS reciprocity
    FROM rc_n CROSS JOIN rc_m
    """


def degree_assortativity_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return """
    as_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    as_both AS (
      SELECT a, b FROM as_und UNION ALL SELECT b AS a, a AS b FROM as_und
    ),
    as_deg AS (SELECT a AS id, count(*) AS deg FROM as_both GROUP BY a)
    SELECT round(corr(da.deg, db.deg), 6) AS assortativity
    FROM as_both e
    JOIN as_deg da ON da.id = e.a
    JOIN as_deg db ON db.id = e.b
    """


def rich_club(graph: LinkGraph, ks: list[int]) -> DataFrame:
    """→ ``[k, n_rich, e_rich, phi]`` per degree threshold in ``ks`` — the
    rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) over the undirected
    simple graph, where N_k counts vertices of degree > k and E_k the
    edges among them (φ pinned to 0.0 when N_k < 2 — same in the oracle).
    High φ at high k = hub actors interconnect (the "rich club" of tool /
    orchestrator vertices); the standard Zhou & Mondragón 2004 statistic.

    Scale: ONE shared degree aggregate + per-k filtered one-row aggs over
    the same joined frame — ``ks`` is an enumerable list (like the
    landmark kernels), so the union is |ks| cheap scans of the cached
    degree-attached edge list, no per-k shuffle."""
    from functools import reduce as _reduce

    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    ed = und.join(da, "a").join(db, "b").persist()
    parts = []
    for k in ks:
        k = int(k)
        n_k = deg.where(F.col("deg") > k).agg(F.count("*").alias("n_rich"))
        e_k = ed.where(
            (F.col("dega") > k) & (F.col("degb") > k)
        ).agg(F.count("*").alias("e_rich"))
        parts.append(
            n_k.crossJoin(e_k).select(
                F.lit(k).cast("long").alias("k"),
                "n_rich",
                "e_rich",
                F.round(
                    F.when(
                        F.col("n_rich") >= 2,
                        2.0 * F.col("e_rich")
                        / (F.col("n_rich") * (F.col("n_rich") - 1)),
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("phi"),
            )
        )
    # materialize the |ks|-row result eagerly so the O(E) cached frame can
    # be released before returning (persist-without-unpersist would pin it
    # for the session; the checkpointed result is tiny)
    out = _reduce(DataFrame.unionAll, parts).localCheckpoint()
    ed.unpersist()
    return out


def rich_club_sql(ks: list[int]) -> str:
    """DuckDB oracle body for :func:`rich_club` (expects ``edges``)."""
    k_rows = ", ".join(f"({int(k)})" for k in ks)
    return f"""
    rb_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    rb_deg AS MATERIALIZED (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM rb_und UNION ALL SELECT b AS id FROM rb_und
      ) GROUP BY id
    ),
    rb_ks(k) AS (VALUES {k_rows}),
    rb_stats AS (
      SELECT ks.k,
             (SELECT count(*) FROM rb_deg d WHERE d.deg > ks.k) AS n_rich,
             (SELECT count(*) FROM rb_und e
              JOIN rb_deg da ON da.id = e.a
              JOIN rb_deg db ON db.id = e.b
              WHERE da.deg > ks.k AND db.deg > ks.k) AS e_rich
      FROM rb_ks ks
    )
    SELECT CAST(k AS BIGINT) AS k, n_rich, e_rich,
           round(CASE WHEN n_rich >= 2
                      THEN 2.0 * e_rich / (n_rich * (n_rich - 1))
                      ELSE 0.0 END, 6) AS phi
    FROM rb_stats
    """


def degree_percentiles(
    graph: LinkGraph, ps: tuple = (0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
) -> DataFrame:
    """→ [p, out_deg_pct, in_deg_pct]: exact linear-interpolation degree
    percentiles — the summary a capacity planner reads before sizing skew
    mitigations (p99 vs max tells you whether hubs are a tail or a cliff).

    Scale shape: ONE aggregate over the O(V) degree table computes every
    requested percentile (Spark's ``percentile(col, array(...))`` sorts
    per-group once); the row-per-percentile explode is driver-free, output
    is |ps| rows. Exact (not approx_percentile) because the oracle
    replays it: Spark ``percentile`` and DuckDB ``quantile_cont`` share
    linear-interpolation semantics."""
    arr = ", ".join(f"{float(p)}D" for p in ps)
    one = graph.degrees.agg(
        F.expr(f"percentile(out_deg, array({arr}))").alias("op"),
        F.expr(f"percentile(in_deg, array({arr}))").alias("ip"),
    )
    rows = [
        F.struct(
            F.lit(float(p)).alias("p"),
            F.round(F.element_at("op", i + 1), 6).alias("out_deg_pct"),
            F.round(F.element_at("ip", i + 1), 6).alias("in_deg_pct"),
        )
        for i, p in enumerate(ps)
    ]
    return one.select(F.explode(F.array(*rows)).alias("z")).select("z.*")


def degree_percentiles_sql(ps: tuple = (0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) -> str:
    """DuckDB oracle body (expects the ``degs`` CTE in scope)."""
    rows = "\n    UNION ALL ".join(
        f"SELECT CAST({float(p)} AS DOUBLE) AS p,"
        f" round(quantile_cont(out_deg, {float(p)}), 6) AS out_deg_pct,"
        f" round(quantile_cont(in_deg, {float(p)}), 6) AS in_deg_pct"
        f" FROM degs"
        for p in ps
    )
    return f"\n    {rows}\n    "


def degree_gini(graph: LinkGraph) -> DataFrame:
    """→ [metric, gini, hhi] for metric ∈ ('in', 'out', 'total'):
    concentration of attention — the Gini coefficient and the
    Herfindahl–Hirschman index of the degree distribution. The numbers a
    crawl/link-graph pipeline reads next to :func:`degree_percentiles`
    when deciding whether hub skew needs salting (gini → 1 / hhi → 1:
    one vertex owns the graph; gini → 0: uniform). Engine addition — the
    reference computes no whole-graph scalars at all
    (``pagerank_lambda/dynamodb/init_to_s3.py:55-86`` only counts
    vertices).

    Determinism/scale shape: Gini needs a global sort, but NOT over V
    rows — degrees are small integers with ≪ V distinct values (Zipf), so
    the sort runs over the degree HISTOGRAM: one map-side-combinable
    groupBy(metric, degree) collapse, then a window over the tiny
    histogram. For a block of n_i ties at value x_i ending at cumulative
    count C_i, the rank-sum Σ rank·x contribution is
    x_i · (C_i(C_i+1) − C_{i−1}(C_{i−1}+1)) / 2, all in double (exact to
    2^53 ≈ 9e15 — C(C+1)/2 stays exact past 10^7 vertices per degree
    value; the final round(…, 6) absorbs anything beyond). Then
    G = 2·Σ/(N·T) − (N+1)/N and HHI = Σ n_i·x_i² / T². Empty-edge graphs
    (T = 0) report 0 for both.
    """
    d = graph.degrees.select(
        F.col("in_deg").cast("double").alias("in"),
        F.col("out_deg").cast("double").alias("out"),
        (F.col("in_deg") + F.col("out_deg")).cast("double").alias("total"),
    )
    melted = d.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("metric"), F.col(m).alias("x"))
                    for m in ("in", "out", "total")
                ]
            )
        ).alias("z")
    ).select("z.*")
    hist = melted.groupBy("metric", "x").agg(F.count("*").cast("double").alias("n"))
    w = Window.partitionBy("metric").orderBy("x")
    ranked = hist.select(
        "metric",
        "x",
        "n",
        F.sum("n").over(w).alias("cum"),
    ).select(
        "metric",
        "n",
        (F.col("n") * F.col("x")).alias("nx"),
        (F.col("n") * F.col("x") * F.col("x")).alias("nx2"),
        (
            F.col("x")
            * (
                F.col("cum") * (F.col("cum") + 1)
                - (F.col("cum") - F.col("n")) * (F.col("cum") - F.col("n") + 1)
            )
            / 2
        ).alias("ranksum"),
    )
    return ranked.groupBy("metric").agg(
        F.round(
            F.when(
                F.sum("nx") > 0,
                2 * F.sum("ranksum") / (F.sum("n") * F.sum("nx"))
                - (F.sum("n") + 1) / F.sum("n"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("gini"),
        F.round(
            F.when(
                F.sum("nx") > 0, F.sum("nx2") / (F.sum("nx") * F.sum("nx"))
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("hhi"),
    )


def degree_gini_sql() -> str:
    """DuckDB oracle body (expects the ``degs`` CTE in scope)."""
    return """
    dg_melt AS (
      SELECT 'in' AS metric, CAST(in_deg AS DOUBLE) AS x FROM degs
      UNION ALL
      SELECT 'out' AS metric, CAST(out_deg AS DOUBLE) AS x FROM degs
      UNION ALL
      SELECT 'total' AS metric, CAST(in_deg + out_deg AS DOUBLE) AS x FROM degs
    ),
    dg_hist AS (
      SELECT metric, x, CAST(count(*) AS DOUBLE) AS n
      FROM dg_melt GROUP BY 1, 2
    ),
    dg_rank AS (
      SELECT metric, n, n * x AS nx, n * x * x AS nx2,
             x * (cum * (cum + 1) - (cum - n) * (cum - n + 1)) / 2 AS ranksum
      FROM (
        SELECT metric, x, n,
               sum(n) OVER (PARTITION BY metric ORDER BY x) AS cum
        FROM dg_hist)
    )
    SELECT metric,
           round(CASE WHEN sum(nx) > 0
                 THEN 2 * sum(ranksum) / (sum(n) * sum(nx))
                      - (sum(n) + 1) / sum(n)
                 ELSE 0.0 END, 6) AS gini,
           round(CASE WHEN sum(nx) > 0
                 THEN sum(nx2) / (sum(nx) * sum(nx))
                 ELSE 0.0 END, 6) AS hhi
    FROM dg_rank GROUP BY metric
    """


def centrality_degree_corr(ranks: DataFrame, degrees: DataFrame) -> DataFrame:
    """→ [pair, pearson] for pair ∈ ('rank_vs_in', 'rank_vs_out',
    'in_vs_out'): Pearson correlation between a centrality score and the
    in/out degree — the "is PageRank telling me anything degree doesn't"
    sanity check (rank_vs_in ≈ 1 means the damping/structure adds
    nothing; a low value means the walk finds genuinely non-local
    structure). ``ranks`` is any [id, rank] frame (the registry feeds the
    5-superstep textbook PageRank); ``degrees`` the graph degree table.

    Determinism: correlates the 6dp-ROUNDED rank (the same projection the
    oracle gate checks) so both engines see identical inputs; the corr
    itself is a single-pass co-moment whose summation-order noise sits at
    1e-12, absorbed by round(…, 6).

    Scale shape: one hash join on id (both sides O(V)) + one corr
    aggregate (map-side partials, O(1) state) — no iteration, no window.
    """
    j = ranks.select("id", F.round("rank", 6).alias("r")).join(
        degrees.select(
            "id",
            F.col("in_deg").cast("double").alias("din"),
            F.col("out_deg").cast("double").alias("dout"),
        ),
        "id",
    )
    one = j.agg(
        F.round(F.corr("r", "din"), 6).alias("ri"),
        F.round(F.corr("r", "dout"), 6).alias("ro"),
        F.round(F.corr("din", "dout"), 6).alias("io"),
    )
    rows = [
        F.struct(F.lit("rank_vs_in").alias("pair"), F.col("ri").alias("pearson")),
        F.struct(F.lit("rank_vs_out").alias("pair"), F.col("ro").alias("pearson")),
        F.struct(F.lit("in_vs_out").alias("pair"), F.col("io").alias("pearson")),
    ]
    return one.select(F.explode(F.array(*rows)).alias("z")).select("z.*")


def centrality_degree_corr_sql(ranks_cte: str) -> str:
    """DuckDB oracle body (expects ``degs`` + the named rank CTE with
    [id, rank] in scope)."""
    return f"""
    cc_j AS (
      SELECT round(r.rank, 6) AS r,
             CAST(d.in_deg AS DOUBLE) AS din,
             CAST(d.out_deg AS DOUBLE) AS dout
      FROM {ranks_cte} r JOIN degs d USING (id)
    ),
    cc_one AS (
      SELECT round(corr(r, din), 6) AS ri,
             round(corr(r, dout), 6) AS ro,
             round(corr(din, dout), 6) AS io
      FROM cc_j
    )
    SELECT 'rank_vs_in' AS pair, ri AS pearson FROM cc_one
    UNION ALL SELECT 'rank_vs_out' AS pair, ro AS pearson FROM cc_one
    UNION ALL SELECT 'in_vs_out' AS pair, io AS pearson FROM cc_one
    """


def degree_powerlaw(graph: LinkGraph) -> DataFrame:
    """→ [metric, alpha, r2, n_points] for metric ∈ ('in', 'out',
    'total') — least-squares power-law fit of the degree distribution:
    ln(count(deg)) regressed on ln(deg) over degrees ≥ 1, reported as
    ``alpha`` = −slope (the exponent of P(deg) ∝ deg^−α) with the fit's
    r². The "is this graph scale-free, and how heavy is the tail" number
    read next to :func:`degree_gini` — α ≈ 2–3 with high r² is classic
    web-graph territory; a poor r² says the histogram isn't a power law
    and hub heuristics tuned for one will misfire. Same closed-form
    sums-formula slope as ``zipf_slope`` (identical operation order in
    both engines).

    Scale shape: everything runs on the degree HISTOGRAM (≪ V rows, the
    :func:`degree_gini` collapse); the fit is six sums + closed forms —
    no window, no sort, no iteration.
    """
    d = graph.degrees.select(
        F.col("in_deg").cast("double").alias("in"),
        F.col("out_deg").cast("double").alias("out"),
        (F.col("in_deg") + F.col("out_deg")).cast("double").alias("total"),
    )
    melted = d.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("metric"), F.col(m).alias("deg"))
                    for m in ("in", "out", "total")
                ]
            )
        ).alias("z")
    ).select("z.*")
    hist = (
        melted.where(F.col("deg") >= 1)
        .groupBy("metric", "deg")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    xy = hist.select(
        "metric", F.log("deg").alias("x"), F.log("cnt").alias("y")
    )
    s = xy.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "metric",
        F.round(F.when(dxx > 0, -num / dxx).otherwise(F.lit(0.0)), 6).alias("alpha"),
        F.round(
            F.when((dxx > 0) & (dyy > 0), num * num / (dxx * dyy)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("r2"),
        F.col("n").alias("n_points"),
    )


def degree_powerlaw_sql() -> str:
    """DuckDB oracle body (expects the ``degs`` CTE in scope)."""
    return """
    dp_melt AS (
      SELECT 'in' AS metric, CAST(in_deg AS DOUBLE) AS deg FROM degs
      UNION ALL
      SELECT 'out' AS metric, CAST(out_deg AS DOUBLE) AS deg FROM degs
      UNION ALL
      SELECT 'total' AS metric, CAST(in_deg + out_deg AS DOUBLE) AS deg FROM degs
    ),
    dp_hist AS (
      SELECT metric, deg, CAST(count(*) AS DOUBLE) AS cnt
      FROM dp_melt WHERE deg >= 1 GROUP BY 1, 2
    ),
    dp_s AS (
      SELECT metric, count(*) AS n,
             sum(ln(deg)) AS sx, sum(ln(cnt)) AS sy,
             sum(ln(deg) * ln(cnt)) AS sxy,
             sum(ln(deg) * ln(deg)) AS sxx,
             sum(ln(cnt) * ln(cnt)) AS syy
      FROM dp_hist GROUP BY metric
    )
    SELECT metric,
           round(CASE WHEN n * sxx - sx * sx > 0
                 THEN -(n * sxy - sx * sy) / (n * sxx - sx * sx)
                 ELSE 0.0 END, 6) AS alpha,
           round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                 THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 ELSE 0.0 END, 6) AS r2,
           n AS n_points
    FROM dp_s
    """


def degree_uniqueness(graph: LinkGraph) -> DataFrame:
    """→ [class_size, n_classes, n_vertices, frac] — anonymity-set sizes
    of the degree signature ``(out_deg, in_deg)``: how many signature
    classes have exactly ``class_size`` members, and what share of all
    vertices sits in classes of that size. The structural
    de-anonymization risk report for a link graph (a vertex in a
    ``class_size = 1`` row is uniquely re-identifiable from its degree
    pair alone — the seed signature of Narayanan–Shmatikov-style graph
    re-identification); the same histogram also tells a sampling pipeline
    how much degree-stratified diversity the graph actually has. Engine
    addition (the reference stores per-vertex state only).

    Scale shape: two map-side-combinable aggregates, each collapsing
    BEFORE any wide state — V rows → |signatures| rows (Zipf-bounded:
    degree pairs are small integers) → |distinct class sizes| rows. The
    ``frac`` normaliser is a 1-row broadcast. No window, no join against
    V, no iteration.
    """
    sig = graph.degrees.groupBy("out_deg", "in_deg").agg(
        F.count("*").alias("class_size")
    )
    by_size = sig.groupBy("class_size").agg(
        F.count("*").alias("n_classes"),
        F.sum("class_size").alias("n_vertices"),
    )
    tot = by_size.agg(F.sum("n_vertices").alias("_t"))
    return by_size.crossJoin(F.broadcast(tot)).select(
        "class_size",
        "n_classes",
        "n_vertices",
        F.round(F.col("n_vertices") * 1.0 / F.col("_t"), 6).alias("frac"),
    )


def degree_uniqueness_sql() -> str:
    """DuckDB oracle body (expects the ``degs`` CTE in scope)."""
    return """
    du_sig AS (
      SELECT out_deg, in_deg, count(*) AS class_size
      FROM degs GROUP BY 1, 2
    ),
    du_sz AS (
      SELECT class_size, count(*) AS n_classes,
             CAST(sum(class_size) AS BIGINT) AS n_vertices
      FROM du_sig GROUP BY 1
    ),
    du_t AS (SELECT sum(n_vertices) AS t FROM du_sz)
    SELECT class_size, n_classes, n_vertices,
           round(n_vertices * 1.0 / t, 6) AS frac
    FROM du_sz CROSS JOIN du_t
    """


def skew_profile(graph: LinkGraph, key: str = "dst") -> DataFrame:
    """→ one-row ``[n_rows, n_keys, max_cnt, avg_cnt, p50_cnt, p99_cnt,
    skew_factor]`` — the shuffle-key skew diagnostic run before any big
    join/aggregate ships: per-key row counts summarized as max / mean /
    exact percentiles, with ``skew_factor = max/mean`` (the number that
    decides between a plain hash join, AQE skew handling, and explicit
    salting; p99 vs max distinguishes a heavy tail from a single cliff
    key). Defaults to ``dst`` — the PageRank gather key, this engine's
    hottest shuffle.

    Scale shape: one map-side-combined count per key, then ONE O(keys)
    aggregate computing every statistic (exact ``percentile`` — same
    linear interpolation as the oracle's ``quantile_cont``). Output is a
    single row regardless of table size.
    """
    cnt = graph.edges.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("c"))
    one = cnt.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("c").alias("max_cnt"),
        F.avg("c").alias("_avg"),
        F.expr("percentile(c, 0.5D)").alias("_p50"),
        F.expr("percentile(c, 0.99D)").alias("_p99"),
    )
    return one.select(
        "n_rows",
        "n_keys",
        "max_cnt",
        F.round("_avg", 6).alias("avg_cnt"),
        F.round("_p50", 6).alias("p50_cnt"),
        F.round("_p99", 6).alias("p99_cnt"),
        F.round(
            F.when(F.col("_avg") > 0, F.col("max_cnt") / F.col("_avg")), 6
        ).alias("skew_factor"),
    )


def skew_profile_sql(key: str = "dst") -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return f"""sk_cnt AS (
      SELECT {key} AS k, count(*) AS c FROM edges GROUP BY 1
    )
    SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_rows,
           count(*) AS n_keys,
           max(c) AS max_cnt,
           round(avg(c), 6) AS avg_cnt,
           round(quantile_cont(c, 0.5), 6) AS p50_cnt,
           round(quantile_cont(c, 0.99), 6) AS p99_cnt,
           round(CASE WHEN avg(c) > 0 THEN max(c) / avg(c) END, 6) AS skew_factor
    FROM sk_cnt
    """


def motif_significance(graph: LinkGraph) -> DataFrame:
    """→ one-row ``[n_vertices, n_edges_und, n_triangles, n_wedges,
    clustering, er_p, lift]`` — the global clustering coefficient
    3·T/W next to its Erdős–Rényi null expectation (the edge density
    p = 2m/(n(n−1)), which IS the expected clustering of a random graph
    with the same n, m) and their ratio. ``lift`` ≫ 1 is the one-number
    "this graph has real community structure" test (social/link graphs
    run 10²–10⁵); lift ≈ 1 means the wedge closure is explainable by
    density alone — the triage BEFORE spending a cluster pass on
    community detection. NULL clustering/lift when the graph has no
    wedges (no vertex of degree ≥ 2).

    Scale shape: the degree-ordered triangle count (O(E^1.5) wedge
    bound), one undirected-degree aggregate for W = Σ d(d−1)/2, and
    constant-size cross joins of one-row aggregates — nothing keyed by
    vertex survives past the two base aggregates. ``lift`` is computed
    as (3T/W)·((n(n−1))/(2m)) so no integer product leaves the double
    mantissa even at 10⁹ vertices.
    """
    from linkgraph_spark.kernels.triangles import _oriented, _triangles

    und = _oriented(graph.edges)
    tri_cnt = _triangles(graph.edges).agg(F.count("*").alias("t"))
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    base = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1)).alias("w2"),  # 2·W
    )
    m_row = und.agg(F.count("*").alias("m"))
    n_row = graph.vertices.agg(F.count("*").alias("n"))
    joined = n_row.crossJoin(m_row).crossJoin(base).crossJoin(tri_cnt)
    cl = F.when(
        F.col("w2") > 0, 3.0 * F.col("t") / (F.col("w2") / 2.0)
    )
    erp = F.when(
        (F.col("n") > 1) & (F.col("m") > 0),
        2.0 * F.col("m") / (F.col("n") * (F.col("n") - 1.0)),
    )
    return joined.select(
        F.col("n").alias("n_vertices"),
        F.col("m").alias("n_edges_und"),
        F.col("t").alias("n_triangles"),
        (F.col("w2") / F.lit(2)).cast("long").alias("n_wedges"),
        F.round(cl, 6).alias("clustering"),
        F.round(erp, 9).alias("er_p"),
        F.round(
            cl * ((F.col("n") * (F.col("n") - 1.0)) / (2.0 * F.col("m"))), 6
        ).alias("lift"),
    )


def motif_significance_sql() -> str:
    """DuckDB oracle body for :func:`motif_significance` (expects
    ``verts``/``edges`` CTEs; triangle CTE inlined, clustering_coefficient
    convention)."""
    return """
    ms_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    ms_tri AS (
      SELECT count(*) AS t FROM (
        SELECT 1 FROM ms_und e1
        JOIN ms_und e2 ON e1.b = e2.a
        JOIN ms_und e3 ON e3.a = e1.a AND e3.b = e2.b
      )
    ),
    ms_deg AS (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM ms_und UNION ALL SELECT b FROM ms_und
      ) GROUP BY id
    ),
    ms_w AS (SELECT sum(deg * (deg - 1)) AS w2 FROM ms_deg),
    ms_m AS (SELECT count(*) AS m FROM ms_und),
    ms_n AS (SELECT count(*) AS n FROM verts)
    SELECT n.n AS n_vertices,
           m.m AS n_edges_und,
           t.t AS n_triangles,
           CAST(w.w2 / 2 AS BIGINT) AS n_wedges,
           round(CASE WHEN w.w2 > 0 THEN 3.0 * t.t / (w.w2 / 2.0) END, 6)
             AS clustering,
           round(CASE WHEN n.n > 1 AND m.m > 0
                 THEN 2.0 * m.m / (n.n * (n.n - 1.0)) END, 9) AS er_p,
           round((CASE WHEN w.w2 > 0 THEN 3.0 * t.t / (w.w2 / 2.0) END)
                 * ((n.n * (n.n - 1.0)) / (2.0 * m.m)), 6) AS lift
    FROM ms_n n CROSS JOIN ms_m m CROSS JOIN ms_w w CROSS JOIN ms_tri t
    """


def rank_concentration(ranks: DataFrame, fracs: tuple = (0.01, 0.10)) -> DataFrame:
    """→ one-row ``[n, hhi, max_share, share_top1pct, share_top10pct, …]``
    — how concentrated the PageRank (or any score) mass is: the
    Herfindahl–Hirschman index Σ(r/T)², the single largest holder's
    share, and for each ``f`` in ``fracs`` the mass share held ABOVE the
    (1−f) exact quantile of the score (column named ``share_top{f%}``).
    On web graphs rank mass is notoriously top-heavy — this is the
    one-row audit that says whether serving/caching can win by pinning
    the top 1 %, and (pipeline-side) whether rank-weighted sampling will
    be dominated by a handful of hubs.

    Semantics note: "top f" is quantile-THRESHOLD based (strictly
    greater than the interpolated (1−f) quantile), not a row-count
    top-k — ties at the threshold are excluded together, keeping the
    number deterministic without a global sort.

    Scale shape: ONE aggregate computes T, Σr², max and every quantile
    threshold (Spark ``percentile`` sorts once per group internally);
    one conditional re-aggregate computes the above-threshold masses.
    No window over V rows, no global sort in the plan.
    """
    if not fracs or any(not 0 < f < 1 for f in fracs):
        raise ValueError(f"fracs must be in (0, 1), got {fracs!r}")
    arr = ", ".join(f"{1.0 - float(f)}D" for f in fracs)
    base = ranks.agg(
        F.count("*").alias("n"),
        F.sum("rank").alias("t"),
        F.sum(F.col("rank") * F.col("rank")).alias("r2"),
        F.max("rank").alias("mx"),
        F.expr(f"percentile(rank, array({arr}))").alias("qs"),
    )
    joined = ranks.crossJoin(F.broadcast(base))
    shares = [
        F.round(
            F.sum(
                F.when(
                    F.col("rank") > F.element_at("qs", i + 1), F.col("rank")
                ).otherwise(F.lit(0.0))
            )
            / F.first("t"),
            6,
        ).alias(f"share_top{_pct_name(f)}")
        for i, f in enumerate(fracs)
    ]
    return joined.groupBy().agg(
        F.first("n").alias("n"),
        F.round(F.first("r2") / (F.first("t") * F.first("t")), 6).alias("hhi"),
        F.round(F.first("mx") / F.first("t"), 6).alias("max_share"),
        *shares,
    )


def _pct_name(f: float) -> str:
    s = f"{float(f) * 100:g}".replace(".", "_")
    return f"{s}pct"


def rank_concentration_sql(
    ranks_cte: str, fracs: tuple = (0.01, 0.10), rank_col: str = "rank"
) -> str:
    """DuckDB oracle body for :func:`rank_concentration` (expects the
    ranks CTE in scope; same quantile-threshold semantics)."""
    base_qs = ", ".join(
        f"quantile_cont({rank_col}, {1.0 - float(f)}) AS q{i}"
        for i, f in enumerate(fracs)
    )
    shares = ", ".join(
        f"""round(sum(CASE WHEN r.{rank_col} > b.q{i}
                 THEN r.{rank_col} ELSE 0.0 END) / first(b.t), 6)
             AS share_top{_pct_name(f)}"""
        for i, f in enumerate(fracs)
    )
    return f"""
    rc_base AS (
      SELECT count(*) AS n, sum({rank_col}) AS t,
             sum({rank_col} * {rank_col}) AS r2,
             max({rank_col}) AS mx, {base_qs}
      FROM {ranks_cte}
    )
    SELECT first(b.n) AS n,
           round(first(b.r2) / (first(b.t) * first(b.t)), 6) AS hhi,
           round(first(b.mx) / first(b.t), 6) AS max_share,
           {shares}
    FROM {ranks_cte} r CROSS JOIN rc_base b
    """


def rank_by_degree(ranks: DataFrame, graph: LinkGraph) -> DataFrame:
    """→ ``[in_deg, n_vertices, avg_rank, rank_share]`` — the
    rank-vs-in-degree calibration curve: for every distinct in-degree,
    how many vertices hold it, their mean score, and their share of the
    total score mass. :func:`centrality_degree_corr` gives the one-number
    "is rank just degree?"; this is the full curve that shows WHERE they
    diverge (the whole point of PageRank over raw in-degree is the
    high-rank/low-degree rows — pages endorsed by important pages).

    Scale shape: one equi-join of the O(V) rank table to the degree
    table, one grouped aggregate on the integer ``in_deg`` key (Zipf:
    ≪ V distinct values, map-side combinable), then the share
    normalization as a window over the tiny degree histogram.
    """
    joined = ranks.join(graph.degrees.select("id", "in_deg"), "id")
    agg = joined.groupBy("in_deg").agg(
        F.count("*").alias("n_vertices"),
        F.round(F.avg("rank"), 6).alias("avg_rank"),
        F.sum("rank").alias("_mass"),
    )
    w = Window.partitionBy()
    return agg.select(
        "in_deg",
        "n_vertices",
        "avg_rank",
        F.round(F.col("_mass") / F.sum("_mass").over(w), 6).alias("rank_share"),
    )


def rank_by_degree_sql(ranks_cte: str) -> str:
    """DuckDB oracle body for :func:`rank_by_degree` (expects the ranks
    CTE and ``degs`` in scope)."""
    return f"""
    rbd_agg AS (
      SELECT d.in_deg, count(*) AS n_vertices,
             round(avg(r.rank), 6) AS avg_rank,
             sum(r.rank) AS _mass
      FROM {ranks_cte} r JOIN degs d ON d.id = r.id
      GROUP BY d.in_deg
    )
    SELECT in_deg, n_vertices, avg_rank,
           round(_mass / (sum(_mass) OVER ()), 6) AS rank_share
    FROM rbd_agg
    """


def _neighbor_avg(graph: LinkGraph) -> DataFrame:
    """Per-vertex ``[id, deg, nb_avg]`` over the symmetrised simple graph:
    undirected degree and the mean degree of the vertex's neighbors.
    Shared base for :func:`friendship_paradox` and
    :func:`avg_neighbor_degree`.

    Scale shape: one E-sized equi-join (attach the neighbor's degree to
    each directed half-edge) and one grouped aggregate keyed by vertex —
    a hub's edges are ordinary rows, nothing collects a neighborhood
    into one task.
    """
    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy(F.col("a").alias("id")).agg(F.count("*").alias("deg"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    return (
        both.join(db, "b")
        .groupBy(F.col("a").alias("id"))
        .agg(F.count("*").alias("deg"), F.avg("deg_b").alias("nb_avg"))
    )


def friendship_paradox(graph: LinkGraph) -> DataFrame:
    """→ one-row ``[n_vertices, mean_deg, mean_neighbor_deg,
    edge_pov_deg, paradox_frac]`` — the Feld (1991) friendship-paradox
    audit over the symmetrised simple graph: the vertex-mean degree, the
    mean over vertices of their neighbors' mean degree, the degree of a
    random EDGE endpoint (Σd²/Σd — what a crawler that follows links
    actually samples), and the fraction of vertices whose neighbors
    average more links than they have. ``edge_pov_deg / mean_deg`` =
    1 + CV² is the sampling-bias factor a link-following crawl suffers;
    on hub-and-spoke transcript graphs ``paradox_frac`` near 1 is the
    expected signature.

    Isolated vertices (no surviving simple edge) have no neighbors and
    drop out of the per-vertex table — all five numbers describe the
    non-isolated population, matching the SQL mirror exactly.

    Scale shape: :func:`_neighbor_avg` (one join + one grouped agg) then
    a single global aggregate — no windows, no iteration.
    """
    nb = _neighbor_avg(graph)
    return nb.agg(
        F.count("*").alias("n_vertices"),
        F.round(F.avg("deg"), 6).alias("mean_deg"),
        F.round(F.avg("nb_avg"), 6).alias("mean_neighbor_deg"),
        F.round(
            F.sum(F.col("deg") * F.col("deg")) / F.sum("deg"), 6
        ).alias("edge_pov_deg"),
        F.round(
            F.avg(F.when(F.col("nb_avg") > F.col("deg"), 1.0).otherwise(0.0)), 6
        ).alias("paradox_frac"),
    )


def friendship_paradox_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return """
    fp_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    fp_both AS (
      SELECT a, b FROM fp_und UNION ALL SELECT b AS a, a AS b FROM fp_und
    ),
    fp_deg AS (SELECT a AS id, count(*) AS deg FROM fp_both GROUP BY a),
    fp_nb AS (
      SELECT e.a AS id, count(*) AS deg, avg(d.deg) AS nb_avg
      FROM fp_both e JOIN fp_deg d ON d.id = e.b
      GROUP BY e.a
    )
    SELECT count(*) AS n_vertices,
           round(avg(deg), 6) AS mean_deg,
           round(avg(nb_avg), 6) AS mean_neighbor_deg,
           round(sum(deg * deg) * 1.0 / sum(deg), 6) AS edge_pov_deg,
           round(avg(CASE WHEN nb_avg > deg THEN 1.0 ELSE 0.0 END), 6)
             AS paradox_frac
    FROM fp_nb
    """


def avg_neighbor_degree(graph: LinkGraph) -> DataFrame:
    """→ ``[deg, n_vertices, avg_nb_deg]`` — the Pastor-Satorras/Vázquez
    knn(k) curve: for every distinct undirected degree, how many vertices
    hold it and the mean over them of their neighbors' mean degree. The
    full-curve companion of :func:`degree_assortativity`'s one number —
    a falling curve (disassortative) shows WHERE hubs attach to leaves,
    and a knee flags a degree band with anomalous wiring (link farms
    interconnect; organic hubs don't).

    Scale shape: :func:`_neighbor_avg` then one grouped aggregate on the
    integer degree key (Zipf: ≪ V distinct values, map-side combinable).
    Output is one row per distinct degree.
    """
    nb = _neighbor_avg(graph)
    return nb.groupBy("deg").agg(
        F.count("*").alias("n_vertices"),
        F.round(F.avg("nb_avg"), 6).alias("avg_nb_deg"),
    )


def avg_neighbor_degree_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return """
    an_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    an_both AS (
      SELECT a, b FROM an_und UNION ALL SELECT b AS a, a AS b FROM an_und
    ),
    an_deg AS (SELECT a AS id, count(*) AS deg FROM an_both GROUP BY a),
    an_nb AS (
      SELECT e.a AS id, count(*) AS deg, avg(d.deg) AS nb_avg
      FROM an_both e JOIN an_deg d ON d.id = e.b
      GROUP BY e.a
    )
    SELECT deg, count(*) AS n_vertices, round(avg(nb_avg), 6) AS avg_nb_deg
    FROM an_nb GROUP BY deg
    """


def rank_smoothness(ranks: DataFrame, graph: LinkGraph) -> DataFrame:
    """→ one-row ``[n_edges, energy, smoothness]`` — how smooth the rank
    signal is over the undirected simple graph: the Dirichlet energy
    Σ_{(a,b)∈E} (r_a − r_b)² and its Rayleigh normalization
    energy / Σ_{(a,b)∈E} (r_a² + r_b²) (= xᵀLx / xᵀDx ∈ [0, 2]; 0 means
    neighbors hold identical rank, 1 is what uncorrelated signs would
    give, → 2 is perfectly alternating). Low smoothness says rank
    diffuses along links (the PageRank fixpoint should be smooth-ish);
    a jump after an ingest says the new edges wire together vertices
    with wildly different authority — the classic link-spam splice.

    ``smoothness`` is NULL when the denominator is 0 (empty edge set or
    an all-zero signal); both engines pin the same.

    Scale shape: two E-sized equi-joins to attach endpoint ranks (int
    key, broadcast-or-hash) and ONE global aggregate computing numerator
    and denominator together — the denominator Σ(r_a²+r_b²) over edges
    equals Σ_v deg_v·r_v² without a second degree join. No windows, no
    iteration.
    """
    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    ra = ranks.select(F.col("id").alias("a"), F.col("rank").alias("ra"))
    rb = ranks.select(F.col("id").alias("b"), F.col("rank").alias("rb"))
    j = und.join(ra, "a").join(rb, "b")
    d = F.col("ra") - F.col("rb")
    agg = j.agg(
        F.count("*").alias("n_edges"),
        F.sum(d * d).alias("_num"),
        F.sum(F.col("ra") * F.col("ra") + F.col("rb") * F.col("rb")).alias("_den"),
    )
    return agg.select(
        "n_edges",
        F.round("_num", 9).alias("energy"),
        F.round(
            F.when(F.col("_den") > 0, F.col("_num") / F.col("_den")), 6
        ).alias("smoothness"),
    )


def rank_smoothness_sql(ranks_cte: str) -> str:
    """DuckDB oracle body for :func:`rank_smoothness` (expects the
    ``edges`` CTE and the ranks CTE in scope)."""
    return f"""
    rs_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    rs_j AS (
      SELECT ra.rank AS ra, rb.rank AS rb
      FROM rs_und e
      JOIN {ranks_cte} ra ON ra.id = e.a
      JOIN {ranks_cte} rb ON rb.id = e.b
    ),
    rs_agg AS (
      SELECT count(*) AS n_edges,
             sum((ra - rb) * (ra - rb)) AS num,
             sum(ra * ra + rb * rb) AS den
      FROM rs_j
    )
    SELECT n_edges, round(num, 9) AS energy,
           CASE WHEN den > 0 THEN round(num / den, 6) END AS smoothness
    FROM rs_agg
    """


def joint_degree_matrix(graph: LinkGraph) -> DataFrame:
    """→ ``[deg_a, deg_b, n_edges]`` — the joint degree matrix e_jk: for
    every ordered pair of undirected degrees, how many directed
    half-edges connect a deg_a vertex to a deg_b one (each undirected
    simple edge contributes both orientations, so the matrix is
    symmetric and sums to 2·|E|). This is the 2-D histogram that
    :func:`degree_assortativity` collapses to one number and
    :func:`avg_neighbor_degree` to one curve — the full wiring table
    that separates "hubs avoid each other" from "hubs form a clique
    plus leaves" at equal assortativity.

    Scale shape: two E-sized equi-joins to attach endpoint degrees and
    one grouped aggregate on the (deg_a, deg_b) integer pair (Zipf²-
    bounded distinct keys, map-side combinable). No windows.
    """
    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy(F.col("a").alias("id")).agg(F.count("*").alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    return (
        both.join(da, "a")
        .join(db, "b")
        .groupBy("deg_a", "deg_b")
        .agg(F.count("*").alias("n_edges"))
    )


def joint_degree_matrix_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return """
    jd_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    jd_both AS (
      SELECT a, b FROM jd_und UNION ALL SELECT b AS a, a AS b FROM jd_und
    ),
    jd_deg AS (SELECT a AS id, count(*) AS deg FROM jd_both GROUP BY a)
    SELECT da.deg AS deg_a, db.deg AS deg_b, count(*) AS n_edges
    FROM jd_both e
    JOIN jd_deg da ON da.id = e.a
    JOIN jd_deg db ON db.id = e.b
    GROUP BY 1, 2
    """


def directed_assortativity(graph: LinkGraph) -> DataFrame:
    """→ one-row ``[r_out_in, r_out_out, r_in_in, r_in_out]`` — the four
    directed degree-assortativity coefficients of Foster et al. (PNAS
    2010): over the simple directed edge list, the Pearson correlation
    between (α-degree of src, β-degree of dst) for every (α, β) in
    {out, in}². The undirected :func:`degree_assortativity` collapses
    direction; these four separate "prolific linkers target popular
    pages" (out→in) from "popular pages link popular pages" (in→in) —
    on transcript graphs the out→in mode is the one that flips sign
    when broadcast tools enter.

    Zero-variance modes are NULL (same explicit covar/stddev guard as
    the undirected estimator — ANSI ``corr`` would raise where DuckDB
    returns NULL).

    Scale shape: one degree aggregate over E, two E-sized equi-joins to
    attach the src/dst degree pairs, ONE global moment aggregate
    computing all four coefficients together. No windows.
    """
    e = _simple_directed(graph.edges)
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("od"))
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("idg"))
    deg = (
        outd.join(ind, "id", "full")
        .select(
            "id",
            F.coalesce("od", F.lit(0)).alias("od"),
            F.coalesce("idg", F.lit(0)).alias("idg"),
        )
    )
    j = (
        e.join(
            deg.select(
                F.col("id").alias("src"),
                F.col("od").alias("s_out"),
                F.col("idg").alias("s_in"),
            ),
            "src",
        )
        .join(
            deg.select(
                F.col("id").alias("dst"),
                F.col("od").alias("d_out"),
                F.col("idg").alias("d_in"),
            ),
            "dst",
        )
    )
    mom = j.agg(
        F.covar_pop("s_out", "d_in").alias("c_oi"),
        F.covar_pop("s_out", "d_out").alias("c_oo"),
        F.covar_pop("s_in", "d_in").alias("c_ii"),
        F.covar_pop("s_in", "d_out").alias("c_io"),
        F.stddev_pop("s_out").alias("so"),
        F.stddev_pop("s_in").alias("si"),
        F.stddev_pop("d_out").alias("do"),
        F.stddev_pop("d_in").alias("di"),
    )
    r = lambda cv, a, b: F.round(  # noqa: E731
        F.when((F.col(a) > 0) & (F.col(b) > 0), F.col(cv) / (F.col(a) * F.col(b))),
        6,
    )
    return mom.select(
        r("c_oi", "so", "di").alias("r_out_in"),
        r("c_oo", "so", "do").alias("r_out_out"),
        r("c_ii", "si", "di").alias("r_in_in"),
        r("c_io", "si", "do").alias("r_in_out"),
    )


def directed_assortativity_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return """
    dr_e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    ),
    dr_deg AS (
      SELECT coalesce(o.id, i.id) AS id,
             coalesce(o.od, 0) AS od, coalesce(i.idg, 0) AS idg
      FROM (SELECT src AS id, count(*) AS od FROM dr_e GROUP BY src) o
      FULL JOIN (SELECT dst AS id, count(*) AS idg FROM dr_e GROUP BY dst) i
        ON i.id = o.id
    ),
    dr_j AS (
      SELECT s.od AS s_out, s.idg AS s_in, d.od AS d_out, d.idg AS d_in
      FROM dr_e e
      JOIN dr_deg s ON s.id = e.src
      JOIN dr_deg d ON d.id = e.dst
    ),
    dr_m AS (
      SELECT covar_pop(s_out, d_in) AS c_oi, covar_pop(s_out, d_out) AS c_oo,
             covar_pop(s_in, d_in) AS c_ii, covar_pop(s_in, d_out) AS c_io,
             stddev_pop(s_out) AS so, stddev_pop(s_in) AS si,
             stddev_pop(d_out) AS dd, stddev_pop(d_in) AS di
      FROM dr_j
    )
    SELECT
      CASE WHEN so > 0 AND di > 0 THEN round(c_oi / (so * di), 6) END AS r_out_in,
      CASE WHEN so > 0 AND dd > 0 THEN round(c_oo / (so * dd), 6) END AS r_out_out,
      CASE WHEN si > 0 AND di > 0 THEN round(c_ii / (si * di), 6) END AS r_in_in,
      CASE WHEN si > 0 AND dd > 0 THEN round(c_io / (si * dd), 6) END AS r_in_out
    FROM dr_m
    """


def hub_overlap(graph: LinkGraph, k: int = 10) -> DataFrame:
    """→ ``[hub_a, hub_b, deg_a, deg_b, inter, jaccard]`` — pairwise
    out-neighborhood Jaccard between the ``k`` highest-out-degree
    vertices (degree ties break by id ascending; all C(k,2) pairs
    emitted, zero-intersection ones included). High overlap between
    "hubs" means they broadcast to the same audience — redundant
    mirrors / a link farm sharing a target pool; organic hubs overlap
    little. The audit behind any "cover the graph from k seeds" plan.

    Scale shape: the hub list is a k-row TakeOrdered (broadcast
    everywhere after); neighbor sets are the hubs' OWN edges only
    (≤ k·max_deg rows), intersected via one equi-join on the neighbor
    id and grouped per pair — the full k×k pair frame is k² rows.
    Nothing touches non-hub edges.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    e = _simple_directed(graph.edges)
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    hubs = deg.orderBy(F.desc("deg"), F.asc("id")).limit(k)
    nb = e.join(
        F.broadcast(hubs.select(F.col("id").alias("src"))), "src"
    ).select(F.col("src").alias("hub"), "dst")
    inter = (
        nb.alias("a")
        .join(nb.alias("b"), "dst")
        .where(F.col("a.hub") < F.col("b.hub"))
        .groupBy(
            F.col("a.hub").alias("hub_a"), F.col("b.hub").alias("hub_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    ha = hubs.select(F.col("id").alias("hub_a"), F.col("deg").alias("deg_a"))
    hb = hubs.select(F.col("id").alias("hub_b"), F.col("deg").alias("deg_b"))
    pairs = ha.crossJoin(hb).where(F.col("hub_a") < F.col("hub_b"))
    return (
        pairs.join(inter, ["hub_a", "hub_b"], "left")
        .select(
            "hub_a",
            "hub_b",
            "deg_a",
            "deg_b",
            F.coalesce("inter", F.lit(0)).alias("inter"),
            F.round(
                F.coalesce("inter", F.lit(0))
                / (F.col("deg_a") + F.col("deg_b") - F.coalesce("inter", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def hub_overlap_sql(k: int = 10) -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    K = int(k)
    return f"""
    ho_e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    ),
    ho_deg AS (SELECT src AS id, count(*) AS deg FROM ho_e GROUP BY src),
    ho_hubs AS (
      SELECT id, deg FROM ho_deg ORDER BY deg DESC, id LIMIT {K}
    ),
    ho_nb AS (
      SELECT e.src AS hub, e.dst FROM ho_e e
      JOIN ho_hubs h ON h.id = e.src
    ),
    ho_int AS (
      SELECT a.hub AS hub_a, b.hub AS hub_b, count(*) AS inter
      FROM ho_nb a JOIN ho_nb b ON b.dst = a.dst AND a.hub < b.hub
      GROUP BY a.hub, b.hub
    )
    SELECT ha.id AS hub_a, hb.id AS hub_b, ha.deg AS deg_a, hb.deg AS deg_b,
           coalesce(i.inter, 0) AS inter,
           round(coalesce(i.inter, 0) * 1.0
                 / (ha.deg + hb.deg - coalesce(i.inter, 0)), 6) AS jaccard
    FROM ho_hubs ha
    JOIN ho_hubs hb ON ha.id < hb.id
    LEFT JOIN ho_int i ON i.hub_a = ha.id AND i.hub_b = hb.id
    """


def flow_roles(graph: LinkGraph) -> DataFrame:
    """→ ``[role, n_vertices, avg_out, avg_in]`` — the directed-flow
    census over the simple edge list: every vertex classified as
    ``source`` (emits, never receives), ``sink`` (receives, never
    emits), ``relay`` (both), or ``isolated`` (neither — in the vertex
    universe but off the simple graph). Crawl graphs should be
    relay-dominated; a source-heavy census is a spray pattern (spam
    injection), a sink-heavy one a harvest pattern. The four-row
    summary a flow audit starts from.

    Scale shape: two degree aggregates over E, one full-outer id join,
    one O(V) join to the vertex universe, one 4-key histogram
    aggregate. No windows.
    """
    e = _simple_directed(graph.edges)
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("od"))
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("idg"))
    deg = (
        graph.vertices.select("id")
        .join(outd, "id", "left")
        .join(ind, "id", "left")
        .select(
            "id",
            F.coalesce("od", F.lit(0)).alias("od"),
            F.coalesce("idg", F.lit(0)).alias("idg"),
        )
    )
    role = (
        F.when((F.col("od") > 0) & (F.col("idg") > 0), "relay")
        .when(F.col("od") > 0, "source")
        .when(F.col("idg") > 0, "sink")
        .otherwise("isolated")
    )
    return deg.groupBy(role.alias("role")).agg(
        F.count("*").alias("n_vertices"),
        F.round(F.avg("od"), 6).alias("avg_out"),
        F.round(F.avg("idg"), 6).alias("avg_in"),
    )


def flow_roles_sql() -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs in scope)."""
    return """
    fr_e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    ),
    fr_deg AS (
      SELECT v.id, coalesce(o.od, 0) AS od, coalesce(i.idg, 0) AS idg
      FROM verts v
      LEFT JOIN (SELECT src AS id, count(*) AS od FROM fr_e GROUP BY src) o
        ON o.id = v.id
      LEFT JOIN (SELECT dst AS id, count(*) AS idg FROM fr_e GROUP BY dst) i
        ON i.id = v.id
    )
    SELECT CASE WHEN od > 0 AND idg > 0 THEN 'relay'
                WHEN od > 0 THEN 'source'
                WHEN idg > 0 THEN 'sink'
                ELSE 'isolated' END AS role,
           count(*) AS n_vertices,
           round(avg(od), 6) AS avg_out,
           round(avg(idg), 6) AS avg_in
    FROM fr_deg
    GROUP BY 1
    """


def strength_percentiles(
    graph: LinkGraph, ps: tuple = (0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
) -> DataFrame:
    """→ ``[p, out_str_pct, in_str_pct]`` — exact linear-interpolation
    percentiles of vertex STRENGTH (summed edge multiplicity/weight, in
    and out, zero for vertices off that side) over the weighted graph.
    The capacity-planning companion of :func:`degree_percentiles`: a p99
    degree that looks tame can hide a strength cliff when one hub's
    edges carry 1000× multiplicity — strength, not degree, is what a
    weighted gather actually shuffles.

    Requires ``weighted=True`` edges (a ``weight`` column).

    Scale shape: two E-sized grouped sums, one O(V) join onto the
    vertex universe, ONE percentile aggregate computing every requested
    quantile, |ps| output rows.
    """
    if "weight" not in graph.edges.columns:
        raise ValueError("strength_percentiles needs a weighted graph "
                         "(build_graph(..., weighted=True))")
    outs = graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("os")
    )
    ins = graph.edges.groupBy(F.col("dst").alias("id")).agg(
        F.sum("weight").alias("is_")
    )
    s = (
        graph.vertices.select("id")
        .join(outs, "id", "left")
        .join(ins, "id", "left")
        .select(
            F.coalesce("os", F.lit(0)).cast("double").alias("os"),
            F.coalesce("is_", F.lit(0)).cast("double").alias("is_"),
        )
    )
    arr = ", ".join(f"{float(p)}D" for p in ps)
    one = s.agg(
        F.expr(f"percentile(os, array({arr}))").alias("op"),
        F.expr(f"percentile(is_, array({arr}))").alias("ip"),
    )
    rows = [
        F.struct(
            F.lit(float(p)).alias("p"),
            F.round(F.element_at("op", i + 1), 6).alias("out_str_pct"),
            F.round(F.element_at("ip", i + 1), 6).alias("in_str_pct"),
        )
        for i, p in enumerate(ps)
    ]
    return one.select(F.explode(F.array(*rows)).alias("z")).select("z.*")


def strength_percentiles_sql(ps: tuple = (0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) -> str:
    """DuckDB oracle body (expects ``verts`` + ``edges_w`` CTEs in scope)."""
    rows = "\n    UNION ALL ".join(
        f"SELECT CAST({float(p)} AS DOUBLE) AS p,"
        f" round(quantile_cont(os, {float(p)}), 6) AS out_str_pct,"
        f" round(quantile_cont(is_, {float(p)}), 6) AS in_str_pct"
        f" FROM sp_s"
        for p in ps
    )
    return f"""
    sp_s AS MATERIALIZED (
      SELECT CAST(coalesce(o.os, 0) AS DOUBLE) AS os,
             CAST(coalesce(i.is_, 0) AS DOUBLE) AS is_
      FROM verts v
      LEFT JOIN (SELECT src AS id, sum(weight) AS os FROM edges_w GROUP BY src) o
        ON o.id = v.id
      LEFT JOIN (SELECT dst AS id, sum(weight) AS is_ FROM edges_w GROUP BY dst) i
        ON i.id = v.id
    )
    {rows}
    """


def inout_corr(graph: LinkGraph) -> DataFrame:
    """→ one-row ``[n_vertices, corr, frac_in_heavy, frac_balanced]`` —
    does receiving predict sending? The Pearson correlation between each
    vertex's own in- and out-degree over the simple directed graph
    (every vertex on either side counted, missing side = 0), plus the
    share of vertices that are in-heavy (in > out) and exactly balanced.
    :func:`directed_assortativity` asks how degrees mix ACROSS an edge;
    this is the within-vertex version — high correlation is the
    organic-participant signature, low-with-in-heavy-mass the
    harvest/aggregator one. Zero variance → NULL (the usual guard).

    Scale shape: two degree aggregates, one full-outer id join, one
    global moment aggregate. No windows.
    """
    e = _simple_directed(graph.edges)
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("od"))
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("idg"))
    deg = outd.join(ind, "id", "full").select(
        F.coalesce("od", F.lit(0)).alias("od"),
        F.coalesce("idg", F.lit(0)).alias("idg"),
    )
    mom = deg.agg(
        F.count("*").alias("n_vertices"),
        F.covar_pop("od", "idg").alias("cv"),
        F.stddev_pop("od").alias("so"),
        F.stddev_pop("idg").alias("si"),
        F.round(
            F.avg(F.when(F.col("idg") > F.col("od"), 1.0).otherwise(0.0)), 6
        ).alias("frac_in_heavy"),
        F.round(
            F.avg(F.when(F.col("idg") == F.col("od"), 1.0).otherwise(0.0)), 6
        ).alias("frac_balanced"),
    )
    return mom.select(
        "n_vertices",
        F.round(
            F.when(
                (F.col("so") > 0) & (F.col("si") > 0),
                F.col("cv") / (F.col("so") * F.col("si")),
            ),
            6,
        ).alias("corr"),
        "frac_in_heavy",
        "frac_balanced",
    )


def inout_corr_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    return """
    io_e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    ),
    io_deg AS (
      SELECT coalesce(o.od, 0) AS od, coalesce(i.idg, 0) AS idg
      FROM (SELECT src AS id, count(*) AS od FROM io_e GROUP BY src) o
      FULL JOIN (SELECT dst AS id, count(*) AS idg FROM io_e GROUP BY dst) i
        ON i.id = o.id
    ),
    io_m AS (
      SELECT count(*) AS n_vertices, covar_pop(od, idg) AS cv,
             stddev_pop(od) AS so, stddev_pop(idg) AS si,
             round(avg(CASE WHEN idg > od THEN 1.0 ELSE 0.0 END), 6)
               AS frac_in_heavy,
             round(avg(CASE WHEN idg = od THEN 1.0 ELSE 0.0 END), 6)
               AS frac_balanced
      FROM io_deg
    )
    SELECT n_vertices,
           CASE WHEN so > 0 AND si > 0 THEN round(cv / (so * si), 6) END AS corr,
           frac_in_heavy, frac_balanced
    FROM io_m
    """


def burt_constraint(graph: LinkGraph, max_degree: int | None = None) -> DataFrame:
    """→ per-vertex ``[id, deg, constraint_score]`` — Burt's structural-
    holes constraint (Burt 1992) over the simple UNDIRECTED graph with
    uniform tie weights: p_ij = 1/deg_i, and

        C_i = Σ_{j∈N(i)} ( p_ij + Σ_{q∈N(i)∩N(j)} p_iq · p_qj )²

    High constraint = the ego's contacts all know each other (no
    brokerage); low constraint = the ego bridges otherwise-disconnected
    alters. The within-ego complement of :func:`~linkgraph_spark.kernels.
    linkpred.neighborhood_overlap` (which scores one tie): here every
    tie's redundancy is folded into a single ego score.

    ``max_degree`` optionally drops middlemen q with deg_q > cap from the
    indirect term only (the p_iq·p_qj sum) — the same hub knob as
    ``adamic_adar``: a 10⁶-degree hub contributes ≤ deg·(1/deg_i)(1/10⁶)
    per pair yet costs deg² wedge enumerations, so capping changes the
    score negligibly while bounding the join. Direct ties are never
    dropped, so deg and the p_ij term stay exact.

    Scale shape: symmetric-adjacency dedup shuffle, one degree join, one
    wedge equi-join (Σ_q deg_q² paths, hub-cappable), a (i,j)-keyed sum,
    one left join back to ties, one per-vertex sum. No windows, no
    cartesian, no driver loop.
    """
    sym = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("i"), F.col("dst").alias("j"))
        .unionByName(
            graph.edges.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("i"), F.col("src").alias("j")
            )
        )
        .distinct()
    )
    deg = sym.groupBy("i").agg(F.count("*").alias("deg"))
    p = sym.join(deg, "i").select("i", "j", (F.lit(1.0) / F.col("deg")).alias("p"))
    mid = p if max_degree is None else p.join(
        deg.where(F.col("deg") <= int(max_degree)).select("i"), "i"
    )
    a = p.select(F.col("i").alias("ti"), F.col("j").alias("tq"), F.col("p").alias("pa"))
    b = mid.select(F.col("i").alias("tq"), F.col("j").alias("tj"), F.col("p").alias("pb"))
    two = (
        a.join(b, "tq")
        .where(F.col("tj") != F.col("ti"))
        .groupBy(F.col("ti").alias("i"), F.col("tj").alias("j"))
        .agg(F.sum(F.col("pa") * F.col("pb")).alias("ind"))
    )
    # NOTE: the cap keys on the MIDDLEMAN — b's rows are keyed by i = q,
    # so filtering mid by deg_i ≤ cap removes exactly the wedges whose
    # center is a hub; the inner join then drops the a side for free.
    c = p.join(two, ["i", "j"], "left").select(
        "i",
        F.pow(F.col("p") + F.coalesce(F.col("ind"), F.lit(0.0)), F.lit(2.0)).alias("c"),
    )
    return (
        c.groupBy(F.col("i").alias("id"))
        .agg(F.count("*").alias("deg"), F.round(F.sum("c"), 6).alias("constraint_score"))
    )


def burt_constraint_sql(max_degree: int | None = None) -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope)."""
    cap = (
        "bc_p"
        if max_degree is None
        else f"(SELECT p.* FROM bc_p p JOIN bc_deg d ON d.i = p.i "
        f"WHERE d.deg <= {int(max_degree)})"
    )
    return f"""
    bc_sym AS MATERIALIZED (
      SELECT src AS i, dst AS j FROM edges WHERE src <> dst
      UNION
      SELECT dst AS i, src AS j FROM edges WHERE src <> dst
    ),
    bc_deg AS (SELECT i, count(*) AS deg FROM bc_sym GROUP BY i),
    bc_p AS (
      SELECT s.i, s.j, 1.0 / d.deg AS p
      FROM bc_sym s JOIN bc_deg d ON d.i = s.i
    ),
    bc_two AS (
      SELECT a.i AS i, b.j AS j, sum(a.p * b.p) AS ind
      FROM bc_p a JOIN {cap} b ON b.i = a.j AND b.j <> a.i
      GROUP BY a.i, b.j
    ),
    bc_c AS (
      SELECT p.i, pow(p.p + coalesce(t.ind, 0.0), 2) AS c
      FROM bc_p p LEFT JOIN bc_two t ON t.i = p.i AND t.j = p.j
    )
    SELECT i AS id, count(*) AS deg, round(sum(c), 6) AS constraint_score
    FROM bc_c GROUP BY i
    """


# --------------------------------------------------------------- wave 134
def degree_entropy(graph: LinkGraph) -> DataFrame:
    """→ one row [n_vertices, h_degree, h_excess] — Shannon entropy of
    the undirected degree distribution and of the EXCESS-degree
    distribution (the degree of a vertex reached by following a random
    edge, minus the edge you came in on — Newman's q_k ∝ (k+1)p_{k+1}).
    The heterogeneity pair: h_degree says how mixed the degree classes
    are; h_excess − h_degree quantifies the friendship-paradox
    distortion a traversal actually experiences.

    Exactness: the degree histogram is exact; each distribution's
    p·ln p term is MICRO-NAT-quantized per histogram cell before the
    sum (order-invariant — the wave-100 convention), with the excess
    weights' exact integer masses (k+1)·c_{k+1} over S = Σd·c.
    Entropies are the negated quantized sums, rounded 6; a
    single-class distribution scores an exact 0.0. NULL on an empty
    graph.

    Scale shape: one undirected-degree aggregate, one histogram
    aggregate (bounded by distinct degrees), a one-row reduce.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    und = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    h = deg.groupBy("d").agg(F.count("*").alias("c"))
    d38 = "decimal(38,0)"
    base = h.groupBy().agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.col("d").cast(d38) * F.col("c")), F.lit(0).cast(d38)
        ).alias("s"),
    )
    cells = h.crossJoin(F.broadcast(base))
    hd = cells.groupBy().agg(
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(round(1e6 * (CAST(c AS DOUBLE) / n)"
                    " * ln(CAST(c AS DOUBLE) / n), 0) AS BIGINT)"
                )
            ),
            F.lit(0),
        ).alias("qd"),
        # excess-degree weight of class k = d-1 is d*c / s
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(round(1e6"
                    " * (CAST(d AS DOUBLE) * c / CAST(s AS DOUBLE))"
                    " * ln(CAST(d AS DOUBLE) * c / CAST(s AS DOUBLE)), 0)"
                    " AS BIGINT)"
                )
            ),
            F.lit(0),
        ).alias("qx"),
    )
    return base.crossJoin(hd).select(
        F.col("n").alias("n_vertices"),
        F.expr(
            "CASE WHEN n > 0 THEN"
            " round(greatest(0.0, -qd / 1e6), 6) END"
        ).alias("h_degree"),
        F.expr(
            "CASE WHEN s > 0 THEN"
            " round(greatest(0.0, -qx / 1e6), 6) END"
        ).alias("h_excess"),
    )


def degree_entropy_sql() -> str:
    """DuckDB oracle body (expects ``edges`` in scope) — same histogram
    grain, same micro-nat quantization."""
    return """
    den_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    den_deg AS (
      SELECT id, count(*) AS d FROM (
        SELECT a AS id FROM den_und UNION ALL SELECT b FROM den_und
      ) GROUP BY id
    ),
    den_h AS (SELECT d, count(*) AS c FROM den_deg GROUP BY d),
    den_b AS (
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
             coalesce(sum(CAST(d AS HUGEINT) * c), 0) AS s
      FROM den_h
    ),
    den_q AS (
      SELECT coalesce(sum(CAST(round(1e6 * (CAST(c AS DOUBLE) / n)
               * ln(CAST(c AS DOUBLE) / n), 0) AS BIGINT)), 0) AS qd,
             coalesce(sum(CAST(round(1e6
               * (CAST(d AS DOUBLE) * c / CAST(s AS DOUBLE))
               * ln(CAST(d AS DOUBLE) * c / CAST(s AS DOUBLE)), 0)
               AS BIGINT)), 0) AS qx
      FROM den_h CROSS JOIN den_b
    )
    SELECT n AS n_vertices,
           CASE WHEN n > 0 THEN round(greatest(0.0, -qd / 1e6), 6) END
             AS h_degree,
           CASE WHEN s > 0 THEN round(greatest(0.0, -qx / 1e6), 6) END
             AS h_excess
    FROM den_b CROSS JOIN den_q
    """


def clustering_null_model(graph: LinkGraph) -> DataFrame:
    """→ one row [n_vertices, m_edges, observed_gcc, expected_gcc,
    lift] — the global clustering coefficient against its
    CONFIGURATION-MODEL expectation (Newman, SIAM Rev. 2003:
    C_cfg = (⟨k²⟩−⟨k⟩)²/(n⟨k⟩³), which reduces to the EXACT integer
    identity (M₂−M₁)²/M₁³ over degree moment sums): is the observed
    triangle density actual community structure, or just what any
    graph with these hubs would show? lift ≫ 1 = real clustering;
    lift ≈ 1 = hub artifact — the gate to read before celebrating a
    high clustering coefficient on a heavy-tailed graph.

    Exactness: undirected degrees and triangle counts are exact (the
    kernel's degree-ordered enumeration, O(√E) wedge bound per
    vertex); observed = 3T/W with W = Σd(d−1) DIV 2 exact; expected =
    (M₂−M₁)²/M₁³ stages once from exact DECIMAL(38,0)/HUGEINT moment
    sums. NULL observed when no wedges, NULL expected/lift when M₁ = 0
    or the graph is hub-degenerate (expected 0).

    Scale shape: one degree aggregate, the scale-safe triangle
    enumeration, two one-row reduces.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from linkgraph_spark.kernels.triangles import triangles_per_vertex

    und = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    d38 = "decimal(38,0)"
    m = deg.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(
            F.sum(F.col("d").cast(d38)), F.lit(0).cast(d38)
        ).alias("m1"),
        F.coalesce(
            F.sum(F.col("d").cast(d38) * F.col("d")), F.lit(0).cast(d38)
        ).alias("m2"),
    )
    t = triangles_per_vertex(graph).groupBy().agg(
        F.coalesce(F.sum("triangles"), F.lit(0)).cast("long").alias("t3")
    )
    # t3 = sum of per-vertex triangle counts = 3T; wedges W = (m2-m1)/2,
    # so observed = 3T / W = 2*t3 / (m2 - m1)
    obs = (
        "2.0 * CAST(t3 AS DOUBLE)"
        " / (CAST(m2 AS DOUBLE) - CAST(m1 AS DOUBLE))"
    )
    exp_ = (
        "(CAST(m2 AS DOUBLE) - CAST(m1 AS DOUBLE))"
        " * (CAST(m2 AS DOUBLE) - CAST(m1 AS DOUBLE))"
        " / (CAST(m1 AS DOUBLE) * CAST(m1 AS DOUBLE)"
        "    * CAST(m1 AS DOUBLE))"
    )
    return m.crossJoin(t).select(
        F.col("n").alias("n_vertices"),
        F.expr("CAST(m1 DIV 2 AS BIGINT)").alias("m_edges"),
        F.expr(
            f"CASE WHEN m2 > m1 THEN round({obs}, 6) END"
        ).alias("observed_gcc"),
        F.expr(
            f"CASE WHEN m1 > 0 THEN round({exp_}, 6) END"
        ).alias("expected_gcc"),
        F.expr(
            f"CASE WHEN m2 > m1 AND m1 > 0 AND {exp_} > 0"
            f" THEN round(({obs}) / ({exp_}), 6) END"
        ).alias("lift"),
    )


def clustering_null_model_sql() -> str:
    """DuckDB oracle body (expects ``edges``) — same exact moments and
    the inlined oriented-triangle count."""
    obs = (
        "2.0 * CAST(t3 AS DOUBLE)"
        " / (CAST(m2 AS DOUBLE) - CAST(m1 AS DOUBLE))"
    )
    exp_ = (
        "(CAST(m2 AS DOUBLE) - CAST(m1 AS DOUBLE))"
        " * (CAST(m2 AS DOUBLE) - CAST(m1 AS DOUBLE))"
        " / (CAST(m1 AS DOUBLE) * CAST(m1 AS DOUBLE)"
        "    * CAST(m1 AS DOUBLE))"
    )
    return f"""
    cnm_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    cnm_deg AS (
      SELECT id, count(*) AS d FROM (
        SELECT a AS id FROM cnm_und UNION ALL SELECT b FROM cnm_und
      ) GROUP BY id
    ),
    cnm_m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             coalesce(sum(CAST(d AS HUGEINT)), 0) AS m1,
             coalesce(sum(CAST(d AS HUGEINT) * d), 0) AS m2
      FROM cnm_deg
    ),
    cnm_t AS (
      SELECT CAST(3 * count(*) AS BIGINT) AS t3
      FROM cnm_und e1
      JOIN cnm_und e2 ON e1.b = e2.a
      JOIN cnm_und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT n AS n_vertices, CAST(m1 // 2 AS BIGINT) AS m_edges,
           CASE WHEN m2 > m1 THEN round({obs}, 6) END AS observed_gcc,
           CASE WHEN m1 > 0 THEN round({exp_}, 6) END AS expected_gcc,
           CASE WHEN m2 > m1 AND m1 > 0 AND {exp_} > 0
                THEN round(({obs}) / ({exp_}), 6) END AS lift
    FROM cnm_m CROSS JOIN cnm_t
    """


def disparity_backbone(graph: LinkGraph, alpha: float = 0.05) -> DataFrame:
    """→ ``[a, b, weight, alpha, keep]`` — the multiscale disparity-filter
    backbone (Serrano, Boguñá & Vespignani, PNAS 2009, public technique)
    over the weighted undirected collapse of the graph: for every edge and
    each endpoint ``i``, the null p-value that a uniformly random split of
    ``i``'s strength ``s_i`` over its ``k_i`` edges puts at least the
    observed share on this edge is ``(1 − w/s_i)^(k_i − 1)``; the edge's
    ``alpha`` is the MORE significant (smaller) of its two endpoint
    p-values, and ``keep`` marks edges with rounded ``alpha <`` the
    threshold.  Unlike a global weight cut, the filter preserves locally
    dominant edges of low-strength vertices — the right sparsifier for a
    heavy-tailed transcript graph where hub edge weights dwarf everything.

    Degree-1 vertices give ``(1 − 1)^0 = 1`` (never significant on their
    own evidence), the standard treatment.  ``keep`` compares the ROUNDED
    alpha so the flag and the reported number cannot disagree.

    Scale shape: one symmetrize-and-sum shuffle (E rows), one O(V)
    degree/strength aggregate, two hash joins to attach endpoint stats,
    then map-only ``pow`` — no iteration, no fan-out, hub-safe (a hub's
    edges are E rows; nothing enumerates pairs).  Requires a weighted
    graph (``build_graph(..., weighted=True)``).

    Reference provenance: engine extension; the reference's edge pipeline
    drops multiplicity entirely (init_to_s3.py:75-76 first-wins dedup) —
    weighted mode is what makes this filter meaningful.
    """
    if "weight" not in graph.edges.columns:
        raise ValueError("disparity_backbone needs a weighted graph "
                         "(build_graph(..., weighted=True))")
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("weight"))
    )
    vstat = (
        und.select(F.col("a").alias("v"), "weight")
        .unionAll(und.select(F.col("b").alias("v"), "weight"))
        .groupBy("v")
        .agg(F.count("*").alias("k"), F.sum("weight").alias("s"))
    )
    sa = vstat.select(F.col("v").alias("a"), F.col("k").alias("ka"),
                      F.col("s").alias("sa"))
    sb = vstat.select(F.col("v").alias("b"), F.col("k").alias("kb"),
                      F.col("s").alias("sb"))
    w = F.col("weight").cast("double")
    p_a = F.pow(1.0 - w / F.col("sa"), F.col("ka") - 1)
    p_b = F.pow(1.0 - w / F.col("sb"), F.col("kb") - 1)
    out = (
        und.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            "weight",
            F.round(F.least(p_a, p_b), 6).alias("alpha"),
        )
        .select(
            "a", "b", "weight", "alpha",
            (F.col("alpha") < F.lit(float(alpha))).alias("keep"),
        )
    )
    return out


def disparity_backbone_sql(alpha: float = 0.05) -> str:
    """DuckDB oracle body for :func:`disparity_backbone` (expects the
    weighted ``edges_w`` CTE in scope — the ``_WEDGES`` chain)."""
    return f"""
    db_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             sum(weight) AS weight
      FROM edges_w WHERE src <> dst GROUP BY 1, 2
    ),
    db_vs AS MATERIALIZED (
      SELECT v, count(*) AS k, sum(weight) AS s FROM (
        SELECT a AS v, weight FROM db_und
        UNION ALL SELECT b AS v, weight FROM db_und
      ) GROUP BY v
    ),
    db_alpha AS (
      SELECT e.a, e.b, e.weight,
             round(least(
               power(1.0 - CAST(e.weight AS DOUBLE) / va.s, va.k - 1),
               power(1.0 - CAST(e.weight AS DOUBLE) / vb.s, vb.k - 1)
             ), 6) AS alpha
      FROM db_und e
      JOIN db_vs va ON va.v = e.a
      JOIN db_vs vb ON vb.v = e.b
    )
    SELECT a, b, weight, alpha, alpha < {float(alpha):.17g} AS keep
    FROM db_alpha
    """


def molloy_reed(graph: LinkGraph) -> DataFrame:
    """→ one row ``[n, m, mean_k, kappa, fc]`` — the Molloy–Reed
    heterogeneity ratio ``κ = ⟨k²⟩/⟨k⟩`` over undirected simple degrees
    and the configuration-model random-failure percolation threshold
    ``f_c = 1 − 1/(κ − 1)`` (Molloy & Reed 1995; Cohen et al. 2000 —
    public results): a giant component survives random vertex removal up
    to fraction ``f_c``; heavy-tailed graphs (κ → large) are robust to
    failure yet fragile to targeted attack — the closed-form counterpart
    of the empirical :func:`attack_resilience` probes.  ``fc`` is NULL
    when κ ≤ 1 (no giant component regime, avoids the sign flip); both
    ratios are staged once from exact integer moments and rounded to 6.

    Scale: one O(E) degree aggregate + one one-row reduce — map-side
    combined, no joins, no iteration."""
    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    s = deg.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("sk"),
        F.coalesce(
            F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")), F.lit(0)
        )
        .cast("decimal(38,0)")
        .alias("sk2"),
    )
    return s.select(
        "n",
        (F.col("sk") / 2).cast("long").alias("m"),
        F.expr("CASE WHEN n > 0 THEN round(CAST(sk AS DOUBLE) / n, 6) END").alias(
            "mean_k"
        ),
        F.expr(
            "CASE WHEN sk > 0 THEN round(CAST(sk2 AS DOUBLE) / sk, 6) END"
        ).alias("kappa"),
        F.expr(
            "CASE WHEN sk > 0 AND CAST(sk2 AS DOUBLE) / sk > 1.0 THEN"
            " round(1.0 - 1.0 / (CAST(sk2 AS DOUBLE) / sk - 1.0), 6) END"
        ).alias("fc"),
    )


def molloy_reed_sql() -> str:
    """DuckDB oracle body for :func:`molloy_reed` (expects ``edges``)."""
    return """
    mr_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    mr_deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM mr_und UNION ALL SELECT b AS v FROM mr_und
      ) GROUP BY v
    ),
    mr_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(sum(d), 0) AS BIGINT) AS sk,
             coalesce(sum(CAST(d AS HUGEINT) * d), 0) AS sk2
      FROM mr_deg
    )
    SELECT n,
           CAST(sk / 2 AS BIGINT) AS m,
           CASE WHEN n > 0 THEN round(CAST(sk AS DOUBLE) / n, 6) END AS mean_k,
           CASE WHEN sk > 0 THEN round(CAST(sk2 AS DOUBLE) / sk, 6) END AS kappa,
           CASE WHEN sk > 0 AND CAST(sk2 AS DOUBLE) / sk > 1.0 THEN
             round(1.0 - 1.0 / (CAST(sk2 AS DOUBLE) / sk - 1.0), 6) END AS fc
    FROM mr_s
    """


def struct_roles(graph: LinkGraph, k: int = 4, iterations: int = 4) -> DataFrame:
    """→ ``[id, role, sqdist]`` — structural-role clustering (ReFeX/RolX
    lineage, Henderson et al. KDD 2012, public technique): every vertex
    gets a 4-feature structural signature — ``ln(1 + out_deg)``,
    ``ln(1 + in_deg)``, ``ln(1 + triangles)``, ``ln(1 + wedges)`` — and
    the deterministic Lloyd kernel (:func:`~linkgraph_spark.kernels.
    kmeans.kmeans` — init centroid j = vertex id j) clusters them into
    ``k`` roles.  Orchestrator hubs, leaf users, triangle-dense pod
    members and chain relays land in different roles even when flow_roles'
    coarse source/sink/relay census cannot separate them.  The log damps
    hub skew so one 10^6-degree tool cannot own a centroid axis.

    ``role`` ids are stable across engines (the shared Lloyd tie-breaks);
    ``sqdist`` is the distance to the winning role centroid (role purity
    per vertex).  Scale: one degree aggregate + the arboricity-bounded
    triangle count to build features, then Lloyd's k·4-cell means —
    O(V) per iteration, no windows."""
    from linkgraph_spark.kernels.kmeans import kmeans
    from linkgraph_spark.kernels.triangles import _oriented, _triangles_und

    out_d = graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("od")
    )
    in_d = graph.edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("idg")
    )
    und = _oriented(graph.edges)
    ud = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    tv = (
        _triangles_und(und)
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("t"))
    )
    feats = (
        graph.vertices.select("id")
        .join(out_d, "id", "left")
        .join(in_d, "id", "left")
        .join(ud, "id", "left")
        .join(tv, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                F.expr("ln(1.0 + coalesce(od, 0))"),
                F.expr("ln(1.0 + coalesce(idg, 0))"),
                F.expr("ln(1.0 + coalesce(t, 0))"),
                F.expr("ln(1.0 + coalesce(d, 0) * (coalesce(d, 0) - 1) / 2)"),
            ).alias("embedding"),
        )
    )
    return kmeans(feats, k=k, iterations=iterations).select(
        F.col("vec_id").alias("id"), F.col("cluster").alias("role"), "sqdist"
    )


def struct_roles_sql(k: int = 4, iterations: int = 4) -> str:
    """DuckDB oracle body (expects ``verts``/``edges``): the identical
    feature build feeding the shared k-means CTE chain."""
    from linkgraph_spark.kernels.kmeans import _kmeans_ctes

    feat = """
    srl_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    srl_ud AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM srl_und UNION ALL SELECT b AS v FROM srl_und
      ) GROUP BY v
    ),
    srl_tv AS (
      SELECT v, count(*) AS t FROM (
        SELECT e1.a AS v FROM srl_und e1
        JOIN srl_und e2 ON e1.b = e2.a
        JOIN srl_und e3 ON e3.a = e1.a AND e3.b = e2.b
        UNION ALL
        SELECT e1.b FROM srl_und e1
        JOIN srl_und e2 ON e1.b = e2.a
        JOIN srl_und e3 ON e3.a = e1.a AND e3.b = e2.b
        UNION ALL
        SELECT e2.b FROM srl_und e1
        JOIN srl_und e2 ON e1.b = e2.a
        JOIN srl_und e3 ON e3.a = e1.a AND e3.b = e2.b
      ) GROUP BY v
    ),
    srl_feat AS MATERIALIZED (
      SELECT v.id AS vec_id,
             [ln(1.0 + coalesce(o.c, 0)),
              ln(1.0 + coalesce(i.c, 0)),
              ln(1.0 + coalesce(t.t, 0)),
              ln(1.0 + coalesce(u.d, 0) * (coalesce(u.d, 0) - 1) / 2)]
               AS embedding
      FROM verts v
      LEFT JOIN (SELECT src AS id, count(*) AS c FROM edges GROUP BY src) o
        ON o.id = v.id
      LEFT JOIN (SELECT dst AS id, count(*) AS c FROM edges GROUP BY dst) i
        ON i.id = v.id
      LEFT JOIN srl_ud u ON u.v = v.id
      LEFT JOIN srl_tv t ON t.v = v.id
    )"""
    km = _kmeans_ctes("srl_feat", k, iterations)
    km = km[len("WITH "):] if km.startswith("WITH ") else km
    return f"""{feat},
    {km}
    SELECT vec_id AS id, cluster AS role, round(sqd, 6) AS sqdist FROM kfinal
    """
