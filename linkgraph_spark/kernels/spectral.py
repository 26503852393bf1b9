"""Spectral / stationary-walk centralities: eigenvector centrality and
SALSA — engine extensions on the shared superstep scaffold (the reference's
one kernel is PageRank, ``pagerank_lambda/dynamodb/pagerank.py``; these
cover the classic adjacency-eigenvector and bipartite-walk siblings —
Bonacich 1972 and Lempel & Moran 2001, public algorithms).

Plan shapes (the 100 TB lens):

- **eigenvector_centrality**: per round ONE gather join along in-edges +
  one grouped sum (exactly a damping-free PageRank superstep without the
  divisor attach), then an infinity-norm rescale whose max scalar rides
  the materialization via ``observe()`` and re-enters the next round's
  plan as a literal. No extra shuffle for the norm.
- **salsa**: per half-round one degree-normalized gather (the divisor is
  attached to the EDGE side once, iteration-invariant — same move as
  PageRank's relation_length attach) + an L1 rescale via ``observe()``.
  Two half-rounds (authority, hub) per iteration ≙ one HITS iteration's
  movement; SALSA's per-neighbor 1/deg weights are what make it robust to
  the tightly-knit-community effect HITS suffers.

Both are synchronous, deterministic, fixed-iteration Jacobi loops with
exact unrolled SQL mirrors (infinity/L1 norms divide by exactly
representable scalars only after both engines compute the same sums).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class SpectralResult:
    scores: DataFrame
    iterations: int
    metrics: list = field(default_factory=list)


def eigenvector_centrality(graph: LinkGraph, iterations: int = 8) -> SpectralResult:
    """→ ``[id, score]`` — power iteration on the in-edge adjacency
    (``x' ∝ Σ_{u→v} x(u)``), rescaled each round by the infinity norm
    (max), init all-ones. Vertices outside every cycle's basin decay to 0;
    the max vertex pins at 1.0. Fixed ``iterations``, no convergence test
    (the gate/oracle contract wants a round-exact replay)."""
    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    n_edges = graph.edges.count()

    scores = state.rotate(graph.vertices.select("id", F.lit(1.0).alias("score")))
    metrics: list = []
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        edges = graph.edges.select("src", "dst")
        for it in range(1, iterations + 1):
            cur = scores if big_state else F.broadcast(scores)
            raw = (
                edges.join(cur.select(F.col("id").alias("src"), "score"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("score").alias("raw"))
            )
            nxt = scores.select("id").join(raw, "id", "left").select(
                "id", F.coalesce("raw", F.lit(0.0)).alias("raw")
            )
            obs = Observation(f"eig_{id(state)}_{it}")
            nxt = nxt.observe(obs, F.max("raw").alias("mx"))
            nxt = state.rotate(nxt)
            mx = obs.get["mx"] or 1.0
            mx = mx if mx > 0 else 1.0
            # LAZY rescale over the single per-iteration checkpoint: the
            # division folds into the next round's join plan (rotate only
            # frees these blocks AFTER the next rotation materializes), so
            # one O(V) checkpoint per iteration instead of two
            scores = nxt.select("id", (F.col("raw") / F.lit(mx)).alias("score"))
            metrics.append({"iteration": it, "inf_norm": mx})
    return SpectralResult(scores=scores, iterations=iterations, metrics=metrics)


def eigenvector_centrality_sql(iters: int = 8) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the identical
    max-normalized power iteration, unrolled."""
    ctes = ["ev0 AS (SELECT id, 1.0 AS score FROM verts)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"""evraw{k} AS MATERIALIZED (
      SELECT v.id, coalesce(s.sm, 0.0) AS raw
      FROM verts v
      LEFT JOIN (
        SELECT e.dst AS id, sum(p.score) AS sm
        FROM edges e JOIN ev{k - 1} p ON e.src = p.id
        GROUP BY e.dst
      ) s ON s.id = v.id
    ),
    evmx{k} AS (
      SELECT CASE WHEN max(raw) > 0 THEN max(raw) ELSE 1.0 END AS mx
      FROM evraw{k}
    ),
    ev{k} AS MATERIALIZED (
      SELECT r.id, r.raw / evmx{k}.mx AS score
      FROM evraw{k} r CROSS JOIN evmx{k}
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, round(score, 6) AS score FROM ev{iters}
    """


def salsa(graph: LinkGraph, iterations: int = 5) -> SpectralResult:
    """→ ``[id, hub, authority]`` — SALSA scores after ``iterations``
    rounds of the degree-normalized bipartite walk over the distinct
    simple directed edge set:

    ``authority(v) ∝ Σ_{u→v} hub(u)/outdeg(u)`` then L1-normalize;
    ``hub(u) ∝ Σ_{u→v} authority(v)/indeg(v)`` then L1-normalize.

    Init hub = 1/|V|. The 1/deg divisors attach to the EDGE side once
    (iteration-invariant, like PageRank's relation_length); each
    half-round is one gather join + grouped sum with the L1 scalar fused
    via ``observe()``."""
    spark = graph.vertices.sparkSession
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    state = RotatingState(spark)
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    n_edges = edges.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("od"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("idg"))
    # both divisors attached once; reused every superstep — checkpointed
    # so each half-round's plan is a leaf join, not the full edge lineage
    ew, ew_blocks = checkpoint_tracked(
        edges.join(out_deg, "src").join(in_deg, "dst")
    )

    n = graph.num_vertices or 1
    metrics: list = []
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        # align the score state's partitioning with the half-round agg
        # exchanges once (no second exchange in either apply join)
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        scores = state.rotate(
            graph.vertices.select(
                "id", F.lit(1.0 / n).alias("hub"), F.lit(0.0).alias("authority")
            ).repartition(sp_eff, "id")
        )
        # scan the checkpointed edge table at the loop's scaled partition
        # count (narrow coalesce; it materialized at the session's)
        ew = ew.coalesce(sp_eff)
        for it in range(1, iterations + 1):
            cur = scores if big_state else F.broadcast(scores)
            a_raw = (
                ew.join(cur.select(F.col("id").alias("src"), "hub"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("hub") / F.col("od")).alias("a_raw"))
            )
            half = scores.select("id", "hub").join(a_raw, "id", "left").select(
                "id", "hub", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
            )
            obs_a = Observation(f"salsa_a_{id(state)}_{it}")
            half = half.observe(obs_a, F.sum("a_raw").alias("s"))
            half = state.rotate(half)
            a_norm = obs_a.get["s"] or 1.0
            a_norm = a_norm if a_norm > 0 else 1.0

            cur_h = half if big_state else F.broadcast(half)
            h_raw = (
                ew.join(cur_h.select(F.col("id").alias("dst"), "a_raw"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg((F.sum(F.col("a_raw") / F.col("idg")) / F.lit(a_norm)).alias("h_raw"))
            )
            nxt = half.join(h_raw, "id", "left").select(
                "id",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                (F.col("a_raw") / F.lit(a_norm)).alias("authority"),
            )
            obs_h = Observation(f"salsa_h_{id(state)}_{it}")
            nxt = nxt.observe(obs_h, F.sum("h_raw").alias("s"))
            nxt = state.rotate(nxt)
            h_norm = obs_h.get["s"] or 1.0
            h_norm = h_norm if h_norm > 0 else 1.0
            # LAZY hub rescale over the round's final checkpoint (rotate
            # frees it only after the NEXT rotation materializes) — two
            # checkpoints per round, not three
            scores = nxt.select(
                "id", (F.col("h_raw") / F.lit(h_norm)).alias("hub"), "authority"
            )
            metrics.append({"iteration": it, "a_norm": a_norm, "h_norm": h_norm})
    free_tracked(spark.sparkContext, ew_blocks)
    return SpectralResult(scores=scores, iterations=iterations, metrics=metrics)


def salsa_sql(iters: int = 5) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the identical
    L1-normalized bipartite walk, unrolled; nv is the vertex count."""
    ctes = [
        """sl_e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    )""",
        """sl_ew AS MATERIALIZED (
      SELECT e.src, e.dst, o.od, i.idg
      FROM sl_e e
      JOIN (SELECT src, count(*) AS od FROM sl_e GROUP BY src) o ON o.src = e.src
      JOIN (SELECT dst, count(*) AS idg FROM sl_e GROUP BY dst) i ON i.dst = e.dst
    )""",
        "sl_nv AS (SELECT count(*) AS n FROM verts)",
        "sl_h0 AS (SELECT id, 1.0 / sl_nv.n AS hub FROM verts CROSS JOIN sl_nv)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""sl_araw{k} AS MATERIALIZED (
      SELECT v.id, coalesce(s.sm, 0.0) AS a_raw
      FROM verts v
      LEFT JOIN (
        SELECT e.dst AS id, sum(h.hub / e.od) AS sm
        FROM sl_ew e JOIN sl_h{k - 1} h ON e.src = h.id
        GROUP BY e.dst
      ) s ON s.id = v.id
    ),
    sl_an{k} AS (
      SELECT CASE WHEN sum(a_raw) > 0 THEN sum(a_raw) ELSE 1.0 END AS nm
      FROM sl_araw{k}
    ),
    sl_hraw{k} AS MATERIALIZED (
      SELECT v.id, coalesce(s.sm, 0.0) / sl_an{k}.nm AS h_raw
      FROM verts v CROSS JOIN sl_an{k}
      LEFT JOIN (
        SELECT e.src AS id, sum(a.a_raw / e.idg) AS sm
        FROM sl_ew e JOIN sl_araw{k} a ON a.id = e.dst
        GROUP BY e.src
      ) s ON s.id = v.id
    ),
    sl_hn{k} AS (
      SELECT CASE WHEN sum(h_raw) > 0 THEN sum(h_raw) ELSE 1.0 END AS nm
      FROM sl_hraw{k}
    ),
    sl_h{k} AS MATERIALIZED (
      SELECT h.id, h.h_raw / sl_hn{k}.nm AS hub
      FROM sl_hraw{k} h CROSS JOIN sl_hn{k}
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT h.id, round(h.hub, 6) AS hub,
           round(a.a_raw / sl_an{iters}.nm, 6) AS authority
    FROM sl_h{iters} h
    JOIN sl_araw{iters} a ON a.id = h.id
    CROSS JOIN sl_an{iters}
    """


def fiedler_sweep(
    graph: LinkGraph, iterations: int = 8, top_k: int = 50
) -> DataFrame:
    """→ ``[pos, id, phi]`` — SPECTRAL bisection sweep: estimate the
    second eigenvector of the symmetric normalized adjacency
    ``M = D^{-1/2} A D^{-1/2}`` of the undirected simple graph by
    deflated power iteration, order vertices by the (6-dp-rounded)
    eigenvector value ascending, and report the conductance of every
    top-``top_k`` prefix — the classic global-partitioning recipe
    (Fiedler 1973 / Shi-Malik normalized cut): the best bisection is the
    prefix where φ bottoms out. The GLOBAL complement to
    ``modularity.ppr_sweep``'s seed-local sweep, sharing its
    ``_sweep_curve`` machinery.

    Deflation is EXACT, not estimated: M's top eigenvector is known in
    closed form (v1 ∝ D^{1/2}·1, eigenvalue 1), so each round computes
    ``z = (y + M·y)/2 − (v1·y)·v1`` — the LAZY walk (I+M)/2, which maps
    the spectrum into [0, 1] so a bipartite component's −1 eigenvalue
    (e.g. an even ring) can't out-dominate the Fiedler mode — then
    rescales by the infinity norm and rounds entries to 9 dp (the
    cross-engine FP-snapping convention — the ordering key must be
    engine-portable). Init is a deterministic pseudo-random vector
    (Mersenne-arithmetic hash of the id), never orthogonal to the
    Fiedler vector in practice.

    Scale shape: per round ONE edge gather (sum of w·y along the
    symmetrized normalized edge list, weights attached once,
    iteration-invariant) + one grouped sum; the two scalars each round
    (v1·z and max|z|) ride the superstep's materialization via
    ``observe()`` — no extra job. Zero-degree vertices carry no cut mass
    and are excluded. The sweep adds one edge pass + ≤ top_k-row windows.
    """
    from linkgraph_spark.functions.hashing import MERSENNE_P
    from linkgraph_spark.kernels.components import undirected
    from linkgraph_spark.kernels.modularity import _sweep_curve
    from linkgraph_spark.kernels.triangles import _oriented

    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    spark = graph.vertices.sparkSession
    und = undirected(graph.edges)  # symmetric distinct [src, dst], no loops
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    deg = deg.persist()
    vol = deg.agg(F.sum("d")).collect()[0][0]
    if not vol:
        deg.unpersist()
        raise ValueError("fiedler_sweep: graph has no edges")
    ds = deg.select(F.col("id").alias("src"), F.col("d").alias("dsrc"))
    dd = deg.select(F.col("id").alias("dst"), F.col("d").alias("ddst"))
    n_edges = graph.edges.count()
    state = RotatingState(spark)
    # deterministic pseudo-random init (Mersenne arithmetic, id-keyed)
    p = (F.col("id") % F.lit(MERSENNE_P)) * F.lit(2654435761) % F.lit(MERSENNE_P)
    raw0 = (p % F.lit(1000)).cast("double") / F.lit(999.0) - F.lit(0.5)
    static_blocks: set = set()
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big:
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # loop-invariant tables as checkpointed leaves (plan truncation),
        # with v1 partitioned to the loop's agg exchange layout so the
        # per-round three-way apply join never re-exchanges any side
        e_norm, _b = checkpoint_tracked(
            und.join(ds, "src")
            .join(dd, "dst")
            .select(
                "src", "dst",
                (F.lit(1.0) / (F.sqrt("dsrc") * F.sqrt("ddst"))).alias("w"),
            )
        )
        static_blocks |= _b
        verts0, _b = checkpoint_tracked(
            deg.select(
                "id", (F.sqrt(F.col("d")) / F.lit(float(vol) ** 0.5)).alias("v1")
            ).repartition(sp_eff, "id")
        )
        static_blocks |= _b
        z = verts0.select("id", "v1", raw0.alias("raw"))
        mx, dot = 1.0, 0.0
        for it in range(iterations + 1):  # round 0 materializes the init
            obs = Observation(f"fiedler_{id(state)}_{it}")
            z = z.observe(
                obs,
                F.sum(F.col("v1") * F.col("raw")).alias("dotraw"),
                F.max(F.abs(F.col("raw"))).alias("mxraw"),
            )
            cur = state.rotate(z)
            mxraw = obs.get["mxraw"]
            mx = mxraw if mxraw and mxraw > 0 else 1.0
            dot = (obs.get["dotraw"] or 0.0) / mx
            if it == iterations:
                break
            # LAZY rescale+round over the checkpoint (eigenvector_centrality
            # convention): one O(V) materialization per round, not two
            yprev = cur.select("id", F.round(F.col("raw") / F.lit(mx), 9).alias("y"))
            ysrc = yprev.select(F.col("id").alias("src"), "y")
            gather = (
                e_norm.join(ysrc if big else F.broadcast(ysrc), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("w") * F.col("y")).alias("sm"))
            )
            z = (
                verts0.join(yprev, "id")
                .join(gather, "id", "left")
                .select(
                    "id", "v1",
                    (
                        F.lit(0.5) * (F.col("y") + F.coalesce("sm", F.lit(0.0)))
                        - F.lit(dot) * F.col("v1")
                    ).alias("raw"),
                )
            )
        scores = cur.select(
            "id", F.round(F.round(F.col("raw") / F.lit(mx), 9), 6).alias("s")
        )
        worder = Window.orderBy(F.asc("s"), F.asc("id"))
        pos_t = (
            scores.orderBy(F.asc("s"), F.asc("id"))
            .limit(top_k)
            .select("id", F.row_number().over(worder).alias("pos"))
            .persist()
        )
        out = _sweep_curve(_oriented(graph.edges), pos_t, top_k).localCheckpoint()
    pos_t.unpersist()
    free_tracked(spark.sparkContext, static_blocks)
    deg.unpersist()
    state.release()
    return out


def fiedler_sweep_sql(iterations: int = 8, top_k: int = 50) -> str:
    """DuckDB oracle body for :func:`fiedler_sweep` (expects ``verts`` /
    ``edges``): the deflated power iteration unrolled with the identical
    per-round rescale/round algebra, then the shared sweep tail."""
    from linkgraph_spark.functions.hashing import MERSENNE_P
    from linkgraph_spark.kernels.modularity import _sweep_sql_tail

    ctes = [
        """fsw_su AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    ),
    fsw_dg AS MATERIALIZED (
      SELECT src AS id, count(*) AS d FROM fsw_su GROUP BY src
    ),
    fsw_vol AS (SELECT sum(d) AS vol FROM fsw_dg),
    fsw_v AS MATERIALIZED (
      SELECT g.id, sqrt(g.d) / sqrt(CAST(v.vol AS DOUBLE)) AS v1
      FROM fsw_dg g CROSS JOIN fsw_vol v
    ),
    fsw_e AS MATERIALIZED (
      SELECT u.src, u.dst, 1.0 / (sqrt(ds.d) * sqrt(dd.d)) AS w
      FROM fsw_su u
      JOIN fsw_dg ds ON ds.id = u.src
      JOIN fsw_dg dd ON dd.id = u.dst
    )""",
        f"""fsw_z0 AS MATERIALIZED (
      SELECT id, v1,
             CAST(((id % {MERSENNE_P}) * 2654435761) % {MERSENNE_P} % 1000
                  AS DOUBLE) / 999.0 - 0.5 AS raw
      FROM fsw_v
    ),
    fsw_mx0 AS (SELECT CASE WHEN max(abs(raw)) > 0 THEN max(abs(raw))
                            ELSE 1.0 END AS mx FROM fsw_z0),
    fsw_d0 AS (SELECT sum(v1 * raw) / (SELECT mx FROM fsw_mx0) AS dt
               FROM fsw_z0)""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""fsw_y{k - 1} AS MATERIALIZED (
      SELECT id, round(raw / (SELECT mx FROM fsw_mx{k - 1}), 9) AS y
      FROM fsw_z{k - 1}
    ),
    fsw_z{k} AS MATERIALIZED (
      SELECT v.id, v.v1,
             0.5 * (p.y + coalesce(s.sm, 0.0))
               - (SELECT dt FROM fsw_d{k - 1}) * v.v1 AS raw
      FROM fsw_v v
      JOIN fsw_y{k - 1} p ON p.id = v.id
      LEFT JOIN (
        SELECT e.dst AS id, sum(e.w * p2.y) AS sm
        FROM fsw_e e JOIN fsw_y{k - 1} p2 ON e.src = p2.id
        GROUP BY e.dst
      ) s ON s.id = v.id
    ),
    fsw_mx{k} AS (SELECT CASE WHEN max(abs(raw)) > 0 THEN max(abs(raw))
                              ELSE 1.0 END AS mx FROM fsw_z{k}),
    fsw_d{k} AS (SELECT sum(v1 * raw) / (SELECT mx FROM fsw_mx{k}) AS dt
                 FROM fsw_z{k})"""
        )
    ctes.append(
        f"""fsw_score AS MATERIALIZED (
      SELECT id, round(round(raw / (SELECT mx FROM fsw_mx{iterations}), 9), 6) AS s
      FROM fsw_z{iterations}
    ),
    fsw_pos AS MATERIALIZED (
      SELECT id, pos FROM (
        SELECT id, row_number() OVER (ORDER BY s ASC, id ASC) AS pos
        FROM fsw_score
      ) WHERE pos <= {top_k}
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""{body},
    {_sweep_sql_tail("fsw_pos", top_k, p="fsw")}
    """


def leaderrank(graph: LinkGraph, iterations: int = 10) -> SpectralResult:
    """→ ``[id, score]`` — LeaderRank (Lü, Zhang, Yeung & Zhou, PLoS ONE
    2011, public algorithm): a damping-free random walk on the graph
    augmented with a bidirectional ground node, which guarantees
    ergodicity with NO teleport parameter and handles dangling vertices
    for free (they hand their whole mass to the ground).  After the fixed
    synchronous rounds the ground's mass is redistributed equally:
    ``score(v) = r_K(v) + g_K / N``.  Total mass is conserved at N every
    round (asserted in the tests).

    The ground node is never materialized: its two edge bundles are the
    closed forms ``g_{t+1} = Σ_v r_t(v)/(d_v+1)`` (everyone sends one
    1/(d+1) share to ground) and ``+ g_t / N`` on every vertex (ground
    splits evenly).  So the per-round plan is exactly one gather join +
    grouped sum along real edges — the PageRank superstep shape with the
    divisor (out-degree + 1) attached to the EDGE side once,
    iteration-invariant — plus two ``observe()``-fused scalars riding the
    same materialization (the ground sum Σ r/(d+1) is observed one round
    ahead, on the frame that already holds r_t).  No extra job, no
    collect of anything vertex-sized.

    Reference provenance: engine extension in the family of the
    reference's PageRank kernel (pagerank_lambda/dynamodb/pagerank.py:
    51-99 — same gather/state shape, different normalization); the
    oracle unrolls the identical recurrence.
    """
    if iterations < 1:
        raise ValueError("leaderrank needs iterations >= 1")
    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    n_edges = graph.edges.count()
    n = graph.num_vertices

    # divisor d_v + 1 (ground edge) for EVERY vertex, attached to edges once
    outdeg = graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("od")
    )
    divs = (
        graph.vertices.select("id")
        .join(outdeg, "id", "left")
        .select("id", (F.coalesce("od", F.lit(0)) + 1).alias("div"))
    )

    metrics: list = []
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    static_blocks: set = set()
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        # loop-invariant tables as checkpointed leaves: the per-round apply
        # join otherwise re-analyzed (and recomputed) the divisor plan
        # through the full graph lineage every iteration; divs partitioned
        # to the loop's agg exchange layout so the apply join never
        # re-exchanges
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        ed, _b = checkpoint_tracked(
            graph.edges.select("src", "dst")
            .join(divs.select(F.col("id").alias("src"), "div"), "src")
        )
        static_blocks |= _b
        divs, _b = checkpoint_tracked(divs.repartition(sp_eff, "id"))
        static_blocks |= _b
        scores0 = graph.vertices.select(
            "id", F.lit(1.0).alias("score")
        ).join(divs, "id")
        obs0 = Observation(f"lr_{id(state)}_0")
        scores = state.rotate(
            scores0.observe(obs0, F.sum(F.col("score") / F.col("div")).alias("gs"))
        )
        g = 0.0  # g_0
        g_next = float(obs0.get["gs"])  # g_1 = Σ r_0/(d+1)
        try:
            for it in range(1, iterations + 1):
                cur = scores if big_state else F.broadcast(scores)
                raw = (
                    ed.join(
                        cur.select(F.col("id").alias("src"), "score"), "src"
                    )
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.sum(F.col("score") / F.col("div")).alias("raw"))
                )
                nxt = (
                    divs.join(raw, "id", "left")
                    .select(
                        "id",
                        "div",
                        (F.coalesce("raw", F.lit(0.0)) + F.lit(g / n)).alias(
                            "score"
                        ),
                    )
                )
                obs = Observation(f"lr_{id(state)}_{it}")
                nxt = nxt.observe(
                    obs,
                    F.sum(F.col("score") / F.col("div")).alias("gs"),
                    F.sum("score").alias("tot"),
                )
                scores = state.rotate(nxt)
                g = g_next  # g_it
                g_next = float(obs.get["gs"])  # g_{it+1} = Σ r_it/(d+1)
                metrics.append(
                    {"iteration": it, "ground": g, "mass": obs.get["tot"] + g}
                )
        finally:
            free_tracked(spark.sparkContext, static_blocks)
    out = scores.select("id", (F.col("score") + F.lit(g / n)).alias("score"))
    return SpectralResult(scores=out, iterations=iterations, metrics=metrics)


def leaderrank_sql(iters: int = 10) -> str:
    """DuckDB oracle body (expects ``verts``/``edges``): the identical
    ground-node walk, unrolled round-exactly."""
    ctes = [
        """lrdiv AS MATERIALIZED (
      SELECT v.id, coalesce(o.c, 0) + 1 AS div
      FROM verts v
      LEFT JOIN (SELECT src AS id, count(*) AS c FROM edges GROUP BY src) o
        USING (id)
    )""",
        "lrn AS (SELECT count(*) AS n FROM verts)",
        "lr0 AS (SELECT id, 1.0 AS score FROM verts)",
        "lrg0 AS (SELECT 0.0 AS g)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""lrg{k} AS (
      SELECT sum(p.score / d.div) AS g FROM lr{k - 1} p
      JOIN lrdiv d USING (id)
    ),
    lr{k} AS MATERIALIZED (
      SELECT v.id,
             coalesce(s.sm, 0.0) + lrg{k - 1}.g / lrn.n AS score
      FROM verts v CROSS JOIN lrg{k - 1} CROSS JOIN lrn
      LEFT JOIN (
        SELECT e.dst AS id, sum(p.score / d.div) AS sm
        FROM edges e
        JOIN lr{k - 1} p ON e.src = p.id
        JOIN lrdiv d ON d.id = p.id
        GROUP BY e.dst
      ) s ON s.id = v.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT r.id, round(r.score + lrg{iters}.g / lrn.n, 6) AS score
    FROM lr{iters} r CROSS JOIN lrg{iters} CROSS JOIN lrn
    """


def spectral_radius(graph: LinkGraph, iterations: int = 8) -> DataFrame:
    """→ one row ``[radius_est, epidemic_threshold, iterations]`` — the
    spectral radius λ₁ of the UNDIRECTED simple adjacency, estimated by
    ``iterations`` max-normalized power rounds followed by one Rayleigh
    quotient ``x'Ax / x'x`` (monotone from below for symmetric A, robust
    to the bipartite even/odd oscillation a raw ratio estimate suffers),
    and the SIS/SIR epidemic threshold ``τ = 1/λ₁`` (Wang/Chakrabarti et
    al. 2003, public result): an influence cascade with transmissibility
    above τ percolates the actor graph; below it, it dies out — the
    spectral counterpart of :func:`~linkgraph_spark.kernels.stats.
    molloy_reed`'s degree-moment threshold.  The value is a LOWER bound
    that tightens with ``iterations`` (documented contract — the exact
    λ₁ is an eigenproblem, not a relational query); both engines run the
    identical rounds so the oracle matches exactly.

    Scale shape: per round one gather join + grouped sum over the
    symmetrized edge list with the infinity norm ``observe()``-fused (the
    eigenvector-centrality superstep), plus ONE extra gather for the
    quotient.  ``epidemic_threshold`` is NULL on an edgeless graph."""
    from linkgraph_spark.kernels.components import undirected

    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    sym = undirected(graph.edges).persist()
    n_sym = sym.count()

    scores = state.rotate(graph.vertices.select("id", F.lit(1.0).alias("score")))
    with pinned_superstep_confs(spark, n_sym, graph.num_vertices) as big_state:
        for it in range(1, iterations + 1):
            cur = scores if big_state else F.broadcast(scores)
            raw = (
                sym.join(cur.select(F.col("id").alias("src"), "score"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("score").alias("raw"))
            )
            nxt = scores.select("id").join(raw, "id", "left").select(
                "id", F.coalesce("raw", F.lit(0.0)).alias("raw")
            )
            obs = Observation(f"sr_{id(state)}_{it}")
            nxt = nxt.observe(obs, F.max("raw").alias("mx"))
            nxt = state.rotate(nxt)
            mx = obs.get["mx"] or 1.0
            mx = mx if mx > 0 else 1.0
            scores = nxt.select("id", (F.col("raw") / F.lit(mx)).alias("score"))
    ax = (
        sym.join(
            scores.select(F.col("id").alias("src"), "score"), "src"
        )
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("score").alias("ax"))
    )
    q = (
        scores.join(ax, "id", "left")
        .select(
            (F.col("score") * F.coalesce("ax", F.lit(0.0))).alias("num"),
            (F.col("score") * F.col("score")).alias("den"),
        )
        .groupBy()
        .agg(F.sum("num").alias("num"), F.sum("den").alias("den"))
    )
    out = q.select(
        F.expr("CASE WHEN den > 0 THEN round(num / den, 6) END").alias(
            "radius_est"
        ),
        F.expr(
            "CASE WHEN den > 0 AND num > 0 THEN round(den / num, 6) END"
        ).alias("epidemic_threshold"),
        F.lit(iterations).cast("long").alias("iterations"),
    ).localCheckpoint()
    sym.unpersist()
    return out


def spectral_radius_sql(iters: int = 8) -> str:
    """DuckDB oracle body (expects ``verts``/``edges``): identical rounds +
    Rayleigh quotient."""
    ctes = [
        """sr_sym AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        "sr0 AS (SELECT id, 1.0 AS score FROM verts)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""srr{k} AS MATERIALIZED (
      SELECT v.id, coalesce(s.sm, 0.0) AS raw
      FROM verts v
      LEFT JOIN (
        SELECT e.dst AS id, sum(p.score) AS sm
        FROM sr_sym e JOIN sr{k - 1} p ON e.src = p.id
        GROUP BY e.dst
      ) s ON s.id = v.id
    ),
    srm{k} AS MATERIALIZED (
      SELECT CASE WHEN max(raw) > 0 THEN max(raw) ELSE 1.0 END AS mx
      FROM srr{k}
    ),
    sr{k} AS MATERIALIZED (
      SELECT r.id, r.raw / m.mx AS score FROM srr{k} r CROSS JOIN srm{k} m
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body},
    sr_ax AS (
      SELECT e.dst AS id, sum(p.score) AS ax
      FROM sr_sym e JOIN sr{iters} p ON e.src = p.id
      GROUP BY e.dst
    ),
    sr_q AS (
      SELECT sum(s.score * coalesce(a.ax, 0.0)) AS num,
             sum(s.score * s.score) AS den
      FROM sr{iters} s LEFT JOIN sr_ax a USING (id)
    )
    SELECT CASE WHEN den > 0 THEN round(num / den, 6) END AS radius_est,
           CASE WHEN den > 0 AND num > 0 THEN round(den / num, 6) END
             AS epidemic_threshold,
           CAST({iters} AS BIGINT) AS iterations
    FROM sr_q
    """
