"""Temporal graph operators: timestamped edges and time-respecting reach.

The static graph (``edges.py``) deliberately dedups away WHEN interactions
happened; these operators keep the clock. A time-respecting path is a
sequence of edges with non-decreasing timestamps — "the influence can only
flow forward in time" — the correct reachability notion for "which actors
could this conversation have affected" (provenance / contamination
tracing), where static reachability over-reports.

- :func:`temporal_edges` — re-derives the edge list WITH multiplicity and
  the epoch timestamp of the destination turn (an adjacent-turn edge
  "happens" when the reply lands; a tool edge when the invocation does),
  mapped onto the graph's vertex ids. Same window + two joins as the
  static ETL, no extra shuffles.
- :func:`temporal_reachability` — earliest-arrival fixpoint: arr(v) =
  min over edges (u, v, ts) with ts ≥ arr(u). The same superstep shuffle
  as BFS (edge⋈state join + min-agg + rotate, change count via
  ``observe()``); rounds ≤ temporal-path length. State O(V) longs.

Engine additions over the reference (whose graph has no time axis at all).
Session TZ is pinned UTC (``session.py``), so Spark ``unix_timestamp`` and
DuckDB ``epoch`` agree and the SQL oracle replays both operators exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs

UNREACHED_TS = 4_000_000_000_000  # far-future epoch sentinel (year ~128699)


def temporal_edges(graph: LinkGraph, transcripts: DataFrame) -> DataFrame:
    """→ [src, dst, ts] (epoch seconds, multiplicity kept) over the
    graph's vertex ids. Self-loops dropped to match the static ETL."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    actor = F.concat(F.col("conv_id"), F.lit("#"), F.col("role"))
    adjacent = transcripts.select(
        actor.alias("src_key"),
        F.concat(F.col("conv_id"), F.lit("#"), F.lead("role").over(w)).alias(
            "dst_key"
        ),
        F.unix_timestamp(F.lead("ts").over(w)).alias("ts"),
    ).where(F.col("dst_key").isNotNull())
    tool = transcripts.where(F.col("tool").isNotNull()).select(
        actor.alias("src_key"),
        F.concat(F.lit("tool:"), F.col("tool")).alias("dst_key"),
        F.unix_timestamp("ts").alias("ts"),
    )
    raw = adjacent.unionByName(tool).where(F.col("src_key") != F.col("dst_key"))
    v = graph.vertices
    return (
        raw.join(
            v.select(F.col("actor_key").alias("src_key"), F.col("id").alias("src")),
            "src_key",
        )
        .join(
            v.select(F.col("actor_key").alias("dst_key"), F.col("id").alias("dst")),
            "dst_key",
        )
        .select("src", "dst", "ts")
    )


# floor(): Spark unix_timestamp TRUNCATES fractional seconds; a bare
# DuckDB CAST(double AS BIGINT) rounds — floor matches the truncation
_TE_CTE = """te_raw AS (
      SELECT (conv_id || '#' || role) AS src_key,
             (conv_id || '#' || lead(role) OVER w) AS dst_key,
             CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS ts
      FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
      UNION ALL
      SELECT (conv_id || '#' || role) AS src_key,
             ('tool:' || tool) AS dst_key,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts
      FROM t WHERE tool IS NOT NULL
    )"""

_TE_SELECT = """SELECT vs.id AS src, vd.id AS dst, r.ts
    FROM te_raw r
    JOIN verts vs ON vs.actor_key = r.src_key
    JOIN verts vd ON vd.actor_key = r.dst_key
    WHERE r.dst_key IS NOT NULL AND r.src_key <> r.dst_key"""


def temporal_edges_sql() -> str:
    """DuckDB oracle body (expects ``t``/``verts`` CTEs in scope — the
    transcript chain of ``edges_sql``)."""
    return f"""
    {_TE_CTE}
    {_TE_SELECT}
    """


@dataclass
class TemporalReachResult:
    arrivals: DataFrame  # [id: long, arrival: long] — reached ids only
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def temporal_reachability(
    graph: LinkGraph,
    tedges: DataFrame,
    sources: list,
    max_iterations: int = 50,
    checkpoint=None,
    resume: bool = False,
) -> TemporalReachResult:
    """→ earliest time-respecting arrival from ``sources`` (their own
    arrival is -1: before everything). An edge (u, v, ts) is traversable
    iff ts ≥ arr(u); arr(v) minimizes the traversed edge's ts. Same
    checkpoint/resume contract as BFS (``kernels/paths.py``): pass a
    ``CheckpointStore`` to snapshot each round, ``resume=True`` to restart
    from the latest committed one."""
    spark = graph.vertices.sparkSession
    src_set = [int(s) for s in sources]
    tedges = tedges.persist()  # the caller's derivation must not re-run per round
    n_edges = tedges.count()
    state = RotatingState(spark)
    init = graph.vertices.select(
        "id",
        F.when(F.col("id").isin(src_set), F.lit(-1))
        .otherwise(F.lit(UNREACHED_TS))
        .cast("long")
        .alias("arrival"),
    )
    start = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("treach")
        if latest is not None:
            init = checkpoint.load_state(spark, "treach", latest)
            start = latest
    arr = state.rotate(init)
    converged = False
    metrics: list = []
    it = start
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices):
        for it in range(start + 1, max_iterations + 1):
            u = arr.select(F.col("id").alias("src"), F.col("arrival").alias("au"))
            cand = (
                tedges.join(u, "src")
                .where((F.col("au") < UNREACHED_TS) & (F.col("ts") >= F.col("au")))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("ts").alias("cand"))
            )
            new = arr.join(cand, "id", "left").select(
                "id",
                F.least(
                    F.col("arrival"), F.coalesce("cand", F.col("arrival"))
                ).alias("arrival"),
                (F.coalesce("cand", F.lit(UNREACHED_TS)) < F.col("arrival")).alias(
                    "_improved"
                ),
            )
            obs = Observation(f"treach_{id(state)}_{it}")
            new = new.observe(
                obs, F.sum(F.when(F.col("_improved"), 1).otherwise(0)).alias("n")
            )
            new = state.rotate(new)
            changed = obs.get["n"] or 0
            arr = new.select("id", "arrival")
            metrics.append({"iteration": it, "improved": changed})
            if checkpoint is not None:
                checkpoint.write_state(
                    "treach", it, arr, key_col="id", metrics={"improved": changed}
                )
            if changed == 0:
                converged = True
                break
    tedges.unpersist()
    return TemporalReachResult(
        arrivals=arr.where(F.col("arrival") < UNREACHED_TS),
        iterations=it,
        converged=converged,
        metrics=metrics,
    )


def temporal_reachability_sql(sources: list, rounds: int) -> str:
    """DuckDB oracle body for a ``max_iterations=rounds`` run (idempotent
    at the fixpoint, so early Spark convergence still matches). Expects
    the ``t``/``verts`` CTEs; builds its own temporal edge CTE."""
    sent = UNREACHED_TS
    src = ", ".join(str(int(s)) for s in sources)
    ctes = [
        _TE_CTE,
        f"""tr_e AS MATERIALIZED (
      {_TE_SELECT}
    )""",
        f"""tr0 AS (
      SELECT id, CASE WHEN id IN ({src}) THEN -1 ELSE {sent} END AS arrival
      FROM verts
    )""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""tr{i} AS MATERIALIZED (
      SELECT a.id, least(a.arrival, coalesce(m.c, {sent})) AS arrival
      FROM tr{i - 1} a
      LEFT JOIN (
        SELECT e.dst AS id, min(e.ts) AS c
        FROM tr_e e JOIN tr{i - 1} p ON e.src = p.id
        WHERE p.arrival < {sent} AND e.ts >= p.arrival
        GROUP BY e.dst
      ) m ON m.id = a.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, arrival FROM tr{rounds} WHERE arrival < {sent}
    """


def temporal_components(
    graph: LinkGraph,
    tedges: DataFrame,
    window_sec: int = 3600,
    max_iterations: int = 20,
) -> DataFrame:
    """→ ``[window_start, id, component]`` — hash-min connected components
    of EACH time window's interaction graph, all windows in ONE multiplexed
    superstep loop: the label state is keyed ``(window, id)``, so one
    gather join + grouped min per round converges every window together
    (a window's component = min member id within that window). The
    community-evolution view next to :func:`temporal_reachability` — how
    conversation clusters form and merge hour by hour — at the cost of a
    single components run over the windowed edge multiset.

    Scale shape: identical to the static components kernel with ``window``
    prepended to every key — same shuffle, same O(diameter) rounds (window
    subgraphs are conversation-local, so diameters are small); windows
    multiply state size, not round count. Early exit at the global
    fixpoint is safe (hash-min is monotone and idempotent, so the unrolled
    SQL oracle with a fixed round budget matches exactly)."""
    from linkgraph_spark.lineage import RotatingState, checkpoint_tracked, free_tracked

    spark = tedges.sparkSession
    w = (F.col("ts") - F.col("ts") % F.lit(int(window_sec))).alias("w")
    we = tedges.select(w, "src", "dst")
    # localCheckpoint (not persist): truncates the temporal-edge ETL
    # lineage so each round's plan is a leaf join, and the loop runs under
    # pinned superstep confs like every other hash-min kernel (this loop
    # previously re-planned the full upstream tree with AQE every round)
    und, und_blocks = checkpoint_tracked(
        we.select("w", F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(we.select("w", F.col("dst").alias("a"), F.col("src").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    n_und = und.count()
    verts = und.select("w", F.col("a").alias("id")).distinct()
    state = RotatingState(spark)
    from pyspark.sql import Observation

    try:
        with pinned_superstep_confs(spark, n_und, graph.num_vertices) as big:
            sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
            # scan the checkpointed edge table at the loop's scaled
            # partition count (narrow coalesce)
            und = und.coalesce(sp_eff)
            # align state partitioning with the loop's agg exchanges once,
            # so the per-round apply join adds no second exchange
            labels = state.rotate(
                verts.withColumn("component", F.col("id")).repartition(
                    sp_eff, "w", "id"
                )
            )
            for it in range(1, max_iterations + 1):
                lbl = labels.select(
                    "w", F.col("id").alias("b"), F.col("component").alias("nc")
                )
                gathered = (
                    und.join(lbl if big else F.broadcast(lbl), ["w", "b"])
                    .groupBy("w", F.col("a").alias("id"))
                    .agg(F.min("nc").alias("mn"))
                )
                nxt = labels.join(gathered, ["w", "id"], "left").select(
                    "w",
                    "id",
                    F.least(
                        F.col("component"), F.coalesce("mn", F.col("component"))
                    ).alias("component"),
                    (F.coalesce("mn", F.col("component")) < F.col("component")).alias(
                        "_chg"
                    ),
                )
                obs = Observation(f"twc_{id(state)}_{it}")
                nxt = nxt.observe(
                    obs, F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("c")
                )
                labels = state.rotate(nxt.drop("_chg"))
                if int(obs.get["c"] or 0) == 0:
                    break
    finally:
        free_tracked(spark.sparkContext, und_blocks)
    return labels.select(F.col("w").alias("window_start"), "id", "component")


def temporal_components_sql(window_sec: int = 3600, rounds: int = 20) -> str:
    """DuckDB oracle body (expects the transcript CTE chain): the windowed
    hash-min unrolled over (window, id) keys."""
    ctes = [
        _TE_CTE,
        f"""twc_e AS MATERIALIZED (
      SELECT (ts - ts % {int(window_sec)}) AS w, src, dst FROM ({_TE_SELECT})
    )""",
        """twc_und AS MATERIALIZED (
      SELECT DISTINCT w, a, b FROM (
        SELECT w, src AS a, dst AS b FROM twc_e
        UNION ALL SELECT w, dst AS a, src AS b FROM twc_e
      ) WHERE a <> b
    )""",
        "twc0 AS (SELECT DISTINCT w, a AS id, a AS component FROM twc_und)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""twc{k} AS MATERIALIZED (
      SELECT l.w, l.id,
             least(l.component, coalesce(m.mn, l.component)) AS component
      FROM twc{k - 1} l
      LEFT JOIN (
        SELECT u.w, u.a AS id, min(l2.component) AS mn
        FROM twc_und u JOIN twc{k - 1} l2 ON u.w = l2.w AND u.b = l2.id
        GROUP BY u.w, u.a
      ) m ON m.w = l.w AND m.id = l.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT w AS window_start, id, component FROM twc{rounds}
    """


def temporal_motifs(tedges: DataFrame, delta_sec: int = 3600) -> DataFrame:
    """→ [motif, n_pairs] for motif ∈ ('chain', 'ping_pong') — counts of
    time-respecting 2-edge motifs (Paranjape, Benson, Leskovec, WSDM
    2017, the δ-temporal-motif model at length 2): an edge a→b at t₁
    followed STRICTLY later by b→c at t₂ with 0 < t₂−t₁ ≤ δ. ``c = a``
    is the ping-pong (immediate reciprocation — user⇄assistant
    alternation); ``c ≠ a`` is the chain (influence actually forwarded).
    The temporal refinement of the static wedge count: a static wedge
    whose second hop happens FIRST carries no influence, which is exactly
    what :func:`temporal_reachability` enforces per-path and this op
    counts in aggregate. Both rows always present (zero-count kept) —
    stable schema for the driver gate.

    Scale shape: the middle-vertex self-join is a pure EQUI-join on
    ``(b, time_bucket)`` — the first edge explodes to its own δ-bucket
    and the next (2 rows, bounded), so candidates are only pairs within
    δ or one bucket over, and the exact ``0 < t₂−t₁ ≤ δ`` predicate
    filters the remainder. No unbounded range-join, no cross product;
    skewed middle vertices (hub tools) are ordinary AQE skew-join
    territory, same as every gather in the engine. Output is a 2-row
    aggregate with map-side combine.
    """
    spark = tedges.sparkSession
    e1 = tedges.select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("ts").alias("t1"),
        F.explode(
            F.array(
                F.floor(F.col("ts") / delta_sec),
                F.floor(F.col("ts") / delta_sec) + 1,
            )
        ).alias("bk"),
    )
    e2 = tedges.select(
        F.col("src").alias("b"),
        F.col("dst").alias("c"),
        F.col("ts").alias("t2"),
        F.floor(F.col("ts") / delta_sec).alias("bk"),
    )
    pairs = e1.join(e2, ["b", "bk"]).where(
        (F.col("t2") > F.col("t1")) & (F.col("t2") - F.col("t1") <= delta_sec)
    )
    counted = (
        pairs.select(
            F.when(F.col("c") == F.col("a"), "ping_pong")
            .otherwise("chain")
            .alias("motif")
        )
        .groupBy("motif")
        .agg(F.count("*").alias("n_pairs"))
    )
    both = spark.createDataFrame(
        [("chain",), ("ping_pong",)], "motif string"
    )
    return both.join(counted, "motif", "left").select(
        "motif", F.coalesce("n_pairs", F.lit(0)).alias("n_pairs")
    )


def temporal_motifs_sql(delta_sec: int = 3600) -> str:
    """DuckDB oracle body (expects the ``te_raw``/``verts`` chain of
    :func:`temporal_edges_sql` in scope as CTE ``te``). DuckDB needs no
    bucketing — the plain inequality join replays the identical pair set
    the bucketed equi-join + filter produces."""
    return f"""
    tm_pairs AS (
      SELECT CASE WHEN e2.dst = e1.src THEN 'ping_pong' ELSE 'chain' END AS motif
      FROM te e1
      JOIN te e2 ON e2.src = e1.dst
       AND e2.ts > e1.ts AND e2.ts - e1.ts <= {delta_sec}
    ),
    tm_cnt AS (
      SELECT motif, count(*) AS n_pairs FROM tm_pairs GROUP BY 1
    ),
    tm_all AS (SELECT 'chain' AS motif UNION ALL SELECT 'ping_pong')
    SELECT a.motif, coalesce(c.n_pairs, 0) AS n_pairs
    FROM tm_all a LEFT JOIN tm_cnt c USING (motif)
    """


def densification(tedges: DataFrame, bucket_sec: int = 3600) -> DataFrame:
    """→ ``[bucket_ts, new_vertices, new_edges, v_cum, e_cum, dens_exp]``
    — the graph-densification curve (Leskovec, Kleinberg & Faloutsos,
    KDD 2005): per time bucket, how many vertices/distinct edges appear
    for the FIRST time, the cumulative totals, and the running
    densification exponent ``ln E(t) / ln V(t)``. Real evolving networks
    densify (exponent drifts above 1, superlinear edges-per-vertex) —
    the one-glance capacity-planning curve for an ingest pipeline
    (storage grows as V^a) and an anomaly flag when a crawl or spam
    campaign bends it.

    Scale shape: first-seen is ONE grouped min per distinct edge and ONE
    per vertex (map-side combinable); everything after runs on
    #buckets rows (the per-bucket aggregate), so the cumulative window
    is driver-trivial — no O(V) window anywhere.
    """
    first_e = (
        tedges.where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("ts").alias("fts"))
    )
    first_v = (
        tedges.select(F.col("src").alias("id"), "ts")
        .unionByName(tedges.select(F.col("dst").alias("id"), "ts"))
        .groupBy("id")
        .agg(F.min("ts").alias("fts"))
    )
    bkt = (F.floor(F.col("fts") / bucket_sec) * bucket_sec).alias("bucket_ts")
    eb = first_e.select(bkt).groupBy("bucket_ts").agg(
        F.count("*").alias("new_edges")
    )
    vb = first_v.select(bkt).groupBy("bucket_ts").agg(
        F.count("*").alias("new_vertices")
    )
    per = (
        vb.join(eb, "bucket_ts", "full")
        .select(
            "bucket_ts",
            F.coalesce("new_vertices", F.lit(0)).alias("new_vertices"),
            F.coalesce("new_edges", F.lit(0)).alias("new_edges"),
        )
    )
    w = (
        Window.orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select(
        "bucket_ts",
        "new_vertices",
        "new_edges",
        F.sum("new_vertices").over(w).alias("v_cum"),
        F.sum("new_edges").over(w).alias("e_cum"),
    )
    return cum.select(
        "bucket_ts",
        "new_vertices",
        "new_edges",
        "v_cum",
        "e_cum",
        F.when(
            (F.col("v_cum") > 1) & (F.col("e_cum") > 0),
            F.round(F.log(F.col("e_cum").cast("double"))
                    / F.log(F.col("v_cum").cast("double")), 6),
        ).alias("dens_exp"),
    )


def densification_sql(bucket_sec: int = 3600) -> str:
    """DuckDB oracle body for :func:`densification` (expects ``te`` —
    the materialized :func:`temporal_edges` relation — in scope)."""
    return f"""
    dn_fe AS (
      SELECT src, dst, min(ts) AS fts FROM te WHERE src <> dst
      GROUP BY src, dst
    ),
    dn_fv AS (
      SELECT id, min(ts) AS fts FROM (
        SELECT src AS id, ts FROM te
        UNION ALL
        SELECT dst AS id, ts FROM te
      ) GROUP BY id
    ),
    dn_eb AS (
      SELECT CAST(floor(fts / {int(bucket_sec)}) AS BIGINT) * {int(bucket_sec)}
               AS bucket_ts,
             count(*) AS new_edges
      FROM dn_fe GROUP BY 1
    ),
    dn_vb AS (
      SELECT CAST(floor(fts / {int(bucket_sec)}) AS BIGINT) * {int(bucket_sec)}
               AS bucket_ts,
             count(*) AS new_vertices
      FROM dn_fv GROUP BY 1
    ),
    dn_per AS (
      SELECT coalesce(v.bucket_ts, e.bucket_ts) AS bucket_ts,
             coalesce(v.new_vertices, 0) AS new_vertices,
             coalesce(e.new_edges, 0) AS new_edges
      FROM dn_vb v FULL JOIN dn_eb e ON v.bucket_ts = e.bucket_ts
    ),
    dn_cum AS (
      SELECT bucket_ts, new_vertices, new_edges,
             CAST(sum(new_vertices) OVER w AS BIGINT) AS v_cum,
             CAST(sum(new_edges) OVER w AS BIGINT) AS e_cum
      FROM dn_per
      WINDOW w AS (ORDER BY bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, new_vertices, new_edges, v_cum, e_cum,
           CASE WHEN v_cum > 1 AND e_cum > 0 THEN
             round(ln(CAST(e_cum AS DOUBLE)) / ln(CAST(v_cum AS DOUBLE)), 6)
           END AS dens_exp
    FROM dn_cum
    """


def edge_novelty(
    graph: LinkGraph, transcripts: DataFrame, window_sec: int = 86400
) -> DataFrame:
    """→ ``[win, n_events, n_edges, new_edges, novelty_frac]`` — per
    time window (epoch-second buckets of ``window_sec``), how many edge
    events fired, how many DISTINCT edges they touched, and how many of
    those edges had never been seen in any earlier window. A healthy
    crawl/ingest has falling novelty (the graph saturates); a novelty
    spike mid-stream is the new-source/link-farm-burst signature, and
    novelty pinned at 1.0 means dedup upstream is broken. The
    per-window drilldown of :func:`densification`'s cumulative curve.

    Scale shape: one shuffle keyed on (src, dst, win) to collapse event
    multiplicity, one (src, dst) aggregate for first-seen windows, one
    equi-join back, and a final tiny per-window aggregate. Hot edges
    collapse map-side; nothing groups by vertex.
    """
    if window_sec < 1:
        raise ValueError(f"window_sec must be >= 1, got {window_sec}")
    te = temporal_edges(graph, transcripts)
    w = te.select(
        "src", "dst", (F.floor(F.col("ts") / window_sec)).cast("long").alias("win")
    )
    per = w.groupBy("src", "dst", "win").agg(F.count("*").alias("c"))
    first = per.groupBy("src", "dst").agg(F.min("win").alias("fw"))
    j = per.join(first, ["src", "dst"])
    return j.groupBy("win").agg(
        F.sum("c").alias("n_events"),
        F.count("*").alias("n_edges"),
        F.sum(F.when(F.col("fw") == F.col("win"), 1).otherwise(0)).alias(
            "new_edges"
        ),
        F.round(
            F.sum(F.when(F.col("fw") == F.col("win"), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("novelty_frac"),
    )


def edge_novelty_sql(window_sec: int = 86400) -> str:
    """DuckDB oracle body for :func:`edge_novelty` (expects ``t``/``verts``
    CTEs in scope — the transcript chain of ``edges_sql``)."""
    W = int(window_sec)
    return f"""
    {_TE_CTE},
    en_te AS MATERIALIZED (
      {_TE_SELECT}
    ),
    en_w AS (
      SELECT src, dst, CAST(floor(ts / {W}) AS BIGINT) AS win FROM en_te
    ),
    en_per AS (
      SELECT src, dst, win, count(*) AS c FROM en_w GROUP BY src, dst, win
    ),
    en_first AS (
      SELECT src, dst, min(win) AS fw FROM en_per GROUP BY src, dst
    )
    SELECT p.win,
           CAST(sum(p.c) AS BIGINT) AS n_events,
           count(*) AS n_edges,
           CAST(sum(CASE WHEN f.fw = p.win THEN 1 ELSE 0 END) AS BIGINT)
             AS new_edges,
           round(sum(CASE WHEN f.fw = p.win THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS novelty_frac
    FROM en_per p JOIN en_first f ON f.src = p.src AND f.dst = p.dst
    GROUP BY p.win
    """


def window_edge_jaccard(
    graph: LinkGraph, transcripts: DataFrame, window_sec: int = 86400
) -> DataFrame:
    """→ ``[win, n_cur, n_prev, inter, jaccard]`` — consecutive-window
    graph churn: for every window with activity, the Jaccard overlap
    between its distinct edge set and the PREVIOUS calendar window's
    (empty predecessor ⇒ n_prev 0, jaccard 0.0). Where
    :func:`edge_novelty` measures saturation against ALL history, this
    is the short-horizon drift rate — a sudden dip says the traffic mix
    rotated overnight (deploy, bot cohort, source swap) even when every
    edge was "seen before".

    Scale shape: one (src, dst, win) dedup aggregate, two window-keyed
    count aggregates and one (src, dst, win) self-equi-join for the
    intersection — all hash-partitioned by (edge, win); the per-window
    frames the final left joins touch are #windows rows.
    """
    if window_sec < 1:
        raise ValueError(f"window_sec must be >= 1, got {window_sec}")
    te = temporal_edges(graph, transcripts)
    wins = te.select(
        "src", "dst", (F.floor(F.col("ts") / window_sec)).cast("long").alias("win")
    ).distinct()
    cur_n = wins.groupBy("win").agg(F.count("*").alias("n_cur"))
    prev_n = wins.select((F.col("win") + 1).alias("win")).groupBy("win").agg(
        F.count("*").alias("n_prev")
    )
    inter = (
        wins.join(
            wins.select("src", "dst", (F.col("win") + 1).alias("win")),
            ["src", "dst", "win"],
        )
        .groupBy("win")
        .agg(F.count("*").alias("inter"))
    )
    return (
        cur_n.join(prev_n, "win", "left")
        .join(inter, "win", "left")
        .select(
            "win",
            "n_cur",
            F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
            F.coalesce("inter", F.lit(0)).alias("inter"),
            F.round(
                F.coalesce("inter", F.lit(0))
                / (
                    F.col("n_cur")
                    + F.coalesce("n_prev", F.lit(0))
                    - F.coalesce("inter", F.lit(0))
                ),
                6,
            ).alias("jaccard"),
        )
    )


def window_edge_jaccard_sql(window_sec: int = 86400) -> str:
    """DuckDB oracle body for :func:`window_edge_jaccard` (expects
    ``t``/``verts`` CTEs in scope)."""
    W = int(window_sec)
    return f"""
    {_TE_CTE},
    wj_te AS MATERIALIZED (
      {_TE_SELECT}
    ),
    wj_w AS (
      SELECT DISTINCT src, dst, CAST(floor(ts / {W}) AS BIGINT) AS win
      FROM wj_te
    ),
    wj_cur AS (SELECT win, count(*) AS n_cur FROM wj_w GROUP BY win),
    wj_prev AS (SELECT win + 1 AS win, count(*) AS n_prev FROM wj_w GROUP BY win + 1),
    wj_int AS (
      SELECT a.win, count(*) AS inter
      FROM wj_w a JOIN wj_w b
        ON b.src = a.src AND b.dst = a.dst AND b.win + 1 = a.win
      GROUP BY a.win
    )
    SELECT c.win, c.n_cur,
           coalesce(p.n_prev, 0) AS n_prev,
           coalesce(i.inter, 0) AS inter,
           round(coalesce(i.inter, 0) * 1.0
                 / (c.n_cur + coalesce(p.n_prev, 0) - coalesce(i.inter, 0)), 6)
             AS jaccard
    FROM wj_cur c
    LEFT JOIN wj_prev p ON p.win = c.win
    LEFT JOIN wj_int i ON i.win = c.win
    """


def reciprocity_latency(graph: LinkGraph, transcripts: DataFrame) -> DataFrame:
    """→ one-row ``[n_mutual, p50_gap, p90_gap, max_gap]`` — how fast
    links get reciprocated: over every unordered pair whose BOTH
    directions eventually fire, the gap (seconds) between the first
    u→v event and the first v→u event, summarized as exact
    quantile-interpolated percentiles. The temporal refinement of
    :func:`~linkgraph_spark.kernels.stats.reciprocity`'s static rate —
    organic hand-offs reciprocate in minutes; a months-long gap is
    cross-linking negotiated out of band (the link-exchange signature).

    Scale shape: one (src, dst) min-ts aggregate over the event stream,
    one self-equi-join on the reversed key (src < dst counts each pair
    once), one global percentile aggregate. No windows over raw events.
    """
    te = temporal_edges(graph, transcripts)
    first = te.groupBy("src", "dst").agg(F.min("ts").alias("ft"))
    rev = first.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("ft").alias("rt")
    )
    pairs = first.join(rev, ["src", "dst"]).where(F.col("src") < F.col("dst"))
    gap = F.abs(F.col("ft") - F.col("rt")).cast("double")
    return pairs.select(gap.alias("gap")).agg(
        F.count("*").alias("n_mutual"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("p50_gap"),
        F.round(F.expr("percentile(gap, 0.9)"), 6).alias("p90_gap"),
        F.max("gap").alias("max_gap"),
    )


def reciprocity_latency_sql() -> str:
    """DuckDB oracle body for :func:`reciprocity_latency` (expects
    ``t``/``verts`` CTEs in scope)."""
    return f"""
    {_TE_CTE},
    rl_te AS MATERIALIZED (
      {_TE_SELECT}
    ),
    rl_first AS (
      SELECT src, dst, min(ts) AS ft FROM rl_te GROUP BY src, dst
    ),
    rl_pairs AS (
      SELECT CAST(abs(a.ft - b.ft) AS DOUBLE) AS gap
      FROM rl_first a
      JOIN rl_first b ON b.src = a.dst AND b.dst = a.src
      WHERE a.src < a.dst
    )
    SELECT count(*) AS n_mutual,
           round(quantile_cont(gap, 0.5), 6) AS p50_gap,
           round(quantile_cont(gap, 0.9), 6) AS p90_gap,
           max(gap) AS max_gap
    FROM rl_pairs
    """


def hub_trajectory(
    graph: LinkGraph,
    transcripts: DataFrame,
    window_sec: int = 86400,
    k: int = 5,
) -> DataFrame:
    """→ ``[win, hub, n_edges]`` — the per-window distinct-edge activity
    of the graph's overall top-``k`` out-degree hubs (degree ties break
    by id ascending; only windows where the hub fired appear). The
    emergence trace: an organic hub's trajectory ramps over many
    windows, a link farm's jumps from zero to peak in one — read next
    to :func:`edge_novelty`, which says the same thing without naming
    the culprits.

    Scale shape: the hub list is a k-row TakeOrdered broadcast; the
    stream is filtered to hub-sourced rows BEFORE the (hub, win) dedup
    aggregate, so nothing groups over non-hub traffic.
    """
    if window_sec < 1:
        raise ValueError(f"window_sec must be >= 1, got {window_sec}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    hubs = deg.orderBy(F.desc("deg"), F.asc("id")).limit(k)
    te = temporal_edges(graph, transcripts)
    w = (
        te.join(F.broadcast(hubs.select(F.col("id").alias("src"))), "src")
        .select(
            F.col("src").alias("hub"),
            "dst",
            (F.floor(F.col("ts") / window_sec)).cast("long").alias("win"),
        )
        .distinct()
    )
    return w.groupBy("win", "hub").agg(F.count("*").alias("n_edges"))


def hub_trajectory_sql(window_sec: int = 86400, k: int = 5) -> str:
    """DuckDB oracle body for :func:`hub_trajectory` (expects
    ``t``/``verts``/``edges`` CTEs in scope)."""
    W, K = int(window_sec), int(k)
    return f"""
    {_TE_CTE},
    ht_te AS MATERIALIZED (
      {_TE_SELECT}
    ),
    ht_e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
    ht_deg AS (SELECT src AS id, count(*) AS deg FROM ht_e GROUP BY src),
    ht_hubs AS (SELECT id FROM ht_deg ORDER BY deg DESC, id LIMIT {K}),
    ht_w AS (
      SELECT DISTINCT e.src AS hub, e.dst,
             CAST(floor(e.ts / {W}) AS BIGINT) AS win
      FROM ht_te e JOIN ht_hubs h ON h.id = e.src
    )
    SELECT win, hub, count(*) AS n_edges FROM ht_w GROUP BY win, hub
    """


def edge_persistence(
    graph: LinkGraph, transcripts: DataFrame, window_sec: int = 86400
) -> DataFrame:
    """→ ``[n_windows, n_edges]`` — the edge-persistence histogram: for
    every distinct edge, in how many calendar windows it fired, bucketed
    into how many edges share that persistence. The stability spectrum
    behind :func:`window_edge_jaccard`'s pairwise churn — a bimodal
    histogram (one-shot edges plus always-on edges, nothing between) is
    the infrastructure-vs-traffic split, and mass moving toward 1 says
    the graph is becoming drive-by.

    Scale shape: one (src, dst, win) dedup aggregate, one (src, dst)
    count aggregate, one tiny integer-keyed histogram. No joins.
    """
    if window_sec < 1:
        raise ValueError(f"window_sec must be >= 1, got {window_sec}")
    te = temporal_edges(graph, transcripts)
    wins = te.select(
        "src", "dst", (F.floor(F.col("ts") / window_sec)).cast("long").alias("win")
    ).distinct()
    per = wins.groupBy("src", "dst").agg(F.count("*").alias("n_windows"))
    return per.groupBy("n_windows").agg(F.count("*").alias("n_edges"))


def edge_persistence_sql(window_sec: int = 86400) -> str:
    """DuckDB oracle body for :func:`edge_persistence` (expects
    ``t``/``verts`` CTEs in scope)."""
    W = int(window_sec)
    return f"""
    {_TE_CTE},
    ep_te AS MATERIALIZED (
      {_TE_SELECT}
    ),
    ep_w AS (
      SELECT DISTINCT src, dst, CAST(floor(ts / {W}) AS BIGINT) AS win
      FROM ep_te
    ),
    ep_per AS (
      SELECT src, dst, count(*) AS n_windows FROM ep_w GROUP BY src, dst
    )
    SELECT n_windows, count(*) AS n_edges FROM ep_per GROUP BY n_windows
    """


def triadic_closure(
    graph: LinkGraph, transcripts: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """→ one-row ``[t_split, n_open_wedges, n_closed_later, closure_rate]``
    — the temporal triadic-closure rate: of the unordered pairs (a, c)
    that were two-hops-apart-but-unlinked at the observation midpoint,
    what fraction became directly linked afterwards? The empirical
    footing for every common-neighbor link predictor in this repo
    (``adamic_adar`` / ``link_scores``): it measures how often the open
    wedge actually closes on THIS graph.

    Protocol: t_split = min_ts + (max_ts − min_ts)/2 over the temporal
    edge stream (deterministic, replayable). "Linked by t" uses the
    undirected first-seen time fe(a,b) = min ts over both orientations.
    Open wedge at t_split: ∃b with fe(a,b) ≤ t, fe(b,c) ≤ t, a ≠ c, and
    fe(a,c) either absent or > t. Closed later: fe(a,c) > t exists.

    ``max_degree`` caps the wedge CENTER b (same knob as ``adamic_adar``):
    a hub with early degree d contributes d² candidate pairs; capping
    bounds enumeration while only dropping wedges brokered by hubs.

    Scale shape: one min-agg for fe, one 2-row reduce for t_split
    (broadcast back via a 1-row cross join — no global window), one
    wedge equi-join over the early adjacency (Σ deg² paths, cappable)
    deduped to distinct pairs, one anti-join (open = not yet linked) and
    one left semi-style join against later first-links. All equi-joins.
    """
    te = temporal_edges(graph, transcripts)
    und = te.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"), "ts"
    )
    fe = und.groupBy("a", "b").agg(F.min("ts").alias("fe"))
    split = fe.agg(
        (F.min("fe") + F.floor((F.max("fe") - F.min("fe")) / F.lit(2))).alias(
            "t_split"
        )
    )
    early = fe.join(F.broadcast(split), F.col("fe") <= F.col("t_split")).select(
        "a", "b"
    )
    sym = early.unionByName(
        early.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    center = sym if max_degree is None else sym.join(
        sym.groupBy(F.col("a").alias("ctr")).agg(F.count("*").alias("d"))
        .where(F.col("d") <= int(max_degree)).select("ctr"),
        F.col("a") == F.col("ctr"),
    ).select("a", "b")
    l = center.select(F.col("b").alias("x"), F.col("a").alias("ctr"))
    r = center.select(F.col("a").alias("ctr"), F.col("b").alias("y"))
    cand = (
        l.join(r, "ctr")
        .where(F.col("x") < F.col("y"))
        .select(F.col("x").alias("a"), F.col("y").alias("b"))
        .distinct()
    )
    open_w = cand.join(early, ["a", "b"], "left_anti")
    later = fe.join(F.broadcast(split), F.col("fe") > F.col("t_split")).select(
        "a", "b", F.lit(1).alias("closed")
    )
    stats = open_w.join(later, ["a", "b"], "left").agg(
        F.count("*").alias("n_open_wedges"),
        F.coalesce(F.sum("closed"), F.lit(0)).alias("n_closed_later"),
    )
    return stats.join(F.broadcast(split), F.lit(True)).select(
        "t_split",
        "n_open_wedges",
        "n_closed_later",
        F.round(
            F.when(
                F.col("n_open_wedges") > 0,
                F.col("n_closed_later") / F.col("n_open_wedges"),
            ),
            6,
        ).alias("closure_rate"),
    )


def triadic_closure_sql(max_degree: int | None = None) -> str:
    """DuckDB oracle body (expects ``t`` — the transcripts CTE — plus the
    graph CTEs in scope; reuses the temporal-edge derivation)."""
    ctr = (
        "tc_sym"
        if max_degree is None
        else f"(SELECT s.* FROM tc_sym s JOIN "
        f"(SELECT a, count(*) AS d FROM tc_sym GROUP BY a) dd ON dd.a = s.a "
        f"WHERE dd.d <= {int(max_degree)})"
    )
    return f"""
    {_TE_CTE},
    tc_te AS (
      {_TE_SELECT}
    ),
    tc_fe AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b, min(ts) AS fe
      FROM tc_te WHERE src <> dst GROUP BY 1, 2
    ),
    tc_split AS (
      SELECT min(fe) + (max(fe) - min(fe)) // 2 AS t_split FROM tc_fe
    ),
    tc_early AS MATERIALIZED (
      SELECT a, b FROM tc_fe, tc_split WHERE fe <= t_split
    ),
    tc_sym AS MATERIALIZED (
      SELECT a, b FROM tc_early UNION ALL SELECT b AS a, a AS b FROM tc_early
    ),
    tc_cand AS (
      SELECT DISTINCT l.b AS a, r.b AS b
      FROM {ctr} l JOIN {ctr} r ON r.a = l.a AND l.b < r.b
    ),
    tc_open AS (
      SELECT c.a, c.b FROM tc_cand c
      ANTI JOIN tc_early e ON e.a = c.a AND e.b = c.b
    ),
    tc_later AS (
      SELECT a, b FROM tc_fe, tc_split WHERE fe > t_split
    ),
    tc_stats AS (
      SELECT count(*) AS n_open_wedges,
             coalesce(sum(CASE WHEN lt.a IS NOT NULL THEN 1 END), 0)
               AS n_closed_later
      FROM tc_open o
      LEFT JOIN tc_later lt ON lt.a = o.a AND lt.b = o.b
    )
    SELECT t_split, n_open_wedges, n_closed_later,
           CASE WHEN n_open_wedges > 0
                THEN round(n_closed_later * 1.0 / n_open_wedges, 6) END
             AS closure_rate
    FROM tc_stats, tc_split
    """


def pref_attach_test(graph: LinkGraph, transcripts: DataFrame) -> DataFrame:
    """→ ``[deg, n_vertices, n_new_attach, rate]`` — the empirical
    preferential-attachment curve (Barabási–Albert's Π(d) test, per
    Newman PRE 2001's measurement protocol): split the edge stream at
    its time midpoint, bucket vertices by their EARLY undirected degree
    d, and count how many LATER first-time edges attach to each bucket.
    ``rate = n_new_attach / n_vertices`` per bucket — linear growth in d
    is the rich-get-richer regime that produces this graph family's
    power-law tail (:func:`~linkgraph_spark.kernels.stats.
    degree_powerlaw` measures the RESULT; this measures the MECHANISM).
    Endpoints with no early presence are excluded (a vertex born after
    the split has no degree to condition on — the standard protocol).

    Scale shape: one min-agg for undirected first-seen times, a 2-row
    reduce broadcast back for the split, one degree agg over early
    edges, an endpoint explode of later edges joined to the degree table
    (equi-join), and a ≤|distinct degrees| histogram. No windows.
    """
    te = temporal_edges(graph, transcripts)
    und = te.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"), "ts"
    )
    fe = und.groupBy("a", "b").agg(F.min("ts").alias("fe"))
    split = fe.agg(
        (F.min("fe") + F.floor((F.max("fe") - F.min("fe")) / F.lit(2))).alias(
            "t_split"
        )
    )
    early = fe.join(F.broadcast(split), F.col("fe") <= F.col("t_split")).select(
        "a", "b"
    )
    deg = (
        early.select(F.col("a").alias("id"))
        .unionByName(early.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    later_ends = (
        fe.join(F.broadcast(split), F.col("fe") > F.col("t_split"))
        .select(F.explode(F.array("a", "b")).alias("id"))
    )
    attach = later_ends.join(deg, "id").groupBy("deg").agg(
        F.count("*").alias("n_new_attach")
    )
    verts = deg.groupBy("deg").agg(F.count("*").alias("n_vertices"))
    return verts.join(attach, "deg", "left").select(
        "deg",
        "n_vertices",
        F.coalesce("n_new_attach", F.lit(0)).alias("n_new_attach"),
        F.round(
            F.coalesce("n_new_attach", F.lit(0)) / F.col("n_vertices"), 6
        ).alias("rate"),
    )


def pref_attach_test_sql() -> str:
    """DuckDB oracle body (expects ``t``/``verts`` CTEs in scope)."""
    return f"""
    {_TE_CTE},
    pa_te AS (
      {_TE_SELECT}
    ),
    pa_fe AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b, min(ts) AS fe
      FROM pa_te WHERE src <> dst GROUP BY 1, 2
    ),
    pa_split AS (
      SELECT min(fe) + (max(fe) - min(fe)) // 2 AS t_split FROM pa_fe
    ),
    pa_early AS (
      SELECT a, b FROM pa_fe, pa_split WHERE fe <= t_split
    ),
    pa_deg AS MATERIALIZED (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM pa_early UNION ALL SELECT b AS id FROM pa_early
      ) GROUP BY id
    ),
    pa_later AS (
      SELECT id FROM (
        SELECT unnest([a, b]) AS id FROM pa_fe, pa_split WHERE fe > t_split
      )
    ),
    pa_attach AS (
      SELECT d.deg, count(*) AS n_new_attach
      FROM pa_later l JOIN pa_deg d ON d.id = l.id
      GROUP BY d.deg
    ),
    pa_verts AS (
      SELECT deg, count(*) AS n_vertices FROM pa_deg GROUP BY deg
    )
    SELECT v.deg, v.n_vertices,
           coalesce(a.n_new_attach, 0) AS n_new_attach,
           round(coalesce(a.n_new_attach, 0) * 1.0 / v.n_vertices, 6) AS rate
    FROM pa_verts v LEFT JOIN pa_attach a ON a.deg = v.deg
    """


def pagerank_drift(
    graph: LinkGraph,
    tedges: DataFrame,
    iterations: int = 3,
    d: float = 0.8,
) -> DataFrame:
    """→ ``[id, rank_old, rank_new, delta]`` — importance DRIFT between
    the stream's time halves: reference-compat PageRank (fixed
    ``iterations``, damping ``d``, in-deg-or-1 divisor, keep-old-rank
    quirk) run twice over the SAME full vertex universe — once on the
    edges at or before the exact floored-median edge instant, once on
    the rest — so the two rank vectors share the 1/N init and are
    directly comparable.  ``delta = rank_new − rank_old`` (rounded 6):
    rising actors are emerging hubs, falling ones are cooling topics —
    the temporal complement of :func:`~linkgraph_spark.kernels.pagerank.
    pagerank`'s warm-start path (which re-converges; this one contrasts).

    The cutoff is the exact interpolated median of edge timestamps,
    floored (the wave-132 era-cutoff convention — engine-identical for
    integer seconds).  Halves are deduplicated to simple edges, matching
    the static ETL's first-wins semantics.

    Scale: two fixed-iteration compat runs (each the reference superstep
    shape — one gather join + grouped sum per round) + one O(V) join.
    The median is a single tiny aggregate."""
    from linkgraph_spark.edges import LinkGraph as _LG
    from linkgraph_spark.edges import vertex_degrees
    from linkgraph_spark.kernels.pagerank import pagerank

    cutoff = tedges.agg(
        F.expr("CAST(floor(percentile(ts, 0.5)) AS BIGINT)").alias("c")
    ).collect()[0]["c"]

    def _half(pred):
        e = (
            tedges.where(pred)
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        dg = vertex_degrees(graph.vertices, e)
        g2 = _LG(
            vertices=graph.vertices,
            edges=e,
            degrees=dg,
            num_vertices=graph.num_vertices,
        )
        return pagerank(g2, mode="compat", iterations=iterations).ranks

    r_old = _half(F.col("ts") <= cutoff).select(
        "id", F.round("rank", 6).alias("rank_old")
    )
    r_new = _half(F.col("ts") > cutoff).select(
        "id", F.round("rank", 6).alias("rank_new")
    )
    return r_old.join(r_new, "id").select(
        "id",
        "rank_old",
        "rank_new",
        F.round(F.col("rank_new") - F.col("rank_old"), 6).alias("delta"),
    )


def pagerank_drift_sql(iters: int = 3, d: float = 0.8) -> str:
    """DuckDB oracle body (expects ``verts`` and the ``te`` temporal-edge
    CTE of :func:`temporal_edges_sql` in scope): the identical two
    compat chains over the median-split halves."""

    def chain(p: str, pred: str) -> str:
        ctes = [
            f"""{p}e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM te WHERE src <> dst AND ({pred})
    )""",
            f"""{p}dg AS MATERIALIZED (
      SELECT v.id, coalesce(i.c, 1) AS relation_length
      FROM verts v
      LEFT JOIN (SELECT dst AS id, count(*) AS c FROM {p}e GROUP BY dst) i
        USING (id)
    )""",
            f"{p}r0 AS (SELECT id, 1.0 / nv.n AS rank FROM verts CROSS JOIN nv)",
        ]
        for k in range(1, iters + 1):
            ctes.append(
                f"""{p}r{k} AS MATERIALIZED (
      SELECT r.id,
             CASE WHEN s.sm IS NOT NULL THEN {d} * s.sm + {1 - d:.17g} / nv.n
                  ELSE r.rank END AS rank
      FROM {p}r{k - 1} r CROSS JOIN nv
      LEFT JOIN (
        SELECT e.dst AS id, sum(r2.rank / dg.relation_length) AS sm
        FROM {p}e e
        JOIN {p}r{k - 1} r2 ON e.src = r2.id
        JOIN {p}dg dg ON dg.id = e.src
        GROUP BY e.dst
      ) s ON s.id = r.id
    )"""
            )
        return ",\n    ".join(ctes)

    return f"""
    nv AS (SELECT count(*) AS n FROM verts),
    pd_cut AS MATERIALIZED (
      SELECT CAST(floor(median(ts)) AS BIGINT) AS c FROM te
    ),
    {chain("pdo_", "ts <= (SELECT c FROM pd_cut)")},
    {chain("pdn_", "ts > (SELECT c FROM pd_cut)")}
    SELECT o.id,
           round(o.rank, 6) AS rank_old,
           round(n.rank, 6) AS rank_new,
           round(round(n.rank, 6) - round(o.rank, 6), 6) AS delta
    FROM pdo_r{iters} o JOIN pdn_r{iters} n USING (id)
    """
