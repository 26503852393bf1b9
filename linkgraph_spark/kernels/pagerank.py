"""Iterative PageRank — the engine's flagship kernel.

Two semantics, both over the same superstep scaffold:

- **textbook** (default, BASELINE.json north_star): divisor = contributor's
  out-degree, damping 0.85, dangling mass redistributed uniformly, run to
  L-inf residual < 1e-6.
- **compat**: faithful to the reference's math
  (``pagerank_lambda/dynamodb/pagerank.py:67-88``): damping 0.8, fixed
  iteration count, divisor = contributor's stored ``relation_length``
  (its in-degree, or 1 for pure sources — ``driver.py:124,127-135``),
  ``remain = (1-d)/N`` (``driver.py:158-159``), init rank 1/N
  (``driver.py:113``), no dangling handling, and vertices that never occur
  as a destination keep their init rank forever (the store row is simply
  never updated). Synchronous (Jacobi) supersteps — the well-defined
  barrier-per-iteration execution; the reference's Lambdas run without a
  barrier (``pagerank.py:108-112``) and are therefore nondeterministic, so
  the pytest oracle pins snapshot-read semantics (SURVEY.md §2.4 quirk 2).

One superstep = gather (hash join edges⋈ranks, replacing the reference's
per-key point gets) → per-dst sum (replacing its Python accumulation loop)
→ apply (damping + teleport) → optional checkpoint (replacing its per-row
store puts).

Scale/efficiency design:

- the divisor is attached to the edge table ONCE before the loop
  (iteration-invariant) and persisted, so each superstep shuffles only
  ``(src, dst, div) ⋈ (id, rank)`` plus the per-dst sum;
- the rank state is ``localCheckpoint()``-ed every superstep — without
  lineage truncation the logical plan grows per iteration and Catalyst
  re-analysis goes quadratic (the standard iterative-Spark trap); on a
  cluster the durable checkpoint (``CheckpointStore``) serves double duty;
- exactly ONE Spark job per superstep: the residual AND the next
  iteration's dangling mass ride the rank-vector materialization via
  ``observe()`` (the static ``is_dangling`` flag rides along in the state
  vector, so no per-iteration join against the dangling set and no second
  aggregate scan);
- hub-vertex ranks join broadcast (``skew.gather_contribs``), the shuffled
  remainder is covered by AQE skew-join splitting.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.config import COMPAT_DAMPING, COMPAT_ITERATIONS, EngineConfig
from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.skew import (
    gather_contribs,
    gather_contribs_presplit,
    hub_vertices,
    plain_sum,
    salted_sum,
    split_edges_by_hub,
)


@dataclass
class PageRankResult:
    ranks: DataFrame  # [id: long, rank: double]
    iterations: int
    converged: bool
    residual: float | None
    metrics: list = field(default_factory=list)


def _edges_with_divisor(graph: LinkGraph, mode: str) -> DataFrame:
    """Attach the iteration-invariant divisor to every edge.

    textbook → src out-degree; compat → src relation_length (in-deg-or-1,
    the reference's quirk — SURVEY.md §2.4); weighted → w_out_deg / weight
    (so contrib = rank * weight / total outgoing weight)."""
    if mode == "weighted":
        deg = graph.degrees.select(F.col("id").alias("src"), "w_out_deg")
        return (
            graph.edges.join(deg, "src")
            .select("src", "dst", (F.col("w_out_deg") / F.col("weight")).alias("div"))
        )
    div_col = "out_deg" if mode == "textbook" else "relation_length"
    deg = graph.degrees.select(F.col("id").alias("src"), F.col(div_col).alias("div"))
    return graph.edges.join(deg, "src").select("src", "dst", "div")


def pagerank(
    graph: LinkGraph,
    mode: str = "textbook",
    config: EngineConfig | None = None,
    iterations: int | None = None,
    checkpoint: CheckpointStore | None = None,
    resume: bool = False,
    personalize_ids: list | None = None,
    use_hub_broadcast: bool = True,
    use_salting: bool = False,
    gather_fn=None,
    gather_mode: str = "builtin",
    profile: bool = False,
    force_big_state: bool | None = None,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """Run PageRank to convergence (textbook) or a fixed count (compat).

    ``init_ranks`` (``[id, rank]``) warm-starts the iteration — the
    incremental-update path: after the edge table changes a little (a day's
    new conversations), re-converge from yesterday's ranks (use
    :func:`remap_ranks` to cross an id reassignment). The head start is
    log(dist_cold/dist_warm)/log(1/d) supersteps — the residual's slow
    eigenmode decays at d per superstep from wherever you start, so a 10x
    closer start saves ~14 supersteps at d=0.85 (measured 39 -> 34 for a
    1-conversation delta on a 100-conversation graph). Vertices absent
    from ``init_ranks`` (new actors) start at the teleport weight; the
    affine PageRank map has a unique fixpoint, so the warm result equals
    the cold one to the same tolerance regardless of the stale vector's
    drift. Mutually exclusive with ``resume``.

    ``gather_mode='csr'`` replaces the builtin hash aggregate with the
    Arrow-vectorized range-blocked CSR reduction (``linkgraph_spark.csr``).
    ``gather_fn(edges_div, ranks) -> DataFrame[dst, contrib, src]`` lets a
    custom gather replace the builtin join.
    ``resume=True`` restarts from the latest committed checkpoint iteration.
    ``profile=True`` adds a per-stage timing breakdown (gather / gather+agg
    / materialize) to each superstep's metrics — the engine-grade version of
    the reference's per-vertex get/rank/put timings
    (``pagerank_lambda/dynamodb/pagerank.py:93-99``). Profiling runs extra
    measurement jobs per superstep, so it is opt-in (the default superstep
    is exactly ONE Spark job).
    """
    cfg = config or EngineConfig()
    if mode == "compat":
        damping = COMPAT_DAMPING
        n_iters = iterations if iterations is not None else COMPAT_ITERATIONS
        check_convergence = False
    elif mode in ("textbook", "weighted"):
        damping = cfg.damping
        n_iters = iterations if iterations is not None else cfg.max_iterations
        check_convergence = iterations is None
    else:
        raise ValueError(f"unknown mode {mode!r}")
    if personalize_ids is not None and mode == "compat":
        raise ValueError("personalization applies to textbook/weighted modes")
    if init_ranks is not None and resume:
        raise ValueError("init_ranks and resume are mutually exclusive")
    if init_ranks is not None and mode == "compat":
        # compat runs a FIXED iteration count with no convergence check, so
        # a warm start silently changes the (reference-mirroring) result
        raise ValueError("init_ranks applies to textbook/weighted modes")

    spark = graph.vertices.sparkSession
    n = graph.num_vertices
    if n == 0:
        raise ValueError("PageRank on an empty graph (no vertices derived)")
    teleport = (1.0 - damping) / n
    # NOTE on the gather join strategy: while the rank vector fits the
    # broadcast threshold AQE broadcasts it, so the O(E) edge side never
    # shuffles at all (measured ~4x faster per superstep than forcing an
    # aligned hash partitioning here). Beyond broadcast scale, the cluster
    # deployment buckets the edge table on `src` (storage-partitioned join)
    # so the O(E) side still shuffles zero times per superstep.
    #
    # localCheckpoint (not persist): both pin the blocks once, but persist
    # keeps the FULL ETL lineage in the logical plan, so every superstep
    # re-analyzes the whole upstream tree (measured: a 130-operator
    # formatted plan per superstep on the bench graph); the checkpoint
    # truncates the loop's per-iteration plan to a leaf. Blocks are freed
    # in the caller's finally via free_tracked.
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    static_blocks: set = set()
    edges_div, _blks = checkpoint_tracked(_edges_with_divisor(graph, mode))
    static_blocks |= _blks
    n_edges = edges_div.count()  # blocks already materialized (eager ckpt)

    hub_ids = None
    hub_blocks: set = set()
    if use_hub_broadcast:
        # checkpointed for the same plan-truncation reason as edges_div:
        # the big-state loop broadcast-semi-joins it every superstep
        hub_ids, hub_blocks = checkpoint_tracked(
            hub_vertices(graph.degrees, cfg.hub_degree_threshold)
        )
        if hub_ids.count() == 0:
            free_tracked(spark.sparkContext, hub_blocks)
            hub_ids, hub_blocks = None, set()

    # large rank vectors: shuffle-hash gather beats per-superstep broadcast
    # (re-broadcasting O(V) state each superstep measured ~3x slower at 2M
    # vertices); the whole loop runs with auto-broadcast off, restored after
    # crossover measured empirically: medium graphs (<~5M edges) run best
    # with AQE + runtime broadcast; beyond that, pinned shuffle-hash plans
    # with AQE off win ~2-3x per superstep
    # force_big_state lets tests value-verify the big-state regime (pinned
    # shuffle-hash gather, AQE off, no broadcast) on small oracle graphs
    big_state = (
        force_big_state
        if force_big_state is not None
        else n_edges > 5_000_000 or n > 2_000_000
    )
    # big-state loops with a hub set: split the edge table ONCE (the split
    # is iteration-invariant — re-tagging O(E) rows per superstep was pure
    # repeated work) and drop the untagged copy's cache
    edges_split = None
    if big_state and hub_ids is not None and gather_fn is None:
        rest, hubs = split_edges_by_hub(edges_div, hub_ids)
        rest, _b1 = checkpoint_tracked(rest)
        hubs, _b2 = checkpoint_tracked(hubs)
        edges_split = (rest, hubs)
        # the untagged table's blocks are no longer referenced by the loop
        free_tracked(spark.sparkContext, static_blocks)
        static_blocks = _b1 | _b2

    saved_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    saved_sp = spark.conf.get("spark.sql.shuffle.partitions")
    loop_blocks: set = set()
    try:
        return _pagerank_loop(
            graph, mode, cfg, spark, n, n_iters, damping, teleport,
            check_convergence, personalize_ids, edges_div, n_edges, hub_ids,
            big_state, gather_fn, gather_mode, use_salting, checkpoint, resume,
            profile, init_ranks, edges_split, loop_blocks,
        )
    finally:
        free_tracked(spark.sparkContext, loop_blocks)
        # restore session confs + free caches on EVERY exit path (including
        # exceptions/interrupts mid-loop) — a shared SparkSession must not
        # be left with AQE/broadcast disabled by a failed run
        free_tracked(spark.sparkContext, static_blocks)
        free_tracked(spark.sparkContext, hub_blocks)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_threshold)
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", saved_sp)


def remap_ranks(
    old_graph: LinkGraph, old_ranks: DataFrame, new_graph: LinkGraph
) -> DataFrame:
    """→ ``[id, rank]`` in ``new_graph``'s id space — the warm-start bridge
    across graph REBUILDS. Vertex ids are sorted-rank positions
    (``edges.py``), so adding actors shifts every later id; the stable join
    key across builds is ``actor_key``. Actors present only in the new
    graph are simply absent here (``pagerank(init_ranks=...)`` starts them
    at the teleport weight). Two hash joins, no iteration."""
    keyed = old_ranks.join(
        old_graph.vertices.select("id", "actor_key"), "id"
    ).select("actor_key", "rank")
    return (
        new_graph.vertices.select("id", "actor_key")
        .join(keyed, "actor_key")
        .select("id", "rank")
    )


def _pagerank_loop(
    graph, mode, cfg, spark, n, n_iters, damping, teleport, check_convergence,
    personalize_ids, edges_div, n_edges, hub_ids, big_state, gather_fn,
    gather_mode, use_salting, checkpoint, resume, profile=False,
    init_ranks=None, edges_split=None, loop_blocks=None,
) -> PageRankResult:
    # AQE's per-stage re-planning costs more than it saves once the loop's
    # plan shape is pinned — at EVERY scale (measured 2x per-superstep
    # overhead at 20M edges; −25-43% wall with AQE off at 55k-3M edges).
    # Big state pins shuffle-hash gather; small state pins a broadcast
    # gather and scales shuffle partitions with data size instead of core
    # count (32 near-empty reducers are pure task overhead on a 55k-edge
    # graph). All confs restored by the caller's finally.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if big_state:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    else:
        sp_cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        sp_loop = min(sp_cur, max(8, n_edges // 100_000))
        spark.conf.set("spark.sql.shuffle.partitions", str(sp_loop))
        # LONG loops: co-partition the static edge table with the rank
        # state ONCE (hash by src at the loop's scaled count, materialized
        # so the exchange is not re-run per superstep): the gather is then
        # a per-partition hash probe of the id-partitioned state — no
        # per-superstep broadcast build and no exchange on either join
        # side; the ONE exchange left per superstep is the per-dst
        # aggregation.  The one-time repartition+checkpoint costs ~a
        # superstep, so SHORT fixed-iteration runs keep the coalesce +
        # per-superstep broadcast shape instead (A/B: 3-iteration rows
        # regressed ~+0.1 s under the unconditional flip; the 35-superstep
        # convergence run gains).  A hub src's edges share a partition,
        # but the small regime is capped at 5M edges so the worst task is
        # bounded; the big regime keeps its explicit hub machinery.
        copart = n_iters >= 12 and gather_fn is None
        if copart:
            from linkgraph_spark.lineage import checkpoint_tracked as _ckpt

            edges_div, _eb = _ckpt(edges_div.repartition(sp_loop, "src"))
            if loop_blocks is not None:
                loop_blocks |= _eb
        else:
            edges_div = edges_div.coalesce(sp_loop)
    if gather_fn is not None:
        gather = gather_fn
    elif not big_state:
        # small regime: no hub split in either shape — the broadcast (or
        # the per-partition hash probe) serves hub keys map-side already,
        # so a split is pure overhead (guide §2.4: remove the work
        # outright).
        if copart:
            gather = lambda ed, r: gather_contribs(ed, r, None, shuffle_hint=True)
        else:
            gather = lambda ed, r: gather_contribs(ed, r, None, broadcast_hint=True)
    elif edges_split is not None:
        # big state + hubs: slices pre-split before the loop; the hub
        # slice's rank rows broadcast, the rest shuffle-hash joins
        gather = lambda ed, r: gather_contribs_presplit(
            edges_split[0], edges_split[1], r, hub_ids
        )
    else:
        gather = lambda ed, r: gather_contribs(ed, r, None, shuffle_hint=True)
    if gather_mode == "csr":
        from linkgraph_spark.csr import csr_block_sum

        agg = lambda c: csr_block_sum(c, cfg.block_width)  # noqa: E731
    elif use_salting:
        agg = lambda c: salted_sum(c, cfg.salt_buckets)  # noqa: E731
    else:
        agg = plain_sum

    # state vector carries the static is_dangling flag (and the static
    # teleport weight, for personalized PageRank) so the per-superstep
    # aggregates/apply never need extra joins
    dangling_flag = (F.col("out_deg") == 0).alias("is_dangling")
    base = graph.degrees
    if personalize_ids is not None:
        n_src = len(personalize_ids)
        if n_src <= 64:
            # tiny source sets: a literal IN-list folds to a constant filter
            tele = F.when(
                F.col("id").isin([int(x) for x in personalize_ids]),
                F.lit(1.0 / n_src),
            ).otherwise(F.lit(0.0))
        else:
            # large source sets: isin() is a linear per-row scan of the
            # literal list — attach the flag via a broadcast left join
            # instead (one-time cost; tele rides in the state vector after)
            src_df = spark.createDataFrame(
                [(int(x),) for x in personalize_ids], "id long"
            ).withColumn("_is_src", F.lit(True))
            base = graph.degrees.join(F.broadcast(src_df), "id", "left")
            tele = F.when(F.col("_is_src"), F.lit(1.0 / n_src)).otherwise(F.lit(0.0))
    else:
        tele = F.lit(1.0 / n)
    init = base.select(
        "id", tele.alias("rank"), dangling_flag, tele.alias("tele")
    )
    if init_ranks is not None:
        # warm start: stale ranks where known, teleport weight for new ids —
        # one left join, evaluated once before the loop
        init = (
            base.join(
                init_ranks.select("id", F.col("rank").alias("_warm")), "id", "left"
            )
            .select(
                "id",
                F.coalesce("_warm", tele).alias("rank"),
                dangling_flag,
                tele.alias("tele"),
            )
        )

    kernel = f"pagerank_{mode}"
    start_iter = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration(kernel)
        if latest is not None:
            saved = checkpoint.load_state(spark, kernel, latest)
            init = saved.join(
                base.select("id", dangling_flag, tele.alias("tele")), "id"
            ).select("id", "rank", "is_dangling", "tele")
            start_iter = latest

    state = RotatingState(spark)
    # align the state vector's partitioning with the loop's shuffle
    # partition count ONCE: the rank state otherwise inherits whatever
    # partitioning the init plan (cached degrees) had, and every
    # superstep's apply join then re-exchanges the per-dst sums from the
    # agg's partition count to the state's (two exchanges per superstep
    # instead of one — guide §2.4, operations keyed the same way should
    # share one exchange)
    sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
    init = init.repartition(sp_eff, F.col("id"))
    # the dangling-vertex count AND the initial dangling mass ride the init
    # materialization via observe() — zero extra pre-loop jobs
    obs0 = Observation(f"pr_init_{id(state)}")
    init = init.observe(
        obs0,
        F.sum(F.when(F.col("is_dangling"), 1).otherwise(0)).alias("nd"),
        F.sum(F.when(F.col("is_dangling"), F.col("rank")).otherwise(0.0)).alias("dm"),
    )
    ranks = state.rotate(init)  # truncate lineage + materialize
    init_stats = obs0.get

    # the per-superstep stats are only needed when there is a residual to
    # test or dangling mass to fold back — fixed-iteration runs on
    # dangling-free graphs skip the observe entirely
    has_dangling = (
        mode in ("textbook", "weighted") and (init_stats["nd"] or 0) > 0
    )
    need_stats = check_convergence or has_dangling
    dangling_mass = (init_stats["dm"] or 0.0) if has_dangling else 0.0

    metrics: list = []
    residual = None
    converged = False
    it = start_iter
    while it < n_iters:
        it += 1
        t0 = time.monotonic()

        contribs = gather(edges_div, ranks.select("id", "rank"))
        sums = agg(contribs)
        stage_sec = None
        if profile:
            # opt-in stage breakdown: each timing is a measurement job over
            # the stage's plan prefix (gather ⊂ gather+agg ⊂ materialize)
            ts = time.monotonic()
            contribs.count()
            t_gather = time.monotonic() - ts
            ts = time.monotonic()
            sums.count()
            stage_sec = {
                "gather": round(t_gather, 4),
                "gather_agg": round(time.monotonic() - ts, 4),
            }
        if big_state:
            # the apply join: don't re-broadcast O(V) sums every superstep
            sums = sums.hint("shuffle_hash")

        old = ranks.select("id", F.col("rank").alias("_old"), "is_dangling", "tele")
        if mode in ("textbook", "weighted"):
            # per-vertex teleport: uniform (tele = 1/N) or personalized;
            # dangling mass redistributes along the same teleport vector
            new_rank = (
                F.col("tele") * F.lit((1.0 - damping) + damping * dangling_mass)
                + F.lit(damping) * F.coalesce("contrib_sum", F.lit(0.0))
            )
        else:
            # compat: a vertex with no in-edges is never written to the
            # store, so it keeps its previous (= initial) rank.
            new_rank = F.coalesce(
                F.lit(damping) * F.col("contrib_sum") + F.lit(teleport), F.col("_old")
            )
        new = old.join(sums, old.id == sums.dst, "left").select(
            "id", new_rank.alias("rank"), "_old", "is_dangling", "tele"
        )
        obs = None
        if need_stats:
            # the residual + next iteration's dangling mass ride the rotate's
            # materialization pass via observe() — ONE Spark job per
            # superstep, no separate aggregate scan over the state vector
            obs = Observation(f"pr_stats_{id(state)}_{it}")
            new = new.observe(
                obs,
                F.max(F.abs(F.col("rank") - F.col("_old"))).alias("resid"),
                F.sum(
                    F.when(F.col("is_dangling"), F.col("rank")).otherwise(0.0)
                ).alias("dm"),
            )
        new = state.rotate(new)  # the one job: materialize, truncate, free prev

        if obs is not None:
            stats = obs.get
            residual = stats["resid"]
            dangling_mass = stats["dm"] or 0.0

        wall = time.monotonic() - t0
        m = {
            "iteration": it,
            "edges_scattered": n_edges,
            "residual": residual,
            "dangling_mass": dangling_mass,
            "wall_sec": wall,
            "edges_per_sec": n_edges / wall if wall > 0 else None,
        }
        if stage_sec is not None:
            m["stage_sec"] = stage_sec
        metrics.append(m)

        ranks = new.select("id", "rank", "is_dangling", "tele")

        if checkpoint is not None and it % cfg.checkpoint_every == 0:
            checkpoint.write_state(
                kernel, it, ranks.select("id", "rank"), key_col="id", metrics=m
            )

        if check_convergence and residual is not None and residual < cfg.tol:
            converged = True
            break

    return PageRankResult(
        ranks=ranks.select("id", "rank"),
        iterations=it,
        converged=converged,
        residual=residual,
        metrics=metrics,
    )
