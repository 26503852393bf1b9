"""Connected components (north_star kernel #2): hash-min label exchange
plus a large-star/small-star variant for high-diameter graphs.

**hash-min** (:func:`connected_components`): per superstep every vertex
adopts the minimum label among itself and its undirected neighbors;
fixpoint when no label changes. Labels start as vertex ids, so each
component converges to its minimum member id — exact, deterministic,
parallelism-independent. Converges in O(diameter) supersteps, which is fine
for transcript graphs (conversation chains bridged by tool hubs are
shallow); the result carries an explicit ``converged`` flag so an
iteration-capped run can never silently return split components.

**large-star/small-star** (:func:`connected_components_star`): the
Kiveris et al. alternating algorithm — O(log n) rounds regardless of
diameter, the scale path for adversarially deep graphs. Verified against
hash-min in tests.

Scale notes: each hash-min superstep is one co-partitioned join + min-agg;
the per-iteration change count rides the rotate job via ``observe()`` (no
separate count pass). Star rounds are two map+min-agg shuffles each.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState, checkpoint_tracked, free_tracked
from linkgraph_spark.session import pinned_superstep_confs


def undirected(edges: DataFrame) -> DataFrame:
    """Symmetrize + dedup: each undirected neighbor pair appears both ways."""
    return (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


@dataclass
class ComponentsResult:
    """Mirror of ``PageRankResult``'s contract: the labels plus an explicit
    convergence signal — an iteration-capped run that did NOT reach the
    fixpoint is detectable (hash-min needs O(diameter) supersteps; silently
    returning split components was the failure mode this guards)."""

    labels: DataFrame  # [id: long, component: long]
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def connected_components(
    graph: LinkGraph,
    max_iterations: int = 50,
    checkpoint: CheckpointStore | None = None,
    resume: bool = False,
    force_big_state: bool | None = None,
    init_labels: DataFrame | None = None,
) -> ComponentsResult:
    """Hash-min label exchange → :class:`ComponentsResult` (component = min
    member id). ``result.converged`` is False iff the iteration cap was hit
    before the fixpoint. ``force_big_state`` overrides the join-regime size
    heuristic (tests value-verify the shuffle-hash regime on small graphs).

    ``init_labels`` (``[id, component]``) warm-starts an ADDITIONS-ONLY
    incremental run: old labels are each old component's min id, so the
    hash-min fixpoint from them is min-over-new-component of old minima =
    the exact new labels, reached in rounds ~ the diameter of the
    component-MERGE graph instead of the raw graph diameter. Vertices
    absent from ``init_labels`` (new actors) start at their own id. NOT
    valid after edge REMOVALS (stale merged labels would persist) — rerun
    cold for those. Mutually exclusive with ``resume``."""
    if init_labels is not None and resume:
        raise ValueError("init_labels and resume are mutually exclusive")
    spark = graph.vertices.sparkSession
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    # localCheckpoint (not persist): truncates the symmetrized edge table's
    # lineage so each superstep's plan is a leaf join instead of
    # re-analyzing the full upstream ETL tree every round
    sym, sym_blocks = checkpoint_tracked(undirected(graph.edges))
    n_sym = sym.count()

    labels = graph.vertices.select("id", F.col("id").alias("component"))
    if init_labels is not None:
        # defensive per-id min: a duplicated init id (e.g. unioned prior
        # runs) would otherwise fan the vertex out through every superstep
        warm = init_labels.groupBy("id").agg(F.min("component").alias("_warm"))
        labels = graph.vertices.join(warm, "id", "left").select(
            "id", F.coalesce("_warm", F.col("id")).alias("component")
        )
    start = 0
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("components")
        if latest is not None:
            labels = checkpoint.load_state(spark, "components", latest)
            start = latest
    state = RotatingState(spark)

    converged = False
    metrics: list = []
    it = start
    with pinned_superstep_confs(
        spark, n_sym, graph.num_vertices, force_big=force_big_state
    ) as big_state:
        # align the label state's partitioning with the loop's agg
        # exchanges once, so the per-round apply join adds no second
        # exchange (truncates lineage per superstep as before)
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        labels = state.rotate(labels.repartition(sp_eff, "id"))
        # scan the checkpointed edge table at the loop's scaled partition
        # count (narrow coalesce; it materialized at the session's)
        sym_l = sym.coalesce(sp_eff)
        for it in range(start + 1, max_iterations + 1):
            lbl = labels
            if not big_state:
                # small state + AQE off: broadcast the O(V) label vector so
                # the O(E) symmetric edge table is never sorted per superstep
                lbl = F.broadcast(labels)
            nbr_min = (
                sym_l.join(lbl, sym_l.dst == lbl.id, "inner")
                .groupBy(F.col("src").alias("id"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new = labels.join(nbr_min, "id", "left").select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                F.col("component").alias("_old"),
            )
            # the change count rides the rotate's materialization pass — one
            # Spark job per superstep, no separate count() scan
            obs = Observation(f"cc_changed_{id(state)}_{it}")
            new = new.observe(
                obs,
                F.sum(
                    F.when(F.col("component") != F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            new = state.rotate(new)
            changed = obs.get["changed"] or 0
            labels = new.select("id", "component")
            metrics.append({"iteration": it, "changed": changed})
            if checkpoint is not None:
                checkpoint.write_state(
                    "components", it, labels, key_col="id", metrics={"changed": changed}
                )
            if changed == 0:
                converged = True
                break

    free_tracked(spark.sparkContext, sym_blocks)
    return ComponentsResult(
        labels=labels, iterations=it, converged=converged, metrics=metrics
    )


# ----------------------------------------------- large-star / small-star
def _min_nbr(edges: DataFrame) -> DataFrame:
    """→ [u, m]: m = min(neighborhood(u) ∪ {u}) over a symmetric edge list."""
    return edges.groupBy(F.col("src").alias("u")).agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )


def connected_components_star(
    graph: LinkGraph,
    max_iterations: int = 30,
    checkpoint: CheckpointStore | None = None,
    resume: bool = False,
) -> ComponentsResult:
    """Large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — O(log n) rounds independent of
    graph diameter, so a 10^6-hop conversation chain converges in ~20
    rounds where hash-min would need 10^6 supersteps.

    Each round: **large-star** hooks every neighbor larger than u onto
    min(Γ(u) ∪ {u}); **small-star** hooks u and its not-larger neighbors
    onto that minimum. The edge set converges to a star forest whose
    centers are component minima — identical labels to hash-min (verified
    in tests). Both phases are one shuffle (min-agg) + one equi-join.
    """
    spark = graph.vertices.sparkSession
    sc = spark.sparkContext
    # RotatingState frees the previous state on rotate; the star fixpoint
    # test needs BOTH the previous and current edge sets alive, so block
    # lifetimes are managed explicitly via checkpoint_tracked
    start = 0
    init = undirected(graph.edges)
    if resume and checkpoint is not None:
        latest = checkpoint.latest_iteration("components_star")
        if latest is not None:
            init = checkpoint.load_state(spark, "components_star", latest)
            start = latest
    edges, e_ids = checkpoint_tracked(init)
    n_init = edges.count()  # cheap: reads the checkpoint blocks
    n_prev = n_init

    converged = False
    metrics: list = []
    it = start
    with pinned_superstep_confs(spark, n_init, graph.num_vertices):
        for it in range(start + 1, max_iterations + 1):
            # large-star: (v, m(u)) for v ∈ Γ(u), v > u
            mn = _min_nbr(edges)
            large = (
                edges.join(mn, edges.src == mn.u)
                .where(F.col("dst") > F.col("src"))
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .where(F.col("src") != F.col("dst"))
            )
            # keep (u, m(u)) so isolated-star roots don't drop their pointer
            keep = mn.where(F.col("u") != F.col("m")).select(
                F.col("u").alias("src"), F.col("m").alias("dst")
            )
            half1 = large.unionByName(keep).distinct()
            e1, e1_ids = checkpoint_tracked(
                half1.unionByName(  # resymmetrize for the small-star phase
                    half1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                ).distinct()
            )

            # small-star over edges directed large→small: (v, m(u)) for v ≤ u
            directed = e1.where(F.col("dst") < F.col("src"))
            mn2 = directed.groupBy(F.col("src").alias("u")).agg(F.min("dst").alias("m"))
            small = (
                directed.join(mn2, directed.src == mn2.u)
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .unionByName(mn2.select(F.col("u").alias("src"), F.col("m").alias("dst")))
                .where(F.col("src") != F.col("dst"))
                .distinct()
            )
            e2, e2_ids = checkpoint_tracked(
                small.unionByName(
                    small.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                ).distinct()
            )

            # fixpoint: the symmetric pointer set stopped changing. The test
            # must be TWO-sided — e2.exceptAll(edges) alone is empty whenever
            # e2 ⊊ edges (the set strictly shrank), which is not convergence
            # (Kiveris et al. terminate on set EQUALITY). Counts are cheap
            # (both sides are materialized checkpoints): equal count + empty
            # one-sided difference ⟺ set equality.
            n_cur = e2.count()
            changed = (
                1
                if n_cur != n_prev
                else e2.exceptAll(edges).limit(1).count()
            )
            n_prev = n_cur
            free_tracked(sc, e_ids)
            free_tracked(sc, e1_ids)
            edges, e_ids = e2, e2_ids
            metrics.append({"iteration": it})
            if checkpoint is not None:
                # the round's symmetric pointer set IS the resumable state
                checkpoint.write_state(
                    "components_star", it, edges, key_col="src",
                    metrics={"iteration": it},
                )
            if changed == 0:
                converged = True
                break

    # star forest → labels: non-roots point at their component min
    ptr = edges.where(F.col("dst") < F.col("src")).groupBy(
        F.col("src").alias("id")
    ).agg(F.min("dst").alias("component"))
    labels = (
        graph.vertices.select("id")
        .join(ptr, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    return ComponentsResult(
        labels=labels, iterations=it, converged=converged, metrics=metrics
    )


def attack_resilience(graph: LinkGraph, k: int = 8) -> DataFrame:
    """→ one row ``[n_removed, n_vertices_left, n_edges_left,
    n_components, largest_component]`` — targeted-attack robustness: remove
    the ``k`` highest-degree vertices (undirected simple degree, ties by
    id asc — the Albert–Jeong–Barabási "error and attack tolerance"
    probe) and summarize the surviving graph's fragmentation via hash-min
    connected components. ``n_edges_left`` counts surviving undirected
    simple edges; isolated survivors count as singleton components.

    Scale shape: hub selection is one O(E) degree aggregate plus a
    TakeOrdered top-k (no global sort); removal is two broadcast
    anti-joins of a k-row hub set against the edge list; the component
    sweep is the same O(diameter)-superstep hash-min kernel the
    ``connected_components`` query runs. The one-row summary is
    localCheckpoint-ed so the induced graph's cached blocks can be freed
    before returning.
    """
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    hubs = deg.orderBy(F.desc("deg"), F.asc("id")).limit(k).select("id")
    return _removal_summary(graph, hubs)


def random_failure_resilience(
    graph: LinkGraph, rate: float = 0.1, salt: str = ""
) -> DataFrame:
    """→ the same one-row fragmentation summary as
    :func:`attack_resilience`, but removing a deterministic hash-sampled
    ``rate`` fraction of ALL vertices — the "random error" half of the
    Albert–Jeong–Barabási tolerance pair (scale-free graphs survive
    random failure but shatter under targeted attack; run both probes to
    see the gap). The removal set is the portable md5-bucket sample, so
    it is replayable across runs and engines.

    Scale shape: the removal predicate is map-only; everything else is
    shared with :func:`attack_resilience`.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    from linkgraph_spark.functions.hashing import md5_long

    buckets = 1_000_000
    key = F.concat_ws("\x1f", F.lit(salt), F.col("id").cast("string"))
    removed = graph.vertices.select("id").where(
        (md5_long(key) % buckets) < int(rate * buckets)
    )
    return _removal_summary(graph, removed)


def _removal_summary(graph: LinkGraph, removed: DataFrame) -> DataFrame:
    """Shared fragmentation summary: drop ``removed`` [id] vertices, run
    hash-min components on the induced remainder, return the one-row
    summary (localCheckpoint-ed so the induced graph's cached blocks can
    be freed before returning)."""
    from linkgraph_spark.kernels.subgraph import _induce

    keep = graph.vertices.select("id").join(removed, "id", "left_anti")
    sub = _induce(graph, keep)
    try:
        res = connected_components(sub)
        sizes = res.labels.groupBy("component").agg(F.count("*").alias("sz"))
        summary = (
            sizes.agg(
                F.count("*").alias("n_components"),
                F.max("sz").alias("largest_component"),
            )
            .crossJoin(removed.agg(F.count("*").alias("n_removed")))
            .crossJoin(
                sub.edges.select(
                    F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"),
                )
                .where(F.col("a") != F.col("b"))
                .distinct()
                .agg(F.count("*").alias("n_edges_left"))
            )
            .select(
                "n_removed",
                F.lit(sub.num_vertices).cast("long").alias("n_vertices_left"),
                "n_edges_left",
                "n_components",
                "largest_component",
            )
            .localCheckpoint()
        )
    finally:
        sub.unpersist()
    return summary


def attack_resilience_sql(k: int = 8, unroll: int = 40) -> str:
    """DuckDB oracle body for :func:`attack_resilience` (expects
    ``verts``/``edges`` CTEs; hash-min unrolled ``unroll`` rounds — must
    exceed the post-removal diameter, which vertex removal can only
    lengthen, hence the deep default)."""
    hub = f"""SELECT id FROM (
        SELECT id, count(*) AS deg FROM (
          SELECT a AS id FROM ar_und UNION ALL SELECT b AS id FROM ar_und
        ) GROUP BY id
      ) ORDER BY deg DESC, id ASC LIMIT {int(k)}"""
    return _resilience_sql(hub, unroll)


def random_failure_resilience_sql(
    rate: float = 0.1, salt: str = "", unroll: int = 40
) -> str:
    """DuckDB oracle body for :func:`random_failure_resilience`."""
    buckets = 1_000_000
    quoted = salt.replace("'", "''")
    key = f"concat_ws(chr(31), '{quoted}', CAST(id AS VARCHAR))"
    h = f"CAST(concat('0x', substr(md5({key}), 1, 15)) AS BIGINT)"
    removal = (
        f"SELECT id FROM verts WHERE ({h} % {buckets}) < {int(rate * buckets)}"
    )
    return _resilience_sql(removal, unroll)


def _resilience_sql(removal_select: str, unroll: int) -> str:
    """Shared fragmentation-summary CTE chain; ``removal_select`` yields
    the removed vertex ids (may reference ``ar_und``/``verts``)."""
    ctes = [
        f"""ar_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    ar_hub AS MATERIALIZED (
      {removal_select}
    ),
    ar_keep AS (
      SELECT id FROM verts WHERE id NOT IN (SELECT id FROM ar_hub)
    ),
    ar_edges AS MATERIALIZED (
      SELECT a, b FROM ar_und
      WHERE a NOT IN (SELECT id FROM ar_hub)
        AND b NOT IN (SELECT id FROM ar_hub)
    ),
    ar_sym AS (
      SELECT a, b FROM ar_edges UNION ALL SELECT b AS a, a AS b FROM ar_edges
    ),
    arl0 AS (SELECT id, id AS component FROM ar_keep)"""
    ]
    for i in range(1, unroll + 1):
        ctes.append(
            f"""arl{i} AS MATERIALIZED (
      SELECT l.id,
             least(l.component, coalesce(m.mn, l.component)) AS component
      FROM arl{i - 1} l
      LEFT JOIN (
        SELECT s.a AS id, min(l2.component) AS mn
        FROM ar_sym s JOIN arl{i - 1} l2 ON s.b = l2.id
        GROUP BY s.a
      ) m ON m.id = l.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    {body},
    ar_sizes AS (
      SELECT component, count(*) AS sz FROM arl{unroll} GROUP BY component
    )
    SELECT (SELECT count(*) FROM ar_hub) AS n_removed,
           (SELECT count(*) FROM ar_keep) AS n_vertices_left,
           (SELECT count(*) FROM ar_edges) AS n_edges_left,
           count(*) AS n_components,
           max(sz) AS largest_component
    FROM ar_sizes
    """
