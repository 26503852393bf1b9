"""K-core decomposition: per-vertex coreness over the undirected graph.

Uses the iterated neighborhood-h-index operator (Lü, Zhou, Zhang, Stanley
2016 — public result): start from degree; each round replace every vertex's
estimate with the h-index of its neighbors' estimates (the largest h such
that ≥ h neighbors have estimate ≥ h). The sequence is non-increasing and
converges EXACTLY to coreness — a synchronous-superstep formulation of the
classic peel, so it fits the engine's scaffold (no sequential peeling).

Plan shape per round: one gather join (estimates along undirected edges) +
a TWO-PHASE counting aggregate for the h-index — never a per-vertex window
over raw neighbor rows (which would put a degree-D hub's D rows in one
window partition / one task):

1. histogram: ``groupBy(id, least(nbr_core, cap))`` — map-side partial
   aggregation collapses a hub's D neighbor rows to ≤ cap+1 histogram rows
   BEFORE the shuffle;
2. suffix-count: a per-vertex cumulative window over the histogram, whose
   partitions are bounded by cap+1 rows, then
   h = max over values c of min(c, count(nbr_core ≥ c)).

``cap = floor(sqrt(2E)) + 1`` is a sound clamp: if h neighbors have
estimate ≥ h then (already at round 1, where estimates are degrees) the
edge count satisfies 2E ≥ h², so every h-index the iteration ever produces
is ≤ √(2E) < cap, and clamping neighbor values at cap never changes
``count(nbr_core ≥ h)`` for any feasible h. Window partitions are thus
O(√E) rows max — no hub hotspot at any degree distribution.

Change count rides the rotate via ``observe()``; explicit converged flag
like the other kernels.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.kernels.components import undirected
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


def _capped_histogram(nbr: DataFrame, cap: int) -> DataFrame:
    """→ [id, c, cnt]: per-vertex histogram of neighbor estimates clamped at
    ``cap`` — ≤ cap+1 rows per vertex regardless of degree (the phase-1
    aggregate that keeps hubs out of any single window partition)."""
    return nbr.groupBy(
        "id", F.least(F.col("nbr_core"), F.lit(cap)).alias("c")
    ).agg(F.count("*").alias("cnt"))


def _h_index(nbr: DataFrame, cap: int) -> DataFrame:
    """→ [id, h]: h-index of each vertex's ``nbr_core`` multiset via the
    two-phase counting aggregate (see module docstring)."""
    hist = _capped_histogram(nbr, cap)
    w = (
        Window.partitionBy("id")
        .orderBy(F.desc("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # suffix count at value c = #neighbors with estimate ≥ c (clamped);
    # h = max over histogram values of min(c, suffix_count(c))
    return (
        hist.withColumn("_ge", F.sum("cnt").over(w))
        .groupBy("id")
        .agg(F.max(F.least(F.col("c"), F.col("_ge"))).alias("h"))
    )


@dataclass
class KCoreResult:
    coreness: DataFrame  # [id: long, core: long]
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def k_core(
    graph: LinkGraph,
    max_iterations: int = 100,
    init_coreness: DataFrame | None = None,
) -> KCoreResult:
    """→ exact coreness per vertex (isolated vertices have core 0).

    ``init_coreness`` (``[id, core]``) warm-starts the h-index iteration.
    CONTRACT: the values must be a pointwise UPPER bound on true coreness
    (the engine additionally clamps them at degree, which preserves any
    upper bound since core ≤ degree). Yesterday's coreness qualifies after
    a deletions-only change, or ``old_core + k`` after ``k`` edge inserts
    (one insert raises any coreness by at most 1 — public result). The
    h-index map is monotone, so any start sandwiched between coreness and
    degree converges to the same coreness fixpoint as the cold
    start-from-degree run, just in fewer rounds — same warm==cold value
    contract as the PageRank/components/labelprop warm starts. A LOWER
    bound would be silently wrong (0 everywhere is a fixpoint too), hence
    the upper-bound contract is on the caller. Ids absent from
    ``init_coreness`` fall back to degree (the cold estimate)."""
    spark = graph.vertices.sparkSession
    from linkgraph_spark.lineage import checkpoint_tracked, free_tracked

    state = RotatingState(spark)
    # localCheckpoint (not persist): leaf-plan per round instead of
    # re-analyzing the symmetrized-edge lineage every round
    sym, sym_blocks = checkpoint_tracked(undirected(graph.edges))
    n_sym = sym.count()

    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("core"))
    est0 = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("core", F.lit(0)).cast("long").alias("core"))
    )
    if init_coreness is not None:
        warm = init_coreness.groupBy("id").agg(F.min("core").alias("_warm"))
        est0 = est0.join(warm, "id", "left").select(
            "id",
            F.least(F.col("core"), F.coalesce("_warm", F.col("core")))
            .cast("long")
            .alias("core"),
        )
    # every h-index the iteration produces is ≤ √(2E); clamping neighbor
    # values here bounds phase-2 window partitions at cap+1 rows
    cap = math.isqrt(n_sym) + 1  # n_sym = 2E symmetric rows → √n_sym = √(2E)

    converged = False
    metrics: list = []
    it = 0
    with pinned_superstep_confs(spark, n_sym, graph.num_vertices) as big_state:
        # align the estimate state's partitioning with the loop's agg
        # exchanges once (no second exchange in the apply join)
        sp_eff = int(spark.conf.get("spark.sql.shuffle.partitions"))
        est = state.rotate(est0.repartition(sp_eff, "id"))
        # scan the checkpointed edge table at the loop's scaled partition
        # count (narrow coalesce; it materialized at the session's)
        sym = sym.coalesce(sp_eff)
        for it in range(1, max_iterations + 1):
            cur = est if big_state else F.broadcast(est)
            nbr = sym.join(
                cur.select(F.col("id").alias("dst"), F.col("core").alias("nbr_core")),
                "dst",
            ).select(F.col("src").alias("id"), "nbr_core")
            h = _h_index(nbr, cap)
            new = est.join(h, "id", "left").select(
                "id",
                F.coalesce("h", F.lit(0)).cast("long").alias("core"),
                F.col("core").alias("_old"),
            )
            obs = Observation(f"kcore_changed_{id(state)}_{it}")
            new = new.observe(
                obs, F.sum(F.when(F.col("core") != F.col("_old"), 1).otherwise(0)).alias("n")
            )
            new = state.rotate(new)
            changed = obs.get["n"] or 0
            est = new.select("id", "core")
            metrics.append({"iteration": it, "changed": changed})
            if changed == 0:
                converged = True
                break

    free_tracked(spark.sparkContext, sym_blocks)
    return KCoreResult(coreness=est, iterations=it, converged=converged, metrics=metrics)


def _k_core_ctes(unroll: int) -> str:
    """The unrolled h-index CTE chain shared by :func:`k_core_sql` and
    :func:`core_profile_sql` — ends with ``k{unroll}`` holding the final
    coreness (and ``k0`` holding the undirected simple degree)."""
    ctes = [
        """kc_und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        """k0 AS MATERIALIZED (
      SELECT v.id, coalesce(d.c, 0) AS core
      FROM verts v
      LEFT JOIN (SELECT src AS id, count(*) AS c FROM kc_und GROUP BY src) d
        ON d.id = v.id
    )""",
    ]
    for k in range(1, unroll + 1):
        ctes.append(
            f"""k{k} AS MATERIALIZED (
      SELECT e.id, coalesce(hh.h, 0) AS core
      FROM k{k - 1} e
      LEFT JOIN (
        SELECT id, max(least(rn, nbr_core)) AS h
        FROM (
          SELECT u.src AS id, p.core AS nbr_core,
                 row_number() OVER (PARTITION BY u.src
                                    ORDER BY p.core DESC) AS rn
          FROM kc_und u JOIN k{k - 1} p ON u.dst = p.id
        )
        GROUP BY id
      ) hh ON hh.id = e.id
    )"""
        )
    return ",\n    ".join(ctes)


def k_core_sql(unroll: int = 12) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the identical
    h-index iteration, unrolled. ``unroll`` must cover the convergence
    rounds of the gate graph (asserted by the converged flag in tests)."""
    return f"""{_k_core_ctes(unroll)}
    SELECT id, CAST(core AS BIGINT) AS core FROM k{unroll}
    """


def core_profile(graph: LinkGraph) -> DataFrame:
    """→ ``[core, n_vertices, avg_deg, max_deg]`` — the k-core decomposition
    summarized as a shell histogram: for every coreness value, how many
    vertices sit in it and their mean/max undirected simple degree. The
    deg/core gap per shell is the classic structure readout — ``max_deg ≫
    core`` rows are hubs whose neighbors are leaves (degree without depth:
    spam farms, broadcast tools), while shells where ``avg_deg ≈ core``
    are densely interlocked communities. The O(#shells)-row view of
    :func:`k_core`'s O(V) labels.

    Scale shape: the :func:`k_core` superstep loop (two-phase capped
    h-index — no hub windows), one E-sized degree aggregate, one O(V)
    equi-join, and a final grouped aggregate on the small integer coreness
    key (≤ √(2E) distinct values, map-side combinable).
    """
    res = k_core(graph)
    sym = undirected(graph.edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    j = res.coreness.join(deg, "id", "left").select(
        "core", F.coalesce("deg", F.lit(0)).cast("long").alias("deg")
    )
    return j.groupBy("core").agg(
        F.count("*").alias("n_vertices"),
        F.round(F.avg("deg"), 6).alias("avg_deg"),
        F.max("deg").alias("max_deg"),
    )


def core_profile_sql(unroll: int = 12) -> str:
    """DuckDB oracle body for :func:`core_profile` (expects ``verts`` /
    ``edges`` CTEs; ``k0`` in the shared chain is exactly the undirected
    simple degree the Spark side joins)."""
    return f"""{_k_core_ctes(unroll)}
    SELECT CAST(k.core AS BIGINT) AS core, count(*) AS n_vertices,
           round(avg(d.core), 6) AS avg_deg,
           CAST(max(d.core) AS BIGINT) AS max_deg
    FROM k{unroll} k JOIN k0 d ON d.id = k.id
    GROUP BY 1
    """


@dataclass
class OnionResult:
    layers: DataFrame  # [id, core, layer]
    rounds: int
    converged: bool
    metrics: list = field(default_factory=list)


def onion_decomposition(graph: LinkGraph, max_rounds: int = 64) -> OnionResult:
    """→ ``[id, core, layer]`` — the onion decomposition (Hébert-Dufresne,
    Grochow & Allard, Scientific Reports 2016, public technique): the
    classic k-core peel, but every synchronous peel PASS gets its own
    ``layer`` index (numbered consecutively across cores).  Coreness says
    how deep a vertex sits; the layer says how close to the SURFACE of its
    core it is — the internal structure k-core flattens (two vertices of
    equal coreness can differ by many layers, e.g. a long chain hanging
    off a dense core peels one layer per round at k=1).

    Round r: ``k ← max(k, min current degree)``, then every active vertex
    with degree ≤ k is assigned (core=k, layer=r) and removed.  The
    assigned ``core`` equals the standard k-core number (peel with
    non-decreasing k — asserted against :func:`k_core` in the tests).

    Plan shape per round: one O(V_active) degree aggregate over the
    remaining edge list (map-side combined, hub-safe — no windows, unlike
    the h-index path this is the true peel), min-degree rides the rotate
    via ``observe()``, then two lazy filters over the SAME materialized
    degree frame (peeled / survivors) and one semi-join edge shrink.
    Three rotated frames (degrees, edges, accumulated labels — the SCC
    fold pattern).  Rounds = number of layers, which is bounded by
    O(√E) in general and is tiny (≤ a few dozen) on real degree
    distributions; ``converged`` is False on a cap stop.

    Reference provenance: engine extension over the degree machinery of
    pagerank_lambda/dynamodb/init_to_s3.py:55-86 (relation lengths are
    out-degrees); the decomposition itself is public technique.
    """
    spark = graph.vertices.sparkSession
    st_deg = RotatingState(spark)
    st_edge = RotatingState(spark)
    st_lab = RotatingState(spark)

    from linkgraph_spark.kernels.triangles import _oriented

    und0 = _oriented(graph.edges)
    n_sym = und0.count() * 2
    edges = st_edge.rotate(und0)
    verts = graph.vertices.select("id")
    labeled = st_lab.rotate(
        verts.limit(0).select(
            "id", F.lit(0).cast("long").alias("core"),
            F.lit(0).cast("long").alias("layer"),
        )
    )
    n_total = graph.num_vertices
    n_labeled = 0
    k = 0
    converged = False
    metrics: list = []
    r = 0
    active = verts  # lazy filter over the previous degree frame after r1
    with pinned_superstep_confs(spark, n_sym, graph.num_vertices) as big:
        for r in range(1, max_rounds + 1):
            degcnt = (
                edges.select(F.col("a").alias("id"))
                .unionAll(edges.select(F.col("b").alias("id")))
                .groupBy("id")
                .agg(F.count("*").alias("deg"))
            )
            if not big:
                # small regime: the O(V_active) degree frame rides a
                # broadcast so the active filter never re-exchanges
                degcnt = F.broadcast(degcnt)
            degf = active.join(degcnt, "id", "left").select(
                "id", F.coalesce("deg", F.lit(0)).cast("long").alias("deg")
            )
            obs = Observation(f"onion_{id(st_deg)}_{r}")
            degf = degf.observe(obs, F.min("deg").alias("mn"))
            degf = st_deg.rotate(degf)
            mn = obs.get["mn"]
            if mn is None:  # no active vertices left
                converged = True
                r -= 1
                break
            k = max(k, int(mn))
            peeled = degf.where(F.col("deg") <= k).select(
                "id",
                F.lit(k).cast("long").alias("core"),
                F.lit(r).cast("long").alias("layer"),
            )
            lab_obs = Observation(f"onion_lab_{id(st_lab)}_{r}")
            labeled = st_lab.rotate(
                labeled.unionAll(peeled).observe(
                    lab_obs, F.count(F.lit(1)).alias("n")
                )
            )
            total = int(lab_obs.get["n"] or 0)
            metrics.append(
                {"layer": r, "k": k, "peeled": total - n_labeled}
            )
            n_labeled = total
            active = degf.where(F.col("deg") > k).select("id")
            if n_labeled >= n_total:
                converged = True
                break
            act = active if big else F.broadcast(active)
            edges = st_edge.rotate(
                edges.join(
                    act.select(F.col("id").alias("a")), "a", "left_semi"
                ).join(act.select(F.col("id").alias("b")), "b", "left_semi")
            )
    st_deg.release()
    st_edge.release()
    return OnionResult(
        layers=labeled, rounds=r, converged=converged, metrics=metrics
    )


def onion_decomposition_sql(unroll: int = 24) -> str:
    """DuckDB oracle body (expects ``verts``/``edges``): the identical
    peel, unrolled.  ``unroll`` must cover the layer count of the gate
    graph (the Spark side's ``converged`` flag is the guard)."""
    ctes = [
        """od_e0 AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    )""",
        "od_v0 AS (SELECT id FROM verts)",
        "od_k0 AS (SELECT 0 AS k)",
    ]
    for r in range(1, unroll + 1):
        # every one-row CTE is MATERIALIZED and referenced via CROSS JOIN —
        # scalar subqueries over non-materialized CTEs re-inline the whole
        # chain per reference (exponential in the unroll depth)
        ctes.append(
            f"""od_d{r} AS MATERIALIZED (
      SELECT v.id, coalesce(c.c, 0) AS deg
      FROM od_v{r - 1} v
      LEFT JOIN (
        SELECT x.v AS id, count(*) AS c FROM (
          SELECT a AS v FROM od_e{r - 1}
          UNION ALL SELECT b AS v FROM od_e{r - 1}
        ) x GROUP BY x.v
      ) c ON c.id = v.id
    ),
    od_k{r} AS MATERIALIZED (
      SELECT greatest(p.k, coalesce(d.mn, p.k)) AS k
      FROM od_k{r - 1} p
      CROSS JOIN (SELECT min(deg) AS mn FROM od_d{r}) d
    ),
    od_p{r} AS (
      SELECT d.id, CAST(kk.k AS BIGINT) AS core,
             CAST({r} AS BIGINT) AS layer
      FROM od_d{r} d CROSS JOIN od_k{r} kk WHERE d.deg <= kk.k
    ),
    od_v{r} AS MATERIALIZED (
      SELECT d.id FROM od_d{r} d CROSS JOIN od_k{r} kk WHERE d.deg > kk.k
    ),
    od_e{r} AS MATERIALIZED (
      SELECT e.a, e.b FROM od_e{r - 1} e
      JOIN od_v{r} va ON va.id = e.a
      JOIN od_v{r} vb ON vb.id = e.b
    )"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT id, core, layer FROM od_p{r}" for r in range(1, unroll + 1)
    )
    body = ",\n    ".join(ctes)
    return f"""{body}
    {union}
    """
