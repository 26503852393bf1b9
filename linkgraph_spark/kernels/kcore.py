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
    state = RotatingState(spark)
    sym = undirected(graph.edges).persist()
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
    est = state.rotate(est0)

    # every h-index the iteration produces is ≤ √(2E); clamping neighbor
    # values here bounds phase-2 window partitions at cap+1 rows
    cap = math.isqrt(n_sym) + 1  # n_sym = 2E symmetric rows → √n_sym = √(2E)

    converged = False
    metrics: list = []
    it = 0
    with pinned_superstep_confs(spark, n_sym, graph.num_vertices) as big_state:
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

    sym.unpersist()
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
