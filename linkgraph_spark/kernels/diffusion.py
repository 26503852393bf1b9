"""Heat-kernel diffusion and k-step hitting probability — two walk-based
propagation kernels on the shared superstep scaffold.

Both are classic public algorithms re-expressed as the engine's
partitioned gather (the reference implements only PageRank over the same
dataflow, ``pagerank_lambda/dynamodb/pagerank.py:51-99``; these are
engine additions):

- :func:`heat_kernel` — the truncated heat-kernel diffusion
  ``h = Σ_{k≤K} e^{-t} t^k/k! · x·Pᵏ`` (Chung 2007's heat-kernel
  pagerank, Taylor-truncated) from the uniform start. Against PageRank's
  geometric hop weights, the Poisson weights damp long walks much
  harder — heat kernel scores LOCAL influence and is the standard
  local-cluster seed score.
- :func:`hitting_probability` — the k-step absorption probability
  ``p_k(v) = P(random walk from v reaches the seed set within k hops)``
  via the backward DP ``p_k(v) = Σ_u P(v,u)·p_{k-1}(u)`` with seeds
  absorbing at 1. The trust/contamination propagation primitive: seeds =
  known-bad actors → p is each vertex's k-hop exposure.

Per superstep both run ONE gather join + grouped sum (map-side
combinable) with the degree divisor attached from the iteration-invariant
``edges ⋈ out_deg`` frame built once before the loop — no per-round
degree join, no windows, no driver loops over vertices. Dangling
vertices simply contribute (heat) or receive (hitting) nothing — the
walk dies, matching the unrolled SQL oracle exactly. Poisson/initial
constants are Python doubles embedded via ``repr`` in both engines, so
the arithmetic is bit-identical up to summation order (handled by the
round-6 output contract like every other kernel).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class DiffusionResult:
    scores: DataFrame  # [id: long, <score>: double]
    iterations: int
    metrics: list = field(default_factory=list)


def _poisson_weights(t: float, terms: int) -> list[float]:
    """w_k = e^{-t} t^k / k! for k = 0..terms (Python doubles — the same
    literals are embedded in the SQL oracle)."""
    return [math.exp(-t) * t**k / math.factorial(k) for k in range(terms + 1)]


def heat_kernel(graph: LinkGraph, t: float = 2.0, terms: int = 8) -> DiffusionResult:
    """→ ``[id, heat]`` — Taylor-truncated heat-kernel diffusion from the
    uniform distribution over the out-degree-normalized walk matrix.

    Per term: one gather join along edges (x/out_deg scattered to dst)
    + grouped sum; the running h accumulates ``w_k · x_k`` in the same
    projection. Per-term mass rides the rotate via ``observe()``.
    """
    if terms < 1:
        raise ValueError(f"terms must be >= 1, got {terms}")
    if t <= 0:
        raise ValueError(f"t must be > 0, got {t}")
    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    n_edges = graph.edges.count()
    w = _poisson_weights(float(t), terms)
    inv_n = 1.0 / graph.num_vertices

    ew = (
        graph.edges.select("src", "dst")
        .join(
            graph.degrees.select(F.col("id").alias("src"), "out_deg"), "src"
        )
        .persist()
    )
    ew.count()  # materialize the loop invariant BEFORE the supersteps
    scores = state.rotate(
        graph.vertices.select(
            "id",
            F.lit(inv_n).alias("x"),
            (F.lit(w[0]) * F.lit(inv_n)).alias("h"),
        )
    )
    metrics: list = []
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        for k in range(1, terms + 1):
            cur = scores if big_state else F.broadcast(scores)
            gathered = (
                ew.join(cur.select(F.col("id").alias("src"), "x"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("x") / F.col("out_deg")).alias("sm"))
            )
            xk = F.coalesce("sm", F.lit(0.0))
            nxt = scores.join(gathered, "id", "left").select(
                "id",
                xk.alias("x"),
                (F.col("h") + F.lit(w[k]) * xk).alias("h"),
            )
            obs = Observation(f"heat_{id(state)}_{k}")
            nxt = nxt.observe(obs, F.sum("x").alias("mass"))
            scores = state.rotate(nxt)
            metrics.append({"term": k, "mass": float(obs.get["mass"] or 0.0)})
    ew.unpersist()
    return DiffusionResult(
        scores=scores.select("id", F.round("h", 6).alias("heat")),
        iterations=terms,
        metrics=metrics,
    )


def heat_kernel_sql(t: float = 2.0, terms: int = 8) -> str:
    """DuckDB oracle body (expects ``verts``/``edges``/``degs``/``nv``
    CTEs): the identical Taylor recurrence unrolled."""
    w = _poisson_weights(float(t), terms)
    ctes = [
        f"""hk0 AS (
      SELECT id, 1.0 / nv.n AS x,
             CAST({w[0]!r} AS DOUBLE) * (1.0 / nv.n) AS h
      FROM verts CROSS JOIN nv
    )"""
    ]
    for k in range(1, terms + 1):
        ctes.append(
            f"""hk{k} AS MATERIALIZED (
      SELECT v.id, coalesce(s.sm, 0.0) AS x,
             v.h + CAST({w[k]!r} AS DOUBLE) * coalesce(s.sm, 0.0) AS h
      FROM hk{k - 1} v
      LEFT JOIN (
        SELECT e.dst AS id, sum(p.x / d.out_deg) AS sm
        FROM edges e
        JOIN hk{k - 1} p ON e.src = p.id
        JOIN degs d ON d.id = e.src
        GROUP BY e.dst
      ) s ON s.id = v.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, round(h, 6) AS heat FROM hk{terms}
    """


def hitting_probability(
    graph: LinkGraph, seeds: list[int], iterations: int = 6
) -> DiffusionResult:
    """→ ``[id, p]`` — probability that a uniform random out-walk from
    each vertex reaches the (absorbing) seed set within ``iterations``
    hops. Seeds pin at 1; dangling non-seeds at 0 (the walk dies).

    Per round: one gather join along OUT-edges (p of dst scattered back
    to src, divided by the src's out-degree) + grouped sum — the exact
    transpose of the heat-kernel gather, same invariant-frame regime.
    """
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    n_edges = graph.edges.count()
    seed_set = sorted(set(int(s) for s in seeds))
    is_seed = F.col("id").isin(seed_set)

    ew = (
        graph.edges.select("src", "dst")
        .join(
            graph.degrees.select(F.col("id").alias("src"), "out_deg"), "src"
        )
        .persist()
    )
    ew.count()
    scores = state.rotate(
        graph.vertices.select(
            "id", F.when(is_seed, 1.0).otherwise(0.0).alias("p")
        )
    )
    metrics: list = []
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        for it in range(1, iterations + 1):
            cur = scores if big_state else F.broadcast(scores)
            gathered = (
                ew.join(cur.select(F.col("id").alias("dst"), "p"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum(F.col("p") / F.col("out_deg")).alias("sm"))
            )
            nxt = scores.select("id").join(gathered, "id", "left").select(
                "id",
                F.when(is_seed, 1.0)
                .otherwise(F.coalesce("sm", F.lit(0.0)))
                .alias("p"),
            )
            obs = Observation(f"hit_{id(state)}_{it}")
            nxt = nxt.observe(obs, F.sum("p").alias("mass"))
            scores = state.rotate(nxt)
            metrics.append({"iteration": it, "mass": float(obs.get["mass"] or 0.0)})
    ew.unpersist()
    return DiffusionResult(
        scores=scores.select("id", F.round("p", 6).alias("p")),
        iterations=iterations,
        metrics=metrics,
    )


def hitting_probability_sql(seeds: list[int], iterations: int = 6) -> str:
    """DuckDB oracle body (expects ``verts``/``edges``/``degs`` CTEs):
    the identical backward DP unrolled."""
    seed_list = ", ".join(str(int(s)) for s in sorted(set(seeds)))
    ctes = [
        f"""hp0 AS (
      SELECT id, CASE WHEN id IN ({seed_list}) THEN 1.0 ELSE 0.0 END AS p
      FROM verts
    )"""
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""hp{k} AS MATERIALIZED (
      SELECT v.id,
             CASE WHEN v.id IN ({seed_list}) THEN 1.0
                  ELSE coalesce(s.sm, 0.0) END AS p
      FROM hp{k - 1} v
      LEFT JOIN (
        SELECT e.src AS id, sum(p.p / d.out_deg) AS sm
        FROM edges e
        JOIN hp{k - 1} p ON e.dst = p.id
        JOIN degs d ON d.id = e.src
        GROUP BY e.src
      ) s ON s.id = v.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, round(p, 6) AS p FROM hp{iterations}
    """


def label_spreading(
    graph: LinkGraph,
    seeds: DataFrame,
    iterations: int = 8,
) -> DataFrame:
    """→ ``[id, score]`` — harmonic-function label spreading (Zhu &
    Ghahramani 2002, public technique): ``seeds`` (``[id]``) are clamped
    to score 1; every other vertex repeatedly takes the MEAN of its
    undirected neighbors' scores (init 0).  After fixed ``iterations``
    the score is a deterministic proximity-to-seed-set measure in [0, 1]
    — with tool vertices as seeds, it grades every conv/role actor by how
    tool-mediated its neighborhood is, a soft signal the hard labelprop
    partition cannot give.  Monotone non-decreasing per round from the
    zero init (asserted in tests); fixed iterations keep the gate/oracle
    contract round-exact.

    Plan shape per superstep: ONE gather join + grouped sum over the
    symmetrized edge list with the 1/deg divisor attached to the edge
    side once (iteration-invariant — the PageRank relation_length move),
    then a clamp join against the broadcast-eligible seed set.  Isolated
    or seedless-component vertices honestly stay 0."""
    from linkgraph_spark.kernels.components import undirected

    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    sym = undirected(graph.edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    # divisor on the DESTINATION side: f(v) = mean over neighbors u of f(u)
    # ⇔ sum over edges (u→v) of f(u) / d(v)
    ed = sym.join(
        deg.select(F.col("id").alias("dst"), "d"), "dst"
    ).persist()
    n_sym = ed.count()
    seed = seeds.select(F.col("id").alias("sid")).distinct()
    is_seed = F.col("sid").isNotNull()
    scores = state.rotate(
        graph.vertices.select("id")
        .join(seed, F.col("id") == F.col("sid"), "left")
        .select(
            "id", F.when(is_seed, 1.0).otherwise(0.0).alias("score"),
            is_seed.alias("seed"),
        )
    )
    with pinned_superstep_confs(spark, n_sym, graph.num_vertices) as big_state:
        for it in range(1, iterations + 1):
            cur = scores if big_state else F.broadcast(scores)
            raw = (
                ed.join(
                    cur.select(F.col("id").alias("src"), "score"), "src"
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("score") / F.col("d")).alias("raw"))
            )
            nxt = scores.select("id", "seed").join(raw, "id", "left").select(
                "id",
                F.when(F.col("seed"), 1.0)
                .otherwise(F.coalesce("raw", F.lit(0.0)))
                .alias("score"),
                "seed",
            )
            scores = state.rotate(nxt)
    ed.unpersist()
    return scores.select("id", F.round("score", 6).alias("score"))


def label_spreading_sql(seed_pred: str, iters: int = 8) -> str:
    """DuckDB oracle body (expects ``verts``/``edges``): identical clamped
    mean iteration; ``seed_pred`` is a boolean SQL expression over the
    ``verts`` columns (e.g. ``"actor_key LIKE 'tool:%'"``)."""
    ctes = [
        """lsp_sym AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    )""",
        f"""lsp_seed AS MATERIALIZED (
      SELECT id, ({seed_pred}) AS seed FROM verts
    )""",
        """lsp_deg AS MATERIALIZED (
      SELECT dst AS id, count(*) AS d FROM lsp_sym GROUP BY dst
    )""",
        """lsp0 AS (
      SELECT id, CASE WHEN seed THEN 1.0 ELSE 0.0 END AS score
      FROM lsp_seed
    )""",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""lsp{k} AS MATERIALIZED (
      SELECT s.id,
             CASE WHEN s.seed THEN 1.0
                  ELSE coalesce(g.raw, 0.0) END AS score
      FROM lsp_seed s
      LEFT JOIN (
        SELECT e.dst AS id, sum(p.score / dd.d) AS raw
        FROM lsp_sym e
        JOIN lsp{k - 1} p ON e.src = p.id
        JOIN lsp_deg dd ON dd.id = e.dst
        GROUP BY e.dst
      ) g ON g.id = s.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, round(score, 6) AS score FROM lsp{iters}
    """
