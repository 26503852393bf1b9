"""Katz centrality — engine extension on the shared superstep scaffold
(Katz 1953, public algorithm).

``x_k(v) = β + α · Σ_{u→v} x_{k-1}(u)`` over the directed edge table,
init ``x_0 = β`` — the attenuation-weighted count of all walks arriving
at v (α discounts each extra hop). Unlike PageRank there is no degree
divisor and no stochastic normalization, so a hub's mass propagates
undivided: Katz answers "how many (attenuated) ways can influence reach
v", PageRank answers "where does a random surfer settle". Deterministic,
synchronous, fixed iteration count (the Jacobi discipline all kernels
here pin); α must stay below 1/λ_max for the infinite series to converge
— iterate-to-k is well-defined for any α, and the default 0.05 is safely
inside that bound for the transcript graphs' spectra.

Scale shape: ONE gather join + grouped sum per iteration — strictly
lighter than a PageRank superstep (no divisor attach, no dangling-mass
scalar); same broadcast-vs-shuffle regime switch via
``pinned_superstep_confs``. The 100 TB story is the PageRank gather's.

Reference parity note: the reference implements only PageRank
(``pagerank_lambda/dynamodb/pagerank.py:51-99``); Katz is an engine
addition sharing its partitioned-gather dataflow.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


@dataclass
class KatzResult:
    scores: DataFrame  # [id: long, katz: double]
    iterations: int
    metrics: list = field(default_factory=list)


def katz(
    graph: LinkGraph,
    iterations: int = 5,
    alpha: float = 0.05,
    beta: float = 1.0,
) -> KatzResult:
    """→ ``[id, katz]`` after ``iterations`` Jacobi rounds.

    Per round: gather α-attenuated mass along in-edges (one equi-join on
    ``src`` + one grouped sum — map-side partial aggregation applies),
    add β, rotate. The total-mass scalar rides the materialization via
    ``observe()`` (no extra job) and lands in ``metrics`` per iteration.
    """
    spark = graph.vertices.sparkSession
    state = RotatingState(spark)
    n_edges = graph.edges.count()

    scores = state.rotate(
        graph.vertices.select("id", F.lit(float(beta)).alias("x"))
    )
    metrics: list = []
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big_state:
        edges = graph.edges.select("src", "dst")
        for it in range(1, iterations + 1):
            cur = scores if big_state else F.broadcast(scores)
            gathered = (
                edges.join(cur.select(F.col("id").alias("src"), "x"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("x").alias("sm"))
            )
            nxt = scores.join(gathered, "id", "left").select(
                "id",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("sm", F.lit(0.0))
                ).alias("x"),
            )
            obs = Observation(f"katz_{id(state)}_{it}")
            nxt = nxt.observe(obs, F.sum("x").alias("mass"))
            scores = state.rotate(nxt)
            metrics.append({"iteration": it, "mass": float(obs.get["mass"] or 0.0)})

    return KatzResult(
        scores=scores.select("id", F.col("x").alias("katz")),
        iterations=iterations,
        metrics=metrics,
    )


def katz_sql(iterations: int = 5, alpha: float = 0.05, beta: float = 1.0) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the same
    Jacobi recurrence unrolled as a CTE chain."""
    # CAST the constants: bare short literals parse as DECIMAL in DuckDB,
    # and decimal arithmetic formats differently from the engine's doubles
    ctes = [f"kz0 AS (SELECT id, CAST({beta!r} AS DOUBLE) AS x FROM verts)"]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""kz{k} AS MATERIALIZED (
      SELECT v.id, CAST({beta!r} AS DOUBLE)
             + CAST({alpha!r} AS DOUBLE) * coalesce(s.sm, 0.0) AS x
      FROM verts v
      LEFT JOIN (
        SELECT e.dst AS id, sum(p.x) AS sm
        FROM edges e JOIN kz{k - 1} p ON e.src = p.id
        GROUP BY e.dst
      ) s ON s.id = v.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT id, round(x, 6) AS katz FROM kz{iterations}
    """
