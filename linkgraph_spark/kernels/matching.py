"""Maximal matching — deterministic parallel greedy rounds (the classic
local-min edge rule; Israeli & Itai 1986 lineage, public algorithm).

Each undirected edge gets a TOTAL-ORDER key: the portable 60-bit md5 hash
of its canonical endpoints, tie-broken by the endpoint pair itself
(zero-padded fixed-width string, so lexicographic comparison is identical
in Spark and DuckDB). Per round, a live edge joins the matching iff its
key is the minimum among ALL live edges at BOTH endpoints — two adjacent
edges can never both win (total order), and the fixpoint equals the
sequential greedy matching in ascending-key order, which makes the
operator exactly replayable in SQL.

Per round over the live edge set L:

- per-vertex min incident key: explode endpoints + grouped min (one
  shuffle on the vertex id — the gather shape again);
- winners: L joined to both endpoint minima (equi-joins);
- survivors: L anti-joined against the newly matched endpoints.

L shrinks geometrically (every live edge is incident to some local
minimum's neighborhood), so rounds are O(log E) expected and round cost
decays with the frontier. Matching drives conflict-free pairing
(reviewer assignment, A/B pairing of similar actors) and is the standard
building block the reference lacks (its one kernel is PageRank —
``pagerank_lambda/dynamodb/pagerank.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.functions.hashing import md5_long, md5_long_sql
from linkgraph_spark.lineage import RotatingState
from linkgraph_spark.session import pinned_superstep_confs


def _edge_key(a, b):
    """Sortable fixed-width string key: zero-padded 60-bit hash, then the
    canonical endpoint pair — a total order identical in both engines."""
    h = md5_long(F.concat_ws(":", a.cast("string"), b.cast("string")))
    # 19-char pads fit any int64 (max 19 digits) — lpad TRUNCATES longer
    # strings in both engines, so a narrower pad would collapse distinct
    # ids >= 10^12 and break the total-order tie-break suffix
    return F.concat_ws(
        "-",
        F.lpad(h.cast("string"), 19, "0"),
        F.lpad(a.cast("string"), 19, "0"),
        F.lpad(b.cast("string"), 19, "0"),
    )


@dataclass
class MatchingResult:
    matching: DataFrame  # [a: long, b: long] — matched pairs, a < b
    iterations: int
    converged: bool  # True iff no live edge remains (matching is maximal)
    metrics: list = field(default_factory=list)


def maximal_matching(graph: LinkGraph, max_iterations: int = 20) -> MatchingResult:
    """→ the greedy maximal matching (``converged`` False means the round
    budget ran out with live edges left — the pairs emitted so far are
    still a valid matching, just not maximal; the unrolled SQL oracle
    matches round-for-round either way)."""
    spark = graph.vertices.sparkSession
    # TWO rotations: rotate() frees the PREVIOUS rotation's blocks, so the
    # live-edge frontier and the accumulated matching must each own their
    # lifecycle — one shared state would free live's blocks while the
    # matched union still references them
    live_state = RotatingState(spark)
    matched_state = RotatingState(spark)

    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    n_edges = graph.edges.count()
    live = live_state.rotate(canon.withColumn("key", _edge_key(F.col("a"), F.col("b"))))
    matched = spark.createDataFrame([], "a long, b long")
    converged = False
    metrics: list = []
    it = 0
    with pinned_superstep_confs(spark, n_edges, graph.num_vertices) as big:
        for it in range(1, max_iterations + 1):
            incident = live.select(F.col("a").alias("v"), "key").unionByName(
                live.select(F.col("b").alias("v"), "key")
            )
            vmin = incident.groupBy("v").agg(F.min("key").alias("mink"))
            # small regime: the per-vertex min frame rides a broadcast, so
            # the winner selection and the anti-join purge never shuffle
            # the live-edge frontier (it would otherwise re-exchange on a
            # AND b every round)
            if not big:
                vmin = F.broadcast(vmin)
            winners = (
                live.join(
                    vmin.select(F.col("v").alias("a"), F.col("mink").alias("mina")),
                    "a",
                )
                .join(
                    vmin.select(F.col("v").alias("b"), F.col("mink").alias("minb")),
                    "b",
                )
                .where((F.col("key") == F.col("mina")) & (F.col("key") == F.col("minb")))
                .select("a", "b")
            )
            matched = matched_state.rotate(matched.unionByName(winners))
            # anti-join against THIS round's winners only: live edges were
            # already purged of earlier rounds' endpoints, so the delta
            # suffices and the join side stays O(|round winners|), not
            # O(|total matching|)
            won_vs = (
                winners.select(F.col("a").alias("v"))
                .unionByName(winners.select(F.col("b").alias("v")))
                .distinct()
            )
            if not big:
                won_vs = F.broadcast(won_vs)
            nxt = (
                live.join(won_vs.withColumnRenamed("v", "a"), "a", "left_anti")
                .join(won_vs.withColumnRenamed("v", "b"), "b", "left_anti")
                .select("a", "b", "key")
            )
            obs = Observation(f"match_{id(live_state)}_{it}")
            nxt = nxt.observe(obs, F.count(F.lit(1)).alias("live"))
            live = live_state.rotate(nxt)
            n_live = int(obs.get["live"] or 0)
            metrics.append({"iteration": it, "live_edges": n_live})
            if n_live == 0:
                converged = True
                break

    live_state.release()  # the frontier is dead; only the matching survives
    return MatchingResult(
        matching=matched, iterations=it, converged=converged, metrics=metrics
    )


def maximal_matching_sql(rounds: int = 20) -> str:
    """DuckDB oracle body (expects ``verts``/``edges`` CTEs): the same
    local-min rounds unrolled; emits the matched pairs accumulated after
    ``rounds`` rounds."""
    key = (
        f"concat_ws('-', lpad(CAST({md5_long_sql('concat_ws(chr(58), CAST(a AS VARCHAR), CAST(b AS VARCHAR))')} AS VARCHAR), 19, '0'),"
        " lpad(CAST(a AS VARCHAR), 19, '0'), lpad(CAST(b AS VARCHAR), 19, '0'))"
    )
    ctes = [
        f"""mm0 AS MATERIALIZED (
      SELECT a, b, {key} AS key FROM (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
      )
    )""",
        "mmw0 AS (SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b WHERE 1 = 0)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""mmv{k} AS MATERIALIZED (
      SELECT v, min(key) AS mink FROM (
        SELECT a AS v, key FROM mm{k - 1}
        UNION ALL SELECT b AS v, key FROM mm{k - 1}
      ) GROUP BY v
    ),
    mmsel{k} AS MATERIALIZED (
      SELECT e.a, e.b
      FROM mm{k - 1} e
      JOIN mmv{k} x ON x.v = e.a AND x.mink = e.key
      JOIN mmv{k} y ON y.v = e.b AND y.mink = e.key
    ),
    mmw{k} AS MATERIALIZED (
      SELECT a, b FROM mmw{k - 1} UNION ALL SELECT a, b FROM mmsel{k}
    ),
    mm{k} AS MATERIALIZED (
      SELECT e.a, e.b, e.key FROM mm{k - 1} e
      WHERE e.a NOT IN (SELECT a FROM mmw{k} UNION SELECT b FROM mmw{k})
        AND e.b NOT IN (SELECT a FROM mmw{k} UNION SELECT b FROM mmw{k})
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT a, b FROM mmw{rounds}
    """


def vertex_cover(graph: LinkGraph, max_iterations: int = 20) -> DataFrame:
    """→ ``[id]`` — the matched-endpoints 2-APPROXIMATE minimum vertex
    cover (Gavril's classic bound: every edge of any maximal matching must
    be covered, and an optimal cover needs at least one endpoint per
    matched edge, so |cover| = 2·|matching| ≤ 2·OPT). One extra projection
    over :func:`maximal_matching` — the standard 'which actors do I need
    to monitor to see every interaction' query."""
    res = maximal_matching(graph, max_iterations=max_iterations)
    if not res.converged:
        raise RuntimeError(
            f"vertex_cover: matching did not become maximal in "
            f"{res.iterations} rounds (live edges remain — the endpoint set "
            "would not cover them); raise max_iterations"
        )
    return (
        res.matching.select(F.col("a").alias("id"))
        .unionByName(res.matching.select(F.col("b").alias("id")))
        .distinct()
    )


def vertex_cover_sql(rounds: int = 20) -> str:
    """DuckDB oracle body — the matching chain's endpoint projection."""
    base = maximal_matching_sql(rounds)
    head = base[: base.rindex("SELECT a, b FROM")]
    return f"""{head}SELECT a AS id FROM mmw{rounds}
    UNION
    SELECT b AS id FROM mmw{rounds}
    """
