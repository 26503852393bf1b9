"""SimRank structural similarity (Jeh & Widom, KDD 2002).

``s(a, b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s(i, j)`` with
``s(a, a) = 1`` — "two pages are similar when they are referenced by
similar pages". The reference engine's link-similarity use case (actor
pages ranked by shared citation structure) sits one step past the
common-neighbor family in ``kernels/linkpred.py``: iteration 1 IS
normalized common-in-neighbors; further iterations propagate similarity
through the in-link graph.

Spark shape: the score matrix is kept SPARSE — a ``[a, b, s]`` frame over
``a < b`` pairs (the diagonal is implicit, 1.0). Each superstep is

    P = symmetric(S_{k-1}) ∪ diagonal(sources)        (no shuffle: unions)
    S_k = P ⋈ edges(i→a) ⋈ edges(j→b) → groupBy(a,b) sum → scale

i.e. two vertex-keyed equi-joins and one grouped sum — the same
gather-join discipline as every other kernel here; no V×V matrix is ever
materialized. After k iterations the support is contained in pairs whose
in-neighborhoods meet within k reverse hops, so sparsity tracks the
k-hop wedge structure, not V².

Scale levers (the 100 TB lens):
- fan-out per P-pair (i, j) is outdeg(i)·outdeg(j) — a degree-10^6 hub
  source squares into the join. ``max_out_degree`` drops hub SOURCES from
  propagation (the standard cap, same rationale as
  ``linkpred.adamic_adar``: a source that cites everyone carries ~zero
  similarity evidence and C/(|I|·|I|) scales its term to ~0 anyway);
- ``min_score`` prunes the sparse frame between supersteps (applied AFTER
  the deterministic 9-dp round, so the pruned support is engine-portable
  and the DuckDB oracle replays it bit-for-bit).

Intermediate scores are rounded to 9 dp per superstep (the cross-engine
FP-determinism convention used by ``kernels/kmeans.py``); the emitted
score gets a final 6-dp round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph

DECAY = 0.8  # Jeh & Widom's C


def simrank(
    graph: LinkGraph,
    iterations: int = 2,
    decay: float = DECAY,
    max_out_degree: int | None = None,
    min_score: float = 0.0,
) -> DataFrame:
    """→ [a, b, score]: SimRank after ``iterations`` supersteps for every
    vertex pair ``a < b`` with a non-zero score (the sparse off-diagonal
    support; ``s(x, x) = 1`` is implicit and not emitted).

    ``max_out_degree`` excludes hub sources from propagation — REQUIRED at
    scale (see module docstring); ``min_score`` prunes pairs below the
    threshold after each superstep's 9-dp round (0.0 = exact)."""
    frame, edges = _simrank_frame(graph, iterations, decay, max_out_degree, min_score)
    # materialize the sparse support eagerly so the cached edge invariant
    # (read 2k+1 times by the unrolled plan) can be released before
    # returning — the rich_club persist-lifecycle pattern
    out = frame.localCheckpoint()
    edges.unpersist()
    return out


def _simrank_frame(
    graph: LinkGraph,
    iterations: int,
    decay: float,
    max_out_degree: int | None,
    min_score: float,
) -> tuple[DataFrame, DataFrame]:
    """The lazy unrolled plan behind :func:`simrank` plus the persisted
    edge invariant it reads (caller owns the unpersist) — split out so
    plan tests can audit the shipped shape before checkpointing."""
    if iterations < 1:
        raise ValueError("simrank: iterations must be >= 1")
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if max_out_degree is not None:
        ok = (
            edges.groupBy("src")
            .agg(F.count("*").alias("od"))
            .where(F.col("od") <= max_out_degree)
            .select("src")
        )
        edges = edges.join(ok, "src")
    edges = edges.persist()
    indeg = edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("ind"))
    ia = indeg.select(F.col("id").alias("a"), F.col("ind").alias("ind_a"))
    ib = indeg.select(F.col("id").alias("b"), F.col("ind").alias("ind_b"))
    # the diagonal of S restricted to rows that can propagate: only vertices
    # WITH out-edges contribute (s(i,i)=1 needs an edge i→a and an edge i→b)
    diag = edges.select(F.col("src").alias("i")).distinct().select(
        "i", F.col("i").alias("j"), F.lit(1.0).alias("s")
    )
    e1 = edges.select(F.col("src").alias("i"), F.col("dst").alias("a"))
    e2 = edges.select(F.col("src").alias("j"), F.col("dst").alias("b"))

    sparse: DataFrame | None = None  # [a, b, s] over a < b
    for _ in range(iterations):
        if sparse is None:
            pairs = diag
        else:
            pairs = diag.unionByName(
                sparse.select(
                    F.col("a").alias("i"), F.col("b").alias("j"), "s"
                ).unionByName(
                    sparse.select(F.col("b").alias("i"), F.col("a").alias("j"), "s")
                )
            )
        nxt = (
            pairs.join(e1, "i")
            .join(e2, "j")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("_sum"))
            .join(ia, "a")
            .join(ib, "b")
            .select(
                "a",
                "b",
                F.round(
                    F.lit(decay) * F.col("_sum") / (F.col("ind_a") * F.col("ind_b")),
                    9,
                ).alias("s"),
            )
        )
        if min_score > 0.0:
            nxt = nxt.where(F.col("s") >= min_score)
        sparse = nxt
    frame = sparse.select("a", "b", F.round("s", 6).alias("score")).where(
        F.col("score") > 0
    )
    return frame, edges


def simrank_sql(
    iterations: int = 2,
    decay: float = DECAY,
    max_out_degree: int | None = None,
    min_score: float = 0.0,
) -> str:
    """DuckDB oracle body for :func:`simrank` (expects the ``edges`` CTE in
    scope) — the superstep loop unrolled, same per-round 9-dp rounding and
    pruning, so the sparse support matches bit-for-bit."""
    cap = ""
    if max_out_degree is not None:
        cap = f"""
    sr_ok AS (SELECT src FROM sr_all GROUP BY src
              HAVING count(*) <= {max_out_degree}),"""
    src_tbl = "sr_all JOIN sr_ok USING (src)" if max_out_degree is not None else "sr_all"
    prune = f"HAVING round({decay} * sum(p.s) / CAST(ia.ind * ib.ind AS DOUBLE), 9) >= {min_score}" if min_score > 0.0 else ""
    ctes = [
        f"""sr_all AS (
      SELECT DISTINCT src, dst FROM edges WHERE src <> dst
    ),{cap}
    sr_e AS MATERIALIZED (SELECT src, dst FROM {src_tbl}),
    sr_ind AS MATERIALIZED (
      SELECT dst AS id, count(*) AS ind FROM sr_e GROUP BY dst
    ),
    sr_diag AS (SELECT DISTINCT src AS i FROM sr_e)"""
    ]
    prev = None
    for k in range(1, iterations + 1):
        if prev is None:
            pairs = "SELECT i, i AS j, 1.0 AS s FROM sr_diag"
        else:
            pairs = f"""SELECT i, i AS j, 1.0 AS s FROM sr_diag
      UNION ALL SELECT a AS i, b AS j, s FROM {prev}
      UNION ALL SELECT b AS i, a AS j, s FROM {prev}"""
        ctes.append(f"sr_p{k} AS (\n      {pairs}\n    )")
        ctes.append(
            f"""sr_s{k} AS MATERIALIZED (
      SELECT e1.dst AS a, e2.dst AS b,
             round({decay} * sum(p.s) / CAST(ia.ind * ib.ind AS DOUBLE), 9) AS s
      FROM sr_p{k} p
      JOIN sr_e e1 ON e1.src = p.i
      JOIN sr_e e2 ON e2.src = p.j
      JOIN sr_ind ia ON ia.id = e1.dst
      JOIN sr_ind ib ON ib.id = e2.dst
      WHERE e1.dst < e2.dst
      GROUP BY e1.dst, e2.dst, ia.ind, ib.ind
      {prune}
    )"""
        )
        prev = f"sr_s{k}"
    body = ",\n    ".join(ctes)
    return f"""{body}
    SELECT a, b, round(s, 6) AS score FROM {prev}
    WHERE round(s, 6) > 0
    """
