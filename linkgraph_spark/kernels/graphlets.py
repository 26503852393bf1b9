"""Size-4 graphlet census via closed-form combinatorial identities.

Counts every connected 4-vertex graphlet of the undirected simple graph —
3-path (P4), claw (K1,3), paw (tailed triangle), 4-cycle (C4), diamond
(K4 minus an edge) and 4-clique (K4) — reporting BOTH the non-induced
subgraph-copy count and the induced count for each.  The size-4 census
is the standard next rung above the triangle family for structural
fingerprinting (graphlet degree distributions, network comparison): in a
transcript graph, claws are broadcast hubs, paws are triads with a
spectator, diamonds/K4 are tightly coordinated actor pods, and C4 without
triangles is two-mode (tool-mediated) structure.

Method (ESCAPE lineage — Pinar, Seshadhri & Vishal, WWW 2017, public
technique): never enumerate the two fan-out-explosive patterns.  All six
non-induced counts come from degree moments, the triangle list, per-edge
triangle support and the wedge common-neighbor table:

    claw_ni    = Σ_v C(d_v, 3)
    path4_ni   = Σ_{(a,b)∈E} (d_a−1)(d_b−1) − 3·T
    paw_ni     = Σ_v t_v·(d_v−2)
    diamond_ni = Σ_e C(sup_e, 2)
    cycle4_ni  = Σ_{x<y} C(|{c ∈ N(x)∩N(y) : rank(c) < max(rank(x), rank(y))}|, 2)
                 (ESCAPE's directed counting under the (deg, id) rank —
                 exactly once per cycle, see the in-code proof sketch)
    clique4_ni = degree-ordered Chiba–Nishizeki extension of the
                 key-ordered triangle list (each K4 found exactly once)

and the induced counts follow by the fixed overcount matrix

    clique4_i = K4
    diamond_i = diamond_ni − 6·K4
    cycle4_i  = cycle4_ni − diamond_i − 3·K4
    paw_i     = paw_ni − 4·diamond_i − 12·K4
    claw_i    = claw_ni − paw_i − 2·diamond_i − 4·K4
    path4_i   = path4_ni − 2·paw_i − 4·cycle4_i − 6·diamond_i − 12·K4

(each coefficient = copies of the smaller pattern inside the larger one;
verified against 4-subset brute-force enumeration in the tests).

Scale shape: one O(E) degree aggregate, the arboricity-bounded oriented
triangle/4-clique enumeration (hub out-degree O(√E) under the (deg, id)
orientation — see kernels/triangles.py), an orientation-bounded wedge
join for the C4 term (only wedges whose center is not the wedge's
(deg, id)-maximum are generated — Σ d·d⁺ = O(E^1.5) rows total, a
maximum-rank hub center emits zero, so no hub cap is needed; contrast
``square_count``, whose PER-VERTEX attribution cannot drop center-max
wedges and keeps its ``max_degree`` knob), and a six-scalar cross
join.  All products are computed on
DECIMAL(38,0) so a 10^8-degree hub's d³ term cannot overflow a BIGINT.

Reference provenance: the reference engine has no motif counting — this
is an engine extension in the link-analysis family of
pagerank_lambda/dynamodb/pagerank.py (its per-vertex relation scan is
the same adjacency this census reuses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph
from linkgraph_spark.kernels.triangles import (
    _deg_oriented,
    _four_clique_members,
    _oriented,
    _triangles_und,
)

_DEC = "decimal(38,0)"


def graphlet_census4(graph: LinkGraph) -> DataFrame:
    """→ six rows ``[graphlet, subgraph_count, induced_count]`` — the
    complete connected 4-vertex graphlet census (see module docstring).
    ``subgraph_count`` counts copies (extra edges allowed), ``induced_count``
    counts 4-subsets whose induced subgraph IS the pattern."""
    und = _oriented(graph.edges).persist()
    und.count()  # pin once: the census references the edge list 6 times
    directed = _deg_oriented(und).persist()
    directed.count()
    tri = _triangles_und(und).persist()
    tri.count()
    try:
        deg = (
            und.select(F.col("a").alias("v"))
            .unionAll(und.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").cast(_DEC).alias("d"))
        )
        d = F.col("d")
        z = F.lit(0).cast(_DEC)
        # Σ C(d,3) — exact: d(d−1)(d−2) is divisible by 6
        claws = deg.agg(
            F.coalesce(F.sum((d * (d - 1) * (d - 2)) / 3), z)
            .cast(_DEC)
            .alias("claw_ni2")  # doubled; halved below to keep scale-0 ops
        )
        # Σ_{edges} (d_a−1)(d_b−1)
        da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
        db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
        p4sum = (
            und.join(da, "a")
            .join(db, "b")
            .agg(
                F.coalesce(
                    F.sum((F.col("da") - 1) * (F.col("db") - 1)), z
                )
                .cast(_DEC)
                .alias("p4sum")
            )
        )
        t_cnt = tri.agg(F.count("*").cast(_DEC).alias("t"))
        # per-vertex triangle participation → paw term Σ t_v (d_v − 2)
        tv = (
            tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
            .groupBy("v")
            .agg(F.count("*").cast(_DEC).alias("tv"))
        )
        paw = tv.join(deg, "v").agg(
            F.coalesce(F.sum(F.col("tv") * (d - 2)), z).cast(_DEC).alias("paw_ni")
        )
        # per-edge triangle support → diamond term Σ C(sup, 2)
        sup = (
            tri.select("a", "b")
            .unionAll(tri.select("a", F.col("c").alias("b")))
            .unionAll(tri.select(F.col("b").alias("a"), F.col("c").alias("b")))
            .groupBy("a", "b")
            .agg(F.count("*").cast(_DEC).alias("s"))
        )
        dia = sup.agg(
            F.coalesce(F.sum(F.col("s") * (F.col("s") - 1)), z)
            .cast(_DEC)
            .alias("dia_ni2")  # doubled
        )
        # C4 via ORIENTATION-BOUNDED common-neighbor wedge pairs (ESCAPE's
        # directed counting, WWW 2017): enumerate only wedges whose center
        # is NOT the (deg, id)-maximum of the wedge.  Every 4-cycle has a
        # unique (deg, id)-minimum vertex m; picking the diagonal pair NOT
        # containing the cycle maximum, both of its wedge centers rank
        # below that pair's maximum, and conversely any two such centers
        # on a pair close a cycle — so Σ_{pairs} C(w', 2) with
        # w' = |{common neighbors below max(pair)}| counts each 4-cycle
        # EXACTLY once (brute-force-pinned in tests/test_wave145.py).
        # Work drops from Σ_v C(d_v, 2) (a degree-D hub center emits
        # C(D, 2) rows) to Σ_v d_v·d⁺_v with d⁺ the up-degree in the
        # (deg, id) order — O(E^1.5) total, and a maximum hub emits ZERO
        # wedge rows instead of owning the join.
        deg_l = (
            und.select(F.col("a").alias("v"))
            .unionAll(und.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("dl"))
        )
        ka = F.struct(F.col("la").alias("d"), F.col("a").alias("i"))
        kb = F.struct(F.col("lb").alias("d"), F.col("b").alias("i"))
        und_k = und.join(
            deg_l.select(F.col("v").alias("a"), F.col("dl").alias("la")), "a"
        ).join(deg_l.select(F.col("v").alias("b"), F.col("dl").alias("lb")), "b")
        nbrs_k = und_k.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("m"), F.col("b").alias("n"),
                        ka.alias("km"), kb.alias("kn"),
                    ),
                    F.struct(
                        F.col("b").alias("m"), F.col("a").alias("n"),
                        kb.alias("km"), ka.alias("kn"),
                    ),
                )
            ).alias("r")
        ).select("r.*")
        # x-side: only the center's UP-neighbors (rank above the center);
        # y-side: all neighbors.  (up, low) pairs appear once by
        # construction; (up, up) pairs once via the id tiebreak; (low, low)
        # wedges — center is the wedge maximum — are never generated.
        up = nbrs_k.where(F.col("kn") > F.col("km")).select(
            "m", F.col("n").alias("x")
        )
        aln = nbrs_k.select("m", F.col("n").alias("y"), "km", F.col("kn").alias("ky"))
        common = (
            up.join(aln, "m")
            .where((F.col("ky") < F.col("km")) | (F.col("x") < F.col("y")))
            .select(F.least("x", "y").alias("x"), F.greatest("x", "y").alias("y"))
            .groupBy("x", "y")
            .agg(F.count("*").cast(_DEC).alias("w"))
        )
        c4 = common.agg(
            F.coalesce(F.sum(F.col("w") * (F.col("w") - 1)), z)
            .cast(_DEC)
            .alias("c4_ni2")  # doubled: Σ w'(w'−1) = 2·C4
        )
        k4 = _four_clique_members(directed).agg(
            (F.count("*") / 4).cast(_DEC).alias("k4")
        )
        s = (
            claws.crossJoin(p4sum)
            .crossJoin(t_cnt)
            .crossJoin(paw)
            .crossJoin(dia)
            .crossJoin(c4)
            .crossJoin(k4)
            .select(
                (F.col("claw_ni2") / 2).cast(_DEC).alias("claw_ni"),
                (F.col("p4sum") - 3 * F.col("t")).cast(_DEC).alias("p4_ni"),
                F.col("paw_ni"),
                (F.col("dia_ni2") / 2).cast(_DEC).alias("dia_ni"),
                (F.col("c4_ni2") / 2).cast(_DEC).alias("c4_ni"),
                F.col("k4"),
            )
            .select(
                "*",
                (F.col("dia_ni") - 6 * F.col("k4")).alias("dia_i"),
            )
            .select(
                "*",
                (F.col("c4_ni") - F.col("dia_i") - 3 * F.col("k4")).alias("c4_i"),
                (F.col("paw_ni") - 4 * F.col("dia_i") - 12 * F.col("k4")).alias(
                    "paw_i"
                ),
            )
            .select(
                "*",
                (
                    F.col("claw_ni")
                    - F.col("paw_i")
                    - 2 * F.col("dia_i")
                    - 4 * F.col("k4")
                ).alias("claw_i"),
                (
                    F.col("p4_ni")
                    - 2 * F.col("paw_i")
                    - 4 * F.col("c4_i")
                    - 6 * F.col("dia_i")
                    - 12 * F.col("k4")
                ).alias("p4_i"),
            )
        )
        out = s.select(
            F.expr(
                "stack(6,"
                " 'path4',   p4_ni,  p4_i,"
                " 'claw',    claw_ni, claw_i,"
                " 'paw',     paw_ni, paw_i,"
                " 'cycle4',  c4_ni,  c4_i,"
                " 'diamond', dia_ni, dia_i,"
                " 'clique4', k4,     k4)"
                " AS (graphlet, subgraph_count, induced_count)"
            )
        ).select(
            "graphlet",
            F.col("subgraph_count").cast(_DEC).alias("subgraph_count"),
            F.col("induced_count").cast(_DEC).alias("induced_count"),
        )
        return out.localCheckpoint()
    finally:
        tri.unpersist()
        directed.unpersist()
        und.unpersist()


def graphlet_census4_sql() -> str:
    """DuckDB oracle body (expects the ``edges`` CTE in scope): the same
    identities over HUGEINT arithmetic, with the id-ordered (rather than
    degree-ordered) triangle/K4 enumeration — a different but equivalent
    total order, so the counts must agree exactly."""
    return """
    gc_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    gc_deg AS MATERIALIZED (
      SELECT v, CAST(count(*) AS HUGEINT) AS d FROM (
        SELECT a AS v FROM gc_und UNION ALL SELECT b AS v FROM gc_und
      ) GROUP BY v
    ),
    gc_tri AS MATERIALIZED (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM gc_und e1
      JOIN gc_und e2 ON e1.b = e2.a
      JOIN gc_und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    gc_k4 AS (
      SELECT CAST(count(*) AS HUGEINT) AS k4
      FROM gc_tri t
      JOIN gc_und p1 ON p1.a = t.a AND p1.b > t.c
      JOIN gc_und p2 ON p2.a = t.b AND p2.b = p1.b
      JOIN gc_und p3 ON p3.a = t.c AND p3.b = p1.b
    ),
    gc_sc AS (
      SELECT
        (SELECT coalesce(sum(d*(d-1)*(d-2)//6), 0) FROM gc_deg) AS claw_ni,
        (SELECT coalesce(sum((da.d-1)*(db.d-1)), 0)
           FROM gc_und e JOIN gc_deg da ON da.v = e.a
                         JOIN gc_deg db ON db.v = e.b)
          - 3 * (SELECT CAST(count(*) AS HUGEINT) FROM gc_tri) AS p4_ni,
        (SELECT coalesce(sum(tv * (d - 2)), 0) FROM (
           SELECT v, CAST(count(*) AS HUGEINT) AS tv FROM (
             SELECT a AS v FROM gc_tri
             UNION ALL SELECT b FROM gc_tri
             UNION ALL SELECT c FROM gc_tri
           ) GROUP BY v
         ) t JOIN gc_deg USING (v)) AS paw_ni,
        (SELECT coalesce(sum(s*(s-1)//2), 0) FROM (
           SELECT CAST(count(*) AS HUGEINT) AS s FROM (
             SELECT a, b FROM gc_tri
             UNION ALL SELECT a, c AS b FROM gc_tri
             UNION ALL SELECT b AS a, c AS b FROM gc_tri
           ) GROUP BY a, b
         )) AS dia_ni,
        (SELECT coalesce(sum(w*(w-1)), 0) // 4 FROM (
           SELECT CAST(count(*) AS HUGEINT) AS w FROM (
             SELECT a AS m, b AS n FROM gc_und
             UNION ALL SELECT b AS m, a AS n FROM gc_und
           ) l JOIN (
             SELECT a AS m, b AS n FROM gc_und
             UNION ALL SELECT b AS m, a AS n FROM gc_und
           ) r ON l.m = r.m AND l.n < r.n
           GROUP BY l.n, r.n
         )) AS c4_ni,
        (SELECT k4 FROM gc_k4) AS k4
    ),
    gc_i AS (
      SELECT *,
             dia_ni - 6*k4 AS dia_i,
             c4_ni - (dia_ni - 6*k4) - 3*k4 AS c4_i,
             paw_ni - 4*(dia_ni - 6*k4) - 12*k4 AS paw_i
      FROM gc_sc
    )
    SELECT 'path4' AS graphlet, p4_ni AS subgraph_count,
           p4_ni - 2*paw_i - 4*c4_i - 6*dia_i - 12*k4 AS induced_count
    FROM gc_i
    UNION ALL SELECT 'claw', claw_ni,
           claw_ni - paw_i - 2*dia_i - 4*k4 FROM gc_i
    UNION ALL SELECT 'paw', paw_ni, paw_i FROM gc_i
    UNION ALL SELECT 'cycle4', c4_ni, c4_i FROM gc_i
    UNION ALL SELECT 'diamond', dia_ni, dia_i FROM gc_i
    UNION ALL SELECT 'clique4', k4, k4 FROM gc_i
    """
