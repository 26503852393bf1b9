"""Modularity: the quality score of a community labeling.

Newman–Girvan modularity over the undirected simple graph:

    Q = Σ_c [ m_c / m − (d_c / 2m)² ]

where m = total undirected edges, m_c = edges with both endpoints in
community c, d_c = total degree of c's members. The number every
community-detection run (label propagation, components-as-communities,
near-dup clusters) should report next to its labels — Q ≈ 0 means the
labeling explains nothing, Q ≳ 0.3 means real structure.

Scale shape: one symmetrize+dedup, one degree aggregate, two broadcast-or-
hash joins to attach labels to edge endpoints, two grouped sums, one
final reduce to a single row. No iteration, state O(communities).
Engine addition over the reference (no community metrics at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph


def modularity(graph: LinkGraph, labels: DataFrame, label_col: str = "label") -> DataFrame:
    """→ one-row ``[modularity: double]`` (rounded 6) for the partition
    given by ``labels`` (``[id, <label_col>]``; every vertex must be
    labeled). Self-loops are ignored, matching the kernels' undirected
    simple-graph convention."""
    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    lab = labels.select("id", F.col(label_col).alias("_c"))
    la = lab.select(F.col("id").alias("a"), F.col("_c").alias("ca"))
    lb = lab.select(F.col("id").alias("b"), F.col("_c").alias("cb"))
    edges_labeled = und.join(la, "a").join(lb, "b")

    # within-community edge count per community
    within = (
        edges_labeled.where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("_c"))
        .agg(F.count("*").alias("mc"))
    )
    # community total degree: every edge endpoint contributes 1
    deg = (
        edges_labeled.select(F.col("ca").alias("_c"))
        .unionAll(edges_labeled.select(F.col("cb").alias("_c")))
        .groupBy("_c")
        .agg(F.count("*").alias("dc"))
    )
    m = und.count()
    if m == 0:
        return graph.vertices.sparkSession.createDataFrame(
            [(0.0,)], "modularity double"
        )
    per_c = deg.join(within, "_c", "left").select(
        (
            F.coalesce("mc", F.lit(0)) / F.lit(float(m))
            - (F.col("dc") / F.lit(2.0 * m)) * (F.col("dc") / F.lit(2.0 * m))
        ).alias("q")
    )
    return per_c.agg(F.round(F.sum("q"), 6).alias("modularity"))


def modularity_sql(labels_cte: str, label_col: str = "label") -> str:
    """DuckDB oracle body. ``labels_cte`` names a CTE in scope with
    ``[id, <label_col>]``; expects the ``edges`` CTE too."""
    return f"""
    md_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    md_m AS (SELECT count(*) AS m FROM md_und),
    md_el AS MATERIALIZED (
      SELECT e.a, e.b, la.{label_col} AS ca, lb.{label_col} AS cb
      FROM md_und e
      JOIN {labels_cte} la ON la.id = e.a
      JOIN {labels_cte} lb ON lb.id = e.b
    ),
    md_within AS (
      SELECT ca AS c, count(*) AS mc FROM md_el WHERE ca = cb GROUP BY ca
    ),
    md_deg AS (
      SELECT c, count(*) AS dc FROM (
        SELECT ca AS c FROM md_el UNION ALL SELECT cb FROM md_el
      ) GROUP BY c
    )
    SELECT coalesce(round(sum(
      coalesce(w.mc, 0) * 1.0 / m.m - (d.dc / (2.0 * m.m)) * (d.dc / (2.0 * m.m))
    ), 6), 0.0) AS modularity
    FROM md_deg d CROSS JOIN md_m m
    LEFT JOIN md_within w ON w.c = d.c
    """


def conductance(
    graph: LinkGraph, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """→ ``[community, conductance]`` — per-community cut quality:
    φ(C) = cut(C) / min(vol(C), 2m − vol(C)) over the undirected simple
    graph (cut = edges leaving C, vol = degree mass inside). The
    PER-community complement to the single global ``modularity`` number:
    low φ = a well-separated community. NULL when the denominator is 0
    (C or its complement holds no edge endpoints). Same single-pass
    shape as modularity: one symmetrize, two label joins, two grouped
    sums — state O(communities)."""
    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    lab = labels.select("id", F.col(label_col).alias("_c"))
    la = lab.select(F.col("id").alias("a"), F.col("_c").alias("ca"))
    lb = lab.select(F.col("id").alias("b"), F.col("_c").alias("cb"))
    el = und.join(la, "a").join(lb, "b")

    cut = (
        el.where(F.col("ca") != F.col("cb"))
        .select(F.explode(F.array("ca", "cb")).alias("community"))
        .groupBy("community")
        .agg(F.count("*").alias("cut"))
    )
    vol = (
        el.select(F.explode(F.array("ca", "cb")).alias("community"))
        .groupBy("community")
        .agg(F.count("*").alias("vol"))
    )
    m = und.count()
    denom = F.least(F.col("vol"), F.lit(2 * m) - F.col("vol"))
    return (
        vol.join(cut, "community", "left")
        .select(
            "community",
            F.round(
                F.when(
                    denom > 0, F.coalesce("cut", F.lit(0)) / denom
                ),
                6,
            ).alias("conductance"),
        )
    )


def conductance_sql(labels_cte: str, label_col: str = "label") -> str:
    """DuckDB oracle body (mirror of :func:`conductance`; expects the
    ``edges`` CTE and a labels CTE in scope)."""
    return f"""
    cd_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    cd_m AS (SELECT count(*) AS m FROM cd_und),
    cd_el AS MATERIALIZED (
      SELECT e.a, e.b, la.{label_col} AS ca, lb.{label_col} AS cb
      FROM cd_und e
      JOIN {labels_cte} la ON la.id = e.a
      JOIN {labels_cte} lb ON lb.id = e.b
    ),
    cd_ends AS (
      SELECT ca AS community, (ca <> cb) AS is_cut FROM cd_el
      UNION ALL SELECT cb, (ca <> cb) FROM cd_el
    ),
    cd_agg AS (
      SELECT community, count(*) AS vol,
             sum(CASE WHEN is_cut THEN 1 ELSE 0 END) AS cut
      FROM cd_ends GROUP BY community
    )
    SELECT community,
           CASE WHEN least(vol, 2 * m.m - vol) > 0
                THEN round(cut * 1.0 / least(vol, 2 * m.m - vol), 6)
           END AS conductance
    FROM cd_agg CROSS JOIN cd_m m
    """


def label_mixing(graph: LinkGraph, labels: DataFrame, label_col: str = "label") -> DataFrame:
    """→ [label_x, label_y, n_edges, frac] — the directed mixing matrix of
    a community assignment: how many edges run from community x to
    community y, and what share of all labelled edges that cell is. The
    companion view to :func:`modularity` (one scalar) when you need to SEE
    where the off-diagonal mass sits — which communities talk to each
    other, whether the partition is assortative cell by cell. Engine
    addition (the reference has no community ops).

    Scale shape: two hash joins attach endpoint labels to the edge list
    (each O(E), the label side O(V)), then ONE map-side-combinable
    aggregate onto |labels|² cells; the total-edges normaliser is a
    1-row broadcast. No window, no iteration, no per-vertex fan-out.
    """
    lab = labels.select("id", F.col(label_col).alias("_lbl"))
    e2 = (
        graph.edges.select("src", "dst")
        .join(
            lab.select(F.col("id").alias("src"), F.col("_lbl").alias("label_x")),
            "src",
        )
        .join(
            lab.select(F.col("id").alias("dst"), F.col("_lbl").alias("label_y")),
            "dst",
        )
    )
    mix = e2.groupBy("label_x", "label_y").agg(F.count("*").alias("n_edges"))
    tot = mix.agg(F.sum("n_edges").alias("_t"))
    return mix.crossJoin(F.broadcast(tot)).select(
        "label_x",
        "label_y",
        "n_edges",
        F.round(F.col("n_edges") * 1.0 / F.col("_t"), 6).alias("frac"),
    )


def label_mixing_sql(labels_cte: str, label_col: str = "label") -> str:
    """DuckDB oracle body. ``labels_cte`` names a CTE in scope with
    ``[id, <label_col>]``; expects the ``edges`` CTE too."""
    return f"""
    lm_mix AS MATERIALIZED (
      SELECT lx.{label_col} AS label_x, ly.{label_col} AS label_y,
             count(*) AS n_edges
      FROM edges e
      JOIN {labels_cte} lx ON lx.id = e.src
      JOIN {labels_cte} ly ON ly.id = e.dst
      GROUP BY 1, 2
    ),
    lm_t AS (SELECT sum(n_edges) AS t FROM lm_mix)
    SELECT label_x, label_y, n_edges,
           round(n_edges * 1.0 / t, 6) AS frac
    FROM lm_mix CROSS JOIN lm_t
    """


def label_assortativity(
    graph: LinkGraph, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """→ 1 row [r, n_labels, diag_frac] — Newman's categorical
    assortativity coefficient (Newman, Phys. Rev. E 67, 2003, eq. 2) over
    a community/label assignment: with e_xy the fraction of directed
    edges from label x to label y, a_x = Σ_y e_xy, b_y = Σ_x e_xy,

        r = (Σ_x e_xx − Σ_x a_x·b_x) / (1 − Σ_x a_x·b_x)

    r = 1 ⇔ perfectly assortative (all edges intra-label), r = 0 ⇔ mixing
    is what the marginals predict, r < 0 ⇔ disassortative. The scalar
    companion to :func:`label_mixing` (the full matrix) — same reduction,
    one number. The degenerate Σ a·b = 1 case (a single label) reports
    r = 1.0 by convention (the partition is trivially assortative).

    Scale shape: identical to :func:`label_mixing` — two label-attach
    hash joins + ONE aggregate onto |labels|² cells; the a·b marginal
    product is a self-join of the |labels|-row marginal table with
    itself on the label key (tiny, broadcast). No V-row window.
    """
    lab = labels.select("id", F.col(label_col).alias("_lbl"))
    e2 = (
        graph.edges.select("src", "dst")
        .join(
            lab.select(F.col("id").alias("src"), F.col("_lbl").alias("lx")), "src"
        )
        .join(
            lab.select(F.col("id").alias("dst"), F.col("_lbl").alias("ly")), "dst"
        )
    )
    mix = e2.groupBy("lx", "ly").agg(F.count("*").alias("n")).persist()
    tot = mix.agg(F.sum("n").alias("t"))
    a = mix.groupBy("lx").agg(F.sum("n").alias("na"))
    b = mix.groupBy("ly").agg(F.sum("n").alias("nb"))
    ab = (
        a.join(b, a.lx == b.ly)
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("na") / F.col("t")) * (F.col("nb") / F.col("t"))
            ).alias("sum_ab")
        )
    )
    diag = (
        mix.where(F.col("lx") == F.col("ly"))
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(F.col("n") / F.col("t")).alias("sum_diag"))
    )
    nl = lab.agg(F.countDistinct("_lbl").alias("n_labels"))
    out = (
        diag.crossJoin(ab)
        .crossJoin(nl)
        .select(
            F.round(
                F.when(
                    F.abs(F.lit(1.0) - F.col("sum_ab")) < 1e-12, F.lit(1.0)
                ).otherwise(
                    (F.coalesce("sum_diag", F.lit(0.0)) - F.col("sum_ab"))
                    / (F.lit(1.0) - F.col("sum_ab"))
                ),
                6,
            ).alias("r"),
            "n_labels",
            F.round(F.coalesce("sum_diag", F.lit(0.0)), 6).alias("diag_frac"),
        )
        .localCheckpoint()  # tiny result; lets the mix cache go
    )
    mix.unpersist()
    return out


def label_assortativity_sql(labels_cte: str, label_col: str = "label") -> str:
    """DuckDB oracle body. ``labels_cte`` names a CTE in scope with
    ``[id, <label_col>]``; expects the ``edges`` CTE too."""
    return f"""
    la_mix AS MATERIALIZED (
      SELECT lx.{label_col} AS lx, ly.{label_col} AS ly, count(*) AS n
      FROM edges e
      JOIN {labels_cte} lx ON lx.id = e.src
      JOIN {labels_cte} ly ON ly.id = e.dst
      GROUP BY 1, 2
    ),
    la_t AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM la_mix),
    la_a AS (SELECT lx AS l, CAST(sum(n) AS DOUBLE) AS na FROM la_mix GROUP BY 1),
    la_b AS (SELECT ly AS l, CAST(sum(n) AS DOUBLE) AS nb FROM la_mix GROUP BY 1),
    la_ab AS (
      SELECT sum((na / t) * (nb / t)) AS sum_ab
      FROM la_a JOIN la_b USING (l) CROSS JOIN la_t
    ),
    la_diag AS (
      SELECT sum(n / t) AS sum_diag FROM la_mix CROSS JOIN la_t WHERE lx = ly
    ),
    la_nl AS (
      SELECT count(DISTINCT {label_col}) AS n_labels FROM {labels_cte}
    )
    SELECT round(CASE WHEN abs(1.0 - sum_ab) < 1e-12 THEN 1.0
                 ELSE (coalesce(sum_diag, 0.0) - sum_ab) / (1.0 - sum_ab)
                 END, 6) AS r,
           n_labels,
           round(coalesce(sum_diag, 0.0), 6) AS diag_frac
    FROM la_diag CROSS JOIN la_ab CROSS JOIN la_nl
    """


def ppr_sweep(
    graph: LinkGraph,
    seeds: list,
    iterations: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """→ ``[pos, id, phi]`` — the PageRank-Nibble sweep-cut curve
    (Andersen, Chung & Lang, FOCS 2006): run personalized PageRank from
    ``seeds``, order vertices by descending score, and report the
    conductance φ of every prefix of the top ``top_k`` — the standard
    local-community detector ("the best cluster around this seed is the
    prefix where φ bottoms out"). PPR scores come from the directed
    textbook walk (``kernels/pagerank.py``, engine default d=0.85);
    conductance is measured on the undirected simple graph with the same
    φ = cut/min(vol, 2m−vol) convention as :func:`conductance`. φ is NULL
    while the denominator is 0 (prefix of isolated vertices).

    Ordering is by the 6-dp-ROUNDED score then id, so the sweep order —
    and therefore the curve — is engine-portable (unrounded FP ties would
    let a 1e-16 sum-order wobble reorder the prefix).

    Scale shape: the PPR is the flagship gather kernel; the sweep itself
    touches each edge ONCE (one join against the top-k position table,
    then a ±1 difference-array aggregate keyed by prefix position) and
    the only windows are running sums over ≤ ``top_k`` rows — bounded by
    construction, never by data volume."""
    from linkgraph_spark.kernels.pagerank import pagerank
    from linkgraph_spark.kernels.triangles import _oriented

    res = pagerank(
        graph, mode="textbook", iterations=iterations, personalize_ids=list(seeds)
    )
    r6 = res.ranks.select("id", F.round("rank", 6).alias("r"))
    worder = Window.orderBy(F.desc("r"), F.asc("id"))
    pos_t = (
        r6.orderBy(F.desc("r"), F.asc("id"))
        .limit(top_k)  # TakeOrdered; the row_number window below is <= top_k rows
        .select("id", F.row_number().over(worder).alias("pos"))
        .persist()
    )
    und = _oriented(graph.edges)  # distinct a < b, no loops
    out = _sweep_curve(und, pos_t, top_k).localCheckpoint()
    pos_t.unpersist()
    return out


def _sweep_curve(und: DataFrame, pos_t: DataFrame, top_k: int) -> DataFrame:
    """→ lazy ``[pos, id, phi]`` — the conductance curve over the ordered
    prefix table ``pos_t = [id, pos]`` (pos 1..≤top_k) against the
    oriented simple edge list ``und = [a, b]`` (a < b). Shared by
    :func:`ppr_sweep` (PPR ordering) and
    ``kernels/spectral.fiedler_sweep`` (eigenvector ordering). One edge
    pass + running sums over ≤ top_k rows; the caller checkpoints."""
    m = und.count()
    big = 1 << 40
    pa = pos_t.select(F.col("id").alias("a"), F.col("pos").alias("pa"))
    pb = pos_t.select(F.col("id").alias("b"), F.col("pos").alias("pb"))
    ep = (
        und.join(pa, "a", "left")
        .join(pb, "b", "left")
        .select(
            F.least(
                F.coalesce("pa", F.lit(big)), F.coalesce("pb", F.lit(big))
            ).alias("mn"),
            F.greatest(
                F.coalesce("pa", F.lit(big)), F.coalesce("pb", F.lit(big))
            ).alias("mx"),
        )
    )
    # difference array: an edge is cut for prefixes mn <= k < mx
    # (one explode pass, not two filtered scans of the edge join)
    deltas = (
        ep.select(
            F.explode(
                F.array(
                    F.struct(F.col("mn").alias("pos"), F.lit(1).alias("delta")),
                    F.struct(F.col("mx").alias("pos"), F.lit(-1).alias("delta")),
                )
            ).alias("x")
        )
        .select("x.pos", "x.delta")
        .where(F.col("pos") <= top_k)
        .groupBy("pos")
        .agg(F.sum("delta").alias("d"))
    )
    degu = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    ws = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        pos_t.join(deltas, "pos", "left")
        .join(degu, "id", "left")
        .select(
            "pos",
            "id",
            F.sum(F.coalesce("d", F.lit(0))).over(ws).alias("cut"),
            F.sum(F.coalesce("deg", F.lit(0))).over(ws).alias("vol"),
        )
    )
    denom = F.least(F.col("vol"), F.lit(2 * m) - F.col("vol"))
    return sweep.select(
        "pos",
        "id",
        F.round(F.when(denom > 0, F.col("cut") / denom), 6).alias("phi"),
    )


def ppr_sweep_sql(
    seeds: list,
    iterations: int = 5,
    top_k: int = 50,
    d: float = 0.85,
) -> str:
    """DuckDB oracle body for :func:`ppr_sweep` (expects ``verts`` and
    ``edges`` CTEs in scope): the personalized-PageRank chain unrolled
    round-exactly (same teleport/dangling algebra as the engine), then
    the same rounded-score ordering and difference-array sweep."""
    n_seeds = len(list(seeds))
    seed_list = ", ".join(str(int(s)) for s in seeds)
    tele = f"(CASE WHEN r.id IN ({seed_list}) THEN 1.0 / {n_seeds} ELSE 0.0 END)"
    tele0 = f"(CASE WHEN id IN ({seed_list}) THEN 1.0 / {n_seeds} ELSE 0.0 END)"
    ctes = [
        """pps_od AS MATERIALIZED (
      SELECT v.id, coalesce(o.od, 0) AS out_deg
      FROM verts v LEFT JOIN (
        SELECT src AS id, count(*) AS od FROM edges GROUP BY src
      ) o ON o.id = v.id
    )""",
        f"pps_r0 AS (SELECT id, {tele0} AS rank FROM verts)",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""pps_dm{k} AS MATERIALIZED (
      SELECT coalesce(sum(r.rank), 0.0) AS m
      FROM pps_r{k - 1} r JOIN pps_od dg ON dg.id = r.id AND dg.out_deg = 0
    ),
    pps_r{k} AS MATERIALIZED (
      SELECT r.id,
             {tele} * ({1 - d:.17g} + {d} * pps_dm{k}.m)
               + {d} * coalesce(s.sm, 0.0) AS rank
      FROM pps_r{k - 1} r CROSS JOIN pps_dm{k}
      LEFT JOIN (
        SELECT e.dst AS id, sum(r2.rank / dg.out_deg) AS sm
        FROM edges e
        JOIN pps_r{k - 1} r2 ON e.src = r2.id
        JOIN pps_od dg ON dg.id = e.src
        GROUP BY e.dst
      ) s ON s.id = r.id
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""{body},
    pps_pos AS MATERIALIZED (
      SELECT id, pos FROM (
        SELECT id, row_number() OVER (ORDER BY round(rank, 6) DESC, id) AS pos
        FROM pps_r{iterations}
      ) WHERE pos <= {top_k}
    ),
    {_sweep_sql_tail("pps_pos", top_k, p="pps")}
    """


def _sweep_sql_tail(pos_cte: str, top_k: int, p: str = "pps") -> str:
    """CTE chain + final SELECT producing the ``[pos, id, phi]``
    conductance curve for a position CTE ``pos_cte = [id, pos]`` — the
    SQL twin of :func:`_sweep_curve` (expects ``edges`` in scope; ``p``
    prefixes the CTE names so two sweeps can't collide in one WITH)."""
    big = 1 << 40
    return f"""{p}_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    {p}_m AS (SELECT count(*) AS m FROM {p}_und),
    {p}_deg AS (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM {p}_und UNION ALL SELECT b AS id FROM {p}_und
      ) GROUP BY id
    ),
    {p}_ep AS (
      SELECT least(coalesce(pa.pos, {big}), coalesce(pb.pos, {big})) AS mn,
             greatest(coalesce(pa.pos, {big}), coalesce(pb.pos, {big})) AS mx
      FROM {p}_und e
      LEFT JOIN {pos_cte} pa ON pa.id = e.a
      LEFT JOIN {pos_cte} pb ON pb.id = e.b
    ),
    {p}_dif AS (
      SELECT pos, sum(delta) AS d FROM (
        SELECT mn AS pos, 1 AS delta FROM {p}_ep
        UNION ALL
        SELECT mx AS pos, -1 AS delta FROM {p}_ep
      ) WHERE pos <= {top_k} GROUP BY pos
    ),
    {p}_sweep AS (
      SELECT pp.pos, pp.id,
             sum(coalesce(f.d, 0)) OVER (ORDER BY pp.pos) AS cut,
             sum(coalesce(g.deg, 0)) OVER (ORDER BY pp.pos) AS vol
      FROM {pos_cte} pp
      LEFT JOIN {p}_dif f ON f.pos = pp.pos
      LEFT JOIN {p}_deg g ON g.id = pp.id
    )
    SELECT pos, id,
           CASE WHEN least(vol, 2 * m.m - vol) > 0
                THEN round(cut * 1.0 / least(vol, 2 * m.m - vol), 6)
           END AS phi
    FROM {p}_sweep CROSS JOIN {p}_m m"""


def degree_sweep(graph: LinkGraph, top_k: int = 50) -> DataFrame:
    """→ ``[pos, id, phi]`` — the degree-ordered sweep-cut baseline:
    conductance of every prefix of the top-``top_k`` vertices by
    undirected degree (ties by id). This is the null hypothesis the
    spectral and PPR sweeps must beat — if
    :func:`~linkgraph_spark.kernels.spectral.fiedler_sweep` or
    :func:`ppr_sweep` can't find a lower φ than "just take the hubs",
    the graph has no community structure their extra supersteps could
    exploit (and a hub-prefix φ near 0 flags a disconnected hub club).

    Scale shape: one degree aggregate + a k-row TakeOrdered position
    table, then the shared one-edge-pass difference-array sweep
    (:func:`_sweep_curve`) — windows bounded by ``top_k`` only.
    """
    from linkgraph_spark.kernels.triangles import _oriented

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    und = _oriented(graph.edges)
    degu = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    worder = Window.orderBy(F.desc("deg"), F.asc("id"))
    pos_t = (
        degu.orderBy(F.desc("deg"), F.asc("id"))
        .limit(top_k)
        .select("id", F.row_number().over(worder).alias("pos"))
        .persist()
    )
    out = _sweep_curve(und, pos_t, top_k).localCheckpoint()
    pos_t.unpersist()
    return out


def degree_sweep_sql(top_k: int = 50) -> str:
    """DuckDB oracle body for :func:`degree_sweep` (expects ``edges``
    in scope)."""
    K = int(top_k)
    return f"""dsw0_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    dsw0_deg AS (
      SELECT id, count(*) AS deg FROM (
        SELECT a AS id FROM dsw0_und UNION ALL SELECT b AS id FROM dsw0_und
      ) GROUP BY id
    ),
    dsw_pos AS MATERIALIZED (
      SELECT id, pos FROM (
        SELECT id, row_number() OVER (ORDER BY deg DESC, id) AS pos
        FROM dsw0_deg
      ) WHERE pos <= {K}
    ),
    {_sweep_sql_tail("dsw_pos", K, p="dsw")}
    """


def partition_quality(
    graph: LinkGraph, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """→ one row ``[communities, n, m, intra_edges, coverage, performance]``
    — the two classic partition scores modularity does not give (Fortunato
    2010 survey, public definitions), computed in closed form with NO pair
    enumeration:

      coverage    = intra-community edges / m
      performance = (correctly classified pairs) / C(n, 2)
                  = (m_intra + cross-pairs-without-edge) / C(n, 2)
                  = (2·m_intra − m + C(n,2) − Σ_c C(n_c, 2)) / C(n, 2)

    (a pair is "correct" if it is an intra-community edge or an
    inter-community non-edge).  The n² pair space reduces to exact integer
    moments: community sizes and one labeled-edge aggregate — DECIMAL/
    HUGEINT products so 10^9-vertex communities cannot overflow.
    ``coverage`` NULL on an edgeless graph; singleton partitions score
    performance = non-edge density honestly.  Scale: one O(V) size
    aggregate + two label joins on the O(E) edge list."""
    from linkgraph_spark.kernels.triangles import _oriented

    und = _oriented(graph.edges)
    lab = labels.select("id", F.col(label_col).alias("_c"))
    la = lab.select(F.col("id").alias("a"), F.col("_c").alias("ca"))
    lb = lab.select(F.col("id").alias("b"), F.col("_c").alias("cb"))
    el = und.join(la, "a").join(lb, "b")
    em = el.agg(
        F.count("*").cast("long").alias("m"),
        F.coalesce(
            F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("m_intra"),
    )
    dec = "decimal(38,0)"
    sizes = lab.groupBy("_c").agg(F.count("*").cast(dec).alias("nc"))
    sz = sizes.agg(
        F.count("*").cast("long").alias("communities"),
        F.coalesce(F.sum("nc"), F.lit(0)).cast(dec).alias("n"),
        F.coalesce(F.sum((F.col("nc") * (F.col("nc") - 1)) / 2), F.lit(0))
        .cast(dec)
        .alias("intra_pairs"),
    )
    return em.crossJoin(sz).select(
        "communities",
        F.col("n").cast("long").alias("n"),
        "m",
        F.col("m_intra").alias("intra_edges"),
        F.expr("CASE WHEN m > 0 THEN round(CAST(m_intra AS DOUBLE) / m, 6) END").alias(
            "coverage"
        ),
        F.expr(
            "CASE WHEN n >= 2 THEN round("
            " (2.0 * m_intra - m"
            "  + (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2"
            "     - CAST(intra_pairs AS DOUBLE)))"
            " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2), 6) END"
        ).alias("performance"),
    )


def partition_quality_sql(labels_cte: str, label_col: str = "label") -> str:
    """DuckDB oracle body for :func:`partition_quality` — ``labels_cte``
    names a CTE with ``[id, <label_col>]``; expects ``edges``."""
    return f"""
    pq_und AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
      WHERE src <> dst GROUP BY 1, 2
    ),
    pq_em AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(coalesce(sum(CASE WHEN la.{label_col} = lb.{label_col}
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_intra
      FROM pq_und e
      JOIN {labels_cte} la ON la.id = e.a
      JOIN {labels_cte} lb ON lb.id = e.b
    ),
    pq_sz AS (
      SELECT CAST(count(*) AS BIGINT) AS communities,
             CAST(coalesce(sum(nc), 0) AS HUGEINT) AS n,
             coalesce(sum(nc * (nc - 1) // 2), 0) AS intra_pairs
      FROM (
        SELECT CAST(count(*) AS HUGEINT) AS nc
        FROM {labels_cte} GROUP BY {label_col}
      )
    )
    SELECT communities,
           CAST(n AS BIGINT) AS n,
           m,
           m_intra AS intra_edges,
           CASE WHEN m > 0 THEN round(CAST(m_intra AS DOUBLE) / m, 6) END
             AS coverage,
           CASE WHEN n >= 2 THEN round(
             (2.0 * m_intra - m
              + (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2
                 - CAST(intra_pairs AS DOUBLE)))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2), 6) END
             AS performance
    FROM pq_em CROSS JOIN pq_sz
    """
