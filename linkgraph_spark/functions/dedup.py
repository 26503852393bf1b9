"""Deduplication operators over the ``documents`` table.

Five dedup families, each Spark-first and (where feasible) DuckDB-mirrored:

- **exact**: md5 of normalized text → keep min doc_id per group. One
  hash-shuffle; at 100 TB this is the cheapest possible dedup (group key is
  a 128-bit digest, partial agg combines map-side).
- **n-gram Jaccard**: word-3-gram shingle sets, candidate pairs via a
  shared-shingle equi-join, exact Jaccard filter. The shingle join is the
  scalable path: it only materializes pairs that share evidence, never the
  O(n²) cross product.
- **MinHash + LSH**: k=16 signature from a fixed universal hash family over
  shingle hashes, banded 4×4; candidate pairs = same (band, band-hash)
  bucket; verified with exact Jaccard. At scale this bounds candidate
  generation to bucket-local self-joins (the classic shuffle-friendly LSH).
- **SimHash**: 32-bit sign fingerprint of token hash bits; near-dups =
  pairs within Hamming distance ≤ 3 (verified pairwise here; at scale the
  standard trick — split the 32 bits into 4 bands of 8 and bucket-join —
  applies unchanged).
- **embedding near-dup**: cosine ≥ threshold over the embeddings table
  (see ``similarity.py`` for the dot-product machinery).

All hashing is the engine-portable md5/affine family (``hashing.py``) so
DuckDB replays every step bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.functions.hashing import (
    MERSENNE_P,
    affine_mod,
    affine_mod_sql,
    hash_params,
    md5_long,
    md5_long_sql,
)

MINHASH_K = 16
BANDS = 4
ROWS_PER_BAND = 4


# --------------------------------------------------------------------- exact
def exact_dedup(documents: DataFrame) -> DataFrame:
    """→ [doc_id, keeper_id, group_size]: every doc mapped to the minimum
    doc_id holding identical normalized text."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = documents.select("doc_id", F.md5(norm).alias("content_fp"))
    groups = fp.groupBy("content_fp").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("group_size")
    )
    return fp.join(groups, "content_fp").select("doc_id", "keeper_id", "group_size")


def exact_dedup_sql(table: str = "documents") -> str:
    return f"""
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_fp
      FROM {table}
    ), groups AS (
      SELECT content_fp, min(doc_id) AS keeper_id, count(*) AS group_size
      FROM fp GROUP BY content_fp
    )
    SELECT fp.doc_id, groups.keeper_id, groups.group_size
    FROM fp JOIN groups USING (content_fp)
    """


# ------------------------------------------------------------------ shingles
def _with_shingle_hashes(documents: DataFrame) -> DataFrame:
    """→ [doc_id, sh: array<long>] distinct word-3-gram shingle hashes.

    Documents shorter than 3 tokens use the whole text as one shingle."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = documents.select("doc_id", norm.alias("norm")).withColumn(
        "toks", F.split("norm", " ")
    )
    shingles = F.when(
        F.size("toks") < 3, F.array(F.col("norm"))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.array_join(F.slice("toks", i, F.lit(3)), " "),
        )
    )
    sh = F.array_distinct(F.transform(shingles, lambda s: md5_long(s) % F.lit(MERSENNE_P)))
    return d.select("doc_id", sh.alias("sh"))


_SHINGLES_SQL = """
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               CASE WHEN len(toks) < 3 THEN [norm]
                    ELSE list_transform(range(1, len(toks) - 1),
                                        i -> array_to_string(toks[i:i+2], ' '))
               END,
               s -> {h} % {p})) AS sh
      FROM (
        SELECT doc_id, norm, string_split(norm, ' ') AS toks
        FROM (SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
              FROM {table})
      )
    )
"""


def _shingles_sql(table: str = "documents") -> str:
    return _SHINGLES_SQL.format(h=md5_long_sql("s"), p=MERSENNE_P, table=table)


# ---------------------------------------------------------- pairwise verify
def _verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs — joins the (doc_a, doc_b) pairs
    back to the per-doc shingle *arrays* and intersects in-memory
    (``array_intersect``), so the verification cost is O(candidates), never
    a re-enumeration of all shared-shingle pairs. Shared by the n-gram and
    MinHash-LSH dedup paths."""
    sh_a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.size("sh").alias("na")
    )
    sh_b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.size("sh").alias("nb")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------- ngram jaccard
def ngram_jaccard_dups(
    documents: DataFrame, threshold: float = 0.5, max_doc_freq: int | None = None
) -> DataFrame:
    """→ [doc_a, doc_b, jaccard] for pairs with 3-gram Jaccard ≥ threshold.

    Candidates come from a shared-shingle equi-join (shuffle on shingle
    hash), never a cross join. ``max_doc_freq`` caps the document frequency
    of shingles allowed to *generate candidates* (a stopword shingle shared
    by k docs otherwise fans out k² pairs — the quadratic-reducer trap at
    100 TB); verification still uses the full shingle arrays, so Jaccard
    values of emitted pairs are exact. With the cap, pairs whose ONLY shared
    shingles are hot are missed (standard recall/cost trade; default None =
    exact).
    """
    sh = _with_shingle_hashes(documents).persist()
    flat = sh.select("doc_id", F.explode("sh").alias("s"))
    if max_doc_freq is not None:
        keep = (
            flat.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("s")
        )
        flat = flat.join(keep, "s", "left_semi")
    cand = (
        flat.withColumnRenamed("doc_id", "doc_a")
        .join(flat.withColumnRenamed("doc_id", "doc_b"), "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(cand, sh, threshold)


def ngram_jaccard_sql(
    table: str = "documents",
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> str:
    """DuckDB mirror of :func:`ngram_jaccard_dups`, including the
    ``max_doc_freq`` candidate cap (candidates from capped shingles only;
    Jaccard of emitted pairs still exact over the FULL shingle sets)."""
    if max_doc_freq is None:
        cand_ctes, cand_join = "", ""
    else:
        cand_ctes = f"""
    kept AS (
      SELECT s FROM (SELECT s, count(*) AS c FROM flat GROUP BY s)
      WHERE c <= {max_doc_freq}
    ),
    cflat AS (SELECT doc_id, s FROM flat JOIN kept USING (s)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM cflat a JOIN cflat b ON a.s = b.s AND a.doc_id < b.doc_id
    ),"""
        cand_join = "JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id"
    return f"""
    WITH {_shingles_sql(table)},
    flat AS (SELECT doc_id, unnest(sh) AS s FROM sh),{cand_ctes}
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM flat a JOIN flat b ON a.s = b.s AND a.doc_id < b.doc_id
      {cand_join}
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE inter / CAST(sa.n + sb.n - inter AS DOUBLE) >= {threshold}
    """


# --------------------------------------------------------------- minhash+lsh
def _min_affine(a: int, b: int):
    """Unary lambda factory (PySpark inspects lambda arity — default-arg
    tricks would make it look like a 3-ary lambda)."""
    return F.array_min(F.transform("sh", lambda x: affine_mod(x, a, b)))


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """→ [doc_id, sig: array<long>] k=16 MinHash signature."""
    sh = _with_shingle_hashes(documents)
    sig = F.array(*[_min_affine(a, b) for a, b in hash_params(MINHASH_K)])
    return sh.select("doc_id", sig.alias("sig"))


def minhash_lsh_dups(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """→ [doc_a, doc_b, jaccard]: LSH-banded candidates verified exactly.

    Banding: 4 bands × 4 rows; a pair is a candidate iff some band of their
    signatures is identical. Candidates are then verified with the exact
    shingle-set Jaccard, so LSH affects only recall/cost, not precision.
    """
    sh = _with_shingle_hashes(documents).persist()
    sig_cols = [_min_affine(a, b) for a, b in hash_params(MINHASH_K)]
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "_", *[c.cast("string") for c in sig_cols[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]]
                )
            )
            for b in range(BANDS)
        ]
    )
    banded = sh.select("doc_id", F.posexplode(bands).alias("band", "bh"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # verification is O(candidates) via array_intersect — NOT the
    # all-shared-shingle-pairs join LSH exists to avoid
    return _verify_jaccard(cand, sh, threshold)


def minhash_lsh_sql(table: str = "documents", threshold: float = 0.5) -> str:
    sig_exprs = [
        f"list_min(list_transform(sh, x -> {affine_mod_sql('x', a, b)}))"
        for a, b in hash_params(MINHASH_K)
    ]
    band_exprs = [
        "md5(concat_ws('_', "
        + ", ".join(
            f"CAST({sig_exprs[b * ROWS_PER_BAND + r]} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        + "))"
        for b in range(BANDS)
    ]
    banded_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {expr} AS bh FROM sh"
        for b, expr in enumerate(band_exprs)
    )
    return f"""
    WITH {_shingles_sql(table)},
    banded AS (
      {banded_selects}
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
    ),
    flat AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM flat a JOIN flat b ON a.s = b.s AND a.doc_id < b.doc_id
      JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE inter / CAST(sa.n + sb.n - inter AS DOUBLE) >= {threshold}
    """


# -------------------------------------------------------- near-dup clusters
def near_dup_clusters(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """→ [doc_id, keeper_id, cluster_size]: near-duplicate CLUSTERS — the
    transitive closure of the MinHash-LSH pair relation — with one keeper
    (min doc_id) per cluster, covering every document (non-duplicates are
    their own singleton cluster).

    This is the operator a real dedup pipeline actually applies (pairs
    alone can't drop rows: A~B and B~C must collapse to ONE keeper even if
    A~C was never emitted). Composition of two engine pieces at their
    native scale: the LSH pair generation (banded equi-joins) feeds the
    hash-min connected-components kernel (O(pair-graph diameter) supersteps;
    duplicate chains are short in practice).
    """
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels.components import connected_components

    spark = documents.sparkSession
    pairs = minhash_lsh_dups(documents, threshold).select("doc_a", "doc_b")
    g = graph_from_edges(spark, pairs)
    cc = connected_components(g)
    if not cc.converged:
        # split clusters (several keepers for one transitive group) are the
        # exact failure the converged flag exists to catch — refuse loudly
        raise RuntimeError(
            f"near_dup_clusters: components did not converge in "
            f"{cc.iterations} supersteps; raise max_iterations"
        )
    labels = cc.labels  # component = min member id
    sizes = labels.groupBy("component").agg(F.count("*").alias("cluster_size"))
    clustered = labels.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("keeper_id"),
        "cluster_size",
    )
    out = (
        documents.select("doc_id")
        .join(clustered, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("keeper_id", F.col("doc_id")).alias("keeper_id"),
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
        )
    )
    g.unpersist()
    return out


def _pair_closure_ctes(pair_sql: str, unroll: int) -> str:
    """CTE chain: ``pairs`` (from ``pair_sql``) → ``pverts``/``pund`` →
    hash-min closure ``c0..c{unroll}``. Shared by the cluster oracle and
    the chain audit so the two can never diverge on closure semantics."""
    ctes = [
        f"pairs AS MATERIALIZED ({pair_sql})",
        """pverts AS MATERIALIZED (
      SELECT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs
    )""",
        """pund AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    )""",
        "c0 AS (SELECT id, id AS component FROM pverts)",
    ]
    for k in range(1, unroll + 1):
        ctes.append(
            f"""c{k} AS MATERIALIZED (
      SELECT c.id,
             least(c.component, coalesce(m.mn, c.component)) AS component
      FROM c{k - 1} c
      LEFT JOIN (
        SELECT pund.a AS id, min(c2.component) AS mn
        FROM pund JOIN c{k - 1} c2 ON pund.b = c2.id
        GROUP BY pund.a
      ) m ON m.id = c.id
    )"""
        )
    return ",\n    ".join(ctes)


def near_dup_clusters_sql(
    table: str = "documents", threshold: float = 0.5, unroll: int = 40
) -> str:
    """DuckDB oracle: the MinHash pair SQL + unrolled hash-min closure.

    ``unroll`` must cover the pair-graph diameter or the ORACLE
    under-converges and red-flags a correct engine result (the Spark side
    raises on non-convergence; static SQL can't) — hence the 40-round
    margin over any realistic duplicate-chain diameter."""
    body = _pair_closure_ctes(minhash_lsh_sql(table, threshold), unroll)
    return f"""
    WITH {body},
    sizes AS (
      SELECT component, count(*) AS cluster_size FROM c{unroll} GROUP BY component
    )
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS keeper_id,
           coalesce(s.cluster_size, 1) AS cluster_size
    FROM {table} d
    LEFT JOIN c{unroll} c ON c.id = d.doc_id
    LEFT JOIN sizes s ON s.component = c.component
    """


# ------------------------------------------------------------------- simhash
SIMHASH_BITS = 32


def simhash(documents: DataFrame) -> DataFrame:
    """→ [doc_id, simhash: long] 32-bit sign fingerprint over distinct-token
    hashes (bit i set iff Σ_tokens (2·bit_i(h(token)) − 1) > 0)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = documents.select("doc_id", norm.alias("norm"))
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("norm", " "))).alias("t"),
    ).withColumn("h", md5_long(F.col("t")))
    aggs = [
        F.sum(
            (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    sums = tok.groupBy("doc_id").agg(*aggs)
    bits = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return sums.select("doc_id", bits.cast("long").alias("simhash"))


def simhash_sql(table: str = "documents") -> str:
    sum_cols = ", ".join(
        f"sum(((h // {2 ** i}) % 2) * 2 - 1) AS s{i}" for i in range(SIMHASH_BITS)
    )
    bit_sum = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {2 ** i} ELSE 0 END)" for i in range(SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(norm, ' '))) AS t
      FROM (SELECT doc_id,
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
            FROM {table})
    ), hashed AS (
      SELECT doc_id, {md5_long_sql('t')} AS h FROM toks
    ), sums AS (
      SELECT doc_id, {sum_cols} FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({bit_sum} AS BIGINT) AS simhash FROM sums
    """


def simhash_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """→ [doc_a, doc_b, hamming]: pairs within Hamming ≤ max_hamming.

    Banded, no cross product: the 32 fingerprint bits are split into
    ``max_hamming + 1`` bands; by pigeonhole, a pair differing in ≤
    max_hamming bits agrees *exactly* on at least one whole band, so the
    band equi-join generates a candidate superset and the exact Hamming
    filter keeps output identical to the all-pairs definition. One shuffle
    on (band, band_value); candidate volume is bucket-local.
    """
    n_bands = max_hamming + 1
    width = -(-SIMHASH_BITS // n_bands)  # ceil: 4 bands of 8 for the default
    mask = (1 << width) - 1
    s = simhash(documents)
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).cast("long")
            for b in range(n_bands)
        ]
    )
    banded = s.select("doc_id", "simhash", F.posexplode(bands).alias("band", "bv"))
    x = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "band", "bv"
    )
    y = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "band", "bv"
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        x.join(y, ["band", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may agree on several bands
    )


def simhash_dups_sql(table: str = "documents", max_hamming: int = 3) -> str:
    return f"""
    WITH s AS ({simhash_sql(table)})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def dedup_corpus(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """→ [doc_id, cluster_size]: the deduplicated corpus — ONLY the keeper
    document of every near-dup cluster (singletons keep themselves). This is
    the row-dropping step a training pipeline actually applies after
    :func:`near_dup_clusters`; cluster_size says how many raw docs each
    surviving row represents (dedup weight for loss re-weighting)."""
    clusters = near_dup_clusters(documents, threshold)
    return clusters.where(F.col("doc_id") == F.col("keeper_id")).select(
        "doc_id", "cluster_size"
    )


def dedup_corpus_sql(table: str = "documents", threshold: float = 0.5) -> str:
    return f"""
    SELECT doc_id, cluster_size
    FROM ({near_dup_clusters_sql(table, threshold)})
    WHERE doc_id = keeper_id
    """


# ------------------------------------------------------- decontamination
def contamination_check(
    documents: DataFrame, benchmark: DataFrame, min_shared: int = 2
) -> DataFrame:
    """→ [doc_id, shared_shingles, bench_docs] — training-data
    DECONTAMINATION: corpus documents sharing ≥ ``min_shared`` distinct
    word-3-gram shingles with any document of the ``benchmark`` frame
    (``[doc_id, text]`` — the eval set that must not leak into training).
    ``shared_shingles`` counts distinct contaminated shingles,
    ``bench_docs`` the distinct benchmark documents hit. A document never
    matches itself (same doc_id), so a benchmark drawn from the corpus
    flags only its copies/near-copies.

    Plan shape: both sides reuse the dedup shingle machinery
    (:func:`_with_shingle_hashes` — explode to (shingle, doc) rows), then
    ONE equi-join on the shingle hash + a per-doc distinct-count agg.
    The benchmark side is small by construction (decontamination's whole
    premise), so the join broadcast-eligibly bounds each shingle's fanout
    at its benchmark multiplicity — no hot-shingle quadratic blowup on
    the corpus side, unlike corpus-self-join dedup."""
    corpus = _with_shingle_hashes(documents).select(
        "doc_id", F.explode("sh").alias("s")
    )
    bench = _with_shingle_hashes(benchmark).select(
        F.col("doc_id").alias("bench_id"), F.explode("sh").alias("s")
    )
    return (
        corpus.join(bench, "s")
        .where(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("shared_shingles"),
            F.countDistinct("bench_id").alias("bench_docs"),
        )
        .where(F.col("shared_shingles") >= min_shared)
    )


def contamination_check_sql(
    table: str = "documents",
    bench_filter: str = "doc_id % 97 = 0",
    min_shared: int = 2,
) -> str:
    """DuckDB mirror of :func:`contamination_check` with the benchmark
    drawn from ``table`` by ``bench_filter`` (the gate's pseudo-benchmark
    rule)."""
    return f"""
    WITH {_shingles_sql(table)},
    ct_corpus AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    ct_bench AS (
      SELECT doc_id AS bench_id, unnest(sh) AS s
      FROM sh WHERE {bench_filter}
    )
    SELECT c.doc_id,
           count(DISTINCT c.s) AS shared_shingles,
           count(DISTINCT b.bench_id) AS bench_docs
    FROM ct_corpus c JOIN ct_bench b USING (s)
    WHERE c.doc_id <> b.bench_id
    GROUP BY c.doc_id
    HAVING count(DISTINCT c.s) >= {min_shared}
    """


def prefix_dup_pairs(
    documents: DataFrame, prefix_len: int = 40, bucket_cap: int = 64
) -> DataFrame:
    """→ ``[doc_a, doc_b, relation]`` — candidate duplicate pairs that
    share their first ``prefix_len`` characters, classified as ``'exact'``
    (identical text), ``'contains'`` (one document is a strict prefix of
    the other — the truncated-page / re-crawl artifact every web corpus
    carries), or ``'shared_prefix'`` (same opening, divergent bodies —
    typical template boilerplate). ``doc_a < doc_b``; NULL text is treated
    as empty.

    Scale shape: candidates come from an equi-join on the prefix bucket
    key — never an all-pairs scan. Buckets larger than ``bucket_cap``
    (site-wide boilerplate prefixes, the one skew risk) are dropped
    entirely before the join, bounding any bucket's fan-out at
    C(cap, 2); the verify step is a length compare plus one
    ``startswith`` per surviving candidate, O(candidates).
    """
    txt = F.coalesce(F.col("text"), F.lit(""))
    pf = documents.select(
        "doc_id",
        txt.alias("t"),
        F.length(txt).alias("n"),
        F.substring(txt, 1, prefix_len).alias("pfx"),
    )
    ok = (
        pf.groupBy("pfx")
        .agg(F.count("*").alias("_bn"))
        .where((F.col("_bn") > 1) & (F.col("_bn") <= bucket_cap))
        .select("pfx")
    )
    pf = pf.join(ok, "pfx")
    a = pf.select(
        "pfx",
        F.col("doc_id").alias("doc_a"),
        F.col("t").alias("ta"),
        F.col("n").alias("na"),
    )
    b = pf.select(
        "pfx",
        F.col("doc_id").alias("doc_b"),
        F.col("t").alias("tb"),
        F.col("n").alias("nb"),
    )
    shorter = F.when(F.col("na") <= F.col("nb"), F.col("ta")).otherwise(F.col("tb"))
    longer = F.when(F.col("na") <= F.col("nb"), F.col("tb")).otherwise(F.col("ta"))
    rel = (
        F.when((F.col("na") == F.col("nb")) & (F.col("ta") == F.col("tb")), "exact")
        .when(longer.startswith(shorter), "contains")
        .otherwise("shared_prefix")
    )
    return (
        a.join(b, "pfx")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", rel.alias("relation"))
    )


def prefix_dup_pairs_sql(
    table: str = "documents", prefix_len: int = 40, bucket_cap: int = 64
) -> str:
    """DuckDB oracle for :func:`prefix_dup_pairs` (standalone query)."""
    return f"""
    WITH pd AS (
      SELECT doc_id, coalesce(text, '') AS t, length(coalesce(text, '')) AS n,
             substr(coalesce(text, ''), 1, {int(prefix_len)}) AS pfx
      FROM {table}
    ), pdok AS (
      SELECT pfx FROM pd GROUP BY pfx
      HAVING count(*) > 1 AND count(*) <= {int(bucket_cap)}
    ), pdk AS (
      SELECT pd.* FROM pd JOIN pdok USING (pfx)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CASE
             WHEN a.n = b.n AND a.t = b.t THEN 'exact'
             WHEN starts_with(
               CASE WHEN a.n <= b.n THEN b.t ELSE a.t END,
               CASE WHEN a.n <= b.n THEN a.t ELSE b.t END
             ) THEN 'contains'
             ELSE 'shared_prefix'
           END AS relation
    FROM pdk a JOIN pdk b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
    """


def shingle_novelty(documents: DataFrame) -> DataFrame:
    """→ ``[doc_id, n_shingles, novel_frac]`` — the fraction of each
    document's distinct word-3-gram shingles that appear in NO other
    document (corpus novelty: boilerplate-heavy docs score near 0,
    genuinely new content near 1 — the inverse view of the duplicate
    passes, useful as a curation feature rather than a drop rule).
    Shares the MinHash/Jaccard shingle pipeline exactly.

    Plan shape: one shingle explode → a shingle document-frequency
    aggregate (map-side combinable; shingle space is corpus-bounded like
    the vocabulary) → rejoin on the shingle key → one per-doc aggregate.
    Novelty is flagged by df = 1, so the join carries one boolean per
    (doc, shingle) — no pair enumeration anywhere.
    """
    sh = _with_shingle_hashes(documents)
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count("*").alias("df"))
    return (
        ex.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                * 1.0
                / F.count("*"),
                6,
            ).alias("novel_frac"),
        )
    )


def shingle_novelty_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`shingle_novelty` (standalone query)."""
    return f"""
    WITH {_shingles_sql(table)},
    sn_ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    sn_df AS (SELECT s, count(*) AS df FROM sn_ex GROUP BY s)
    SELECT e.doc_id, count(*) AS n_shingles,
           round(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS novel_frac
    FROM sn_ex e JOIN sn_df d USING (s)
    GROUP BY e.doc_id
    """


def source_overlap(documents: DataFrame) -> DataFrame:
    """→ [source_x, source_y, n_shared, frac_x] — cross-SOURCE shingle
    contamination matrix: for every ordered pair of distinct ``source``
    values, the number of distinct word-3-gram shingles they share and
    the fraction of source x's shingle vocabulary that y also contains.
    The corpus-level companion to :func:`contamination_check` (doc vs
    benchmark): run it before mixing crawls/dumps to see which sources
    are near-copies of each other (mirror sites, re-crawls, laundered
    dumps) and would silently over-weight their content.

    Scale shape: the corpus collapses to distinct (source, shingle) in
    one map-side-combinable pass; the pair join fans out each shingle to
    at most |sources|² rows — sources are curation-bucket scale (tens to
    hundreds), so the join output is Σ_s k_s² ≤ |sources|·|rows|, linear
    in the input for bounded source counts. The per-source size table
    broadcasts. No doc-pair enumeration anywhere.
    """
    sh = _with_shingle_hashes(documents).join(
        documents.select("doc_id", "source"), "doc_id"
    )
    ss = sh.select("source", F.explode("sh").alias("s")).distinct()
    sizes = ss.groupBy("source").agg(F.count("*").alias("_n"))
    pairs = (
        ss.select(F.col("source").alias("source_x"), "s")
        .join(ss.select(F.col("source").alias("source_y"), "s"), "s")
        .where(F.col("source_x") != F.col("source_y"))
        .groupBy("source_x", "source_y")
        .agg(F.count("*").alias("n_shared"))
    )
    return pairs.join(
        F.broadcast(sizes.select(F.col("source").alias("source_x"), "_n")),
        "source_x",
    ).select(
        "source_x",
        "source_y",
        "n_shared",
        F.round(F.col("n_shared") * 1.0 / F.col("_n"), 6).alias("frac_x"),
    )


def source_overlap_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`source_overlap` (standalone query)."""
    return f"""
    WITH {_shingles_sql(table)},
    so_ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    so_ss AS (
      SELECT DISTINCT d.source, e.s
      FROM so_ex e JOIN {table} d USING (doc_id)
    ),
    so_sizes AS (SELECT source, count(*) AS n FROM so_ss GROUP BY source),
    so_pairs AS (
      SELECT a.source AS source_x, b.source AS source_y, count(*) AS n_shared
      FROM so_ss a JOIN so_ss b ON a.s = b.s AND a.source <> b.source
      GROUP BY 1, 2
    )
    SELECT p.source_x, p.source_y, p.n_shared,
           round(p.n_shared * 1.0 / z.n, 6) AS frac_x
    FROM so_pairs p JOIN so_sizes z ON z.source = p.source_x
    """


def minhash_band_sweep(
    documents: DataFrame,
    threshold: float = 0.5,
    configs: tuple[tuple[int, int], ...] = ((2, 8), (4, 4), (8, 2)),
) -> DataFrame:
    """→ ``[bands, rows_per_band, n_candidates, n_dups, precision]`` — one
    row per LSH banding configuration over the SAME k=16 MinHash
    signature: how many candidate pairs the banding emits, how many
    survive exact-Jaccard verification at ``threshold``, and the implied
    candidate precision. This is the tuning table every LSH deployment
    needs before a 100 TB run: bands trade verify cost (candidates) for
    recall, and the sweep measures that trade on the corpus itself
    instead of the iid s-curve formula. Because the band boundaries are
    aligned slices of one signature, candidate sets are NESTED:
    (2 bands of 8) ⊆ (4 of 4) ⊆ (8 of 2).

    Scale shape: per config, the same banded bucket equi-join as
    :func:`minhash_lsh_dups` (never all-pairs) + O(candidates) array
    verification, each reduced to a single counters row — the sweep
    output is ``len(configs)`` rows regardless of corpus size. The
    shingle table is computed once and reused across configs.
    """
    if not configs:
        raise ValueError("minhash_band_sweep needs at least one (bands, rows) config")
    sh = _with_shingle_hashes(documents).persist()
    out = _band_sweep_frame(sh, threshold, configs)
    # the result is len(configs) counter rows — materialize it eagerly so
    # the shingle cache can be released instead of pinning executor memory
    # for the session lifetime (rich_club pattern: localCheckpoint the tiny
    # frame, then unpersist the big parent)
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def _band_sweep_frame(sh: DataFrame, threshold: float, configs) -> DataFrame:
    """The LAZY sweep plan over a shingle table — kept separate from the
    persist/checkpoint lifecycle so the plan-shape tests can assert on the
    shipped plan (the checkpointed result prints as Scan ExistingRDD)."""
    sig_cols = [_min_affine(a, b) for a, b in hash_params(MINHASH_K)]
    out = None
    for n_bands, n_rows in configs:
        if n_bands * n_rows != MINHASH_K:
            raise ValueError(f"bands*rows must equal {MINHASH_K}, got {n_bands}x{n_rows}")
        bands = F.array(
            *[
                F.md5(
                    F.concat_ws(
                        "_",
                        *[
                            c.cast("string")
                            for c in sig_cols[b * n_rows : (b + 1) * n_rows]
                        ],
                    )
                )
                for b in range(n_bands)
            ]
        )
        banded = sh.select("doc_id", F.posexplode(bands).alias("band", "bh"))
        cand = (
            banded.alias("x")
            .join(banded.alias("y"), ["band", "bh"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
            .distinct()
        )
        nc = cand.agg(F.count("*").alias("n_candidates"))
        nd = _verify_jaccard(cand, sh, threshold).agg(F.count("*").alias("n_dups"))
        row = nc.crossJoin(nd).select(
            F.lit(n_bands).alias("bands"),
            F.lit(n_rows).alias("rows_per_band"),
            "n_candidates",
            "n_dups",
            F.round(
                F.when(
                    F.col("n_candidates") > 0,
                    F.col("n_dups") * 1.0 / F.col("n_candidates"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("precision"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def minhash_band_sweep_sql(
    table: str = "documents",
    threshold: float = 0.5,
    configs: tuple[tuple[int, int], ...] = ((2, 8), (4, 4), (8, 2)),
) -> str:
    """DuckDB oracle for :func:`minhash_band_sweep` — the signature/band
    arithmetic is the engine-portable affine family, the shared-shingle
    intersection table is computed once and reused by every config."""
    sig_exprs = [
        f"list_min(list_transform(sh, x -> {affine_mod_sql('x', a, b)}))"
        for a, b in hash_params(MINHASH_K)
    ]
    ctes = []
    selects = []
    for i, (n_bands, n_rows) in enumerate(configs):
        if n_bands * n_rows != MINHASH_K:
            raise ValueError(f"bands*rows must equal {MINHASH_K}, got {n_bands}x{n_rows}")
        banded_selects = "\n        UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, md5(concat_ws('_', "
            + ", ".join(
                f"CAST(s{b * n_rows + r} AS VARCHAR)" for r in range(n_rows)
            )
            + ")) AS bh FROM mbs_sig"
            for b in range(n_bands)
        )
        ctes.append(
            f"""mbs_banded_{i} AS (
        {banded_selects}
    ),
    mbs_cand_{i} AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM mbs_banded_{i} x JOIN mbs_banded_{i} y
        ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
    ),
    mbs_nc_{i} AS (SELECT count(*) AS n FROM mbs_cand_{i}),
    mbs_nd_{i} AS (
      SELECT count(*) AS n
      FROM mbs_cand_{i} c
      JOIN mbs_inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN mbs_sizes sa ON sa.doc_id = c.doc_a
      JOIN mbs_sizes sb ON sb.doc_id = c.doc_b
      WHERE round(i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE), 6)
              >= {threshold}
    )"""
        )
        selects.append(
            f"""SELECT {n_bands} AS bands, {n_rows} AS rows_per_band,
           (SELECT n FROM mbs_nc_{i}) AS n_candidates,
           (SELECT n FROM mbs_nd_{i}) AS n_dups,
           round(CASE WHEN (SELECT n FROM mbs_nc_{i}) > 0
                      THEN (SELECT n FROM mbs_nd_{i}) * 1.0
                           / (SELECT n FROM mbs_nc_{i})
                      ELSE 0.0 END, 6) AS "precision\""""
        )
    cte_sql = ",\n    ".join(ctes)
    union_sql = "\n    UNION ALL\n    ".join(selects)
    sig_select = ", ".join(f"{e} AS s{j}" for j, e in enumerate(sig_exprs))
    return f"""
    WITH {_shingles_sql(table)},
    mbs_sig AS MATERIALIZED (
      SELECT doc_id, {sig_select} FROM sh
    ),
    mbs_flat AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    mbs_sizes AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM sh),
    mbs_inter AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM mbs_flat a JOIN mbs_flat b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    {cte_sql}
    {union_sql}
    """


# ----------------------------------------------------------- containment
def shingle_containment(
    documents: DataFrame, threshold: float = 0.8, max_doc_freq: int | None = None
) -> DataFrame:
    """→ ``[doc_a, doc_b, containment]`` — DIRECTED near-dup detection by
    Broder containment ``|A∩B| / |A|`` over the shared 3-gram shingle
    sets: doc_a is (nearly) CONTAINED in doc_b. The asymmetric
    complement of :func:`ngram_jaccard_dups` — a quote, excerpt, or
    boilerplate-wrapped copy scores ≈1 here while its symmetric Jaccard
    stays low (the big set's size drowns the intersection), so this is
    the filter that catches doc-inside-doc duplication a Jaccard
    threshold misses. Both directions are emitted when both clear the
    threshold; exact-duplicate pairs score 1.0 both ways.

    Plan shape: identical to the Jaccard path — shared-shingle
    equi-join candidates (``max_doc_freq`` caps hot shingles' candidate
    fan-out, the k² reducer trap), then O(candidates)
    ``array_intersect`` verification. The only difference is the
    directed pair predicate (a ≠ b, both orders) and the |A|
    denominator.
    """
    sh = _with_shingle_hashes(documents).persist()
    flat = sh.select("doc_id", F.explode("sh").alias("s"))
    if max_doc_freq is not None:
        keep = (
            flat.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("s")
        )
        flat = flat.join(keep, "s", "left_semi")
    cand = (
        flat.withColumnRenamed("doc_id", "doc_a")
        .join(flat.withColumnRenamed("doc_id", "doc_b"), "s")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh_a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.size("sh").alias("na")
    )
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    cont = F.size(F.array_intersect("sh_a", "sh_b")) / F.col("na")
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
        .where(F.col("containment") >= threshold)
    )


def shingle_containment_sql(
    table: str = "documents",
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> str:
    """DuckDB mirror of :func:`shingle_containment` (directed pairs, |A|
    denominator; same candidate cap semantics as the Jaccard oracle)."""
    if max_doc_freq is None:
        cand_ctes, cand_join = "", ""
    else:
        cand_ctes = f"""
    sc_kept AS (
      SELECT s FROM (SELECT s, count(*) AS c FROM sc_flat GROUP BY s)
      WHERE c <= {max_doc_freq}
    ),
    sc_cflat AS (SELECT doc_id, s FROM sc_flat JOIN sc_kept USING (s)),
    sc_cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sc_cflat a JOIN sc_cflat b ON a.s = b.s AND a.doc_id <> b.doc_id
    ),"""
        cand_join = "JOIN sc_cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id"
    return f"""
    WITH {_shingles_sql(table)},
    sc_flat AS (SELECT doc_id, unnest(sh) AS s FROM sh),{cand_ctes}
    sc_sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    sc_inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sc_flat a JOIN sc_flat b ON a.s = b.s AND a.doc_id <> b.doc_id
      {cand_join}
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(inter / CAST(sa.n AS DOUBLE), 6) AS containment
    FROM sc_inter
    JOIN sc_sizes sa ON sa.doc_id = doc_a
    WHERE round(inter / CAST(sa.n AS DOUBLE), 6) >= {threshold}
    """


def dup_cluster_sizes(documents: DataFrame) -> DataFrame:
    """→ ``[group_size, n_groups, n_docs]`` — the exact-duplicate
    multiplicity histogram: for every identical-content group size, how
    many groups have it and how many documents they hold. The shape
    report behind :func:`exact_dedup`'s row-level mapping — size-1 mass
    is the unique corpus, a fat tail of large groups is mirrored
    boilerplate, and the single largest group is usually an empty/error
    template worth a blocklist entry. (Lee et al. 2022's dedup paper
    reports exactly this histogram before choosing a strategy.)

    Scale shape: one md5-keyed aggregate (map-side combinable), then a
    second aggregate on the tiny integer group-size key. No joins back
    to the corpus.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    groups = (
        documents.select(F.md5(norm).alias("content_fp"))
        .groupBy("content_fp")
        .agg(F.count("*").alias("group_size"))
    )
    return groups.groupBy("group_size").agg(
        F.count("*").alias("n_groups"),
        F.sum("group_size").alias("n_docs"),
    )


def dup_cluster_sizes_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`dup_cluster_sizes` (standalone query)."""
    return f"""
    WITH dc_g AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             count(*) AS group_size
      FROM {table} GROUP BY fp
    )
    SELECT group_size, count(*) AS n_groups,
           CAST(sum(group_size) AS BIGINT) AS n_docs
    FROM dc_g GROUP BY group_size
    """


def dup_source_matrix(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """→ ``[source_a, source_b, n_pairs, share]`` — WHERE the near-
    duplication lives: the :func:`minhash_lsh_dups` pair set rolled up by
    the (unordered) source pair of the two documents. The diagonal is
    within-source boilerplate; heavy off-diagonal cells are source pairs
    that syndicate/mirror each other — exactly the view a corpus curator
    needs before deciding which source to drop, which no flat dup-pair
    list or per-doc dup count exposes. ``share`` is each cell's fraction
    of all verified dup pairs.

    Scale shape: the banded-LSH candidate join + O(candidates) verify of
    :func:`minhash_lsh_dups`, two id→source equi-joins, then a
    ≤ |sources|² histogram with a share window over the aggregated
    cells. No new heavy shapes.
    """
    pairs = minhash_lsh_dups(documents, threshold=threshold)
    src = documents.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    cells = j.groupBy("source_a", "source_b").agg(F.count("*").alias("n_pairs"))
    w = Window.partitionBy()
    return cells.select(
        "source_a",
        "source_b",
        "n_pairs",
        F.round(F.col("n_pairs") / F.sum("n_pairs").over(w), 6).alias("share"),
    )


def dup_source_matrix_sql(table: str = "documents", threshold: float = 0.5) -> str:
    """DuckDB oracle for :func:`dup_source_matrix` — wraps the
    :func:`minhash_lsh_sql` pair query and rolls it up identically."""
    return f"""
    WITH dsm_pairs AS MATERIALIZED (
      SELECT * FROM ({minhash_lsh_sql(table, threshold=threshold)})
    ),
    dsm_src AS (SELECT doc_id, source FROM {table}),
    dsm_cells AS (
      SELECT least(a.source, b.source) AS source_a,
             greatest(a.source, b.source) AS source_b,
             count(*) AS n_pairs
      FROM dsm_pairs p
      JOIN dsm_src a ON a.doc_id = p.doc_a
      JOIN dsm_src b ON b.doc_id = p.doc_b
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_pairs,
           round(n_pairs * 1.0 / (sum(n_pairs) OVER ()), 6) AS share
    FROM dsm_cells
    """


def dup_quality_gap(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """→ one-row ``[n_pairs, mean_abs_gap, frac_equal_quality]`` — when
    two documents are near-duplicates, do they differ in quality? Joins
    the :func:`minhash_lsh_dups` pair set with each side's heuristic
    quality score and reports the mean absolute quality gap plus the
    fraction of pairs scoring identically. A large gap says "keep-best"
    dedup (drop the worse twin) beats "keep-first"; a gap of ~0 says the
    cheaper keep-first policy loses nothing — the measurement behind
    choosing ``dedup_corpus``'s retention rule. Quality is quantized to
    0.25 steps, so the equality test is exact in both engines.

    Scale shape: the LSH candidate join + O(candidates) verify, two
    doc_id equi-joins against the map-only quality projection, one
    global agg. Nothing new.
    """
    from linkgraph_spark.functions.text import quality_score

    pairs = minhash_lsh_dups(documents, threshold=threshold)
    q = quality_score(documents).select("doc_id", "quality")
    j = pairs.join(
        q.select(F.col("doc_id").alias("doc_a"), F.col("quality").alias("qa")),
        "doc_a",
    ).join(
        q.select(F.col("doc_id").alias("doc_b"), F.col("quality").alias("qb")),
        "doc_b",
    )
    return j.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("qa") - F.col("qb"))), 6).alias("mean_abs_gap"),
        F.round(
            F.avg(F.when(F.col("qa") == F.col("qb"), 1.0).otherwise(0.0)), 6
        ).alias("frac_equal_quality"),
    )


def dup_quality_gap_sql(table: str = "documents", threshold: float = 0.5) -> str:
    """DuckDB oracle for :func:`dup_quality_gap` — wraps the pair query
    and the quality query and aggregates identically."""
    from linkgraph_spark.functions.text import quality_score_sql

    return f"""
    WITH dqg_pairs AS MATERIALIZED (
      SELECT * FROM ({minhash_lsh_sql(table, threshold=threshold)})
    ),
    dqg_q AS MATERIALIZED (
      SELECT doc_id, quality FROM ({quality_score_sql(table)})
    )
    SELECT count(*) AS n_pairs,
           round(avg(abs(a.quality - b.quality)), 6) AS mean_abs_gap,
           round(avg(CASE WHEN a.quality = b.quality THEN 1.0 ELSE 0.0 END), 6)
             AS frac_equal_quality
    FROM dqg_pairs p
    JOIN dqg_q a ON a.doc_id = p.doc_a
    JOIN dqg_q b ON b.doc_id = p.doc_b
    """


def dup_chain_audit(
    documents: DataFrame, threshold: float = 0.5, max_cluster: int = 32
) -> DataFrame:
    """→ one-row ``[n_clusters, n_intra_pairs, n_direct_pairs,
    chaining_frac]`` — how much of the near-dup clustering is TRANSITIVE
    CHAINING rather than direct similarity: over every multi-member
    cluster from :func:`near_dup_clusters` (size in [2, ``max_cluster``]),
    count all intra-cluster document pairs and the subset that
    :func:`minhash_lsh_dups` verified DIRECTLY above ``threshold``.
    chaining_frac = 1 − direct/intra. Near 0 means clusters are genuine
    similarity cliques and keep-one-per-cluster is safe; high means A~B~C
    chains are merging documents that are NOT pairwise similar — the
    known failure mode of closure-based dedup that this measurement
    decides between (tighten the threshold, or cut clusters).

    Scale shape: the LSH pair join + hash-min closure (both existing
    operators at their native scale), an intra-cluster pair self-join
    bounded by C(``max_cluster``, 2) per cluster (over-cap clusters are
    excluded — the same hot-key discipline as the capped shingle join),
    one anti-probe against the direct-pair set, one global reduce.
    """
    if max_cluster < 2:
        raise ValueError("max_cluster must be >= 2")
    clusters = near_dup_clusters(documents, threshold)
    mem = clusters.where(
        (F.col("cluster_size") >= 2) & (F.col("cluster_size") <= max_cluster)
    ).select("doc_id", "keeper_id")
    a = mem.select(F.col("keeper_id").alias("k"), F.col("doc_id").alias("da"))
    b = mem.select(F.col("keeper_id").alias("k"), F.col("doc_id").alias("db"))
    intra = a.join(b, "k").where(F.col("da") < F.col("db"))
    direct = minhash_lsh_dups(documents, threshold).select(
        F.col("doc_a").alias("da"), F.col("doc_b").alias("db"), F.lit(1).alias("_d")
    )
    j = intra.join(direct, ["da", "db"], "left")
    return j.agg(
        F.countDistinct("k").alias("n_clusters"),
        F.count("*").alias("n_intra_pairs"),
        F.sum(F.coalesce(F.col("_d"), F.lit(0))).alias("n_direct_pairs"),
    ).select(
        "n_clusters",
        "n_intra_pairs",
        "n_direct_pairs",
        F.round(
            F.when(
                F.col("n_intra_pairs") > 0,
                1.0 - F.col("n_direct_pairs") / F.col("n_intra_pairs"),
            ),
            6,
        ).alias("chaining_frac"),
    )


def dup_chain_audit_sql(
    table: str = "documents",
    threshold: float = 0.5,
    max_cluster: int = 32,
    unroll: int = 40,
) -> str:
    """DuckDB oracle for :func:`dup_chain_audit` — shares the pair +
    closure CTEs with :func:`near_dup_clusters_sql`."""
    body = _pair_closure_ctes(minhash_lsh_sql(table, threshold), unroll)
    return f"""
    WITH {body},
    dca_sizes AS (
      SELECT component, count(*) AS cluster_size
      FROM c{unroll} GROUP BY component
    ),
    dca_mem AS MATERIALIZED (
      SELECT c.id AS doc_id, c.component AS k
      FROM c{unroll} c JOIN dca_sizes s ON s.component = c.component
      WHERE s.cluster_size BETWEEN 2 AND {int(max_cluster)}
    ),
    dca_intra AS (
      SELECT x.k, x.doc_id AS da, y.doc_id AS db
      FROM dca_mem x JOIN dca_mem y ON y.k = x.k AND x.doc_id < y.doc_id
    ),
    dca_j AS (
      SELECT i.k, CASE WHEN p.doc_a IS NULL THEN 0 ELSE 1 END AS d
      FROM dca_intra i
      LEFT JOIN pairs p ON p.doc_a = i.da AND p.doc_b = i.db
    )
    SELECT count(DISTINCT k) AS n_clusters,
           count(*) AS n_intra_pairs,
           CAST(sum(d) AS BIGINT) AS n_direct_pairs,
           round(CASE WHEN count(*) > 0
                 THEN 1.0 - sum(d) * 1.0 / count(*) END, 6) AS chaining_frac
    FROM dca_j
    """


def fuzzy_text_pairs(
    documents: DataFrame,
    prefix_len: int = 8,
    sig_len: int = 32,
    max_dist: int = 4,
    block_cap: int = 200,
) -> DataFrame:
    """Edit-distance near-duplicate pairs via prefix blocking: documents
    of the same language sharing their first ``prefix_len`` characters
    are candidates; a pair survives when the Levenshtein distance of
    their first ``sig_len`` characters is ≤ ``max_dist``.
    → ``[doc_id_a, doc_id_b, edit_dist]`` with ``doc_id_a < doc_id_b``.

    Blocking recall is deliberate and documented: pairs differing inside
    the first ``prefix_len`` chars are MISSED — prefix blocking trades
    recall for never running the O(sig_len²) distance on the cross
    product. Blocks larger than ``block_cap`` docs are dropped whole
    (boilerplate openings), mirroring the hot-shingle cap: a hot block
    is quadratic, and at 100 TB one viral preamble must not produce a
    single-task O(n²) straggler. The cap cut is on an exact per-block
    count, so both engines drop identical blocks.
    """
    d = documents.select(
        "doc_id",
        "lang",
        F.substring("text", 1, int(sig_len)).alias("_sig"),
        F.substring("text", 1, int(prefix_len)).alias("_blk"),
    )
    # NO broadcast hint: the size table has one row per distinct (lang,
    # prefix) — corpus-sized at scale — so it must stay a shuffle join
    # (AQE still broadcasts it when it happens to be small)
    sizes = d.groupBy("lang", "_blk").agg(F.count("*").alias("_n"))
    cool = d.join(sizes.where(F.col("_n") <= int(block_cap)), ["lang", "_blk"])
    a = cool.select(
        F.col("doc_id").alias("doc_id_a"), "lang", "_blk", F.col("_sig").alias("_sa")
    )
    b = cool.select(
        F.col("doc_id").alias("doc_id_b"), "lang", "_blk", F.col("_sig").alias("_sb")
    )
    return (
        a.join(b, ["lang", "_blk"])
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .withColumn("edit_dist", F.levenshtein("_sa", "_sb"))
        .where(F.col("edit_dist") <= int(max_dist))
        .select("doc_id_a", "doc_id_b", "edit_dist")
    )


def fuzzy_text_pairs_sql(
    table: str = "documents",
    prefix_len: int = 8,
    sig_len: int = 32,
    max_dist: int = 4,
    block_cap: int = 200,
) -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, lang,
             substr(text, 1, {int(sig_len)}) AS sig,
             substr(text, 1, {int(prefix_len)}) AS blk
      FROM {table}
    ),
    cool AS (
      SELECT * FROM d
      WHERE (lang, blk) IN (
        SELECT (lang, blk) FROM d GROUP BY lang, blk
        HAVING count(*) <= {int(block_cap)}
      )
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           levenshtein(a.sig, b.sig) AS edit_dist
    FROM cool a JOIN cool b
      ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.sig, b.sig) <= {int(max_dist)}
    """


def sorted_neighborhood_pairs(
    documents: DataFrame,
    window: int = 4,
    sig_len: int = 32,
    max_dist: int = 4,
    blk_len: int = 2,
) -> DataFrame:
    """Sorted-neighborhood ER blocking (Hernández & Stolfo, SIGMOD 1995
    — the other classic next to prefix blocking): documents sort by
    their signature and each pairs with the next ``window − 1``
    neighbors in that order; a pair survives when the Levenshtein
    distance of the ``sig_len``-char signatures is ≤ ``max_dist``.
    → ``[doc_id_a, doc_id_b, edit_dist]`` (a < b by id).

    Why it complements prefix blocking: equality blocking only sees
    pairs IDENTICAL in the first prefix chars; sorted adjacency also
    catches pairs that diverge mid-signature yet sort together. The
    sort runs INSIDE ``blk_len``-char blocks (the window never crosses a
    block boundary) — the same documented-recall trade as the prefix
    block cap, and what keeps the neighborhood pass per-block parallel
    instead of one global single-task sort at 100 TB.
    """
    d = documents.select(
        "doc_id",
        F.substring("text", 1, int(sig_len)).alias("_sig"),
        F.substring("text", 1, int(blk_len)).alias("_blk"),
    )
    w = Window.partitionBy("_blk").orderBy("_sig", "doc_id")
    leads = d.select(
        "doc_id",
        "_sig",
        F.array(
            *[
                F.struct(
                    F.lead("doc_id", k).over(w).alias("_id"),
                    F.lead("_sig", k).over(w).alias("_s"),
                )
                for k in range(1, int(window))
            ]
        ).alias("_nbrs"),
    )
    pairs = leads.select(
        "doc_id", "_sig", F.explode("_nbrs").alias("_nb")
    ).where(F.col("_nb._id").isNotNull())
    dist = F.levenshtein(F.col("_sig"), F.col("_nb._s"))
    return (
        pairs.withColumn("edit_dist", dist)
        .where(F.col("edit_dist") <= int(max_dist))
        .select(
            F.least("doc_id", F.col("_nb._id")).alias("doc_id_a"),
            F.greatest("doc_id", F.col("_nb._id")).alias("doc_id_b"),
            "edit_dist",
        )
        .orderBy("doc_id_a", "doc_id_b")
    )


def sorted_neighborhood_pairs_sql(
    table: str = "documents",
    window: int = 4,
    sig_len: int = 32,
    max_dist: int = 4,
    blk_len: int = 2,
) -> str:
    return f"""
    WITH snd AS (
      SELECT doc_id,
             substr(text, 1, {int(sig_len)}) AS sig,
             substr(text, 1, {int(blk_len)}) AS blk
      FROM {table}
    ),
    snr AS (
      SELECT *, row_number() OVER
               (PARTITION BY blk ORDER BY sig, doc_id) AS rn
      FROM snd
    )
    SELECT least(a.doc_id, b.doc_id) AS doc_id_a,
           greatest(a.doc_id, b.doc_id) AS doc_id_b,
           levenshtein(a.sig, b.sig) AS edit_dist
    FROM snr a JOIN snr b
      ON a.blk = b.blk AND b.rn > a.rn AND b.rn < a.rn + {int(window)}
    WHERE levenshtein(a.sig, b.sig) <= {int(max_dist)}
    ORDER BY doc_id_a, doc_id_b
    """


# ----------------------------------------------------------- duplicate spans
def dup_spans(
    documents: DataFrame, min_run: int = 2, max_doc_freq: int | None = None
) -> DataFrame:
    """→ [doc_a, doc_b, start_a, start_b, match_len, span_tokens] — WHERE
    document pairs overlap: every maximal run of consecutive, identically
    aligned word-3-gram shingles between two documents (the gaps-and-islands
    localization of near-duplication — Jaccard says THAT docs overlap, this
    says WHICH token spans, the evidence a curation pipeline shows before
    dropping a doc; cf. the substring-dedup motivation of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — public
    work, original implementation).

    A run is a set of matched shingle positions (p_a, p_b) sharing one
    alignment offset ``p_a − p_b`` with consecutive ``p_a`` — detected with
    the classic islands key ``p_a − row_number()`` per (pair, offset).
    ``match_len`` counts shingles; ``span_tokens = match_len + 2`` is the
    shared token-span length (3-gram shingles overlap by 2). Documents with
    < 3 tokens host no 3-gram and are skipped (exact dedup owns them).
    Shingles are compared by the portable 60-bit md5 hash (same documented
    collision approximation as the Jaccard family).

    Scale shape: positioned-shingle explode is O(corpus tokens); candidate
    pairs come ONLY from a shared-shingle equi-join — ``max_doc_freq`` caps
    shingle document-frequency exactly like :func:`ngram_jaccard_dups`
    (hot stopword shingles otherwise fan out df² pairs; capped runs may
    split where a hot shingle is excised — documented recall trade). The
    islands window partitions by (pair, offset) — bounded by per-pair
    matches on one diagonal, never a global or per-document-corpus sort.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = (
        documents.select("doc_id", norm.alias("norm"))
        .withColumn("toks", F.split("norm", " "))
        .where(F.size("toks") >= 3)
    )
    ps = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.struct(
            i.alias("p"),
            (md5_long(F.array_join(F.slice("toks", i, F.lit(3)), " "))
             % F.lit(MERSENNE_P)).alias("s"),
        ),
    )
    pos = (
        d.select("doc_id", F.explode(ps).alias("x"))
        .select("doc_id", F.col("x.p").alias("p"), F.col("x.s").alias("s"))
    )
    if max_doc_freq is not None:
        keep = (
            pos.groupBy("s")
            .agg(F.countDistinct("doc_id").alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("s")
        )
        pos = pos.join(keep, "s", "left_semi")
    a = pos.select(
        F.col("doc_id").alias("doc_a"), F.col("p").alias("pa"), "s"
    )
    b = pos.select(
        F.col("doc_id").alias("doc_b"), F.col("p").alias("pb"), "s"
    )
    pp = a.join(b, "s").where(F.col("doc_a") < F.col("doc_b"))
    w = Window.partitionBy("doc_a", "doc_b", "off").orderBy("pa")
    runs = (
        pp.withColumn("off", F.col("pa") - F.col("pb"))
        .withColumn("grp", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "off", "grp")
        .agg(
            F.min("pa").cast("long").alias("start_a"),
            F.min("pb").cast("long").alias("start_b"),
            F.count("*").alias("match_len"),
        )
    )
    return runs.where(F.col("match_len") >= min_run).select(
        "doc_a",
        "doc_b",
        "start_a",
        "start_b",
        "match_len",
        (F.col("match_len") + 2).alias("span_tokens"),
    )


def dup_spans_sql(
    table: str = "documents", min_run: int = 2, max_doc_freq: int | None = None
) -> str:
    """DuckDB mirror of :func:`dup_spans` (positions via the list-returning
    ``range()`` + unnest — this DuckDB's table-function generate_series
    rejects lateral column arguments)."""
    h = md5_long_sql("array_to_string(toks[i:i+2], ' ')")
    cap = (
        f"""dsp_keep AS (
      SELECT s FROM dsp_pos GROUP BY s
      HAVING count(DISTINCT doc_id) <= {int(max_doc_freq)}
    ),
    dsp_cpos AS (SELECT p.* FROM dsp_pos p JOIN dsp_keep k ON k.s = p.s),"""
        if max_doc_freq is not None
        else "dsp_cpos AS (SELECT * FROM dsp_pos),"
    )
    return f"""
    WITH dsp_d AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS toks
      FROM {table}
    ), dsp_ex AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
      FROM dsp_d WHERE len(toks) >= 3
    ), dsp_pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p, ({h}) % {MERSENNE_P} AS s
      FROM dsp_ex
    ),
    {cap}
    dsp_pp AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
      FROM dsp_cpos a JOIN dsp_cpos b
        ON b.s = a.s AND a.doc_id < b.doc_id
    ), dsp_runs AS (
      SELECT doc_a, doc_b, pa - pb AS off,
             pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                     ORDER BY pa) AS grp,
             pa, pb
      FROM dsp_pp
    ), dsp_agg AS (
      SELECT doc_a, doc_b,
             CAST(min(pa) AS BIGINT) AS start_a,
             CAST(min(pb) AS BIGINT) AS start_b,
             count(*) AS match_len
      FROM dsp_runs GROUP BY doc_a, doc_b, off, grp
    )
    SELECT doc_a, doc_b, start_a, start_b, match_len,
           match_len + 2 AS span_tokens
    FROM dsp_agg WHERE match_len >= {int(min_run)}
    """


# ------------------------------------------------------- tail-head overlap
def tail_head_overlap(
    documents: DataFrame, max_k: int = 10, max_doc_freq: int | None = None
) -> DataFrame:
    """→ [doc_a, doc_b, overlap_tokens] — ordered pairs where the LAST k
    tokens of ``doc_a`` equal the FIRST k tokens of ``doc_b`` (largest k
    ≤ ``max_k``, k ≥ 2): the shard-stitching / split-document detector —
    :func:`dup_spans` finds shared INTERNAL runs, this finds the seam
    where one document continues into another (chunked uploads, paginated
    scrapes, boilerplate headers chaining onto footers).

    Mechanics: per k in [2, max_k], the suffix-k hash of every document
    equi-joins the prefix-k hash of every other (the portable 60-bit md5
    over the joined token slice — same documented collision approximation
    as the Jaccard family); the pair keeps its maximum matching k.
    ``max_doc_freq`` caps the document frequency of a (k, hash) join key
    on BOTH sides — a viral boilerplate header otherwise fans out df²
    pairs, exactly the hot-shingle failure mode, with the same documented
    recall trade. Self-pairs are excluded; (a → b) and (b → a) are
    distinct directions and both reported when both seams exist.

    Scale shape: one token-slice hash projection per document per k
    (map-only, ≤ max_k−1 rows per doc), equi-joins on (k, hash) only —
    never a document cross product — and one pair-grain max.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = (
        documents.select("doc_id", norm.alias("norm"))
        .withColumn("toks", F.split("norm", " "))
        .withColumn("n", F.size("toks"))
    )
    ks = documents.sparkSession.createDataFrame(
        [(k,) for k in range(2, int(max_k) + 1)], "k int"
    )
    dk = d.crossJoin(ks).where(F.col("n") >= F.col("k"))
    suf = dk.select(
        F.col("doc_id").alias("doc_a"),
        "k",
        (
            # greatest() keeps the slice total — Catalyst may evaluate the
            # projection speculatively before the n >= k filter prunes
            md5_long(
                F.array_join(
                    F.slice(
                        "toks",
                        F.greatest(F.lit(1), F.col("n") - F.col("k") + 1),
                        F.col("k"),
                    ),
                    " ",
                )
            )
            % F.lit(MERSENNE_P)
        ).alias("h"),
    )
    pre = dk.select(
        F.col("doc_id").alias("doc_b"),
        "k",
        (
            md5_long(F.array_join(F.slice("toks", F.lit(1), F.col("k")), " "))
            % F.lit(MERSENNE_P)
        ).alias("h"),
    )
    if max_doc_freq is not None:
        cap = int(max_doc_freq)
        for side, col in (("suf", "doc_a"), ("pre", "doc_b")):
            src = suf if side == "suf" else pre
            keep = (
                src.groupBy("k", "h")
                .agg(F.countDistinct(col).alias("_df"))
                .where(F.col("_df") <= cap)
                .select("k", "h")
            )
            if side == "suf":
                suf = suf.join(keep, ["k", "h"], "left_semi")
            else:
                pre = pre.join(keep, ["k", "h"], "left_semi")
    pairs = suf.join(pre, ["k", "h"]).where(F.col("doc_a") != F.col("doc_b"))
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.max("k").cast("long").alias("overlap_tokens"))
        .orderBy("doc_a", "doc_b")
    )


def tail_head_overlap_sql(
    table: str = "documents", max_k: int = 10, max_doc_freq: int | None = None
) -> str:
    """DuckDB mirror of :func:`tail_head_overlap` (list slicing is
    1-based inclusive; same (k, hash) cap)."""
    hs = md5_long_sql("array_to_string(toks[n - k + 1:n], ' ')")
    hp = md5_long_sql("array_to_string(toks[1:k], ' ')")
    if max_doc_freq is not None:
        cap = int(max_doc_freq)
        capped = f"""tho_sufc AS (
      SELECT s.* FROM tho_suf s JOIN (
        SELECT k, h FROM tho_suf GROUP BY k, h
        HAVING count(DISTINCT doc_a) <= {cap}) x USING (k, h)
    ), tho_prec AS (
      SELECT p.* FROM tho_pre p JOIN (
        SELECT k, h FROM tho_pre GROUP BY k, h
        HAVING count(DISTINCT doc_b) <= {cap}) x USING (k, h)
    ),"""
        sufn, pren = "tho_sufc", "tho_prec"
    else:
        capped = ""
        sufn, pren = "tho_suf", "tho_pre"
    return f"""
    WITH tho_d AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS toks
      FROM {table}
    ), tho_dk AS (
      SELECT doc_id, toks, len(toks) AS n,
             CAST(unnest(generate_series(2, {int(max_k)})) AS INTEGER) AS k
      FROM tho_d
    ), tho_f AS (
      SELECT * FROM tho_dk WHERE n >= k
    ), tho_suf AS (
      SELECT doc_id AS doc_a, k, ({hs}) % {MERSENNE_P} AS h FROM tho_f
    ), tho_pre AS (
      SELECT doc_id AS doc_b, k, ({hp}) % {MERSENNE_P} AS h FROM tho_f
    ), {capped} tho_p AS (
      SELECT s.doc_a, p.doc_b, s.k
      FROM {sufn} s JOIN {pren} p ON p.k = s.k AND p.h = s.h
      WHERE s.doc_a <> p.doc_b
    )
    SELECT doc_a, doc_b, CAST(max(k) AS BIGINT) AS overlap_tokens
    FROM tho_p GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b
    """


# ------------------------------------------------------ full containment
def contained_docs(
    documents: DataFrame, max_doc_freq: int | None = None
) -> DataFrame:
    """→ [inner_doc, outer_doc, n_tokens_inner] — documents whose ENTIRE
    normalized token sequence appears verbatim inside another document:
    the strongest near-dup verdict short of exact equality (quote posts,
    mirrored articles with added chrome, chunk-of-a-larger-file
    uploads). Lee et al. 2022's substring-dedup end state, as a verdict
    table rather than span evidence.

    Composition, not new machinery: a document with t ≥ 3 tokens hosts
    t − 2 positioned 3-gram shingles; it is contained in another exactly
    when ONE aligned run (:func:`dup_spans`' gaps-and-islands) covers
    all t − 2 of them. Both orientations are checked (dup_spans
    canonicalizes pairs; containment restores direction). Exact-equal
    documents contain each other and appear in both directions — that
    is the honest verdict, and exact dedup owns collapsing them.
    ``max_doc_freq`` passes through to the shingle cap (a capped run may
    split, losing a containment — same documented recall trade).

    Scale shape: dup_spans' bounded shapes plus one broadcast-size
    token-count attach and a pair-grain max. Sub-3-token docs are exact
    dedup's job and excluded here.
    """
    spans = dup_spans(documents, min_run=1, max_doc_freq=max_doc_freq)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    nt = documents.select(
        "doc_id", F.size(F.split(norm, " ")).cast("long").alias("nt")
    )
    best = spans.groupBy("doc_a", "doc_b").agg(
        F.max("match_len").alias("best")
    )
    a_in_b = (
        best.join(nt.select(F.col("doc_id").alias("doc_a"), "nt"), "doc_a")
        .where(F.col("best") == F.col("nt") - 2)
        .select(
            F.col("doc_a").alias("inner_doc"),
            F.col("doc_b").alias("outer_doc"),
            F.col("nt").alias("n_tokens_inner"),
        )
    )
    b_in_a = (
        best.join(nt.select(F.col("doc_id").alias("doc_b"), "nt"), "doc_b")
        .where(F.col("best") == F.col("nt") - 2)
        .select(
            F.col("doc_b").alias("inner_doc"),
            F.col("doc_a").alias("outer_doc"),
            F.col("nt").alias("n_tokens_inner"),
        )
    )
    return a_in_b.unionByName(b_in_a).orderBy("inner_doc", "outer_doc")


def contained_docs_sql(
    table: str = "documents", max_doc_freq: int | None = None
) -> str:
    """DuckDB mirror of :func:`contained_docs` (wraps dup_spans_sql at
    min_run=1 and restores direction)."""
    inner = dup_spans_sql(table=table, min_run=1, max_doc_freq=max_doc_freq)
    return f"""
    WITH cnd_spans AS ({inner}),
    cnd_nt AS (
      SELECT doc_id,
             CAST(len(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
               AS BIGINT) AS nt
      FROM {table}
    ), cnd_best AS (
      SELECT doc_a, doc_b, max(match_len) AS best
      FROM cnd_spans GROUP BY 1, 2
    ), cnd_dir AS (
      SELECT b.doc_a AS inner_doc, b.doc_b AS outer_doc, n.nt
      FROM cnd_best b JOIN cnd_nt n ON n.doc_id = b.doc_a
      WHERE b.best = n.nt - 2
      UNION ALL
      SELECT b.doc_b, b.doc_a, n.nt
      FROM cnd_best b JOIN cnd_nt n ON n.doc_id = b.doc_b
      WHERE b.best = n.nt - 2
    )
    SELECT inner_doc, outer_doc, nt AS n_tokens_inner
    FROM cnd_dir ORDER BY inner_doc, outer_doc
    """


# --------------------------------------------------------------- wave 129
def dedup_token_savings(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """→ one row [n_docs, n_docs_kept, tokens, tokens_kept,
    doc_savings, token_savings] — the budget readout of near-dedup:
    how many documents AND how many whitespace tokens the
    :func:`dedup_corpus` keeper set drops at the given Jaccard
    threshold. Doc-count savings and token savings differ whenever
    duplicates skew long (mirrored articles) or short (boilerplate
    stubs) — a training-token budget needs the TOKEN number, which is
    exactly why this is its own operator and not `1 − kept/docs`.

    Exactness: token counts are exact whitespace-split sizes; all four
    totals are exact BIGINT sums; the two savings ratios are staged
    divisions rounded 6, NULL on an empty corpus. The keeper set is
    the converged LSH+hash-min closure (`near_dup_clusters`), so the
    savings are consistent with the corpus the pipeline would really
    ship.

    Scale shape: one map-side token count, the near-dup closure
    (banded LSH candidates, O(candidates) verify — scale-safe per
    SCALE.md), one semi-join, two one-row reduces.

    Reference parity: no dedup surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    toks = documents.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_tok"
        ),
    )
    kept = dedup_corpus(documents, threshold).select("doc_id")
    tot = toks.groupBy().agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).alias("tokens"),
    )
    keptagg = toks.join(kept, "doc_id").groupBy().agg(
        F.count("*").cast("long").alias("n_docs_kept"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).alias("tokens_kept"),
    )
    return tot.crossJoin(keptagg).select(
        "n_docs",
        "n_docs_kept",
        "tokens",
        "tokens_kept",
        F.expr(
            "CASE WHEN n_docs > 0 THEN"
            " round(1.0 - CAST(n_docs_kept AS DOUBLE) / n_docs, 6) END"
        ).alias("doc_savings"),
        F.expr(
            "CASE WHEN tokens > 0 THEN"
            " round(1.0 - CAST(tokens_kept AS DOUBLE) / tokens, 6) END"
        ).alias("token_savings"),
    )


def dedup_token_savings_sql(
    table: str = "documents", threshold: float = 0.5
) -> str:
    """DuckDB oracle for :func:`dedup_token_savings` (same keeper set,
    same exact token sums)."""
    return f"""
    WITH dts_t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
      FROM {table}
    ), dts_kept AS (
      SELECT doc_id FROM ({dedup_corpus_sql(table, threshold)})
    ), dts_tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS tokens
      FROM dts_t
    ), dts_k AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs_kept,
             CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS tokens_kept
      FROM dts_t JOIN dts_kept USING (doc_id)
    )
    SELECT n_docs, n_docs_kept, tokens, tokens_kept,
           CASE WHEN n_docs > 0 THEN
             round(1.0 - CAST(n_docs_kept AS DOUBLE) / n_docs, 6) END
             AS doc_savings,
           CASE WHEN tokens > 0 THEN
             round(1.0 - CAST(tokens_kept AS DOUBLE) / tokens, 6) END
             AS token_savings
    FROM dts_tot CROSS JOIN dts_k
    """


def dedup_effective_n(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """→ one row [n_kept, sum_w, n_eff, efficiency] — the Kish
    effective sample size (Kish 1965) of the deduplicated corpus under
    cluster-size loss re-weighting: n_eff = (Σw)²/Σw² over the keeper
    weights from :func:`dedup_corpus`. Re-weighting keeps the token
    DISTRIBUTION honest but costs statistical efficiency — n_eff says
    how many equally-weighted documents the weighted corpus is really
    worth, and ``efficiency`` = n_eff/n_kept is the design-effect
    penalty a training-data ablation should report.

    Exactness: weights are exact BIGINT cluster sizes; Σw and Σw² are
    exact DECIMAL(38,0)/HUGEINT; n_eff and efficiency stage once,
    rounded 6. A dup-free corpus reports efficiency = 1.0 exactly;
    empty corpora report NULL.

    Scale shape: the near-dup closure (scale-safe per SCALE.md), then
    one one-row reduce over the keeper frame.

    Reference parity: no dedup surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    kept = dedup_corpus(documents, threshold)
    s = kept.groupBy().agg(
        F.count("*").cast("long").alias("n_kept"),
        F.coalesce(
            F.sum(F.col("cluster_size").cast(d38)), F.lit(0).cast(d38)
        ).alias("sw"),
        F.coalesce(
            F.sum(F.col("cluster_size").cast(d38) * F.col("cluster_size")),
            F.lit(0).cast(d38),
        ).alias("sww"),
    )
    neff = (
        "CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE)"
    )
    return s.select(
        "n_kept",
        F.col("sw").cast("long").alias("sum_w"),
        F.expr(
            f"CASE WHEN sww > 0 THEN round({neff}, 6) END"
        ).alias("n_eff"),
        F.expr(
            f"CASE WHEN sww > 0 AND n_kept > 0 THEN"
            f" round(({neff}) / n_kept, 6) END"
        ).alias("efficiency"),
    )


def dedup_effective_n_sql(
    table: str = "documents", threshold: float = 0.5
) -> str:
    """DuckDB oracle for :func:`dedup_effective_n` (same keeper frame,
    exact weight moments)."""
    neff = (
        "CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE)"
    )
    return f"""
    WITH den_k AS (
      SELECT doc_id, cluster_size
      FROM ({dedup_corpus_sql(table, threshold)})
    ), den_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_kept,
             coalesce(sum(CAST(cluster_size AS HUGEINT)), 0) AS sw,
             coalesce(sum(CAST(cluster_size AS HUGEINT) * cluster_size), 0)
               AS sww
      FROM den_k
    )
    SELECT n_kept, CAST(sw AS BIGINT) AS sum_w,
           CASE WHEN sww > 0 THEN round({neff}, 6) END AS n_eff,
           CASE WHEN sww > 0 AND n_kept > 0 THEN
             round(({neff}) / n_kept, 6) END AS efficiency
    FROM den_s
    """


def dedup_corpus_best_quality(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """→ ``[doc_id, cluster_size, quality]`` — the deduplicated corpus
    keeping the HIGHEST-QUALITY member of every near-dup cluster (ties by
    min doc_id) instead of :func:`dedup_corpus`'s min-id keeper.  The
    version a production pipeline actually wants: near-duplicate families
    routinely mix a clean original with boilerplate-wrapped or truncated
    copies, and min-id keeps whichever crawled first.  Quality is
    :func:`~linkgraph_spark.functions.text.quality_score`'s [0,1] band
    score (exact multiples of 0.25 — so the argmax is float-safe).

    Scale shape: the cluster closure is :func:`near_dup_clusters` (banded
    LSH pairs → hash-min components, converged-or-raise); the per-cluster
    argmax is ONE grouped ``max(struct(quality, −doc_id))`` — no window,
    so a degenerate million-doc boilerplate family is a single combiner-
    friendly aggregate, not a single-task sort."""
    from linkgraph_spark.functions.text import quality_score

    clusters = near_dup_clusters(documents, threshold)
    q = quality_score(documents).select("doc_id", "quality")
    j = clusters.join(q, "doc_id")
    best = (
        j.groupBy("keeper_id")
        .agg(
            F.max(
                F.struct(
                    F.col("quality").alias("q"),
                    (-F.col("doc_id")).alias("nid"),
                )
            ).alias("b")
        )
        .select(
            (-F.col("b.nid")).alias("doc_id"),
        )
    )
    return (
        best.join(j, "doc_id")
        .select("doc_id", "cluster_size", "quality")
    )


def dedup_corpus_best_quality_sql(
    table: str = "documents", threshold: float = 0.5
) -> str:
    """DuckDB oracle for :func:`dedup_corpus_best_quality` — the same
    closure + a two-step argmax (max quality per cluster, then min doc_id
    among the maximizers; exact because quality is a multiple of 0.25)."""
    from linkgraph_spark.functions.text import quality_score_sql

    return f"""
    WITH ndq_cl AS MATERIALIZED ({near_dup_clusters_sql(table, threshold)}),
    ndq_q AS MATERIALIZED (
      SELECT doc_id, quality FROM ({quality_score_sql(table)})
    ),
    ndq_j AS MATERIALIZED (
      SELECT c.doc_id, c.keeper_id, c.cluster_size, q.quality
      FROM ndq_cl c JOIN ndq_q q USING (doc_id)
    ),
    ndq_b1 AS (
      SELECT keeper_id, max(quality) AS mq FROM ndq_j GROUP BY keeper_id
    ),
    ndq_b2 AS (
      SELECT j.keeper_id, min(j.doc_id) AS keep_id
      FROM ndq_j j JOIN ndq_b1 b ON b.keeper_id = j.keeper_id
                             AND j.quality = b.mq
      GROUP BY j.keeper_id
    )
    SELECT j.doc_id, j.cluster_size, j.quality
    FROM ndq_b2 b JOIN ndq_j j ON j.doc_id = b.keep_id
    """
