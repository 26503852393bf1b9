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

from pyspark.sql import DataFrame
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


# ------------------------------------------------------------- ngram jaccard
def ngram_jaccard_dups(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """→ [doc_a, doc_b, jaccard] for pairs with 3-gram Jaccard ≥ threshold.

    Candidates come from a shared-shingle equi-join (shuffle on shingle
    hash), never a cross join — the property that keeps this runnable at
    100 TB. A stopword-frequent shingle would fan out; at scale add a
    document-frequency cap on shingles before the join (standard practice).
    """
    sh = _with_shingle_hashes(documents).persist()
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    flat = sh.select("doc_id", F.explode("sh").alias("s"))
    a = flat.withColumnRenamed("doc_id", "doc_a")
    b = flat.withColumnRenamed("doc_id", "doc_b")
    inter = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_sql(table: str = "documents", threshold: float = 0.5) -> str:
    return f"""
    WITH {_shingles_sql(table)},
    flat AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM flat a JOIN flat b ON a.s = b.s AND a.doc_id < b.doc_id
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
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    flat = sh.select("doc_id", F.explode("sh").alias("s"))
    inter = (
        flat.withColumnRenamed("doc_id", "doc_a")
        .join(flat.withColumnRenamed("doc_id", "doc_b"), "s")
        .join(cand, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


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

    Pairwise here (verified-exact); at 100 TB bucket the 32 bits into 4
    bands of 8 and equi-join on band value first — identical output, no
    cross product."""
    s = simhash(documents)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_dups_sql(table: str = "documents", max_hamming: int = 3) -> str:
    return f"""
    WITH s AS ({simhash_sql(table)})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """
