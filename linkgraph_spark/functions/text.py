"""Text analysis operators over the ``documents`` table.

Each operator is a pure JVM-side column expression pipeline (no Python in
the hot path) with an exact DuckDB SQL mirror for the correctness oracle:

- token counting (whitespace + a BPE-ish sub-token regex estimate),
- quality scoring (length / punctuation / stopword ratios),
- language ID (stopword-hit heuristic over a tiny per-language lexicon),
- document fingerprinting (md5 content fingerprint + first-8-token
  prefix fingerprint for clustering near-identical prefixes).

At 100 TB these are embarrassingly parallel map-only scans: no shuffle, the
parquet reader prunes to the ``text`` column only, and every expression
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny fixed lexicons — deterministic, good enough for a heuristic lang-id
STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "ein", "mit", "für", "auf", "zu"]
STOPWORDS_FR = ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "sur"]


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish sub-token estimate (≈ ceil(chars/4),
    the common bytes-per-token rule of thumb) per document."""
    toks = _tokens(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.ceil(F.length("text") / F.lit(4)).cast("long").alias("bpe_token_estimate"),
    )


def token_stats_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           length(text) AS n_chars_measured,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_token_estimate
    FROM {table}
    """


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: length band + punctuation ratio +
    stopword ratio + mean word length band. All column arithmetic."""
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_wl = (n_chars - n_tok + 1) / n_tok  # chars minus separators per token
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 0.25).otherwise(0.0)
    punct_ratio = punct / n_chars
    punct_ok = F.when(punct_ratio < 0.2, 0.25).otherwise(0.0)
    stop_ratio = n_stop / n_tok
    stop_ok = F.when(stop_ratio > 0.05, 0.25).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 0.25).otherwise(0.0)
    return documents.select(
        "doc_id",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(len_ok + punct_ok + stop_ok + wl_ok, 2).alias("quality"),
    )


def quality_score_sql(table: str = "documents") -> str:
    stops = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
    WITH base AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\\s+') AS toks,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct
      FROM {table}
    ), feat AS (
      SELECT doc_id,
             len(toks) AS n_tok, n_chars, punct,
             len(list_filter(toks, t -> list_contains([{stops}], t))) AS n_stop,
             (n_chars - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS mean_wl
      FROM base
    )
    SELECT doc_id,
           round(punct / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
           round(n_stop / CAST(n_tok AS DOUBLE), 6) AS stopword_ratio,
           CAST(round(
             (CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN punct / CAST(n_chars AS DOUBLE) < 0.2 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_stop / CAST(n_tok AS DOUBLE) > 0.05 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN (n_chars - n_tok + 1) / CAST(n_tok AS DOUBLE) BETWEEN 2.0 AND 12.0
                   THEN 0.25 ELSE 0.0 END), 2) AS DOUBLE) AS quality
    FROM feat
    """


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic: score per language = fraction of
    tokens in that language's stopword list; argmax with deterministic
    tie-break (en > de > fr > unknown)."""
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)

    def score(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / n_tok

    en, de, fr = score(STOPWORDS_EN), score(STOPWORDS_DE), score(STOPWORDS_FR)
    best = F.greatest(en, de, fr)
    pred = (
        F.when(best < 0.02, "unknown")
        .when(en == best, "en")
        .when(de == best, "de")
        .otherwise("fr")
    )
    return documents.select("doc_id", pred.alias("lang_pred"), F.round(best, 6).alias("lang_score"))


def lang_id_sql(table: str = "documents") -> str:
    def score(words):
        lst = ", ".join(f"'{w}'" for w in words)
        return f"len(list_filter(toks, t -> list_contains([{lst}], t))) / CAST(len(toks) AS DOUBLE)"

    return f"""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM {table}
    ), s AS (
      SELECT doc_id,
             {score(STOPWORDS_EN)} AS en,
             {score(STOPWORDS_DE)} AS de,
             {score(STOPWORDS_FR)} AS fr
      FROM base
    )
    SELECT doc_id,
           CASE WHEN greatest(en, de, fr) < 0.02 THEN 'unknown'
                WHEN en = greatest(en, de, fr) THEN 'en'
                WHEN de = greatest(en, de, fr) THEN 'de'
                ELSE 'fr' END AS lang_pred,
           round(greatest(en, de, fr), 6) AS lang_score
    FROM s
    """


def fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprints: exact md5 of normalized text + an 8-token
    prefix fingerprint (clusters near-identical-prefix docs)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = F.split(norm, " ")
    prefix = F.array_join(F.slice(toks, 1, 8), " ")
    return documents.select(
        "doc_id",
        F.md5(norm).alias("content_fp"),
        F.md5(prefix).alias("prefix_fp"),
    )


def fingerprint_sql(table: str = "documents") -> str:
    return f"""
    WITH base AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM {table}
    )
    SELECT doc_id,
           md5(norm) AS content_fp,
           md5(array_to_string(string_split(norm, ' ')[1:8], ' ')) AS prefix_fp
    FROM base
    """

WINNOW_K = 5  # k-gram length (chars)
WINNOW_W = 4  # winnowing window (k-grams)


def winnowing_fingerprints(documents: DataFrame) -> DataFrame:
    """Rolling-hash winnowing fingerprints (Schleimer et al., SIGMOD'03).

    Character k-gram hashes over the normalized text (rolling window of
    positions expressed as a vectorized ``transform`` over a position
    sequence — no per-row Python), then the minimum hash of every
    w-window of consecutive k-gram hashes, dedup'd: the classic
    plagiarism/near-dup document sketch. Output: one row per distinct
    fingerprint per doc.
    """
    from linkgraph_spark.functions.hashing import MERSENNE_P, md5_long

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = documents.select("doc_id", norm.alias("norm"))
    n_grams = F.greatest(F.length("norm") - F.lit(WINNOW_K - 1), F.lit(1))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: md5_long(F.col("norm").substr(i, F.lit(WINNOW_K))) % F.lit(MERSENNE_P),
    )
    d = d.select("doc_id", gram_hashes.alias("gh"))
    n_windows = F.greatest(F.size("gh") - F.lit(WINNOW_W - 1), F.lit(1))
    mins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice("gh", i, F.lit(WINNOW_W))),
        )
    )
    return d.select("doc_id", F.explode(mins).alias("fingerprint"))


def winnowing_fingerprints_sql(table: str = "documents") -> str:
    from linkgraph_spark.functions.hashing import MERSENNE_P, md5_long_sql

    gram_hash = md5_long_sql(f"substr(norm, CAST(i AS INT), {WINNOW_K})")
    return f"""
    WITH base AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM {table}
    ), grams AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(length(norm) - {WINNOW_K - 1}, 1) + 1),
               i -> {gram_hash} % {MERSENNE_P}) AS gh
      FROM base
    ), mins AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(gh) - {WINNOW_W - 1}, 1) + 1),
               i -> list_min(gh[i:i+{WINNOW_W - 1}]))) AS fps
      FROM grams
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM mins
    """



def tfidf_top_terms(documents: DataFrame, k: int = 5) -> DataFrame:
    """→ [doc_id, term, tfidf]: each document's top-k terms by tf·idf
    (idf = ln(N/df), ties broken by term asc on the 6-decimal-rounded
    score) — the classic keyword/feature extraction step of a training-data
    pipeline.

    Plan shape: token explode → (doc, term) count (map-side combine) →
    term doc-frequency aggregate → one join + broadcast of the 1-row corpus
    count → per-doc top-k window (partition bounded by the doc's DISTINCT
    term count, never the corpus vocabulary). All JVM-side expressions.
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = documents.agg(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("doc_id", "term", "tfidf")
    )


def tfidf_top_terms_sql(table: str = "documents", k: int = 5) -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT count(*) AS _n FROM {table}),
    scored AS (
      SELECT doc_id, term, round(tf * ln(_n / CAST(df AS DOUBLE)), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rk
      FROM scored
    ) WHERE rk <= {k}
    """


# --- PII redaction ----------------------------------------------------------
# Patterns deliberately avoid lookaround/backreferences so Java (Spark) and
# RE2-style (DuckDB) engines match identically; each is replaced globally.
REDACT_PATTERNS = [
    # order matters: IPs first, or the looser phone pattern swallows them
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "[EMAIL]"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
    # phone: 7-15 actual digits, at MOST TWO separators between consecutive
    # digits — two, not one, because ') ' and ' (' are standard (e.g.
    # '+1 (555) 123-4567'). The earlier [0-9() .-]{7,} form accepted any
    # >=9-char run of digits/separators — unbounded digit count AND
    # arbitrary separator runs — so long numeric IDs and padded numeric
    # tables got scrubbed. Remaining precision trade-off (documented in
    # redact_pii): digit-dense spans with short separators (ISO timestamps
    # '2026-08-17 12', 7+-digit decimals) still redact — no-lookaround
    # parity with RE2 forbids context assertions, and a scrub favors recall.
    (r"\+?[0-9]([() .-]{0,2}[0-9]){6,14}", "[PHONE]"),
]


def redact_pii(documents: DataFrame) -> DataFrame:
    """→ [doc_id, text]: the corpus with email / phone-like / IPv4 spans
    replaced by typed placeholders — the standard pre-training scrub pass.
    Map-only column expressions (chained ``regexp_replace``), column-pruned,
    whole-stage codegen; the patterns are restricted to syntax both Spark's
    Java regex and DuckDB's RE2 interpret identically, so the scrub is
    oracle-replayed exactly.

    Precision note: the phone pattern requires 7-15 digits with at most two
    ``() .-`` separator chars between digits. That excludes short numbers
    and separator runs; digit runs LONGER than 15 still lose their first 15
    digits to a greedy partial match (an unanchored regex cannot refuse a
    longer digit context), and digit-dense spans that LOOK phone-shaped
    (ISO timestamps like ``2026-08-17 12``, long decimals) are still
    redacted: distinguishing them needs lookaround, which RE2 (the oracle
    engine) lacks, and a PII scrub prefers false positives over leaks."""
    out = F.col("text")
    for pat, repl in REDACT_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return documents.select("doc_id", out.alias("text"))


def redact_pii_sql(table: str = "documents") -> str:
    expr = "text"
    for pat, repl in REDACT_PATTERNS:
        quoted = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{quoted}', '{repl}', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM {table}"


# --- corpus vocabulary ------------------------------------------------------
def vocab_stats(documents: DataFrame, top_n: int = 100) -> DataFrame:
    """→ [term, tf, df]: the corpus vocabulary table — total term count and
    document frequency for the ``top_n`` terms by total count (ties broken
    by term asc). The tokenizer-building / stopword-discovery view of the
    corpus (a BPE trainer's first pass is exactly this table), sharing
    :func:`tfidf_top_terms`'s whitespace tokenization so the two stay
    consistent.

    Plan shape: token explode → (doc, term) count with map-side combine →
    one term-level aggregate (sum + count ride one shuffle on ``term``) →
    global top-n. At corpus scale the vocabulary is Zipf-bounded (millions
    of terms from trillions of tokens), so the term aggregate is small and
    the single-partition top-n window is bounded by top_n, not vocabulary:
    rows are pre-pruned by a distributed sort-limit before the final order.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
    per_doc = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    vocab = per_doc.groupBy("term").agg(
        F.sum("tf").alias("tf"), F.count("*").alias("df")
    )
    # orderBy+limit = TakeOrderedAndProject (per-partition top-n, then a
    # top_n-sized merge on one reducer) — never a full global sort
    return vocab.orderBy(F.desc("tf"), F.asc("term")).limit(top_n)


def vocab_stats_sql(table: str = "documents", top_n: int = 100) -> str:
    return f"""
    WITH vtok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    vtf AS (SELECT doc_id, term, count(*) AS tf FROM vtok GROUP BY 1, 2)
    SELECT term, CAST(sum(tf) AS BIGINT) AS tf, count(*) AS df
    FROM vtf GROUP BY term
    ORDER BY sum(tf) DESC, term ASC LIMIT {top_n}
    """


# --- repetition / diversity quality signals ---------------------------------
def repetition_stats(documents: DataFrame) -> DataFrame:
    """→ [doc_id, unique_token_ratio, dup_bigram_fraction,
    top_token_fraction]: the Gopher-style repetition filters (Rae et al.
    2021, public recipe) — low unique-token ratio, high duplicate-bigram
    fraction, or one token dominating the document all flag boilerplate /
    degenerate generations that length and stopword checks miss.

    Map-only higher-order array expressions (no explode, no shuffle, no
    Python): tokens and bigrams stay inside one row's arrays, so the scan
    parallelism is the only parallelism needed — embarrassingly parallel
    at any corpus size. The per-row cost of top_token_fraction is
    O(tokens · distinct) — fine for real document lengths; swap to an
    explode+groupBy for pathological million-token rows."""
    toks = _tokens(F.lower(F.col("text")))
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    # guard n=1: Spark's sequence(1, 0) infers step -1 (descending), it is
    # NOT empty like DuckDB's range(1, 1) — branch to an empty array instead
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    n_bi_uniq = F.size(F.array_distinct(bigrams))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    return documents.select(
        "doc_id",
        F.round(n_uniq / n, 6).alias("unique_token_ratio"),
        F.round(
            F.when(n_bi > 0, (n_bi - n_bi_uniq) / n_bi).otherwise(F.lit(0.0)), 6
        ).alias("dup_bigram_fraction"),
        F.round(top_cnt / n, 6).alias("top_token_fraction"),
    )


def repetition_stats_sql(table: str = "documents") -> str:
    return f"""
    WITH rp AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM {table}
    ), feat AS (
      SELECT doc_id, toks, len(toks) AS n,
             list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bi
      FROM rp
    )
    SELECT doc_id,
           round(len(list_distinct(toks)) / CAST(n AS DOUBLE), 6)
             AS unique_token_ratio,
           round(CASE WHEN len(bi) > 0
                      THEN (len(bi) - len(list_distinct(bi))) / CAST(len(bi) AS DOUBLE)
                      ELSE 0.0 END, 6) AS dup_bigram_fraction,
           round(list_max(list_transform(list_distinct(toks),
                          t -> len(list_filter(toks, x -> x = t)))) / CAST(n AS DOUBLE), 6)
             AS top_token_fraction
    FROM feat
    """


# --- corpus-LM fluency score ------------------------------------------------
def unigram_lm_score(documents: DataFrame) -> DataFrame:
    """→ [doc_id, n_tokens, lm_score] — per-document mean log-likelihood
    under the corpus's own unigram MLE: ``lm_score = (1/n_d) Σ_t
    ln(count(t)/N)`` over the doc's token occurrences. The classic cheap
    fluency/outlier filter (CCNet's perplexity gate in spirit, with the
    corpus itself as the LM): gibberish and boilerplate-with-rare-symbols
    score far below prose. Shares the whitespace normalization of
    :func:`vocab_stats`/:func:`tfidf_top_terms` so all corpus-term views
    stay consistent.

    Plan shape: token explode → term-count agg (one shuffle on term,
    map-side combine, Zipf-bounded output) → token↔vocab equi-join on term
    → per-doc re-agg. At corpus scale the vocabulary is millions of rows
    against trillions of tokens — broadcast-eligible, so the term join
    need not shuffle the token stream a second time."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    total = tok.agg(F.count("*").alias("n_total"))
    return (
        tok.join(vocab, "term")
        .crossJoin(total)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("n_total"))), 6).alias(
                "lm_score"
            ),
        )
    )


def unigram_lm_score_sql(table: str = "documents") -> str:
    return f"""
    WITH lmtok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    lmvocab AS (SELECT term, count(*) AS cnt FROM lmtok GROUP BY term),
    lmtotal AS (SELECT count(*) AS n_total FROM lmtok)
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(ln(v.cnt * 1.0 / lmtotal.n_total)), 6) AS lm_score
    FROM lmtok t JOIN lmvocab v USING (term) CROSS JOIN lmtotal
    GROUP BY t.doc_id
    """


def doc_chunks(
    documents: DataFrame, chunk_size: int = 64, stride: int = 48
) -> DataFrame:
    """→ [doc_id, chunk_id, n_chunk_tokens, chunk_text]: sliding
    fixed-token-window chunking — the pre-tokenization split a training /
    retrieval pipeline runs so no downstream unit exceeds a context or
    embedding budget. Chunk ``i`` covers whitespace tokens
    ``[i*stride, i*stride + chunk_size)``; ``stride < chunk_size`` gives
    the standard overlap so no spanning passage is lost at a boundary; the
    last chunk may be short; every document (even empty text) yields ≥ 1
    chunk, so no row silently disappears.

    Scale shape: map-only — split + ``explode(sequence(...))`` + slice are
    all JVM array expressions inside whole-stage codegen; fan-out per row
    is ``1 + floor((n_tokens-1)/stride)``, linear in input size; no
    shuffle, no Python. (Spark's ``sequence`` is DESCENDING when end <
    start — n≥1 always holds here because splitting '' yields [''], so the
    end expression is never negative.)"""
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = _tokens(F.coalesce(F.col("text"), F.lit("")))
    n = F.size(toks)
    last_start = F.floor((n - F.lit(1)) / F.lit(stride)).cast("int")
    exploded = documents.select(
        "doc_id",
        toks.alias("__dc_toks"),
        F.explode(F.sequence(F.lit(0), last_start)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("__dc_toks"), F.col("chunk_id") * F.lit(stride) + F.lit(1), chunk_size
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def doc_chunks_sql(
    table: str = "documents", chunk_size: int = 64, stride: int = 48
) -> str:
    """Self-contained DuckDB mirror of :func:`doc_chunks` (1-based
    inclusive list slicing on DuckDB's side, same token windows)."""
    return f"""
    WITH dc_base AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks
      FROM {table}
    ),
    dc_e AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(floor((len(toks) - 1) / {stride}) AS BIGINT)
                             + 1)) AS chunk_id
      FROM dc_base
    )
    SELECT doc_id, chunk_id,
           CAST(len(toks[(chunk_id * {stride} + 1):
                         (chunk_id * {stride} + {chunk_size})]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(toks[(chunk_id * {stride} + 1):
                                (chunk_id * {stride} + {chunk_size})], ' ')
             AS chunk_text
    FROM dc_e
    """


def corpus_stats(documents: DataFrame) -> DataFrame:
    """→ [lang, n_docs, total_tokens, mean_chars, p50_chars]: the
    per-language corpus profile a curation dashboard reads (volume by
    stratum, token budget, length distribution center). One grouped
    aggregate over a map-only projection; the exact median rides the same
    agg (Spark ``percentile`` == DuckDB ``quantile_cont`` linear
    interpolation, so the oracle replays it)."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    return (
        documents.select(
            "lang",
            F.size(_tokens(txt)).alias("t"),
            F.length(txt).alias("c"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("t").cast("long").alias("total_tokens"),
            F.round(F.avg("c"), 6).alias("mean_chars"),
            F.round(F.expr("percentile(c, 0.5D)"), 6).alias("p50_chars"),
        )
    )


def corpus_stats_sql(table: str = "documents") -> str:
    return f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(coalesce(text, '')),
                                           '\\s+'))) AS BIGINT) AS total_tokens,
           round(avg(length(coalesce(text, ''))), 6) AS mean_chars,
           round(quantile_cont(length(coalesce(text, '')), 0.5), 6) AS p50_chars
    FROM {table}
    GROUP BY lang
    """


def oov_rate(documents: DataFrame, vocab_size: int = 100) -> DataFrame:
    """→ ``[doc_id, n_tokens, n_oov, oov_rate]`` — vocabulary-coverage
    audit: the fraction of each document's token occurrences that fall
    outside the corpus's top-``vocab_size`` vocabulary (by total count,
    ties term asc — exactly :func:`vocab_stats`'s head). The tokenizer-fit
    signal every pretraining pipeline checks before committing a vocab:
    docs with high OOV under the candidate vocabulary are the ones a
    fixed tokenizer will shred into bytes. Shares the whitespace
    normalization of :func:`vocab_stats`/:func:`tfidf_top_terms`.

    Scale shape: one term-count aggregate (map-side combine,
    Zipf-bounded) feeding a distributed sort-limit (TakeOrdered — never a
    full sort); the vocab head is ``vocab_size`` rows, broadcast to a
    map-only membership join against the token stream; then one per-doc
    re-aggregate. The token stream shuffles once (on doc_id).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("_cnt"))
        .orderBy(F.desc("_cnt"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("_inv"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") * 1.0 / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def oov_rate_sql(table: str = "documents", vocab_size: int = 100) -> str:
    """DuckDB oracle for :func:`oov_rate`."""
    return f"""
    WITH otok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ), ovocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS cnt FROM otok GROUP BY term
        ORDER BY cnt DESC, term ASC LIMIT {int(vocab_size)})
    ), oflag AS (
      SELECT t.doc_id,
             CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM otok t LEFT JOIN ovocab v ON v.term = t.term
    )
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(sum(oov) * 1.0 / count(*), 6) AS oov_rate
    FROM oflag GROUP BY doc_id
    """


def bigram_lm_score(documents: DataFrame) -> DataFrame:
    """→ ``[doc_id, n_bigrams, lm_score]`` — per-document mean conditional
    log-likelihood under the corpus's own bigram MLE: ``lm_score = (1/m_d)
    Σ ln( C(w1 w2) / C(w1 ·) )`` over the doc's bigram occurrences, where
    ``C(w1 ·)`` counts w1 as a bigram head. The order-sensitive upgrade of
    :func:`unigram_lm_score` (the CCNet-style perplexity gate one n-gram
    deeper): scrambled or templated text scores low even when its unigram
    mix looks fluent. Documents with fewer than two tokens have no
    bigrams and drop out (no conditional likelihood is defined for them).
    Shares :func:`repetition_stats`'s tokenizer and n=1 guard.

    Scale shape: map-only bigram construction (higher-order array
    expressions, no per-token explode until the long form), then two
    Zipf-bounded count aggregates (bigram table, head table) joined back
    on the bigram stream — broadcast-eligible at corpus scale, exactly
    the :func:`unigram_lm_score` join shape — and one per-doc re-agg.
    """
    toks = _tokens(F.lower(F.col("text")))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = documents.select("doc_id", F.explode(bigrams).alias("bg"))
    cb = bg.groupBy("bg").agg(F.count("*").alias("_cb"))
    c1 = bg.groupBy(F.substring_index("bg", " ", 1).alias("_w1")).agg(
        F.count("*").alias("_c1")
    )
    return (
        bg.join(cb, "bg")
        .join(c1, F.substring_index("bg", " ", 1) == F.col("_w1"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("_cb") * 1.0 / F.col("_c1"))), 6).alias(
                "lm_score"
            ),
        )
    )


def bigram_lm_score_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`bigram_lm_score`."""
    return f"""
    WITH blt AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM {table}
    ), blg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM blt
    ), blcb AS (
      SELECT bg, count(*) AS cb FROM blg GROUP BY bg
    ), blc1 AS (
      SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1
      FROM blg GROUP BY 1
    )
    SELECT b.doc_id, count(*) AS n_bigrams,
           round(avg(ln(cb.cb * 1.0 / c1.c1)), 6) AS lm_score
    FROM blg b
    JOIN blcb cb USING (bg)
    JOIN blc1 c1 ON c1.w1 = split_part(b.bg, ' ', 1)
    GROUP BY b.doc_id
    """


def term_pmi(
    documents: DataFrame,
    min_df: int = 5,
    max_df_frac: float = 0.2,
    min_pair: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """→ ``[term_a, term_b, n_docs_both, pmi]`` — the ``top_n`` term
    associations by document-level pointwise mutual information:
    pmi = ln(P(a,b) / (P(a)·P(b))) over document co-occurrence, the
    collocation / phrase-mining view of the corpus (term_a < term_b,
    ties broken by the pair). Terms outside [``min_df``,
    ``max_df_frac``·N] docs are excluded — rare terms give unstable
    estimates, corpus-wide boilerplate gives none — and pairs must
    co-occur in at least ``min_pair`` docs. Shares :func:`vocab_stats`'s
    normalization so vocabulary views stay consistent.

    Plan shape: distinct (doc, term) explode → one df aggregate on term →
    a broadcast-size filtered vocabulary rejoined to prune the explode →
    pair equi-join on ``doc_id`` whose fan-out is C(terms-per-doc, 2),
    bounded by document length (a constant, not data volume) → one pair
    aggregate. PMI multiplies as (n_ab/n_a)·(N/n_b) in both engines —
    same IEEE order, no bigint overflow at corpus scale.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    dt = (
        documents.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
        .distinct()
    )
    n_docs = documents.select(F.countDistinct("doc_id").alias("_n"))
    dfreq = dt.groupBy("term").agg(F.count("*").alias("_df"))
    keep = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .where(
            (F.col("_df") >= min_df)
            & (F.col("_df") <= F.col("_n") * F.lit(float(max_df_frac)))
        )
        .select("term", "_df")
    )
    kept = dt.join(F.broadcast(keep), "term").select("doc_id", "term", "_df")
    a = kept.select(
        "doc_id", F.col("term").alias("term_a"), F.col("_df").alias("_dfa")
    )
    b = kept.select(
        "doc_id", F.col("term").alias("term_b"), F.col("_df").alias("_dfb")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "_dfa", "_dfb")
        .agg(F.count("*").alias("n_docs_both"))
        .where(F.col("n_docs_both") >= min_pair)
    )
    pmi = F.round(
        F.log(
            (F.col("n_docs_both") * 1.0 / F.col("_dfa"))
            * (F.col("_n") * 1.0 / F.col("_dfb"))
        ),
        6,
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select("term_a", "term_b", "n_docs_both", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
        .limit(top_n)
    )


def term_pmi_sql(
    table: str = "documents",
    min_df: int = 5,
    max_df_frac: float = 0.2,
    min_pair: int = 5,
    top_n: int = 50,
) -> str:
    """DuckDB oracle for :func:`term_pmi` (standalone query)."""
    return f"""
    WITH pmt AS (
      SELECT DISTINCT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    pmn AS (SELECT count(DISTINCT doc_id) AS n FROM {table}),
    pmdf AS (SELECT term, count(*) AS df FROM pmt GROUP BY term),
    pmkeep AS (
      SELECT term, df FROM pmdf CROSS JOIN pmn
      WHERE df >= {int(min_df)} AND df <= n * {float(max_df_frac)!r}
    ),
    pmkept AS (
      SELECT t.doc_id, t.term, k.df FROM pmt t JOIN pmkeep k USING (term)
    ),
    pmpair AS (
      SELECT a.term AS term_a, b.term AS term_b, a.df AS dfa, b.df AS dfb,
             count(*) AS n_docs_both
      FROM pmkept a JOIN pmkept b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2, 3, 4
      HAVING count(*) >= {int(min_pair)}
    )
    SELECT term_a, term_b, n_docs_both,
           round(ln((n_docs_both * 1.0 / dfa) * (n.n * 1.0 / dfb)), 6) AS pmi
    FROM pmpair CROSS JOIN pmn n
    ORDER BY pmi DESC, term_a ASC, term_b ASC LIMIT {int(top_n)}
    """


def char_entropy(documents: DataFrame) -> DataFrame:
    """→ ``[doc_id, n_chars_used, distinct_chars, entropy]`` — per-document
    Shannon entropy (nats) of the character distribution, the classic
    gibberish / compression-ratio proxy quality signal: natural text sits
    in a stable band, base64 blobs and aaaa-runs fall far outside it.
    Characters are whatever ``.`` matches (newlines excluded identically
    by Java and RE2 regex); zero-char documents get entropy 0.0.

    Plan shape: one explode + two hash aggregates keyed by
    (doc, char) then doc — per-doc state is bounded by the alphabet, and
    the aggregate is map-side combinable; no windows, no joins.
    """
    chars = documents.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(coalesce(text, ''), '.', 0)")
        ).alias("ch"),
    )
    per = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("distinct_chars"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("_clogc"),
    )
    # H = ln n − (Σ c·ln c)/n  (single-division form — same FP ops as SQL)
    ent = F.round(
        F.log(F.col("n").cast("double")) - F.col("_clogc") / F.col("n"), 6
    )
    out = agg.select(
        "doc_id",
        F.col("n").alias("n_chars_used"),
        "distinct_chars",
        ent.alias("entropy"),
    )
    empty = documents.join(out, "doc_id", "left_anti").select(
        "doc_id",
        F.lit(0).cast("long").alias("n_chars_used"),
        F.lit(0).cast("long").alias("distinct_chars"),
        F.lit(0.0).alias("entropy"),
    )
    return out.unionByName(empty)


def char_entropy_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`char_entropy` (standalone query)."""
    return f"""
    WITH cec AS (
      SELECT doc_id,
             unnest(regexp_extract_all(coalesce(text, ''), '.')) AS ch
      FROM {table}
    ),
    cep AS (SELECT doc_id, ch, count(*) AS c FROM cec GROUP BY 1, 2),
    cea AS (
      SELECT doc_id, sum(c) AS n, count(*) AS distinct_chars,
             sum(c * ln(CAST(c AS DOUBLE))) AS clogc
      FROM cep GROUP BY doc_id
    ),
    ceo AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_chars_used, distinct_chars,
             round(ln(CAST(n AS DOUBLE)) - clogc / n, 6) AS entropy
      FROM cea
    )
    SELECT * FROM ceo
    UNION ALL
    SELECT d.doc_id, 0, 0, 0.0 FROM {table} d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM ceo)
    """


def zipf_slope(documents: DataFrame, top_n: int = 5000) -> DataFrame:
    """→ one row ``[n_terms, zipf_slope]`` — least-squares slope of
    ln(term frequency) against ln(rank) over the ``top_n`` most frequent
    terms (rank 1 = most frequent, ties by term asc). Healthy natural-
    language corpora sit near −1 (Zipf's law); a synthetic or
    template-heavy corpus drifts flat. Shares :func:`vocab_stats`'s
    tokenization.

    Plan shape: the vocabulary aggregate is Zipf-bounded; the top_n cut
    is a TakeOrdered (no global sort), and the rank window then runs
    over ≤ top_n rows — bounded by the parameter, not the corpus. The
    slope is four sums + one closed-form division, identical operation
    order in both engines.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(F.explode(F.split(norm, " ")).alias("term"))
    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    xy = vocab.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_terms"), F.round(slope, 6).alias("zipf_slope")
    )


def zipf_slope_sql(table: str = "documents", top_n: int = 5000) -> str:
    """DuckDB oracle for :func:`zipf_slope` (standalone query)."""
    return f"""
    WITH zst AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    zsv AS (
      SELECT term, count(*) AS tf FROM zst GROUP BY term
      ORDER BY tf DESC, term ASC LIMIT {int(top_n)}
    ),
    zsxy AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY tf DESC, term ASC) AS DOUBLE)) AS x,
             ln(CAST(tf AS DOUBLE)) AS y
      FROM zsv
    ),
    zss AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM zsxy
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
    FROM zss
    """


def tfidf_doc_pairs(
    documents: DataFrame,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    min_sim: float = 0.5,
    min_shared: int = 2,
    max_df_abs: int = 10_000,
) -> DataFrame:
    """→ ``[doc_a, doc_b, n_shared_terms, cosine]`` — sparse TF-IDF cosine
    similarity join: document pairs whose tf·idf vectors (over the
    df-banded vocabulary) have cosine ≥ ``min_sim`` and at least
    ``min_shared`` common terms. The lexical companion to the embedding
    near-dup pass — catches template reuse that survives token-level
    shingle dedup. Shares :func:`tfidf_top_terms`'s weighting
    (idf = ln(N/df)).

    Plan shape: candidates come from the term-keyed equi-join over the
    banded vocabulary. The band's upper edge is
    min(``max_df_frac``·N, ``max_df_abs``): the fraction drops corpus
    boilerplate, and the ABSOLUTE cap is the scale guarantee — per-term
    fan-out is C(max_df_abs, 2) no matter how large the corpus grows
    (the df-cut of sparse all-pairs similarity, cf. Bayardo et al.
    WWW'07; same lever as the hot-shingle cap in
    ``dedup.ngram_jaccard_dups``). The verify is one grouped sum per
    surviving pair. Per-doc norms are rounded (9 dp) before reuse so
    both engines feed identical doubles into the cosine.
    """
    norm_txt = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "doc_id", F.explode(F.split(norm_txt, " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = documents.agg(F.count("*").alias("_n"))
    banded = (
        dfreq.crossJoin(F.broadcast(nd))
        .where(
            (F.col("df") >= min_df)
            & (
                F.col("df")
                <= F.least(
                    F.col("_n") * F.lit(float(max_df_frac)),
                    F.lit(float(max_df_abs)),
                )
            )
        )
        .select("term", "df", "_n")
    )
    w = F.col("tf") * F.log(F.col("_n") * 1.0 / F.col("df"))
    weighted = tf.join(F.broadcast(banded), "term").select(
        "doc_id", "term", w.alias("w")
    )
    norms = weighted.groupBy("doc_id").agg(
        F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), 9).alias("nrm")
    )
    kept = weighted.join(norms, "doc_id")
    a = kept.select(
        "term",
        F.col("doc_id").alias("doc_a"),
        F.col("w").alias("wa"),
        F.col("nrm").alias("na"),
    )
    b = kept.select(
        "term",
        F.col("doc_id").alias("doc_b"),
        F.col("w").alias("wb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(
            F.count("*").alias("n_shared_terms"),
            F.sum(F.col("wa") * F.col("wb")).alias("_dot"),
        )
        .where(F.col("n_shared_terms") >= min_shared)
    )
    cosine = F.round(F.col("_dot") / (F.col("na") * F.col("nb")), 6)
    return (
        pairs.select("doc_a", "doc_b", "n_shared_terms", cosine.alias("cosine"))
        .where(F.col("cosine") >= min_sim)
    )


def tfidf_doc_pairs_sql(
    table: str = "documents",
    min_df: int = 2,
    max_df_frac: float = 0.5,
    min_sim: float = 0.5,
    min_shared: int = 2,
    max_df_abs: int = 10_000,
) -> str:
    """DuckDB oracle for :func:`tfidf_doc_pairs` (standalone query)."""
    return f"""
    WITH tdt AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    tdtf AS (SELECT doc_id, term, count(*) AS tf FROM tdt GROUP BY 1, 2),
    tddf AS (SELECT term, count(*) AS df FROM tdtf GROUP BY term),
    tdn AS (SELECT count(*) AS n FROM {table}),
    tdband AS (
      SELECT term, df, n FROM tddf CROSS JOIN tdn
      WHERE df >= {int(min_df)}
        AND df <= least(n * {float(max_df_frac)!r}, {float(max_df_abs)!r})
    ),
    tdw AS (
      SELECT t.doc_id, t.term, t.tf * ln(b.n * 1.0 / b.df) AS w
      FROM tdtf t JOIN tdband b USING (term)
    ),
    tdnorm AS (
      SELECT doc_id, round(sqrt(sum(w * w)), 9) AS nrm
      FROM tdw GROUP BY doc_id
    ),
    tdk AS (
      SELECT w.doc_id, w.term, w.w, n.nrm
      FROM tdw w JOIN tdnorm n USING (doc_id)
    ),
    tdpair AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nrm AS na, b.nrm AS nb,
             count(*) AS n_shared_terms, sum(a.w * b.w) AS dot
      FROM tdk a JOIN tdk b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING count(*) >= {int(min_shared)}
    )
    SELECT doc_a, doc_b, n_shared_terms,
           round(dot / (na * nb), 6) AS cosine
    FROM tdpair
    WHERE round(dot / (na * nb), 6) >= {float(min_sim)!r}
    """


def length_deciles(documents: DataFrame) -> DataFrame:
    """→ ``[doc_id, n_chars, decile]`` — each document's corpus length
    decile (1 = shortest 10%, 10 = longest) from exact interpolated
    percentile cuts — the quantile-binned length feature curation rules
    and batch-shape heuristics key on. A document equal to a cut belongs
    to the lower bin (decile = 1 + #cuts strictly below its length).

    Plan shape: ONE percentile aggregate over the length column (a single
    9-value row, broadcast back), then a map-only bin expression — no
    global sort, no ntile window over the corpus.
    """
    ps = [round(0.1 * i, 1) for i in range(1, 10)]
    arr = ", ".join(str(p) for p in ps)
    cuts = documents.agg(
        F.expr(f"percentile(n_chars, array({arr}))").alias("_cuts")
    )
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + F.when(
            F.col("n_chars") > F.element_at("_cuts", i), 1
        ).otherwise(0)
    return (
        documents.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id", "n_chars", decile.cast("int").alias("decile")
        )
    )


def length_deciles_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`length_deciles` (standalone query)."""
    ps = [round(0.1 * i, 1) for i in range(1, 10)]
    arr = ", ".join(str(p) for p in ps)
    adds = " + ".join(
        f"(CASE WHEN d.n_chars > c.cuts[{i}] THEN 1 ELSE 0 END)"
        for i in range(1, 10)
    )
    return f"""
    WITH ldc AS (
      SELECT quantile_cont(n_chars, [{arr}]) AS cuts FROM {table}
    )
    SELECT d.doc_id, d.n_chars, CAST(1 + {adds} AS INT) AS decile
    FROM {table} d CROSS JOIN ldc c
    """


def bpe_merges(documents: DataFrame, merges: int = 8) -> DataFrame:
    """→ [rank, left, right, merged, pair_count] — the first ``merges``
    byte-pair-encoding merge rules learned from the corpus (Sennrich et
    al. 2016: words split to characters + a ``</w>`` end-of-word token;
    each round merges the globally most frequent adjacent token pair,
    ties broken by (left asc, right asc)). This is tokenizer TRAINING —
    the step every LLM data pipeline runs over exactly this kind of
    corpus before anything else can count tokens; :func:`vocab_stats` is
    its first pass, this is the loop.

    Fully distributed, zero Python in the hot path: pair counting is an
    explode + map-side-combinable aggregate over the WORD-TYPE table
    (Zipf-bounded like the vocabulary — the stream's word count collapses
    to |vocab| rows first, so each round's jobs run on the tiny type
    table weighted by frequency); the argmax is a TakeOrdered limit(1);
    applying a merge is a JVM higher-order ``aggregate`` fold over each
    token array (greedy left-to-right, the standard BPE application
    order). Driver state per round is ONE (left, right, count) row.
    Rows-only gate entry: the k-round argmax fixpoint is not
    SQL-expressible without k-fold unrolled re-tokenisation; pinned by an
    exact pure-python reference in pytest instead (like ``boruvka_msf``).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    words = documents.select(F.explode(F.split(norm, " ")).alias("w")).where(
        F.length("w") > 0
    )
    wf = words.groupBy("w").agg(F.count("*").alias("freq"))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")), lambda i: F.col("w").substr(i, F.lit(1))
    )
    cur = wf.select(
        "freq", F.concat(chars, F.array(F.lit("</w>"))).alias("toks")
    ).persist()
    cur.count()  # pin the tokenised type table before iterating
    spark = documents.sparkSession
    out: list = []
    try:
        for r in range(1, merges + 1):
            pairs = cur.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1),"
                        " i -> struct(element_at(toks, i) AS l,"
                        "             element_at(toks, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
            merged = left + right
            out.append((r, left, right, merged, cnt))
            nxt = cur.select(
                "freq",
                F.aggregate(
                    "toks",
                    F.array().cast("array<string>"),
                    lambda acc, t: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(left))
                        & (t == F.lit(right)),
                        F.concat(
                            F.slice(acc, F.lit(1), F.size(acc) - 1),
                            F.array(F.lit(merged)),
                        ),
                    ).otherwise(F.concat(acc, F.array(t))),
                ).alias("toks"),
            ).persist()
            nxt.count()  # materialise before freeing the previous round
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        out, "rank int, left string, right string, merged string, pair_count long"
    )


def pii_counts(documents: DataFrame) -> DataFrame:
    """→ [doc_id, n_email, n_ip, n_phone, has_pii] — how much PII
    :func:`redact_pii` WOULD scrub, per document, without touching the
    text: the audit/reporting half of the PII family (detect → count →
    redact). Counting follows the same sequential semantics as the
    redactor — each pattern is counted on the text AFTER the earlier
    patterns are replaced (so an IPv4 octet run is never double-counted
    as a phone number).

    Scale shape: map-only chained ``regexp_count``/``regexp_replace``
    column expressions, column-pruned, whole-stage codegen — zero shuffle.
    """
    cur = F.col("text")
    counts = []
    for pat, repl in REDACT_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    n_email, n_ip, n_phone = counts
    return documents.select(
        "doc_id",
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
        ((n_email + n_ip + n_phone) > 0).alias("has_pii"),
    )


def pii_counts_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`pii_counts`."""
    cur = "text"
    counts = []
    for pat, repl in REDACT_PATTERNS:
        quoted = pat.replace("'", "''")
        counts.append(f"len(regexp_extract_all({cur}, '{quoted}'))")
        cur = f"regexp_replace({cur}, '{quoted}', '{repl}', 'g')"
    n_email, n_ip, n_phone = counts
    return f"""
    SELECT doc_id,
           {n_email} AS n_email,
           {n_ip} AS n_ip,
           {n_phone} AS n_phone,
           ({n_email} + {n_ip} + {n_phone}) > 0 AS has_pii
    FROM {table}
    """


def quality_curve(
    documents: DataFrame, thresholds: tuple = (0.25, 0.5, 0.75, 1.0)
) -> DataFrame:
    """→ [threshold, n_retained, frac_retained, mean_quality] — the
    retention curve over :func:`quality_score` cutoffs: for each
    candidate threshold, how much corpus survives a ``quality >= t``
    filter and what the survivors' mean quality is. This is the table a
    curation owner reads to PICK the cutoff (the knee where retained
    fraction drops faster than quality rises) before wiring it into
    :func:`~linkgraph_spark.functions.curation.curate_corpus`.

    Scale shape: one :func:`quality_score` map pass, then ONE global
    aggregate computing every threshold's cells as conditional sums
    (map-side combinable, O(1) state per threshold) — the corpus is
    scanned once regardless of how many thresholds are probed; output is
    |thresholds| rows via a driver-free melt.
    """
    q = quality_score(documents).select("quality")
    aggs = []
    for i, t in enumerate(thresholds):
        keep = F.when(F.col("quality") >= t, 1).otherwise(0)
        aggs += [
            F.sum(keep).alias(f"_n{i}"),
            F.round(F.sum(keep) * 1.0 / F.count("*"), 6).alias(f"_f{i}"),
            F.round(
                F.sum(F.when(F.col("quality") >= t, F.col("quality"))) / F.sum(keep),
                6,
            ).alias(f"_m{i}"),
        ]
    one = q.agg(*aggs)
    rows = [
        F.struct(
            F.lit(float(t)).alias("threshold"),
            F.col(f"_n{i}").alias("n_retained"),
            F.col(f"_f{i}").alias("frac_retained"),
            F.col(f"_m{i}").alias("mean_quality"),
        )
        for i, t in enumerate(thresholds)
    ]
    return one.select(F.explode(F.array(*rows)).alias("z")).select("z.*")


def quality_curve_sql(
    table: str = "documents", thresholds: tuple = (0.25, 0.5, 0.75, 1.0)
) -> str:
    """DuckDB oracle for :func:`quality_curve` — reuses the quality_score
    oracle in a subquery scope, one UNION ALL row per threshold."""
    qs = quality_score_sql(table)
    rows = "\n    UNION ALL ".join(
        f"SELECT CAST({float(t)} AS DOUBLE) AS threshold,"
        f" sum(CASE WHEN quality >= {float(t)} THEN 1 ELSE 0 END) AS n_retained,"
        f" round(sum(CASE WHEN quality >= {float(t)} THEN 1 ELSE 0 END) * 1.0"
        f"       / count(*), 6) AS frac_retained,"
        f" round(sum(CASE WHEN quality >= {float(t)} THEN quality END)"
        f"       / sum(CASE WHEN quality >= {float(t)} THEN 1 ELSE 0 END), 6)"
        f" AS mean_quality"
        f" FROM qc_scores"
        for t in thresholds
    )
    return f"""
    WITH qc_scores AS (
      SELECT quality FROM ({qs})
    )
    {rows}
    """


def top_bigrams(documents: DataFrame, top_n: int = 20) -> DataFrame:
    """→ [bg, tf, df] — the ``top_n`` corpus bigrams by total occurrence
    count (ties by bigram asc) with their document frequency. The
    order-sensitive companion of :func:`vocab_stats`: collocations and
    boilerplate templates surface here long before any parser runs, and
    a BPE/wordpiece trainer's pair-frequency seed is exactly this table.
    Shares :func:`bigram_lm_score`'s bigram construction (higher-order
    array expressions, n<2 guard) and :func:`vocab_stats`'s top-n shape.

    Scale shape: map-only bigram arrays → one (doc, bigram) count with
    map-side combine → one bigram-level aggregate (sum + count on one
    shuffle) → distributed sort-limit (TakeOrderedAndProject), never a
    full global sort. The bigram vocabulary is Zipf-bounded like the
    unigram one, an order of magnitude wider but still tiny next to the
    token stream.
    """
    toks = _tokens(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = documents.select("doc_id", F.explode(bigrams).alias("bg"))
    per_doc = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    vocab = per_doc.groupBy("bg").agg(
        F.sum("tf").alias("tf"), F.count("*").alias("df")
    )
    return vocab.orderBy(F.desc("tf"), F.asc("bg")).limit(top_n)


def top_bigrams_sql(table: str = "documents", top_n: int = 20) -> str:
    """DuckDB oracle for :func:`top_bigrams`."""
    return f"""
    WITH tbt AS (
      SELECT doc_id,
             string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS toks
      FROM {table}
    ), tbg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM tbt
    ), tbf AS (
      SELECT doc_id, bg, count(*) AS tf FROM tbg GROUP BY 1, 2
    )
    SELECT bg, CAST(sum(tf) AS BIGINT) AS tf, count(*) AS df
    FROM tbf GROUP BY bg
    ORDER BY sum(tf) DESC, bg ASC LIMIT {top_n}
    """


def normalize_text(documents: DataFrame) -> DataFrame:
    """→ ``[doc_id, norm_text, n_norm_chars, changed]`` — the canonical
    text-normalization pass a corpus gets before dedup/fingerprinting
    (casefold + whitespace collapse + trim): lowercase, squeeze runs of
    ``[ \\t\\r\\n]`` to one space, strip leading/trailing space. NULL text
    normalizes to the empty string. ``changed`` marks rows the pass
    actually touched (the audit column: a 0.1 % changed-rate on a clean
    recrawl is a red flag for upstream drift). The regex stays inside the
    Java-regex ∩ RE2 common subset (explicit char class, no ``\\s``) so
    the oracle replays it byte-for-byte.

    Scale shape: map-only JVM expressions — no shuffle, no Python."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce("text", F.lit(""))), "[ \t\r\n]+", " ")
    )
    return documents.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("n_norm_chars"),
        (norm != F.coalesce("text", F.lit(""))).alias("changed"),
    )


def normalize_text_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`normalize_text` (standalone query)."""
    norm = (
        "trim(regexp_replace(lower(coalesce(text, '')), "
        "'[ \t\r\n]+', ' ', 'g'))"
    )
    return f"""
    SELECT doc_id,
           {norm} AS norm_text,
           length({norm}) AS n_norm_chars,
           ({norm} <> coalesce(text, '')) AS changed
    FROM {table}
    """


def bm25(
    documents: DataFrame,
    queries: list,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """→ [query_id, doc_id, score] — Okapi BM25 retrieval scoring
    (Robertson–Spärck Jones; Lucene's non-negative idf variant
    ``ln(1 + (N − df + 0.5)/(df + 0.5))``): the top ``top_n`` documents
    per query string, whitespace-tokenized with the corpus conventions of
    :func:`tfidf_top_terms`. Docs sharing no term with a query are not
    candidates; score ties break on ``doc_id`` after the 6-dp round.

    Scale shape: tokenize → (doc, term) tf + per-doc length (one pass),
    df/avgdl aggregates, then a BROADCAST join of the (tiny) query-term
    table against the posting lists. The per-query top-n is TWO-PHASE —
    phase 1 ranks within (query, hash-sub-bucket) so a query matching
    half the corpus never lands on one reducer, phase 2 re-ranks the
    ≤ 64·top_n survivors — the ``sampling._stratified_top_budget``
    discipline applied to a score ordering.
    """
    from pyspark.sql import Window

    spark = documents.sparkSession
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = documents.agg(F.count("*").alias("_n"))
    avg = dl.agg((F.sum("dl") / F.count("*")).alias("avgdl"))
    qrows = [
        (qi, t)
        for qi, qs in enumerate(queries)
        for t in dict.fromkeys(qs.lower().split())  # dedup, keep order
    ]
    qterms = spark.createDataFrame(qrows, "query_id int, term string")
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avg))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    idf
                    * F.col("tf")
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                    )
                ),
                6,
            ).alias("score")
        )
    )
    # two-phase per-query top-n (no single-reducer rank at scale)
    from linkgraph_spark.functions.hashing import md5_long

    bkt = F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(64))
    w1 = Window.partitionBy("query_id", "_b").orderBy(F.desc("score"), F.asc("doc_id"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("_b", bkt)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= top_n)
        .withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= top_n)
        .select("query_id", "doc_id", "score")
        .localCheckpoint()
    )
    tf.unpersist()
    return out


def bm25_sql(
    table: str,
    queries: list,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> str:
    """DuckDB oracle for :func:`bm25` — single-window top-n (provably
    equal to the engine's two-phase plan: phase 1 only drops rows beaten
    by ≥ top_n same-query rows)."""
    qvals = ",\n        ".join(
        "({}, '{}')".format(qi, t.replace("'", "''"))
        for qi, qs in enumerate(queries)
        for t in dict.fromkeys(qs.lower().split())
    )
    return f"""
    WITH bm_tok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    bm_tf AS MATERIALIZED (
      SELECT doc_id, term, count(*) AS tf FROM bm_tok GROUP BY 1, 2
    ),
    bm_dl AS (SELECT doc_id, sum(tf) AS dl FROM bm_tf GROUP BY doc_id),
    bm_df AS (SELECT term, count(*) AS df FROM bm_tf GROUP BY term),
    bm_n AS (SELECT count(*) AS n FROM {table}),
    bm_avg AS (SELECT sum(dl) * 1.0 / count(*) AS avgdl FROM bm_dl),
    bm_q(query_id, term) AS (VALUES
        {qvals}
    ),
    bm_scored AS (
      SELECT q.query_id, t.doc_id,
             round(sum(
               ln(1.0 + (n.n - f.df + 0.5) / (f.df + 0.5))
               * t.tf / (t.tf + {k1} * ({1 - b:.17g} + {b} * l.dl / a.avgdl))
             ), 6) AS score
      FROM bm_tf t
      JOIN bm_q q ON q.term = t.term
      JOIN bm_df f ON f.term = t.term
      JOIN bm_dl l ON l.doc_id = t.doc_id
      CROSS JOIN bm_n n CROSS JOIN bm_avg a
      GROUP BY q.query_id, t.doc_id
    )
    SELECT query_id, doc_id, score FROM (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rk
      FROM bm_scored
    ) WHERE rk <= {top_n}
    """


def vocab_growth(documents: DataFrame, bucket_width: int = 50) -> DataFrame:
    """→ ``[bucket, n_docs, n_tokens, new_terms, docs_cum, tokens_cum,
    vocab_cum, heaps_exp]`` — the Heaps'-law vocabulary-growth curve in
    ``doc_id`` order: per bucket of ``bucket_width`` doc-ids, how many
    NEVER-SEEN-BEFORE terms appear, plus cumulative docs/tokens/vocab
    and the running exponent ``β = ln V / ln n`` (Heaps: V = K·n^β,
    β ≈ 0.4–0.6 for natural text; a β that jumps mid-corpus flags an
    ingest-source change, template spam, or an encoding break). The
    growth-side complement of :func:`zipf_slope`'s static rank curve.

    Scale shape: the same first-seen trick as the densification curve —
    ONE grouped min over the (term → min doc_id) table (Zipf-bounded)
    and one per-doc token count; everything after runs on #buckets rows
    with a tiny cumulative window. No sort over docs, no re-scan per
    bucket.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
    bkt = lambda c: (F.floor(c / bucket_width) * bucket_width).cast("long")  # noqa: E731
    first = tok.groupBy("term").agg(F.min("doc_id").alias("fd"))
    terms_b = first.groupBy(bkt(F.col("fd")).alias("bucket")).agg(
        F.count("*").alias("new_terms")
    )
    docs_b = documents.groupBy(bkt(F.col("doc_id")).alias("bucket")).agg(
        F.count("*").alias("n_docs")
    )
    toks_b = tok.groupBy(bkt(F.col("doc_id")).alias("bucket")).agg(
        F.count("*").alias("n_tokens")
    )
    per = (
        docs_b.join(toks_b, "bucket", "full")
        .join(terms_b, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("new_terms", F.lit(0)).alias("new_terms"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "new_terms",
        F.sum("n_docs").over(w).alias("docs_cum"),
        F.sum("n_tokens").over(w).alias("tokens_cum"),
        F.sum("new_terms").over(w).alias("vocab_cum"),
    )
    return cum.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "new_terms",
        "docs_cum",
        "tokens_cum",
        "vocab_cum",
        F.when(
            (F.col("tokens_cum") > 1) & (F.col("vocab_cum") > 0),
            F.round(
                F.log(F.col("vocab_cum").cast("double"))
                / F.log(F.col("tokens_cum").cast("double")),
                6,
            ),
        ).alias("heaps_exp"),
    )


def vocab_growth_sql(table: str = "documents", bucket_width: int = 50) -> str:
    """DuckDB oracle for :func:`vocab_growth` (standalone query)."""
    W = int(bucket_width)
    return f"""
    WITH vg_tok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    vg_first AS (
      SELECT CAST(floor(doc_id / {W}) AS BIGINT) * {W} AS bucket,
             count(*) AS new_terms
      FROM (SELECT term, min(doc_id) AS doc_id FROM vg_tok GROUP BY term)
      GROUP BY 1
    ),
    vg_docs AS (
      SELECT CAST(floor(doc_id / {W}) AS BIGINT) * {W} AS bucket,
             count(*) AS n_docs
      FROM {table} GROUP BY 1
    ),
    vg_toks AS (
      SELECT CAST(floor(doc_id / {W}) AS BIGINT) * {W} AS bucket,
             count(*) AS n_tokens
      FROM vg_tok GROUP BY 1
    ),
    vg_per AS (
      SELECT coalesce(d.bucket, t.bucket, f.bucket) AS bucket,
             coalesce(d.n_docs, 0) AS n_docs,
             coalesce(t.n_tokens, 0) AS n_tokens,
             coalesce(f.new_terms, 0) AS new_terms
      FROM vg_docs d
      FULL JOIN vg_toks t ON t.bucket = d.bucket
      FULL JOIN vg_first f ON f.bucket = coalesce(d.bucket, t.bucket)
    ),
    vg_cum AS (
      SELECT bucket, n_docs, n_tokens, new_terms,
             CAST(sum(n_docs) OVER w AS BIGINT) AS docs_cum,
             CAST(sum(n_tokens) OVER w AS BIGINT) AS tokens_cum,
             CAST(sum(new_terms) OVER w AS BIGINT) AS vocab_cum
      FROM vg_per
      WINDOW w AS (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT bucket, n_docs, n_tokens, new_terms, docs_cum, tokens_cum,
           vocab_cum,
           CASE WHEN tokens_cum > 1 AND vocab_cum > 0 THEN
             round(ln(CAST(vocab_cum AS DOUBLE))
                   / ln(CAST(tokens_cum AS DOUBLE)), 6)
           END AS heaps_exp
    FROM vg_cum
    """


def source_quality(documents: DataFrame) -> DataFrame:
    """→ ``[source, n_docs, avg_quality, avg_punct_ratio,
    avg_stopword_ratio]`` — the per-source quality drift table: the
    :func:`quality_score` heuristics aggregated by crawl/ingest source.
    THE triage view when a corpus refresh degrades downstream evals —
    "which feed started shipping junk" is one GROUP BY away from the
    per-doc scores, so make it an operator instead of a notebook cell.

    Plan shape: the per-doc scores are map-only column arithmetic; one
    equi-join to re-attach ``source`` (same scan, pruned columns) and
    ONE hash aggregate on the low-cardinality source key.
    """
    scored = quality_score(documents)
    src = documents.select("doc_id", "source")
    return (
        scored.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.round(F.avg("punct_ratio"), 6).alias("avg_punct_ratio"),
            F.round(F.avg("stopword_ratio"), 6).alias("avg_stopword_ratio"),
        )
    )


def source_quality_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`source_quality` — wraps the per-doc
    quality oracle and aggregates by source."""
    return f"""
    WITH sq_docs AS (
      {quality_score_sql(table)}
    )
    SELECT d.source, count(*) AS n_docs,
           round(avg(s.quality), 6) AS avg_quality,
           round(avg(s.punct_ratio), 6) AS avg_punct_ratio,
           round(avg(s.stopword_ratio), 6) AS avg_stopword_ratio
    FROM sq_docs s JOIN {table} d USING (doc_id)
    GROUP BY d.source
    """


def term_burstiness(documents: DataFrame, top_n: int = 30) -> DataFrame:
    """→ ``[term, df, cf, burstiness, df_frac]`` — Church–Gale (1995)
    term burstiness for the ``top_n`` highest-document-frequency terms:
    document frequency, collection frequency, and their ratio ``cf/df``
    (the mean occurrences per CONTAINING document). Content words are
    bursty (cf/df ≫ 1: once a doc mentions a topic it repeats it);
    function words sit near the Poisson floor. In a training-data
    pipeline a head term whose burstiness jumps is the template/spam
    signature — boilerplate repeats the same token dozens of times per
    page — caught here before it skews any tf-weighted score.

    Ties at the ``top_n`` df boundary break by term ascending — both
    engines enumerate the identical set.

    Scale shape: one tokenize + a (doc, term)-keyed aggregate (map-side
    combinable), one term-keyed aggregate over the Zipf-bounded distinct
    (doc, term) pairs, then a global top-n (``orderBy+limit`` compiles
    to TakeOrderedAndProject — no global sort materializes). The doc
    count joins in as a one-row broadcast.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "doc_id", F.explode(F.split(norm, " ")).alias("term")
    )
    per_doc = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    stats = per_doc.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    top = stats.orderBy(F.desc("df"), F.asc("term")).limit(top_n)
    n_docs = documents.agg(F.count("*").alias("_nd"))
    return top.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "df",
        "cf",
        F.round(F.col("cf") / F.col("df"), 6).alias("burstiness"),
        F.round(F.col("df") / F.col("_nd"), 6).alias("df_frac"),
    )


def term_burstiness_sql(table: str = "documents", top_n: int = 30) -> str:
    """DuckDB oracle for :func:`term_burstiness` (standalone query)."""
    N = int(top_n)
    return f"""
    WITH tb_tok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    tb_pd AS (
      SELECT doc_id, term, count(*) AS tf FROM tb_tok GROUP BY doc_id, term
    ),
    tb_st AS (
      SELECT term, count(*) AS df, sum(tf) AS cf FROM tb_pd GROUP BY term
    ),
    tb_top AS (
      SELECT * FROM tb_st ORDER BY df DESC, term LIMIT {N}
    ),
    tb_nd AS (SELECT count(*) AS nd FROM {table})
    SELECT term, df, CAST(cf AS BIGINT) AS cf,
           round(cf * 1.0 / df, 6) AS burstiness,
           round(df * 1.0 / nd, 6) AS df_frac
    FROM tb_top CROSS JOIN tb_nd
    """


def head_token_share(documents: DataFrame, ks: tuple = (1, 5, 10)) -> DataFrame:
    """→ one-row ``[n_terms, n_tokens, share_top{k}...]`` — Zipf head
    mass: the share of ALL token occurrences covered by the ``k`` most
    frequent terms (frequency ties broken by term ascending, so both
    engines rank identically). The working-set number behind every
    frequency-based design decision — a stopword list, a cached
    vocabulary shard, a head-term pruning threshold — and the
    complement of :func:`zipf_slope`'s exponent: the slope says how
    fast the tail decays, this says what the head is worth.

    Scale shape: one tokenize + term-keyed count (map-side combinable,
    Zipf-bounded distinct terms), then a rank window over the TERM
    table only — vocabulary-sized, ≪ corpus-sized, same bounded-window
    argument as ``vocab_stats`` — and one conditional-sum reduction.
    """
    if not ks or any(int(k) < 1 for k in ks):
        raise ValueError(f"ks must be positive ints, got {ks!r}")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(F.explode(F.split(norm, " ")).alias("term"))
    cnt = tok.groupBy("term").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    ranked = cnt.select("c", F.row_number().over(w).alias("rn"))
    shares = [
        F.round(
            F.sum(F.when(F.col("rn") <= int(k), F.col("c")).otherwise(F.lit(0)))
            / F.sum("c"),
            6,
        ).alias(f"share_top{int(k)}")
        for k in sorted(int(k) for k in ks)
    ]
    return ranked.agg(
        F.count("*").alias("n_terms"), F.sum("c").alias("n_tokens"), *shares
    )


def head_token_share_sql(table: str = "documents", ks: tuple = (1, 5, 10)) -> str:
    """DuckDB oracle for :func:`head_token_share` (standalone query)."""
    shares = ", ".join(
        f"""round(sum(CASE WHEN rn <= {int(k)} THEN c ELSE 0 END) * 1.0
             / sum(c), 6) AS share_top{int(k)}"""
        for k in sorted(int(k) for k in ks)
    )
    return f"""
    WITH ht_tok AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    ht_cnt AS (SELECT term, count(*) AS c FROM ht_tok GROUP BY term),
    ht_rk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rn FROM ht_cnt
    )
    SELECT count(*) AS n_terms, CAST(sum(c) AS BIGINT) AS n_tokens, {shares}
    FROM ht_rk
    """


def token_fertility(documents: DataFrame) -> DataFrame:
    """→ ``[lang, n_docs, n_tokens, n_chars, tokens_per_100_chars]`` —
    the per-language tokenizer-fertility audit: whitespace tokens per
    100 characters of raw text. Fertility differences are the classic
    multilingual-budget trap — a language that tokenizes 2× denser
    burns 2× the context window for the same content — and a fertility
    SHIFT within one language flags an ingest change (lost spacing,
    HTML squash) before it skews any length-based filter. Character
    counts use the raw text length; tokens use the engine-standard
    lower/trim/``\\s+`` split, so the ratio is comparable with every
    other text operator here.

    Scale shape: one map-only projection (token count via array size —
    no explode) + one hash aggregate on the tiny ``lang`` key.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    per = documents.select(
        "lang",
        F.size(F.split(norm, " ")).cast("long").alias("tok"),
        F.length("text").cast("long").alias("chars"),
    )
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("n_tokens"),
        F.sum("chars").alias("n_chars"),
        F.round(F.sum("tok") * 100.0 / F.sum("chars"), 6).alias(
            "tokens_per_100_chars"
        ),
    )


def token_fertility_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`token_fertility` (standalone query)."""
    return f"""
    WITH tf_per AS (
      SELECT lang,
             len(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))::BIGINT
               AS tok,
             length(text)::BIGINT AS chars
      FROM {table}
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           CAST(sum(chars) AS BIGINT) AS n_chars,
           round(sum(tok) * 100.0 / sum(chars), 6) AS tokens_per_100_chars
    FROM tf_per GROUP BY lang
    """


def source_term_divergence(documents: DataFrame) -> DataFrame:
    """→ ``[source_a, source_b, n_shared_terms, jsd_bits]`` — pairwise
    Jensen–Shannon divergence (in bits, 0 = identical, 1 = disjoint)
    between the unigram term distributions of every pair of ingest
    sources. The drift matrix that says WHICH feeds differ, where
    :func:`source_quality`'s heuristics say whether one degraded —
    two mirrors of the same crawl sit near 0, a feed that swapped
    language or template jumps toward 1.

    Exactness without a per-pair full-outer join: terms present in only
    one source contribute ``½·p·ln 2`` each, and those sum to
    ``½·ln 2·(1 − Σ_shared p)`` because each source's distribution sums
    to 1 — so ONE inner join on the term key (vocabulary-bounded)
    recovers the exact JSD.

    Scale shape: one tokenize + (source, term) aggregate (Zipf-bounded
    keys), one term-keyed self-equi-join between source pairs (vocab ×
    |sources|² worst case — both factors corpus-size-independent), one
    pair-keyed aggregate, and a |sources|-row cross join to emit
    zero-overlap pairs.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "source", F.explode(F.split(norm, " ")).alias("term")
    )
    cnt = tok.groupBy("source", "term").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    ps = cnt.join(tot, "source").select(
        "source", "term", (F.col("c") / F.col("t")).alias("p")
    )
    a = ps.select(
        F.col("source").alias("source_a"), "term", F.col("p").alias("pa")
    )
    b = ps.select(
        F.col("source").alias("source_b"), "term", F.col("p").alias("pb")
    )
    ln2 = 0.6931471805599453
    shared = (
        a.join(b, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_shared_terms"),
            F.sum(
                0.5 * F.col("pa") * F.log(2.0 * F.col("pa") / (F.col("pa") + F.col("pb")))
                + 0.5 * F.col("pb") * F.log(2.0 * F.col("pb") / (F.col("pa") + F.col("pb")))
            ).alias("s_sh"),
            F.sum("pa").alias("p_sh"),
            F.sum("pb").alias("q_sh"),
        )
    )
    srcs = tot.select("source")
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .where(F.col("source_a") < F.col("source_b"))
    )
    return pairs.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce("n_shared_terms", F.lit(0)).alias("n_shared_terms"),
        F.round(
            (
                F.coalesce("s_sh", F.lit(0.0))
                + 0.5
                * F.lit(ln2)
                * (
                    F.lit(2.0)
                    - F.coalesce("p_sh", F.lit(0.0))
                    - F.coalesce("q_sh", F.lit(0.0))
                )
            )
            / F.lit(ln2),
            6,
        ).alias("jsd_bits"),
    )


def source_term_divergence_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`source_term_divergence` (standalone)."""
    return f"""
    WITH sd_tok AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    sd_cnt AS (
      SELECT source, term, count(*) AS c FROM sd_tok GROUP BY source, term
    ),
    sd_tot AS (SELECT source, sum(c) AS t FROM sd_cnt GROUP BY source),
    sd_ps AS (
      SELECT c.source, c.term, c.c * 1.0 / t.t AS p
      FROM sd_cnt c JOIN sd_tot t ON t.source = c.source
    ),
    sd_sh AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_shared_terms,
             sum(0.5 * a.p * ln(2.0 * a.p / (a.p + b.p))
                 + 0.5 * b.p * ln(2.0 * b.p / (a.p + b.p))) AS s_sh,
             sum(a.p) AS p_sh, sum(b.p) AS q_sh
      FROM sd_ps a JOIN sd_ps b ON b.term = a.term AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT pa.source AS source_a, pb.source AS source_b,
           coalesce(s.n_shared_terms, 0) AS n_shared_terms,
           round((coalesce(s.s_sh, 0.0)
                  + 0.5 * 0.6931471805599453
                    * (2.0 - coalesce(s.p_sh, 0.0) - coalesce(s.q_sh, 0.0)))
                 / 0.6931471805599453, 6) AS jsd_bits
    FROM sd_tot pa
    JOIN sd_tot pb ON pa.source < pb.source
    LEFT JOIN sd_sh s ON s.source_a = pa.source AND s.source_b = pb.source
    """


_SCRIPTS = [
    ("latin", "[A-Za-z]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("arabic", "[؀-ۿ]"),
    ("cjk", "[一-鿿]"),
    ("hangul", "[가-힯]"),
]


def script_mix(documents: DataFrame) -> DataFrame:
    """→ ``[scripts, n_docs]`` — the unicode-script mix census: each
    document labeled by WHICH writing systems appear in it (fixed order
    ``latin+cyrillic+greek+arabic+cjk+hangul``; ``none`` when no letter
    of any tracked script occurs), bucketed into counts. Mixed-script
    documents are the homoglyph-spoofing / encoding-breakage signature
    — a crawl whose ``latin+cyrillic`` bucket suddenly grows is
    shipping lookalike-character spam, and ``none`` rows are
    symbol-only junk a tokenizer chokes on. Detection is per-script
    literal char-class regexes, identical in Java and RE2.

    Scale shape: map-only boolean projections + one hash aggregate on
    the ≤ 2⁶+1 label key. No explode, no join.
    """
    label = F.concat_ws(
        "+",
        *[
            F.when(F.col("text").rlike(pat), F.lit(name))
            for name, pat in _SCRIPTS
        ],
    )
    lab = F.when(label == "", "none").otherwise(label)
    return documents.select(lab.alias("scripts")).groupBy("scripts").agg(
        F.count("*").alias("n_docs")
    )


def script_mix_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`script_mix` (standalone query)."""
    parts = ", ".join(
        f"CASE WHEN regexp_matches(text, '{pat}') THEN '{name}' END"
        for name, pat in _SCRIPTS
    )
    return f"""
    WITH sm_lab AS (
      SELECT concat_ws('+', {parts}) AS raw FROM {table}
    )
    SELECT CASE WHEN raw = '' THEN 'none' ELSE raw END AS scripts,
           count(*) AS n_docs
    FROM sm_lab GROUP BY 1
    """


def word_length_dist(documents: DataFrame, max_len: int = 20) -> DataFrame:
    """→ ``[wlen, n_tokens, share]`` — the token-length histogram over
    the whole corpus (lengths above ``max_len`` clamp into the top
    bucket). The distribution behind :func:`quality_score`'s mean-word-
    length band: natural language has a stable 3–8-char hump per
    language, so a second mode at 1 (tokenizer shrapnel), a spike at
    the clamp (URLs/hashes/base64), or a hump shift between ingests is
    an encoding or extraction break caught before any model sees it.

    Scale shape: one tokenize + a hash aggregate on the ≤ ``max_len``
    integer key (map-side combinable); the share window runs over those
    few rows.
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(F.explode(F.split(norm, " ")).alias("term"))
    wl = F.least(F.length("term"), F.lit(int(max_len)))
    cells = tok.select(wl.alias("wlen")).groupBy("wlen").agg(
        F.count("*").alias("n_tokens")
    )
    w = Window.partitionBy()
    return cells.select(
        "wlen",
        "n_tokens",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w), 6).alias("share"),
    )


def word_length_dist_sql(table: str = "documents", max_len: int = 20) -> str:
    """DuckDB oracle for :func:`word_length_dist` (standalone query)."""
    M = int(max_len)
    return f"""
    WITH wl_tok AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM {table}
    ),
    wl_c AS (
      SELECT least(length(term), {M}) AS wlen, count(*) AS n_tokens
      FROM wl_tok GROUP BY 1
    )
    SELECT wlen, n_tokens,
           round(n_tokens / (sum(n_tokens) OVER ()), 6) AS share
    FROM wl_c
    """


def readability(documents: DataFrame) -> DataFrame:
    """→ per-doc ``[doc_id, n_words, syl_per_word, complex_share,
    avg_word_len]`` — a syllable-profile readability card. Syllables are
    estimated as vowel GROUPS (``[aeiouy]+`` runs — the standard cheap
    heuristic under classic Flesch/FK formulas); ``complex_share`` is
    the fraction of words with ≥ 3 vowel groups (the "complex word"
    notion of the Gunning-fog index). The corpus has no sentence
    markers, so the sentence-normalized Flesch composite is deliberately
    NOT emitted — these are its per-word components, which is what a
    quality filter thresholds anyway (long/polysyllabic-word share is
    the signal; the affine composite adds nothing).

    Scale shape: map-only JVM array expressions over the token split —
    no shuffle, no window, no Python.
    """
    toks = _tokens(F.lower(F.col("text")))
    syls = F.transform(
        toks, lambda w: F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0)))
    )
    n_words = F.size(toks)
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            F.when(
                n_words > 0,
                F.aggregate(syls, F.lit(0), lambda a, x: a + x) / n_words,
            ),
            6,
        ).alias("syl_per_word"),
        F.round(
            F.when(
                n_words > 0,
                F.size(F.filter(syls, lambda s: s >= 3)) / n_words,
            ),
            6,
        ).alias("complex_share"),
        F.round(
            F.when(
                n_words > 0,
                F.aggregate(
                    F.transform(toks, lambda w: F.length(w)),
                    F.lit(0),
                    lambda a, x: a + x,
                )
                / n_words,
            ),
            6,
        ).alias("avg_word_len"),
    )


def readability_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`readability` (standalone query)."""
    return f"""
    WITH rd_t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM {table}
    ),
    rd_s AS (
      SELECT doc_id, len(toks) AS n_words,
             list_transform(toks,
               w -> len(regexp_extract_all(w, '[aeiouy]+'))) AS syls,
             list_transform(toks, w -> length(w)) AS lens
      FROM rd_t
    )
    SELECT doc_id, n_words,
           CASE WHEN n_words > 0 THEN round(
             list_reduce(syls, (a, x) -> a + x) * 1.0 / n_words, 6) END
             AS syl_per_word,
           CASE WHEN n_words > 0 THEN round(
             len(list_filter(syls, s -> s >= 3)) * 1.0 / n_words, 6) END
             AS complex_share,
           CASE WHEN n_words > 0 THEN round(
             list_reduce(lens, (a, x) -> a + x) * 1.0 / n_words, 6) END
             AS avg_word_len
    FROM rd_s
    """


def char_trigrams(documents: DataFrame, top_n: int = 10) -> DataFrame:
    """→ ``[lang, trigram, n_occurrences, rk]`` — the ``top_n`` most
    frequent character trigrams PER LANGUAGE over the
    whitespace-normalized lowercased text. Character n-gram profiles are
    the workhorse of production language-ID (TextCat / CLD): this is the
    profile-building pass, and diffing two languages' rows here is
    exactly the feature table :func:`lang_id`'s heuristic compresses.
    Ties break lexicographically on the trigram.

    Scale shape: the position explode is map-only (array transform, no
    Python); the count is a (lang, trigram)-keyed agg — bounded by
    |langs| × |alphabet|³, NOT by corpus size — so the per-lang top-n
    window runs over the tiny aggregated table, never over raw rows
    (the low-cardinality-window trap does not apply to post-agg data).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = documents.select("lang", norm.alias("norm")).where(
        F.length("norm") >= 3
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.length("norm") - F.lit(2)),
        lambda i: F.col("norm").substr(i, F.lit(3)),
    )
    counts = (
        d.select("lang", F.explode(grams).alias("trigram"))
        .groupBy("lang", "trigram")
        .agg(F.count("*").alias("n_occurrences"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_occurrences"), F.asc("trigram")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= int(top_n))
        .select("lang", "trigram", "n_occurrences", "rk")
    )


def char_trigrams_sql(table: str = "documents", top_n: int = 10) -> str:
    """DuckDB oracle for :func:`char_trigrams` (standalone query)."""
    return f"""
    WITH ct_d AS (
      SELECT lang,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM {table}
    ),
    ct_g AS (
      SELECT lang,
             unnest(list_transform(range(1, length(norm) - 1),
                    i -> substr(norm, CAST(i AS INT), 3))) AS trigram
      FROM ct_d WHERE length(norm) >= 3
    ),
    ct_c AS (
      SELECT lang, trigram, count(*) AS n_occurrences
      FROM ct_g GROUP BY lang, trigram
    )
    SELECT lang, trigram, n_occurrences, rk FROM (
      SELECT lang, trigram, n_occurrences,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_occurrences DESC, trigram ASC) AS rk
      FROM ct_c
    ) WHERE rk <= {int(top_n)}
    """


_DRIFT_PS = [round(0.1 * i, 1) for i in range(1, 10)]


def source_length_drift(documents: DataFrame) -> DataFrame:
    """→ ``[source, n_docs, drift]`` — how far each source's token-count
    distribution sits from the corpus: the mean absolute gap between the
    source's nine token-count deciles and the global ones, in tokens.
    The length-marginal companion to ``source_term_divergence`` (term
    JSD) and :func:`source_quality`: a source whose decile profile
    drifts is over-contributing a length regime, which skews packing
    (:func:`doc_chunks`/``pack_contexts``) and any length-bucketed
    sampler even when its vocabulary looks normal.

    Scale shape: one map-only token count, one per-source exact
    percentile agg (|sources| groups) and one global one (1 row,
    broadcast back via cross join), then a map-only array diff. Exact
    ``percentile`` matches DuckDB ``quantile_cont`` bit-for-bit on both
    engines (established by the percentile operators in this repo).
    """
    ps = ", ".join(f"{p}D" for p in _DRIFT_PS)
    n_tok = F.size(_tokens(F.col("text")))
    toks = documents.select("source", n_tok.alias("n_tok"))
    per = toks.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.expr(f"percentile(n_tok, array({ps}))").alias("sd"),
    )
    glob = toks.agg(F.expr(f"percentile(n_tok, array({ps}))").alias("gd"))
    diff = F.aggregate(
        F.zip_with(F.col("sd"), F.col("gd"), lambda s, g: F.abs(s - g)),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.lit(len(_DRIFT_PS))
    return per.join(F.broadcast(glob), F.lit(True)).select(
        "source", "n_docs", F.round(diff, 6).alias("drift")
    )


def source_length_drift_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`source_length_drift` (standalone query)."""
    ps = ", ".join(str(p) for p in _DRIFT_PS)
    return f"""
    WITH sld_t AS (
      SELECT source,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
      FROM {table}
    ),
    sld_per AS (
      SELECT source, count(*) AS n_docs,
             quantile_cont(n_tok, [{ps}]) AS sd
      FROM sld_t GROUP BY source
    ),
    sld_glob AS (
      SELECT quantile_cont(n_tok, [{ps}]) AS gd FROM sld_t
    )
    SELECT source, n_docs,
           round(list_reduce(
                   list_transform(range(1, len(sd) + 1),
                                  i -> abs(sd[i] - gd[i])),
                   (a, x) -> a + x) / {len(_DRIFT_PS)}, 6) AS drift
    FROM sld_per, sld_glob
    """


def source_boilerplate(documents: DataFrame, n: int = 5) -> DataFrame:
    """→ ``[source, gram, n_docs_with, share]`` — each source's most
    document-frequent token ``n``-gram (ties broken lexicographically)
    and the fraction of the source's docs containing it. A share near
    1.0 is the signature of injected boilerplate (headers, footers,
    license blurbs) — the thing you strip BEFORE near-dup scoring, since
    boilerplate inflates every pairwise Jaccard. Complements
    :func:`dup_source_matrix` (which sees the resulting dup pairs, not
    their cause).

    Scale shape: per-doc n-gram windows as a map-only array transform
    with an array_distinct (per-doc df semantics), one explode + (source,
    gram) count, a broadcastable per-source doc count join, and a top-1
    row_number window over the AGGREGATED counts (bounded by distinct
    grams per source, never raw rows).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _tokens(F.lower(F.trim(F.col("text"))))
    n_win = F.size(F.col("_toks")) - F.lit(n - 1)
    # the when() guard is load-bearing: sequence(1, n_win<=0) descends
    # through 0 and slice(start=0) raises; a plain .where() is NOT enough
    # because the explode's inferred size(grams)>0 predicate gets hoisted
    # by codegen subexpression elimination past the short-circuit —
    # CaseWhen branches are the one place Spark never hoists from
    grams = F.when(
        n_win >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, F.lit(n))),
            )
        ),
    )
    d = (
        documents.select("source", toks.alias("_toks"))
        .where(n_win >= 1)
        .select("source", grams.alias("grams"))
    )
    counts = (
        d.select("source", F.explode("grams").alias("gram"))
        .groupBy("source", "gram")
        .agg(F.count("*").alias("n_docs_with"))
    )
    per_src = documents.groupBy("source").agg(F.count("*").alias("_n_docs"))
    w = Window.partitionBy("source").orderBy(
        F.desc("n_docs_with"), F.asc("gram")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .join(F.broadcast(per_src), "source")
        .select(
            "source",
            "gram",
            "n_docs_with",
            F.round(F.col("n_docs_with") / F.col("_n_docs"), 6).alias("share"),
        )
    )


def source_boilerplate_sql(table: str = "documents", n: int = 5) -> str:
    """DuckDB oracle for :func:`source_boilerplate` (standalone query)."""
    return f"""
    WITH sb_t AS (
      SELECT source,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM {table}
    ),
    sb_g AS (
      SELECT source,
             unnest(list_distinct(list_transform(
               range(1, len(toks) - {n - 1} + 1),
               i -> array_to_string(toks[i:i+{n - 1}], ' ')))) AS gram
      FROM sb_t WHERE len(toks) >= {n}
    ),
    sb_c AS (
      SELECT source, gram, count(*) AS n_docs_with
      FROM sb_g GROUP BY source, gram
    ),
    sb_n AS (
      SELECT source, count(*) AS n_docs FROM {table} GROUP BY source
    ),
    sb_top AS (
      SELECT source, gram, n_docs_with FROM (
        SELECT source, gram, n_docs_with,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_docs_with DESC, gram ASC) AS rk
        FROM sb_c
      ) WHERE rk = 1
    )
    SELECT t.source, t.gram, t.n_docs_with,
           round(t.n_docs_with * 1.0 / n.n_docs, 6) AS share
    FROM sb_top t JOIN sb_n n ON n.source = t.source
    """


def vocab_richness(documents: DataFrame) -> DataFrame:
    """→ ``[source, n_tokens, n_terms, hapax_share, yule_k]`` — per-source
    lexical-richness profile over corpus-level term frequencies: total
    token mass N, vocabulary size V, the hapax-legomena share V1/V (the
    fraction of terms seen exactly once — high for organic text, collapsed
    for template spam), and Yule's characteristic K
    (K = 10^4·(Σ m²·V_m − N)/N², Yule 1944) — the classic
    length-insensitive repeated-vocabulary statistic. Together they
    separate "small vocabulary because short corpus" from "small
    vocabulary because degenerate source": :func:`zipf_slope` fits the
    tail's shape, this measures its mass.

    Scale shape: token explode → one (source, term) hash aggregate
    (map-side combinable, Zipf-bounded output) → one per-source aggregate
    (cardinality = #sources). m² is summed in DOUBLE, not BIGINT — at
    100 TB a head term's m² overflows int64.
    """
    toks = _tokens(F.lower(F.trim(F.col("text"))))
    tf = (
        documents.select("source", F.explode(toks).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("m"))
    )
    md = F.col("m").cast("double")
    return (
        tf.groupBy("source")
        .agg(
            F.sum("m").alias("n_tokens"),
            F.count("*").alias("n_terms"),
            F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).alias("_v1"),
            F.sum(md * md).alias("_m2"),
        )
        .select(
            "source",
            "n_tokens",
            "n_terms",
            F.round(F.col("_v1") / F.col("n_terms"), 6).alias("hapax_share"),
            F.round(
                F.lit(10_000.0)
                * (F.col("_m2") - F.col("n_tokens"))
                / (F.col("n_tokens").cast("double") * F.col("n_tokens")),
                6,
            ).alias("yule_k"),
        )
    )


def vocab_richness_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`vocab_richness` — same tokenizer and
    double-summed m²."""
    return f"""
    WITH vr_tok AS (
      SELECT source,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM {table}
    ),
    vr_tf AS (
      SELECT source, term, count(*) AS m FROM vr_tok GROUP BY source, term
    )
    SELECT source,
           CAST(sum(m) AS BIGINT) AS n_tokens,
           count(*) AS n_terms,
           round(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS hapax_share,
           round(10000.0 * (sum(CAST(m AS DOUBLE) * m) - sum(m))
                 / (CAST(sum(m) AS DOUBLE) * sum(m)), 6) AS yule_k
    FROM vr_tf GROUP BY source
    """


_COVERAGE_KS = [1, 5, 10, 20]


def ngram_coverage(documents: DataFrame, ks: list[int] | None = None) -> DataFrame:
    """→ ``[k, covered_tokens, coverage]`` — what fraction of the corpus's
    total token mass the top-``k`` most frequent terms account for, for
    each ``k`` in ``ks``. The tokenizer-budget curve: a corpus where 20
    terms cover 80% of tokens wants a tiny special-token head and long
    merges, one with a flat curve wants a bigger base vocabulary —
    :func:`zipf_slope` fits the exponent, this reads the cumulative mass
    a vocab designer actually budgets against.

    Scale shape: the corpus is scanned once for the total (map-only array
    size sum) and once through the Zipf-bounded (term → count) aggregate;
    the cumulative head is a TakeOrdered of max(ks) rows, ranked and
    expanded against the k list with a ≤ max(ks)·|ks| broadcast join.
    Nothing global-windows over the vocabulary.
    """
    ks = list(_COVERAGE_KS) if ks is None else sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError("ks must be positive ints")
    spark = documents.sparkSession
    toks = _tokens(F.lower(F.trim(F.col("text"))))
    total = documents.agg(F.sum(F.size(toks)).alias("_total"))
    vocab = (
        documents.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("m"))
    )
    top = vocab.orderBy(F.desc("m"), F.asc("term")).limit(max(ks))
    w = Window.orderBy(F.desc("m"), F.asc("term"))
    ranked = top.withColumn("rk", F.row_number().over(w))
    kdf = spark.createDataFrame([(k,) for k in ks], "k int")
    return (
        F.broadcast(kdf)
        .join(ranked, F.col("rk") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("m").alias("covered_tokens"))
        .join(F.broadcast(total), F.lit(True))
        .select(
            "k",
            "covered_tokens",
            F.round(F.col("covered_tokens") / F.col("_total"), 6).alias("coverage"),
        )
    )


def ngram_coverage_sql(table: str = "documents", ks: list[int] | None = None) -> str:
    """DuckDB oracle for :func:`ngram_coverage` — same head-limit + rank."""
    ks = list(_COVERAGE_KS) if ks is None else sorted(set(int(k) for k in ks))
    klist = ", ".join(str(k) for k in ks)
    return f"""
    WITH nc_tok AS MATERIALIZED (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM {table}
    ),
    nc_total AS (SELECT count(*) AS total FROM nc_tok),
    nc_top AS (
      SELECT term, count(*) AS m FROM nc_tok GROUP BY term
      ORDER BY m DESC, term ASC LIMIT {max(ks)}
    ),
    nc_rk AS (
      SELECT m, row_number() OVER (ORDER BY m DESC, term ASC) AS rk FROM nc_top
    ),
    nc_ks AS (SELECT unnest([{klist}]) AS k)
    SELECT k, CAST(sum(m) AS BIGINT) AS covered_tokens,
           round(sum(m) * 1.0 / any_value(t.total), 6) AS coverage
    FROM nc_ks JOIN nc_rk ON nc_rk.rk <= nc_ks.k, nc_total t
    GROUP BY k
    """


def brevity_law(documents: DataFrame) -> DataFrame:
    """→ one-row ``[n_terms, r_lnfreq_len, avg_len_types,
    avg_len_tokens]`` — Zipf's law of abbreviation, measured: the Pearson
    correlation between a term's log frequency and its character length
    over the corpus vocabulary (strongly negative for natural language —
    frequent words are short), plus the type-averaged vs token-averaged
    word length whose gap is the same effect in expectation form. A
    corpus whose r drifts toward 0 under filtering is losing its natural
    head/tail structure — a quick tokenizer-health and corpus-ablation
    check alongside :func:`zipf_slope` (rank view) and
    :func:`ngram_coverage` (mass view). NULL r when either variable is
    constant (degenerate single-length or uniform-frequency vocabulary).

    Scale shape: one Zipf-bounded (term → count) hash aggregate, then a
    single-row moment aggregate. No windows, no joins.
    """
    toks = _tokens(F.lower(F.trim(F.col("text"))))
    vocab = (
        documents.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("m"))
    )
    ln_m = F.log(F.col("m").cast("double"))
    ln_len = F.length(F.col("term")).cast("double")
    # corr() computed manually: Spark's Corr divides by the stddev product
    # and raises DIVIDE_BY_ZERO under ANSI when a variable is constant —
    # covar/stddevs + a guard give the same value with a NULL degenerate
    return vocab.agg(
        F.count("*").alias("n_terms"),
        F.covar_samp(ln_m, ln_len).alias("_cv"),
        F.stddev_samp(ln_m).alias("_sm"),
        F.stddev_samp(ln_len).alias("_sl"),
        F.avg(ln_len).alias("_alt"),
        F.sum(F.col("m") * ln_len).alias("_wl"),
        F.sum("m").alias("_n"),
    ).select(
        "n_terms",
        F.round(
            F.when(
                (F.col("_sm") > 0) & (F.col("_sl") > 0),
                F.col("_cv") / (F.col("_sm") * F.col("_sl")),
            ),
            6,
        ).alias("r_lnfreq_len"),
        F.round(F.col("_alt"), 6).alias("avg_len_types"),
        F.round(F.col("_wl") / F.col("_n"), 6).alias("avg_len_tokens"),
    )


def brevity_law_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`brevity_law` — same vocabulary aggregate
    and degenerate-variance guard."""
    return f"""
    WITH bl_tok AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM {table}
    ),
    bl_v AS MATERIALIZED (
      SELECT term, count(*) AS m FROM bl_tok GROUP BY term
    )
    SELECT count(*) AS n_terms,
           round(CASE WHEN stddev_samp(ln(CAST(m AS DOUBLE))) > 0
                       AND stddev_samp(CAST(length(term) AS DOUBLE)) > 0
                 THEN covar_samp(ln(CAST(m AS DOUBLE)),
                                 CAST(length(term) AS DOUBLE))
                      / (stddev_samp(ln(CAST(m AS DOUBLE)))
                         * stddev_samp(CAST(length(term) AS DOUBLE)))
                 END, 6) AS r_lnfreq_len,
           round(avg(CAST(length(term) AS DOUBLE)), 6) AS avg_len_types,
           round(sum(m * CAST(length(term) AS DOUBLE)) / sum(m), 6)
             AS avg_len_tokens
    FROM bl_v
    """


def phrase_search(documents: DataFrame, phrase: str) -> DataFrame:
    """Positional-index phrase query: documents containing the EXACT
    token sequence ``phrase`` (whitespace tokenization shared with
    :func:`vocab_stats` — adjacency of token positions, not substring
    match, so "table hash" does not match "tablet hashing").
    → ``[doc_id, n_occurrences]``, doc_id asc.

    The IR-engine operator shape: the corpus explodes once into
    (doc, pos, term) postings; each phrase term FILTERS its own postings
    list before anything joins (the selective term prunes first — at
    100 TB a term's postings are a sliver of the index); the k-term
    phrase is a chain of (doc, pos+i) equi-joins between those pruned
    lists. No arrays travel through the joins — only (doc_id, pos)
    pairs.
    """
    terms = [t for t in phrase.strip().lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "doc_id",
        F.posexplode(F.split(norm, " ")).alias("pos", "term"),
    )
    matched = (
        tok.where(F.col("term") == terms[0])
        .select("doc_id", F.col("pos").alias("_p0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = tok.where(F.col("term") == t).select(
            F.col("doc_id").alias("_d"), F.col("pos").alias("_pi")
        )
        matched = matched.join(
            nxt,
            (matched.doc_id == nxt._d) & (nxt._pi == matched._p0 + i),
        ).select("doc_id", "_p0")
    return (
        matched.groupBy("doc_id")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy("doc_id")
    )


def phrase_search_sql(phrase: str, table: str = "documents") -> str:
    """Oracle mirror: DuckDB lacks WITH ORDINALITY in this build, so
    positions come from a LATERAL ``generate_series(1, len(toks))``
    subscript (1-based; only adjacency differences matter)."""
    terms = [t.replace("'", "''") for t in phrase.strip().lower().split() if t]
    joins = "\n    ".join(
        f"JOIN ptok t{i} ON t{i}.doc_id = t0.doc_id"
        f" AND t{i}.pos = t0.pos + {i} AND t{i}.term = '{t}'"
        for i, t in enumerate(terms[1:], start=1)
    )
    return f"""
    WITH pdocs AS (
      SELECT doc_id,
             string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM {table}
    ),
    ptok AS MATERIALIZED (
      SELECT doc_id, toks[i] AS term, i AS pos
      FROM pdocs, unnest(generate_series(1, len(toks))) AS g(i)
    )
    SELECT t0.doc_id, count(*) AS n_occurrences
    FROM ptok t0
    {joins}
    WHERE t0.term = '{terms[0]}'
    GROUP BY t0.doc_id
    ORDER BY t0.doc_id
    """


def negative_samples(
    documents: DataFrame, k: int = 3, power: float = 0.75
) -> DataFrame:
    """Deterministic word2vec-style negative sampling: for every
    (doc, position) token occurrence, draw ``k`` negatives from the
    unigram^``power`` distribution (Mikolov et al. 2013's smoothing) by
    CDF inversion — a deterministic hash of (doc, pos, draw index)
    becomes u ∈ [0,1) and selects the vocabulary row whose cumulative
    band contains it. → ``[doc_id, pos, draw, neg_term]``.

    Scale shape: the CDF table is the VOCABULARY (Zipf-bounded), built
    with one aggregate + one ordered prefix sum, then broadcast; the
    range lookup ``lo ≤ u < hi`` is a broadcast join with a range
    residual — the documented tiny-dim nested-loop shape (the classic
    alias-table trick trades it for an equi-join when the vocab stops
    fitting; CDF inversion keeps the oracle trivially mirrorable).
    Determinism: same corpus → same negatives, in both engines (the
    hash is the portable md5 family; u is an exact integer ratio).
    """
    from linkgraph_spark.functions.hashing import md5_long

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "term")
    )
    w = Window.orderBy("term")
    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("_n"))
        .withColumn("_w", F.pow(F.col("_n").cast("double"), F.lit(float(power))))
    )
    tot = vocab.agg(F.sum("_w").alias("_tw"))
    cdf = (
        vocab.crossJoin(F.broadcast(tot))
        .withColumn(
            "_hi",
            F.sum("_w").over(w.rowsBetween(Window.unboundedPreceding, 0))
            / F.col("_tw"),
        )
        .withColumn(
            "_lo", F.coalesce(F.lag("_hi").over(Window.orderBy("term")), F.lit(0.0))
        )
        .select(F.col("term").alias("neg_term"), "_lo", "_hi")
    )
    draws = tok.select(
        "doc_id",
        "pos",
        F.explode(F.array(*[F.lit(i) for i in range(int(k))])).alias("draw"),
    )
    u = (
        md5_long(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("pos").cast("string"),
                F.col("draw").cast("string"),
            )
        )
        % F.lit(1 << 30)
    ).cast("double") / F.lit(float(1 << 30))
    return (
        draws.withColumn("_u", u)
        .join(
            F.broadcast(cdf),
            (F.col("_u") >= F.col("_lo")) & (F.col("_u") < F.col("_hi")),
        )
        .select("doc_id", "pos", "draw", "neg_term")
        .orderBy("doc_id", "pos", "draw")
    )


def negative_samples_sql(
    table: str = "documents", k: int = 3, power: float = 0.75
) -> str:
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(
        "concat(CAST(doc_id AS VARCHAR), ':', CAST(pos AS VARCHAR), ':',"
        " CAST(draw AS VARCHAR))"
    )
    ks = ", ".join(str(i) for i in range(int(k)))
    return f"""
    WITH nsd AS (
      SELECT doc_id,
             string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM {table}
    ),
    nstok AS (
      SELECT doc_id, i - 1 AS pos, toks[i] AS term
      FROM nsd, unnest(generate_series(1, len(toks))) AS g(i)
    ),
    nsv AS (
      SELECT term, pow(count(*), {float(power)!r}) AS w
      FROM nstok GROUP BY term
    ),
    nst AS (SELECT sum(w) AS tw FROM nsv),
    nshi AS (
      SELECT term AS neg_term,
             sum(w) OVER (ORDER BY term ROWS UNBOUNDED PRECEDING) / tw AS hi
      FROM nsv CROSS JOIN nst
    ),
    nscdf AS (
      SELECT neg_term, hi,
             coalesce(lag(hi) OVER (ORDER BY neg_term), 0.0) AS lo
      FROM nshi
    ),
    nsdraw AS (
      SELECT doc_id, pos, unnest([{ks}]) AS draw FROM nstok
    ),
    nsu AS (
      SELECT doc_id, pos, draw,
             CAST(({h}) % {1 << 30} AS DOUBLE) / {float(1 << 30)!r} AS u
      FROM nsdraw
    )
    SELECT doc_id, pos, draw, neg_term
    FROM nsu JOIN nscdf ON u >= lo AND u < hi
    ORDER BY doc_id, pos, draw
    """


def kwic(
    documents: DataFrame, term: str, window: int = 2, top_n: int = 200
) -> DataFrame:
    """Keyword-in-context concordance: every occurrence of ``term`` with
    its ``window`` tokens of left/right context — the corpus-inspection
    tool behind "how is this token actually used". → ``[doc_id, pos,
    left_ctx, right_ctx]``, first ``top_n`` by (doc_id, pos).

    Map-only per document: tokens stay inside one row's array; the
    occurrence positions come from a filtered ``posexplode`` and the
    contexts from ``slice`` on the SAME array — no join, no shuffle
    beyond the bounded top-n. Shares :func:`vocab_stats`'s whitespace
    tokenization.
    """
    t = term.strip().lower()
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = documents.select("doc_id", F.split(norm, " ").alias("_toks"))
    hit = toks.select(
        "doc_id",
        "_toks",
        F.posexplode("_toks").alias("pos", "_term"),
    ).where(F.col("_term") == t)
    w = int(window)
    # slice() is 1-based and rejects non-positive starts: clamp the left
    # window at the document head
    left = F.slice(
        "_toks",
        F.greatest(F.col("pos") + 1 - w, F.lit(1)),
        F.least(F.col("pos"), F.lit(w)),
    )
    right = F.slice("_toks", F.col("pos") + 2, w)
    return (
        hit.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", left).alias("left_ctx"),
            F.concat_ws(" ", right).alias("right_ctx"),
        )
        .orderBy("doc_id", "pos")
        .limit(int(top_n))
    )


def kwic_sql(
    term: str, window: int = 2, top_n: int = 200, table: str = "documents"
) -> str:
    t = term.strip().lower().replace("'", "''")
    w = int(window)
    return f"""
    WITH kdocs AS (
      SELECT doc_id,
             string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM {table}
    ),
    khit AS (
      SELECT doc_id, toks, i - 1 AS pos
      FROM kdocs, unnest(generate_series(1, len(toks))) AS g(i)
      WHERE toks[i] = '{t}'
    )
    SELECT doc_id, pos,
           coalesce(array_to_string(toks[greatest(pos + 1 - {w}, 1):pos], ' '),
                    '') AS left_ctx,
           coalesce(array_to_string(toks[pos + 2:pos + 1 + {w}], ' '), '')
             AS right_ctx
    FROM khit
    ORDER BY doc_id, pos
    LIMIT {int(top_n)}
    """


def term_pagerank(
    documents: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    top_n: int = 20,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004 —
    public recipe): PageRank over the term co-occurrence graph picks
    the corpus's structurally central vocabulary, not merely its
    frequent one. Adjacent-token pairs form the (symmetrized, deduped)
    edge set; ``iters`` textbook-PageRank supersteps with dangling-mass
    redistribution run over it. → ``[term, rank]``, top ``top_n`` by
    rank desc / term asc (6 dp).

    Scale shape: the token explode is corpus-sized but the GRAPH is
    Zipf-bounded (|vocabulary| vertices) — every superstep is a join
    over the tiny term graph, so the fixed-iteration loop is cheap and
    the DuckDB oracle replays it as unrolled CTEs (the same pattern as
    the pagerank_textbook5 gate oracle).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "term")
    )
    nxt = tok.select(
        "doc_id",
        (F.col("pos") + 1).alias("_p2"),
        F.col("term").alias("_a"),
    )
    pairs = nxt.join(
        tok,
        (nxt.doc_id == tok.doc_id) & (F.col("_p2") == tok.pos),
    ).select(F.col("_a").alias("src"), F.col("term").alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    edges = (
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    verts = edges.select(F.col("src").alias("term")).distinct().persist()
    n = verts.count()
    degs = edges.groupBy("src").agg(F.count("*").alias("_od"))
    d = float(damping)
    rank = verts.select("term", (F.lit(1.0) / n).alias("rank"))
    for _ in range(int(iters)):
        contrib = (
            edges.join(degs, "src")
            .join(rank.withColumnRenamed("term", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("_od")).alias("_sm"))
        )
        # symmetrized co-occurrence graphs have no dangling vertices
        # (every vertex has an outgoing edge), so no dangling mass term
        rank = verts.join(
            contrib.withColumnRenamed("dst", "term"), "term", "left"
        ).select(
            "term",
            (
                F.lit((1.0 - d)) / n
                + F.lit(d) * F.coalesce(F.col("_sm"), F.lit(0.0))
            ).alias("rank"),
        )
    out = (
        rank.select("term", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("term"))
        .limit(int(top_n))
    )
    result = out.localCheckpoint(eager=True)
    edges.unpersist()
    verts.unpersist()
    return result


def term_pagerank_sql(
    table: str = "documents",
    iters: int = 5,
    damping: float = 0.85,
    top_n: int = 20,
) -> str:
    d = float(damping)
    ctes = [
        "tpr0 AS MATERIALIZED (SELECT term, 1.0 / tn.n AS rank"
        " FROM tpverts CROSS JOIN tpn tn)"
    ]
    for k in range(1, int(iters) + 1):
        ctes.append(
            f"""tpr{k} AS MATERIALIZED (
      SELECT v.term,
             {1.0 - d:.17g} / tn.n + {d!r} * coalesce(s.sm, 0.0) AS rank
      FROM tpverts v CROSS JOIN tpn tn
      LEFT JOIN (
        SELECT e.dst AS term, sum(r.rank / dg.od) AS sm
        FROM tpedges e
        JOIN tpr{k - 1} r ON r.term = e.src
        JOIN tpdegs dg ON dg.src = e.src
        GROUP BY e.dst
      ) s ON s.term = v.term
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH tpd AS (
      SELECT doc_id,
             string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM {table}
    ),
    tptok AS (
      SELECT doc_id, i AS pos, toks[i] AS term
      FROM tpd, unnest(generate_series(1, len(toks))) AS g(i)
    ),
    tppairs AS (
      SELECT a.term AS src, b.term AS dst
      FROM tptok a JOIN tptok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.term <> b.term
    ),
    tpedges AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM tppairs
        UNION ALL SELECT dst, src FROM tppairs
      )
    ),
    tpverts AS MATERIALIZED (SELECT DISTINCT src AS term FROM tpedges),
    tpn AS MATERIALIZED (SELECT count(*) AS n FROM tpverts),
    tpdegs AS MATERIALIZED (
      SELECT src, count(*) AS od FROM tpedges GROUP BY src
    ),
    {body}
    SELECT term, round(rank, 6) AS rank FROM tpr{int(iters)}
    ORDER BY rank DESC, term ASC
    LIMIT {int(top_n)}
    """


# ---------------------------------------------------------------------------
# Good-Turing counts + unseen mass (wave 96)
# ---------------------------------------------------------------------------


def good_turing_counts(documents: DataFrame, max_r: int = 1000) -> DataFrame:
    """→ [r, n_r, r_star] for term counts 1 ≤ r ≤ ``max_r`` — the
    frequency-of-frequencies table and the plain Turing re-estimate
    ``r* = (r+1)·N_{r+1}/N_r`` (Good 1953), the ingredient behind every
    Good–Turing-smoothed LM and the standard "how much probability mass
    do rare terms really deserve" diagnostic for a training corpus.
    ``r_star`` is the UNsmoothed Turing estimate: where ``N_{r+1} = 0``
    it is honestly 0.0 (that gap is exactly why Simple Good–Turing
    regression exists; ``max_r`` merely caps the report — the table is
    intrinsically tiny, at most √(2·tokens) distinct counts). Uses :func:`vocab_stats`'s
    normalization so vocabulary views stay consistent.

    Exactness: counts are exact BIGINTs all the way down (a histogram of
    a histogram); ``r_star`` is one staged division of exact integers
    (``N_{r+1}`` fetched by a lead over the r-ordered frame, zero unless
    the NEXT present r is exactly r+1), rounded to 6 — bit-stable.

    Scale shape: token explode (O(corpus tokens), map-side), one term
    aggregate (Zipf-bounded), one r aggregate (≤ max distinct count —
    tiny), one ordered window over THAT. Nothing global touches rows.
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tf = (
        documents.select(F.explode(F.split(norm, " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("r"))
    )
    nr = tf.groupBy("r").agg(F.count("*").cast("long").alias("n_r"))
    w = Window.orderBy("r")
    lead_r = F.lead("r").over(w)
    lead_n = F.lead("n_r").over(w)
    n_next = F.when(lead_r == F.col("r") + 1, lead_n).otherwise(F.lit(0))
    return (
        nr.select(
            "r",
            "n_r",
            F.round(
                (F.col("r") + 1).cast("double")
                * n_next.cast("double")
                / F.col("n_r").cast("double"),
                6,
            ).alias("r_star"),
        )
        .where(F.col("r") <= max_r)
        .orderBy("r")
    )


def good_turing_counts_sql(table: str = "documents", max_r: int = 1000) -> str:
    """DuckDB oracle for :func:`good_turing_counts`."""
    return f"""
    WITH gt_tf AS (
      SELECT term, count(*) AS r FROM (
        SELECT unnest(string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
        FROM {table}
      ) WHERE term <> '' GROUP BY term
    ), gt_nr AS (
      SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM gt_tf GROUP BY r
    ), gt_l AS (
      SELECT r, n_r,
             CASE WHEN lead(r) OVER (ORDER BY r) = r + 1
                  THEN lead(n_r) OVER (ORDER BY r) ELSE 0 END AS n_next
      FROM gt_nr
    )
    SELECT r, n_r,
           round(CAST(r + 1 AS DOUBLE) * CAST(n_next AS DOUBLE)
                 / CAST(n_r AS DOUBLE), 6) AS r_star
    FROM gt_l WHERE r <= {int(max_r)} ORDER BY r
    """


def gt_unseen_mass(documents: DataFrame) -> DataFrame:
    """→ one row [n_tokens, n_types, n_hapax, p_unseen] — the Good–Turing
    missing-mass estimate ``P(unseen) = N_1 / N`` (hapax count over total
    tokens, Good 1953): the one-number answer to "how open is this
    corpus's vocabulary still", the companion scalar to
    :func:`good_turing_counts` and the honest denominator for OOV-rate
    planning. Exact integers; one staged division, rounded to 6; NULL on
    an empty corpus. Scale shape: one token explode + one term aggregate
    + a one-row reduce.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tf = (
        documents.select(F.explode(F.split(norm, " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("r"))
    )
    s = tf.groupBy().agg(
        F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_hapax"),
    )
    return s.select(
        "n_tokens",
        "n_types",
        "n_hapax",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("n_hapax").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        ).alias("p_unseen"),
    )


def gt_unseen_mass_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`gt_unseen_mass`."""
    return f"""
    WITH gtu_tf AS (
      SELECT term, count(*) AS r FROM (
        SELECT unnest(string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
        FROM {table}
      ) WHERE term <> '' GROUP BY term
    ), gtu_s AS (
      SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(coalesce(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_hapax
      FROM gtu_tf
    )
    SELECT n_tokens, n_types, n_hapax,
           CASE WHEN n_tokens > 0
                THEN round(CAST(n_hapax AS DOUBLE)
                           / CAST(n_tokens AS DOUBLE), 6) END AS p_unseen
    FROM gtu_s
    """


# ---------------------------------------------------------------------------
# Chi-square term-language feature selection (wave 96)
# ---------------------------------------------------------------------------


def chi2_terms(
    documents: DataFrame, min_df: int = 5, top_n: int = 50
) -> DataFrame:
    """→ [lang, term, n_lang_with, n_other_with, chi2] — the ``top_n``
    (term, language) associations by the one-vs-rest 2×2 chi-square over
    DOCUMENT-level term presence — the classic χ² feature-selection
    ranking (Manning/Schütze IR-textbook formulation; public method):
    which terms most distinguish one language's documents from the rest.
    Terms in fewer than ``min_df`` docs are excluded (unstable cells);
    the full term×lang lattice is scored, so "conspicuously ABSENT from
    a language" ranks too, not just presence.

    Determinism: all four cells a/b/c/d are exact BIGINTs; ``D = a·d −
    b·c`` stays BIGINT (each product ≤ N², safe to N ≈ 3e9 docs — ANSI
    raises past it); χ² = (N·D·D)/((a+b)(c+d)(a+c)(b+d)) is staged with
    every factor cast to double FIRST, identical text in both engines.
    The top-k orders by the ROUNDED chi2 (desc), then lang, then term —
    so the limit boundary cannot flip on a last-ulp engine difference.
    Degenerate margins (a term in every doc, a lang with every doc)
    yield denominator 0 → NULL chi2, excluded from the ranking.

    Scale shape: distinct (doc, term) explode; term df aggregate
    (Zipf-bounded); the lattice is (filtered vocabulary) × (languages) —
    built by a broadcastable cross join of two SMALL frames, never a
    fact-table product; one TakeOrdered(top_n) ends it.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    dt = (
        documents.select(
            "doc_id", "lang", F.explode(F.split(norm, " ")).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    vocab = (
        dt.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("tf"))
        .where(F.col("tf") >= min_df)
    )
    langs = documents.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_l")
    )
    n_docs = documents.groupBy().agg(F.countDistinct("doc_id").alias("n"))
    tl = dt.join(vocab, "term", "left_semi").groupBy("term", "lang").agg(
        F.countDistinct("doc_id").alias("a")
    )
    lattice = (
        vocab.crossJoin(langs)
        .join(tl, ["term", "lang"], "left")
        .crossJoin(n_docs)
        .select(
            "lang",
            "term",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("a"),
            (F.col("tf") - F.coalesce(F.col("a"), F.lit(0)))
            .cast("long")
            .alias("b"),
            (F.col("n_l") - F.coalesce(F.col("a"), F.lit(0)))
            .cast("long")
            .alias("c"),
            (
                F.col("n")
                - F.col("n_l")
                - (F.col("tf") - F.coalesce(F.col("a"), F.lit(0)))
            )
            .cast("long")
            .alias("d"),
            F.col("n").cast("long").alias("n"),
        )
    )
    dd = (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    denom = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
    )
    chi2 = F.when(
        denom > 0, F.round(F.col("n").cast("double") * dd * dd / denom, 6)
    )
    return (
        lattice.select(
            "lang",
            "term",
            F.col("a").alias("n_lang_with"),
            F.col("b").alias("n_other_with"),
            chi2.alias("chi2"),
        )
        .where(F.col("chi2").isNotNull())
        .orderBy(F.desc("chi2"), F.asc("lang"), F.asc("term"))
        .limit(top_n)
    )


def chi2_terms_sql(
    table: str = "documents", min_df: int = 5, top_n: int = 50
) -> str:
    """DuckDB oracle for :func:`chi2_terms` (same staged doubles, same
    rounded-chi2 tie-break)."""
    return f"""
    WITH x2_dt AS (
      SELECT DISTINCT doc_id, lang, term FROM (
        SELECT doc_id, lang, unnest(string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
        FROM {table}
      ) WHERE term <> ''
    ), x2_v AS (
      SELECT term, count(DISTINCT doc_id) AS tf FROM x2_dt GROUP BY term
      HAVING count(DISTINCT doc_id) >= {int(min_df)}
    ), x2_l AS (
      SELECT lang, count(DISTINCT doc_id) AS n_l FROM {table} GROUP BY lang
    ), x2_n AS (
      SELECT count(DISTINCT doc_id) AS n FROM {table}
    ), x2_tl AS (
      SELECT t.term, t.lang, count(DISTINCT t.doc_id) AS a
      FROM x2_dt t JOIN x2_v v USING (term) GROUP BY t.term, t.lang
    ), x2_cells AS (
      SELECT l.lang, v.term,
             CAST(coalesce(tl.a, 0) AS BIGINT) AS a,
             CAST(v.tf - coalesce(tl.a, 0) AS BIGINT) AS b,
             CAST(l.n_l - coalesce(tl.a, 0) AS BIGINT) AS c,
             CAST(n.n - l.n_l - (v.tf - coalesce(tl.a, 0)) AS BIGINT) AS d,
             CAST(n.n AS BIGINT) AS n
      FROM x2_v v CROSS JOIN x2_l l CROSS JOIN x2_n n
      LEFT JOIN x2_tl tl ON tl.term = v.term AND tl.lang = l.lang
    ), x2_s AS (
      SELECT lang, term, a AS n_lang_with, b AS n_other_with,
             CASE WHEN CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                       * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE) > 0
                  THEN round(CAST(n AS DOUBLE)
                         * CAST(a * d - b * c AS DOUBLE)
                         * CAST(a * d - b * c AS DOUBLE)
                         / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                            * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)),
                         6)
             END AS chi2
      FROM x2_cells
    )
    SELECT * FROM x2_s WHERE chi2 IS NOT NULL
    ORDER BY chi2 DESC, lang ASC, term ASC LIMIT {int(top_n)}
    """


# ---------------------------------------------------------------------------
# Held-out unigram perplexity (wave 105)
# ---------------------------------------------------------------------------


def heldout_perplexity(documents: DataFrame) -> DataFrame:
    """→ one row [n_train_tokens, n_test_tokens, vocab, n_oov, oov_rate,
    avg_nll, ppl] — the add-1-smoothed unigram language model TRAINED on
    the md5 train half of the corpus and EVALUATED on the held-out half
    (per-token p(w) = (c_w + 1)/(T + V + 1), unseen test tokens take
    c = 0): the honest LM-eval number — self-scored perplexity (the
    ``unigram_lm_score`` family) flatters the corpus; held-out
    perplexity is what generalizes. One relational aggregate end to end.

    Determinism: train counts are exact; each test token's negative
    log-probability is one IEEE expression over exact integers QUANTIZED
    to integer micro-nats (order-invariant sum — the NB trick);
    ``avg_nll`` is the rounded mean and ``ppl = exp(avg_nll_raw)`` is
    staged from the same integer sum in both engines. NULL metrics when
    either half is empty. The md5 split is the same deterministic
    user/doc split the A/B family uses.

    Scale shape: one token explode per half, one vocabulary-grain count
    (Zipf-bounded), a broadcast vocabulary join onto test tokens, one
    one-row reduce. No per-doc windows.
    """
    from linkgraph_spark.functions.hashing import md5_long

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = (
        documents.select(
            (md5_long(F.col("doc_id").cast("string")) % 2).alias("variant"),
            F.explode(F.split(norm, " ")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    tr = toks.where(F.col("variant") == 0).groupBy("w").agg(
        F.count("*").alias("c")
    )
    tot = tr.groupBy().agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("t"),
        F.count("*").cast("long").alias("v"),
    )
    te = (
        toks.where(F.col("variant") == 1)
        .join(tr, "w", "left")
        .crossJoin(tot)
        .select(
            "t",
            "v",
            F.coalesce(F.col("c"), F.lit(0)).alias("cw"),
        )
    )
    nll_u = F.expr(
        "CAST(round(-1e6 * ln((CAST(cw AS DOUBLE) + 1.0)"
        " / (CAST(t AS DOUBLE) + v + 1.0)), 0) AS BIGINT)"
    )
    s = te.groupBy().agg(
        F.max("t").alias("n_train_tokens"),
        F.count("*").cast("long").alias("n_test_tokens"),
        F.max("v").alias("vocab"),
        F.coalesce(
            F.sum(F.when(F.col("cw") == 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_oov"),
        F.sum(nll_u).alias("nll_sum"),
    )
    return s.select(
        "n_train_tokens",
        "n_test_tokens",
        "vocab",
        "n_oov",
        F.expr(
            "CASE WHEN n_test_tokens > 0 THEN"
            " round(CAST(n_oov AS DOUBLE) / n_test_tokens, 6) END"
        ).alias("oov_rate"),
        F.expr(
            "CASE WHEN n_test_tokens > 0 AND n_train_tokens > 0 THEN"
            " round(CAST(nll_sum AS DOUBLE) / (1e6 * n_test_tokens), 6) END"
        ).alias("avg_nll"),
        F.expr(
            "CASE WHEN n_test_tokens > 0 AND n_train_tokens > 0 THEN"
            " round(exp(CAST(nll_sum AS DOUBLE) / (1e6 * n_test_tokens)), 6)"
            " END"
        ).alias("ppl"),
    )


def heldout_perplexity_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`heldout_perplexity` (same micro-nat
    terms, same staged exp)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH hop_t AS (
      SELECT ({h}) % 2 AS variant, unnest(string_split(
        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
      FROM {table}
    ), hop_tok AS (
      SELECT variant, w FROM hop_t WHERE w <> ''
    ), hop_tr AS (
      SELECT w, count(*) AS c FROM hop_tok WHERE variant = 0 GROUP BY w
    ), hop_tot AS (
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS v
      FROM hop_tr
    ), hop_te AS (
      SELECT tot.t, tot.v, coalesce(tr.c, 0) AS cw
      FROM hop_tok te
      LEFT JOIN hop_tr tr ON tr.w = te.w
      CROSS JOIN hop_tot tot
      WHERE te.variant = 1
    ), hop_s AS (
      SELECT max(t) AS n_train_tokens,
             CAST(count(*) AS BIGINT) AS n_test_tokens,
             max(v) AS vocab,
             CAST(coalesce(sum(CASE WHEN cw = 0 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_oov,
             sum(CAST(round(-1e6 * ln((CAST(cw AS DOUBLE) + 1.0)
                 / (CAST(t AS DOUBLE) + v + 1.0)), 0) AS BIGINT)) AS nll_sum
      FROM hop_te
    )
    SELECT n_train_tokens, n_test_tokens, vocab, n_oov,
           CASE WHEN n_test_tokens > 0 THEN
             round(CAST(n_oov AS DOUBLE) / n_test_tokens, 6) END AS oov_rate,
           CASE WHEN n_test_tokens > 0 AND n_train_tokens > 0 THEN
             round(CAST(nll_sum AS DOUBLE) / (1e6 * n_test_tokens), 6)
           END AS avg_nll,
           CASE WHEN n_test_tokens > 0 AND n_train_tokens > 0 THEN
             round(exp(CAST(nll_sum AS DOUBLE) / (1e6 * n_test_tokens)), 6)
           END AS ppl
    FROM hop_s
    """


def lang_id_kappa(documents: DataFrame) -> DataFrame:
    """→ one row [n, n_agree, po, pe, kappa] — Cohen's κ (Cohen 1960)
    between :func:`lang_id`'s stopword-heuristic prediction and the
    labeled ``lang`` column: chance-corrected agreement, the honest
    score for a classifier whose classes are imbalanced (raw accuracy
    flatters the majority class). κ = (p_o − p_e)/(1 − p_e) with p_e
    from the marginal products.

    Exactness: the confusion margins are exact BIGINTs; p_o is one
    integer ratio and p_e one staged sum of margin products over n²
    (DECIMAL(38,0)/HUGEINT — products touch n²); κ re-derives from the
    same integers through one shared expression, rounded 6, NULL when
    p_e = 1 (both raters constant and equal — undefined).

    Scale shape: the prediction is a map-only expression per document;
    one aggregate to (pred, label) cell grain; margins re-derived from
    the cell table; one-row reduce.
    """
    pred = lang_id(documents).select("doc_id", "lang_pred")
    cells = (
        documents.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang_pred", "lang")
        .agg(F.count("*").alias("c"))
    )
    am = cells.groupBy("lang_pred").agg(F.sum("c").alias("ca"))
    bm = cells.groupBy(F.col("lang").alias("lang_pred")).agg(
        F.sum("c").alias("cb")
    )
    marg = am.join(bm, "lang_pred", "full_outer").select(
        F.coalesce("ca", F.lit(0)).cast("decimal(38,0)").alias("ca"),
        F.coalesce("cb", F.lit(0)).cast("decimal(38,0)").alias("cb"),
    )
    pe_num = marg.groupBy().agg(
        F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias("pe_num")
    )
    s = cells.groupBy().agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("lang_pred") == F.col("lang"), F.col("c"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_agree"),
    )
    return s.crossJoin(pe_num).select(
        "n",
        "n_agree",
        F.expr(
            "CASE WHEN n > 0 THEN round(CAST(n_agree AS DOUBLE) / n, 6) END"
        ).alias("po"),
        F.expr(
            "CASE WHEN n > 0 THEN round(CAST(pe_num AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * n), 6) END"
        ).alias("pe"),
        F.expr(
            "CASE WHEN n > 0 AND CAST(pe_num AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * n) <> 1.0 THEN"
            " round((CAST(n_agree AS DOUBLE) / n"
            "   - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n))"
            " / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n)), 6)"
            " END"
        ).alias("kappa"),
    )


def lang_id_kappa_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`lang_id_kappa` (wraps :func:`lang_id_sql`
    as a subquery; same staged kappa)."""
    inner = lang_id_sql(table)
    return f"""
    WITH kap_p AS ({inner}),
    kap_c AS (
      SELECT p.lang_pred, d.lang, count(*) AS c
      FROM {table} d JOIN kap_p p USING (doc_id)
      GROUP BY 1, 2
    ), kap_am AS (
      SELECT lang_pred AS k, sum(c) AS ca FROM kap_c GROUP BY 1
    ), kap_bm AS (
      SELECT lang AS k, sum(c) AS cb FROM kap_c GROUP BY 1
    ), kap_pe AS (
      SELECT coalesce(sum(CAST(coalesce(ca, 0) AS HUGEINT)
                          * coalesce(cb, 0)), 0) AS pe_num
      FROM kap_am FULL OUTER JOIN kap_bm USING (k)
    ), kap_s AS (
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
             CAST(coalesce(sum(CASE WHEN lang_pred = lang THEN c END), 0)
                  AS BIGINT) AS n_agree
      FROM kap_c
    )
    SELECT n, n_agree,
           CASE WHEN n > 0 THEN round(CAST(n_agree AS DOUBLE) / n, 6) END
             AS po,
           CASE WHEN n > 0 THEN round(CAST(pe_num AS DOUBLE)
             / (CAST(n AS DOUBLE) * n), 6) END AS pe,
           CASE WHEN n > 0 AND CAST(pe_num AS DOUBLE)
                / (CAST(n AS DOUBLE) * n) <> 1.0 THEN
             round((CAST(n_agree AS DOUBLE) / n
               - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n))
             / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n)), 6)
           END AS kappa
    FROM kap_s, kap_pe
    """


def eb_source_quality(
    documents: DataFrame, threshold: float = 0.75
) -> DataFrame:
    """→ [source, n_docs, n_good, rate, shrunk_rate] — per-source share
    of GOOD documents (quality ≥ ``threshold`` per :func:`quality_score`)
    with EMPIRICAL-BAYES beta-binomial shrinkage toward the cross-source
    prior (Robbins 1956 lineage; the method-of-moments prior-strength
    estimate K = m(1−m)/Var(r) − 1, shrunk = (x + K·m)/(n + K)): the
    small-n-corrected source ranking — a 3-doc source with 3 hits should
    NOT outrank a 10k-doc source at 92%, and raw rates say it does.

    Determinism: the good-doc predicate compares the exact 2-dp quality
    against an exact binary threshold; per-source rates are quantized to
    integer micro-units, so the prior moments are exact integer sums
    (DECIMAL/HUGEINT for the square); K and every shrunk rate are staged
    doubles from those integers, rounded 6. Degenerate priors (zero
    across-source variance, or K ≤ 0 — the prior carries no signal)
    fall back to the RAW rate, documented, never a NaN.

    Scale shape: map-only per-doc scoring, one source-grain aggregate
    (low-cardinality), prior moments over the |sources| frame, one
    broadcast of the one-row prior back onto it.
    """
    thr = float(threshold)
    q = quality_score(documents).select("doc_id", "quality")
    per = (
        documents.select("doc_id", "source")
        .join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("quality") >= thr, 1).otherwise(0)
            ).alias("x"),
        )
        .withColumn(
            "r_u",
            F.round(
                F.lit(1e6) * F.col("x").cast("double") / F.col("n"), 0
            ).cast("long"),
        )
    )
    prior = per.groupBy().agg(
        F.count("*").cast("long").alias("s"),
        F.sum(F.col("r_u").cast("decimal(38,0)")).alias("sr"),
        F.sum(F.col("r_u").cast("decimal(38,0)") * F.col("r_u")).alias("srr"),
    )
    j = per.crossJoin(F.broadcast(prior))
    m_d = "CAST(sr AS DOUBLE) / (1e6 * s)"
    v_d = (
        "(CAST(s AS DOUBLE) * CAST(srr AS DOUBLE)"
        " - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))"
        " / (1e12 * CAST(s AS DOUBLE) * s)"
    )
    kk = f"(({m_d}) * (1.0 - ({m_d})) / ({v_d}) - 1.0)"
    return j.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("x").cast("long").alias("n_good"),
        F.expr("round(CAST(x AS DOUBLE) / n, 6)").alias("rate"),
        F.expr(
            f"CASE WHEN s >= 2 AND ({v_d}) > 0 AND ({kk}) > 0 THEN"
            f" round((CAST(x AS DOUBLE) + ({kk}) * ({m_d}))"
            f" / (CAST(n AS DOUBLE) + ({kk})), 6)"
            " ELSE round(CAST(x AS DOUBLE) / n, 6) END"
        ).alias("shrunk_rate"),
    ).orderBy("source")


def eb_source_quality_sql(
    table: str = "documents", threshold: float = 0.75
) -> str:
    """DuckDB oracle for :func:`eb_source_quality` (wraps the per-doc
    quality SQL; same staged prior)."""
    thr = float(threshold)
    inner = quality_score_sql(table)
    m_d = "CAST(sr AS DOUBLE) / (1e6 * s)"
    v_d = (
        "(CAST(s AS DOUBLE) * CAST(srr AS DOUBLE)"
        " - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))"
        " / (1e12 * CAST(s AS DOUBLE) * s)"
    )
    kk = f"(({m_d}) * (1.0 - ({m_d})) / ({v_d}) - 1.0)"
    return f"""
    WITH ebq_q AS ({inner}),
    ebq_p AS (
      SELECT d.source, count(*) AS n,
             sum(CASE WHEN q.quality >= {thr!r} THEN 1 ELSE 0 END) AS x
      FROM {table} d JOIN ebq_q q USING (doc_id)
      GROUP BY d.source
    ), ebq_r AS (
      SELECT *, CAST(round(1e6 * CAST(x AS DOUBLE) / n, 0) AS BIGINT) AS r_u
      FROM ebq_p
    ), ebq_prior AS (
      SELECT CAST(count(*) AS BIGINT) AS s,
             sum(CAST(r_u AS HUGEINT)) AS sr,
             sum(CAST(r_u AS HUGEINT) * r_u) AS srr
      FROM ebq_r
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(x AS BIGINT) AS n_good,
           round(CAST(x AS DOUBLE) / n, 6) AS rate,
           CASE WHEN s >= 2 AND ({v_d}) > 0 AND ({kk}) > 0 THEN
             round((CAST(x AS DOUBLE) + ({kk}) * ({m_d}))
                   / (CAST(n AS DOUBLE) + ({kk})), 6)
           ELSE round(CAST(x AS DOUBLE) / n, 6) END AS shrunk_rate
    FROM ebq_r CROSS JOIN ebq_prior
    ORDER BY source
    """


def source_lang_diversity(documents: DataFrame) -> DataFrame:
    """→ [source, n_docs, n_langs, inv_simpson] — per ingest source, the
    inverse Simpson index 1/Σp² (Simpson 1949) of its language mix: the
    "effective number of languages" a source really contributes (a
    source that is 96% one language scores ≈ 1 however many languages it
    nominally touches). The diversity lens on the corpus-mixing family.

    Exactness: inv_simpson = n²/Σc² — one staged division of exact
    integers (DECIMAL/HUGEINT for the squares), rounded 6. A one-doc
    source scores exactly 1.0. Scale shape: one (source, lang) cell
    aggregate, one source-grain reduce — both map-side combinable.
    """
    cells = documents.groupBy("source", "lang").agg(F.count("*").alias("c"))
    s = cells.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_langs"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("c2"),
    )
    return s.select(
        "source",
        "n_docs",
        "n_langs",
        F.expr(
            "CASE WHEN CAST(c2 AS DOUBLE) > 0 THEN"
            " round(CAST(n_docs AS DOUBLE) * n_docs / CAST(c2 AS DOUBLE), 6)"
            " END"
        ).alias("inv_simpson"),
    ).orderBy("source")


def source_lang_diversity_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`source_lang_diversity`."""
    return f"""
    WITH sld_c AS (
      SELECT source, lang, count(*) AS c FROM {table} GROUP BY 1, 2
    ), sld_s AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             sum(CAST(c AS HUGEINT) * c) AS c2
      FROM sld_c GROUP BY source
    )
    SELECT source, n_docs, n_langs,
           CASE WHEN CAST(c2 AS DOUBLE) > 0 THEN
             round(CAST(n_docs AS DOUBLE) * n_docs / CAST(c2 AS DOUBLE), 6)
           END AS inv_simpson
    FROM sld_s ORDER BY source
    """


def lang_confusability(documents: DataFrame) -> DataFrame:
    """→ [lang_a, lang_b, n_shared_trigrams, cosine] — pairwise cosine
    similarity between LANGUAGE character-trigram count profiles (the
    TextCat/CLD feature space; Cavnar & Trenkle 1994): which language
    pairs a profile-based identifier will plausibly confuse — the
    confusability companion to :func:`lang_id_kappa`'s measured
    agreement (high cosine here predicts kappa's confusion cells).

    Exactness: profile dot products and norms are exact integer sums
    over trigram counts (DECIMAL(38,0)/HUGEINT — count products), so
    only the final cosine is one staged sqrt division, rounded 6; pairs
    are canonical (lang_a < lang_b); a language with an empty profile
    cannot appear (its docs host no trigram).

    Scale shape: one (lang, trigram) aggregate (bounded by
    |langs|·|alphabet|³, not corpus size), one trigram-keyed self-join
    of that TINY profile table, one pair-grain reduce; norms broadcast
    back.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = documents.select("lang", norm.alias("norm")).where(
        F.length("norm") >= 3
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.length("norm") - F.lit(2)),
        lambda i: F.col("norm").substr(i, F.lit(3)),
    )
    prof = (
        d.select("lang", F.explode(grams).alias("g"))
        .groupBy("lang", "g")
        .agg(F.count("*").alias("c"))
    )
    norms = prof.groupBy("lang").agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("nn")
    )
    a = prof.select(F.col("lang").alias("lang_a"), "g", F.col("c").alias("ca"))
    b = prof.select(F.col("lang").alias("lang_b"), "g", F.col("c").alias("cb"))
    dots = (
        a.join(b, "g")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.count("*").cast("long").alias("n_shared_trigrams"),
            F.sum(F.col("ca").cast("decimal(38,0)") * F.col("cb")).alias("dot"),
        )
    )
    na = norms.select(F.col("lang").alias("lang_a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("lang").alias("lang_b"), F.col("nn").alias("nb"))
    return (
        dots.join(F.broadcast(na), "lang_a")
        .join(F.broadcast(nb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_shared_trigrams",
            F.expr(
                "round(CAST(dot AS DOUBLE)"
                " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)"
            ).alias("cosine"),
        )
        .orderBy("lang_a", "lang_b")
    )


def lang_confusability_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`lang_confusability` (same integer dot
    products; position lattice via the list-returning range())."""
    return f"""
    WITH lcf_d AS (
      SELECT lang,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM {table}
    ), lcf_g AS (
      SELECT lang, substr(norm, CAST(i AS INTEGER), 3) AS g
      FROM (
        SELECT lang, norm, unnest(range(1, len(norm) - 1)) AS i
        FROM lcf_d WHERE len(norm) >= 3
      )
    ), lcf_p AS (
      SELECT lang, g, count(*) AS c FROM lcf_g GROUP BY 1, 2
    ), lcf_n AS (
      SELECT lang, sum(CAST(c AS HUGEINT) * c) AS nn FROM lcf_p GROUP BY 1
    ), lcf_dot AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             CAST(count(*) AS BIGINT) AS n_shared_trigrams,
             sum(CAST(a.c AS HUGEINT) * b.c) AS dot
      FROM lcf_p a JOIN lcf_p b ON b.g = a.g AND a.lang < b.lang
      GROUP BY 1, 2
    )
    SELECT d.lang_a, d.lang_b, d.n_shared_trigrams,
           round(CAST(d.dot AS DOUBLE)
                 / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)), 6)
             AS cosine
    FROM lcf_dot d
    JOIN lcf_n na ON na.lang = d.lang_a
    JOIN lcf_n nb ON nb.lang = d.lang_b
    ORDER BY lang_a, lang_b
    """


# --------------------------------------------------------------- wave 125
def burrows_delta(documents: DataFrame, top_k: int = 50) -> DataFrame:
    """→ [source_a, source_b, n_terms, delta] for every unordered
    source pair — Burrows' Delta (Burrows 2002; Argamon 2008's
    formulation), the standard stylometric distance: over the corpus's
    ``top_k`` most frequent terms, Δ(a,b) = meanₜ |z_a,t − z_b,t| of
    the per-source relative-frequency z-scores. Low Δ = same "stylistic
    fingerprint" — the attribution / register-drift read that topical
    measures like TF-IDF or KL can't give, because it lives entirely
    in the high-frequency function words.

    Exactness: per-source term counts and token totals are exact; each
    relative frequency quantizes ONCE to nano units (round(1e9·tf/T))
    so all cross-source moments are exact integer sums over the
    DENSIFIED source×term lattice (a source that never uses a term
    contributes an exact 0, not an absent row). The z-difference
    |z_a−z_b| = |q_a−q_b|·n/√(n·Σq²−(Σq)²) needs no mean and ONE
    staged sqrt per term (shared literal), and each pair-term value is
    micro-quantized before the pair sum, so Δ is order-invariant.
    Zero-variance terms (every source at the same rate) are excluded
    from the mean — n_terms reports the effective k, identical for all
    pairs. NULL Δ when no term has variance.

    Scale shape: one token-grain aggregate to (source, term), a
    Zipf-bounded top-k (TakeOrdered), then EVERYTHING runs on the
    |sources|·k lattice (a few thousand rows) — the pair frame is
    |sources|²·k/2, still tiny; no window ever touches raw tokens.

    Reference parity: no text surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    k = int(top_k)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "source", F.explode(F.split(norm, " ")).alias("term")
    )
    stf = tok.groupBy("source", "term").agg(F.count("*").alias("tf"))
    tot = stf.groupBy("source").agg(F.sum("tf").alias("tt"))
    top = (
        stf.groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
        .orderBy(F.desc("ctf"), F.asc("term"))
        .limit(k)
        .select("term")
    )
    lattice = (
        tot.crossJoin(F.broadcast(top))
        .join(stf, ["source", "term"], "left")
        .select(
            "source",
            "term",
            F.expr(
                "CAST(round(1e9 * CAST(coalesce(tf, 0) AS DOUBLE) / tt, 0)"
                " AS BIGINT)"
            ).alias("q"),
        )
    )
    d38 = "decimal(38,0)"
    per_term = lattice.groupBy("term").agg(
        F.count("*").cast("long").alias("ns"),
        F.sum(F.col("q").cast(d38)).alias("sq"),
        F.sum(F.col("q").cast(d38) * F.col("q")).alias("sqq"),
    )
    per_term = per_term.withColumn(
        "vn",
        F.col("ns").cast(d38) * F.col("sqq") - F.col("sq") * F.col("sq"),
    )
    a = lattice.select(
        F.col("source").alias("source_a"), "term", F.col("q").alias("qa")
    )
    b = lattice.select(
        F.col("source").alias("source_b"), "term", F.col("q").alias("qb")
    )
    pairs = (
        a.join(b, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(per_term.where(F.col("vn") > 0)), "term")
        .select(
            "source_a",
            "source_b",
            F.expr(
                "CAST(round(1e6 * abs(CAST(qa AS DOUBLE) - qb) * ns"
                " / sqrt(CAST(vn AS DOUBLE)), 0) AS BIGINT)"
            ).alias("zt"),
        )
    )
    keff = per_term.groupBy().agg(
        F.sum(F.when(F.col("vn") > 0, 1).otherwise(0))
        .cast("long")
        .alias("k_eff")
    )
    out = (
        pairs.groupBy("source_a", "source_b")
        .agg(F.sum(F.col("zt").cast(d38)).alias("zs"))
        .crossJoin(F.broadcast(keff))
    )
    return out.select(
        "source_a",
        "source_b",
        F.col("k_eff").alias("n_terms"),
        F.expr(
            "CASE WHEN k_eff > 0 THEN"
            " round(CAST(zs AS DOUBLE) / 1e6 / k_eff, 6) END"
        ).alias("delta"),
    ).orderBy("source_a", "source_b")


def burrows_delta_sql(table: str = "documents", top_k: int = 50) -> str:
    """DuckDB oracle for :func:`burrows_delta` (same nano-quantized
    rates, densified lattice, micro-quantized pair terms)."""
    k = int(top_k)
    return f"""
    WITH bd_tok AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
               AS term
      FROM {table}
    ), bd_stf AS (
      SELECT source, term, count(*) AS tf FROM bd_tok GROUP BY 1, 2
    ), bd_tot AS (
      SELECT source, sum(tf) AS tt FROM bd_stf GROUP BY source
    ), bd_top AS (
      SELECT term FROM bd_stf GROUP BY term
      ORDER BY sum(tf) DESC, term ASC LIMIT {k}
    ), bd_l AS (
      SELECT t.source, p.term,
             CAST(round(1e9 * CAST(coalesce(s.tf, 0) AS DOUBLE) / t.tt, 0)
                  AS BIGINT) AS q
      FROM bd_tot t CROSS JOIN bd_top p
      LEFT JOIN bd_stf s ON s.source = t.source AND s.term = p.term
    ), bd_pt AS (
      SELECT term, CAST(count(*) AS BIGINT) AS ns,
             sum(CAST(q AS HUGEINT)) AS sq,
             sum(CAST(q AS HUGEINT) * q) AS sqq
      FROM bd_l GROUP BY term
    ), bd_v AS (
      SELECT term, ns,
             CAST(ns AS HUGEINT) * sqq - sq * sq AS vn
      FROM bd_pt
    ), bd_k AS (
      SELECT CAST(sum(CASE WHEN vn > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS k_eff
      FROM bd_v
    ), bd_p AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(round(1e6 * abs(CAST(a.q AS DOUBLE) - b.q) * v.ns
                  / sqrt(CAST(v.vn AS DOUBLE)), 0) AS BIGINT) AS zt
      FROM bd_l a
      JOIN bd_l b ON a.term = b.term AND a.source < b.source
      JOIN bd_v v ON v.term = a.term AND v.vn > 0
    ), bd_s AS (
      SELECT source_a, source_b, sum(CAST(zt AS HUGEINT)) AS zs
      FROM bd_p GROUP BY 1, 2
    )
    SELECT source_a, source_b, k_eff AS n_terms,
           CASE WHEN k_eff > 0 THEN
             round(CAST(zs AS DOUBLE) / 1e6 / k_eff, 6) END AS delta
    FROM bd_s CROSS JOIN bd_k
    ORDER BY source_a, source_b
    """


# --------------------------------------------------------------- wave 129
def chunking_plan(
    documents: DataFrame, window: int = 128, stride: int = 96
) -> DataFrame:
    """→ [lang, n_docs, n_tokens, n_chunks, overlap_tokens,
    avg_chunks_per_doc] — the sliding-window chunking plan per
    language: how many (window, stride) chunks long-document splitting
    will emit, and how many tokens the overlap duplicates. The
    capacity estimate a RAG indexer or a context-window preprocessor
    needs BEFORE materializing chunks — at corpus scale you budget the
    chunk store from this table, not by running the chunker twice.

    Semantics (documented estimand): a document with n whitespace
    tokens yields 1 chunk when n ≤ window, else
    1 + ceil((n − window)/stride) chunks (the final chunk may be
    short — no padding); each chunk after the first re-reads
    window − stride tokens when it is full, and the plan counts the
    exact re-read total from chunk starts, not the worst case.

    Exactness: per-document token counts, chunk counts and overlap
    totals are closed-form INTEGER arithmetic (ceil via (a + b − 1)
    DIV b, aligned Spark DIV / DuckDB //); the per-language reduce
    sums exact BIGINTs; the only double is the display-side average,
    staged and rounded 6.

    Scale shape: map-only per-document expressions (no explode — the
    chunk COUNT needs no chunk rows), one bounded group-by. The
    chunker itself stays embarrassingly parallel.

    Reference parity: no text surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    wdw, st = int(window), int(stride)
    if not (0 < st <= wdw):
        raise ValueError("need 0 < stride <= window")
    n = F.size(_tokens(F.col("text")))
    chunks = F.expr(
        f"CASE WHEN n_tok <= {wdw} THEN 1"
        f" ELSE 1 + (n_tok - {wdw} + {st} - 1) DIV {st} END"
    )
    per = documents.select(
        "lang",
        n.alias("n_tok"),
    ).select(
        "lang",
        "n_tok",
        chunks.alias("n_chunks"),
    ).select(
        "lang",
        "n_tok",
        "n_chunks",
        # every chunk after the first re-reads exactly window - stride
        # tokens: the last chunk's start (k-1)*stride is always inside
        # the previous chunk by > window - stride tokens (its length is
        # in (window-stride, window]), so overlap = (k-1)*(window-stride)
        # exactly — verified against a brute-force chunker in the test
        F.expr(
            f"(n_chunks - 1) * {wdw - st}"
        ).alias("ov_raw"),
    )
    agg = per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
        F.sum(F.col("n_chunks").cast("long")).alias("n_chunks"),
        F.sum(F.col("ov_raw").cast("long")).alias("overlap_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chunks",
        "overlap_tokens",
        F.expr(
            "CASE WHEN n_docs > 0 THEN"
            " round(CAST(n_chunks AS DOUBLE) / n_docs, 6) END"
        ).alias("avg_chunks_per_doc"),
    ).orderBy("lang")


def chunking_plan_sql(
    table: str = "documents", window: int = 128, stride: int = 96
) -> str:
    """DuckDB oracle for :func:`chunking_plan` (same closed-form
    integer chunk arithmetic)."""
    wdw, st = int(window), int(stride)
    return f"""
    WITH chp_d AS (
      SELECT lang,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM {table}
    ), chp_c AS (
      SELECT lang, n_tok,
             CASE WHEN n_tok <= {wdw} THEN 1
                  ELSE 1 + (n_tok - {wdw} + {st} - 1) // {st} END AS n_chunks
      FROM chp_d
    ), chp_o AS (
      SELECT lang, n_tok, n_chunks,
             (n_chunks - 1) * {wdw - st} AS ov_raw
      FROM chp_c
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
           CAST(sum(ov_raw) AS BIGINT) AS overlap_tokens,
           CASE WHEN count(*) > 0 THEN
             round(CAST(sum(n_chunks) AS DOUBLE) / count(*), 6) END
             AS avg_chunks_per_doc
    FROM chp_o
    GROUP BY lang ORDER BY lang
    """


# --------------------------------------------------------------- wave 138
def chao1_vocab(documents: DataFrame) -> DataFrame:
    """→ [source, n_tokens, v_obs, f1, f2, chao1, chao1_se] — the Chao1
    nonparametric richness estimator (Chao 1984) per ingest source:
    how many DISTINCT terms does this source's true vocabulary hold,
    including the ones the sample hasn't shown yet —
    Chao1 = V + F₁²/(2F₂) from the singleton/doubleton counts, with
    the classical SE (Chao 1987). The "how much vocabulary is still
    unseen" capacity read next to vocab_richness's observed mass and
    gt_unseen_mass's probability view; a source whose chao1 ≫ v_obs
    is still yielding new tokens and its crawl shouldn't stop.

    Exactness: term frequencies, V, F₁, F₂ are exact BIGINTs from the
    (source, term) aggregate; the bias-corrected form
    F₁(F₁−1)/(2(F₂+1)) applies when F₂ = 0 (the standard convention,
    documented — never a division by zero); chao1 and its SE are ONE
    shared literal staged chain over (v, f1, f2), rounded 6. SE is
    NULL when F₂ = 0 (the ratio moments are undefined there).

    Scale shape: token explode → one (source, term) aggregate → one
    source-grain reduce over the frequency-of-frequency cells.

    Reference parity: no text surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "source", F.explode(F.split(norm, " ")).alias("term")
    )
    tf = tok.groupBy("source", "term").agg(F.count("*").alias("m"))
    s = tf.groupBy("source").agg(
        F.sum("m").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("v_obs"),
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).cast("long").alias(
            "f1"
        ),
        F.sum(F.when(F.col("m") == 2, 1).otherwise(0)).cast("long").alias(
            "f2"
        ),
    )
    chao = (
        "CASE WHEN f2 > 0 THEN"
        " v_obs + CAST(f1 AS DOUBLE) * f1 / (2.0 * f2)"
        " ELSE v_obs + CAST(f1 AS DOUBLE) * (f1 - 1.0) / 2.0 END"
    )
    r = "(CAST(f1 AS DOUBLE) / f2)"
    se = (
        f"sqrt(f2 * (0.5 * {r} * {r} + {r} * {r} * {r}"
        f" + 0.25 * {r} * {r} * {r} * {r}))"
    )
    return s.select(
        "source",
        "n_tokens",
        "v_obs",
        "f1",
        "f2",
        F.expr(f"round({chao}, 6)").alias("chao1"),
        F.expr(
            f"CASE WHEN f2 > 0 THEN round({se}, 6) END"
        ).alias("chao1_se"),
    ).orderBy("source")


def chao1_vocab_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`chao1_vocab` (same tokenizer, same
    bias-corrected branch and SE chain)."""
    chao = (
        "CASE WHEN f2 > 0 THEN"
        " v_obs + CAST(f1 AS DOUBLE) * f1 / (2.0 * f2)"
        " ELSE v_obs + CAST(f1 AS DOUBLE) * (f1 - 1.0) / 2.0 END"
    )
    r = "(CAST(f1 AS DOUBLE) / f2)"
    se = (
        f"sqrt(f2 * (0.5 * {r} * {r} + {r} * {r} * {r}"
        f" + 0.25 * {r} * {r} * {r} * {r}))"
    )
    return f"""
    WITH ch_tok AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
               AS term
      FROM {table}
    ), ch_tf AS (
      SELECT source, term, count(*) AS m FROM ch_tok GROUP BY 1, 2
    ), ch_s AS (
      SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS v_obs,
             CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM ch_tf GROUP BY source
    )
    SELECT source, n_tokens, v_obs, f1, f2,
           round({chao}, 6) AS chao1,
           CASE WHEN f2 > 0 THEN round({se}, 6) END AS chao1_se
    FROM ch_s ORDER BY source
    """


def kn_bigram_perplexity(documents: DataFrame, discount: float = 0.75) -> DataFrame:
    """→ one row ``[n_train_bigrams, n_bigram_types, vocab, n_test_bigrams,
    unseen_ctx_rate, avg_nll, ppl]`` — interpolated Kneser–Ney BIGRAM
    held-out perplexity (Kneser & Ney 1995 / Chen & Goodman 1998, public
    technique): the order-sensitive upgrade of :func:`heldout_perplexity`
    and the classic corpus-quality number for a training-data pipeline.
    Trained on the md5 train half, evaluated on every bigram event of the
    held-out half (a doc's first token conditions nothing and is skipped):

        p(w|u) = max(c(uw) − D, 0)/c(u·) + (D·N1+(u·)/c(u·))·P_cont(w)
        P_cont(w) = (N1+(·w) + 1) / (B + V + 1)          [add-1 escape]
        p(w|u)   = P_cont(w)            when context u is unseen in train

    where ``c(u·)`` is the context count, ``N1+(u·)`` the distinct
    continuations of ``u``, ``N1+(·w)`` the distinct left-contexts of
    ``w`` (the famous continuation count — "how many contexts has this
    word completed", not "how often"), ``B`` the distinct-bigram count
    and ``V`` the train vocabulary.  The +1/+V+1 escape on the
    continuation distribution is the engine's documented OOV treatment
    (pure KN leaves zero mass for words never seen in ANY context).

    Determinism: all counts are exact integers; each test event's
    probability is ONE shared IEEE expression (identical parenthesization
    in the SQL mirror) and its negative log is quantized to integer
    micro-nats before the order-invariant sum — the same staging as
    :func:`heldout_perplexity`.  ``unseen_ctx_rate`` and the two LM
    numbers are NULL when the test half has no bigram.

    Scale shape: map-only per-doc bigram construction (array transform,
    no per-token shuffle), three Zipf-bounded train aggregates (bigram
    types, context table, continuation table), broadcast-eligible joins
    onto the test bigram stream, one one-row reduce.  No per-doc windows.
    """
    from linkgraph_spark.functions.hashing import md5_long

    d = float(discount)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = F.filter(F.split(norm, " "), lambda x: x != "")
    base = documents.select(
        (md5_long(F.col("doc_id").cast("string")) % 2).alias("variant"),
        toks.alias("tk"),
    )
    n = F.size(F.col("tk"))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(F.col("tk"), i).alias("u"),
                F.element_at(F.col("tk"), i + 1).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,w:string>>"))
    bg = base.select("variant", F.explode(bigrams).alias("b")).select(
        "variant", F.col("b.u").alias("u"), F.col("b.w").alias("w")
    )
    cb = (
        bg.where(F.col("variant") == 0)
        .groupBy("u", "w")
        .agg(F.count("*").alias("cb"))
        .persist()
    )
    ctx = cb.groupBy("u").agg(
        F.sum("cb").alias("cu"), F.count("*").alias("n1u")
    )
    cont = cb.groupBy("w").agg(F.count("*").alias("n1w"))
    tot = cb.groupBy().agg(
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("n_train_bigrams"),
        F.count("*").cast("long").alias("b_types"),
    )
    voc = (
        base.where(F.col("variant") == 0)
        .select(F.explode("tk").alias("t"))
        .agg(F.count_distinct("t").cast("long").alias("v"))
    )
    te = (
        bg.where(F.col("variant") == 1)
        .join(cb, ["u", "w"], "left")
        .join(ctx, "u", "left")
        .join(cont, "w", "left")
        .crossJoin(tot)
        .crossJoin(voc)
    )
    p = F.expr(
        f"CASE WHEN cu IS NOT NULL AND cu > 0 THEN"
        f" greatest(CAST(coalesce(cb, 0) AS DOUBLE) - {d:.17g}, 0.0) / cu"
        f" + (({d:.17g} * n1u) / cu)"
        f" * ((CAST(coalesce(n1w, 0) AS DOUBLE) + 1.0) / (CAST(b_types AS DOUBLE) + v + 1.0))"
        f" ELSE (CAST(coalesce(n1w, 0) AS DOUBLE) + 1.0) / (CAST(b_types AS DOUBLE) + v + 1.0) END"
    )
    nll = F.expr(
        "CAST(round(-1e6 * ln(__p), 0) AS BIGINT)"
    )
    s = (
        te.withColumn("__p", p)
        .groupBy()
        .agg(
            F.max("n_train_bigrams").alias("n_train_bigrams"),
            F.max("b_types").alias("n_bigram_types"),
            F.max("v").alias("vocab"),
            F.count("*").cast("long").alias("n_test_bigrams"),
            F.coalesce(
                F.sum(F.when(F.col("cu").isNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_unseen_ctx"),
            F.sum(nll).alias("nll_sum"),
        )
    )
    out = s.select(
        F.coalesce("n_train_bigrams", F.lit(0)).alias("n_train_bigrams"),
        F.coalesce("n_bigram_types", F.lit(0)).alias("n_bigram_types"),
        F.coalesce("vocab", F.lit(0)).alias("vocab"),
        "n_test_bigrams",
        F.expr(
            "CASE WHEN n_test_bigrams > 0 THEN"
            " round(CAST(n_unseen_ctx AS DOUBLE) / n_test_bigrams, 6) END"
        ).alias("unseen_ctx_rate"),
        F.expr(
            "CASE WHEN n_test_bigrams > 0 THEN"
            " round(CAST(nll_sum AS DOUBLE) / (1e6 * n_test_bigrams), 6) END"
        ).alias("avg_nll"),
        F.expr(
            "CASE WHEN n_test_bigrams > 0 THEN"
            " round(exp(CAST(nll_sum AS DOUBLE) / (1e6 * n_test_bigrams)), 6)"
            " END"
        ).alias("ppl"),
    ).localCheckpoint()
    cb.unpersist()
    return out


def kn_bigram_perplexity_sql(table: str = "documents", discount: float = 0.75) -> str:
    """DuckDB oracle for :func:`kn_bigram_perplexity` — identical staging."""
    d = float(discount)
    return f"""
    WITH knt AS (
      SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS variant,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM {table}
    ), knbg AS (
      SELECT variant,
             unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                                   i -> {{'u': tk[i], 'w': tk[i + 1]}})) AS b
      FROM knt
    ), knb AS (
      SELECT variant, b.u AS u, b.w AS w FROM knbg
    ), kncb AS MATERIALIZED (
      SELECT u, w, count(*) AS cb FROM knb WHERE variant = 0 GROUP BY u, w
    ), knctx AS (
      SELECT u, sum(cb) AS cu, count(*) AS n1u FROM kncb GROUP BY u
    ), kncont AS (
      SELECT w, count(*) AS n1w FROM kncb GROUP BY w
    ), kntot AS (
      SELECT CAST(coalesce(sum(cb), 0) AS BIGINT) AS n_train_bigrams,
             CAST(count(*) AS BIGINT) AS b_types
      FROM kncb
    ), knvoc AS (
      SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
      FROM (SELECT unnest(tk) AS t FROM knt WHERE variant = 0)
    ), knte AS (
      SELECT CASE WHEN x.cu IS NOT NULL AND x.cu > 0 THEN
               greatest(CAST(coalesce(x.cb, 0) AS DOUBLE) - {d:.17g}, 0.0) / x.cu
               + (({d:.17g} * x.n1u) / x.cu)
               * ((CAST(coalesce(x.n1w, 0) AS DOUBLE) + 1.0) / (CAST(x.b_types AS DOUBLE) + x.v + 1.0))
             ELSE (CAST(coalesce(x.n1w, 0) AS DOUBLE) + 1.0) / (CAST(x.b_types AS DOUBLE) + x.v + 1.0) END AS p,
             x.cu AS cu, x.n_train_bigrams, x.b_types, x.v
      FROM (
        SELECT t.u, t.w, cb.cb, c.cu, c.n1u, k.n1w, kntot.n_train_bigrams,
               kntot.b_types, knvoc.v
        FROM knb t
        LEFT JOIN kncb cb ON cb.u = t.u AND cb.w = t.w
        LEFT JOIN knctx c ON c.u = t.u
        LEFT JOIN kncont k ON k.w = t.w
        CROSS JOIN kntot CROSS JOIN knvoc
        WHERE t.variant = 1
      ) x
    ), kns AS (
      SELECT max(n_train_bigrams) AS n_train_bigrams,
             max(b_types) AS n_bigram_types,
             max(v) AS vocab,
             CAST(count(*) AS BIGINT) AS n_test_bigrams,
             CAST(coalesce(sum(CASE WHEN cu IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unseen_ctx,
             sum(CAST(round(-1e6 * ln(p), 0) AS BIGINT)) AS nll_sum
      FROM knte
    )
    SELECT coalesce(n_train_bigrams, 0) AS n_train_bigrams,
           coalesce(n_bigram_types, 0) AS n_bigram_types,
           coalesce(vocab, 0) AS vocab,
           n_test_bigrams,
           CASE WHEN n_test_bigrams > 0 THEN
             round(CAST(n_unseen_ctx AS DOUBLE) / n_test_bigrams, 6) END AS unseen_ctx_rate,
           CASE WHEN n_test_bigrams > 0 THEN
             round(CAST(nll_sum AS DOUBLE) / (1e6 * n_test_bigrams), 6) END AS avg_nll,
           CASE WHEN n_test_bigrams > 0 THEN
             round(exp(CAST(nll_sum AS DOUBLE) / (1e6 * n_test_bigrams)), 6) END AS ppl
    FROM kns
    """


def memorization_rate(documents: DataFrame, n: int = 8) -> DataFrame:
    """→ ``[doc_id, n_windows, n_memorized, mem_rate]`` — the verbatim
    memorization probe (Carlini et al. 2022 lineage, public technique):
    for every HELD-OUT document (md5 test half), the fraction of its
    word-``n``-gram windows that appear verbatim anywhere in the train
    half.  The per-document complement of :func:`kn_bigram_perplexity`'s
    corpus number: a held-out doc whose 8-gram windows mostly exist in
    train is a near-copy the LM will "memorize" for free — rows with high
    ``mem_rate`` are the ones a train/test split audit must catch.  Docs
    with fewer than ``n`` tokens have no window and drop out (no rate is
    defined).  Distinct from ``contamination_check`` (corpus vs an
    external benchmark); this audits the corpus's own split.

    Scale shape: map-only window construction (array transform — no
    per-token shuffle), ONE distinct-hash aggregate over train windows
    (Zipf-bounded: repeated boilerplate collapses), one hash equi-join of
    test windows against it (broadcast-eligible), one per-doc re-agg.
    Windows are compared by the 60-bit md5 hash of the space-joined
    window — deterministic and identical in both engines."""
    from linkgraph_spark.functions.hashing import md5_long

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = F.filter(F.split(norm, " "), lambda x: x != "")
    base = documents.select(
        "doc_id",
        (md5_long(F.col("doc_id").cast("string")) % 2).alias("variant"),
        toks.alias("tk"),
    )
    sz = F.size(F.col("tk"))
    wins = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("tk"), i, F.lit(n))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wn = base.select(
        "doc_id", "variant", F.explode(wins).alias("w")
    ).withColumn("h", md5_long(F.col("w"))).drop("w")
    train = wn.where(F.col("variant") == 0).select("h").distinct()
    test = wn.where(F.col("variant") == 1)
    hit = train.withColumn("_mem", F.lit(1))
    return (
        test.join(hit, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.coalesce(F.sum("_mem"), F.lit(0)).cast("long").alias("n_memorized"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_memorized",
            F.round(
                F.col("n_memorized").cast("double") / F.col("n_windows"), 6
            ).alias("mem_rate"),
        )
    )


def memorization_rate_sql(table: str = "documents", n: int = 8) -> str:
    """DuckDB oracle for :func:`memorization_rate`."""
    return f"""
    WITH mrt AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS variant,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM {table}
    ), mrw AS (
      SELECT doc_id, variant,
             CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT doc_id, variant,
               unnest(list_transform(range(1, greatest(len(tk) - {n - 1}, 0) + 1),
                                     i -> array_to_string(tk[i:i+{n - 1}], ' '))) AS w
        FROM mrt
      )
    ), mr_train AS MATERIALIZED (
      SELECT DISTINCT h FROM mrw WHERE variant = 0
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(coalesce(sum(CASE WHEN tr.h IS NOT NULL THEN 1 END), 0) AS BIGINT)
             AS n_memorized,
           round(CAST(coalesce(sum(CASE WHEN tr.h IS NOT NULL THEN 1 END), 0) AS DOUBLE)
                 / count(*), 6) AS mem_rate
    FROM mrw t LEFT JOIN mr_train tr ON tr.h = t.h
    WHERE t.variant = 1
    GROUP BY t.doc_id
    """


def compression_ratio(documents: DataFrame, level: int = 6) -> DataFrame:
    """→ ``[doc_id, n_bytes, n_compressed, ratio]`` — per-document DEFLATE
    compression ratio (``len(zlib(text)) / len(text)``, rounded 6): the
    classic model-free repetitiveness gate (used by Gopher/FineWeb-class
    pipelines, public technique).  Boilerplate, template spam and
    copy-paste loops compress far below clean prose (ratio ≲ 0.3 is the
    usual red flag), and unlike :func:`repetition_stats`'s n-gram ratios
    this catches long-period repetition n-gram windows miss.  Empty
    documents report ``ratio`` NULL (nothing to compress).

    Engine note: the compressor is stdlib ``zlib`` inside an
    Arrow-batched ``mapInPandas`` (per-partition iterator, constant
    memory — the multimodal decode shape; NOT a per-row Python UDF).
    DuckDB has no SQL zlib, so this is one of the documented rows-only
    gate entries — pinned instead by an exact pytest oracle against
    python zlib on the same strings.

    Scale: embarrassingly parallel map-only pass; bytes-in = bytes-out
    metadata, no shuffle at all."""
    import zlib as _zlib

    import pandas as _pd

    lvl = int(level)
    schema = "doc_id long, n_bytes long, n_compressed long, ratio double"

    def compress(batches):
        for pdf in batches:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf["text"]
            ]
            nb = [len(b) for b in raw]
            nc = [len(_zlib.compress(b, lvl)) for b in raw]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio": [
                        round(c / b, 6) if b > 0 else None
                        for b, c in zip(nb, nc)
                    ],
                }
            )

    return documents.select("doc_id", "text").mapInPandas(compress, schema=schema)
