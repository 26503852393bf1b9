"""Corpus curation: the composed keep/drop pass a pretraining pipeline
actually ships, with per-filter accounting.

One operator applies the engine's quality signals in a single scan-side
pass — length band, punctuation ratio, stopword floor (``text.py``
heuristics), repetition/diversity bounds (Gopher-style,
``repetition_stats``) — plus an exact-duplicate drop (keep the smallest
doc_id per normalized text, ``dedup.py`` semantics), and emits every
document with its verdict AND the list of failed checks. Reason codes are
what make a 100 TB curation run debuggable: "we dropped 3.1% for
repetition and 0.4% as dups" is an aggregation over this output, not a
re-run with different logging.

Plan shape: all quality checks are map-only column expressions fused into
ONE projection over the scan; the only shuffle is the duplicate check's
hash aggregation on the normalized-text digest (the cheapest possible
dedup shuffle). Reasons are built with array/filter expressions — no
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.functions.text import STOPWORDS_EN, _tokens

# default thresholds — each one surfaced as a keyword so pipelines tune
# without forking the operator
MIN_TOKENS = 5
MAX_TOKENS = 100_000
MAX_PUNCT_RATIO = 0.2
MIN_STOPWORD_RATIO = 0.02
MIN_UNIQUE_TOKEN_RATIO = 0.3
MAX_DUP_BIGRAM_FRACTION = 0.5


def curate_corpus(
    documents: DataFrame,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    max_punct_ratio: float = MAX_PUNCT_RATIO,
    min_stopword_ratio: float = MIN_STOPWORD_RATIO,
    min_unique_token_ratio: float = MIN_UNIQUE_TOKEN_RATIO,
    max_dup_bigram_fraction: float = MAX_DUP_BIGRAM_FRACTION,
) -> DataFrame:
    """→ ``[doc_id, keep, reasons]`` — every document with its curation
    verdict and the sorted array of failed checks (empty when kept).

    Reason codes: ``too_short`` / ``too_long`` / ``punct`` / ``stopword``
    / ``low_diversity`` / ``repetition`` / ``exact_dup`` (non-keeper copy
    of a normalized-identical text; the smallest doc_id stays)."""
    # coalesce NULL text to '' up front: size()/length() disagree between
    # engines on NULL inputs, '' behaves identically (1 empty token, 0
    # chars) and trips too_short in both
    text = F.coalesce(F.col("text"), F.lit(""))
    toks = _tokens(F.lower(text))
    n = F.size(toks)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_uniq = F.size(F.array_distinct(toks))
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
    dup_bi = F.when(n_bi > 0, (n_bi - F.size(F.array_distinct(bigrams))) / n_bi).otherwise(
        F.lit(0.0)
    )

    # NULL text must still get a verdict: md5(NULL) is NULL and an inner
    # join on a NULL key silently drops the row from the accounting, so
    # the fingerprint coalesces to the empty-string digest (NULL/empty
    # docs dedup together and fail the too_short check)
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    keeper = documents.select(F.md5(norm).alias("_fp"), F.col("doc_id")).groupBy(
        "_fp"
    ).agg(F.min("doc_id").alias("_keeper"))

    checks = [
        ("too_short", n < min_tokens),
        ("too_long", n > max_tokens),
        # n_chars can be 0 (empty/NULL text) — guard the division (ANSI
        # mode errors on /0); too_short covers that row anyway
        ("punct", (n_chars > 0) & ((punct / n_chars) > max_punct_ratio)),
        ("stopword", (n_stop / n) < min_stopword_ratio),
        ("low_diversity", (n_uniq / n) < min_unique_token_ratio),
        ("repetition", dup_bi > max_dup_bigram_fraction),
        ("exact_dup", F.col("doc_id") != F.col("_keeper")),
    ]
    reasons = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in checks]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        documents.withColumn("_fp", F.md5(norm))
        .join(keeper, "_fp")
        .select(
            "doc_id",
            (F.size(reasons) == 0).alias("keep"),
            reasons.alias("reasons"),
        )
    )


def curate_corpus_sql(
    table: str = "documents",
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    max_punct_ratio: float = MAX_PUNCT_RATIO,
    min_stopword_ratio: float = MIN_STOPWORD_RATIO,
    min_unique_token_ratio: float = MIN_UNIQUE_TOKEN_RATIO,
    max_dup_bigram_fraction: float = MAX_DUP_BIGRAM_FRACTION,
) -> str:
    """DuckDB oracle — same checks, reasons joined to one string column
    (the gate compares ``reasons_str`` since array columns don't hash
    portably across engines)."""
    stops = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
    WITH cur_base AS (
      SELECT doc_id, coalesce(text, '') AS text FROM {table}
    ), cur_base2 AS (
      SELECT doc_id, text,
             string_split_regex(trim(lower(text)), '\\s+') AS toks,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
               AS punct,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM cur_base
    ), cur_feat AS (
      SELECT doc_id, fp, n_chars, punct,
             len(toks) AS n,
             len(list_filter(toks, t -> list_contains([{stops}], t))) AS n_stop,
             len(list_distinct(toks)) AS n_uniq,
             list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bi
      FROM cur_base2
    ), cur_keeper AS (
      SELECT fp, min(doc_id) AS keeper FROM cur_feat GROUP BY fp
    ), cur_flags AS (
      SELECT f.doc_id,
             f.n < {min_tokens} AS too_short,
             f.n > {max_tokens} AS too_long,
             (f.n_chars > 0 AND
              (f.punct / CAST(f.n_chars AS DOUBLE)) > {max_punct_ratio!r}) AS punct_bad,
             (f.n_stop / CAST(f.n AS DOUBLE)) < {min_stopword_ratio!r} AS stop_bad,
             (f.n_uniq / CAST(f.n AS DOUBLE)) < {min_unique_token_ratio!r} AS div_bad,
             (CASE WHEN len(f.bi) > 0
                   THEN (len(f.bi) - len(list_distinct(f.bi))) / CAST(len(f.bi) AS DOUBLE)
                   ELSE 0.0 END) > {max_dup_bigram_fraction!r} AS rep_bad,
             f.doc_id <> k.keeper AS dup_bad
      FROM cur_feat f JOIN cur_keeper k USING (fp)
    )
    SELECT doc_id,
           NOT (too_short OR too_long OR punct_bad OR stop_bad OR div_bad
                OR rep_bad OR dup_bad) AS keep,
           coalesce(array_to_string(list_filter([
             CASE WHEN too_short THEN 'too_short' END,
             CASE WHEN too_long THEN 'too_long' END,
             CASE WHEN punct_bad THEN 'punct' END,
             CASE WHEN stop_bad THEN 'stopword' END,
             CASE WHEN div_bad THEN 'low_diversity' END,
             CASE WHEN rep_bad THEN 'repetition' END,
             CASE WHEN dup_bad THEN 'exact_dup' END
           ], x -> x IS NOT NULL), ','), '') AS reasons_str
    FROM cur_flags
    """


# terms chosen to exist in the synthetic-corpus vocabulary (plus one
# deliberately absent probe term, so the zero path is always exercised)
DEFAULT_BLOCKLIST = ["slow", "dup", "merge", "leak"]


def blocklist_audit(documents: DataFrame, terms: list[str] | None = None) -> DataFrame:
    """→ ``[term, n_docs, n_occurrences, doc_share]`` — one row per
    blocklist term, ALWAYS including zero rows for terms the corpus never
    contains. The compliance-audit companion to :func:`curate_corpus`:
    before a takedown/filter list ships, you want its projected blast
    radius ("this list would touch 0.8% of documents, dominated by two
    terms"), and after it ships this same table is the regression check
    that the filter actually fired.

    Scale shape: the blocklist is a literal array broadcast inside the
    projection — tokens are filtered DOWN to blocklist hits before the
    explode, so clean documents contribute zero rows to the shuffle. One
    hash aggregate on ``term`` (cardinality = blocklist size), one
    broadcast total-count join, one left join back to the term list.
    Token matching is exact on the whitespace tokenizer (shared with
    :func:`~linkgraph_spark.functions.text.vocab_stats`), not substring:
    'leak' does not flag 'leaky' — swap in a regexp list upstream if
    substring semantics are wanted.
    """
    # tokens are matched lowercase — normalize the list the same way (and
    # dedup, preserving order) so 'Leak' can't silently audit as zero
    terms = DEFAULT_BLOCKLIST if terms is None else list(terms)
    terms = list(dict.fromkeys(t.lower() for t in terms))
    if not terms:
        raise ValueError("blocklist_audit needs at least one term")
    spark = documents.sparkSession
    text = F.coalesce(F.col("text"), F.lit(""))
    toks = _tokens(F.lower(text))
    term_arr = F.array(*[F.lit(t) for t in terms])
    hits = documents.select(
        "doc_id",
        F.explode(F.filter(toks, lambda t: F.array_contains(term_arr, t))).alias(
            "term"
        ),
    )
    agg = hits.groupBy("term").agg(
        F.countDistinct("doc_id").alias("_n_docs"),
        F.count("*").alias("_n_occ"),
    )
    total = documents.agg(F.count("*").alias("_tot"))
    terms_df = spark.createDataFrame([(t,) for t in terms], "term string")
    return (
        terms_df.join(agg, "term", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            F.coalesce("_n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("_n_occ", F.lit(0)).alias("n_occurrences"),
            F.round(
                F.coalesce("_n_docs", F.lit(0)) * 1.0 / F.col("_tot"), 6
            ).alias("doc_share"),
        )
    )


def blocklist_audit_sql(
    table: str = "documents", terms: list[str] | None = None
) -> str:
    """DuckDB oracle for :func:`blocklist_audit`."""
    terms = DEFAULT_BLOCKLIST if terms is None else list(terms)
    terms = list(dict.fromkeys(t.lower() for t in terms))
    values = ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
    return f"""
    WITH bla_terms (term) AS (VALUES {values}),
    bla_tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(coalesce(text, ''))),
                                       '\\s+')) AS term
      FROM {table}
    ),
    bla_agg AS (
      SELECT k.term, count(DISTINCT k.doc_id) AS n_docs, count(*) AS n_occ
      FROM (SELECT t.doc_id, t.term FROM bla_tok t
            JOIN bla_terms b USING (term)) k
      GROUP BY 1
    ),
    bla_tot AS (SELECT count(*) AS tot FROM {table})
    SELECT t.term,
           coalesce(a.n_docs, 0) AS n_docs,
           coalesce(a.n_occ, 0) AS n_occurrences,
           round(coalesce(a.n_docs, 0) * 1.0 / bla_tot.tot, 6) AS doc_share
    FROM bla_terms t
    LEFT JOIN bla_agg a USING (term)
    CROSS JOIN bla_tot
    """


def integrity_audit(
    documents: DataFrame,
    events: DataFrame,
    embeddings: DataFrame,
    dim: int = 64,
) -> DataFrame:
    """→ ``[check_name, n_bad, n_total]`` — the Deequ-style referential /
    shape integrity audit a pipeline runs BEFORE trusting a new drop of
    input tables: duplicate keys, NULL join keys, metadata that
    contradicts payload (``n_chars`` vs actual text length), degenerate
    payloads (empty text, zero vectors, wrong embedding dimension),
    out-of-domain values. One row per check, always emitted (n_bad = 0
    is the healthy signal, an absent row is a broken audit).

    Plan shape: ONE full scan per input table — every check on a table
    is a conditional aggregate fused into the same hash-aggregate pass
    (plus one count-distinct per key column for the dup checks), then an
    explode of the single-row aggregate into report rows. No joins, no
    windows, no collect; output is a constant 12 rows.
    """

    def report(aggdf: DataFrame, pairs: list) -> DataFrame:
        structs = [
            F.struct(
                F.lit(nm).alias("check_name"),
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias("n_bad"),
                F.col("n").cast("long").alias("n_total"),
            )
            for nm, c in pairs
        ]
        return aggdf.select(F.explode(F.array(*structs)).alias("r")).select("r.*")

    d = documents.agg(
        F.count("*").alias("n"),
        F.sum((F.length("text") != F.col("n_chars")).cast("int")).alias("nchars"),
        F.sum(
            (F.col("text").isNull() | (F.trim("text") == "")).cast("int")
        ).alias("empty"),
        (F.count("*") - F.countDistinct("doc_id")).alias("dup"),
        F.sum(F.col("lang").isNull().cast("int")).alias("nolang"),
    )
    e = events.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("event_id")).alias("dup"),
        F.sum(F.col("user_id").isNull().cast("int")).alias("nouser"),
        F.sum(F.col("ts").isNull().cast("int")).alias("nots"),
        F.sum((F.col("value") < 0).cast("int")).alias("negval"),
    )
    m = embeddings.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("vec_id")).alias("dup"),
        F.sum((F.size("embedding") != dim).cast("int")).alias("baddim"),
        F.sum(
            (F.size(F.filter("embedding", lambda x: x != 0)) == 0).cast("int")
        ).alias("zeronorm"),
        F.sum(F.col("label").isNull().cast("int")).alias("nolabel"),
    )
    return (
        report(
            d,
            [
                ("doc_nchars_mismatch", "nchars"),
                ("doc_empty_text", "empty"),
                ("doc_dup_id", "dup"),
                ("doc_null_lang", "nolang"),
            ],
        )
        .unionByName(
            report(
                e,
                [
                    ("event_dup_id", "dup"),
                    ("event_null_user", "nouser"),
                    ("event_null_ts", "nots"),
                    ("event_negative_value", "negval"),
                ],
            )
        )
        .unionByName(
            report(
                m,
                [
                    ("emb_dup_id", "dup"),
                    ("emb_dim_mismatch", "baddim"),
                    ("emb_zero_vector", "zeronorm"),
                    ("emb_null_label", "nolabel"),
                ],
            )
        )
    )


def integrity_audit_sql(
    documents: str = "documents",
    events: str = "events",
    embeddings: str = "embeddings",
    dim: int = 64,
) -> str:
    """DuckDB oracle for :func:`integrity_audit` (standalone query)."""
    return f"""
    WITH ia_d AS (
      SELECT count(*) AS n,
             sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS nchars,
             sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END)
               AS empty,
             count(*) - count(DISTINCT doc_id) AS dup,
             sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nolang
      FROM {documents}
    ), ia_e AS (
      SELECT count(*) AS n,
             count(*) - count(DISTINCT event_id) AS dup,
             sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nouser,
             sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS nots,
             sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS negval
      FROM {events}
    ), ia_m AS (
      SELECT count(*) AS n,
             count(*) - count(DISTINCT vec_id) AS dup,
             sum(CASE WHEN len(embedding) <> {int(dim)} THEN 1 ELSE 0 END)
               AS baddim,
             sum(CASE WHEN len(list_filter(embedding, x -> x <> 0)) = 0
                 THEN 1 ELSE 0 END) AS zeronorm,
             sum(CASE WHEN label IS NULL THEN 1 ELSE 0 END) AS nolabel
      FROM {embeddings}
    )
    SELECT 'doc_nchars_mismatch' AS check_name,
           CAST(coalesce(nchars, 0) AS BIGINT) AS n_bad,
           CAST(n AS BIGINT) AS n_total FROM ia_d
    UNION ALL SELECT 'doc_empty_text', CAST(coalesce(empty, 0) AS BIGINT),
              CAST(n AS BIGINT) FROM ia_d
    UNION ALL SELECT 'doc_dup_id', CAST(dup AS BIGINT),
              CAST(n AS BIGINT) FROM ia_d
    UNION ALL SELECT 'doc_null_lang', CAST(coalesce(nolang, 0) AS BIGINT),
              CAST(n AS BIGINT) FROM ia_d
    UNION ALL SELECT 'event_dup_id', CAST(dup AS BIGINT),
              CAST(n AS BIGINT) FROM ia_e
    UNION ALL SELECT 'event_null_user', CAST(coalesce(nouser, 0) AS BIGINT),
              CAST(n AS BIGINT) FROM ia_e
    UNION ALL SELECT 'event_null_ts', CAST(coalesce(nots, 0) AS BIGINT),
              CAST(n AS BIGINT) FROM ia_e
    UNION ALL SELECT 'event_negative_value', CAST(coalesce(negval, 0) AS BIGINT),
              CAST(n AS BIGINT) FROM ia_e
    UNION ALL SELECT 'emb_dup_id', CAST(dup AS BIGINT),
              CAST(n AS BIGINT) FROM ia_m
    UNION ALL SELECT 'emb_dim_mismatch', CAST(coalesce(baddim, 0) AS BIGINT),
              CAST(n AS BIGINT) FROM ia_m
    UNION ALL SELECT 'emb_zero_vector', CAST(coalesce(zeronorm, 0) AS BIGINT),
              CAST(n AS BIGINT) FROM ia_m
    UNION ALL SELECT 'emb_null_label', CAST(coalesce(nolabel, 0) AS BIGINT),
              CAST(n AS BIGINT) FROM ia_m
    """


def curation_funnel(documents: DataFrame, **thresholds) -> DataFrame:
    """→ ``[source, reason, n_docs, frac_of_source]`` — the curation
    accounting table: for every source, how many documents each
    :func:`curate_corpus` reason code would drop, plus a ``__kept__`` row
    for the survivors. This is the per-provider report a 100 TB curation
    run actually publishes ("source X loses 40% to repetition; source Y
    is mostly exact dups") — the aggregate the module docstring promises,
    shipped as one operator. A document failing two checks counts under
    BOTH reasons (reason rows are a multiset; only ``__kept__`` rows
    partition the corpus).

    Scale shape: the curate pass itself (map-only checks + one dedup
    hash agg), a doc_id equi-join back to the source column, a reason
    explode whose fan-out is bounded by 7 reason codes, one
    (source, reason) hash aggregate, and a broadcast per-source total
    join. Thresholds pass through to :func:`curate_corpus`.
    """
    cur = curate_corpus(documents, **thresholds)
    src = documents.select("doc_id", "source")
    j = cur.join(src, "doc_id")
    tagged = j.select(
        "source",
        F.explode(
            F.when(F.col("keep"), F.array(F.lit("__kept__"))).otherwise(
                F.col("reasons")
            )
        ).alias("reason"),
    )
    counts = tagged.groupBy("source", "reason").agg(F.count("*").alias("n_docs"))
    per_src = documents.groupBy("source").agg(F.count("*").alias("_n"))
    return counts.join(F.broadcast(per_src), "source").select(
        "source",
        "reason",
        "n_docs",
        F.round(F.col("n_docs") / F.col("_n"), 6).alias("frac_of_source"),
    )


def curation_funnel_sql(table: str = "documents", **thresholds) -> str:
    """DuckDB oracle for :func:`curation_funnel` — wraps
    :func:`curate_corpus_sql` (which emits a comma-joined ``reasons_str``)
    and re-splits it."""
    return f"""
    WITH cf_cur AS MATERIALIZED (
      SELECT * FROM ({curate_corpus_sql(table, **thresholds)})
    ),
    cf_j AS (
      SELECT d.source, c.keep, c.reasons_str
      FROM cf_cur c JOIN {table} d USING (doc_id)
    ),
    cf_r AS (
      SELECT source, unnest(string_split(reasons_str, ',')) AS reason
      FROM cf_j WHERE reasons_str <> ''
      UNION ALL
      SELECT source, '__kept__' AS reason FROM cf_j WHERE keep
    ),
    cf_c AS (
      SELECT source, reason, count(*) AS n_docs FROM cf_r GROUP BY source, reason
    ),
    cf_n AS (SELECT source, count(*) AS _n FROM {table} GROUP BY source)
    SELECT c.source, c.reason, c.n_docs,
           round(c.n_docs * 1.0 / n._n, 6) AS frac_of_source
    FROM cf_c c JOIN cf_n n ON n.source = c.source
    """
