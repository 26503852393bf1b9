"""Distributed ML-as-aggregates: models whose "training" is one exact
sufficient-statistics pass, so they run at 100 TB as ordinary map-side-
combinable aggregates — no parameter servers, no per-row Python.

Two classics, both bit-reproducible between Spark and the DuckDB oracle:

* :func:`ols_price_model` — multiple linear regression (two features +
  intercept) solved from exact integer moment sums via Cramer's rule.
* :func:`nb_lang_confusion` — multinomial Naive Bayes trained and
  self-scored on the corpus, with per-token log-probabilities quantized
  to integer micros so the per-document score sum is order-invariant.

Reference parity: the reference repo has no ML surface at all (its
analytics end at PageRank over DynamoDB/EFS state,
pagerank_lambda/dynamodb/pagerank.py:51-99); these extend the engine
the way a training-data platform needs — model fits AS relational
aggregates, in the same oracle-gated style as every other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# OLS: l_extendedprice ~ l_quantity + l_discount
# ---------------------------------------------------------------------------
#
# The whole fit reduces to 10 moments — n, Σx1, Σx2, Σy, Σx1², Σx2²,
# Σx1x2, Σx1y, Σx2y, Σy² — computed over INTEGER-scaled columns
# (quantity is whole, discount → basis points /100, price → cents) so
# every sum is exact: Spark sums DECIMAL(38,0), DuckDB sums BIGINT into
# HUGEINT. The closed-form solve then runs on ONE row in both engines
# using the *same expression strings* (below), so the IEEE-double
# arithmetic is structurally identical and round(…, 6) agrees.
#
# Scale shape: a single global aggregate — partial moments combine
# map-side, the final reduce sees num_partitions rows. No shuffle of
# the fact table, no iterations, no driver math beyond one row.

_OLS_STAGE_U = [
    "n AS n_rows",
    "CAST(n AS DOUBLE) AS nd",
    "CAST(s1 AS DOUBLE) AS u1",
    "CAST(s2 AS DOUBLE) / 100.0 AS u2",
    "CAST(sy AS DOUBLE) / 100.0 AS uy",
    "CAST(s11 AS DOUBLE) AS u11",
    "CAST(s22 AS DOUBLE) / 10000.0 AS u22",
    "CAST(s12 AS DOUBLE) / 100.0 AS u12",
    "CAST(s1y AS DOUBLE) / 100.0 AS u1y",
    "CAST(s2y AS DOUBLE) / 10000.0 AS u2y",
    "CAST(syy AS DOUBLE) / 10000.0 AS uyy",
]

_OLS_STAGE_C = [
    "n_rows",
    "nd",
    "u1",
    "u2",
    "uy",
    "u11 - u1 * u1 / nd AS c11",
    "u22 - u2 * u2 / nd AS c22",
    "u12 - u1 * u2 / nd AS c12",
    "u1y - u1 * uy / nd AS c1y",
    "u2y - u2 * uy / nd AS c2y",
    "uyy - uy * uy / nd AS cyy",
]

_OLS_STAGE_B = [
    "n_rows",
    "nd",
    "u1",
    "u2",
    "uy",
    "c1y",
    "c2y",
    "cyy",
    "(c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1",
    "(c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2",
]

_OLS_STAGE_OUT = [
    "n_rows",
    "round((uy - b1 * u1 - b2 * u2) / nd, 6) AS b0",
    "round(b1, 6) AS b_qty",
    "round(b2, 6) AS b_disc",
    "round(1.0 - (cyy - b1 * c1y - b2 * c2y) / cyy, 6) AS r2",
    "round(sqrt(greatest(cyy - b1 * c1y - b2 * c2y, 0.0) / nd), 6) AS rmse",
]


def ols_price_model(lineitem: DataFrame) -> DataFrame:
    """Exact-moment OLS of ``l_extendedprice`` on ``l_quantity`` and
    ``l_discount`` → one row ``[n_rows, b0, b_qty, b_disc, r2, rmse]``.

    Training is one map-side-combinable aggregate: the ten sufficient
    sums over integer-scaled columns (cents / basis points, so the
    sums are EXACT — Spark DECIMAL(38,0), matching DuckDB's HUGEINT),
    then Cramer's rule on the centered 2×2 normal equations, evaluated
    through the same staged expression strings as the SQL oracle so
    the double arithmetic is bit-identical. ``rmse`` is clamped at 0
    before the sqrt so a perfectly collinear fit can't NaN.
    """
    x1 = F.col("l_quantity").cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")

    def _dsum(c):
        return F.sum(c.cast("decimal(38,0)")).cast("decimal(38,0)")

    m = lineitem.select(
        x1.alias("_x1"), x2.alias("_x2"), y.alias("_y")
    ).agg(
        F.count("*").alias("n"),
        _dsum(F.col("_x1")).alias("s1"),
        _dsum(F.col("_x2")).alias("s2"),
        _dsum(F.col("_y")).alias("sy"),
        _dsum(F.col("_x1") * F.col("_x1")).alias("s11"),
        _dsum(F.col("_x2") * F.col("_x2")).alias("s22"),
        _dsum(F.col("_x1") * F.col("_x2")).alias("s12"),
        _dsum(F.col("_x1") * F.col("_y")).alias("s1y"),
        _dsum(F.col("_x2") * F.col("_y")).alias("s2y"),
        _dsum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    return (
        m.selectExpr(*_OLS_STAGE_U)
        .selectExpr(*_OLS_STAGE_C)
        .selectExpr(*_OLS_STAGE_B)
        .selectExpr(*_OLS_STAGE_OUT)
    )


def ols_price_model_sql(table: str = "lineitem") -> str:
    """DuckDB oracle for :func:`ols_price_model` — the same staged
    expression strings over HUGEINT-exact BIGINT sums."""
    return f"""
    WITH ols_m AS (
      SELECT count(*) AS n,
             sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
             sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
             sum(x1 * x2) AS s12,
             sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
             sum(y * y) AS syy
      FROM (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(round(l_discount * 100) AS BIGINT) AS x2,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM {table}
      )
    ),
    ols_u AS (SELECT {', '.join(_OLS_STAGE_U)} FROM ols_m),
    ols_c AS (SELECT {', '.join(_OLS_STAGE_C)} FROM ols_u),
    ols_b AS (SELECT {', '.join(_OLS_STAGE_B)} FROM ols_c)
    SELECT {', '.join(_OLS_STAGE_OUT)} FROM ols_b
    """


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes over documents, class = lang
# ---------------------------------------------------------------------------
#
# Train counts and self-classify in one dataflow. Determinism hinges on
# two choices: (1) every per-token log-probability is quantized to an
# integer number of MICRO-nats (CAST(round(ln(p)*1e6) AS BIGINT))
# *before* the per-document sum, so the score is a pure integer sum —
# immune to floating-point summation order, which differs between
# engines and across partitionings; (2) the argmax tie-breaks on the
# class name. ``ln`` itself agrees between JVM and DuckDB on these
# inputs (the established pattern of unigram_lm_score /
# bigram_lm_score, text.py:463).

_NB_LOGP_MICRO = (
    "CAST(round(ln(CAST(cnt1 AS DOUBLE) / CAST(tv AS DOUBLE)) * 1000000)"
    " AS BIGINT)"
)


def nb_lang_confusion(documents: DataFrame) -> DataFrame:
    """Multinomial Naive Bayes (add-one smoothing) trained on the
    corpus's own ``lang`` labels and self-scored, reported as a
    confusion matrix → ``[lang, pred_lang, n_docs]``.

    Pipeline: token explode (the :func:`unigram_lm_score` whitespace
    normalization, so all corpus-term views agree) → per-(lang, term)
    count aggregate → each document's token stream cross-joined with
    the tiny class table (|langs| rows, broadcast) and left-joined to
    the smoothed count table → integer micro-nat score sum + class
    log-prior → per-doc argmax (window over |langs| rows per doc) →
    confusion rollup.

    Scale shape: the token stream shuffles once for the count table
    (Zipf-bounded: |langs| × vocab rows, broadcast-eligible); scoring
    is a map-side ×|classes| expansion plus one broadcast join; the
    argmax window partitions by doc_id (bounded: |langs| rows per
    partition key); the rollup output is ≤ |langs|² rows.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(
        "doc_id",
        F.col("lang").alias("_actual"),
        F.explode(F.split(norm, " ")).alias("term"),
    )
    cls_counts = (
        tok.groupBy(F.col("_actual").alias("_cls"), "term")
        .agg(F.count("*").alias("_cnt"))
    )
    cls_tot = cls_counts.groupBy("_cls").agg(F.sum("_cnt").alias("_tot"))
    vocab_n = tok.select("term").distinct().agg(
        F.count("*").alias("_vocab")
    )
    n_docs = documents.agg(F.count("*").alias("_ndocs"))
    priors = (
        documents.groupBy(F.col("lang").alias("_cls"))
        .agg(F.count("*").alias("_cdocs"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_cls",
            F.expr(
                "CAST(round(ln(CAST(_cdocs AS DOUBLE)"
                " / CAST(_ndocs AS DOUBLE)) * 1000000) AS BIGINT)"
            ).alias("_prior_micro"),
        )
    )
    cls_dim = cls_tot.crossJoin(F.broadcast(vocab_n))
    cnts = cls_counts.select(
        F.col("_cls").alias("_ccls"),
        F.col("term").alias("_cterm"),
        "_cnt",
    )
    expanded = tok.crossJoin(F.broadcast(cls_dim))
    scored = (
        expanded.join(
            F.broadcast(cnts),
            on=(expanded["term"] == cnts["_cterm"])
            & (expanded["_cls"] == cnts["_ccls"]),
            how="left",
        )
        .select(
            "doc_id",
            "_actual",
            "_cls",
            (F.coalesce(F.col("_cnt"), F.lit(0)) + F.lit(1)).alias("cnt1"),
            (F.col("_tot") + F.col("_vocab")).alias("tv"),
        )
        .select(
            "doc_id",
            "_actual",
            "_cls",
            F.expr(_NB_LOGP_MICRO).alias("_lp"),
        )
        .groupBy("doc_id", "_actual", "_cls")
        .agg(F.sum("_lp").alias("_score"))
        .join(F.broadcast(priors), "_cls")
        .select(
            "doc_id",
            "_actual",
            "_cls",
            (F.col("_score") + F.col("_prior_micro")).alias("_score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("_score").desc(), F.col("_cls").asc()
    )
    pred = scored.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1
    )
    return (
        pred.groupBy(
            F.col("_actual").alias("lang"), F.col("_cls").alias("pred_lang")
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def nb_lang_confusion_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`nb_lang_confusion` — same tokenizer,
    same integer micro-nat scoring expression, same tie-break."""
    return f"""
    WITH nb_tok AS MATERIALIZED (
      SELECT doc_id, lang AS actual,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '
             )) AS term
      FROM {table}
    ),
    nb_cnt AS MATERIALIZED (
      SELECT actual AS cls, term, count(*) AS cnt
      FROM nb_tok GROUP BY actual, term
    ),
    nb_tot AS (SELECT cls, sum(cnt) AS tot FROM nb_cnt GROUP BY cls),
    nb_vocab AS (SELECT count(DISTINCT term) AS vocab FROM nb_tok),
    nb_prior AS (
      SELECT lang AS cls,
             CAST(round(ln(CAST(count(*) AS DOUBLE) / CAST(
               (SELECT count(*) FROM {table}) AS DOUBLE)) * 1000000)
               AS BIGINT) AS prior_micro
      FROM {table} GROUP BY lang
    ),
    nb_scored AS (
      SELECT doc_id, actual, cls,
             sum({_NB_LOGP_MICRO}) AS score
      FROM (
        SELECT t0.doc_id, t0.actual, tt.cls,
               COALESCE(n.cnt, 0) + 1 AS cnt1,
               tt.tot + v.vocab AS tv
        FROM nb_tok t0
        CROSS JOIN nb_tot tt
        CROSS JOIN nb_vocab v
        LEFT JOIN nb_cnt n ON n.term = t0.term AND n.cls = tt.cls
      )
      GROUP BY doc_id, actual, cls
    ),
    nb_pred AS (
      SELECT doc_id, actual, cls,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY (s.score + p.prior_micro) DESC, cls ASC
             ) AS rn
      FROM nb_scored s JOIN nb_prior p USING (cls)
    )
    SELECT actual AS lang, cls AS pred_lang, count(*) AS n_docs
    FROM nb_pred WHERE rn = 1
    GROUP BY actual, cls
    ORDER BY lang, pred_lang
    """


# ---------------------------------------------------------------------------
# Exact ROC AUC via tie-aware rank-sum (wave 89)
# ---------------------------------------------------------------------------


def auc_activity_purchase(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ one row [n_pos, n_neg, auc_num2, auc] — the EXACT ROC AUC of
    "non-target activity count predicts whether the user ever performs
    ``target``", via the Mann–Whitney identity AUC = P(score⁺ > score⁻) +
    ½·P(score⁺ = score⁻) (Hanley & McNeil 1982 — public formulation). The
    model-eval primitive a training-data platform needs next to its OLS/NB
    aggregates: any per-row score column drops in for the activity count.

    Exactness: computed at SCORE-VALUE grain with the tie term doubled into
    integers — ``auc_num2 = Σ_g n_pos_g · (2·cum_neg_below(g) + n_neg_g)``
    = 2·n_pos·n_neg·AUC, a BIGINT, so the oracle hash is bit-stable; ``auc``
    is the rounded double, NULL when either class is empty (ANSI division
    would throw; a leaked NaN/inf would poison the hash). Bound: fits BIGINT
    while 2·n_pos·n_neg < 2^63 (~4.3e9 users balanced — document, don't
    overflow silently: Spark ANSI mode raises past it).

    Scale shape: one user-grain aggregate over the fact table (map-side
    combinable), then a collapse to score-value grain — the frame is a
    HISTOGRAM (cardinality ≤ max per-user event count), so the single
    ordered prefix-sum window over it is bounded exactly like the
    exact-percentile edges elsewhere in this module family; the final
    reduce is one row. No per-row ranking of users, no global sort of the
    fact table.

    Reference parity: no evaluation surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    u = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") != target, F.lit(1)).otherwise(F.lit(0))
        ).alias("score"),
        F.max(
            F.when(F.col("event_type") == target, F.lit(1)).otherwise(F.lit(0))
        ).alias("pos"),
    )
    g = u.groupBy("score").agg(
        F.sum("pos").alias("n_pos_g"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_neg_g"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = g.withColumn("cum_neg", F.coalesce(F.sum("n_neg_g").over(w), F.lit(0)))
    s = c.agg(
        F.sum("n_pos_g").cast("long").alias("n_pos"),
        F.sum("n_neg_g").cast("long").alias("n_neg"),
        F.sum(
            F.col("n_pos_g") * (F.lit(2) * F.col("cum_neg") + F.col("n_neg_g"))
        )
        .cast("long")
        .alias("auc_num2"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        "auc_num2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("auc_num2").cast("double")
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
    )


def auc_activity_purchase_sql(
    target: str = "purchase", table: str = "events"
) -> str:
    """DuckDB oracle for :func:`auc_activity_purchase` (standalone query)."""
    t = target.replace("'", "''")
    return f"""
    WITH auc_u AS (
      SELECT user_id,
             sum(CASE WHEN event_type <> '{t}' THEN 1 ELSE 0 END) AS score,
             max(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS pos
      FROM {table} GROUP BY user_id
    ), auc_g AS (
      SELECT score, sum(pos) AS n_pos_g, sum(1 - pos) AS n_neg_g
      FROM auc_u GROUP BY score
    ), auc_c AS (
      SELECT n_pos_g, n_neg_g,
             coalesce(sum(n_neg_g) OVER (
               ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg
      FROM auc_g
    ), auc_s AS (
      SELECT CAST(sum(n_pos_g) AS BIGINT) AS n_pos,
             CAST(sum(n_neg_g) AS BIGINT) AS n_neg,
             CAST(sum(n_pos_g * (2 * cum_neg + n_neg_g)) AS BIGINT) AS auc_num2
      FROM auc_c
    )
    SELECT n_pos, n_neg, auc_num2,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN round(CAST(auc_num2 AS DOUBLE)
                           / (2.0 * n_pos * n_neg), 6) END AS auc
    FROM auc_s
    """
