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


# ---------------------------------------------------------------------------
# Decision stump: exact best binary split (wave 90)
# ---------------------------------------------------------------------------


def decision_stump(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ one row [threshold_cents, n_left, pos_left, n_right, pos_right,
    chi2, gini_gain] — the EXACT best single-threshold split of "event
    value predicts event_type == ``target``" (a depth-1 CART tree, Breiman
    et al. 1984). The split "value ≤ threshold" maximizes the chi-square
    score ``J = D²/(n_L·n_R)`` with ``D = pos_L·n_R − pos_R·n_L`` — for a
    binary label, maximizing J is EQUIVALENT to minimizing weighted Gini
    impurity (the classic identity gain = 2·J/N²), and unlike the Gini
    ratio itself J's numerator and denominators stay exact integers.

    Determinism: value is quantized to integer cents (the column's native
    grain), all prefix sums and D are exact (DECIMAL(38,0) on the Spark
    side, HUGEINT in the oracle — pos_L·n_R can touch N² ≈ the BIGINT
    edge), and the double score is computed with the SAME expression shape
    in both engines from identical integers, so the argmax row — ties
    broken by the smaller threshold — is identical. Reported doubles are
    rounded to 6.

    Scale shape: one fact-table aggregate to VALUE-GRAIN (a histogram —
    cardinality bounded by the domain's price range in cents, not by row
    count), one ordered prefix-sum window over that histogram (same
    bounded shape as the exact-percentile edges), and a TakeOrdered(1)
    argmax. No per-row sorting of the fact table, no candidate×row join.

    Reference parity: no ML surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    g = (
        events.select(
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            F.when(F.col("event_type") == target, F.lit(1))
            .otherwise(F.lit(0))
            .alias("pos"),
        )
        .groupBy("cents")
        .agg(F.count("*").alias("n"), F.sum("pos").alias("p"))
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    c = g.select(
        F.col("cents").alias("threshold_cents"),
        F.sum("n").over(w).alias("n_l"),
        F.sum("p").over(w).alias("pos_l"),
        F.sum("n").over(wa).alias("n_tot"),
        F.sum("p").over(wa).alias("p_tot"),
    ).where(F.col("n_l") < F.col("n_tot"))
    d = c.select(
        "threshold_cents",
        "n_l",
        "pos_l",
        (F.col("n_tot") - F.col("n_l")).alias("n_r"),
        (F.col("p_tot") - F.col("pos_l")).alias("pos_r"),
        "n_tot",
    ).select(
        "*",
        (
            F.col("pos_l").cast("decimal(38,0)") * F.col("n_r")
            - F.col("pos_r").cast("decimal(38,0)") * F.col("n_l")
        )
        .cast("double")
        .alias("dd"),
    )
    scored = d.select(
        "*",
        (
            (F.col("dd") * F.col("dd"))
            / (F.col("n_l").cast("double") * F.col("n_r").cast("double"))
        ).alias("j_raw"),
    )
    return (
        scored.orderBy(F.desc("j_raw"), F.asc("threshold_cents"))
        .limit(1)
        .select(
            "threshold_cents",
            F.col("n_l").alias("n_left"),
            F.col("pos_l").alias("pos_left"),
            F.col("n_r").alias("n_right"),
            F.col("pos_r").alias("pos_right"),
            F.round("j_raw", 6).alias("chi2"),
            F.round(
                F.lit(2.0)
                * F.col("j_raw")
                / (F.col("n_tot").cast("double") * F.col("n_tot").cast("double")),
                6,
            ).alias("gini_gain"),
        )
    )


def decision_stump_sql(target: str = "purchase", table: str = "events") -> str:
    """DuckDB oracle for :func:`decision_stump` (standalone query; HUGEINT
    carries the exact D product, the double score uses the same expression
    shape as the Spark side)."""
    t = target.replace("'", "''")
    return f"""
    WITH ds_g AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             count(*) AS n,
             sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS p
      FROM {table} GROUP BY cents
    ), ds_c AS (
      SELECT cents AS threshold_cents,
             sum(n) OVER (ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_l,
             sum(p) OVER (ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pos_l,
             sum(n) OVER () AS n_tot,
             sum(p) OVER () AS p_tot
      FROM ds_g
    ), ds_d AS (
      SELECT threshold_cents, n_l, pos_l,
             n_tot - n_l AS n_r, p_tot - pos_l AS pos_r, n_tot,
             CAST(CAST(pos_l AS HUGEINT) * (n_tot - n_l)
                  - CAST(p_tot - pos_l AS HUGEINT) * n_l AS DOUBLE) AS dd
      FROM ds_c WHERE n_l < n_tot
    ), ds_s AS (
      SELECT *,
             (dd * dd) / (CAST(n_l AS DOUBLE) * CAST(n_r AS DOUBLE)) AS j_raw
      FROM ds_d
    )
    SELECT threshold_cents,
           CAST(n_l AS BIGINT) AS n_left, CAST(pos_l AS BIGINT) AS pos_left,
           CAST(n_r AS BIGINT) AS n_right, CAST(pos_r AS BIGINT) AS pos_right,
           round(j_raw, 6) AS chi2,
           round(2.0 * j_raw
                 / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)), 6) AS gini_gain
    FROM ds_s ORDER BY j_raw DESC, threshold_cents LIMIT 1
    """


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR over per-metric A/B z-tests (wave 90)
# ---------------------------------------------------------------------------
#
# The two-sided p-value needs the normal CDF; neither engine ships erf, so
# both evaluate the SAME Abramowitz & Stegun 7.1.26 rational approximation
# (|err| ≤ 1.5e-7, far inside the 6-decimal rounding) staged through
# identical expression shapes: y = |z|/√2, t = 1/(1 + 0.3275911·y),
# p = poly(t)·exp(−y²) = erfc(y). exp() may differ by an ulp between libm
# and the JVM — round(…, 6) absorbs it, the same contract the mSPRT
# operator documents for its log-scale statistic.

_BH_POLY = (
    "(0.254829592 * t - 0.284496736 * t * t + 1.421413741 * t * t * t"
    " - 1.453152027 * t * t * t * t + 1.061405429 * t * t * t * t * t)"
    " * exp(-(y * y))"
)


def bh_fdr_metrics(events: DataFrame, q: float = 0.1) -> DataFrame:
    """→ [metric, conv_control, conv_treatment, z, p, bh_rank, significant]
    — one two-proportion z-test PER event type ("did the treatment arm do
    ≥1 event of this type more often", same md5 user split and pooled-SE
    formula as :func:`~linkgraph_spark.functions.events.ab_test`), with
    the Benjamini–Hochberg step-up (Benjamini & Hochberg 1995) controlling
    the false-discovery rate at ``q`` across the metric family — the
    multiple-testing guard every experimentation dashboard needs once it
    shows more than one metric.

    BH runs on the ROUNDED p (both engines round first, then compare), so
    the decision column is deterministic. Metrics whose pooled rate is
    degenerate (0 or 1) report NULL z/p and NULL ``significant`` and are
    excluded from the family size m. Step-up: rank p ascending (ties by
    metric name), find the largest rank with p ≤ rank·q/m, mark every rank
    at or below it.

    Scale shape: one distinct-user projection (the split), one distinct
    (user, type) projection, a user-keyed join, then collapse to METRIC
    grain — every window after that runs on the |event-type|-sized frame.
    """
    from pyspark.sql import Window

    from linkgraph_spark.functions.hashing import md5_long

    users = events.select("user_id").distinct().select(
        "user_id",
        (md5_long(F.col("user_id").cast("string")) % 2).alias("variant"),
    )
    tot = users.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    ut = events.select("user_id", F.col("event_type").alias("metric")).distinct()
    per = (
        ut.join(users, "user_id")
        .groupBy("metric")
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("x0"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("x1"),
        )
        .crossJoin(tot)
    )
    n0, n1, x0, x1 = (F.col(c) for c in ("n0", "n1", "x0", "x1"))
    pp = (x0 + x1) * 1.0 / (n0 + n1)
    se = F.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
    z = F.when(
        (n0 > 0) & (n1 > 0) & (pp > 0) & (pp < 1),
        (x1 * 1.0 / n1 - x0 * 1.0 / n0) / se,
    )
    staged = (
        per.withColumn("z_raw", z)
        .withColumn("y", F.abs(F.col("z_raw")) / F.sqrt(F.lit(2.0)))
        .withColumn("t", F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * F.col("y")))
        .withColumn("p", F.round(F.expr(_BH_POLY), 6))
    )
    wr = Window.orderBy(F.asc_nulls_last("p"), F.asc("metric"))
    wa = Window.partitionBy()
    ranked = (
        staged.withColumn("bh_rank", F.row_number().over(wr))
        .withColumn("m", F.count("p").over(wa))
        .withColumn(
            "cutoff",
            F.max(
                F.when(
                    F.col("p") <= F.col("bh_rank") * F.lit(q) / F.col("m"),
                    F.col("bh_rank"),
                )
            ).over(wa),
        )
    )
    return ranked.select(
        "metric",
        x0.cast("long").alias("conv_control"),
        x1.cast("long").alias("conv_treatment"),
        F.round("z_raw", 6).alias("z"),
        "p",
        F.when(F.col("p").isNotNull(), F.col("bh_rank")).alias("bh_rank"),
        F.when(
            F.col("p").isNotNull(),
            F.coalesce(F.col("bh_rank") <= F.col("cutoff"), F.lit(False)),
        ).alias("significant"),
    )


def bh_fdr_metrics_sql(q: float = 0.1, table: str = "events") -> str:
    """DuckDB oracle for :func:`bh_fdr_metrics` — same md5 split, same
    A&S 7.1.26 erfc stages, BH on the rounded p."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH bh_users AS (
      SELECT user_id, ({h}) % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM {table})
    ), bh_tot AS (
      SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1
      FROM bh_users
    ), bh_ut AS (
      SELECT DISTINCT user_id, event_type AS metric FROM {table}
    ), bh_per AS (
      SELECT ut.metric,
             sum(CASE WHEN u.variant = 0 THEN 1 ELSE 0 END) AS x0,
             sum(CASE WHEN u.variant = 1 THEN 1 ELSE 0 END) AS x1
      FROM bh_ut ut JOIN bh_users u ON u.user_id = ut.user_id
      GROUP BY ut.metric
    ), bh_z AS (
      SELECT metric, x0, x1, n0, n1,
             CASE WHEN n0 > 0 AND n1 > 0
                   AND (x0 + x1) * 1.0 / (n0 + n1) > 0
                   AND (x0 + x1) * 1.0 / (n0 + n1) < 1
                  THEN (x1 * 1.0 / n1 - x0 * 1.0 / n0)
                       / sqrt(((x0 + x1) * 1.0 / (n0 + n1))
                              * (1 - (x0 + x1) * 1.0 / (n0 + n1))
                              * (1.0 / n0 + 1.0 / n1)) END AS z_raw
      FROM bh_per, bh_tot
    ), bh_st AS (
      SELECT *, abs(z_raw) / sqrt(2.0) AS y,
             1.0 / (1.0 + 0.3275911 * (abs(z_raw) / sqrt(2.0))) AS t
      FROM bh_z
    ), bh_p AS (
      SELECT metric, x0, x1, z_raw, round({_BH_POLY}, 6) AS p FROM bh_st
    ), bh_r AS (
      SELECT *,
             row_number() OVER (ORDER BY p ASC NULLS LAST, metric) AS bh_rank,
             count(p) OVER () AS m
      FROM bh_p
    ), bh_c AS (
      SELECT *,
             max(CASE WHEN p <= bh_rank * {q!r} / m THEN bh_rank END)
               OVER () AS cutoff
      FROM bh_r
    )
    SELECT metric,
           CAST(x0 AS BIGINT) AS conv_control,
           CAST(x1 AS BIGINT) AS conv_treatment,
           round(z_raw, 6) AS z, p,
           CASE WHEN p IS NOT NULL THEN bh_rank END AS bh_rank,
           CASE WHEN p IS NOT NULL
                THEN coalesce(bh_rank <= cutoff, FALSE) END AS significant
    FROM bh_c
    """


# ---------------------------------------------------------------------------
# PR curve + average precision: exact tie-aware ranking eval (wave 92)
# ---------------------------------------------------------------------------


def pr_curve(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ [score, tp, fp, recall, precision] per distinct score threshold,
    descending — the exact precision-recall curve of "non-target activity
    count predicts whether the user ever performs ``target``" (same scorer
    as :func:`auc_activity_purchase`; any per-row score drops in).

    Tie handling is the standard threshold semantics: each row is the
    operating point "predict positive iff score ≥ this value", so tied
    users enter together and ``tp``/``fp`` are exact BIGINT cumulative
    counts — the curve is bit-stable, and ``recall``/``precision`` are
    the rounded doubles of integer ratios (recall NULL when the positive
    class is empty; precision's denominator ``tp+fp ≥ 1`` per construction).

    Scale shape: one user-grain aggregate (map-side combinable), then a
    collapse to score-value grain — the frame is a HISTOGRAM (cardinality
    ≤ max per-user event count), so the descending prefix-sum window and
    the class-total window both run over a bounded frame, never over users.

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
        F.sum("pos").alias("p_g"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_g"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "score",
        F.sum("p_g").over(w).cast("long").alias("tp"),
        F.sum("n_g").over(w).cast("long").alias("fp"),
        F.sum("p_g").over(w_all).cast("long").alias("n_pos"),
    )
    return c.select(
        "score",
        "tp",
        "fp",
        F.when(
            F.col("n_pos") > 0,
            F.round(F.col("tp").cast("double") / F.col("n_pos"), 6),
        ).alias("recall"),
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6
        ).alias("precision"),
    ).orderBy(F.desc("score"))


def pr_curve_sql(target: str = "purchase", table: str = "events") -> str:
    """DuckDB oracle for :func:`pr_curve` (standalone query)."""
    t = target.replace("'", "''")
    return f"""
    WITH prc_u AS (
      SELECT user_id,
             sum(CASE WHEN event_type <> '{t}' THEN 1 ELSE 0 END) AS score,
             max(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS pos
      FROM {table} GROUP BY user_id
    ), prc_g AS (
      SELECT score, sum(pos) AS p_g, sum(1 - pos) AS n_g
      FROM prc_u GROUP BY score
    ), prc_c AS (
      SELECT score,
             CAST(sum(p_g) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
             CAST(sum(n_g) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
             CAST(sum(p_g) OVER () AS BIGINT) AS n_pos
      FROM prc_g
    )
    SELECT score, tp, fp,
           CASE WHEN n_pos > 0
                THEN round(CAST(tp AS DOUBLE) / n_pos, 6) END AS recall,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision
    FROM prc_c ORDER BY score DESC
    """


def average_precision(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ one row [n_pos, n_neg, ap_num_nano, ap] — the EXACT step-wise
    average precision AP = Σ_thresholds ΔRecall · Precision (the standard
    non-interpolated estimator; ties enter at their threshold as in
    :func:`pr_curve`).

    Exactness: per threshold g the term is p_g·Prec_g / P. Prec_g =
    tp_g/(tp_g+fp_g) is one IEEE-double division of exact integers —
    bit-identical across engines — then QUANTIZED to integer nano-units
    (round(1e9·Prec_g)) so the cross-threshold sum ``ap_num_nano =
    Σ p_g·prec_nano_g`` is an order-invariant BIGINT (same trick as the
    NB micro-nat scores): the oracle hash is bit-stable at any
    partitioning. ``ap = ap_num_nano / (1e9·P)`` rounded to 6, NULL when
    the positive class is empty. Bound: fits BIGINT while n_pos < 9.2e9
    (Σ p_g·1e9 ≤ n_pos·1e9 < 2^63) — Spark ANSI raises past it, never
    silently wraps.

    Scale shape: identical to :func:`pr_curve` — user-grain aggregate,
    histogram-grain window, one-row reduce. No per-user ranking anywhere.
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
        F.sum("pos").alias("p_g"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_g"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.select(
        "p_g",
        "n_g",
        F.sum("p_g").over(w).alias("tp"),
        F.sum("n_g").over(w).alias("fp"),
    )
    prec_nano = F.round(
        F.lit(1e9) * F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
        0,
    ).cast("long")
    s = c.agg(
        F.sum("p_g").cast("long").alias("n_pos"),
        F.sum("n_g").cast("long").alias("n_neg"),
        F.sum(F.col("p_g") * prec_nano).cast("long").alias("ap_num_nano"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        "ap_num_nano",
        F.when(
            F.col("n_pos") > 0,
            F.round(
                F.col("ap_num_nano").cast("double")
                / (F.lit(1e9) * F.col("n_pos")),
                6,
            ),
        ).alias("ap"),
    )


def average_precision_sql(
    target: str = "purchase", table: str = "events"
) -> str:
    """DuckDB oracle for :func:`average_precision` — same nano-quantized
    per-threshold precision terms, summed as BIGINT."""
    t = target.replace("'", "''")
    return f"""
    WITH apr_u AS (
      SELECT user_id,
             sum(CASE WHEN event_type <> '{t}' THEN 1 ELSE 0 END) AS score,
             max(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS pos
      FROM {table} GROUP BY user_id
    ), apr_g AS (
      SELECT score, sum(pos) AS p_g, sum(1 - pos) AS n_g
      FROM apr_u GROUP BY score
    ), apr_c AS (
      SELECT p_g, n_g,
             sum(p_g) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(n_g) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
      FROM apr_g
    ), apr_s AS (
      SELECT CAST(sum(p_g) AS BIGINT) AS n_pos,
             CAST(sum(n_g) AS BIGINT) AS n_neg,
             CAST(sum(p_g * CAST(round(1e9 * CAST(tp AS DOUBLE) / (tp + fp), 0)
                                 AS BIGINT)) AS BIGINT) AS ap_num_nano
      FROM apr_c
    )
    SELECT n_pos, n_neg, ap_num_nano,
           CASE WHEN n_pos > 0
                THEN round(CAST(ap_num_nano AS DOUBLE) / (1e9 * n_pos), 6)
           END AS ap
    FROM apr_s
    """


# ---------------------------------------------------------------------------
# Holdout calibration: Brier score + reliability bins (wave 93)
# ---------------------------------------------------------------------------


def brier_holdout(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ one row [n_train, n_test, base_rate_nano, brier] — the EXACT
    holdout Brier score (Brier 1950) of the score-conditional rate model:
    fit "P(user ever does ``target``) per activity-score value" on the
    train half of the deterministic md5 user split (same split as the A/B
    family), predict for the test half (unseen scores fall back to the
    global train rate), and report the mean squared error of the
    predicted probability — the calibration-eval primitive next to
    AUC/AP (discrimination) in any model-eval suite.

    Exactness: every predicted rate is QUANTIZED to integer nano-units
    (``round(1e9·p_tr/n_tr)`` — one IEEE division of exact integers, so
    both engines produce the same BIGINT), the per-user squared error
    ``(pred_nano − y·1e9)²`` fits BIGINT (≤ 1e18) and is summed exactly
    (DECIMAL(38,0) on the Spark side, HUGEINT in the oracle), and
    ``brier`` is the rounded double of that exact integer over
    ``1e18·n_test``. NULL when either half is empty (ANSI division would
    throw). ``base_rate_nano`` is the global train rate for reference.

    Scale shape: one user-grain aggregate (map-side combinable), the
    train-rate table is score-VALUE grain (a histogram — Catalyst
    broadcasts it into the test-side join), and the final reduce is one
    row. No per-user windows, no fact-table re-shuffle.

    Reference parity: no ML surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from linkgraph_spark.functions.hashing import md5_long

    u = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") != target, F.lit(1)).otherwise(F.lit(0))
        ).alias("score"),
        F.max(
            F.when(F.col("event_type") == target, F.lit(1)).otherwise(F.lit(0))
        ).alias("y"),
    ).select(
        "*", (md5_long(F.col("user_id").cast("string")) % 2).alias("variant")
    )
    tr = u.where(F.col("variant") == 0)
    rates = tr.groupBy("score").agg(
        F.round(
            F.lit(1e9) * F.sum("y").cast("double") / F.count("*"), 0
        )
        .cast("long")
        .alias("r_nano")
    )
    g = tr.groupBy().agg(
        F.count("*").alias("n_train"),
        F.when(
            F.count("*") > 0,
            F.round(F.lit(1e9) * F.sum("y").cast("double") / F.count("*"), 0),
        )
        .cast("long")
        .alias("g_nano"),
    )
    te = (
        u.where(F.col("variant") == 1)
        .join(rates, "score", "left")
        .crossJoin(g)
        .select(
            "n_train",
            "g_nano",
            F.coalesce(F.col("r_nano"), F.col("g_nano")).alias("pred_nano"),
            "y",
        )
    )
    err = F.col("pred_nano") - F.col("y") * F.lit(1_000_000_000)
    s = te.groupBy().agg(
        F.max("n_train").alias("n_train"),
        F.count("*").alias("n_test"),
        F.max("g_nano").alias("base_rate_nano"),
        F.sum((err * err).cast("decimal(38,0)")).alias("num"),
    )
    return s.select(
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_test").cast("long").alias("n_test"),
        "base_rate_nano",
        F.when(
            (F.col("n_train") > 0) & (F.col("n_test") > 0),
            F.round(
                F.col("num").cast("double")
                / (F.lit(1e18) * F.col("n_test").cast("double")),
                6,
            ),
        ).alias("brier"),
    )


def brier_holdout_sql(target: str = "purchase", table: str = "events") -> str:
    """DuckDB oracle for :func:`brier_holdout` — same md5 split, same
    nano-quantized rates, HUGEINT error sum."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    t = target.replace("'", "''")
    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH bri_u AS (
      SELECT user_id,
             sum(CASE WHEN event_type <> '{t}' THEN 1 ELSE 0 END) AS score,
             max(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS y
      FROM {table} GROUP BY user_id
    ), bri_v AS (
      SELECT *, ({h}) % 2 AS variant FROM bri_u
    ), bri_r AS (
      SELECT score,
             CAST(round(1e9 * CAST(sum(y) AS DOUBLE) / count(*), 0)
                  AS BIGINT) AS r_nano
      FROM bri_v WHERE variant = 0 GROUP BY score
    ), bri_g AS (
      SELECT count(*) AS n_train,
             CAST(CASE WHEN count(*) > 0
                  THEN round(1e9 * CAST(sum(y) AS DOUBLE) / count(*), 0) END
                  AS BIGINT) AS g_nano
      FROM bri_v WHERE variant = 0
    ), bri_te AS (
      SELECT g.n_train, g.g_nano,
             coalesce(r.r_nano, g.g_nano) AS pred_nano, v.y
      FROM bri_v v
      LEFT JOIN bri_r r ON r.score = v.score
      CROSS JOIN bri_g g
      WHERE v.variant = 1
    ), bri_s AS (
      SELECT max(n_train) AS n_train, count(*) AS n_test,
             max(g_nano) AS base_rate_nano,
             sum((pred_nano - y * 1000000000)
                 * (pred_nano - y * 1000000000)) AS num
      FROM bri_te
    )
    SELECT CAST(n_train AS BIGINT) AS n_train,
           CAST(n_test AS BIGINT) AS n_test,
           base_rate_nano,
           CASE WHEN n_train > 0 AND n_test > 0
                THEN round(CAST(num AS DOUBLE)
                           / (1e18 * CAST(n_test AS DOUBLE)), 6)
           END AS brier
    FROM bri_s
    """


def calibration_bins(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ [bin, n, pred_rate, obs_rate] — the reliability diagram behind
    :func:`brier_holdout`: test-half users bucketed into 10 equal-width
    bins of their nano-quantized predicted probability (``bin =
    pred_nano div 1e8``, clamped to 9 so probability 1.0 joins the top
    bin), with the exact mean predicted rate and observed positive rate
    per bin. A calibrated model tracks the diagonal; the gap per bin is
    the reliability term of the Brier decomposition (Murphy 1973).

    Exactness: binning is INTEGER division of the shared pred_nano
    (bit-identical across engines by construction), Σpred_nano ≤ n·1e9
    stays BIGINT, and both rates are rounded doubles of exact-integer
    ratios. Scale shape: identical to :func:`brier_holdout` plus one
    10-row grouped aggregate.
    """
    from linkgraph_spark.functions.hashing import md5_long

    u = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") != target, F.lit(1)).otherwise(F.lit(0))
        ).alias("score"),
        F.max(
            F.when(F.col("event_type") == target, F.lit(1)).otherwise(F.lit(0))
        ).alias("y"),
    ).select(
        "*", (md5_long(F.col("user_id").cast("string")) % 2).alias("variant")
    )
    tr = u.where(F.col("variant") == 0)
    rates = tr.groupBy("score").agg(
        F.round(
            F.lit(1e9) * F.sum("y").cast("double") / F.count("*"), 0
        )
        .cast("long")
        .alias("r_nano")
    )
    g = tr.groupBy().agg(
        F.when(
            F.count("*") > 0,
            F.round(F.lit(1e9) * F.sum("y").cast("double") / F.count("*"), 0),
        )
        .cast("long")
        .alias("g_nano")
    )
    te = (
        u.where(F.col("variant") == 1)
        .join(rates, "score", "left")
        .crossJoin(g)
        .select(
            F.coalesce(F.col("r_nano"), F.col("g_nano")).alias("pred_nano"),
            "y",
        )
        .where(F.col("pred_nano").isNotNull())
    )
    b = te.groupBy(
        F.least(
            F.expr("pred_nano div 100000000"), F.lit(9)
        ).cast("int").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum("pred_nano").cast("double")
            / (F.lit(1e9) * F.count("*")),
            6,
        ).alias("pred_rate"),
        F.round(F.sum("y").cast("double") / F.count("*"), 6).alias("obs_rate"),
    )
    return b.orderBy("bin")


def calibration_bins_sql(
    target: str = "purchase", table: str = "events"
) -> str:
    """DuckDB oracle for :func:`calibration_bins` (same split and rates)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    t = target.replace("'", "''")
    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH cal_u AS (
      SELECT user_id,
             sum(CASE WHEN event_type <> '{t}' THEN 1 ELSE 0 END) AS score,
             max(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS y
      FROM {table} GROUP BY user_id
    ), cal_v AS (
      SELECT *, ({h}) % 2 AS variant FROM cal_u
    ), cal_r AS (
      SELECT score,
             CAST(round(1e9 * CAST(sum(y) AS DOUBLE) / count(*), 0)
                  AS BIGINT) AS r_nano
      FROM cal_v WHERE variant = 0 GROUP BY score
    ), cal_g AS (
      SELECT CAST(CASE WHEN count(*) > 0
                  THEN round(1e9 * CAST(sum(y) AS DOUBLE) / count(*), 0) END
                  AS BIGINT) AS g_nano
      FROM cal_v WHERE variant = 0
    ), cal_te AS (
      SELECT coalesce(r.r_nano, g.g_nano) AS pred_nano, v.y
      FROM cal_v v
      LEFT JOIN cal_r r ON r.score = v.score
      CROSS JOIN cal_g g
      WHERE v.variant = 1 AND coalesce(r.r_nano, g.g_nano) IS NOT NULL
    )
    SELECT CAST(least(pred_nano // 100000000, 9) AS INTEGER) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(pred_nano) AS DOUBLE) / (1e9 * count(*)), 6)
             AS pred_rate,
           round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS obs_rate
    FROM cal_te GROUP BY 1 ORDER BY bin
    """


# ---------------------------------------------------------------------------
# pass@k + Wilson intervals: eval-suite scalars (wave 98)
# ---------------------------------------------------------------------------

_PASS_MAX_K = 10


def _pass_fail_expr() -> str:
    """Shared fail-probability expression: the unbiased pass@k estimator's
    complement ``C(n−c, k)/C(n, k)`` written as the telescoping product
    ``Π_{i<k} (n−c−i)/(n−i)`` (Chen et al. 2021, "Evaluating Large
    Language Models Trained on Code" — public formulation). Each factor
    is one IEEE division of exact integers and the chain is a fixed
    literal of ``_PASS_MAX_K`` conditional factors, so both engines
    multiply the same doubles in the same order. ``n−c < k`` means the
    failure set cannot fill k draws — fail probability exactly 0."""
    factors = " * ".join(
        f"(CASE WHEN {i} < k THEN CAST(n - c - {i} AS DOUBLE)"
        f" / CAST(n - {i} AS DOUBLE) ELSE 1.0 END)"
        for i in range(_PASS_MAX_K)
    )
    return f"(CASE WHEN n - c >= k THEN {factors} ELSE 0.0 END)"


def pass_at_k(
    events: DataFrame, target: str = "purchase", ks: tuple = (1, 5, 10)
) -> DataFrame:
    """→ [k, n_users, pass_at_k] — the UNBIASED pass@k estimator
    ``1 − C(n−c, k)/C(n, k)`` (Chen et al. 2021) averaged over users,
    reading each user's events as attempts (n) and ``target`` events as
    successes (c). The model-eval scalar every code/agent benchmark
    reports, computed as a relational aggregate; any (attempts,
    successes) grain drops in. Users with fewer than k attempts are
    excluded (the estimator is undefined there — Chen et al.'s n ≥ k
    requirement), and ``n_users`` reports the population actually
    averaged, so a shrinking cohort at large k is visible, not hidden.

    Exactness: the per-user failure probability is the telescoping
    product of exact-integer divisions (one shared literal expression —
    see :func:`_pass_fail_expr`), QUANTIZED to integer nano-units so the
    cross-user mean is an order-invariant BIGINT sum; ``pass_at_k`` is
    its rounded complement, NULL when no user qualifies. Bound: fits
    BIGINT while n_users < 9.2e9. ``k ≤ 10`` (the literal chain length);
    larger k raises an explicit error rather than a silent truncation.

    Scale shape: one user-grain aggregate (map-side combinable), a
    3-row k lattice cross-joined onto it, one grouped sum. No windows,
    no second fact pass.

    Reference parity: no eval surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    if max(ks) > _PASS_MAX_K:
        raise ValueError(f"pass_at_k supports k <= {_PASS_MAX_K}, got {max(ks)}")
    u = events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == target, F.lit(1)).otherwise(F.lit(0))
        ).alias("c"),
    )
    kdf = u.sparkSession.createDataFrame(
        [(int(k),) for k in sorted(ks)], "k int"
    )
    j = u.crossJoin(kdf).where(F.col("n") >= F.col("k"))
    fail_nano = F.round(F.lit(1e9) * F.expr(_pass_fail_expr()), 0).cast("long")
    s = j.groupBy("k").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(fail_nano).alias("fail_sum"),
    )
    return s.select(
        "k",
        "n_users",
        F.round(
            (
                F.lit(1e9) * F.col("n_users").cast("double")
                - F.col("fail_sum").cast("double")
            )
            / (F.lit(1e9) * F.col("n_users").cast("double")),
            6,
        ).alias("pass_at_k"),
    ).orderBy("k")


def pass_at_k_sql(
    target: str = "purchase", table: str = "events", ks: tuple = (1, 5, 10)
) -> str:
    """DuckDB oracle for :func:`pass_at_k` — same literal factor chain,
    same nano quantization."""
    t = target.replace("'", "''")
    kvals = ", ".join(f"({int(k)})" for k in sorted(ks))
    return f"""
    WITH pak_u AS (
      SELECT user_id, count(*) AS n,
             sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS c
      FROM {table} GROUP BY user_id
    ), pak_k (k) AS (VALUES {kvals}),
    pak_j AS (
      SELECT k, n, c,
             CAST(round(1e9 * {_pass_fail_expr()}, 0) AS BIGINT) AS fail_nano
      FROM pak_u CROSS JOIN pak_k WHERE n >= k
    ), pak_s AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_users,
             sum(fail_nano) AS fail_sum
      FROM pak_j GROUP BY k
    )
    SELECT k, n_users,
           round((1e9 * CAST(n_users AS DOUBLE) - CAST(fail_sum AS DOUBLE))
                 / (1e9 * CAST(n_users AS DOUBLE)), 6) AS pass_at_k
    FROM pak_s ORDER BY k
    """


_WILSON_STAGE = [
    "metric",
    "x",
    "n",
    "round(CAST(x AS DOUBLE) / n, 6) AS rate",
    "round((CAST(x AS DOUBLE) / n + 1.9208 / n"
    " - 1.96 * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n) / n"
    " + 0.9604 / (CAST(n AS DOUBLE) * n)))"
    " / (1.0 + 3.8416 / n), 6) AS wilson_lo",
    "round((CAST(x AS DOUBLE) / n + 1.9208 / n"
    " + 1.96 * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n) / n"
    " + 0.9604 / (CAST(n AS DOUBLE) * n)))"
    " / (1.0 + 3.8416 / n), 6) AS wilson_hi",
]


def conversion_wilson_ci(events: DataFrame) -> DataFrame:
    """→ [metric, x, n, rate, wilson_lo, wilson_hi] — per event type, the
    share of users who ever perform it, with the 95% WILSON score
    interval (Wilson 1927; z = 1.96 baked in as exact literals 1.9208 =
    z², 0.9604 = z²/2² …/2, 3.8416 = 2z²… the standard constants) — the
    binomial CI that behaves at rates near 0/1 where the Wald interval
    collapses, and the honest error bar under every conversion-rate
    dashboard number.

    Exactness: x and n are exact user counts; every double is produced
    by ONE shared expression string (``_WILSON_STAGE``) evaluated by
    both engines over identical integers, so sqrt/rounding agree
    bit-for-bit. Wilson bounds live in [0, 1] by construction — no
    clamping needed. Scale shape: one distinct (user, type) projection,
    one metric-grain aggregate, a broadcast one-row user total.
    """
    n_users = events.select(
        F.countDistinct("user_id").cast("long").alias("n")
    )
    per = (
        events.select("user_id", F.col("event_type").alias("metric"))
        .distinct()
        .groupBy("metric")
        .agg(F.count("*").cast("long").alias("x"))
        .crossJoin(n_users)
    )
    return per.selectExpr(*_WILSON_STAGE).orderBy("metric")


def conversion_wilson_ci_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`conversion_wilson_ci` (same staged
    expression strings)."""
    cols = ",\n           ".join(_WILSON_STAGE)
    return f"""
    WITH wci_n AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM {table}
    ), wci_x AS (
      SELECT metric, CAST(count(*) AS BIGINT) AS x FROM (
        SELECT DISTINCT user_id, event_type AS metric FROM {table}
      ) GROUP BY metric
    )
    SELECT {cols}
    FROM wci_x CROSS JOIN wci_n
    ORDER BY metric
    """


# ---------------------------------------------------------------------------
# Partition-agreement metrics: ARI + NMI (wave 103)
# ---------------------------------------------------------------------------


def adjusted_rand(
    documents: DataFrame, col_a: str = "lang", col_b: str = "source"
) -> DataFrame:
    """→ one row [n, sum_pairs, a_pairs, b_pairs, ari] — the Adjusted
    Rand Index (Hubert & Arabie 1985) between two categorical partitions
    of the corpus (default: language vs source — "do sources specialize
    by language"); point any two label columns at it to score a
    clustering against ground truth. ARI = (Σ C(n_ij,2) − E) / (½(ΣC(a_i,2)
    + ΣC(b_j,2)) − E) with E = ΣC(a_i,2)·ΣC(b_j,2)/C(n,2).

    Exactness: every pair count is an exact BIGINT computed as
    ``n·(n−1) div 2`` on the contingency/margin counts (cells ≤ |A|·|B|,
    a broadcast-sized lattice); only the final index is a staged double
    (identical expression text in both engines), rounded to 6 and NULL
    when the denominator is 0 (degenerate one-cluster partitions — the
    index is undefined there, not 1.0). Bound: C(n,2) needs n < 4.3e9
    before BIGINT overflow — ANSI raises, never wraps.

    Scale shape: one aggregate to (a, b) cell grain (map-side
    combinable), margins re-aggregated from the CELL table (never a
    second fact pass), one-row reduce.

    Reference parity: no eval surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    cells = documents.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count("*").alias("c"))

    def _c2(col):
        return F.sum(F.expr(f"({col} * ({col} - 1)) div 2")).cast("long")

    am = cells.groupBy("a").agg(F.sum("c").alias("ca"))
    bm = cells.groupBy("b").agg(F.sum("c").alias("cb"))
    s = (
        cells.groupBy()
        .agg(
            F.sum("c").cast("long").alias("n"),
            _c2("c").alias("sum_pairs"),
        )
        .crossJoin(am.groupBy().agg(_c2("ca").alias("a_pairs")))
        .crossJoin(bm.groupBy().agg(_c2("cb").alias("b_pairs")))
    )
    return s.select(
        "n",
        "sum_pairs",
        "a_pairs",
        "b_pairs",
        F.expr(
            "CASE WHEN n >= 2 AND"
            " (CAST(a_pairs AS DOUBLE) + b_pairs) / 2.0"
            "   - CAST(a_pairs AS DOUBLE) * b_pairs / ((n * (n - 1)) div 2)"
            " <> 0.0"
            " THEN round((CAST(sum_pairs AS DOUBLE)"
            "   - CAST(a_pairs AS DOUBLE) * b_pairs / ((n * (n - 1)) div 2))"
            " / ((CAST(a_pairs AS DOUBLE) + b_pairs) / 2.0"
            "   - CAST(a_pairs AS DOUBLE) * b_pairs / ((n * (n - 1)) div 2)),"
            " 6) END"
        ).alias("ari"),
    )


def adjusted_rand_sql(
    table: str = "documents", col_a: str = "lang", col_b: str = "source"
) -> str:
    """DuckDB oracle for :func:`adjusted_rand` (same staged index; //
    and div agree — all operands nonnegative)."""
    return f"""
    WITH ari_c AS (
      SELECT {col_a} AS a, {col_b} AS b, count(*) AS c
      FROM {table} GROUP BY 1, 2
    ), ari_s AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS sum_pairs
      FROM ari_c
    ), ari_a AS (
      SELECT CAST(sum((ca * (ca - 1)) // 2) AS BIGINT) AS a_pairs
      FROM (SELECT sum(c) AS ca FROM ari_c GROUP BY a)
    ), ari_b AS (
      SELECT CAST(sum((cb * (cb - 1)) // 2) AS BIGINT) AS b_pairs
      FROM (SELECT sum(c) AS cb FROM ari_c GROUP BY b)
    )
    SELECT n, sum_pairs, a_pairs, b_pairs,
           CASE WHEN n >= 2 AND
                (CAST(a_pairs AS DOUBLE) + b_pairs) / 2.0
                  - CAST(a_pairs AS DOUBLE) * b_pairs / ((n * (n - 1)) // 2)
                <> 0.0
                THEN round((CAST(sum_pairs AS DOUBLE)
                  - CAST(a_pairs AS DOUBLE) * b_pairs / ((n * (n - 1)) // 2))
                / ((CAST(a_pairs AS DOUBLE) + b_pairs) / 2.0
                  - CAST(a_pairs AS DOUBLE) * b_pairs / ((n * (n - 1)) // 2)),
                6) END AS ari
    FROM ari_s, ari_a, ari_b
    """


def nmi_partitions(
    documents: DataFrame, col_a: str = "lang", col_b: str = "source"
) -> DataFrame:
    """→ one row [n, h_a, h_b, mi, nmi] — mutual information between two
    categorical partitions with sqrt normalization NMI = I/√(H_a·H_b)
    (Strehl & Ghosh 2002) — ARI's information-theoretic sibling; the
    pair covers both standard clustering-agreement conventions.

    Determinism: each cell/margin term ``(c/n)·ln(…)`` is one IEEE
    expression over exact integers QUANTIZED to integer micro-nats
    before summing (the NB trick — sums are order-invariant, hashes
    bit-stable); h_a/h_b/mi are the rounded micro-nat sums ÷ 1e6, and
    nmi re-derives from those exact integer sums through one shared
    expression, NULL when either entropy is 0 (a one-cluster side
    carries no information — undefined, not 1.0). MI of independent
    partitions can round to −0.0 ulps; the final greatest(0,·) clamps
    the tiny negative quantization residue, documented, before the
    ratio.

    Scale shape: identical to :func:`adjusted_rand` — cell-grain
    aggregate, margins from the cell table, one-row reduce.
    """
    cells = documents.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count("*").alias("c"))
    am = cells.groupBy("a").agg(F.sum("c").alias("ca"))
    bm = cells.groupBy("b").agg(F.sum("c").alias("cb"))
    n1 = cells.groupBy().agg(F.sum("c").cast("long").alias("n"))
    # micro-nat terms, each from exact ints via one staged expression
    mi_t = (
        cells.crossJoin(n1)
        .join(am, "a")
        .join(bm, "b")
        .select(
            F.expr(
                "CAST(round(1e6 * (CAST(c AS DOUBLE) / n)"
                " * ln(CAST(c AS DOUBLE) * n"
                "      / (CAST(ca AS DOUBLE) * cb)), 0) AS BIGINT) AS t"
            )
        )
        .groupBy()
        .agg(F.coalesce(F.sum("t"), F.lit(0)).alias("mi_u"))
    )
    ha_t = (
        am.crossJoin(n1)
        .select(
            F.expr(
                "CAST(round(1e6 * (CAST(ca AS DOUBLE) / n)"
                " * ln(CAST(ca AS DOUBLE) / n), 0) AS BIGINT) AS t"
            )
        )
        .groupBy()
        .agg(F.coalesce(-F.sum("t"), F.lit(0)).alias("ha_u"))
    )
    hb_t = (
        bm.crossJoin(n1)
        .select(
            F.expr(
                "CAST(round(1e6 * (CAST(cb AS DOUBLE) / n)"
                " * ln(CAST(cb AS DOUBLE) / n), 0) AS BIGINT) AS t"
            )
        )
        .groupBy()
        .agg(F.coalesce(-F.sum("t"), F.lit(0)).alias("hb_u"))
    )
    s = n1.crossJoin(mi_t).crossJoin(ha_t).crossJoin(hb_t)
    return s.select(
        "n",
        F.expr("round(ha_u / 1e6, 6)").alias("h_a"),
        F.expr("round(hb_u / 1e6, 6)").alias("h_b"),
        F.expr("round(greatest(0, mi_u) / 1e6, 6)").alias("mi"),
        F.expr(
            "CASE WHEN ha_u > 0 AND hb_u > 0 THEN"
            " round(greatest(0, mi_u) / sqrt(CAST(ha_u AS DOUBLE) * hb_u), 6)"
            " END"
        ).alias("nmi"),
    )


def nmi_partitions_sql(
    table: str = "documents", col_a: str = "lang", col_b: str = "source"
) -> str:
    """DuckDB oracle for :func:`nmi_partitions` (same micro-nat terms)."""
    return f"""
    WITH nmi_c AS (
      SELECT {col_a} AS a, {col_b} AS b, count(*) AS c
      FROM {table} GROUP BY 1, 2
    ), nmi_n AS (
      SELECT CAST(sum(c) AS BIGINT) AS n FROM nmi_c
    ), nmi_am AS (
      SELECT a, sum(c) AS ca FROM nmi_c GROUP BY a
    ), nmi_bm AS (
      SELECT b, sum(c) AS cb FROM nmi_c GROUP BY b
    ), nmi_mi AS (
      SELECT coalesce(sum(CAST(round(1e6 * (CAST(c AS DOUBLE) / n)
               * ln(CAST(c AS DOUBLE) * n / (CAST(ca AS DOUBLE) * cb)), 0)
               AS BIGINT)), 0) AS mi_u
      FROM nmi_c JOIN nmi_am USING (a) JOIN nmi_bm USING (b)
      CROSS JOIN nmi_n
    ), nmi_ha AS (
      SELECT coalesce(-sum(CAST(round(1e6 * (CAST(ca AS DOUBLE) / n)
               * ln(CAST(ca AS DOUBLE) / n), 0) AS BIGINT)), 0) AS ha_u
      FROM nmi_am CROSS JOIN nmi_n
    ), nmi_hb AS (
      SELECT coalesce(-sum(CAST(round(1e6 * (CAST(cb AS DOUBLE) / n)
               * ln(CAST(cb AS DOUBLE) / n), 0) AS BIGINT)), 0) AS hb_u
      FROM nmi_bm CROSS JOIN nmi_n
    )
    SELECT n,
           round(ha_u / 1e6, 6) AS h_a,
           round(hb_u / 1e6, 6) AS h_b,
           round(greatest(0, mi_u) / 1e6, 6) AS mi,
           CASE WHEN ha_u > 0 AND hb_u > 0 THEN
             round(greatest(0, mi_u) / sqrt(CAST(ha_u AS DOUBLE) * hb_u), 6)
           END AS nmi
    FROM nmi_n, nmi_mi, nmi_ha, nmi_hb
    """


# ---------------------------------------------------------------------------
# A/B power analysis: MDE + required sample size (wave 106)
# ---------------------------------------------------------------------------

# z_{alpha/2} = 1.959964 (two-sided 5%), z_power = 0.841621 (80% power):
# the standard normal quantiles as exact literals (staged, never computed
# via an engine's erfinv), per the classical two-proportion power formula
# MDE = (z_a + z_b) * sqrt(2 p (1-p) / n)  (e.g. Kohavi et al., public).
_Z_SUM = "2.801585"


def ab_power_mde(events: DataFrame) -> DataFrame:
    """→ [metric, n_per_arm, base_rate, mde_abs, mde_rel] — for each
    event type, the minimum detectable effect of the CURRENT experiment
    under the md5 user split at α = 0.05 (two-sided) and 80% power:
    the pre-experiment reality check ("this test can only see a ≥ X%
    lift") that belongs next to the msprt/CUPED/SRM/FDR family.
    ``n_per_arm`` is the smaller arm (the binding one — conservative),
    ``base_rate`` the pooled share of users ever doing the metric.

    Determinism: counts are exact; the z-quantile sum is a literal
    (never an engine erfinv); mde is one staged sqrt expression over
    exact integers, rounded to 6. Degenerate rates (0 or 1) and empty
    arms report NULL — there is no detectable effect in a saturated
    metric, not an infinite one.

    Scale shape: one distinct-user projection (the split), one distinct
    (user, type) projection joined to it, one metric-grain aggregate —
    the same frames the A/B family already uses.

    Reference parity: no experimentation surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from linkgraph_spark.functions.hashing import md5_long

    users = events.select("user_id").distinct().select(
        "user_id",
        (md5_long(F.col("user_id").cast("string")) % 2).alias("variant"),
    )
    tot = users.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    ut = events.select("user_id", F.col("event_type").alias("metric")).distinct()
    per = (
        ut.join(users, "user_id")
        .groupBy("metric")
        .agg(F.count("*").alias("x"))
        .crossJoin(tot)
    )
    return per.select(
        "metric",
        F.least("n0", "n1").cast("long").alias("n_per_arm"),
        F.expr(
            "CASE WHEN n0 + n1 > 0 THEN"
            " round(CAST(x AS DOUBLE) / (n0 + n1), 6) END"
        ).alias("base_rate"),
        F.expr(
            "CASE WHEN least(n0, n1) > 0"
            " AND x > 0 AND x < n0 + n1 THEN"
            f" round({_Z_SUM} * sqrt(2.0 * (CAST(x AS DOUBLE) / (n0 + n1))"
            " * (1.0 - CAST(x AS DOUBLE) / (n0 + n1))"
            " / least(n0, n1)), 6) END"
        ).alias("mde_abs"),
        F.expr(
            "CASE WHEN least(n0, n1) > 0"
            " AND x > 0 AND x < n0 + n1 THEN"
            f" round({_Z_SUM} * sqrt(2.0 * (CAST(x AS DOUBLE) / (n0 + n1))"
            " * (1.0 - CAST(x AS DOUBLE) / (n0 + n1))"
            " / least(n0, n1)) / (CAST(x AS DOUBLE) / (n0 + n1)), 6) END"
        ).alias("mde_rel"),
    ).orderBy("metric")


def ab_power_mde_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`ab_power_mde` (same literal z sum, same
    staged sqrt)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH mde_u AS (
      SELECT user_id, ({h}) % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM {table})
    ), mde_t AS (
      SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1
      FROM mde_u
    ), mde_x AS (
      SELECT metric, count(*) AS x FROM (
        SELECT DISTINCT user_id, event_type AS metric FROM {table}
      ) GROUP BY metric
    )
    SELECT metric,
           CAST(least(n0, n1) AS BIGINT) AS n_per_arm,
           CASE WHEN n0 + n1 > 0 THEN
             round(CAST(x AS DOUBLE) / (n0 + n1), 6) END AS base_rate,
           CASE WHEN least(n0, n1) > 0 AND x > 0 AND x < n0 + n1 THEN
             round({_Z_SUM} * sqrt(2.0 * (CAST(x AS DOUBLE) / (n0 + n1))
               * (1.0 - CAST(x AS DOUBLE) / (n0 + n1))
               / least(n0, n1)), 6) END AS mde_abs,
           CASE WHEN least(n0, n1) > 0 AND x > 0 AND x < n0 + n1 THEN
             round({_Z_SUM} * sqrt(2.0 * (CAST(x AS DOUBLE) / (n0 + n1))
               * (1.0 - CAST(x AS DOUBLE) / (n0 + n1))
               / least(n0, n1)) / (CAST(x AS DOUBLE) / (n0 + n1)), 6)
           END AS mde_rel
    FROM mde_x CROSS JOIN mde_t
    ORDER BY metric
    """


def ab_required_n(events: DataFrame, rel_lift: float = 0.1) -> DataFrame:
    """→ [metric, base_rate, n_required_per_arm, have_per_arm, ready] —
    per metric, the classical two-proportion sample size PER ARM to
    detect a ``rel_lift`` relative improvement at α = 0.05 / 80% power:
    ``n = 2·p(1−p)·(z_a + z_b)² / (Δ)²`` with Δ = rel_lift·p — and
    whether the current md5 arms already clear it. The "how long must
    this test run" planner, sharing :func:`ab_power_mde`'s frames.

    ``n_required_per_arm`` is ceil'd to a BIGINT via integer-safe
    staging (both engines ceil the same double); degenerate rates
    report NULL (a 0% or 100% metric cannot lift). ``ready`` compares
    exact integers and is NULL exactly when the requirement is.
    """
    from linkgraph_spark.functions.hashing import md5_long

    r = float(rel_lift)
    users = events.select("user_id").distinct().select(
        "user_id",
        (md5_long(F.col("user_id").cast("string")) % 2).alias("variant"),
    )
    tot = users.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    ut = events.select("user_id", F.col("event_type").alias("metric")).distinct()
    per = (
        ut.join(users, "user_id")
        .groupBy("metric")
        .agg(F.count("*").alias("x"))
        .crossJoin(tot)
    )
    need = (
        "CASE WHEN x > 0 AND x < n0 + n1 THEN"
        f" CAST(ceil(2.0 * (CAST(x AS DOUBLE) / (n0 + n1))"
        " * (1.0 - CAST(x AS DOUBLE) / (n0 + n1))"
        f" * {_Z_SUM} * {_Z_SUM}"
        f" / (({r!r} * CAST(x AS DOUBLE) / (n0 + n1))"
        f" * ({r!r} * CAST(x AS DOUBLE) / (n0 + n1)))) AS BIGINT) END"
    )
    return per.select(
        "metric",
        F.expr(
            "CASE WHEN n0 + n1 > 0 THEN"
            " round(CAST(x AS DOUBLE) / (n0 + n1), 6) END"
        ).alias("base_rate"),
        F.expr(need).alias("n_required_per_arm"),
        F.least("n0", "n1").cast("long").alias("have_per_arm"),
        F.expr(f"CASE WHEN ({need}) IS NOT NULL THEN least(n0, n1) >= ({need}) END").alias(
            "ready"
        ),
    ).orderBy("metric")


def ab_required_n_sql(table: str = "events", rel_lift: float = 0.1) -> str:
    """DuckDB oracle for :func:`ab_required_n` (same staged ceil)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    r = float(rel_lift)
    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    need = (
        "CASE WHEN x > 0 AND x < n0 + n1 THEN"
        " CAST(ceil(2.0 * (CAST(x AS DOUBLE) / (n0 + n1))"
        " * (1.0 - CAST(x AS DOUBLE) / (n0 + n1))"
        f" * {_Z_SUM} * {_Z_SUM}"
        f" / (({r!r} * CAST(x AS DOUBLE) / (n0 + n1))"
        f" * ({r!r} * CAST(x AS DOUBLE) / (n0 + n1)))) AS BIGINT) END"
    )
    return f"""
    WITH rqn_u AS (
      SELECT user_id, ({h}) % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM {table})
    ), rqn_t AS (
      SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1
      FROM rqn_u
    ), rqn_x AS (
      SELECT metric, count(*) AS x FROM (
        SELECT DISTINCT user_id, event_type AS metric FROM {table}
      ) GROUP BY metric
    )
    SELECT metric,
           CASE WHEN n0 + n1 > 0 THEN
             round(CAST(x AS DOUBLE) / (n0 + n1), 6) END AS base_rate,
           {need} AS n_required_per_arm,
           CAST(least(n0, n1) AS BIGINT) AS have_per_arm,
           CASE WHEN ({need}) IS NOT NULL
                THEN least(n0, n1) >= ({need}) END AS ready
    FROM rqn_x CROSS JOIN rqn_t
    ORDER BY metric
    """


# ---------------------------------------------------------------------------
# Rank fusion + NDCG (wave 107)
# ---------------------------------------------------------------------------


def rrf_user_ranking(
    events: DataFrame, top_lists: int = 100, top_n: int = 20, k: int = 60
) -> DataFrame:
    """→ [user_id, rank_activity, rank_spend, rrf_micro] — Reciprocal
    Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009: score =
    Σ 1/(k + rank)) of two user rankings — event count and total spend —
    keeping the fused ``top_n``. THE standard way search stacks merge
    heterogeneous rankers without score calibration; here it surfaces
    "users big on EITHER axis" with the classic k = 60 damping.

    Production RRF fuses bounded TOP LISTS, not full rankings — and so
    does this: each side contributes only its top ``top_lists`` rows
    (TakeOrderedAndProject — no global rank over the population, which
    would be the low-cardinality single-task window trap at 100 TB).
    Users absent from a list contribute nothing from it (the standard
    convention). Ranks tie-break by user_id; each 1/(k+rank) term is
    quantized to integer micro-units so the fused score — and the final
    ordering — is an exact BIGINT comparison, bit-stable. Absent-list
    ranks report NULL.

    Scale shape: one user-grain aggregate (map-side combinable), two
    TakeOrdered(top_lists), windows only over those ≤ top_lists-row
    frames, one fused TakeOrdered(top_n).

    Reference parity: no ranking surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    u = events.groupBy("user_id").agg(
        F.count("*").alias("n_ev"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")), F.lit(0)
        ).alias("spend_c"),
    )
    ta = (
        u.orderBy(F.desc("n_ev"), F.asc("user_id"))
        .limit(int(top_lists))
        .select(
            "user_id",
            F.row_number()
            .over(Window.orderBy(F.desc("n_ev"), F.asc("user_id")))
            .alias("rank_activity"),
        )
    )
    tb = (
        u.orderBy(F.desc("spend_c"), F.asc("user_id"))
        .limit(int(top_lists))
        .select(
            "user_id",
            F.row_number()
            .over(Window.orderBy(F.desc("spend_c"), F.asc("user_id")))
            .alias("rank_spend"),
        )
    )
    kk = int(k)
    term_a = F.coalesce(
        F.round(F.lit(1e6) / (F.lit(kk) + F.col("rank_activity")), 0).cast(
            "long"
        ),
        F.lit(0),
    )
    term_b = F.coalesce(
        F.round(F.lit(1e6) / (F.lit(kk) + F.col("rank_spend")), 0).cast("long"),
        F.lit(0),
    )
    return (
        ta.join(tb, "user_id", "full_outer")
        .select(
            "user_id",
            "rank_activity",
            "rank_spend",
            (term_a + term_b).alias("rrf_micro"),
        )
        .orderBy(F.desc("rrf_micro"), F.asc("user_id"))
        .limit(int(top_n))
    )


def rrf_user_ranking_sql(
    table: str = "events", top_lists: int = 100, top_n: int = 20, k: int = 60
) -> str:
    """DuckDB oracle for :func:`rrf_user_ranking` (same micro-quantized
    terms, same tie-breaks)."""
    kk = int(k)
    return f"""
    WITH rrf_u AS (
      SELECT user_id, count(*) AS n_ev,
             coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)), 0)
               AS spend_c
      FROM {table} GROUP BY user_id
    ), rrf_a AS (
      SELECT user_id,
             row_number() OVER (ORDER BY n_ev DESC, user_id ASC)
               AS rank_activity
      FROM rrf_u ORDER BY n_ev DESC, user_id ASC LIMIT {int(top_lists)}
    ), rrf_b AS (
      SELECT user_id,
             row_number() OVER (ORDER BY spend_c DESC, user_id ASC)
               AS rank_spend
      FROM rrf_u ORDER BY spend_c DESC, user_id ASC LIMIT {int(top_lists)}
    )
    SELECT coalesce(a.user_id, b.user_id) AS user_id,
           a.rank_activity, b.rank_spend,
           coalesce(CAST(round(1e6 / ({kk} + a.rank_activity), 0) AS BIGINT),
                    0)
           + coalesce(CAST(round(1e6 / ({kk} + b.rank_spend), 0) AS BIGINT),
                      0) AS rrf_micro
    FROM rrf_a a FULL OUTER JOIN rrf_b b USING (user_id)
    ORDER BY rrf_micro DESC, user_id ASC LIMIT {int(top_n)}
    """


def ndcg_activity_spend(events: DataFrame, k: int = 10) -> DataFrame:
    """→ one row [k, dcg_micro, idcg_micro, ndcg] — NDCG@k (Järvelin &
    Kekäläinen 2002) of the ranking "most-active users first" against
    the graded relevance "total spend in cents": does engagement rank
    predict value? The graded companion to AUC (binary) and AP
    (binary-ranked) in the eval suite; any (predicted-rank, relevance)
    pair drops in.

    Scale shape — the point: DCG@k needs only the top-k by predicted
    rank and IDCG@k only the top-k by relevance, both
    TakeOrderedAndProject — NO global rank over users. Positions come
    from windows over those k-row frames. Each gain term
    ``rel/log2(pos+1)`` is one staged division quantized to integer
    micro-units, so both sums — and their ratio — are engine-stable;
    ``ndcg`` is NULL when IDCG is 0 (nobody spent anything). Ties break
    by user_id on both sides.
    """
    from pyspark.sql import Window

    u = events.groupBy("user_id").agg(
        F.count("*").alias("n_ev"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")), F.lit(0)
        ).alias("rel"),
    )
    kk = int(k)

    def _gain_sum(df, order_cols, alias):
        top = df.orderBy(*order_cols).limit(kk)
        pos = F.row_number().over(Window.orderBy(*order_cols))
        g = top.select(
            F.round(
                F.col("rel").cast("double")
                * F.lit(1e6)
                / F.log2(pos.cast("double") + F.lit(1.0)),
                0,
            )
            .cast("long")
            .alias("g")
        )
        return g.groupBy().agg(
            F.coalesce(F.sum("g"), F.lit(0)).alias(alias)
        )

    dcg = _gain_sum(u, [F.desc("n_ev"), F.asc("user_id")], "dcg_micro")
    idcg = _gain_sum(u, [F.desc("rel"), F.asc("user_id")], "idcg_micro")
    return dcg.crossJoin(idcg).select(
        F.lit(kk).alias("k"),
        "dcg_micro",
        "idcg_micro",
        F.expr(
            "CASE WHEN idcg_micro > 0 THEN"
            " round(CAST(dcg_micro AS DOUBLE) / idcg_micro, 6) END"
        ).alias("ndcg"),
    )


def ndcg_activity_spend_sql(table: str = "events", k: int = 10) -> str:
    """DuckDB oracle for :func:`ndcg_activity_spend` (same micro gains)."""
    kk = int(k)
    return f"""
    WITH ndc_u AS (
      SELECT user_id, count(*) AS n_ev,
             coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)), 0) AS rel
      FROM {table} GROUP BY user_id
    ), ndc_d AS (
      SELECT coalesce(sum(CAST(round(CAST(rel AS DOUBLE) * 1e6
               / log2(CAST(pos AS DOUBLE) + 1.0), 0) AS BIGINT)), 0)
               AS dcg_micro
      FROM (
        SELECT rel, row_number() OVER (ORDER BY n_ev DESC, user_id ASC)
                 AS pos
        FROM ndc_u ORDER BY n_ev DESC, user_id ASC LIMIT {kk}
      )
    ), ndc_i AS (
      SELECT coalesce(sum(CAST(round(CAST(rel AS DOUBLE) * 1e6
               / log2(CAST(pos AS DOUBLE) + 1.0), 0) AS BIGINT)), 0)
               AS idcg_micro
      FROM (
        SELECT rel, row_number() OVER (ORDER BY rel DESC, user_id ASC)
                 AS pos
        FROM ndc_u ORDER BY rel DESC, user_id ASC LIMIT {kk}
      )
    )
    SELECT {kk} AS k, dcg_micro, idcg_micro,
           CASE WHEN idcg_micro > 0 THEN
             round(CAST(dcg_micro AS DOUBLE) / idcg_micro, 6) END AS ndcg
    FROM ndc_d, ndc_i
    """


# ---------------------------------------------------------------------------
# Tie-aware Spearman + Cohen's kappa (wave 108)
# ---------------------------------------------------------------------------


def spearman_activity_spend(events: DataFrame) -> DataFrame:
    """→ one row [n, rho] — tie-aware Spearman rank correlation between
    per-user event count and per-user total spend (Spearman 1904; the
    mid-rank tie convention), i.e. Pearson on average ranks: the
    monotone-association number that survives the heavy tails where raw
    Pearson drowns.

    The scale trick: NO global rank over users. Average ranks are a
    function of the VALUE only — mid-rank = (lo + hi)/2 from the value
    histogram's cumulative counts — so each side ranks at HISTOGRAM
    grain (bounded by distinct values) and users pick their rank up via
    a broadcast value-keyed join. Doubled ranks (lo + hi, exact BIGINT)
    avoid the half; Pearson is scale-invariant so the doubling cancels.
    All five moment sums are exact DECIMAL(38,0)/HUGEINT (a doubled rank
    squares to ~4n²); rho is one staged double, rounded 6, NULL when
    either side is constant (all tied — undefined, not 0).

    Scale shape: one user-grain aggregate, two histogram-grain
    cumulative windows, two broadcast joins back, a one-row reduce.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    u = events.groupBy("user_id").agg(
        F.count("*").alias("x"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")), F.lit(0)
        ).alias("y"),
    )

    def _ranks(col):
        h = u.groupBy(col).agg(F.count("*").alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return h.select(
            col,
            (2 * F.sum("c").over(w) - F.col("c") + 1).alias(f"r2{col}"),
        )

    j = u.join(F.broadcast(_ranks("x")), "x").join(
        F.broadcast(_ranks("y")), "y"
    )
    d38 = "decimal(38,0)"
    s = j.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("r2x").cast(d38)).alias("sa"),
        F.sum(F.col("r2y").cast(d38)).alias("sb"),
        F.sum(F.col("r2x").cast(d38) * F.col("r2y")).alias("sab"),
        F.sum(F.col("r2x").cast(d38) * F.col("r2x")).alias("saa"),
        F.sum(F.col("r2y").cast(d38) * F.col("r2y")).alias("sbb"),
    )
    return s.select(
        "n",
        F.expr(
            "CASE WHEN n >= 2"
            " AND CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa > 0"
            " AND CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb > 0"
            " THEN round((CAST(n AS DOUBLE) * sab"
            "             - CAST(sa AS DOUBLE) * sb)"
            " / sqrt((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)"
            "   * (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)), 6)"
            " END"
        ).alias("rho"),
    )


def spearman_activity_spend_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`spearman_activity_spend` (same doubled
    mid-ranks, HUGEINT moments)."""
    return f"""
    WITH spr_u AS (
      SELECT user_id, count(*) AS x,
             coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)), 0) AS y
      FROM {table} GROUP BY user_id
    ), spr_hx AS (
      SELECT x, 2 * sum(count(*)) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - count(*) + 1 AS r2x
      FROM spr_u GROUP BY x
    ), spr_hy AS (
      SELECT y, 2 * sum(count(*)) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - count(*) + 1 AS r2y
      FROM spr_u GROUP BY y
    ), spr_j AS (
      SELECT r2x, r2y FROM spr_u
      JOIN spr_hx USING (x) JOIN spr_hy USING (y)
    ), spr_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(r2x AS HUGEINT)) AS sa, sum(CAST(r2y AS HUGEINT)) AS sb,
             sum(CAST(r2x AS HUGEINT) * r2y) AS sab,
             sum(CAST(r2x AS HUGEINT) * r2x) AS saa,
             sum(CAST(r2y AS HUGEINT) * r2y) AS sbb
      FROM spr_j
    )
    SELECT n,
           CASE WHEN n >= 2
                AND CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa > 0
                AND CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb > 0
                THEN round((CAST(n AS DOUBLE) * sab
                            - CAST(sa AS DOUBLE) * sb)
                / sqrt((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
                  * (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)), 6)
           END AS rho
    FROM spr_s
    """


def ab_cohens_h(events: DataFrame) -> DataFrame:
    """→ [metric, p_control, p_treatment, h, magnitude] — Cohen's h
    effect size per metric under the md5 split: h = 2·asin(√p₁) −
    2·asin(√p₀) (Cohen 1988, the arcsine-stabilized difference of
    proportions), with the conventional |h| magnitude labels (< 0.2
    negligible, < 0.5 small, < 0.8 medium, else large). The
    "significant but is it BIG" companion to the z/FDR family — at
    scale everything is significant; h says whether anyone should care.

    Determinism: rates are exact integer ratios; h is ONE staged asin
    expression over them (same text both engines, libm asin agrees to
    the ulp on identical doubles — the same accepted contract as the
    erfc/exp stages), rounded 6; the magnitude label thresholds compare
    the ROUNDED |h| so the label can never disagree with the printed
    number. Empty arms report NULL.

    Scale shape: the A/B family's frames — distinct-user split, metric
    grain aggregate.
    """
    from linkgraph_spark.functions.hashing import md5_long

    users = events.select("user_id").distinct().select(
        "user_id",
        (md5_long(F.col("user_id").cast("string")) % 2).alias("variant"),
    )
    tot = users.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    ut = events.select("user_id", F.col("event_type").alias("metric")).distinct()
    per = (
        ut.join(users, "user_id")
        .groupBy("metric")
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("x0"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("x1"),
        )
        .crossJoin(tot)
    )
    h = (
        "round(2.0 * asin(sqrt(CAST(x1 AS DOUBLE) / n1))"
        " - 2.0 * asin(sqrt(CAST(x0 AS DOUBLE) / n0)), 6)"
    )
    return per.select(
        "metric",
        F.expr(
            "CASE WHEN n0 > 0 THEN round(CAST(x0 AS DOUBLE) / n0, 6) END"
        ).alias("p_control"),
        F.expr(
            "CASE WHEN n1 > 0 THEN round(CAST(x1 AS DOUBLE) / n1, 6) END"
        ).alias("p_treatment"),
        F.expr(f"CASE WHEN n0 > 0 AND n1 > 0 THEN {h} END").alias("h"),
        F.expr(
            f"CASE WHEN n0 > 0 AND n1 > 0 THEN"
            f" CASE WHEN abs({h}) < 0.2 THEN 'negligible'"
            f" WHEN abs({h}) < 0.5 THEN 'small'"
            f" WHEN abs({h}) < 0.8 THEN 'medium'"
            f" ELSE 'large' END END"
        ).alias("magnitude"),
    ).orderBy("metric")


def ab_cohens_h_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`ab_cohens_h` (same staged asin and
    rounded-|h| labels)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    hh = md5_long_sql("CAST(user_id AS VARCHAR)")
    h = (
        "round(2.0 * asin(sqrt(CAST(x1 AS DOUBLE) / n1))"
        " - 2.0 * asin(sqrt(CAST(x0 AS DOUBLE) / n0)), 6)"
    )
    return f"""
    WITH coh_u AS (
      SELECT user_id, ({hh}) % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM {table})
    ), coh_t AS (
      SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1
      FROM coh_u
    ), coh_x AS (
      SELECT metric,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS x0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS x1
      FROM (SELECT DISTINCT user_id, event_type AS metric FROM {table}) m
      JOIN coh_u u USING (user_id)
      GROUP BY metric
    )
    SELECT metric,
           CASE WHEN n0 > 0 THEN round(CAST(x0 AS DOUBLE) / n0, 6) END
             AS p_control,
           CASE WHEN n1 > 0 THEN round(CAST(x1 AS DOUBLE) / n1, 6) END
             AS p_treatment,
           CASE WHEN n0 > 0 AND n1 > 0 THEN {h} END AS h,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
             CASE WHEN abs({h}) < 0.2 THEN 'negligible'
                  WHEN abs({h}) < 0.5 THEN 'small'
                  WHEN abs({h}) < 0.8 THEN 'medium'
                  ELSE 'large' END END AS magnitude
    FROM coh_x CROSS JOIN coh_t
    ORDER BY metric
    """


def ab_odds_ratio(events: DataFrame) -> DataFrame:
    """→ [metric, x0, x1, odds_ratio, or_lo, or_hi] — the odds ratio per
    metric under the md5 split with the 95% Woolf log-OR interval
    (Woolf 1955: SE² = 1/a + 1/b + 1/c + 1/d): the epidemiology-side
    companion to Cohen's h — multiplicative where h is angular, and the
    quantity case-control analyses actually report.

    Determinism: all four cells are exact counts; OR and the CI are ONE
    staged ln/exp/sqrt chain over them (identical text in both engines),
    rounded 6. Any zero cell → NULL (the OR is undefined/infinite;
    reporting a Haldane-corrected number silently would change the
    estimand — callers can add 0.5 themselves if they want that).

    Scale shape: the A/B family's frames — distinct-user split, metric
    grain.
    """
    from linkgraph_spark.functions.hashing import md5_long

    users = events.select("user_id").distinct().select(
        "user_id",
        (md5_long(F.col("user_id").cast("string")) % 2).alias("variant"),
    )
    tot = users.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    ut = events.select("user_id", F.col("event_type").alias("metric")).distinct()
    per = (
        ut.join(users, "user_id")
        .groupBy("metric")
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("x0"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("x1"),
        )
        .crossJoin(tot)
    )
    ok = "x0 > 0 AND x1 > 0 AND x0 < n0 AND x1 < n1"
    lor = (
        "ln((CAST(x1 AS DOUBLE) * (n0 - x0))"
        " / (CAST(x0 AS DOUBLE) * (n1 - x1)))"
    )
    se = (
        "sqrt(1.0 / x1 + 1.0 / (n1 - x1) + 1.0 / x0 + 1.0 / (n0 - x0))"
    )
    return per.select(
        "metric",
        F.col("x0").cast("long").alias("x0"),
        F.col("x1").cast("long").alias("x1"),
        F.expr(
            f"CASE WHEN {ok} THEN round(exp({lor}), 6) END"
        ).alias("odds_ratio"),
        F.expr(
            f"CASE WHEN {ok} THEN round(exp({lor} - 1.96 * {se}), 6) END"
        ).alias("or_lo"),
        F.expr(
            f"CASE WHEN {ok} THEN round(exp({lor} + 1.96 * {se}), 6) END"
        ).alias("or_hi"),
    ).orderBy("metric")


def ab_odds_ratio_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`ab_odds_ratio` (same staged chain)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    ok = "x0 > 0 AND x1 > 0 AND x0 < n0 AND x1 < n1"
    lor = (
        "ln((CAST(x1 AS DOUBLE) * (n0 - x0))"
        " / (CAST(x0 AS DOUBLE) * (n1 - x1)))"
    )
    se = "sqrt(1.0 / x1 + 1.0 / (n1 - x1) + 1.0 / x0 + 1.0 / (n0 - x0))"
    return f"""
    WITH orr_u AS (
      SELECT user_id, ({h}) % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM {table})
    ), orr_t AS (
      SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1
      FROM orr_u
    ), orr_x AS (
      SELECT metric,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS x0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS x1
      FROM (SELECT DISTINCT user_id, event_type AS metric FROM {table}) m
      JOIN orr_u u USING (user_id)
      GROUP BY metric
    )
    SELECT metric, CAST(x0 AS BIGINT) AS x0, CAST(x1 AS BIGINT) AS x1,
           CASE WHEN {ok} THEN round(exp({lor}), 6) END AS odds_ratio,
           CASE WHEN {ok} THEN round(exp({lor} - 1.96 * {se}), 6) END
             AS or_lo,
           CASE WHEN {ok} THEN round(exp({lor} + 1.96 * {se}), 6) END
             AS or_hi
    FROM orr_x CROSS JOIN orr_t
    ORDER BY metric
    """


# --------------------------------------------------------------- wave 118
# Shared staged expressions for the Mann-Whitney z — identical literal
# strings on both engines so the double chain cannot diverge.  All inputs
# (n0, n1, nn, t3, u2) are exact integers; var is the tie-corrected
# normal-approximation variance of U (Mann & Whitney 1947; the tie
# correction per Lehmann, Nonparametrics 1975).
_MWU_VAR = (
    "(CAST(n0 AS DOUBLE) * n1 / 12.0)"
    " * ((CAST(nn AS DOUBLE) + 1.0)"
    "    - CAST(t3 AS DOUBLE)"
    "      / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))"
)
_MWU_OK = f"n0 >= 1 AND n1 >= 1 AND nn >= 2 AND {_MWU_VAR} > 0"
_MWU_Z = (
    f"(CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n0)"
    f" / (2.0 * sqrt({_MWU_VAR}))"
)


def ab_mannwhitney(events: DataFrame) -> DataFrame:
    """→ one row [n0, n1, u1, z, significant] — the two-sample
    Mann–Whitney U rank-sum test (Mann & Whitney 1947; Wilcoxon 1945)
    comparing per-user total spend between the two md5 experiment arms:
    the nonparametric A/B read that ranks users instead of trusting the
    heavy-tailed spend mean the t-test leans on.

    Exactness: per-user spend collapses to exact cents; doubled
    mid-ranks (lo + hi, exact BIGINT — the Spearman trick) come from the
    POOLED value histogram, so the rank sum of arm 1 is an exact
    DECIMAL(38,0)/HUGEINT cell-weighted sum, never a global row sort.
    2·U₁ = Σr2·c1 − n1·(n1+1) stays an exact integer (``u1`` shows the
    conventional half-grain value, exact in binary). The tie-corrected
    variance needs only n0, n1, N and Σ(t³−t) over histogram cells —
    all exact — and z is ONE shared literal double chain, rounded 6.
    NULL z when an arm is empty or every user ties (zero variance);
    ``significant`` compares the ROUNDED |z| to 1.959964 so the flag
    and the number cannot disagree.

    Scale shape: one user-grain aggregate, one histogram-grain
    cumulative window, a broadcast rank join back, a one-row reduce.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    from linkgraph_spark.functions.hashing import md5_long

    u = events.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")), F.lit(0)
        ).alias("y")
    ).select(
        "y", (md5_long(F.col("user_id").cast("string")) % 2).alias("variant")
    )
    h = u.groupBy("y").agg(
        F.count("*").alias("c"),
        F.sum("variant").alias("c1"),
    )
    w = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    r = h.select(
        "c",
        "c1",
        (2 * F.sum("c").over(w) - F.col("c") + 1).alias("r2"),
    )
    d38 = "decimal(38,0)"
    s = r.groupBy().agg(
        F.sum(F.col("c") - F.col("c1")).cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c").cast("long").alias("nn"),
        F.sum(
            F.col("c").cast(d38) * F.col("c") * F.col("c")
            - F.col("c").cast(d38)
        ).alias("t3"),
        F.sum(F.col("r2").cast(d38) * F.col("c1")).alias("r2s1"),
    )
    s = s.withColumn(
        "u2",
        F.col("r2s1")
        - F.col("n1").cast(d38) * (F.col("n1").cast(d38) + 1),
    )
    return s.select(
        "n0",
        "n1",
        F.round(F.col("u2").cast("double") / 2.0, 1).alias("u1"),
        F.expr(
            f"CASE WHEN {_MWU_OK} THEN round({_MWU_Z}, 6) END"
        ).alias("z"),
        F.expr(
            f"CASE WHEN {_MWU_OK}"
            f" THEN abs(round({_MWU_Z}, 6)) > 1.959964 END"
        ).alias("significant"),
    )


def ab_mannwhitney_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`ab_mannwhitney` (same doubled mid-ranks,
    HUGEINT moments, shared literal z chain)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    hh = md5_long_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH mwu_u AS (
      SELECT coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)), 0) AS y,
             ({hh}) % 2 AS variant
      FROM {table} GROUP BY user_id
    ), mwu_h AS (
      SELECT y, count(*) AS c, sum(variant) AS c1
      FROM mwu_u GROUP BY y
    ), mwu_r AS (
      SELECT c, c1,
             2 * sum(c) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - c + 1 AS r2
      FROM mwu_h
    ), mwu_s AS (
      SELECT CAST(sum(c - c1) AS BIGINT) AS n0,
             CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c) AS BIGINT) AS nn,
             sum(CAST(c AS HUGEINT) * c * c - CAST(c AS HUGEINT)) AS t3,
             sum(CAST(r2 AS HUGEINT) * c1) AS r2s1
      FROM mwu_r
    ), mwu_f AS (
      SELECT n0, n1, nn, t3,
             r2s1 - CAST(n1 AS HUGEINT) * (CAST(n1 AS HUGEINT) + 1) AS u2
      FROM mwu_s
    )
    SELECT n0, n1,
           round(CAST(u2 AS DOUBLE) / 2.0, 1) AS u1,
           CASE WHEN {_MWU_OK} THEN round({_MWU_Z}, 6) END AS z,
           CASE WHEN {_MWU_OK}
                THEN abs(round({_MWU_Z}, 6)) > 1.959964 END AS significant
    FROM mwu_f
    """


def mcnemar_click_purchase(
    events: DataFrame, type_a: str = "click", type_b: str = "purchase"
) -> DataFrame:
    """→ one row [n_pairs, n_both, only_a, only_b, chi2, significant] —
    McNemar's test (McNemar 1947) on the paired binary pair "did
    ``type_a`` that day" vs "did ``type_b`` that day", paired at
    (user, UTC day) grain: the within-subject test for marginal
    homogeneity that the two-proportion z-test gets wrong on paired
    observations. The day grain matters — at user grain a mature
    product saturates (every user has done everything once) and the
    test degenerates; per-day flags keep the discordant cells alive.
    chi² = (b−c)²/(b+c) over the discordant cells only (no continuity
    correction — documented estimand, the large-sample form).

    Exactness: the (user, day) flags and all four cells are exact
    BIGINTs from one aggregate; chi² is one double division, rounded 6,
    NULL when there are no discordant pairs (the statistic is
    undefined, not 0). ``significant`` compares the ROUNDED chi² to
    3.841459 (χ²₁ at 0.05) so the flag and the number cannot disagree.

    Scale shape: one (user, day)-grain aggregate, one one-row reduce —
    no joins, no windows.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    ta, tb = str(type_a), str(type_b)
    u = events.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.max(F.when(F.col("event_type") == ta, 1).otherwise(0)).alias("fa"),
        F.max(F.when(F.col("event_type") == tb, 1).otherwise(0)).alias("fb"),
    )
    s = u.groupBy().agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.col("fa") * F.col("fb")).cast("long").alias("n_both"),
        F.sum(F.col("fa") * (1 - F.col("fb"))).cast("long").alias("only_a"),
        F.sum((1 - F.col("fa")) * F.col("fb")).cast("long").alias("only_b"),
    )
    chi2 = (
        "power(CAST(only_a AS DOUBLE) - only_b, 2)"
        " / (CAST(only_a AS DOUBLE) + only_b)"
    )
    return s.select(
        "n_pairs",
        "n_both",
        "only_a",
        "only_b",
        F.expr(
            f"CASE WHEN only_a + only_b > 0 THEN round({chi2}, 6) END"
        ).alias("chi2"),
        F.expr(
            f"CASE WHEN only_a + only_b > 0"
            f" THEN round({chi2}, 6) > 3.841459 END"
        ).alias("significant"),
    )


def mcnemar_click_purchase_sql(
    type_a: str = "click", type_b: str = "purchase", table: str = "events"
) -> str:
    """DuckDB oracle for :func:`mcnemar_click_purchase` (same exact
    (user, day) cells, same rounded-chi² flag)."""
    a = type_a.replace("'", "''")
    b = type_b.replace("'", "''")
    chi2 = (
        "power(CAST(only_a AS DOUBLE) - only_b, 2)"
        " / (CAST(only_a AS DOUBLE) + only_b)"
    )
    return f"""
    WITH mcn_u AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             max(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END) AS fa,
             max(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END) AS fb
      FROM {table} GROUP BY user_id, CAST(ts AS DATE)
    ), mcn_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(fa * fb) AS BIGINT) AS n_both,
             CAST(sum(fa * (1 - fb)) AS BIGINT) AS only_a,
             CAST(sum((1 - fa) * fb) AS BIGINT) AS only_b
      FROM mcn_u
    )
    SELECT n_pairs, n_both, only_a, only_b,
           CASE WHEN only_a + only_b > 0 THEN round({chi2}, 6) END AS chi2,
           CASE WHEN only_a + only_b > 0
                THEN round({chi2}, 6) > 3.841459 END AS significant
    FROM mcn_s
    """


# --------------------------------------------------------------- wave 120
def logrank_ab(events: DataFrame) -> DataFrame:
    """→ one row [n_subjects, n1, o1, e1, chi2, significant] — the
    log-rank test (Mantel 1966; Peto & Peto 1972) comparing signup→
    first-purchase survival between the two md5 experiment arms: the
    censoring-correct A/B read on time-to-convert that a naive
    "converted within X days" split gets wrong whenever the horizon
    clips one arm harder than the other.

    Subjects follow the Kaplan-Meier construction (events.py
    `kaplan_meier_conversion`): enter at first ``signup``, event at
    first ``purchase`` strictly after it, censored at the stream's
    last instant; durations floor to whole days. At each day with ≥1
    event, O₁ adds the arm-1 events (exact BIGINT) and the
    hypergeometric moments add E₁ₜ = d·n₁/n and
    Vₜ = d·n₁·(n−n₁)·(n−d)/(n²·(n−1)) — each a per-day double
    MICRO-QUANTIZED (round ×1e6 → DECIMAL(38,0)) before the sum so the
    totals are order-invariant; days with n ≤ 1 contribute nothing
    (their variance is undefined and their E equals their O). chi² is
    one shared staged double over (o1, e1q, vq), rounded 6, NULL when
    the variance sum is 0 (no comparable risk sets); ``significant``
    compares the ROUNDED chi² to 3.841459 so flag and number cannot
    disagree.

    Scale shape: two user-grain aggregates and a global max build the
    subject frame; everything after collapses to ≤ |days| rows and the
    cumulative windows run at that bounded grain.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    from linkgraph_spark.functions.hashing import md5_long

    signups = events.where(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("_s_ts"))
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("_p_ts")
    )
    first_p = (
        signups.join(purchases, "user_id", "left")
        .where(F.col("_p_ts").isNull() | (F.col("_p_ts") > F.col("_s_ts")))
        .groupBy("user_id", "_s_ts")
        .agg(F.min("_p_ts").alias("_fp_ts"))
    )
    subjects = signups.join(
        first_p.select("user_id", "_fp_ts"), "user_id", "left"
    )
    end = events.agg(F.max("ts").alias("_end"))
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    dur = subjects.crossJoin(F.broadcast(end)).select(
        (md5_long(F.col("user_id").cast("string")) % 2).alias("variant"),
        F.col("_fp_ts").isNotNull().alias("_event"),
        F.floor(
            (F.coalesce(us("_fp_ts"), us("_end")) - us("_s_ts"))
            / F.lit(86_400_000_000)
        ).alias("_day"),
    )
    per_day = dur.groupBy("_day").agg(
        F.sum(F.col("_event").cast("long")).alias("d"),
        F.sum((F.col("_event").cast("long")) * F.col("variant")).alias("d1"),
        F.count("*").alias("leave"),
        F.sum("variant").alias("leave1"),
    )
    tot = per_day.agg(
        F.sum("leave").cast("long").alias("nn"),
        F.sum("leave1").cast("long").alias("nn1"),
    )
    w = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_day.crossJoin(F.broadcast(tot)).select(
        "d",
        "d1",
        (
            F.col("nn") - F.coalesce(F.sum("leave").over(w), F.lit(0))
        ).alias("n"),
        (
            F.col("nn1") - F.coalesce(F.sum("leave1").over(w), F.lit(0))
        ).alias("n1"),
        "nn",
        "nn1",
    )
    d38 = "decimal(38,0)"
    e1 = "CAST(d AS DOUBLE) * n1 / n"
    v = (
        "CAST(d AS DOUBLE) * n1 * (n - n1) * (n - d)"
        " / (CAST(n AS DOUBLE) * n * (n - 1))"
    )
    s = risk.where((F.col("d") > 0) & (F.col("n") > 1)).groupBy().agg(
        F.max("nn").cast("long").alias("n_subjects"),
        F.max("nn1").cast("long").alias("arm1"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum(F.expr(f"CAST(round(({e1}) * 1e6, 0) AS {d38})")).alias("e1q"),
        F.sum(F.expr(f"CAST(round(({v}) * 1e6, 0) AS {d38})")).alias("vq"),
    )
    chi2 = (
        "power(CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1e6, 2)"
        " / (CAST(vq AS DOUBLE) / 1e6)"
    )
    return s.select(
        "n_subjects",
        F.col("arm1").alias("n1"),
        "o1",
        F.round(F.col("e1q").cast("double") / 1e6, 6).alias("e1"),
        F.expr(f"CASE WHEN vq > 0 THEN round({chi2}, 6) END").alias("chi2"),
        F.expr(
            f"CASE WHEN vq > 0 THEN round({chi2}, 6) > 3.841459 END"
        ).alias("significant"),
    )


def logrank_ab_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`logrank_ab` (same subject construction,
    same micro-quantized hypergeometric terms, shared chi² chain)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    e1 = "CAST(d AS DOUBLE) * n1 / n"
    v = (
        "CAST(d AS DOUBLE) * n1 * (n - n1) * (n - d)"
        " / (CAST(n AS DOUBLE) * n * (n - 1))"
    )
    chi2 = (
        "power(CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1e6, 2)"
        " / (CAST(vq AS DOUBLE) / 1e6)"
    )
    return f"""
    WITH lr_s AS (
      SELECT user_id, min(ts) AS s_ts FROM {table}
      WHERE event_type = 'signup' GROUP BY user_id
    ), lr_fp AS (
      SELECT s.user_id, s.s_ts, min(p.ts) AS fp_ts
      FROM lr_s s LEFT JOIN {table} p
        ON p.user_id = s.user_id AND p.event_type = 'purchase'
       AND p.ts > s.s_ts
      GROUP BY s.user_id, s.s_ts
    ), lr_dur AS (
      SELECT ({h}) % 2 AS variant,
             fp_ts IS NOT NULL AS ev,
             CAST(floor((epoch(coalesce(fp_ts, (SELECT max(ts) FROM {table})))
                   - epoch(s_ts)) / 86400.0) AS BIGINT) AS day
      FROM lr_fp
    ), lr_pd AS (
      SELECT day, sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
             sum(CASE WHEN ev THEN variant ELSE 0 END) AS d1,
             count(*) AS leave, sum(variant) AS leave1
      FROM lr_dur GROUP BY day
    ), lr_t AS (
      SELECT CAST(sum(leave) AS BIGINT) AS nn,
             CAST(sum(leave1) AS BIGINT) AS nn1
      FROM lr_pd
    ), lr_r AS (
      SELECT d, d1,
             nn - coalesce(sum(leave) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
             nn1 - coalesce(sum(leave1) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
             nn, nn1
      FROM lr_pd CROSS JOIN lr_t
    ), lr_agg AS (
      SELECT CAST(max(nn) AS BIGINT) AS n_subjects,
             CAST(max(nn1) AS BIGINT) AS arm1,
             CAST(sum(d1) AS BIGINT) AS o1,
             sum(CAST(round(({e1}) * 1e6, 0) AS HUGEINT)) AS e1q,
             sum(CAST(round(({v}) * 1e6, 0) AS HUGEINT)) AS vq
      FROM lr_r WHERE d > 0 AND n > 1
    )
    SELECT n_subjects, arm1 AS n1, o1,
           round(CAST(e1q AS DOUBLE) / 1e6, 6) AS e1,
           CASE WHEN vq > 0 THEN round({chi2}, 6) END AS chi2,
           CASE WHEN vq > 0 THEN round({chi2}, 6) > 3.841459 END
             AS significant
    FROM lr_agg
    """


# --------------------------------------------------------------- wave 121
def cochran_armitage_trend(events: DataFrame) -> DataFrame:
    """→ one row [n_units, n_purchase, z, significant] — the
    Cochran–Armitage trend test (Cochran 1954; Armitage 1955) for a
    monotone dose-response between a user-day's NON-purchase activity
    tier (0 / 1 / 2-3 / 4+ other events, ordinal scores 0..3) and
    whether that user-day purchased: the ordered-exposure test a
    pairwise chi² wastes power on. Exposure deliberately EXCLUDES
    purchase events — counting the outcome inside the dose would make
    the trend trivially positive.

    Exactness: units, per-tier counts and successes are exact BIGINTs
    from one (user, day)-grain aggregate; the closed form needs only
    five exact integer moments (N, R, Σs·n, Σs·r, Σs²·n) — the
    numerator N·Σsr − R·Σsn and the spread N·Σs²n − (Σsn)² stay exact
    DECIMAL(38,0)/HUGEINT (squares of SUMS, taken before any double),
    and z = tn·√N / √(R·(N−R)·m) is ONE shared literal staged chain,
    rounded 6. NULL when every unit purchased, none did, or all units
    share one tier (zero spread); ``significant`` compares the ROUNDED
    |z| to 1.959964 so flag and number cannot disagree.

    Scale shape: one (user, day)-grain aggregate, one 4-row tier
    aggregate, a one-row reduce — no joins, no windows.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    u = events.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.sum(
            F.when(F.col("event_type") != "purchase", 1).otherwise(0)
        ).alias("a"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    tier = (
        "CASE WHEN a <= 0 THEN 0 WHEN a = 1 THEN 1"
        " WHEN a <= 3 THEN 2 ELSE 3 END"
    )
    t = u.groupBy(F.expr(tier).alias("s")).agg(
        F.count("*").alias("nk"), F.sum("y").alias("rk")
    )
    d38 = "decimal(38,0)"
    m = t.groupBy().agg(
        F.sum("nk").cast("long").alias("nn"),
        F.sum("rk").cast("long").alias("rr"),
        F.sum(F.col("s").cast(d38) * F.col("nk")).alias("ssn"),
        F.sum(F.col("s").cast(d38) * F.col("rk")).alias("ssr"),
        F.sum(F.col("s").cast(d38) * F.col("s") * F.col("nk")).alias("sns2"),
    )
    m = m.withColumn(
        "tn",
        F.col("nn").cast(d38) * F.col("ssr")
        - F.col("rr").cast(d38) * F.col("ssn"),
    ).withColumn(
        "mm",
        F.col("nn").cast(d38) * F.col("sns2") - F.col("ssn") * F.col("ssn"),
    )
    ok = "rr > 0 AND rr < nn AND mm > 0"
    z = (
        "CAST(tn AS DOUBLE) * sqrt(CAST(nn AS DOUBLE))"
        " / sqrt(CAST(rr AS DOUBLE) * (nn - rr) * CAST(mm AS DOUBLE))"
    )
    return m.select(
        F.col("nn").alias("n_units"),
        F.col("rr").alias("n_purchase"),
        F.expr(f"CASE WHEN {ok} THEN round({z}, 6) END").alias("z"),
        F.expr(
            f"CASE WHEN {ok} THEN abs(round({z}, 6)) > 1.959964 END"
        ).alias("significant"),
    )


def cochran_armitage_trend_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`cochran_armitage_trend` (same tier
    scores, same exact moments, shared staged z)."""
    tier = (
        "CASE WHEN a <= 0 THEN 0 WHEN a = 1 THEN 1"
        " WHEN a <= 3 THEN 2 ELSE 3 END"
    )
    ok = "rr > 0 AND rr < nn AND mm > 0"
    z = (
        "CAST(tn AS DOUBLE) * sqrt(CAST(nn AS DOUBLE))"
        " / sqrt(CAST(rr AS DOUBLE) * (nn - rr) * CAST(mm AS DOUBLE))"
    )
    return f"""
    WITH cat_u AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM {table} GROUP BY user_id, CAST(ts AS DATE)
    ), cat_t AS (
      SELECT ({tier}) AS s, count(*) AS nk, sum(y) AS rk
      FROM cat_u GROUP BY 1
    ), cat_m AS (
      SELECT CAST(sum(nk) AS BIGINT) AS nn, CAST(sum(rk) AS BIGINT) AS rr,
             sum(CAST(s AS HUGEINT) * nk) AS ssn,
             sum(CAST(s AS HUGEINT) * rk) AS ssr,
             sum(CAST(s AS HUGEINT) * s * nk) AS sns2
      FROM cat_t
    ), cat_f AS (
      SELECT nn, rr,
             CAST(nn AS HUGEINT) * ssr - CAST(rr AS HUGEINT) * ssn AS tn,
             CAST(nn AS HUGEINT) * sns2 - ssn * ssn AS mm
      FROM cat_m
    )
    SELECT nn AS n_units, rr AS n_purchase,
           CASE WHEN {ok} THEN round({z}, 6) END AS z,
           CASE WHEN {ok} THEN abs(round({z}, 6)) > 1.959964 END
             AS significant
    FROM cat_f
    """


# --------------------------------------------------------------- wave 127
def cronbach_alpha_types(events: DataFrame) -> DataFrame:
    """→ one row [n_users, k_items, alpha] — Cronbach's alpha
    (Cronbach 1951) treating each event type as an "item" and each
    user's per-type event count as the item score: the internal-
    consistency read on an engagement composite — alpha near 1 says
    the per-type counts co-vary enough to sum into one engagement
    score, alpha near 0 says summing them hides independent behaviors.

    Exactness: every item variance and the total-score variance use
    the n-scaled identity n·Σx² − (Σx)² over exact BIGINT counts
    (users missing an item contribute exact zeros, which the moment
    sums absorb without densification); the variance RATIO is an exact
    DECIMAL(38,0)/HUGEINT quotient staged ONCE, so alpha = k/(k−1) ·
    (1 − Σvarᵢ/var_tot) is one shared literal chain, rounded 6
    (population variances — the n² scale cancels in the ratio). NULL
    when k < 2 or the total variance is 0 (every user has the same
    event mix).

    Scale shape: one (user, type)-grain aggregate, one type-grain
    reduce (bounded items), one user-grain total aggregate, a one-row
    combine — no windows, no joins over raw events.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    ut = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("x")
    )
    # per-item moments: zeros from absent (user, type) cells add nothing
    item = ut.groupBy("event_type").agg(
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
    )
    tot = events.groupBy("user_id").agg(F.count("*").alias("t"))
    base = tot.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("t").cast(d38)).alias("st"),
        F.sum(F.col("t").cast(d38) * F.col("t")).alias("stt"),
    )
    isum = item.crossJoin(F.broadcast(base)).select(
        (
            F.col("n").cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx")
        ).alias("vi")
    ).groupBy().agg(
        F.count("*").cast("long").alias("k"),
        F.coalesce(F.sum("vi"), F.lit(0).cast(d38)).alias("vsum"),
    )
    out = base.crossJoin(isum).withColumn(
        "vtot",
        F.col("n").cast(d38) * F.col("stt") - F.col("st") * F.col("st"),
    )
    alpha = (
        "(CAST(k AS DOUBLE) / (k - 1.0))"
        " * (1.0 - CAST(vsum AS DOUBLE) / CAST(vtot AS DOUBLE))"
    )
    return out.select(
        F.col("n").alias("n_users"),
        F.col("k").alias("k_items"),
        F.expr(
            f"CASE WHEN k >= 2 AND vtot > 0 THEN round({alpha}, 6) END"
        ).alias("alpha"),
    )


def cronbach_alpha_types_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`cronbach_alpha_types` (same n-scaled
    exact variances, shared staged alpha)."""
    alpha = (
        "(CAST(k AS DOUBLE) / (k - 1.0))"
        " * (1.0 - CAST(vsum AS DOUBLE) / CAST(vtot AS DOUBLE))"
    )
    return f"""
    WITH ca_ut AS (
      SELECT user_id, event_type, count(*) AS x
      FROM {table} GROUP BY 1, 2
    ), ca_base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(t AS HUGEINT)) AS st,
             sum(CAST(t AS HUGEINT) * t) AS stt
      FROM (SELECT user_id, count(*) AS t FROM {table} GROUP BY user_id)
    ), ca_item AS (
      SELECT event_type, sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(x AS HUGEINT) * x) AS sxx
      FROM ca_ut GROUP BY event_type
    ), ca_is AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             coalesce(sum(CAST(n AS HUGEINT) * sxx - sx * sx), 0) AS vsum
      FROM ca_item CROSS JOIN ca_base
    ), ca_f AS (
      SELECT n, k, vsum,
             CAST(n AS HUGEINT) * stt - st * st AS vtot
      FROM ca_base CROSS JOIN ca_is
    )
    SELECT n AS n_users, k AS k_items,
           CASE WHEN k >= 2 AND vtot > 0 THEN round({alpha}, 6) END
             AS alpha
    FROM ca_f
    """


# chi-square 0.05 criticals for df 1..9 (Friedman df = k_items − 1)
_CHI2_CRIT_05_9 = (
    3.841459, 5.991465, 7.814728, 9.487729, 11.070498,
    12.591587, 14.067140, 15.507313, 16.918978,
)


def friedman_event_types(events: DataFrame) -> DataFrame:
    """→ one row [n_users, k_types, chi2, w, significant] — the
    Friedman test (Friedman 1937; Conover's tie-corrected form) on
    per-user event-type counts: do users systematically rank the event
    types the same way (views > clicks > …), judged from WITHIN-user
    ranks so heavy users can't dominate. ``w`` is Kendall's W
    concordance = χ²/(n(k−1)) — the 0-to-1 agreement strength.

    Exactness: each user's type counts densify over the type dimension
    (a type the user never fired ranks at the bottom as an exact
    zero); within-user mid-ranks use the doubled-rank trick (lo+hi,
    exact BIGINT) at (user, count) cell grain, so the Conover
    statistic T = (k−1)·Σⱼ(R2ⱼ − n(k+1))² / (A2′ − C′) is built from
    EXACT DECIMAL(38,0)/HUGEINT sums (the doubling cancels: all three
    pieces scale by 4). One staged division, rounded 6. NULL when
    every user ties every type (A2′ = C′) or k < 2; ``significant``
    compares the ROUNDED χ² to the exact chi² 0.05 literal for
    df = k−1 (NULL when df > 9 — no critical shipped).

    Scale shape: one (user, type)-grain aggregate, densified by a
    bounded type-dim cross join, windows PARTITIONED BY USER (never
    global), one type-grain reduce, a one-row combine.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    ut = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("x")
    )
    types = events.select("event_type").distinct()
    users = events.select("user_id").distinct()
    lattice = (
        users.crossJoin(F.broadcast(types))
        .join(ut, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.coalesce("x", F.lit(0)).alias("x"),
        )
    )
    cell = lattice.groupBy("user_id", "x").agg(F.count("*").alias("c"))
    w = Window.partitionBy("user_id").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranks = cell.select(
        "user_id",
        "x",
        (2 * F.sum("c").over(w) - F.col("c") + 1).alias("r2"),
    )
    ranked = lattice.join(ranks, ["user_id", "x"])
    crit = events.sparkSession.createDataFrame(
        [(i + 1, float(v)) for i, v in enumerate(_CHI2_CRIT_05_9)],
        "df int, crit double",
    )
    per_type = ranked.groupBy("event_type").agg(
        F.sum(F.col("r2").cast(d38)).alias("r2j")
    )
    base = ranked.groupBy().agg(
        F.countDistinct("user_id").cast("long").alias("n"),
        F.countDistinct("event_type").cast("long").alias("k"),
        F.sum(F.col("r2").cast(d38) * F.col("r2")).alias("a2p"),
    )
    dev = per_type.crossJoin(F.broadcast(base)).select(
        (
            (F.col("r2j") - F.col("n").cast(d38) * (F.col("k") + 1))
            * (F.col("r2j") - F.col("n").cast(d38) * (F.col("k") + 1))
        ).alias("d2")
    ).groupBy().agg(F.coalesce(F.sum("d2"), F.lit(0).cast(d38)).alias("sd2"))
    m = base.crossJoin(dev).withColumn(
        "cp",
        F.col("n").cast(d38) * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1),
    )
    chi2 = (
        "((CAST(k AS DOUBLE) - 1.0) * CAST(sd2 AS DOUBLE))"
        " / (CAST(a2p AS DOUBLE) - CAST(cp AS DOUBLE))"
    )
    ok = "k >= 2 AND a2p > cp"
    j = m.crossJoin(F.broadcast(crit)).where(
        F.col("df") == F.col("k") - 1
    )
    out = m.join(
        j.select(F.col("crit").alias("critv")), how="left_outer",
        on=F.lit(True),
    )
    return out.select(
        F.col("n").alias("n_users"),
        F.col("k").alias("k_types"),
        F.expr(f"CASE WHEN {ok} THEN round({chi2}, 6) END").alias("chi2"),
        F.expr(
            f"CASE WHEN {ok} AND n > 0 AND k >= 2 THEN"
            f" round(({chi2}) / (CAST(n AS DOUBLE) * (k - 1.0)), 6) END"
        ).alias("w"),
        F.expr(
            f"CASE WHEN {ok} AND critv IS NOT NULL THEN"
            f" round({chi2}, 6) > critv END"
        ).alias("significant"),
    )


def friedman_event_types_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`friedman_event_types` (same densified
    lattice, doubled mid-ranks, Conover statistic)."""
    crit_rows = ", ".join(
        f"({i + 1}, {v!r})" for i, v in enumerate(_CHI2_CRIT_05_9)
    )
    chi2 = (
        "((CAST(k AS DOUBLE) - 1.0) * CAST(sd2 AS DOUBLE))"
        " / (CAST(a2p AS DOUBLE) - CAST(cp AS DOUBLE))"
    )
    ok = "k >= 2 AND a2p > cp"
    return f"""
    WITH fr_ut AS (
      SELECT user_id, event_type, count(*) AS x
      FROM {table} GROUP BY 1, 2
    ), fr_lat AS (
      SELECT u.user_id, t.event_type, coalesce(s.x, 0) AS x
      FROM (SELECT DISTINCT user_id FROM {table}) u
      CROSS JOIN (SELECT DISTINCT event_type FROM {table}) t
      LEFT JOIN fr_ut s
        ON s.user_id = u.user_id AND s.event_type = t.event_type
    ), fr_cell AS (
      SELECT user_id, x, count(*) AS c FROM fr_lat GROUP BY 1, 2
    ), fr_rank AS (
      SELECT user_id, x,
             2 * sum(c) OVER (PARTITION BY user_id ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - c + 1 AS r2
      FROM fr_cell
    ), fr_rk AS (
      SELECT l.user_id, l.event_type, r.r2
      FROM fr_lat l JOIN fr_rank r
        ON r.user_id = l.user_id AND r.x = l.x
    ), fr_base AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n,
             CAST(count(DISTINCT event_type) AS BIGINT) AS k,
             sum(CAST(r2 AS HUGEINT) * r2) AS a2p
      FROM fr_rk
    ), fr_pt AS (
      SELECT event_type, sum(CAST(r2 AS HUGEINT)) AS r2j
      FROM fr_rk GROUP BY event_type
    ), fr_dev AS (
      SELECT coalesce(sum((r2j - CAST(n AS HUGEINT) * (k + 1))
                        * (r2j - CAST(n AS HUGEINT) * (k + 1))), 0) AS sd2
      FROM fr_pt CROSS JOIN fr_base
    ), fr_m AS (
      SELECT n, k, a2p, sd2,
             CAST(n AS HUGEINT) * k * (k + 1) * (k + 1) AS cp
      FROM fr_base CROSS JOIN fr_dev
    ), fr_crit(df, crit) AS (VALUES {crit_rows})
    SELECT n AS n_users, k AS k_types,
           CASE WHEN {ok} THEN round({chi2}, 6) END AS chi2,
           CASE WHEN {ok} AND n > 0 AND k >= 2 THEN
             round(({chi2}) / (CAST(n AS DOUBLE) * (k - 1.0)), 6) END AS w,
           CASE WHEN {ok} AND c.crit IS NOT NULL THEN
             round({chi2}, 6) > c.crit END AS significant
    FROM fr_m LEFT JOIN fr_crit c ON c.df = fr_m.k - 1
    """


# --------------------------------------------------------------- wave 130
def ab_welch_t(events: DataFrame) -> DataFrame:
    """→ one row [n0, n1, mean0, mean1, t, df, significant] — Welch's
    unequal-variance t-test (Welch 1947) on per-user total spend
    between the two md5 arms: the parametric location read next to
    :func:`ab_mannwhitney`'s rank version — when the two disagree, the
    spend distribution is telling you its tails matter.

    Exactness: per-arm n, Σx and Σx² are exact BIGINT/DECIMAL(38,0)
    cents from one user-grain aggregate; sample variances, t and the
    Welch–Satterthwaite df are ONE shared literal staged chain over
    those six exact integers, rounded 6. NULL when either arm has
    n < 2 or both variances are 0; ``significant`` compares the
    ROUNDED |t| to 1.959964 (the large-sample normal threshold —
    documented estimand; at warehouse n the t and normal quantiles
    agree to 4+ dp).

    Scale shape: one user-grain aggregate, one 2-row reduce, a one-row
    combine — no joins, no windows.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from linkgraph_spark.functions.hashing import md5_long

    d38 = "decimal(38,0)"
    u = events.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")), F.lit(0)
        ).alias("y")
    ).select(
        "y", (md5_long(F.col("user_id").cast("string")) % 2).alias("v")
    )
    s = u.groupBy().agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("v") == 0, F.col("y")).otherwise(0).cast(d38)).alias("a0"),
        F.sum(F.when(F.col("v") == 1, F.col("y")).otherwise(0).cast(d38)).alias("a1"),
        F.sum(
            F.when(F.col("v") == 0, F.col("y")).otherwise(0).cast(d38)
            * F.when(F.col("v") == 0, F.col("y")).otherwise(0)
        ).alias("b0"),
        F.sum(
            F.when(F.col("v") == 1, F.col("y")).otherwise(0).cast(d38)
            * F.when(F.col("v") == 1, F.col("y")).otherwise(0)
        ).alias("b1"),
    )
    v0 = (
        "((CAST(n0 AS DOUBLE) * CAST(b0 AS DOUBLE)"
        " - CAST(a0 AS DOUBLE) * CAST(a0 AS DOUBLE))"
        " / (CAST(n0 AS DOUBLE) * (n0 - 1.0)))"
    )
    v1 = (
        "((CAST(n1 AS DOUBLE) * CAST(b1 AS DOUBLE)"
        " - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE))"
        " / (CAST(n1 AS DOUBLE) * (n1 - 1.0)))"
    )
    se2 = f"({v1} / n1 + {v0} / n0)"
    ok = f"n0 >= 2 AND n1 >= 2 AND {se2} > 0"
    t = (
        f"(CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0)"
        f" / sqrt({se2})"
    )
    df = (
        f"({se2} * {se2})"
        f" / (({v1} / n1) * ({v1} / n1) / (n1 - 1.0)"
        f"    + ({v0} / n0) * ({v0} / n0) / (n0 - 1.0))"
    )
    return s.select(
        "n0",
        "n1",
        F.expr(
            "CASE WHEN n0 > 0 THEN"
            " round(CAST(a0 AS DOUBLE) / n0 / 100.0, 6) END"
        ).alias("mean0"),
        F.expr(
            "CASE WHEN n1 > 0 THEN"
            " round(CAST(a1 AS DOUBLE) / n1 / 100.0, 6) END"
        ).alias("mean1"),
        F.expr(f"CASE WHEN {ok} THEN round({t}, 6) END").alias("t"),
        F.expr(f"CASE WHEN {ok} THEN round({df}, 6) END").alias("df"),
        F.expr(
            f"CASE WHEN {ok} THEN abs(round({t}, 6)) > 1.959964 END"
        ).alias("significant"),
    )


def ab_welch_t_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`ab_welch_t` (same exact moments, shared
    staged t/df chain)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    v0 = (
        "((CAST(n0 AS DOUBLE) * CAST(b0 AS DOUBLE)"
        " - CAST(a0 AS DOUBLE) * CAST(a0 AS DOUBLE))"
        " / (CAST(n0 AS DOUBLE) * (n0 - 1.0)))"
    )
    v1 = (
        "((CAST(n1 AS DOUBLE) * CAST(b1 AS DOUBLE)"
        " - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE))"
        " / (CAST(n1 AS DOUBLE) * (n1 - 1.0)))"
    )
    se2 = f"({v1} / n1 + {v0} / n0)"
    ok = f"n0 >= 2 AND n1 >= 2 AND {se2} > 0"
    t = (
        f"(CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0)"
        f" / sqrt({se2})"
    )
    df = (
        f"({se2} * {se2})"
        f" / (({v1} / n1) * ({v1} / n1) / (n1 - 1.0)"
        f"    + ({v0} / n0) * ({v0} / n0) / (n0 - 1.0))"
    )
    return f"""
    WITH wt_u AS (
      SELECT coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)), 0) AS y,
             ({h}) % 2 AS v
      FROM {table} GROUP BY user_id
    ), wt_s AS (
      SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             sum(CASE WHEN v = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS a0,
             sum(CASE WHEN v = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS a1,
             sum(CASE WHEN v = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
               AS b0,
             sum(CASE WHEN v = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
               AS b1
      FROM wt_u
    )
    SELECT n0, n1,
           CASE WHEN n0 > 0 THEN
             round(CAST(a0 AS DOUBLE) / n0 / 100.0, 6) END AS mean0,
           CASE WHEN n1 > 0 THEN
             round(CAST(a1 AS DOUBLE) / n1 / 100.0, 6) END AS mean1,
           CASE WHEN {ok} THEN round({t}, 6) END AS t,
           CASE WHEN {ok} THEN round({df}, 6) END AS df,
           CASE WHEN {ok} THEN abs(round({t}, 6)) > 1.959964 END
             AS significant
    FROM wt_s
    """


def ab_levene_bf(events: DataFrame) -> DataFrame:
    """→ one row [n0, n1, f_stat, significant] — the Brown–Forsythe
    variant of Levene's test (Brown & Forsythe 1974) on per-user spend
    between the md5 arms: are the two arms' spend SPREADS equal —
    the variance-homogeneity check that tells you whether a treatment
    changed behavior dispersion even when the means agree (and whether
    a pooled-variance test was ever valid).

    Exactness: deviations use the DOUBLED-grain trick — the group
    median of integer cents interpolates to a half, so
    D = |2x − 2·med| is an exact BIGINT per user; the one-way ANOVA F
    over the two groups then needs only six exact numbers (n, ΣD, ΣD²
    per arm) and is ONE shared literal staged chain (the doubling
    cancels in the F ratio), rounded 6. NULL when either arm has
    n < 2 or the within-group spread is 0; ``significant`` compares
    the ROUNDED F to 3.841459 (F(1,∞) at 0.05 — documented
    large-sample estimand).

    Scale shape: one user-grain aggregate, one 2-row percentile
    aggregate (sort inside the aggregate per arm), a broadcast join
    back, a one-row reduce.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from linkgraph_spark.functions.hashing import md5_long

    d38 = "decimal(38,0)"
    u = events.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")), F.lit(0)
        ).alias("y")
    ).select(
        "y", (md5_long(F.col("user_id").cast("string")) % 2).alias("v")
    )
    med = u.groupBy("v").agg(
        F.expr("CAST(round(2.0 * percentile(y, 0.5D), 0) AS BIGINT)").alias(
            "m2"
        )
    )
    dev = u.join(F.broadcast(med), "v").select(
        "v", F.abs(2 * F.col("y") - F.col("m2")).alias("d")
    )
    s = dev.groupBy().agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("v") == 0, F.col("d")).otherwise(0).cast(d38)).alias("a0"),
        F.sum(F.when(F.col("v") == 1, F.col("d")).otherwise(0).cast(d38)).alias("a1"),
        F.sum(
            F.when(F.col("v") == 0, F.col("d")).otherwise(0).cast(d38)
            * F.when(F.col("v") == 0, F.col("d")).otherwise(0)
        ).alias("b0"),
        F.sum(
            F.when(F.col("v") == 1, F.col("d")).otherwise(0).cast(d38)
            * F.when(F.col("v") == 1, F.col("d")).otherwise(0)
        ).alias("b1"),
    )
    ssb = (
        "(CAST(a0 AS DOUBLE) * a0 / n0 + CAST(a1 AS DOUBLE) * a1 / n1"
        " - (CAST(a0 AS DOUBLE) + a1) * (CAST(a0 AS DOUBLE) + a1)"
        "   / (n0 + n1))"
    )
    ssw = (
        "(CAST(b0 AS DOUBLE) - CAST(a0 AS DOUBLE) * a0 / n0"
        " + CAST(b1 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1)"
    )
    ok = f"n0 >= 2 AND n1 >= 2 AND {ssw} > 0"
    fstat = f"(CAST(n0 + n1 AS DOUBLE) - 2.0) * {ssb} / {ssw}"
    return s.select(
        "n0",
        "n1",
        F.expr(f"CASE WHEN {ok} THEN round({fstat}, 6) END").alias(
            "f_stat"
        ),
        F.expr(
            f"CASE WHEN {ok} THEN round({fstat}, 6) > 3.841459 END"
        ).alias("significant"),
    )


def ab_levene_bf_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`ab_levene_bf` (same doubled-grain
    deviations, shared staged F)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    ssb = (
        "(CAST(a0 AS DOUBLE) * a0 / n0 + CAST(a1 AS DOUBLE) * a1 / n1"
        " - (CAST(a0 AS DOUBLE) + a1) * (CAST(a0 AS DOUBLE) + a1)"
        "   / (n0 + n1))"
    )
    ssw = (
        "(CAST(b0 AS DOUBLE) - CAST(a0 AS DOUBLE) * a0 / n0"
        " + CAST(b1 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1)"
    )
    ok = f"n0 >= 2 AND n1 >= 2 AND {ssw} > 0"
    fstat = f"(CAST(n0 + n1 AS DOUBLE) - 2.0) * {ssb} / {ssw}"
    return f"""
    WITH lv_u AS (
      SELECT coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)), 0) AS y,
             ({h}) % 2 AS v
      FROM {table} GROUP BY user_id
    ), lv_m AS (
      SELECT v, CAST(round(2.0 * quantile_cont(y, 0.5), 0) AS BIGINT) AS m2
      FROM lv_u GROUP BY v
    ), lv_d AS (
      SELECT u.v, abs(2 * u.y - m.m2) AS d
      FROM lv_u u JOIN lv_m m ON m.v = u.v
    ), lv_s AS (
      SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             sum(CASE WHEN v = 0 THEN CAST(d AS HUGEINT) ELSE 0 END) AS a0,
             sum(CASE WHEN v = 1 THEN CAST(d AS HUGEINT) ELSE 0 END) AS a1,
             sum(CASE WHEN v = 0 THEN CAST(d AS HUGEINT) * d ELSE 0 END)
               AS b0,
             sum(CASE WHEN v = 1 THEN CAST(d AS HUGEINT) * d ELSE 0 END)
               AS b1
      FROM lv_d
    )
    SELECT n0, n1,
           CASE WHEN {ok} THEN round({fstat}, 6) END AS f_stat,
           CASE WHEN {ok} THEN round({fstat}, 6) > 3.841459 END
             AS significant
    FROM lv_s
    """


# --------------------------------------------------------------- wave 132
def ab_diff_in_diff(events: DataFrame) -> DataFrame:
    """→ one row [n0, n1, cutoff_us, did, t, significant] — the
    difference-in-differences estimator (Card & Krueger 1994 framing)
    between the md5 arms around the stream's exact median instant:
    per user, d = (post-period spend) − (pre-period spend); DiD is the
    treatment-control gap in mean d. The parallel-trends causal read
    that a raw post-period comparison fakes whenever arms started
    unequal — here the per-user differencing removes each user's
    level before arms are compared (a Welch test on d).

    Exactness: the cutoff is the exact interpolated median of event
    epoch-micros FLOORED to an integer (identical in both engines —
    the popularity_rec convention); per-user pre/post cents and d are
    exact BIGINTs; the Welch t on d stages once from six exact
    DECIMAL(38,0)/HUGEINT moments, rounded 6. NULL when an arm has
    n < 2 or d has zero spread; ``significant`` compares the ROUNDED
    |t| to 1.959964 (documented large-sample threshold).

    Scale shape: one global percentile aggregate (broadcast one row),
    one user-grain aggregate, a one-row reduce.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from linkgraph_spark.functions.hashing import md5_long

    d38 = "decimal(38,0)"
    cut = events.groupBy().agg(
        F.expr(
            "CAST(floor(percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5D)) AS BIGINT)"
        ).alias("cut")
    )
    u = (
        events.crossJoin(F.broadcast(cut))
        .groupBy("user_id", "cut")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) >= cut"),
                        F.round(F.col("value") * 100, 0).cast("long"),
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("post"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) < cut"),
                        F.round(F.col("value") * 100, 0).cast("long"),
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("pre"),
        )
        .select(
            "cut",
            (F.col("post") - F.col("pre")).alias("d"),
            (md5_long(F.col("user_id").cast("string")) % 2).alias("v"),
        )
    )
    s = u.groupBy("cut").agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("v") == 0, F.col("d")).otherwise(0).cast(d38)).alias("a0"),
        F.sum(F.when(F.col("v") == 1, F.col("d")).otherwise(0).cast(d38)).alias("a1"),
        F.sum(
            F.when(F.col("v") == 0, F.col("d")).otherwise(0).cast(d38)
            * F.when(F.col("v") == 0, F.col("d")).otherwise(0)
        ).alias("b0"),
        F.sum(
            F.when(F.col("v") == 1, F.col("d")).otherwise(0).cast(d38)
            * F.when(F.col("v") == 1, F.col("d")).otherwise(0)
        ).alias("b1"),
    )
    v0 = (
        "((CAST(n0 AS DOUBLE) * CAST(b0 AS DOUBLE)"
        " - CAST(a0 AS DOUBLE) * CAST(a0 AS DOUBLE))"
        " / (CAST(n0 AS DOUBLE) * (n0 - 1.0)))"
    )
    v1 = (
        "((CAST(n1 AS DOUBLE) * CAST(b1 AS DOUBLE)"
        " - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE))"
        " / (CAST(n1 AS DOUBLE) * (n1 - 1.0)))"
    )
    se2 = f"({v1} / n1 + {v0} / n0)"
    ok = f"n0 >= 2 AND n1 >= 2 AND {se2} > 0"
    did = "(CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0) / 100.0"
    t = (
        f"(CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0)"
        f" / sqrt({se2})"
    )
    return s.select(
        "n0",
        "n1",
        F.col("cut").alias("cutoff_us"),
        F.expr(
            f"CASE WHEN n0 > 0 AND n1 > 0 THEN round({did}, 6) END"
        ).alias("did"),
        F.expr(f"CASE WHEN {ok} THEN round({t}, 6) END").alias("t"),
        F.expr(
            f"CASE WHEN {ok} THEN abs(round({t}, 6)) > 1.959964 END"
        ).alias("significant"),
    )


def ab_diff_in_diff_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`ab_diff_in_diff` (same floored median
    cutoff, exact per-user differencing, shared Welch chain)."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    v0 = (
        "((CAST(n0 AS DOUBLE) * CAST(b0 AS DOUBLE)"
        " - CAST(a0 AS DOUBLE) * CAST(a0 AS DOUBLE))"
        " / (CAST(n0 AS DOUBLE) * (n0 - 1.0)))"
    )
    v1 = (
        "((CAST(n1 AS DOUBLE) * CAST(b1 AS DOUBLE)"
        " - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE))"
        " / (CAST(n1 AS DOUBLE) * (n1 - 1.0)))"
    )
    se2 = f"({v1} / n1 + {v0} / n0)"
    ok = f"n0 >= 2 AND n1 >= 2 AND {se2} > 0"
    did = "(CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0) / 100.0"
    t = (
        f"(CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0)"
        f" / sqrt({se2})"
    )
    return f"""
    WITH did_c AS (
      SELECT CAST(floor(quantile_cont(epoch_us(ts), 0.5)) AS BIGINT) AS cut
      FROM {table}
    ), did_u AS (
      SELECT c.cut,
             coalesce(sum(CASE WHEN epoch_us(ts) >= c.cut THEN
               CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END), 0)
             - coalesce(sum(CASE WHEN epoch_us(ts) < c.cut THEN
               CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END), 0) AS d,
             ({h}) % 2 AS v
      FROM {table} CROSS JOIN did_c c
      GROUP BY user_id, c.cut
    ), did_s AS (
      SELECT cut,
             CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             sum(CASE WHEN v = 0 THEN CAST(d AS HUGEINT) ELSE 0 END) AS a0,
             sum(CASE WHEN v = 1 THEN CAST(d AS HUGEINT) ELSE 0 END) AS a1,
             sum(CASE WHEN v = 0 THEN CAST(d AS HUGEINT) * d ELSE 0 END)
               AS b0,
             sum(CASE WHEN v = 1 THEN CAST(d AS HUGEINT) * d ELSE 0 END)
               AS b1
      FROM did_u GROUP BY cut
    )
    SELECT n0, n1, cut AS cutoff_us,
           CASE WHEN n0 > 0 AND n1 > 0 THEN round({did}, 6) END AS did,
           CASE WHEN {ok} THEN round({t}, 6) END AS t,
           CASE WHEN {ok} THEN abs(round({t}, 6)) > 1.959964 END
             AS significant
    FROM did_s
    """
