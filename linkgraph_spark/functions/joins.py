"""Temporal join operators Spark lacks natively: as-of join and
(keyless) interval join.

Reference parity: the reference engine's point-lookup pattern
(``pagerank_lambda/dynamodb/pagerank.py:51-99``) fetches "the current
state as of this event" per key; ``asof_join`` is that access pattern
as a set-oriented operator. Both operators here are compositions of
built-in DataFrame ops — no Python row path.

- ``asof_join``: the canonical distributed formulation — tag both
  sides, union, ONE hash-shuffle on the key, and a per-key
  ``last(..., ignorenulls)`` running window picks each left row's
  most recent right match. One shuffle + one sort, no per-row
  lookups, no join explosion. Partitioning is by join key, so it
  scales with key cardinality (user ids: high); a single hot key
  serializes only its own rows.
- ``interval_join``: points-in-intervals WITHOUT an equi key. The
  naive plan is a cartesian/BroadcastNestedLoop; instead intervals
  explode into the fixed-width time bins they span and points join
  their single bin — an equi shuffle join whose residual range filter
  is exact. Each (interval, point) pair meets in exactly one bin (the
  point's), so no dedup pass is needed. Choose ``bin_width_sec`` near
  the typical interval width: cost is O(pairs per bin), never O(n*m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple = (),
) -> DataFrame:
    """For every left row, attach the latest right row of the same
    ``key`` with ``right_ts <= left_ts`` (backward as-of, equal
    timestamps match). Right payload columns come back prefixed
    ``asof_``, plus ``asof_ts`` (the matched timestamp); unmatched
    left rows keep NULLs (left-outer semantics).

    If several right rows share (key, ts), the greatest value per
    payload column wins — deterministic, engine-order-free.
    ``right_cols`` must not collide with left column names.
    """
    rcols = list(right_cols)
    u = _tagged_union(left, right, key, left_ts, right_ts, rcols, "_asof_row")
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_tu_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m", F.last("_asof_row", ignorenulls=True).over(w))
    return filled.where(F.col("_is_left") == 1).select(
        *left.columns,
        F.col("_m._ts").alias("asof_ts"),
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in rcols],
    )


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    rcols: list,
    struct_col: str,
) -> DataFrame:
    """Shared prelude of the union-one-shuffle temporal joins
    (:func:`asof_join`, :func:`nearest_join`): clash-check the payload
    names, dedup the right side to one row per (key, ts) (greatest value
    per payload column — deterministic, engine-order-free), pack the
    matched right row into ONE struct (so a window fill can never tear
    ts and payload from different right rows), tag sides, and union.
    Exposes ``_tu_ts`` (the row's timestamp), ``_is_left``, and
    ``struct_col`` (NULL on left rows)."""
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    grouped = right.select(key, F.col(right_ts).alias("_tu_ts"), *rcols)
    if rcols:
        grouped = grouped.groupBy(key, "_tu_ts").agg(
            *[F.max(c).alias(c) for c in rcols]
        )
    else:
        # no payload: plain dedup (groupBy().agg() rejects an empty list)
        grouped = grouped.distinct()
    r = grouped.select(
        key,
        "_tu_ts",
        F.lit(0).alias("_is_left"),
        F.struct(
            F.col("_tu_ts").alias("_ts"), *[F.col(c) for c in rcols]
        ).alias(struct_col),
    )
    l = left.withColumn("_tu_ts", F.col(left_ts)).withColumn(
        "_is_left", F.lit(1)
    )
    return l.unionByName(r, allowMissingColumns=True)


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str = "start_ts",
    end: str = "end_ts",
    point_ts: str = "ts",
    bin_width_sec: int = 600,
) -> DataFrame:
    """All (interval, point) pairs with ``start <= point_ts < end`` and
    NO shared key — the pure range-join shape. Returns every interval
    column plus every point column (caller projects).

    Intervals explode into the ``bin_width_sec``-wide epoch bins they
    overlap; points join on their single containing bin; the exact
    range predicate rides the join as its residual. Empty or inverted
    intervals (end <= start) match nothing.
    """
    # bin arithmetic in exact integer MICROseconds — second-truncated
    # unix_timestamp would mis-bin sub-second interval ends
    b = F.lit(int(bin_width_sec) * 1_000_000)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    i_lo = F.floor(us(start) / b)
    # end is exclusive: the last overlapped bin holds end - 1 microsecond
    i_hi = F.floor((us(end) - 1) / b)
    iv = intervals.where(F.col(end) > F.col(start)).withColumn(
        "_bin", F.explode(F.sequence(i_lo, i_hi))
    )
    pt = points.withColumn("_bin", F.floor(us(point_ts) / b))
    return (
        iv.join(pt, "_bin")
        .where((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end)))
        .drop("_bin")
    )


def asof_purchase_click(events: DataFrame) -> DataFrame:
    """Gate query: each purchase joined as-of to the user's latest
    prior-or-equal click. → ``[event_id, user_id, ts, asof_ts,
    asof_click_id, gap_sec]`` (gap NULL when no prior click)."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = asof_join(purchases, clicks, key="user_id", right_cols=("click_id",))
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "asof_ts",
        "asof_click_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")).alias("gap_sec"),
    )


def asof_purchase_click_sql(table: str = "events") -> str:
    """DuckDB mirror: native ASOF LEFT JOIN, right side deduped per
    (user, ts) with max(event_id) exactly like the engine."""
    return f"""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM {table} WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM {table} WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS asof_ts, c.click_id AS asof_click_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_sec
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """


def interval_error_purchases(
    events: DataFrame, window_sec: int = 600
) -> DataFrame:
    """Gate query: purchases landing inside any [error_ts, error_ts +
    window) incident window, counted per error — a keyless range join
    (errors and purchases belong to DIFFERENT users, so no equi key
    exists). → ``[error_id, n_purchases]``, errors with none omitted."""
    errors = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr(f"INTERVAL {int(window_sec)} SECONDS")).alias("end_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts"
    )
    j = interval_join(errors, purchases, bin_width_sec=window_sec)
    return j.groupBy("error_id").agg(F.count("*").alias("n_purchases"))


def interval_error_purchases_sql(
    table: str = "events", window_sec: int = 600
) -> str:
    return f"""
    WITH errors AS (
      SELECT event_id AS error_id, ts AS start_ts,
             ts + INTERVAL {int(window_sec)} SECOND AS end_ts
      FROM {table} WHERE event_type = 'error'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, ts FROM {table}
      WHERE event_type = 'purchase'
    )
    SELECT e.error_id, count(*) AS n_purchases
    FROM errors e
    JOIN purchases p ON p.ts >= e.start_ts AND p.ts < e.end_ts
    GROUP BY e.error_id
    """


def digest_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    bits: int = 20,
) -> DataFrame:
    """Inner equi-join where the fact side is first pruned by a COMPACT
    digest of the dim keys — a one-hash Bloom filter expressed
    relationally. Result is EXACTLY ``fact ⋈ dim`` (the digest admits
    false positives, never false negatives, and the exact join runs
    after the prune), which is what lets a plain-join oracle check it.

    The digest is ``distinct(xxhash64(dim_key) mod 2^bits)`` — at most
    ``min(|dim|, 2^bits)`` ints, broadcast into a semi-join on the
    fact's hashed key. Why this beats broadcasting the dim keys
    themselves at 100 TB: link-graph dim keys are wide strings (URLs,
    actor keys); the digest is 8 bytes per DISTINCT BUCKET with dedup,
    so a 10M-key dim collapses to ≤ 2^bits ≈ 1M ints (~8 MB) no matter
    how wide the keys are. False-positive rate for a selective dim
    (|dim| ≪ 2^bits) is ≈ |dim|/2^bits per non-matching fact row — the
    shuffled fact residue shrinks to match+FP rows before the real join.
    This is Spark's runtime row-level filtering (semi-join reduction)
    made explicit and portable to builds where that rule is off.
    """
    m = F.lit(1 << int(bits)).cast("long")
    # hash the STRING form on both sides: xxhash64 hashes by physical
    # type, so an int fact key and a bigint dim key (which the final
    # equi-join would happily coerce and match) hash differently and the
    # digest would silently drop true matches
    buckets = (
        dim.select(
            F.pmod(F.xxhash64(F.col(dim_key).cast("string")), m).alias("_b")
        ).distinct()
    )
    pruned = fact.withColumn(
        "_fb", F.pmod(F.xxhash64(F.col(fact_key).cast("string")), m)
    ).join(
        F.broadcast(buckets), F.col("_fb") == F.col("_b"), "left_semi"
    ).drop("_fb")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def digest_join_revenue(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
) -> DataFrame:
    """Revenue by nation for ONE region's customers, with the order scan
    digest-pruned before the customer join — the gate-facing face of
    :func:`digest_pruned_join`. → ``[n_name, revenue]``.

    The customer subset (one region ≈ a fifth of customers) builds the
    digest; orders outside it drop before the only fact-sized shuffle.
    Revenue sums exact integer cents (prices are 2-dp by construction).
    """
    custs = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    nation.n_regionkey == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            customer.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    fact = orders.select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("_cents")
    )
    joined = digest_pruned_join(fact, custs, "o_custkey", "c_custkey")
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum("_cents") / F.lit(100.0), 2).alias("revenue"))
        .orderBy("n_name")
    )


def digest_join_revenue_sql(region_name: str = "EUROPE") -> str:
    """Oracle: the PLAIN join — equivalence (no lost or phantom rows
    through the digest prune) is exactly the property under test."""
    rn = region_name.replace("'", "''")
    return f"""
    SELECT n_name,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS revenue
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey AND r_name = '{rn}'
    GROUP BY n_name
    ORDER BY n_name
    """


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple = (),
) -> DataFrame:
    """Bidirectional as-of: for every left row, the right row of the same
    ``key`` NEAREST in time — before or after — with ties (equal
    |gap|) going to the EARLIER right row. Right payload columns come
    back prefixed ``near_``, plus ``near_ts``; unmatched left rows (no
    right rows for the key at all) keep NULLs.

    Same one-shuffle shape as :func:`asof_join`: tag both sides, union,
    ONE hash-shuffle on the key, and two RANGE-framed window picks over
    the same sort — ``last`` non-null looking back, ``first`` non-null
    looking forward (range frames, not row frames, so a right row at
    exactly the left timestamp is visible to BOTH directions regardless
    of tie order). The right side dedups to one row per (key, ts)
    (greatest payload) first, which is also what makes the picks
    deterministic.
    """
    rcols = list(right_cols)
    u = _tagged_union(
        left, right, key, left_ts, right_ts, rcols, "_near_row"
    ).withColumn("_us", F.unix_micros(F.col("_tu_ts").cast("timestamp")))
    back_w = (
        Window.partitionBy(key)
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    fwd_w = (
        Window.partitionBy(key)
        .orderBy("_us")
        .rangeBetween(0, Window.unboundedFollowing)
    )
    picked = u.select(
        "*",
        F.last("_near_row", ignorenulls=True).over(back_w).alias("_back"),
        F.first("_near_row", ignorenulls=True).over(fwd_w).alias("_fwd"),
    ).where(F.col("_is_left") == 1)
    bgap = F.col("_us") - F.unix_micros(F.col("_back._ts").cast("timestamp"))
    fgap = F.unix_micros(F.col("_fwd._ts").cast("timestamp")) - F.col("_us")
    chosen = (
        F.when(F.col("_back").isNull(), F.col("_fwd"))
        .when(F.col("_fwd").isNull(), F.col("_back"))
        # tie -> earlier right row, i.e. the backward pick
        .when(bgap <= fgap, F.col("_back"))
        .otherwise(F.col("_fwd"))
    )
    return picked.withColumn("_chosen", chosen).select(
        *left.columns,
        F.col("_chosen._ts").alias("near_ts"),
        *[F.col(f"_chosen.{c}").alias(f"near_{c}") for c in rcols],
    )


def nearest_click_purchase(events: DataFrame) -> DataFrame:
    """Gate query: each purchase joined to the user's nearest click in
    either direction. → ``[event_id, user_id, ts, near_ts,
    near_click_id, signed_gap_sec]`` (negative gap: click precedes the
    purchase; NULLs when the user never clicks)."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = nearest_join(purchases, clicks, key="user_id", right_cols=("click_id",))
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "near_ts",
        "near_click_id",
        (F.unix_timestamp("near_ts") - F.unix_timestamp("ts")).alias(
            "signed_gap_sec"
        ),
    )


def nearest_click_purchase_sql(table: str = "events") -> str:
    """DuckDB mirror: two native ASOF joins (backward >=, forward <=)
    and the same tie-to-earlier CASE on exact microsecond gaps."""
    return f"""
    WITH nclicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM {table} WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    npurch AS (
      SELECT event_id, user_id, ts FROM {table} WHERE event_type = 'purchase'
    ),
    nback AS (
      SELECT p.event_id, b.ts AS bts, b.click_id AS bid
      FROM npurch p ASOF LEFT JOIN nclicks b
        ON p.user_id = b.user_id AND p.ts >= b.ts
    ),
    nfwd AS (
      SELECT p.event_id, f.ts AS fts, f.click_id AS fid
      FROM npurch p ASOF LEFT JOIN nclicks f
        ON p.user_id = f.user_id AND p.ts <= f.ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN bts IS NULL THEN fts
                WHEN fts IS NULL THEN bts
                WHEN epoch_us(p.ts) - epoch_us(bts)
                     <= epoch_us(fts) - epoch_us(p.ts) THEN bts
                ELSE fts END AS near_ts,
           CASE WHEN bts IS NULL THEN fid
                WHEN fts IS NULL THEN bid
                WHEN epoch_us(p.ts) - epoch_us(bts)
                     <= epoch_us(fts) - epoch_us(p.ts) THEN bid
                ELSE fid END AS near_click_id,
           CAST(floor(epoch(CASE WHEN bts IS NULL THEN fts
                WHEN fts IS NULL THEN bts
                WHEN epoch_us(p.ts) - epoch_us(bts)
                     <= epoch_us(fts) - epoch_us(p.ts) THEN bts
                ELSE fts END)) AS BIGINT)
             - CAST(floor(epoch(p.ts)) AS BIGINT) AS signed_gap_sec
    FROM npurch p
    JOIN nback b ON b.event_id = p.event_id
    JOIN nfwd f ON f.event_id = p.event_id
    """


# ---------------------------------------------------------------------------
# Join-cardinality estimator audit (wave 109)
# ---------------------------------------------------------------------------


def join_card_audit(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """→ one row [n_left, n_right, d_left, d_right, actual, estimate,
    q_error] — the classic optimizer join-cardinality estimate
    ``|A ⋈ B| ≈ |A|·|B| / max(d_A, d_B)`` (uniform-frequency +
    containment assumption, the Selinger/System-R formula every planner
    still uses) audited against the EXACT join cardinality, reported as
    the standard q-error ``max(est/actual, actual/est)``. The "can I
    trust my planner's row counts on this key" diagnostic.

    The exact cardinality never materializes the join: it is
    ``Σ_k c_A(k)·c_B(k)`` over the two key histograms (DECIMAL/HUGEINT
    — per-key products can square hot keys). The estimate is one staged
    division of exact counts; q_error is staged from the same integers,
    NULL when either side of the ratio is 0.

    Scale shape: two key-grain aggregates (map-side combinable), one
    histogram equi-join, a one-row reduce. The fact tables are each
    read once and never joined row-to-row.

    Reference parity: no planner surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    a = (
        orders.where(F.col("o_custkey").isNotNull())
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("ca"))
    )
    b = (
        customer.where(F.col("c_custkey").isNotNull())
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count("*").alias("cb"))
    )
    sa = a.groupBy().agg(
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("n_left"),
        F.count("*").cast("long").alias("d_left"),
    )
    sb = b.groupBy().agg(
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("n_right"),
        F.count("*").cast("long").alias("d_right"),
    )
    act = (
        a.join(b, "k")
        .groupBy()
        .agg(
            F.coalesce(
                F.sum(F.col("ca").cast("decimal(38,0)") * F.col("cb")),
                F.lit(0),
            ).alias("actual_d")
        )
    )
    return (
        sa.crossJoin(sb)
        .crossJoin(act)
        .select(
            "n_left",
            "n_right",
            "d_left",
            "d_right",
            F.col("actual_d").cast("long").alias("actual"),
            F.expr(
                "CASE WHEN greatest(d_left, d_right) > 0 THEN"
                " round(CAST(n_left AS DOUBLE) * n_right"
                " / greatest(d_left, d_right), 6) END"
            ).alias("estimate"),
            F.expr(
                "CASE WHEN CAST(actual_d AS DOUBLE) > 0"
                " AND greatest(d_left, d_right) > 0"
                " AND CAST(n_left AS DOUBLE) * n_right > 0 THEN"
                " round(greatest("
                " (CAST(n_left AS DOUBLE) * n_right"
                "   / greatest(d_left, d_right)) / CAST(actual_d AS DOUBLE),"
                " CAST(actual_d AS DOUBLE) /"
                " (CAST(n_left AS DOUBLE) * n_right"
                "   / greatest(d_left, d_right))), 6) END"
            ).alias("q_error"),
        )
    )


def join_card_audit_sql(
    orders: str = "orders", customer: str = "customer"
) -> str:
    """DuckDB oracle for :func:`join_card_audit` (same histogram
    product, same staged estimate)."""
    return f"""
    WITH jca_a AS (
      SELECT o_custkey AS k, count(*) AS ca FROM {orders}
      WHERE o_custkey IS NOT NULL GROUP BY 1
    ), jca_b AS (
      SELECT c_custkey AS k, count(*) AS cb FROM {customer}
      WHERE c_custkey IS NOT NULL GROUP BY 1
    ), jca_sa AS (
      SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS n_left,
             CAST(count(*) AS BIGINT) AS d_left FROM jca_a
    ), jca_sb AS (
      SELECT CAST(coalesce(sum(cb), 0) AS BIGINT) AS n_right,
             CAST(count(*) AS BIGINT) AS d_right FROM jca_b
    ), jca_act AS (
      SELECT coalesce(sum(CAST(ca AS HUGEINT) * cb), 0) AS actual_d
      FROM jca_a JOIN jca_b USING (k)
    )
    SELECT n_left, n_right, d_left, d_right,
           CAST(actual_d AS BIGINT) AS actual,
           CASE WHEN greatest(d_left, d_right) > 0 THEN
             round(CAST(n_left AS DOUBLE) * n_right
                   / greatest(d_left, d_right), 6) END AS estimate,
           CASE WHEN CAST(actual_d AS DOUBLE) > 0
                AND greatest(d_left, d_right) > 0
                AND CAST(n_left AS DOUBLE) * n_right > 0 THEN
             round(greatest(
               (CAST(n_left AS DOUBLE) * n_right
                 / greatest(d_left, d_right)) / CAST(actual_d AS DOUBLE),
               CAST(actual_d AS DOUBLE) /
               (CAST(n_left AS DOUBLE) * n_right
                 / greatest(d_left, d_right))), 6) END AS q_error
    FROM jca_sa, jca_sb, jca_act
    """
