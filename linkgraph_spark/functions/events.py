"""Event-stream analytics: sessionization, funnels, rate anomalies, and
semi-structured property extraction over the raw ``events`` table.

The reference pipeline's only event-shaped input is the crawl edge list it
scatters to workers (``pagerank_lambda/dynamodb/pagerank.py:51-99``); these
are engine additions that make the same ingest table useful to a product
analyst before it is graphed: the four queries every clickstream warehouse
runs first (sessions, funnels, anomaly triage, property profiling).

Scale notes (100 TB lens):

- :func:`sessionize` — ONE shuffle on ``user_id``; the per-user window is
  bounded by that user's event count (user cardinality grows with data
  volume, per-user history does not), so no low-cardinality single-task
  window. The session assignment (lag + running sum) and the per-session
  aggregate share the same partitioning, so Catalyst reuses one exchange.
- :func:`funnel` — one filtered min-ts aggregate per step plus an equi-join
  on ``user_id`` per subsequent step; k is a small constant (3-5 steps).
  Counts are one-row aggregates unioned driver-free.
- :func:`rate_anomaly` — two hash aggregates (type×hour, then type); the
  second input is |types|·|hours| rows, trivially small at any data scale.
- :func:`props_profile` — map-only JSON extraction (``get_json_object`` is
  a JVM expression) + one hash aggregate on the low-cardinality type key
  with map-side partial aggregation.

Session TZ is pinned UTC (``session.py``), so Spark ``unix_timestamp`` /
``date_trunc`` and DuckDB ``epoch`` / ``date_trunc`` agree and every SQL
oracle replays its operator exactly (same floor()-vs-truncate note as
``kernels/temporal.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_day(col: str):
    """Whole days since the epoch as a long — exact integer microseconds
    first (``unix_timestamp`` would truncate sub-second and disagree with
    DuckDB's fractional epoch). SQL twin: :func:`epoch_day_sql`."""
    return F.floor(
        F.unix_micros(F.col(col).cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")


def epoch_day_sql(expr: str) -> str:
    """DuckDB mirror of :func:`_epoch_day`."""
    return f"CAST(floor(epoch_us({expr}) / 86400000000) AS BIGINT)"


def sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[user_id, session_idx, n_events, start_ts, end_ts,
    duration_sec]`` — gap-based sessionization: a user's events sorted by
    ``(ts, event_id)`` start a new session whenever the gap from the
    previous event exceeds ``gap_sec`` (epoch seconds, truncated — both
    engines floor sub-second parts identically). ``session_idx`` is the
    user's 0-based session counter; timestamps are epoch-second longs.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    gap = F.col("ts_s") - F.lag("ts_s").over(wl)
    new_sess = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    sessed = e.select(
        "user_id",
        "ts_s",
        (F.sum(new_sess).over(w) - F.lit(1)).alias("session_idx"),
    )
    return sessed.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_s").alias("start_ts"),
        F.max("ts_s").alias("end_ts"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_sec"),
    )


def sessionize_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB oracle for :func:`sessionize` (standalone WITH query)."""
    return f"""
    WITH se AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), flagged AS (
      SELECT user_id, ts_s, event_id,
             CASE WHEN lag(ts_s) OVER
                    (PARTITION BY user_id ORDER BY ts_s, event_id) IS NULL
                  THEN 1
                  WHEN ts_s - lag(ts_s) OVER
                    (PARTITION BY user_id ORDER BY ts_s, event_id)
                    > {int(gap_sec)} THEN 1
                  ELSE 0 END AS new_sess
      FROM se
    ), sessed AS (
      SELECT user_id, ts_s,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           min(ts_s) AS start_ts, max(ts_s) AS end_ts,
           max(ts_s) - min(ts_s) AS duration_sec
    FROM sessed GROUP BY user_id, session_idx
    """


def funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """→ ``[step_idx, step, n_users]`` — strict-order funnel: a user counts
    for step k only if they performed ``steps[k]`` at a timestamp strictly
    after their first qualifying timestamp for step k-1 (first-touch
    semantics, the standard product-analytics funnel). One row per step.
    """
    from functools import reduce as _reduce

    e = events.select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    parts = []
    cur = None  # [user_id, t]: first qualifying ts for the previous step
    for i, step in enumerate(steps):
        s = e.where(F.col("event_type") == step)
        if cur is None:
            cur = s.groupBy("user_id").agg(F.min("ts_s").alias("t"))
        else:
            cur = (
                s.join(cur.select("user_id", F.col("t").alias("pt")), "user_id")
                .where(F.col("ts_s") > F.col("pt"))
                .groupBy("user_id")
                .agg(F.min("ts_s").alias("t"))
            )
        parts.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(i + 1).cast("int").alias("step_idx"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    return _reduce(DataFrame.unionAll, parts)


def funnel_sql(steps: list[str], table: str = "events") -> str:
    """DuckDB oracle for :func:`funnel` (standalone WITH query)."""
    ctes = [
        f"""fe AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    )"""
    ]
    selects = []
    for i, step in enumerate(steps):
        s = step.replace("'", "''")
        if i == 0:
            ctes.append(
                f"""f{i} AS MATERIALIZED (
      SELECT user_id, min(ts_s) AS t FROM fe
      WHERE event_type = '{s}' GROUP BY user_id
    )"""
            )
        else:
            ctes.append(
                f"""f{i} AS MATERIALIZED (
      SELECT fe.user_id, min(fe.ts_s) AS t
      FROM fe JOIN f{i - 1} p ON p.user_id = fe.user_id
      WHERE fe.event_type = '{s}' AND fe.ts_s > p.t
      GROUP BY fe.user_id
    )"""
            )
        selects.append(
            f"SELECT CAST({i + 1} AS INT) AS step_idx, '{s}' AS step,"
            f" count(*) AS n_users FROM f{i}"
        )
    body = ",\n    ".join(ctes)
    sel = "\n    UNION ALL ".join(selects)
    return f"WITH {body}\n    {sel}"


def rate_anomaly(
    events: DataFrame, z_threshold: float = 2.0
) -> DataFrame:
    """→ ``[event_type, bucket_ts, n, z]`` — hourly event-count anomalies:
    buckets whose count deviates from that event type's mean hourly count
    (over OBSERVED buckets — empty hours are not imputed; documented
    choice, identical in the oracle) by at least ``z_threshold``
    population standard deviations. Zero-variance types emit nothing.
    """
    b = events.select(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("bucket_ts"),
    )
    cnt = b.groupBy("event_type", "bucket_ts").agg(F.count("*").alias("n"))
    stats = cnt.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sd")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        cnt.join(F.broadcast(stats), "event_type")
        .where(F.col("sd") > 0)
        .where(F.abs(z) >= z_threshold)
        .select("event_type", "bucket_ts", "n", F.round(z, 6).alias("z"))
    )


def rate_anomaly_sql(z_threshold: float = 2.0, table: str = "events") -> str:
    """DuckDB oracle for :func:`rate_anomaly` (standalone WITH query)."""
    return f"""
    WITH rb AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_ts
      FROM {table}
    ), rc AS MATERIALIZED (
      SELECT event_type, bucket_ts, count(*) AS n FROM rb GROUP BY 1, 2
    ), rs AS (
      SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sd
      FROM rc GROUP BY event_type
    )
    SELECT rc.event_type, rc.bucket_ts, rc.n,
           round((rc.n - rs.mu) / rs.sd, 6) AS z
    FROM rc JOIN rs ON rs.event_type = rc.event_type
    WHERE rs.sd > 0 AND abs((rc.n - rs.mu) / rs.sd) >= {float(z_threshold)}
    """


def props_profile(events: DataFrame, key: str = "k") -> DataFrame:
    """→ ``[event_type, n, n_with_key, min_v, max_v, avg_v, n_distinct]``
    — per-event-type numeric profile of a JSON property extracted from the
    semi-structured ``props`` column (``get_json_object`` stays a JVM
    expression; rows without the key count in ``n`` but not the stats).
    """
    v = F.get_json_object(F.col("props"), f"$.{key}").cast("long")
    return (
        events.select("event_type", v.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("v").alias("n_with_key"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.round(F.avg("v"), 6).alias("avg_v"),
            F.countDistinct("v").alias("n_distinct"),
        )
    )


def props_profile_sql(key: str = "k", table: str = "events") -> str:
    """DuckDB oracle for :func:`props_profile` (standalone query)."""
    k = key.replace("'", "''")
    return f"""
    WITH pv AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.{k}') AS BIGINT) AS v
      FROM {table}
    )
    SELECT event_type, count(*) AS n, count(v) AS n_with_key,
           min(v) AS min_v, max(v) AS max_v,
           round(avg(v), 6) AS avg_v, count(DISTINCT v) AS n_distinct
    FROM pv GROUP BY event_type
    """


def retention_cohorts(events: DataFrame) -> DataFrame:
    """→ ``[cohort_week, week_offset, n_active, retention]`` — classic
    weekly retention triangle: users are cohorted by the ISO week
    (Monday-start, UTC) of their first event; each cell counts the
    cohort's users active ``week_offset`` weeks later, with ``retention``
    the fraction of the cohort still active. ``cohort_week`` is the epoch
    second of the week start (the module's ts_s convention); the offset-0
    cell is the cohort size (every user is active in their own first
    week by construction, so the denominator row always exists).

    Scale shape: the distinct (user, week) projection collapses the
    event stream to at most |users|·|weeks| rows in ONE map-side-combine
    pass; everything after (first-week min, cohort×offset counts, the
    offset-0 size join) runs on that bounded frame. The size join's
    build side is |cohorts| rows — broadcast at any scale.
    """
    wk = F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("wk_s")
    user_weeks = events.select("user_id", wk).distinct()
    first = user_weeks.groupBy("user_id").agg(F.min("wk_s").alias("cohort_s"))
    offs = (
        user_weeks.join(first, "user_id")
        .select(
            "cohort_s",
            "user_id",
            ((F.col("wk_s") - F.col("cohort_s")) / F.lit(604800))
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_s", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    sizes = offs.where(F.col("week_offset") == 0).select(
        "cohort_s", F.col("n_active").alias("_cohort_n")
    )
    return offs.join(F.broadcast(sizes), "cohort_s").select(
        F.col("cohort_s").alias("cohort_week"),
        "week_offset",
        "n_active",
        F.round(F.col("n_active") * 1.0 / F.col("_cohort_n"), 6).alias("retention"),
    )


def retention_cohorts_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`retention_cohorts` (standalone query)."""
    return f"""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS wk_s
      FROM {table}
    ), firstw AS (
      SELECT user_id, min(wk_s) AS cohort_s FROM uw GROUP BY user_id
    ), offs AS (
      SELECT f.cohort_s,
             CAST((u.wk_s - f.cohort_s) / 604800 AS BIGINT) AS week_offset,
             count(*) AS n_active
      FROM uw u JOIN firstw f USING (user_id)
      GROUP BY 1, 2
    ), sizes AS (
      SELECT cohort_s, n_active AS cohort_n FROM offs WHERE week_offset = 0
    )
    SELECT o.cohort_s AS cohort_week, o.week_offset, o.n_active,
           round(o.n_active * 1.0 / s.cohort_n, 6) AS retention
    FROM offs o JOIN sizes s USING (cohort_s)
    """


def session_pairs(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[type_a, type_b, n_sessions, lift]`` — market-basket
    co-occurrence over gap-based sessions: for every unordered pair of
    event types (``type_a < type_b``), the number of sessions containing
    both, and the lift ``P(a,b) / (P(a)·P(b))`` over sessions. Sessions
    are exactly :func:`sessionize`'s (same gap rule, same ordering), kept
    at event-type granularity before the per-session aggregate.

    Scale shape: the session window shuffles once on ``user_id``
    (per-user bounded, as in :func:`sessionize`); the distinct
    (session, type) projection is bounded by sessions × |types|; the
    pair self-join is an equi-join on the session key whose per-session
    fanout is at most C(|types|, 2) — a constant in data volume. The
    lift is computed as ``(n_ab/n_a)·(N/n_b)`` in both engines (same
    IEEE operation order), avoiding the n_ab·N integer overflow a
    naive numerator would hit at cluster scale.
    """
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    w = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    gap = F.col("ts_s") - F.lag("ts_s").over(wl)
    new_sess = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    st = (
        e.select(
            "user_id",
            "event_type",
            (F.sum(new_sess).over(w) - F.lit(1)).alias("session_idx"),
        )
        .distinct()
    )
    n_total = st.select("user_id", "session_idx").distinct().groupBy().agg(
        F.count("*").alias("_n_total")
    )
    supp = st.groupBy("event_type").agg(F.count("*").alias("_n"))
    pairs = (
        st.alias("a")
        .join(
            st.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_idx") == F.col("b.session_idx"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_sessions"))
    )
    return (
        pairs.join(
            F.broadcast(supp.select(F.col("event_type").alias("type_a"), F.col("_n").alias("_na"))),
            "type_a",
        )
        .join(
            F.broadcast(supp.select(F.col("event_type").alias("type_b"), F.col("_n").alias("_nb"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "type_a",
            "type_b",
            "n_sessions",
            F.round(
                (F.col("n_sessions") * 1.0 / F.col("_na"))
                * (F.col("_n_total") * 1.0 / F.col("_nb")),
                6,
            ).alias("lift"),
        )
    )


def markov_transitions(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[src_type, dst_type, n_trans, prob]`` — first-order Markov
    transition estimates between consecutive event types: for every user,
    events are ordered by ``(ts, event_id)`` and a transition
    ``src_type → dst_type`` is counted whenever the gap from the previous
    event is at most ``gap_sec`` (a session boundary, same rule as
    :func:`sessionize`, ends the chain). ``prob`` is the row-normalized
    transition probability ``n_trans / Σ_dst n_trans`` per ``src_type``,
    rounded to 6 dp (two exact integer-to-double divisions — identical in
    both engines).

    Scale shape: ONE shuffle on ``user_id`` for the lag window (per-user
    bounded, as in :func:`sessionize`); the transition aggregate is keyed
    on (src, dst) type pairs — at most |types|² rows, so the normalizing
    per-src totals are a broadcast join no matter the input volume.
    """
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    lagged = e.select(
        F.lag("event_type").over(wl).alias("src_type"),
        F.col("event_type").alias("dst_type"),
        (F.col("ts_s") - F.lag("ts_s").over(wl)).alias("gap"),
    )
    trans = (
        lagged.where(F.col("src_type").isNotNull() & (F.col("gap") <= gap_sec))
        .groupBy("src_type", "dst_type")
        .agg(F.count("*").alias("n_trans"))
    )
    totals = trans.groupBy("src_type").agg(F.sum("n_trans").alias("_tot"))
    return trans.join(F.broadcast(totals), "src_type").select(
        "src_type",
        "dst_type",
        "n_trans",
        F.round(F.col("n_trans") * 1.0 / F.col("_tot"), 6).alias("prob"),
    )


def markov_transitions_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB oracle for :func:`markov_transitions` (standalone query)."""
    return f"""
    WITH mte AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), mtl AS (
      SELECT lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts_s, event_id) AS src_type,
             event_type AS dst_type,
             ts_s - lag(ts_s) OVER
               (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap
      FROM mte
    ), mtt AS (
      SELECT src_type, dst_type, count(*) AS n_trans
      FROM mtl
      WHERE src_type IS NOT NULL AND gap <= {int(gap_sec)}
      GROUP BY 1, 2
    ), mttot AS (
      SELECT src_type, sum(n_trans) AS tot FROM mtt GROUP BY 1
    )
    SELECT t.src_type, t.dst_type, t.n_trans,
           round(t.n_trans * 1.0 / s.tot, 6) AS prob
    FROM mtt t JOIN mttot s USING (src_type)
    """


def session_pairs_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB oracle for :func:`session_pairs` (standalone query; the
    lift mirrors the engine's (n_ab/n_a)·(N/n_b) operation order)."""
    return f"""
    WITH spe AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), spf AS (
      SELECT user_id, event_type, ts_s, event_id,
             CASE WHEN lag(ts_s) OVER
                    (PARTITION BY user_id ORDER BY ts_s, event_id) IS NULL
                  THEN 1
                  WHEN ts_s - lag(ts_s) OVER
                    (PARTITION BY user_id ORDER BY ts_s, event_id)
                    > {int(gap_sec)} THEN 1
                  ELSE 0 END AS new_sess
      FROM spe
    ), spst AS (
      SELECT DISTINCT user_id, event_type,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
      FROM spf
    ), sptot AS (
      SELECT count(*) AS n_total
      FROM (SELECT DISTINCT user_id, session_idx FROM spst)
    ), spsupp AS (
      SELECT event_type, count(*) AS n FROM spst GROUP BY event_type
    ), sppair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_sessions
      FROM spst a JOIN spst b
        ON a.user_id = b.user_id AND a.session_idx = b.session_idx
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_sessions,
           round((p.n_sessions * 1.0 / sa.n) * (t.n_total * 1.0 / sb.n), 6)
             AS lift
    FROM sppair p
    JOIN spsupp sa ON sa.event_type = p.type_a
    JOIN spsupp sb ON sb.event_type = p.type_b
    CROSS JOIN sptot t
    """


def user_features(events: DataFrame) -> DataFrame:
    """→ ``[user_id, n_events, n_active_days, first_ts, last_ts,
    recency_days, total_value, top_type]`` — the per-user activity feature
    table (RFM-style) every behavioral model trains on: volume, active-day
    span, first/last epoch seconds, days since last activity relative to
    the dataset's max timestamp (so the feature is reproducible, not
    wall-clock-dependent), summed ``value``, and the modal event type
    (ties broken by type asc).

    Plan shape: one hash aggregate keyed on ``user_id`` (map-side
    combinable) plus a (user, type) count with a per-user window bounded
    by |types|; the global max timestamp is a one-row aggregate broadcast
    to the recency projection. No per-row Python, no unbounded windows.
    """
    e = events.select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("ts_s"),
        F.to_date("ts").alias("d"),
        "value",
    )
    base = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("d").alias("n_active_days"),
        F.min("ts_s").alias("first_ts"),
        F.max("ts_s").alias("last_ts"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    wt = Window.partitionBy("user_id").orderBy(
        F.desc("n_t"), F.asc("event_type")
    )
    top = (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_t"))
        .withColumn("_rn", F.row_number().over(wt))
        .where(F.col("_rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    mx = e.agg(F.max("ts_s").alias("_mx"))
    return (
        base.join(top, "user_id")
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            "n_events",
            "n_active_days",
            "first_ts",
            "last_ts",
            F.floor((F.col("_mx") - F.col("last_ts")) / 86400)
            .cast("long")
            .alias("recency_days"),
            "total_value",
            "top_type",
        )
    )


def user_features_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`user_features` (standalone query)."""
    return f"""
    WITH ufe AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             CAST(ts AS DATE) AS d, value
      FROM {table}
    ),
    ufb AS (
      SELECT user_id, count(*) AS n_events,
             count(DISTINCT d) AS n_active_days,
             min(ts_s) AS first_ts, max(ts_s) AS last_ts,
             round(sum(value), 6) AS total_value
      FROM ufe GROUP BY user_id
    ),
    uft AS (
      SELECT user_id, event_type AS top_type
      FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type ASC) AS rn
        FROM ufe GROUP BY user_id, event_type
      ) WHERE rn = 1
    ),
    ufm AS (SELECT max(ts_s) AS mx FROM ufe)
    SELECT b.user_id, b.n_events, b.n_active_days, b.first_ts, b.last_ts,
           CAST(floor((m.mx - b.last_ts) / 86400) AS BIGINT) AS recency_days,
           b.total_value, t.top_type
    FROM ufb b JOIN uft t USING (user_id) CROSS JOIN ufm m
    """


def session_lm_score(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[user_id, session_idx, n_trans, lm_score]`` — each session's
    mean log-likelihood under the corpus-wide first-order Markov model of
    :func:`markov_transitions`: lm_score = mean over the session's
    transitions of ln P(dst | src), rounded to 6 dp. The event-stream
    analog of a document LM fluency score — sessions whose flows are
    improbable under the global model (bot loops, broken funnels) rank at
    the bottom. Sessions with no in-gap transition are excluded (no
    likelihood to average).

    Plan shape: the lag window shuffles once on ``user_id``; the
    transition model is |types|² rows, broadcast to the scoring join; the
    per-session mean rides the same user partitioning. Probabilities are
    ln(n/tot) with the same integer-to-double divisions in both engines.
    """
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    w = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    gap = F.col("ts_s") - F.lag("ts_s").over(wl)
    new_sess = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    lagged = e.select(
        "user_id",
        (F.sum(new_sess).over(w) - F.lit(1)).alias("session_idx"),
        F.lag("event_type").over(wl).alias("src_type"),
        F.col("event_type").alias("dst_type"),
        gap.alias("gap"),
    )
    trans = lagged.where(
        F.col("src_type").isNotNull() & (F.col("gap") <= gap_sec)
    )
    model = (
        trans.groupBy("src_type", "dst_type")
        .agg(F.count("*").alias("n_trans"))
        .withColumn(
            "_tot", F.sum("n_trans").over(Window.partitionBy("src_type"))
        )
        .select(
            "src_type",
            "dst_type",
            F.log(F.col("n_trans") * 1.0 / F.col("_tot")).alias("_lp"),
        )
    )
    return (
        trans.join(F.broadcast(model), ["src_type", "dst_type"])
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_trans"),
            F.round(F.avg("_lp"), 6).alias("lm_score"),
        )
    )


def session_lm_score_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB oracle for :func:`session_lm_score` (standalone query)."""
    return f"""
    WITH sle AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), slf AS (
      SELECT user_id, event_type, ts_s, event_id,
             lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts_s, event_id) AS src_type,
             ts_s - lag(ts_s) OVER
               (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap,
             CASE WHEN lag(ts_s) OVER
                    (PARTITION BY user_id ORDER BY ts_s, event_id) IS NULL
                  THEN 1
                  WHEN ts_s - lag(ts_s) OVER
                    (PARTITION BY user_id ORDER BY ts_s, event_id)
                    > {int(gap_sec)} THEN 1
                  ELSE 0 END AS new_sess
      FROM sle
    ), sls AS (
      SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_idx,
             src_type, event_type AS dst_type, gap
      FROM slf
    ), slt AS (
      SELECT * FROM sls
      WHERE src_type IS NOT NULL AND gap <= {int(gap_sec)}
    ), slm AS (
      SELECT src_type, dst_type,
             ln(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY src_type))
               AS lp
      FROM slt GROUP BY src_type, dst_type
    )
    SELECT t.user_id, t.session_idx, count(*) AS n_trans,
           round(avg(m.lp), 6) AS lm_score
    FROM slt t JOIN slm m USING (src_type, dst_type)
    GROUP BY t.user_id, t.session_idx
    """


def inter_event_times(events: DataFrame) -> DataFrame:
    """→ ``[event_type, n_gaps, p50_gap, p90_gap, p99_gap]`` — exact
    interpolated percentiles of the within-user inter-arrival gap
    (seconds) per event type: the cadence profile capacity planning and
    bot triage read first (a p50 of 2 s on ``click`` is a scraper).
    Gaps are measured between consecutive SAME-TYPE events of one user.

    Plan shape: one lag window per (user, type) — per-partition state
    bounded by a user's history, not data volume — then one percentile
    aggregate on the low-cardinality type key. Exact interpolated
    percentile matches DuckDB ``quantile_cont`` bit-for-bit (the
    ``degree_percentiles`` precedent).
    """
    wl = Window.partitionBy("user_id", "event_type").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    gaps = e.select(
        "event_type",
        (F.col("ts_s") - F.lag("ts_s").over(wl)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("p50_gap"),
        F.round(F.expr("percentile(gap, 0.9)"), 6).alias("p90_gap"),
        F.round(F.expr("percentile(gap, 0.99)"), 6).alias("p99_gap"),
    )


def inter_event_times_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`inter_event_times` (standalone query)."""
    return f"""
    WITH ie AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), ig AS (
      SELECT event_type,
             ts_s - lag(ts_s) OVER
               (PARTITION BY user_id, event_type
                ORDER BY ts_s, event_id) AS gap
      FROM ie
    )
    SELECT event_type, count(*) AS n_gaps,
           round(quantile_cont(gap, 0.5), 6) AS p50_gap,
           round(quantile_cont(gap, 0.9), 6) AS p90_gap,
           round(quantile_cont(gap, 0.99), 6) AS p99_gap
    FROM ig WHERE gap IS NOT NULL
    GROUP BY event_type
    """


def dau_wau(events: DataFrame) -> DataFrame:
    """→ [day, dau, wau, stickiness] — daily active users, trailing-7-day
    weekly active users (the window ENDING on ``day``, inclusive), and the
    DAU/WAU stickiness ratio — the standard engagement health metric.
    Only days that actually have events are reported (a user active on
    Monday contributes to Tuesday–Sunday's WAU, but a day with zero events
    emits no row).

    Scale shape: the event stream collapses to distinct (day, user) in ONE
    map-side-combinable pass (≤ |users|·|days| rows); WAU re-uses that
    frame via a bounded 7× ``sequence`` explode (map-only) + a second
    distinct — no self-join over the raw events, no window over users.
    The date-keyed aggregates are tiny (O(days)).
    """
    du = events.select(F.to_date("ts").alias("d"), "user_id").distinct()
    dau = du.groupBy("d").agg(F.count("*").alias("dau"))
    contrib = du.select(
        F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("d"), "user_id"
    ).distinct()
    wau = contrib.groupBy("d").agg(F.count("*").alias("wau"))
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness"),
        )
    )


def dau_wau_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`dau_wau` (standalone query)."""
    return f"""
    WITH dw_du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM {table}
    ), dw_dau AS (
      SELECT d, count(*) AS dau FROM dw_du GROUP BY d
    ), dw_contrib AS (
      SELECT DISTINCT du.d + CAST(s.i AS INTEGER) AS d, du.user_id
      FROM dw_du du CROSS JOIN (SELECT unnest(range(7)) AS i) s
    ), dw_wau AS (
      SELECT d, count(*) AS wau FROM dw_contrib GROUP BY d
    )
    SELECT a.d AS day, a.dau, w.wau,
           round(a.dau * 1.0 / w.wau, 6) AS stickiness
    FROM dw_dau a JOIN dw_wau w USING (d)
    """


def hourly_profile(events: DataFrame) -> DataFrame:
    """→ [event_type, hour, n, share, avg_value] — the hour-of-day
    seasonality profile per event type: event counts, each hour's share of
    the type's total, and the mean ``value``. The first chart an
    events-pipeline operator draws (when do signups peak, is the error
    rate diurnal), and the input to staffing/batch-window decisions.

    Scale shape: ONE map-side-combinable aggregate onto ≤ |types|·24
    cells; the per-type normaliser joins back broadcast. Map-only
    otherwise — no window, no distinct.
    """
    cells = events.groupBy("event_type", F.hour("ts").alias("hour")).agg(
        F.count("*").alias("n"), F.avg("value").alias("_av")
    )
    tot = cells.groupBy("event_type").agg(F.sum("n").alias("_t"))
    return cells.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hour",
        "n",
        F.round(F.col("n") * 1.0 / F.col("_t"), 6).alias("share"),
        F.round("_av", 6).alias("avg_value"),
    )


def hourly_profile_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`hourly_profile` (standalone query)."""
    return f"""
    WITH hp_cells AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
             count(*) AS n, avg(value) AS av
      FROM {table} GROUP BY 1, 2
    ), hp_tot AS (
      SELECT event_type, sum(n) AS t FROM hp_cells GROUP BY event_type
    )
    SELECT c.event_type, c.hour, c.n,
           round(c.n * 1.0 / t.t, 6) AS share,
           round(c.av, 6) AS avg_value
    FROM hp_cells c JOIN hp_tot t USING (event_type)
    """


def session_stats(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ [user_id, n_sessions, n_events, avg_session_events,
    avg_duration_sec, bounce_rate] — the per-user rollup of
    :func:`sessionize`: how many sessions, how big, how long, and what
    fraction are single-event bounces. The second half of every product
    analytics funnel review (sessionize gives the rows, this gives the
    cohort-comparable user profile).

    Scale shape: inherits sessionize's ONE per-user window (bounded by a
    user's event count), then a per-user aggregate of the already-small
    session frame — no new shuffle beyond the user key it is already
    partitioned by.
    """
    s = sessionize(events, gap_sec=gap_sec)
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.round(F.avg(F.col("n_events") * 1.0), 6).alias("avg_session_events"),
        F.round(F.avg(F.col("duration_sec") * 1.0), 6).alias("avg_duration_sec"),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)) * 1.0
            / F.count("*"),
            6,
        ).alias("bounce_rate"),
    )


def session_stats_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB oracle for :func:`session_stats` (standalone query)."""
    return f"""
    WITH sstat AS ({sessionize_sql(gap_sec, table)})
    SELECT user_id, count(*) AS n_sessions, sum(n_events) AS n_events,
           round(avg(n_events * 1.0), 6) AS avg_session_events,
           round(avg(duration_sec * 1.0), 6) AS avg_duration_sec,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS bounce_rate
    FROM sstat GROUP BY user_id
    """


def attribution(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ [first_touch, n_users, n_converted, conversion_rate] —
    first-touch attribution: users are grouped by the type of their FIRST
    event (by (ts, event_id) — the deterministic tie-break every op in
    this module uses), and each group reports how many of its users ever
    performed the ``target`` event (any time, including as the first
    event itself). The "which acquisition channel converts" table.

    Scale shape: the first event is a per-user window rn=1 (bounded
    per-user partitions); the converter set is a distinct projection of
    the target-filtered stream (map-side combinable, tiny — broadcast
    into the left join); one |types|-cell final aggregate.
    """
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    first = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    conv = (
        e.where(F.col("event_type") == target)
        .select("user_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    return (
        first.join(F.broadcast(conv), "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce("_c", F.lit(0))).alias("n_converted"),
            F.round(
                F.sum(F.coalesce("_c", F.lit(0))) * 1.0 / F.count("*"), 6
            ).alias("conversion_rate"),
        )
    )


def attribution_sql(target: str = "purchase", table: str = "events") -> str:
    """DuckDB oracle for :func:`attribution` (standalone query)."""
    t = target.replace("'", "''")
    return f"""
    WITH at_e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), at_first AS (
      SELECT user_id, event_type AS first_touch FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_s, event_id) AS rn
        FROM at_e)
      WHERE rn = 1
    ), at_conv AS (
      SELECT DISTINCT user_id, 1 AS c FROM at_e WHERE event_type = '{t}'
    )
    SELECT f.first_touch, count(*) AS n_users,
           sum(coalesce(c.c, 0)) AS n_converted,
           round(sum(coalesce(c.c, 0)) * 1.0 / count(*), 6) AS conversion_rate
    FROM at_first f LEFT JOIN at_conv c USING (user_id)
    GROUP BY f.first_touch
    """


def time_to_convert(
    events: DataFrame, start: str = "signup", target: str = "purchase"
) -> DataFrame:
    """→ [stat, value] — latency distribution from a user's FIRST
    ``start`` event to their first ``target`` event AT OR AFTER it
    (seconds): converter count, mean, exact p25/p50/p75/p90, max. The
    time-to-value metric every growth dashboard tracks next to
    :func:`attribution`'s conversion rate — rate says how many, this says
    how long.

    Scale shape: two type-filtered per-user min aggregates (map-side
    combinable) + one hash join on user_id + ONE global aggregate over
    the O(converters) latency column (percentile sorts it once). No
    window over raw events.
    """
    e = events.select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    t0 = (
        e.where(F.col("event_type") == start)
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t0"))
    )
    lat = (
        e.where(F.col("event_type") == target)
        .join(t0, "user_id")
        .where(F.col("ts_s") >= F.col("t0"))
        .groupBy("user_id")
        .agg((F.min("ts_s") - F.first("t0")).alias("lat"))
    )
    ps = [0.25, 0.5, 0.75, 0.9]
    arr = ", ".join(f"{p}D" for p in ps)
    one = lat.agg(
        F.count("*").cast("double").alias("n_converted"),
        F.round(F.avg("lat"), 6).alias("mean_sec"),
        F.expr(f"percentile(lat, array({arr}))").alias("pct"),
        F.max("lat").cast("double").alias("max_sec"),
    )
    rows = (
        [
            F.struct(F.lit("n_converted").alias("stat"), F.col("n_converted").alias("value")),
            F.struct(F.lit("mean_sec").alias("stat"), F.col("mean_sec").alias("value")),
        ]
        + [
            F.struct(
                F.lit(f"p{int(p * 100)}_sec").alias("stat"),
                F.round(F.element_at("pct", i + 1), 6).alias("value"),
            )
            for i, p in enumerate(ps)
        ]
        + [F.struct(F.lit("max_sec").alias("stat"), F.col("max_sec").alias("value"))]
    )
    return one.select(F.explode(F.array(*rows)).alias("z")).select("z.*")


def time_to_convert_sql(
    start: str = "signup", target: str = "purchase", table: str = "events"
) -> str:
    """DuckDB oracle for :func:`time_to_convert` (standalone query)."""
    s = start.replace("'", "''")
    t = target.replace("'", "''")
    pcts = "\n    UNION ALL ".join(
        f"SELECT 'p{int(p * 100)}_sec' AS stat,"
        f" round(quantile_cont(lat, {p}), 6) AS value FROM tc_lat"
        for p in [0.25, 0.5, 0.75, 0.9]
    )
    return f"""
    WITH tc_e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), tc_t0 AS (
      SELECT user_id, min(ts_s) AS t0 FROM tc_e
      WHERE event_type = '{s}' GROUP BY user_id
    ), tc_lat AS (
      SELECT e.user_id, min(e.ts_s) - min(z.t0) AS lat
      FROM tc_e e JOIN tc_t0 z USING (user_id)
      WHERE e.event_type = '{t}' AND e.ts_s >= z.t0
      GROUP BY e.user_id
    )
    SELECT 'n_converted' AS stat, CAST(count(*) AS DOUBLE) AS value FROM tc_lat
    UNION ALL SELECT 'mean_sec', round(avg(lat), 6) FROM tc_lat
    UNION ALL {pcts}
    UNION ALL SELECT 'max_sec', CAST(max(lat) AS DOUBLE) FROM tc_lat
    """


def ab_test(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ one row ``[n_control, n_treatment, conv_control, conv_treatment,
    rate_control, rate_treatment, z_score]`` — a two-proportion z-test of
    "did the treatment arm convert more", with the variant assigned by a
    deterministic hash split of ``user_id`` (the engine-portable md5
    family, NOT engine-native hash()): control = even hash, treatment =
    odd. Conversion = the user has ≥ 1 ``target`` event. This is the
    evaluation half of every experimentation pipeline; the hash
    assignment doubles as an A/A harness (run it on a metric the split
    cannot affect and z should hover near 0, which is exactly what the
    synthetic corpus shows).

    Scale shape: one distinct-user shuffle, one filtered distinct for
    converters, a broadcast-sized left join, and a single-row conditional
    aggregate — z is computed in the final projection, no Python.
    ``z_score`` is NULL when either arm is empty or the pooled rate is
    degenerate (0 or 1), never a divide-by-zero.
    """
    from linkgraph_spark.functions.hashing import md5_long

    users = events.select("user_id").distinct().select(
        "user_id",
        (md5_long(F.col("user_id").cast("string")) % 2).alias("_variant"),
    )
    conv = (
        events.where(F.col("event_type") == target)
        .select("user_id")
        .distinct()
        .withColumn("_conv", F.lit(1))
    )
    per_user = users.join(conv, "user_id", "left").select(
        "_variant", F.coalesce("_conv", F.lit(0)).alias("_conv")
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("_variant") == 0, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(F.col("_variant") == 1, 1).otherwise(0)).alias("n_treatment"),
        F.sum(F.when(F.col("_variant") == 0, F.col("_conv")).otherwise(0)).alias(
            "conv_control"
        ),
        F.sum(F.when(F.col("_variant") == 1, F.col("_conv")).otherwise(0)).alias(
            "conv_treatment"
        ),
    )
    n0, n1 = F.col("n_control"), F.col("n_treatment")
    c0, c1 = F.col("conv_control"), F.col("conv_treatment")
    p0 = c0 * 1.0 / n0
    p1 = c1 * 1.0 / n1
    pp = (c0 + c1) * 1.0 / (n0 + n1)
    se = F.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
    z = F.when((n0 > 0) & (n1 > 0) & (pp > 0) & (pp < 1), (p1 - p0) / se)
    return agg.select(
        "n_control",
        "n_treatment",
        "conv_control",
        "conv_treatment",
        F.round(F.when(n0 > 0, p0), 6).alias("rate_control"),
        F.round(F.when(n1 > 0, p1), 6).alias("rate_treatment"),
        F.round(z, 6).alias("z_score"),
    )


def ab_test_sql(target: str = "purchase", table: str = "events") -> str:
    """DuckDB oracle for :func:`ab_test` — same md5 split, same pooled-SE
    z formula, same NULL guards."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    tgt = target.replace("'", "''")
    return f"""
    WITH ab_users AS (
      SELECT user_id, ({h}) % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM {table})
    ),
    ab_conv AS (
      SELECT DISTINCT user_id, 1 AS conv FROM {table}
      WHERE event_type = '{tgt}'
    ),
    ab_pu AS (
      SELECT u.variant, coalesce(c.conv, 0) AS conv
      FROM ab_users u LEFT JOIN ab_conv c USING (user_id)
    ),
    ab_agg AS (
      SELECT
        sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_control,
        sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_treatment,
        sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS conv_control,
        sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS conv_treatment
      FROM ab_pu
    )
    SELECT
      CAST(n_control AS BIGINT) AS n_control,
      CAST(n_treatment AS BIGINT) AS n_treatment,
      CAST(conv_control AS BIGINT) AS conv_control,
      CAST(conv_treatment AS BIGINT) AS conv_treatment,
      round(CASE WHEN n_control > 0
                 THEN conv_control * 1.0 / n_control END, 6) AS rate_control,
      round(CASE WHEN n_treatment > 0
                 THEN conv_treatment * 1.0 / n_treatment END, 6) AS rate_treatment,
      round(CASE WHEN n_control > 0 AND n_treatment > 0
                  AND (conv_control + conv_treatment) * 1.0
                      / (n_control + n_treatment) > 0
                  AND (conv_control + conv_treatment) * 1.0
                      / (n_control + n_treatment) < 1
                 THEN (conv_treatment * 1.0 / n_treatment
                       - conv_control * 1.0 / n_control)
                      / sqrt((conv_control + conv_treatment) * 1.0
                             / (n_control + n_treatment)
                             * (1 - (conv_control + conv_treatment) * 1.0
                                    / (n_control + n_treatment))
                             * (1.0 / n_control + 1.0 / n_treatment))
            END, 6) AS z_score
    FROM ab_agg
    """


def transition_entropy(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[user_id, n_trans, entropy]`` — per-user Shannon entropy (nats)
    of the event-type TRANSITION distribution: how predictable each user's
    next action is given the previous one. Transitions follow the exact
    :func:`markov_transitions` rule (ordered by ``(ts, event_id)``, a gap
    > ``gap_sec`` ends the chain); a bot replaying one loop scores ~0,
    organic exploration scores high — the behavioral twin of
    ``text.char_entropy``'s gibberish signal, and computed with the same
    single-division form ``H = ln n − (Σ c·ln c)/n`` so the FP op
    sequence matches the SQL oracle. Users with zero qualifying
    transitions report (0, 0.0).

    Scale shape: ONE user-keyed shuffle for the lag window, then two hash
    aggregates keyed by (user, src, dst) and user — both map-side
    combinable; per-user state is bounded by |event types|².
    """
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    lagged = e.select(
        "user_id",
        F.lag("event_type").over(wl).alias("src_type"),
        F.col("event_type").alias("dst_type"),
        (F.col("ts_s") - F.lag("ts_s").over(wl)).alias("gap"),
    )
    per = (
        lagged.where(F.col("src_type").isNotNull() & (F.col("gap") <= gap_sec))
        .groupBy("user_id", "src_type", "dst_type")
        .agg(F.count("*").alias("c"))
    )
    agg = per.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("_clogc"),
    )
    out = agg.select(
        "user_id",
        F.col("n").alias("n_trans"),
        F.round(
            F.log(F.col("n").cast("double")) - F.col("_clogc") / F.col("n"), 6
        ).alias("entropy"),
    )
    # Null-safe anti-join: a NULL user_id forms one lag-window group in
    # both engines, so it must appear exactly once (with its computed
    # entropy), never again as a "silent" row — plain equality would
    # never match NULL and duplicate it.
    users = events.select("user_id").distinct().alias("u")
    silent = users.join(
        out.alias("o"),
        F.col("u.user_id").eqNullSafe(F.col("o.user_id")),
        "left_anti",
    ).select(
        "user_id",
        F.lit(0).cast("long").alias("n_trans"),
        F.lit(0.0).alias("entropy"),
    )
    return out.unionByName(silent)


def transition_entropy_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB oracle for :func:`transition_entropy` (standalone query)."""
    return f"""
    WITH tee AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), tel AS (
      SELECT user_id,
             lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts_s, event_id) AS src_type,
             event_type AS dst_type,
             ts_s - lag(ts_s) OVER
               (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap
      FROM tee
    ), tep AS (
      SELECT user_id, src_type, dst_type, count(*) AS c
      FROM tel
      WHERE src_type IS NOT NULL AND gap <= {int(gap_sec)}
      GROUP BY 1, 2, 3
    ), tea AS (
      SELECT user_id, sum(c) AS n,
             sum(c * ln(CAST(c AS DOUBLE))) AS clogc
      FROM tep GROUP BY user_id
    ), teo AS (
      SELECT user_id, CAST(n AS BIGINT) AS n_trans,
             round(ln(CAST(n AS DOUBLE)) - clogc / n, 6) AS entropy
      FROM tea
    )
    SELECT * FROM teo
    UNION ALL
    SELECT DISTINCT e.user_id, 0, 0.0 FROM {table} e
    WHERE NOT EXISTS (
      SELECT 1 FROM teo WHERE teo.user_id IS NOT DISTINCT FROM e.user_id
    )
    """


def burstiness(events: DataFrame) -> DataFrame:
    """→ ``[event_type, n_gaps, mean_gap, b]`` — the Goh–Barabási
    burstiness coefficient B = (σ−μ)/(σ+μ) of the within-user same-type
    inter-arrival gaps, per event type: B→−1 is a metronome (cron), B≈0
    Poisson (organic), B→+1 heavy-tailed bursts (campaign/incident
    traffic). The one-number upgrade over :func:`inter_event_times`'s
    percentile profile for traffic-shape triage. σ is the SAMPLE
    standard deviation (``stddev_samp`` in both engines); B is NULL when
    fewer than 2 gaps exist or σ+μ = 0 (all-zero gaps).

    Plan shape: one lag window per (user, type) — same relation as
    :func:`inter_event_times` — then one grouped aggregate on the
    low-cardinality type key.
    """
    wl = Window.partitionBy("user_id", "event_type").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    gaps = e.select(
        "event_type",
        (F.col("ts_s") - F.lag("ts_s").over(wl)).cast("double").alias("gap"),
    ).where(F.col("gap").isNotNull())
    agg = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.avg("gap").alias("_mu"),
        F.stddev_samp("gap").alias("_sd"),
    )
    b = F.when(
        (F.col("n_gaps") >= 2) & (F.col("_sd") + F.col("_mu") > 0),
        F.round((F.col("_sd") - F.col("_mu")) / (F.col("_sd") + F.col("_mu")), 6),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        F.round("_mu", 6).alias("mean_gap"),
        b.alias("b"),
    )


def burstiness_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`burstiness` (standalone query)."""
    return f"""
    WITH bse AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), bsg AS (
      SELECT event_type,
             CAST(ts_s - lag(ts_s) OVER
               (PARTITION BY user_id, event_type ORDER BY ts_s, event_id)
               AS DOUBLE) AS gap
      FROM bse
    ), bsa AS (
      SELECT event_type, count(*) AS n_gaps,
             avg(gap) AS mu, stddev_samp(gap) AS sd
      FROM bsg WHERE gap IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           round(mu, 6) AS mean_gap,
           CASE WHEN n_gaps >= 2 AND sd + mu > 0
                THEN round((sd - mu) / (sd + mu), 6)
           END AS b
    FROM bsa
    """


def markov_stationary(
    events: DataFrame, gap_sec: int = 1800, iterations: int = 10
) -> DataFrame:
    """→ ``[event_type, pi]`` — the (approximate) stationary distribution
    of the first-order event-type Markov chain: power-iterate
    ``π' = πP`` for ``iterations`` rounds from uniform, where ``P`` is
    the :func:`markov_transitions` chain RESTRICTED to recurrent states
    (types with ≥1 outgoing transition; transitions into
    outgoing-transition-free sinks are dropped and each row
    re-normalized, so P is strictly stochastic and π sums to 1 with no
    leak). The long-run "where does a user's session actually live"
    weight per event type — the number funnel design and
    event-sampling budgets key on, and the principled replacement for
    raw event frequency when chains (not independent draws) generate
    the traffic.

    Scale shape: the chain matrix is ≤ |types|² rows BY CONSTRUCTION
    (the lag-window aggregate already reduced the event volume), so
    every iteration is a broadcast join + a ≤|types|-row grouped sum —
    the 100 TB cost is exactly one :func:`markov_transitions` pass.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    t = markov_transitions(events, gap_sec=gap_sec).select(
        "src_type", "dst_type", "n_trans"
    )
    states = t.select(F.col("src_type").alias("s")).distinct()
    restricted = t.join(
        states.select(F.col("s").alias("dst_type")), "dst_type"
    )
    totals = restricted.groupBy("src_type").agg(F.sum("n_trans").alias("_tot"))
    p = restricted.join(F.broadcast(totals), "src_type").select(
        "src_type",
        "dst_type",
        (F.col("n_trans") * 1.0 / F.col("_tot")).alias("p"),
    )
    n_states = states.count()
    if n_states == 0:
        return events.sparkSession.createDataFrame([], "event_type string, pi double")
    pi = states.select(
        F.col("s").alias("event_type"), F.lit(1.0 / n_states).alias("pi")
    )
    p = p.localCheckpoint()  # reused every round; pin it once
    for _ in range(iterations):
        pi = (
            p.join(
                pi.select(F.col("event_type").alias("src_type"), "pi"),
                "src_type",
            )
            .groupBy(F.col("dst_type").alias("event_type"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
        )
    return pi.select("event_type", F.round("pi", 6).alias("pi"))


def markov_stationary_sql(
    gap_sec: int = 1800, iterations: int = 10, table: str = "events"
) -> str:
    """DuckDB oracle for :func:`markov_stationary` — the power iteration
    unrolled as CTEs (PageRank-oracle convention: no intermediate
    rounding, final round to 6 dp absorbs sum-order ulp)."""
    ctes = [
        f"""mst AS (
      SELECT src_type, dst_type, count(*) AS n_trans FROM (
        SELECT lag(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts_s, event_id) AS src_type,
               event_type AS dst_type,
               ts_s - lag(ts_s) OVER
                 (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap
        FROM (SELECT user_id, event_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM {table})
      ) WHERE src_type IS NOT NULL AND gap <= {int(gap_sec)}
      GROUP BY 1, 2
    )""",
        """mss AS (SELECT DISTINCT src_type AS s FROM mst)""",
        """msr AS (
      SELECT t.src_type, t.dst_type, t.n_trans FROM mst t
      JOIN mss ON mss.s = t.dst_type
    )""",
        """msp AS MATERIALIZED (
      SELECT r.src_type, r.dst_type,
             r.n_trans * 1.0 / tt._tot AS p
      FROM msr r JOIN (
        SELECT src_type, sum(n_trans) AS _tot FROM msr GROUP BY src_type
      ) tt ON tt.src_type = r.src_type
    )""",
        """ms0 AS (
      SELECT s AS event_type, 1.0 / (SELECT count(*) FROM mss) AS pi FROM mss
    )""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""ms{k} AS MATERIALIZED (
      SELECT p.dst_type AS event_type, sum(r.pi * p.p) AS pi
      FROM ms{k - 1} r JOIN msp p ON p.src_type = r.event_type
      GROUP BY 1
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT event_type, round(pi, 6) AS pi FROM ms{iterations}
    """


def entry_exit_profile(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[event_type, n_events, n_entries, n_exits, n_bounces,
    entry_rate, exit_rate]`` — what role each event type plays in the
    session lifecycle: how often it OPENS a session (first event after a
    >``gap_sec`` silence), CLOSES one (last event before the next
    silence/stream end), or IS one entirely (a bounce: a single-event
    session). Same session rule as :func:`sessionize`. Landing-page /
    rage-quit analysis for event streams: a type with high exit_rate is
    where users abandon; a high-bounce type is a dead-end entry point.

    Plan shape: ONE shuffle on ``user_id`` for the lag+lead window
    (both directions ride the same sort), then one hash aggregate on
    the low-cardinality type key.
    """
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    gap_prev = F.col("ts_s") - F.lag("ts_s").over(wl)
    gap_next = F.lead("ts_s").over(wl) - F.col("ts_s")
    flagged = e.select(
        "event_type",
        (gap_prev.isNull() | (gap_prev > gap_sec)).cast("int").alias("is_entry"),
        (gap_next.isNull() | (gap_next > gap_sec)).cast("int").alias("is_exit"),
    )
    agg = flagged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("is_entry").alias("n_entries"),
        F.sum("is_exit").alias("n_exits"),
        F.sum(F.col("is_entry") * F.col("is_exit")).alias("n_bounces"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_entries",
        "n_exits",
        "n_bounces",
        F.round(F.col("n_entries") * 1.0 / F.col("n_events"), 6).alias("entry_rate"),
        F.round(F.col("n_exits") * 1.0 / F.col("n_events"), 6).alias("exit_rate"),
    )


def entry_exit_profile_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB oracle for :func:`entry_exit_profile` (standalone query)."""
    return f"""
    WITH ee AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), eef AS (
      SELECT event_type,
             CASE WHEN lag(ts_s) OVER w IS NULL
                    OR ts_s - lag(ts_s) OVER w > {int(gap_sec)}
                  THEN 1 ELSE 0 END AS is_entry,
             CASE WHEN lead(ts_s) OVER w IS NULL
                    OR lead(ts_s) OVER w - ts_s > {int(gap_sec)}
                  THEN 1 ELSE 0 END AS is_exit
      FROM ee WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ), eea AS (
      SELECT event_type, count(*) AS n_events,
             sum(is_entry) AS n_entries, sum(is_exit) AS n_exits,
             sum(is_entry * is_exit) AS n_bounces
      FROM eef GROUP BY event_type
    )
    SELECT event_type, n_events,
           CAST(n_entries AS BIGINT) AS n_entries,
           CAST(n_exits AS BIGINT) AS n_exits,
           CAST(n_bounces AS BIGINT) AS n_bounces,
           round(n_entries * 1.0 / n_events, 6) AS entry_rate,
           round(n_exits * 1.0 / n_events, 6) AS exit_rate
    FROM eea
    """


def value_percentiles(
    events: DataFrame, ps: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """→ ``[event_type, n, p50, p90, p99]`` (one column per requested
    percentile) — exact linear-interpolation percentiles of the
    ``value`` payload per event type: the revenue/latency/size
    distribution view (means hide the tail; the p99 is what pages).
    NULL values are excluded per SQL aggregate semantics — identical in
    both engines.

    Scale shape: ONE grouped aggregate (Spark ``percentile(value,
    array(...))`` sorts once per type-group); output is |types| rows.
    """
    arr = ", ".join(f"{float(p)}D" for p in ps)
    one = events.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.expr(f"percentile(value, array({arr}))").alias("_qs"),
    )
    cols = [
        F.round(F.element_at("_qs", i + 1), 6).alias(_p_name(p))
        for i, p in enumerate(ps)
    ]
    return one.select("event_type", "n", *cols)


def _p_name(p: float) -> str:
    return "p" + f"{float(p) * 100:g}".replace(".", "_")


def value_percentiles_sql(
    ps: tuple = (0.5, 0.9, 0.99), table: str = "events"
) -> str:
    """DuckDB oracle for :func:`value_percentiles` (quantile_cont shares
    Spark ``percentile``'s interpolation)."""
    cols = ",\n           ".join(
        f"round(quantile_cont(value, {float(p)}), 6) AS {_p_name(p)}" for p in ps
    )
    return f"""
    SELECT event_type, count(value) AS n,
           {cols}
    FROM {table} GROUP BY event_type
    """


def transition_latency(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[src_type, dst_type, n, p50_gap, p90_gap]`` — reaction-time
    percentiles per adjacent event-type transition (same chain rule as
    :func:`markov_transitions`): not just WHERE users go next but HOW
    FAST. A slow click→purchase p90 is checkout friction; an
    instantaneous view→view chain is a bot signature. The events-side
    mirror of the transcript :func:`~linkgraph_spark.transcripts.turn_latency`.

    Plan shape: one user-keyed lag window + ONE grouped aggregate on
    the |types|² transition key (exact percentiles sort within groups
    bounded by the pair's transition count).
    """
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    lagged = e.select(
        F.lag("event_type").over(wl).alias("src_type"),
        F.col("event_type").alias("dst_type"),
        (F.col("ts_s") - F.lag("ts_s").over(wl)).alias("gap"),
    )
    return (
        lagged.where(F.col("src_type").isNotNull() & (F.col("gap") <= gap_sec))
        .groupBy("src_type", "dst_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(gap, 0.5D)"), 6).alias("p50_gap"),
            F.round(F.expr("percentile(gap, 0.9D)"), 6).alias("p90_gap"),
        )
    )


def transition_latency_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB oracle for :func:`transition_latency` (standalone query)."""
    return f"""
    WITH tle AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), tll AS (
      SELECT lag(event_type) OVER w AS src_type,
             event_type AS dst_type,
             ts_s - lag(ts_s) OVER w AS gap
      FROM tle WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    )
    SELECT src_type, dst_type, count(*) AS n,
           round(quantile_cont(gap, 0.5), 6) AS p50_gap,
           round(quantile_cont(gap, 0.9), 6) AS p90_gap
    FROM tll
    WHERE src_type IS NOT NULL AND gap <= {int(gap_sec)}
    GROUP BY src_type, dst_type
    """


def hourly_autocorr(events: DataFrame, lags: tuple = (1, 24)) -> DataFrame:
    """→ one-row ``[n_hours, acf{k}...]`` — the event stream's rhythm
    check: Pearson correlation between the DENSE hourly count series
    (missing hours count as 0 — skipping them would splice unrelated
    hours together) and its ``k``-hour shift, for each requested lag.
    ``acf1`` near 1 says load drifts smoothly (autoscaling can track
    it); ``acf24`` is the daily-seasonality strength — the one number
    that says whether "same hour yesterday" is a valid traffic
    baseline for anomaly thresholds like :func:`rate_anomaly`'s.

    Each ``acf{k}`` is the correlation over the n−k overlapping pairs
    (explicit covar_pop/stddev_pop — NULL on zero variance or < 2
    pairs, pinned identically in both engines, same guard as
    ``kernels/stats.py::degree_assortativity``).

    Scale shape: ONE hash aggregate over E rows keyed on epoch-hour
    (map-side combinable; cardinality = wall-clock span, not data
    volume). Everything after — the dense spine (one sequence explode),
    the per-lag self-joins, the moment aggregates — runs on that tiny
    series. No windows over raw events, no driver loop.
    """
    if not lags or any(int(k) < 1 for k in lags):
        raise ValueError(f"lags must be positive ints, got {lags!r}")
    cnt = (
        events.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h")
        )
        .groupBy("h")
        .agg(F.count("*").alias("c"))
    )
    bounds = cnt.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("h"))
    series = spine.join(cnt, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).cast("double").alias("c")
    )
    out = series.agg(F.count("*").alias("n_hours"))
    for k in sorted(int(k) for k in lags):
        lead = series.select((F.col("h") - k).alias("h"), F.col("c").alias("y"))
        pairs = series.join(lead, "h").select(F.col("c").alias("x"), "y")
        mom = pairs.agg(
            F.covar_pop("x", "y").alias("cv"),
            F.stddev_pop("x").alias("sx"),
            F.stddev_pop("y").alias("sy"),
        ).select(
            F.round(
                F.when(
                    (F.col("sx") > 0) & (F.col("sy") > 0),
                    F.col("cv") / (F.col("sx") * F.col("sy")),
                ),
                6,
            ).alias(f"acf{k}")
        )
        out = out.crossJoin(mom)
    return out


def hourly_autocorr_sql(table: str = "events", lags: tuple = (1, 24)) -> str:
    """DuckDB oracle for :func:`hourly_autocorr` (standalone query)."""
    ks = sorted(int(k) for k in lags)
    lag_ctes = ",\n    ".join(
        f"""ha_m{k} AS (
      SELECT covar_pop(a.c, b.c) AS cv, stddev_pop(a.c) AS sx,
             stddev_pop(b.c) AS sy
      FROM ha_series a JOIN ha_series b ON b.h = a.h + {k}
    )"""
        for k in ks
    )
    sel = ", ".join(
        f"""(SELECT CASE WHEN sx > 0 AND sy > 0
              THEN round(cv / (sx * sy), 6) END FROM ha_m{k}) AS acf{k}"""
        for k in ks
    )
    return f"""
    WITH ha_cnt AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, count(*) AS c
      FROM {table} GROUP BY 1
    ),
    ha_bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM ha_cnt),
    ha_spine AS (
      SELECT unnest(range(mn, mx + 1)) AS h FROM ha_bounds
    ),
    ha_series AS (
      SELECT s.h, CAST(coalesce(c.c, 0) AS DOUBLE) AS c
      FROM ha_spine s LEFT JOIN ha_cnt c ON c.h = s.h
    ),
    {lag_ctes}
    SELECT (SELECT count(*) FROM ha_series) AS n_hours, {sel}
    """


def benford_values(events: DataFrame) -> DataFrame:
    """→ ``[digit, n, frac, benford]`` — first-significant-digit
    distribution of the positive ``value`` payload against Benford's
    law (P(d) = log₁₀(1 + 1/d)). Organic multi-scale amounts follow it;
    synthetic/fabricated or capped values don't — the classic fraud
    and data-fabrication screen, run here as an ingest integrity audit
    (a feed whose digit profile shifts re-priced, re-scaled, or started
    injecting defaults). All 9 digits always present (zero rows
    included) so the profile is comparable across runs.

    The digit is ``floor(v / 10^floor(log10 v))``: Java ``Math.log10``
    and C ``log10`` are both exact on powers of ten (Java by spec), so
    the engines bucket identically; non-positive and NULL values are
    excluded from ``n`` and the denominator.

    Scale shape: one map-only digit projection + a 9-key hash aggregate
    (map-side combinable), broadcast-joined onto a literal 9-row digit
    spine. Nothing bigger than 9 rows after the scan.
    """
    v = F.col("value")
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    cnt = (
        events.where(v > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    spine = events.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    tot = cnt.agg(F.sum("n").alias("_t"))
    return (
        spine.join(cnt, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.round(
                F.when(F.col("_t") > 0, F.coalesce("n", F.lit(0)) / F.col("_t")),
                6,
            ).alias("frac"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford"),
        )
    )


def benford_values_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`benford_values` (standalone query)."""
    return f"""
    WITH bf_cnt AS (
      SELECT CAST(floor(value / power(10, floor(log10(value)))) AS INT) AS digit,
             count(*) AS n
      FROM {table} WHERE value > 0
      GROUP BY 1
    ),
    bf_spine AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
    bf_tot AS (SELECT sum(n) AS t FROM bf_cnt)
    SELECT s.digit, coalesce(c.n, 0) AS n,
           CASE WHEN t > 0
                THEN round(coalesce(c.n, 0) * 1.0 / t, 6) END AS frac,
           round(log10(1.0 + 1.0 / s.digit), 6) AS benford
    FROM bf_spine s LEFT JOIN bf_cnt c ON c.digit = s.digit
    CROSS JOIN bf_tot
    """


def conversion_hazard(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    bucket_sec: int = 86400,
) -> DataFrame:
    """→ ``[day, n_converted, n_at_risk, hazard, survival]`` — the
    discrete conversion hazard curve: among users whose first
    ``from_type`` event starts the clock, the share of still-unconverted
    users who make their first at-or-after ``from_type`` ``to_type``
    event in each elapsed bucket (``hazard(d) = conv(d) / at_risk(d)``,
    Kaplan–Meier-style without censoring), plus the surviving
    (unconverted) fraction after the bucket. A hazard spiking at day 0
    then dying says conversion is impulse-only (retargeting budget is
    wasted); a flat hazard says the funnel keeps working — the
    time-resolved version of :func:`funnel`'s single number. Only
    buckets with at least one conversion appear.

    Scale shape: two per-user min-ts aggregates and one join — all
    keyed on ``user_id`` — then the hazard arithmetic runs on the tiny
    bucket table (one cumulative window over #buckets rows).
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    ts = F.unix_timestamp("ts")
    fv = (
        events.where(F.col("event_type") == from_type)
        .groupBy("user_id")
        .agg(F.min(ts).alias("fv"))
    )
    tv = events.where(F.col("event_type") == to_type).select(
        "user_id", ts.alias("pt")
    )
    conv = (
        fv.join(tv, "user_id")
        .where(F.col("pt") >= F.col("fv"))
        .groupBy("user_id")
        .agg(F.min(F.col("pt")).alias("fp"), F.first("fv").alias("fv2"))
        .select(
            F.floor((F.col("fp") - F.col("fv2")) / bucket_sec)
            .cast("long")
            .alias("day")
        )
    )
    per_day = conv.groupBy("day").agg(F.count("*").alias("n_converted"))
    total = fv.agg(F.count("*").alias("_t"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_day.crossJoin(F.broadcast(total)).select(
        "day",
        "n_converted",
        (F.col("_t") - (F.sum("n_converted").over(w) - F.col("n_converted"))).alias(
            "n_at_risk"
        ),
        (F.col("_t") - F.sum("n_converted").over(w)).alias("_left"),
        F.col("_t"),
    )
    return cum.select(
        "day",
        "n_converted",
        "n_at_risk",
        F.round(F.col("n_converted") / F.col("n_at_risk"), 6).alias("hazard"),
        F.round(F.col("_left") / F.col("_t"), 6).alias("survival"),
    )


def conversion_hazard_sql(
    table: str = "events",
    from_type: str = "view",
    to_type: str = "purchase",
    bucket_sec: int = 86400,
) -> str:
    """DuckDB oracle for :func:`conversion_hazard` (standalone query)."""
    W = int(bucket_sec)
    f, t = from_type.replace("'", "''"), to_type.replace("'", "''")
    return f"""
    WITH ch_fv AS (
      SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS fv
      FROM {table} WHERE event_type = '{f}' GROUP BY user_id
    ),
    ch_conv AS (
      SELECT CAST(floor((min(CAST(floor(epoch(e.ts)) AS BIGINT)) - v.fv)
                        * 1.0 / {W}) AS BIGINT) AS day
      FROM ch_fv v
      JOIN {table} e ON e.user_id = v.user_id
        AND e.event_type = '{t}'
        AND CAST(floor(epoch(e.ts)) AS BIGINT) >= v.fv
      GROUP BY v.user_id, v.fv
    ),
    ch_day AS (SELECT day, count(*) AS n_converted FROM ch_conv GROUP BY day),
    ch_tot AS (SELECT count(*) AS t FROM ch_fv),
    ch_cum AS (
      SELECT day, n_converted,
             t - (sum(n_converted) OVER w - n_converted) AS n_at_risk,
             t - sum(n_converted) OVER w AS lft, t
      FROM ch_day CROSS JOIN ch_tot
      WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    )
    SELECT day, n_converted, n_at_risk,
           round(n_converted * 1.0 / n_at_risk, 6) AS hazard,
           round(lft * 1.0 / t, 6) AS survival
    FROM ch_cum
    """


def rfm_segments(events: DataFrame) -> DataFrame:
    """→ ``[r, f, m, n_users]`` — classic RFM segmentation: per user the
    recency (days from their last event to the corpus max timestamp),
    frequency (event count) and monetary (summed ``value``, rounded to
    6dp before bucketing so both engines tie-break identically), each
    cut into terciles at the exact interpolated 1/3 and 2/3 quantiles
    (score 1 = lowest third of the VALUE — so r=1 is the most-recent
    cohort, f=3/m=3 the heavy spenders). The 27-cell grid every CRM
    mix report starts from, and a drift alarm when the cell masses
    shift between ingests.

    Scale shape: one user-keyed aggregate over E rows, one broadcast
    one-row quantile frame, one 27-key histogram aggregate. No windows
    over users.
    """
    ts = F.unix_timestamp("ts")
    per = events.groupBy("user_id").agg(
        F.max(ts).alias("last_ts"),
        F.count("*").cast("double").alias("freq"),
        F.round(F.sum("value"), 6).alias("mon"),
    )
    mx = events.agg(F.max(ts).alias("mx"))
    per = per.crossJoin(F.broadcast(mx)).select(
        F.floor((F.col("mx") - F.col("last_ts")) / 86400.0)
        .cast("double")
        .alias("rec"),
        "freq",
        "mon",
    )
    qs = per.agg(
        F.expr("percentile(rec, array(0.3333333333333333D, 0.6666666666666666D))").alias("qr"),
        F.expr("percentile(freq, array(0.3333333333333333D, 0.6666666666666666D))").alias("qf"),
        F.expr("percentile(mon, array(0.3333333333333333D, 0.6666666666666666D))").alias("qm"),
    )
    b = lambda c, q: (  # noqa: E731
        F.when(F.col(c) <= F.element_at(q, 1), 1)
        .when(F.col(c) <= F.element_at(q, 2), 2)
        .otherwise(3)
    )
    seg = per.crossJoin(F.broadcast(qs)).select(
        b("rec", F.col("qr")).alias("r"),
        b("freq", F.col("qf")).alias("f"),
        b("mon", F.col("qm")).alias("m"),
    )
    return seg.groupBy("r", "f", "m").agg(F.count("*").alias("n_users"))


def rfm_segments_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`rfm_segments` (standalone query)."""
    return f"""
    WITH rf_per AS (
      SELECT user_id,
             max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_ts,
             CAST(count(*) AS DOUBLE) AS freq,
             round(sum(value), 6) AS mon
      FROM {table} GROUP BY user_id
    ),
    rf_mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS mx FROM {table}),
    rf_v AS (
      SELECT CAST(floor((mx - last_ts) / 86400.0) AS DOUBLE) AS rec, freq, mon
      FROM rf_per CROSS JOIN rf_mx
    ),
    rf_q AS (
      SELECT quantile_cont(rec, 0.3333333333333333) AS qr1,
             quantile_cont(rec, 0.6666666666666666) AS qr2,
             quantile_cont(freq, 0.3333333333333333) AS qf1,
             quantile_cont(freq, 0.6666666666666666) AS qf2,
             quantile_cont(mon, 0.3333333333333333) AS qm1,
             quantile_cont(mon, 0.6666666666666666) AS qm2
      FROM rf_v
    )
    SELECT CASE WHEN rec <= qr1 THEN 1 WHEN rec <= qr2 THEN 2 ELSE 3 END AS r,
           CASE WHEN freq <= qf1 THEN 1 WHEN freq <= qf2 THEN 2 ELSE 3 END AS f,
           CASE WHEN mon <= qm1 THEN 1 WHEN mon <= qm2 THEN 2 ELSE 3 END AS m,
           count(*) AS n_users
    FROM rf_v CROSS JOIN rf_q
    GROUP BY 1, 2, 3
    """


def trigram_paths(
    events: DataFrame, gap_sec: int = 1800, top_n: int = 20
) -> DataFrame:
    """→ ``[t1, t2, t3, n]`` — the ``top_n`` most common three-step
    event-type paths under :func:`markov_transitions`' chain rule (per
    user ordered by ``(ts, event_id)``, both hops within ``gap_sec``;
    count ties break by the path lexicographically). The second-order
    readout the first-order Markov matrix smooths away — loops like
    view→click→view (pogo-sticking) and dead-end chains
    (click→error→error) are invisible in pairwise transitions but jump
    out of the trigram list.

    Scale shape: ONE shuffle on ``user_id`` for the double-lag window
    (per-user bounded), a |types|³-at-most keyed aggregate, and a
    TakeOrdered top-n — nothing global sorts.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    lagged = e.select(
        F.lag("event_type", 2).over(wl).alias("t1"),
        F.lag("event_type", 1).over(wl).alias("t2"),
        F.col("event_type").alias("t3"),
        (F.lag("ts_s", 1).over(wl) - F.lag("ts_s", 2).over(wl)).alias("g1"),
        (F.col("ts_s") - F.lag("ts_s", 1).over(wl)).alias("g2"),
    )
    tri = (
        lagged.where(
            F.col("t1").isNotNull()
            & (F.col("g1") <= gap_sec)
            & (F.col("g2") <= gap_sec)
        )
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n"))
    )
    return tri.orderBy(
        F.desc("n"), F.asc("t1"), F.asc("t2"), F.asc("t3")
    ).limit(top_n)


def trigram_paths_sql(
    table: str = "events", gap_sec: int = 1800, top_n: int = 20
) -> str:
    """DuckDB oracle for :func:`trigram_paths` (standalone query)."""
    G, N = int(gap_sec), int(top_n)
    return f"""
    WITH tp_e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ),
    tp_l AS (
      SELECT lag(event_type, 2) OVER w AS t1,
             lag(event_type, 1) OVER w AS t2,
             event_type AS t3,
             lag(ts_s, 1) OVER w - lag(ts_s, 2) OVER w AS g1,
             ts_s - lag(ts_s, 1) OVER w AS g2
      FROM tp_e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ),
    tp_tri AS (
      SELECT t1, t2, t3, count(*) AS n
      FROM tp_l
      WHERE t1 IS NOT NULL AND g1 <= {G} AND g2 <= {G}
      GROUP BY t1, t2, t3
    )
    SELECT t1, t2, t3, n FROM tp_tri
    ORDER BY n DESC, t1, t2, t3 LIMIT {N}
    """


def hourly_bursts(events: DataFrame, factor: float = 2.0) -> DataFrame:
    """→ ``[start_h, n_hours, total_events, peak]`` — burst episodes in
    the hourly event stream: maximal runs of consecutive epoch-hours
    whose DENSE count (missing hours are zeros) exceeds ``factor`` ×
    the exact median hourly count, with each run's start hour, length,
    volume, and peak. The triage view :func:`rate_anomaly`'s per-cell
    z-scores don't give — one 6-hour incident is one row here, not six
    scattered flags. Gaps-and-islands over the flagged hours
    (``h − row_number()``), all on the tiny hour series.

    Scale shape: one epoch-hour hash aggregate over E rows, then the
    dense spine, the one-row median, the flag filter, and the run
    aggregation all run on #hours rows.
    """
    if factor <= 0:
        raise ValueError(f"factor must be > 0, got {factor}")
    cnt = (
        events.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h")
        )
        .groupBy("h")
        .agg(F.count("*").alias("c"))
    )
    bounds = cnt.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("h"))
    series = spine.join(cnt, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).alias("c")
    )
    med = series.agg(
        F.round(F.expr("percentile(c, 0.5D)"), 6).alias("_med")
    )
    flagged = series.crossJoin(F.broadcast(med)).where(
        F.col("c") > F.lit(float(factor)) * F.col("_med")
    )
    w = Window.orderBy("h")
    runs = flagged.select(
        "h", "c", (F.col("h") - F.row_number().over(w)).alias("grp")
    )
    return runs.groupBy("grp").agg(
        F.min("h").alias("start_h"),
        F.count("*").alias("n_hours"),
        F.sum("c").alias("total_events"),
        F.max("c").alias("peak"),
    ).select("start_h", "n_hours", "total_events", "peak")


def hourly_bursts_sql(table: str = "events", factor: float = 2.0) -> str:
    """DuckDB oracle for :func:`hourly_bursts` (standalone query)."""
    fac = float(factor)
    return f"""
    WITH hb_cnt AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, count(*) AS c
      FROM {table} GROUP BY 1
    ),
    hb_b AS (SELECT min(h) AS mn, max(h) AS mx FROM hb_cnt),
    hb_sp AS (SELECT unnest(range(mn, mx + 1)) AS h FROM hb_b),
    hb_s AS (
      SELECT s.h, coalesce(c.c, 0) AS c
      FROM hb_sp s LEFT JOIN hb_cnt c ON c.h = s.h
    ),
    hb_m AS (SELECT round(quantile_cont(c, 0.5), 6) AS med FROM hb_s),
    hb_f AS (
      SELECT h, c FROM hb_s CROSS JOIN hb_m WHERE c > {fac!r} * med
    ),
    hb_r AS (
      SELECT h, c, h - row_number() OVER (ORDER BY h) AS grp FROM hb_f
    )
    SELECT min(h) AS start_h, count(*) AS n_hours,
           CAST(sum(c) AS BIGINT) AS total_events, max(c) AS peak
    FROM hb_r GROUP BY grp
    """


def attribution_paths(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ ``[first_touch, last_touch, n_users]`` — the joint
    first-touch × last-touch attribution table over CONVERTED users:
    the type of each user's first-ever event crossed with the type of
    their last event strictly before the first ``target`` (``(none)``
    when the conversion WAS their first event). :func:`attribution`
    answers "which channel acquires"; the diagonal-vs-off-diagonal mass
    here settles the first-vs-last-touch budget argument with data —
    off-diagonal rows are journeys where the closer differs from the
    opener, exactly the rows the two models fight over.

    Scale shape: one per-user window for the first event, one min-ts
    aggregate for the conversion time, one filtered per-user max for
    the closer — all user-keyed and per-user bounded; final aggregate
    is at most |types|²+|types| cells.
    """
    ts = F.unix_timestamp("ts")
    e = events.select(
        "user_id", "event_id", "event_type", ts.alias("ts_s")
    )
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    first = (
        e.withColumn("_rn", F.row_number().over(wl))
        .where(F.col("_rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    conv = (
        e.where(F.col("event_type") == target)
        .groupBy("user_id")
        .agg(F.min(F.struct("ts_s", "event_id")).alias("c"))
        .select("user_id", F.col("c.ts_s").alias("cts"), F.col("c.event_id").alias("cid"))
    )
    pre = e.join(conv, "user_id").where(
        (F.col("ts_s") < F.col("cts"))
        | ((F.col("ts_s") == F.col("cts")) & (F.col("event_id") < F.col("cid")))
    )
    last = (
        pre.groupBy("user_id")
        .agg(F.max(F.struct("ts_s", "event_id", "event_type")).alias("l"))
        .select("user_id", F.col("l.event_type").alias("last_touch"))
    )
    j = (
        conv.select("user_id")
        .join(first, "user_id")
        .join(last, "user_id", "left")
        .select(
            "first_touch",
            F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        )
    )
    return j.groupBy("first_touch", "last_touch").agg(
        F.count("*").alias("n_users")
    )


def attribution_paths_sql(target: str = "purchase", table: str = "events") -> str:
    """DuckDB oracle for :func:`attribution_paths` (standalone query)."""
    t = target.replace("'", "''")
    return f"""
    WITH ap_e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ),
    ap_first AS (
      SELECT user_id, event_type AS first_touch FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_s, event_id) AS rn
        FROM ap_e
      ) WHERE rn = 1
    ),
    ap_conv AS (
      SELECT user_id, ts_s AS cts, event_id AS cid FROM (
        SELECT user_id, ts_s, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_s, event_id) AS rn
        FROM ap_e WHERE event_type = '{t}'
      ) WHERE rn = 1
    ),
    ap_last AS (
      SELECT user_id, event_type AS last_touch FROM (
        SELECT e.user_id, e.event_type,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts_s DESC, e.event_id DESC) AS rn
        FROM ap_e e JOIN ap_conv c ON c.user_id = e.user_id
        WHERE e.ts_s < c.cts OR (e.ts_s = c.cts AND e.event_id < c.cid)
      ) WHERE rn = 1
    )
    SELECT f.first_touch,
           coalesce(l.last_touch, '(none)') AS last_touch,
           count(*) AS n_users
    FROM ap_conv c
    JOIN ap_first f ON f.user_id = c.user_id
    LEFT JOIN ap_last l ON l.user_id = c.user_id
    GROUP BY 1, 2
    """


def entropy_rate(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ one-row ``[n_transitions, n_states, entropy_rate_bits,
    max_bits, efficiency]`` — the empirical entropy rate of the
    event-type chain: ``H = −Σ_{s,t} (n_st/N)·log₂ P(t|s)`` over
    :func:`markov_transitions`' counts (source weights are the
    empirical transition frequencies, conditionals the same rounded
    ``prob`` both engines emit). ``max_bits = log₂(#source states)``
    and ``efficiency = 1 − H/max`` is Shannon's redundancy: near 0 the
    stream is a random walk over types (sequence features are
    worthless); near 1 it's deterministic (one bot loop pretending to
    be traffic). The one-number summary over
    :func:`~linkgraph_spark.functions.events.transition_entropy`-style
    per-state detail.

    Scale shape: everything after :func:`markov_transitions`' ONE
    user-keyed window runs on the ≤ |types|² transition table.
    """
    P = markov_transitions(events, gap_sec=gap_sec)
    tot = P.agg(
        F.sum("n_trans").alias("N"),
        F.countDistinct("src_type").alias("n_states"),
    )
    h = (
        P.crossJoin(F.broadcast(tot))
        .agg(
            F.first("N").alias("n_transitions"),
            F.first("n_states").alias("n_states"),
            F.round(
                -F.sum(F.col("n_trans") / F.col("N") * F.log2("prob")), 6
            ).alias("entropy_rate_bits"),
        )
    )
    mx = F.log2(F.col("n_states").cast("double"))
    return h.select(
        "n_transitions",
        "n_states",
        "entropy_rate_bits",
        F.round(mx, 6).alias("max_bits"),
        F.round(
            F.when(mx > 0, 1.0 - F.col("entropy_rate_bits") / mx), 6
        ).alias("efficiency"),
    )


def entropy_rate_sql(table: str = "events", gap_sec: int = 1800) -> str:
    """DuckDB oracle for :func:`entropy_rate` (standalone query)."""
    return f"""
    WITH er_p AS (
      SELECT * FROM ({markov_transitions_sql(gap_sec, table)})
    ),
    er_t AS (
      SELECT sum(n_trans) AS N, count(DISTINCT src_type) AS n_states
      FROM er_p
    ),
    er_h AS (
      SELECT first(t.N) AS n_transitions, first(t.n_states) AS n_states,
             round(-sum(p.n_trans * 1.0 / t.N * log2(p.prob)), 6)
               AS entropy_rate_bits
      FROM er_p p CROSS JOIN er_t t
    )
    SELECT CAST(n_transitions AS BIGINT) AS n_transitions, n_states,
           entropy_rate_bits,
           round(log2(CAST(n_states AS DOUBLE)), 6) AS max_bits,
           CASE WHEN n_states > 1
                THEN round(1.0 - entropy_rate_bits
                           / log2(CAST(n_states AS DOUBLE)), 6) END
             AS efficiency
    FROM er_h
    """


def dow_profile(events: DataFrame) -> DataFrame:
    """→ ``[dow, n_events, share, avg_value, total_value]`` — the
    day-of-week seasonality profile (0 = Monday .. 6 = Sunday, computed
    as ``(epoch_day + 3) % 7`` so both engines share one convention
    instead of their conflicting ``dayofweek`` builtins). The weekly
    rhythm :func:`hourly_profile` folds away — weekday/weekend mix
    drives batch-window and anomaly-baseline choices one level above
    the hourly curve, and ``total_value`` adds the revenue weighting
    counts alone hide.

    Scale shape: one map-only projection + one 7-cell hash aggregate
    (map-side combinable); the share normalizer is a window over ≤ 7
    rows.
    """
    dow = (
        (F.floor(F.unix_timestamp("ts") / 86400) + 3) % 7
    ).cast("int")
    cells = events.select(dow.alias("dow"), "value").groupBy("dow").agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    w = Window.partitionBy()
    return cells.select(
        "dow",
        "n_events",
        F.round(F.col("n_events") / F.sum("n_events").over(w), 6).alias("share"),
        "avg_value",
        "total_value",
    )


def dow_profile_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`dow_profile` (standalone query)."""
    return f"""
    WITH dp_cells AS (
      SELECT CAST((floor(epoch(ts) / 86400) + 3) % 7 AS INTEGER) AS dow,
             count(*) AS n_events,
             round(avg(value), 6) AS avg_value,
             round(sum(value), 6) AS total_value
      FROM {table} GROUP BY 1
    )
    SELECT dow, n_events,
           round(n_events / (sum(n_events) OVER ()), 6) AS share,
           avg_value, total_value
    FROM dp_cells
    """


def session_depth_curve(
    events: DataFrame, gap_sec: int = 1800, max_depth: int = 20
) -> DataFrame:
    """→ ``[depth, n_sessions, survival]`` — the session-depth survival
    curve: for every depth 1..``max_depth``, how many sessions (by
    :func:`sessionize`'s gap rule) contain at least that many events,
    and the fraction of all sessions that do. The engagement funnel
    behind a single mean-session-length number — a cliff at depth 2 is
    the bounce wall, and the tail slope is what retention features
    actually model.

    Scale shape: :func:`sessionize`'s one user-keyed window, a session
    count histogram, then a suffix cumulative sum over ≤ max observed
    depth rows joined to a ``max_depth``-row spine.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    sess = sessionize(events, gap_sec=gap_sec).select("n_events")
    hist = sess.groupBy(F.col("n_events").alias("sz")).agg(
        F.count("*").alias("c")
    )
    tot = hist.agg(F.sum("c").alias("_t"))
    spine = events.sparkSession.range(1, max_depth + 1).select(
        F.col("id").alias("depth")
    )
    j = spine.join(hist, F.col("sz") >= F.col("depth"), "left")
    out = j.groupBy("depth").agg(
        F.sum(F.coalesce("c", F.lit(0))).alias("n_sessions")
    )
    return out.crossJoin(F.broadcast(tot)).select(
        "depth",
        "n_sessions",
        F.round(F.col("n_sessions") / F.col("_t"), 6).alias("survival"),
    )


def session_depth_curve_sql(
    table: str = "events", gap_sec: int = 1800, max_depth: int = 20
) -> str:
    """DuckDB oracle for :func:`session_depth_curve` (standalone)."""
    G, D = int(gap_sec), int(max_depth)
    return f"""
    WITH sd_e AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ),
    sd_l AS (
      SELECT user_id, ts_s, event_id,
             CASE WHEN ts_s - lag(ts_s) OVER w IS NULL
                       OR ts_s - lag(ts_s) OVER w > {G} THEN 1 ELSE 0 END AS ns
      FROM sd_e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ),
    sd_s AS (
      SELECT user_id,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM sd_l
    ),
    sd_hist AS (
      SELECT sz, count(*) AS c FROM (
        SELECT count(*) AS sz FROM sd_s GROUP BY user_id, sid
      ) GROUP BY sz
    ),
    sd_tot AS (SELECT sum(c) AS t FROM sd_hist),
    sd_spine AS (SELECT unnest(range(1, {D + 1})) AS depth)
    SELECT s.depth,
           CAST(coalesce(sum(h.c), 0) AS BIGINT) AS n_sessions,
           round(coalesce(sum(h.c), 0) * 1.0 / first(t.t), 6) AS survival
    FROM sd_spine s
    LEFT JOIN sd_hist h ON h.sz >= s.depth
    CROSS JOIN sd_tot t
    GROUP BY s.depth
    """


def type_user_jaccard(events: DataFrame) -> DataFrame:
    """→ ``[type_a, type_b, n_a, n_b, inter, jaccard]`` — user-base
    overlap between event types: for every unordered type pair, the
    Jaccard of their distinct-user sets. Where :func:`session_pairs`
    measures within-session co-occurrence lift, this is the audience
    view — error's user set engulfing purchase's names the cohort to
    triage, and a near-zero overlap between view and signup says the
    funnels serve different populations. All pairs emitted, including
    zero-overlap ones.

    Scale shape: one (type, user) dedup aggregate, one user-keyed
    self-equi-join between type sets (each user contributes
    |their types|² ≤ |types|² rows), |types|-row cross join for the
    pair spine. Nothing groups by user beyond the dedup.
    """
    tu = events.select("event_type", "user_id").distinct()
    cnt = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("inter"))
    )
    ca = cnt.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    pairs = ca.crossJoin(cb).where(F.col("type_a") < F.col("type_b"))
    return pairs.join(inter, ["type_a", "type_b"], "left").select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        F.coalesce("inter", F.lit(0)).alias("inter"),
        F.round(
            F.coalesce("inter", F.lit(0))
            / (F.col("n_a") + F.col("n_b") - F.coalesce("inter", F.lit(0))),
            6,
        ).alias("jaccard"),
    )


def type_user_jaccard_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`type_user_jaccard` (standalone query)."""
    return f"""
    WITH tj_tu AS (
      SELECT DISTINCT event_type, user_id FROM {table}
    ),
    tj_c AS (SELECT event_type, count(*) AS n FROM tj_tu GROUP BY event_type),
    tj_i AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS inter
      FROM tj_tu a JOIN tj_tu b
        ON b.user_id = a.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT ca.event_type AS type_a, cb.event_type AS type_b,
           ca.n AS n_a, cb.n AS n_b,
           coalesce(i.inter, 0) AS inter,
           round(coalesce(i.inter, 0) * 1.0
                 / (ca.n + cb.n - coalesce(i.inter, 0)), 6) AS jaccard
    FROM tj_c ca
    JOIN tj_c cb ON ca.event_type < cb.event_type
    LEFT JOIN tj_i i ON i.type_a = ca.event_type AND i.type_b = cb.event_type
    """


def repeat_purchase(events: DataFrame, target: str = "purchase") -> DataFrame:
    """→ ``[n_purchases, n_users, user_share, value_share]`` — the repeat
    histogram: users bucketed by how many ``target`` events they fired
    (bucket 0 = never), each bucket's share of users and of total
    ``target`` value. The loyalty curve behind
    :func:`rfm_segments`' frequency tercile — value_share concentrating
    in the high-count buckets is the repeat business every retention
    budget assumes, and a value-heavy 1-bucket says growth is all
    first-time (or fraud rotating accounts).

    Scale shape: one user-keyed aggregate over the target-filtered
    stream, an anti-join-free left join from the full user universe,
    then a tiny count-keyed histogram with two share windows over its
    rows.
    """
    per = (
        events.where(F.col("event_type") == target)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("np"),
            F.round(F.sum("value"), 6).alias("val"),
        )
    )
    users = events.select("user_id").distinct()
    j = users.join(per, "user_id", "left").select(
        F.coalesce("np", F.lit(0)).alias("n_purchases"),
        F.coalesce("val", F.lit(0.0)).alias("val"),
    )
    hist = j.groupBy("n_purchases").agg(
        F.count("*").alias("n_users"), F.sum("val").alias("_v")
    )
    w = Window.partitionBy()
    return hist.select(
        "n_purchases",
        "n_users",
        F.round(F.col("n_users") / F.sum("n_users").over(w), 6).alias(
            "user_share"
        ),
        F.round(
            F.when(
                F.sum("_v").over(w) > 0, F.col("_v") / F.sum("_v").over(w)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("value_share"),
    )


def repeat_purchase_sql(table: str = "events", target: str = "purchase") -> str:
    """DuckDB oracle for :func:`repeat_purchase` (standalone query)."""
    t = target.replace("'", "''")
    return f"""
    WITH rp_per AS (
      SELECT user_id, count(*) AS np, round(sum(value), 6) AS val
      FROM {table} WHERE event_type = '{t}' GROUP BY user_id
    ),
    rp_u AS (SELECT DISTINCT user_id FROM {table}),
    rp_j AS (
      SELECT coalesce(p.np, 0) AS n_purchases, coalesce(p.val, 0.0) AS val
      FROM rp_u u LEFT JOIN rp_per p ON p.user_id = u.user_id
    ),
    rp_h AS (
      SELECT n_purchases, count(*) AS n_users, sum(val) AS v
      FROM rp_j GROUP BY n_purchases
    )
    SELECT n_purchases, n_users,
           round(n_users / (sum(n_users) OVER ()), 6) AS user_share,
           round(CASE WHEN sum(v) OVER () > 0
                      THEN v / (sum(v) OVER ()) ELSE 0.0 END, 6) AS value_share
    FROM rp_h
    """


def entry_exit_matrix(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[entry_type, exit_type, n_sessions, share]`` — the joint
    entry×exit table over sessions (:func:`sessionize`'s gap rule):
    which event type OPENED each session crossed with which CLOSED it
    (single-event sessions land on the diagonal). The joint view behind
    :func:`entry_exit_profile`'s marginals — a heavy
    (view, error) cell is the journey that starts fine and dies, which
    no per-type entry or exit rate can show.

    Scale shape: one user-keyed session window (per-user bounded), one
    per-session first/last aggregate via min/max over the (ts, event_id,
    type) ordering struct, one ≤ |types|² histogram with a share window
    over its cells.
    """
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    gap = F.col("ts_s") - F.lag("ts_s").over(wl)
    new_sess = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    sessed = e.select(
        "user_id",
        "ts_s",
        "event_id",
        "event_type",
        F.sum(new_sess).over(w).alias("sid"),
    )
    per = sessed.groupBy("user_id", "sid").agg(
        F.min(F.struct("ts_s", "event_id", "event_type")).alias("fst"),
        F.max(F.struct("ts_s", "event_id", "event_type")).alias("lst"),
    )
    cells = per.select(
        F.col("fst.event_type").alias("entry_type"),
        F.col("lst.event_type").alias("exit_type"),
    ).groupBy("entry_type", "exit_type").agg(F.count("*").alias("n_sessions"))
    ww = Window.partitionBy()
    return cells.select(
        "entry_type",
        "exit_type",
        "n_sessions",
        F.round(F.col("n_sessions") / F.sum("n_sessions").over(ww), 6).alias(
            "share"
        ),
    )


def entry_exit_matrix_sql(table: str = "events", gap_sec: int = 1800) -> str:
    """DuckDB oracle for :func:`entry_exit_matrix` (standalone query)."""
    G = int(gap_sec)
    return f"""
    WITH em_e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ),
    em_l AS (
      SELECT user_id, ts_s, event_id, event_type,
             CASE WHEN ts_s - lag(ts_s) OVER w IS NULL
                       OR ts_s - lag(ts_s) OVER w > {G} THEN 1 ELSE 0 END AS ns
      FROM em_e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ),
    em_s AS (
      SELECT user_id, ts_s, event_id, event_type,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM em_l
    ),
    em_fst AS (
      SELECT user_id, sid, event_type AS entry_type FROM (
        SELECT user_id, sid, event_type,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts_s, event_id) AS rn
        FROM em_s
      ) WHERE rn = 1
    ),
    em_lst AS (
      SELECT user_id, sid, event_type AS exit_type FROM (
        SELECT user_id, sid, event_type,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts_s DESC, event_id DESC) AS rn
        FROM em_s
      ) WHERE rn = 1
    ),
    em_per AS (
      SELECT f.user_id, f.sid, f.entry_type, l.exit_type
      FROM em_fst f JOIN em_lst l
        ON l.user_id = f.user_id AND l.sid = f.sid
    ),
    em_c AS (
      SELECT entry_type, exit_type, count(*) AS n_sessions
      FROM em_per GROUP BY entry_type, exit_type
    )
    SELECT entry_type, exit_type, n_sessions,
           round(n_sessions / (sum(n_sessions) OVER ()), 6) AS share
    FROM em_c
    """


def growth_accounting(events: DataFrame) -> DataFrame:
    """→ ``[week, n_new, n_retained, n_resurrected, n_churned,
    quick_ratio]`` — standard weekly growth accounting over event
    activity. Each active (user, week) is classified: *new* (first-ever
    active week), *retained* (also active the immediately previous
    week), *resurrected* (active before, but not last week); *churned*
    at week w counts users active at w−1 but not at w (attributed to w,
    reported only for weeks ≤ the last observed week). quick_ratio =
    (new + resurrected) / churned, NULL when nothing churned — the
    classic "is the water level rising" growth health metric that
    :func:`dau_wau` stickiness can't answer (it has no user identity
    across weeks).

    Week key = floor(epoch/604800) — the same fixed-epoch binning as the
    other weekly operators (no calendar/TZ dependence, replayable in
    both engines).

    Scale shape: one distinct over (user, week), one per-user lag/lead
    window (bounded by a user's active weeks), two ≤|weeks| histograms
    full-outer-joined; the global max week is a 1-row agg broadcast back
    via cross join — no global window touches the big frame.
    """
    uw = (
        events.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / F.lit(604800)).alias("week"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("week")
    lab = uw.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_w"),
        F.lead("week").over(w).alias("next_w"),
    )
    status = lab.select(
        "week",
        F.when(F.col("prev_w").isNull(), F.lit("new"))
        .when(F.col("prev_w") == F.col("week") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("status"),
    )
    counts = status.groupBy("week").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias("n_new"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).alias(
            "n_retained"
        ),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0)).alias(
            "n_resurrected"
        ),
    )
    maxw = uw.agg(F.max("week").alias("max_week"))
    churn = (
        lab.join(F.broadcast(maxw), F.lit(True))
        .where(
            (F.col("next_w").isNull() | (F.col("next_w") > F.col("week") + 1))
            & (F.col("week") + 1 <= F.col("max_week"))
        )
        .groupBy((F.col("week") + 1).alias("week"))
        .agg(F.count("*").alias("n_churned"))
    )
    out = counts.join(churn, "week", "full").select(
        "week",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
        F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
        F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
    )
    return out.select(
        "*",
        F.round(
            F.when(
                F.col("n_churned") > 0,
                (F.col("n_new") + F.col("n_resurrected")) / F.col("n_churned"),
            ),
            6,
        ).alias("quick_ratio"),
    )


def growth_accounting_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`growth_accounting` (standalone query)."""
    return f"""
    WITH ga_uw AS MATERIALIZED (
      SELECT DISTINCT user_id,
             CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week
      FROM {table}
    ),
    ga_lab AS (
      SELECT user_id, week,
             lag(week) OVER w AS prev_w, lead(week) OVER w AS next_w
      FROM ga_uw WINDOW w AS (PARTITION BY user_id ORDER BY week)
    ),
    ga_counts AS (
      SELECT week,
             sum(CASE WHEN prev_w IS NULL THEN 1 ELSE 0 END) AS n_new,
             sum(CASE WHEN prev_w = week - 1 THEN 1 ELSE 0 END) AS n_retained,
             sum(CASE WHEN prev_w IS NOT NULL AND prev_w < week - 1
                      THEN 1 ELSE 0 END) AS n_resurrected
      FROM ga_lab GROUP BY week
    ),
    ga_max AS (SELECT max(week) AS max_week FROM ga_uw),
    ga_churn AS (
      SELECT week + 1 AS week, count(*) AS n_churned
      FROM ga_lab, ga_max
      WHERE (next_w IS NULL OR next_w > week + 1) AND week + 1 <= max_week
      GROUP BY week + 1
    ),
    ga_out AS (
      SELECT coalesce(c.week, ch.week) AS week,
             coalesce(c.n_new, 0) AS n_new,
             coalesce(c.n_retained, 0) AS n_retained,
             coalesce(c.n_resurrected, 0) AS n_resurrected,
             coalesce(ch.n_churned, 0) AS n_churned
      FROM ga_counts c FULL JOIN ga_churn ch ON ch.week = c.week
    )
    SELECT week, n_new, n_retained, n_resurrected, n_churned,
           CASE WHEN n_churned > 0
                THEN round((n_new + n_resurrected) * 1.0 / n_churned, 6) END
             AS quick_ratio
    FROM ga_out
    """


def active_days_hist(events: DataFrame) -> DataFrame:
    """→ ``[n_active_days, n_users, share]`` — the power-user curve:
    users histogrammed by how many distinct UTC days they were active.
    The standard companion to :func:`dau_wau` stickiness and
    :func:`growth_accounting`: a mass at 1 day is drive-by traffic, a
    fat tail is a habit product — and the curve is what an engagement-
    weighted training-data sampler would stratify on. Day key =
    floor(epoch/86400) (fixed-epoch binning, TZ-free, same convention
    as the weekly operators).

    Scale shape: one distinct over (user, day), one per-user count, one
    ≤|distinct day-counts| histogram with a share window over its cells
    (post-agg, tiny). No per-user windows.
    """
    ud = (
        events.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / F.lit(86400)).alias("day"),
        )
        .distinct()
    )
    per_user = ud.groupBy("user_id").agg(F.count("*").alias("n_active_days"))
    hist = per_user.groupBy("n_active_days").agg(F.count("*").alias("n_users"))
    w = Window.partitionBy()
    return hist.select(
        "n_active_days",
        "n_users",
        F.round(F.col("n_users") / F.sum("n_users").over(w), 6).alias("share"),
    )


def active_days_hist_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`active_days_hist` (standalone query)."""
    return f"""
    WITH ad_ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day
      FROM {table}
    ),
    ad_per AS (
      SELECT user_id, count(*) AS n_active_days FROM ad_ud GROUP BY user_id
    ),
    ad_h AS (
      SELECT n_active_days, count(*) AS n_users
      FROM ad_per GROUP BY n_active_days
    )
    SELECT n_active_days, n_users,
           round(n_users * 1.0 / (sum(n_users) OVER ()), 6) AS share
    FROM ad_h
    """


def session_gap_dist(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """→ ``[log2_gap, n_gaps, share]`` — the distribution of idle time
    BETWEEN a user's consecutive sessions (next session's start minus
    previous session's end, epoch seconds), log₂-bucketed. The
    between-session complement of :func:`inter_event_times` (which mixes
    within- and cross-session gaps): its shape is what justifies — or
    indicts — the ``gap_sec`` cutoff :func:`sessionize` hard-codes, and
    return-time distributions are the standard input to churn/habit
    models. Every gap exceeds ``gap_sec`` by construction, so the
    buckets start at floor(log2(gap_sec)).

    Scale shape: the sessionize window (per-user, bounded), one per-user
    lag window over the ≤ sessions-per-user frame, one ≤ ~40-bucket
    histogram with a share window over the aggregated cells.
    """
    s = sessionize(events, gap_sec=gap_sec)
    w = Window.partitionBy("user_id").orderBy("session_idx")
    gaps = (
        s.select(
            "user_id",
            "session_idx",
            "start_ts",
            F.lag("end_ts").over(w).alias("prev_end"),
        )
        .where(F.col("prev_end").isNotNull())
        .select(
            F.floor(F.log2(F.col("start_ts") - F.col("prev_end"))).alias(
                "log2_gap"
            )
        )
    )
    hist = gaps.groupBy("log2_gap").agg(F.count("*").alias("n_gaps"))
    ww = Window.partitionBy()
    return hist.select(
        "log2_gap",
        "n_gaps",
        F.round(F.col("n_gaps") / F.sum("n_gaps").over(ww), 6).alias("share"),
    )


def session_gap_dist_sql(table: str = "events", gap_sec: int = 1800) -> str:
    """DuckDB oracle for :func:`session_gap_dist` — wraps the
    :func:`sessionize_sql` query and buckets identically."""
    return f"""
    WITH sgd_s AS MATERIALIZED (
      SELECT * FROM ({sessionize_sql(gap_sec=gap_sec, table=table)})
    ),
    sgd_g AS (
      SELECT CAST(floor(log2(start_ts - prev_end)) AS BIGINT) AS log2_gap
      FROM (
        SELECT user_id, start_ts,
               lag(end_ts) OVER (PARTITION BY user_id
                                 ORDER BY session_idx) AS prev_end
        FROM sgd_s
      ) WHERE prev_end IS NOT NULL
    ),
    sgd_h AS (
      SELECT log2_gap, count(*) AS n_gaps FROM sgd_g GROUP BY log2_gap
    )
    SELECT log2_gap, n_gaps,
           round(n_gaps * 1.0 / (sum(n_gaps) OVER ()), 6) AS share
    FROM sgd_h
    """


def cohort_value(events: DataFrame) -> DataFrame:
    """→ ``[cohort_week, week_offset, total_value, value_per_user,
    cum_value_per_user]`` — the LTV triangle: users cohorted by the ISO
    week of their first event (same convention as
    :func:`retention_cohorts`), each cell summing the cohort's event
    ``value`` ``week_offset`` weeks later, normalized by cohort size,
    plus the running cumulative value per user — the curve whose
    plateau IS the cohort's lifetime value. :func:`retention_cohorts`
    says how many come back; this says what their coming back is worth.

    Scale shape: one distinct-first-week agg, one per-(cohort, offset)
    sum over the event stream (map-side combinable), a broadcast cohort-
    size join, and a cumulative window over ≤ |offsets| rows per cohort
    (post-agg, tiny). The raw stream is touched exactly twice, both
    shuffle-by-small-key.
    """
    wk = F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("wk_s")
    user_weeks = events.select("user_id", wk).distinct()
    first = user_weeks.groupBy("user_id").agg(F.min("wk_s").alias("cohort_s"))
    sizes = first.groupBy("cohort_s").agg(F.count("*").alias("_n"))
    vals = (
        events.select("user_id", wk, "value")
        .join(first, "user_id")
        .groupBy(
            "cohort_s",
            ((F.col("wk_s") - F.col("cohort_s")) / F.lit(604800))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.sum("value").alias("total_value"))
    )
    w = (
        Window.partitionBy("cohort_s")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cells = vals.join(F.broadcast(sizes), "cohort_s").select(
        F.col("cohort_s").alias("cohort_week"),
        "week_offset",
        F.round("total_value", 6).alias("total_value"),
        F.round(F.col("total_value") / F.col("_n"), 6).alias("value_per_user"),
        F.round(
            F.sum("total_value").over(w) / F.col("_n"), 6
        ).alias("cum_value_per_user"),
    )
    return cells


def cohort_value_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`cohort_value` (standalone query)."""
    return f"""
    WITH cv_uw AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS wk_s
      FROM {table}
    ),
    cv_first AS MATERIALIZED (
      SELECT user_id, min(wk_s) AS cohort_s FROM cv_uw GROUP BY user_id
    ),
    cv_sizes AS (
      SELECT cohort_s, count(*) AS n FROM cv_first GROUP BY cohort_s
    ),
    cv_vals AS (
      SELECT f.cohort_s,
             CAST((CAST(floor(epoch(date_trunc('week', e.ts))) AS BIGINT)
                   - f.cohort_s) / 604800 AS BIGINT) AS week_offset,
             sum(e.value) AS total_value
      FROM {table} e JOIN cv_first f ON f.user_id = e.user_id
      GROUP BY 1, 2
    )
    SELECT v.cohort_s AS cohort_week, v.week_offset,
           round(v.total_value, 6) AS total_value,
           round(v.total_value / s.n, 6) AS value_per_user,
           round(sum(v.total_value) OVER (
                   PARTITION BY v.cohort_s ORDER BY v.week_offset
                   ROWS UNBOUNDED PRECEDING) / s.n, 6) AS cum_value_per_user
    FROM cv_vals v JOIN cv_sizes s ON s.cohort_s = v.cohort_s
    """


def time_split_audit(events: DataFrame, train_frac: float = 0.8) -> DataFrame:
    """→ one-row ``[cutoff_s, n_train, n_test, n_users_train,
    n_users_test, n_users_both, user_leakage]`` — the temporal-holdout
    audit: split the event log at the exact ``train_frac`` quantile of
    event time (train = at-or-before the cutoff) and report how many TEST
    users also appear in train. A time split is the honest evaluation
    protocol for anything sequential, but unlike the entity-keyed
    ``train_test_split_events`` it leaks user identity by construction —
    ``user_leakage`` quantifies exactly how much ("94% of test users have
    training history"), the number a modeling card must publish before
    anyone reads the offline metric.

    Scale shape: one exact-percentile aggregate over epoch seconds
    (swap in ``approx_percentile`` at 100 TB — the audit tolerates an
    approximate cutoff), broadcast-joined as a scalar, then ONE per-user
    aggregate and one global reduce. No windows, no self-joins.
    """
    if not 0 < train_frac < 1:
        raise ValueError("train_frac must be in (0, 1)")
    ts_s = F.unix_timestamp("ts")
    cut = events.agg(
        F.percentile(ts_s, F.lit(train_frac)).alias("cutoff_s")
    )
    per_user = (
        events.select("user_id", ts_s.alias("ts_s"))
        .join(F.broadcast(cut), F.lit(True))
        .groupBy("user_id", "cutoff_s")
        .agg(
            F.sum(F.when(F.col("ts_s") <= F.col("cutoff_s"), 1).otherwise(0)).alias("n_tr"),
            F.sum(F.when(F.col("ts_s") > F.col("cutoff_s"), 1).otherwise(0)).alias("n_te"),
        )
    )
    return per_user.groupBy("cutoff_s").agg(
        F.sum("n_tr").alias("n_train"),
        F.sum("n_te").alias("n_test"),
        F.sum(F.when(F.col("n_tr") > 0, 1).otherwise(0)).alias("n_users_train"),
        F.sum(F.when(F.col("n_te") > 0, 1).otherwise(0)).alias("n_users_test"),
        F.sum(
            F.when((F.col("n_tr") > 0) & (F.col("n_te") > 0), 1).otherwise(0)
        ).alias("n_users_both"),
    ).select(
        F.round(F.col("cutoff_s"), 6).alias("cutoff_s"),
        "n_train",
        "n_test",
        "n_users_train",
        "n_users_test",
        "n_users_both",
        F.round(
            F.when(
                F.col("n_users_test") > 0,
                F.col("n_users_both") / F.col("n_users_test"),
            ),
            6,
        ).alias("user_leakage"),
    )


def time_split_audit_sql(table: str = "events", train_frac: float = 0.8) -> str:
    """DuckDB oracle for :func:`time_split_audit` — quantile_cont matches
    Spark's exact percentile on epoch-second longs."""
    return f"""
    WITH tsa_e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM {table}
    ),
    tsa_cut AS (SELECT quantile_cont(ts_s, {train_frac!r}) AS cutoff_s FROM tsa_e),
    tsa_u AS (
      SELECT user_id, any_value(cutoff_s) AS cutoff_s,
             sum(CASE WHEN ts_s <= cutoff_s THEN 1 ELSE 0 END) AS n_tr,
             sum(CASE WHEN ts_s > cutoff_s THEN 1 ELSE 0 END) AS n_te
      FROM tsa_e, tsa_cut GROUP BY user_id
    )
    SELECT round(any_value(cutoff_s), 6) AS cutoff_s,
           CAST(sum(n_tr) AS BIGINT) AS n_train,
           CAST(sum(n_te) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN n_tr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_train,
           CAST(sum(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_test,
           CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_both,
           CASE WHEN sum(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) > 0
                THEN round(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END)
                           * 1.0 / sum(CASE WHEN n_te > 0 THEN 1 ELSE 0 END), 6)
           END AS user_leakage
    FROM tsa_u
    """


def ab_test_srm(events: DataFrame, expected_control: float = 0.5) -> DataFrame:
    """→ one-row ``[n_control, n_treatment, chi2, srm_detected]`` — the
    sample-ratio-mismatch guardrail for :func:`ab_test`'s hash split: a
    one-degree-of-freedom chi-square of the observed arm sizes against
    the design ratio, flagged at the conventional p<0.05 bound
    (chi² > 3.841459). SRM is the first thing a trustworthy experiment
    report checks — a mismatched split means assignment is broken
    (bot filtering, redirect loss, a biased hash) and every downstream
    metric, including :func:`ab_test`'s z, is meaningless. Same md5
    assignment as :func:`ab_test`, so this audits exactly the split the
    z-test consumes.

    Scale shape: one distinct-user shuffle and a single-row conditional
    aggregate; chi² is a final-projection expression.
    """
    from linkgraph_spark.functions.hashing import md5_long

    if not 0 < expected_control < 1:
        raise ValueError("expected_control must be in (0, 1)")
    users = events.select("user_id").distinct().select(
        (md5_long(F.col("user_id").cast("string")) % 2).alias("_variant")
    )
    agg = users.agg(
        F.sum(F.when(F.col("_variant") == 0, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(F.col("_variant") == 1, 1).otherwise(0)).alias("n_treatment"),
    )
    n0, n1 = F.col("n_control"), F.col("n_treatment")
    e0 = (n0 + n1) * F.lit(expected_control)
    e1 = (n0 + n1) * F.lit(1.0 - expected_control)
    chi2 = F.when(
        (n0 + n1) > 0, (n0 - e0) * (n0 - e0) / e0 + (n1 - e1) * (n1 - e1) / e1
    )
    return agg.select(
        "n_control",
        "n_treatment",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841459).alias("srm_detected"),
    )


def ab_test_srm_sql(table: str = "events", expected_control: float = 0.5) -> str:
    """DuckDB oracle for :func:`ab_test_srm` — same md5 split and chi²."""
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH srm_u AS (
      SELECT ({h}) % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM {table})
    ),
    srm_agg AS (
      SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_control,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_treatment
      FROM srm_u
    )
    SELECT CAST(n_control AS BIGINT) AS n_control,
           CAST(n_treatment AS BIGINT) AS n_treatment,
           round(CASE WHEN (n_control + n_treatment) > 0 THEN
             (n_control - (n_control + n_treatment) * {expected_control!r})
               * (n_control - (n_control + n_treatment) * {expected_control!r})
               / ((n_control + n_treatment) * {expected_control!r})
             + (n_treatment - (n_control + n_treatment) * {1.0 - expected_control!r})
               * (n_treatment - (n_control + n_treatment) * {1.0 - expected_control!r})
               / ((n_control + n_treatment) * {1.0 - expected_control!r})
           END, 6) AS chi2,
           (CASE WHEN (n_control + n_treatment) > 0 THEN
             (n_control - (n_control + n_treatment) * {expected_control!r})
               * (n_control - (n_control + n_treatment) * {expected_control!r})
               / ((n_control + n_treatment) * {expected_control!r})
             + (n_treatment - (n_control + n_treatment) * {1.0 - expected_control!r})
               * (n_treatment - (n_control + n_treatment) * {1.0 - expected_control!r})
               / ((n_control + n_treatment) * {1.0 - expected_control!r})
           END) > 3.841459 AS srm_detected
    FROM srm_agg
    """

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_pivot_dow(events: DataFrame, types: tuple = EVENT_TYPES) -> DataFrame:
    """Event counts pivoted to one column per type, one row per weekday
    (0 = Monday .. 6 = Sunday). → ``[dow, click, error, purchase,
    signup, view]``. The pivot shape: a single-pass conditional
    aggregate — never one scan per type.

    Scale shape: the pivot values are EXPLICIT, so Spark skips the extra
    distinct-values job a bare ``pivot(col)`` schedules, the output
    schema is stable regardless of data, and an unexpected type can't
    explode the column count; the aggregate is 7 keys x |types| cells,
    fully map-side combinable. Absent (dow, type) combos surface as 0,
    not NULL.
    """
    ev = events.select(F.weekday("ts").alias("dow"), "event_type")
    piv = ev.groupBy("dow").pivot("event_type", list(types)).count()
    return piv.select(
        "dow", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


def event_pivot_dow_sql(table: str = "events", types: tuple = EVENT_TYPES) -> str:
    cells = ",\n           ".join(
        "count(*) FILTER (WHERE event_type = '{0}') AS {1}".format(
            t.replace("'", "''"), t
        )
        for t in types
    )
    return f"""
    SELECT (isodow(ts) - 1) AS dow,
           {cells}
    FROM {table}
    GROUP BY 1
    """

def scd2_user_state(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from a changelog: each
    user's event stream becomes versioned state intervals — consecutive
    repeats of the same state collapse, ``valid_to`` is the next
    transition (NULL for the current state). → ``[user_id, state,
    valid_from, valid_to, version]``.

    Scale shape: both windows partition on user_id (high cardinality —
    each task holds whole users, never the whole table); ordering ties
    on equal timestamps break by event_id so the build is deterministic.
    One shuffle total: the collapse filter and the lead() reuse the same
    partitioning.
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    changed = (
        events.select("user_id", "event_id", "ts", F.col("event_type").alias("state"))
        .withColumn("_prev", F.lag("state").over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("state")))
    )
    w2 = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return changed.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


def scd2_user_state_sql(table: str = "events") -> str:
    return f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type AS state,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS prev
      FROM {table}
    ),
    changed AS (
      SELECT user_id, event_id, ts, state FROM ordered
      WHERE prev IS NULL OR prev <> state
    )
    SELECT user_id, state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC) AS valid_to,
           CAST(row_number() OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC) AS INT) AS version
    FROM changed
    """


def rolling_daily_anomaly(events: DataFrame, trailing_days: int = 7) -> DataFrame:
    """Per (event_type, day) event counts with a TRAILING ``trailing_days``
    RANGE-frame mean and z-score — day gaps shrink the window (range, not
    rows semantics). → ``[event_type, day, n_events, mean_w, z_w]``
    (z NULL when the window has <2 days or zero variance).

    Scale shape: the daily pre-aggregate is map-side combinable down to
    |types x days| rows BEFORE the window, so the window input is
    dimension-sized no matter the event volume; the frame works over an
    integer day number so RANGE bounds are exact. Variance is computed
    from exact integer sums with the SAME expression in both engines
    ((ss - s*s/n)/(n-1)) — never a library stddev, whose summation order
    differs between engines.
    """
    daily = (
        events.groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("_d").asc())
        .rangeBetween(-(int(trailing_days) - 1), 0)
    )
    s = F.sum("n_events").over(w)
    ss = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    n = F.count("*").over(w)
    var = (ss - s * s / n) / (n - 1)
    return daily.select(
        "event_type",
        "day",
        "n_events",
        F.round(s / n, 6).alias("mean_w"),
        F.round(
            F.when((n > 1) & (var > 0), (F.col("n_events") - s / n) / F.sqrt(var)),
            6,
        ).alias("z_w"),
    )


def rolling_daily_anomaly_sql(table: str = "events", trailing_days: int = 7) -> str:
    k = int(trailing_days) - 1
    frame = f"""OVER (PARTITION BY event_type ORDER BY d ASC
                 RANGE BETWEEN {k} PRECEDING AND CURRENT ROW)"""
    return f"""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             count(*) AS n_events
      FROM {table}
      GROUP BY 1, 2, 3
    ),
    win AS (
      SELECT event_type, day, n_events,
             sum(n_events) {frame} AS s,
             sum(n_events * n_events) {frame} AS ss,
             count(*) {frame} AS n
      FROM daily
    )
    SELECT event_type, day, n_events,
           round(CAST(s AS DOUBLE) / n, 6) AS mean_w,
           round(CASE WHEN n > 1
                       AND (ss - CAST(s AS DOUBLE) * s / n) / (n - 1) > 0
                      THEN (n_events - CAST(s AS DOUBLE) / n)
                           / sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1))
                 END, 6) AS z_w
    FROM win
    """

def json_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON column with
    an explicit schema and profile the extracted field per event type.
    → ``[event_type, n_events, n_with_k, min_k, max_k, avg_k]``
    (``n_with_k`` < ``n_events`` counts missing/malformed rows, which
    parse to NULL, never error).

    Scale shape: ``from_json`` with a TYPED schema is a JVM codegen
    expression (one pass, no schema-inference pre-scan the way
    ``spark.read.json`` would); the aggregate is |types| keys. At 100 TB
    the explicit schema also means a malformed row costs a NULL, not a
    job failure.
    """
    parsed = events.withColumn("_k", F.from_json("props", "k INT").getField("k"))
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("_k").alias("n_with_k"),
        F.min("_k").alias("min_k"),
        F.max("_k").alias("max_k"),
        F.round(F.avg("_k"), 6).alias("avg_k"),
    )


def json_props_stats_sql(table: str = "events") -> str:
    # json_valid guard: DuckDB json_extract_string ERRORS on malformed
    # JSON, while the engine's from_json yields NULL — mirror that
    k = ("CASE WHEN json_valid(props) THEN "
         "TRY_CAST(json_extract_string(props, '$.k') AS INT) END")
    return f"""
    SELECT event_type,
           count(*) AS n_events,
           count({k}) AS n_with_k,
           min({k}) AS min_k,
           max({k}) AS max_k,
           round(avg({k}), 6) AS avg_k
    FROM {table}
    GROUP BY event_type
    """


def event_counts_long(events: DataFrame, types: tuple = EVENT_TYPES) -> DataFrame:
    """DENSIFIED long-form event counts: pivot to the explicit type
    columns (absent combos become 0), then melt back with ``unpivot`` —
    so every (observed dow, type) cell exists, including zeros.
    → ``[dow, event_type, n]``. The wide→long reshape: unpivot is a
    row-local Expand, no shuffle beyond the pivot's own aggregate.
    """
    piv = event_pivot_dow(events, types=types)
    return piv.unpivot("dow", list(types), "event_type", "n")


def event_counts_long_sql(table: str = "events", types: tuple = EVENT_TYPES) -> str:
    vals = ", ".join("('{0}')".format(t.replace("'", "''")) for t in types)
    return f"""
    WITH d AS (SELECT DISTINCT (isodow(ts) - 1) AS dow FROM {table}),
    t(event_type) AS (VALUES {vals}),
    c AS (
      SELECT (isodow(ts) - 1) AS dow, event_type, count(*) AS n
      FROM {table} GROUP BY 1, 2
    )
    SELECT d.dow, t.event_type, coalesce(c.n, 0) AS n
    FROM d CROSS JOIN t
    LEFT JOIN c ON c.dow = d.dow AND c.event_type = t.event_type
    """

def session_windows(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions via Spark's native ``session_window`` (the
    SessionWindow operator — merges events closer than ``gap_minutes``
    into one window whose end is last-event + gap). → ``[user_id,
    session_start, session_end, n_events, total_value]``.

    Scale shape: session_window aggregates shuffle once on (user_id),
    then merge windows within partitions — same cost as a window
    function but streaming-compatible (the identical expression works
    under ``readStream`` with a watermark). The oracle mirrors it as
    the classic gaps-and-islands construction, so the native operator
    is pinned to first-principles SQL semantics.
    """
    gap = f"{int(gap_minutes)} minutes"
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def session_windows_sql(table: str = "events", gap_minutes: int = 30) -> str:
    g = int(gap_minutes)
    return f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL {g} MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM {table}
    ),
    islands AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL {g} MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM islands
    GROUP BY user_id, sid
    """


def value_mad_outliers(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Robust per-type outlier profile: median of ``value``, the median
    absolute deviation, and how many events sit more than ``k`` MADs
    from the median. → ``[event_type, median_value, mad, n_outliers]``.

    Scale shape: two grouped exact-percentile aggregates (|types| keys)
    and one broadcast rejoin of the 5-row profile onto the scan — the
    fact table shuffles once for the median, once for the MAD (the MAD
    is a percentile OF deviations, inherently a second pass), and the
    outlier count combines map-side. Medians interpolate identically in
    both engines (percentile == quantile_cont, verified family-wide).
    """
    med = events.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("_med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "_adev", F.abs(F.col("value") - F.col("_med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("_med").alias("_med"),
        F.percentile("_adev", 0.5).alias("_mad"),
    )
    out = (
        dev.drop("_med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("_med"), 6).alias("median_value"),
            F.round(F.first("_mad"), 6).alias("mad"),
            F.sum(
                (F.col("_adev") > F.lit(float(k)) * F.col("_mad")).cast("long")
            ).alias("n_outliers"),
        )
    )
    return out


def value_mad_outliers_sql(table: str = "events", k: float = 3.0) -> str:
    return f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM {table} GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - med.m) AS adev, med.m
      FROM {table} e JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, any_value(m) AS m,
             quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           round(any_value(mad.m), 6) AS median_value,
           round(any_value(mad.mad), 6) AS mad,
           sum(CASE WHEN dev.adev > {float(k)!r} * mad.mad
                    THEN 1 ELSE 0 END) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """

def sliding_window_counts(
    events: DataFrame,
    window_minutes: int = 60,
    slide_minutes: int = 15,
) -> DataFrame:
    """Overlapping (sliding) time-window counts per event type — each
    event lands in ``window/slide`` windows via Spark's native
    ``F.window(ts, w, s)``. → ``[window_start, event_type, n]``.

    Scale shape: the sliding window is an internal Expand (w/s rows per
    event) feeding one hash aggregate — the blow-up factor is the
    window/slide ratio (4 here), a constant, and the aggregate combines
    map-side down to |windows x types|. The oracle replays the same
    epoch-aligned window arithmetic in exact integer MICROseconds, so
    sub-second timestamps bucket identically.
    """
    w = f"{int(window_minutes)} minutes"
    s = f"{int(slide_minutes)} minutes"
    return (
        events.groupBy(F.window("ts", w, s).alias("_w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("_w.start").alias("window_start"), "event_type", "n")
    )


def sliding_window_counts_sql(
    table: str = "events",
    window_minutes: int = 60,
    slide_minutes: int = 15,
) -> str:
    w_us = int(window_minutes) * 60 * 1_000_000
    s_us = int(slide_minutes) * 60 * 1_000_000
    # window [start, start+w) contains ts  <=>  ts-w < start <= ts,
    # start = k*s: k in [floor((ts_us - w_us)/s_us) + 1, floor(ts_us/s_us)]
    return f"""
    WITH expanded AS (
      SELECT event_type,
             unnest(generate_series(
               CAST(floor((epoch_us(ts) - {w_us}) / {s_us}) + 1 AS BIGINT),
               CAST(floor(epoch_us(ts) / {s_us}) AS BIGINT))) AS k
      FROM {table}
    )
    SELECT make_timestamp(k * {s_us}) AS window_start, event_type,
           count(*) AS n
    FROM expanded
    GROUP BY 1, 2
    """


def value_tier_profile(
    events: DataFrame,
    tiers: tuple = (
        ("bronze", 0.0, 50.0),
        ("silver", 50.0, 150.0),
        ("gold", 150.0, 300.0),
        ("platinum", 300.0, 1e9),
    ),
) -> DataFrame:
    """Event profile per value tier, looked up from a RANGE dimension
    (name, lo, hi) with lo-inclusive/hi-exclusive bands.
    → ``[tier, n_events, total_value]``; events matching no band drop.

    Scale shape: the tier table is a handful of rows, so the range
    condition joins as a BroadcastNestedLoopJoin — the ONE join shape
    where BNLJ is the correct plan: per-row work is |tiers| comparisons
    against a broadcast array, strictly cheaper than any shuffle. The
    same lookup against a BIG band table must bucket instead (see
    ``interval_join``).
    """
    spark = events.sparkSession
    dim = spark.createDataFrame(
        [(n, float(lo), float(hi)) for n, lo, hi in tiers],
        "tier string, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(dim),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def value_tier_profile_sql(
    table: str = "events",
    tiers: tuple = (
        ("bronze", 0.0, 50.0),
        ("silver", 50.0, 150.0),
        ("gold", 150.0, 300.0),
        ("platinum", 300.0, 1e9),
    ),
) -> str:
    vals = ", ".join(
        "('{0}', {1!r}, {2!r})".format(n.replace("'", "''"), float(lo), float(hi))
        for n, lo, hi in tiers
    )
    return f"""
    WITH dim(tier, lo, hi) AS (VALUES {vals})
    SELECT tier, count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM {table} JOIN dim ON value >= lo AND value < hi
    GROUP BY tier
    """


def period_end_balances(events: DataFrame, period: str = "yyyy-MM-dd") -> DataFrame:
    """Semi-additive rollup — the warehouse measure you must NOT sum over
    time: each user's balance is the ``value`` of their LAST event in the
    period (ties impossible: event_id is the deterministic tie-break), and
    the period's book balance sums those last-values across users.
    → ``[period, n_users, balance]`` ordered by period. Default grain is
    daily (the synthetic stream spans one month); pass ``"yyyy-MM"`` for
    monthly books.

    Scale shape: ``max_by(value, (ts, event_id))`` is an ordinary
    aggregate — partial per task, merged on the (user, month) shuffle —
    so there is NO per-user window sort; the month rollup then re-aggs
    |users×months| rows. Values are fixed to exact 4-dp integers before
    any summation (``round(value·10000)`` of the same double rounds
    identically in both engines), so the cross-user sum is
    order-invariant.
    """
    per = F.date_format("ts", period).alias("period")
    v4 = F.round(F.col("value") * 10000).cast("long")
    last_per_user = (
        events.where(F.col("value").isNotNull())
        .groupBy("user_id", per)
        .agg(F.max_by(v4, F.struct(F.col("ts"), F.col("event_id"))).alias("_v4"))
    )
    return (
        last_per_user.groupBy("period")
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.sum("_v4") / F.lit(10000.0), 4).alias("balance"),
        )
        .orderBy("period")
    )


def period_end_balances_sql(
    table: str = "events", period: str = "%Y-%m-%d"
) -> str:
    """DuckDB mirror: arg_max rejects STRUCT ordering keys, so the
    last-event pick is a row_number window (same total order).
    ``period`` is the strftime form of the Spark side's pattern."""
    return f"""
    WITH ranked AS (
      SELECT user_id, strftime(ts, '{period}') AS period,
             CAST(round(value * 10000) AS BIGINT) AS v4,
             row_number() OVER (
               PARTITION BY user_id, strftime(ts, '{period}')
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM {table} WHERE value IS NOT NULL
    )
    SELECT period, count(*) AS n_users,
           round(sum(v4) / 10000.0, 4) AS balance
    FROM ranked WHERE rn = 1
    GROUP BY period ORDER BY period
    """


def sliding_distinct_users(
    events: DataFrame, window_days: int = 7, slide_days: int = 1
) -> DataFrame:
    """EXACT distinct users per sliding time window (``window_days``
    wide, sliding every ``slide_days``) — the rolling-reach metric.
    → ``[window_start, n_users]`` (date of the window's first day),
    one row per window with ≥1 active user.

    Scale shape: count-distinct over overlapping windows does NOT need
    the raw stream per window — events first dedup to (user, day) grain
    (bounded: |users| × |days|, map-side combinable), and only THOSE
    rows explode into the ≤ window/slide windows each day belongs to.
    The per-window distinct then runs on user-day rows, so the fan-out
    is w/s × |user-days|, independent of event volume. (The approximate
    version of this op keeps one HLL sketch per day and unions w of
    them per window; this exact form is the oracle-checkable one.)
    """
    w, s = int(window_days), int(slide_days)
    day = _epoch_day("ts")
    user_day = events.select(
        "user_id", day.alias("_day")
    ).distinct()
    # window k (start day k·s) covers days [k·s, k·s + w); day d belongs to
    # windows with k in [ceil((d - w + 1)/s), floor(d/s)]
    k_lo = F.ceil((F.col("_day") - F.lit(w) + 1) / F.lit(s)).cast("long")
    k_hi = F.floor(F.col("_day") / F.lit(s)).cast("long")
    exploded = user_day.withColumn("_k", F.explode(F.sequence(k_lo, k_hi)))
    return (
        exploded.groupBy("_k")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                (F.col("_k") * F.lit(s)).cast("int"),
            ).alias("window_start"),
            "n_users",
        )
        .orderBy("window_start")
    )


def sliding_distinct_users_sql(
    table: str = "events", window_days: int = 7, slide_days: int = 1
) -> str:
    w, s = int(window_days), int(slide_days)
    return f"""
    WITH user_day AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d
      FROM {table}
    ),
    exploded AS (
      SELECT user_id, unnest(generate_series(
               CAST(ceil((d - {w} + 1) / {s}.0) AS BIGINT),
               CAST(floor(d / {s}.0) AS BIGINT))) AS k
      FROM user_day
    )
    SELECT DATE '1970-01-01' + CAST(k * {s} AS INTEGER) AS window_start,
           count(DISTINCT user_id) AS n_users
    FROM exploded GROUP BY k ORDER BY window_start
    """


def _attribution_transitions(
    events: DataFrame, gap_sec: int, conversion: str
) -> DataFrame:
    """Shared path construction for Markov attribution: per-user sessions
    (same gap rule as :func:`sessionize`), each truncated at its first
    ``conversion`` event; transition counts over
    ``START → c1 → … → (CONV | NULL)``. → ``[src, dst, n]``.

    Scale shape: one user-keyed shuffle for the session/lag windows;
    everything after aggregates to ≤ (|types|+1)² rows.
    """
    wl = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    gap = F.col("ts_s") - F.lag("ts_s").over(wl)
    # same NULL-explicit boundary flag as sessionize: the first row is a
    # session start, never a NULL-group orphan
    new_sess = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    sess = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_s",
        F.sum(new_sess)
        .over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sess_id"),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts_s", "event_id")
    pos = sess.withColumn("pos", F.row_number().over(ws))
    conv_pos = pos.groupBy("user_id", "sess_id").agg(
        F.min(
            F.when(F.col("event_type") == conversion, F.col("pos"))
        ).alias("conv_pos")
    )
    tagged = pos.join(conv_pos, ["user_id", "sess_id"])
    kept = tagged.where(
        F.col("conv_pos").isNull() | (F.col("pos") < F.col("conv_pos"))
    )
    wk = Window.partitionBy("user_id", "sess_id").orderBy("pos")
    inner = kept.select(
        F.coalesce(F.lag("event_type").over(wk), F.lit("START")).alias("src"),
        F.col("event_type").alias("dst"),
    )
    terminal = (
        tagged.groupBy("user_id", "sess_id")
        .agg(
            F.max_by(
                F.when(
                    F.col("conv_pos").isNull()
                    | (F.col("pos") < F.col("conv_pos")),
                    F.col("event_type"),
                ),
                F.when(
                    F.col("conv_pos").isNull()
                    | (F.col("pos") < F.col("conv_pos")),
                    F.col("pos"),
                ),
            ).alias("last_kept"),
            F.max(F.col("conv_pos").isNotNull().cast("int")).alias("_conv"),
        )
        .select(
            F.coalesce("last_kept", F.lit("START")).alias("src"),
            F.when(F.col("_conv") == 1, F.lit("CONV"))
            .otherwise(F.lit("NULL"))
            .alias("dst"),
        )
    )
    return inner.unionByName(terminal).groupBy("src", "dst").agg(
        F.count("*").alias("n")
    )


def removal_effects(
    events: DataFrame,
    gap_sec: int = 1800,
    conversion: str = "purchase",
    n_iter: int = 100,
) -> DataFrame:
    """Markov-chain attribution (removal effects): how much of overall
    conversion each channel is responsible for. Sessions become paths
    ``START → channels… → CONV/NULL``; the chain's absorption
    probability into CONV is computed from START, then recomputed with
    each channel removed (paths through it die); a channel's removal
    effect is the fractional conversion drop. → ``[channel,
    removal_effect]``, effect desc / channel asc. Empty when the corpus
    has no conversions.

    The chain solve runs driver-side over the COLLECTED transition
    table — O((|event types|+1)²) rows by construction (dozens), the
    documented tiny-aggregate exception — with a FIXED ``n_iter``
    power-iteration count so the DuckDB oracle can replay the identical
    algebra as unrolled CTE steps: parity comes from the same iteration
    count and the same integer-ratio probabilities, not from a
    convergence test (the map is a contraction; float drift stays at
    rounding noise and the 6-dp output rounding absorbs it).
    """
    rows = _attribution_transitions(events, gap_sec, conversion).collect()
    spark = events.sparkSession
    schema = "channel string, removal_effect double"
    if not rows:
        # empty stream: no transitions, no states — the solve below would
        # KeyError on 'START'; the oracle returns zero rows here too
        return spark.createDataFrame([], schema)
    n = {(r.src, r.dst): r.n for r in rows}
    totals: dict = {}
    for (s, _), c in n.items():
        totals[s] = totals.get(s, 0) + c
    prob = {(s, t): c / totals[s] for (s, t), c in n.items()}
    states = sorted(totals.keys())  # transient states: every observed src
    channels = [s for s in states if s != "START"]
    r_conv = {s: prob.get((s, "CONV"), 0.0) for s in states}

    def solve(removed: str) -> float:
        p = {s: 0.0 for s in states}
        for _ in range(int(n_iter)):
            newp = {}
            for s in states:
                acc = r_conv[s]
                for t in states:  # sorted order fixed by `states`
                    if t == removed:
                        continue
                    acc += prob.get((s, t), 0.0) * p[t]
                newp[s] = acc
            p = newp
        return p["START"]

    base = solve("__none__")
    if base <= 0.0:
        return spark.createDataFrame([], schema)
    out = [
        (c, round(1.0 - solve(c) / base, 6))
        for c in channels
    ]
    out.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(out, schema)


def removal_effects_sql(
    table: str = "events",
    gap_sec: int = 1800,
    conversion: str = "purchase",
    n_iter: int = 100,
) -> str:
    """Unrolled-CTE mirror: the same transition build, then ``n_iter``
    joint iteration steps over a (removed, state) grid — one CTE per
    step, exactly the driver solve's algebra."""
    conv = conversion.replace("'", "''")
    steps = []
    prev = "p0"
    for k in range(1, int(n_iter) + 1):
        # AS MATERIALIZED: without it DuckDB inlines the whole chain into
        # one n_iter-deep join tree and the planner blows up
        steps.append(
            f"""p{k} AS MATERIALIZED (
      SELECT g.r, g.s,
             g.rconv + coalesce(sum(q.pr * p.v), 0) AS v
      FROM grid g
      LEFT JOIN probs q ON q.src = g.s AND q.dst <> g.r
                       AND q.dst IN (SELECT s FROM states)
      LEFT JOIN {prev} p ON p.r = g.r AND p.s = q.dst
      GROUP BY g.r, g.s, g.rconv
    )"""
        )
        prev = f"p{k}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH ae AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), aflag AS (
      SELECT *, CASE WHEN lag(ts_s) OVER
                        (PARTITION BY user_id ORDER BY ts_s, event_id) IS NULL
                     OR ts_s - lag(ts_s) OVER
                        (PARTITION BY user_id ORDER BY ts_s, event_id)
                        > {int(gap_sec)}
                     THEN 1 ELSE 0 END AS new_sess
      FROM ae
    ), asess AS (
      SELECT *, sum(new_sess) OVER
               (PARTITION BY user_id ORDER BY ts_s, event_id
                ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM aflag
    ), apos AS (
      SELECT *, row_number() OVER
               (PARTITION BY user_id, sess_id ORDER BY ts_s, event_id) AS pos
      FROM asess
    ), aconv AS (
      SELECT user_id, sess_id,
             min(CASE WHEN event_type = '{conv}' THEN pos END) AS conv_pos
      FROM apos GROUP BY 1, 2
    ), atag AS (
      SELECT a.*, c.conv_pos FROM apos a JOIN aconv c USING (user_id, sess_id)
    ), akept AS (
      SELECT * FROM atag WHERE conv_pos IS NULL OR pos < conv_pos
    ), ainner AS (
      SELECT coalesce(lag(event_type) OVER
               (PARTITION BY user_id, sess_id ORDER BY pos), 'START') AS src,
             event_type AS dst
      FROM akept
    ), aterm AS (
      SELECT coalesce(
               arg_max(CASE WHEN conv_pos IS NULL OR pos < conv_pos
                            THEN event_type END,
                       CASE WHEN conv_pos IS NULL OR pos < conv_pos
                            THEN pos END),
               'START') AS src,
             CASE WHEN max(CASE WHEN conv_pos IS NOT NULL THEN 1 ELSE 0 END) = 1
                  THEN 'CONV' ELSE 'NULL' END AS dst
      FROM atag GROUP BY user_id, sess_id
    ), trans AS MATERIALIZED (
      SELECT src, dst, count(*) AS nt
      FROM (SELECT * FROM ainner UNION ALL SELECT * FROM aterm)
      GROUP BY 1, 2
    ), tot AS (SELECT src, sum(nt) AS t FROM trans GROUP BY 1),
    probs AS MATERIALIZED (
      SELECT tr.src, tr.dst, tr.nt / CAST(tt.t AS DOUBLE) AS pr
      FROM trans tr JOIN tot tt USING (src)
    ),
    states AS MATERIALIZED (SELECT DISTINCT src AS s FROM trans),
    rconvs AS (
      SELECT st.s, coalesce(max(p.pr), 0) AS rconv
      FROM states st LEFT JOIN probs p ON p.src = st.s AND p.dst = 'CONV'
      GROUP BY st.s
    ),
    removals AS (
      SELECT s AS r FROM states WHERE s <> 'START'
      UNION ALL SELECT '__none__'
    ),
    grid AS MATERIALIZED (
      SELECT rm.r, st.s, rc.rconv
      FROM removals rm CROSS JOIN states st JOIN rconvs rc ON rc.s = st.s
    ),
    p0 AS MATERIALIZED (SELECT r, s, CAST(0 AS DOUBLE) AS v FROM grid),
    {steps_sql},
    finals AS (
      SELECT r, v FROM {prev} WHERE s = 'START'
    ),
    base AS (SELECT v AS bv FROM finals WHERE r = '__none__')
    SELECT f.r AS channel, round(1.0 - f.v / b.bv, 6) AS removal_effect
    FROM finals f CROSS JOIN base b
    WHERE f.r <> '__none__' AND b.bv > 0
    ORDER BY removal_effect DESC, channel ASC
    """


def value_psi_drift(events: DataFrame, split_ts: str = "2024-01-16") -> DataFrame:
    """Population Stability Index drift monitor for the ``value``
    distribution: the stream splits at ``split_ts``; the FIRST half's
    exact deciles define 10 equal-mass bins; both halves are bucketed by
    those same edges and each bin contributes
    ``(p2 − p1)·ln(p2/p1)``. → ``[bucket, n_ref, n_cur, psi_term]``,
    one row per non-degenerate bin (a bin empty on either side yields a
    NULL term — the log diverges; the classic eps-padding convention is
    a caller choice, not silently applied). Total PSI = Σ psi_term;
    > 0.2 conventionally flags a shifted distribution.

    Scale shape: edges are ONE exact-percentile aggregate over the
    reference half (swap approx_percentile at 100 TB, same row shape);
    bucketing is a map-only comparison against the 9 broadcast edges;
    the final aggregate has 10 groups. Exact interpolated percentiles
    match DuckDB ``quantile_cont`` bit-for-bit (established invariant),
    so the bin edges — and therefore every count — are engine-identical.
    """
    split = F.lit(split_ts).cast("timestamp")
    vals = events.where(F.col("value").isNotNull()).select(
        "value", (F.col("ts") < split).alias("_ref")
    )
    qs = [i / 10.0 for i in range(1, 10)]
    edges_row = vals.where("_ref").agg(
        F.percentile("value", F.array(*[F.lit(q) for q in qs])).alias("_edges")
    )
    bucketed = vals.crossJoin(F.broadcast(edges_row)).select(
        "_ref",
        F.aggregate(
            "_edges",
            F.lit(0),
            lambda acc, e: acc + (F.col("value") > e).cast("int"),
        )
        .cast("long")
        .alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.col("_ref").cast("long")).alias("n_ref"),
        F.sum((~F.col("_ref")).cast("long")).alias("n_cur"),
    )
    totals = counts.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    p1 = F.col("n_ref") / F.col("_tr").cast("double")
    p2 = F.col("n_cur") / F.col("_tc").cast("double")
    term = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        F.round((p2 - p1) * F.log(p2 / p1), 6),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select("bucket", "n_ref", "n_cur", term.alias("psi_term"))
        .orderBy("bucket")
    )


def value_psi_drift_sql(
    table: str = "events", split_ts: str = "2024-01-16"
) -> str:
    qs = ", ".join(str(i / 10.0) for i in range(1, 10))
    return f"""
    WITH pvals AS (
      SELECT value, ts < TIMESTAMP '{split_ts}' AS ref
      FROM {table} WHERE value IS NOT NULL
    ),
    pedges AS (
      SELECT quantile_cont(value, [{qs}]) AS edges FROM pvals WHERE ref
    ),
    pbuck AS (
      SELECT ref,
             (SELECT count(*) FROM unnest(edges) AS t(e) WHERE value > e)
               AS bucket
      FROM pvals CROSS JOIN pedges
    ),
    pcnt AS (
      SELECT bucket,
             sum(CASE WHEN ref THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN ref THEN 0 ELSE 1 END) AS n_cur
      FROM pbuck GROUP BY bucket
    ),
    ptot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM pcnt)
    SELECT bucket, CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           CASE WHEN n_ref > 0 AND n_cur > 0 THEN
             round((n_cur / CAST(tc AS DOUBLE) - n_ref / CAST(tr AS DOUBLE))
                   * ln((n_cur / CAST(tc AS DOUBLE))
                        / (n_ref / CAST(tr AS DOUBLE))), 6)
           END AS psi_term
    FROM pcnt CROSS JOIN ptot
    ORDER BY bucket
    """


def ab_test_cuped(events: DataFrame, split_ts: str = "2024-01-16") -> DataFrame:
    """Variance-reduced A/B readout (CUPED, Deng et al. WSDM 2013 —
    public recipe): users hash-split 50/50 (same md5 assignment as
    :func:`ab_test_srm`); each user's PRE-period value sum is the
    covariate X, the POST-period sum the metric Y; the pooled
    ``θ = cov(X,Y)/var(X)`` shifts each arm's mean by
    ``−θ·(mean_arm(X) − mean(X))``. → one row ``[n_control,
    n_treatment, mean_control, mean_treatment, theta, adj_mean_control,
    adj_mean_treatment, adj_lift]``.

    All moments accumulate as EXACT integer sums of 4-dp-fixed values
    (Σx, Σy, Σx², Σxy in int64 — the 100 TB form swaps the squared sums
    to double partials; at gate scales int64 is exact and
    engine-identical), then one final projection does the identical
    double algebra in both engines. θ is 0 when var(X) is 0 (degenerate
    pre-period), matching the convention that CUPED falls back to the
    raw metric.

    Scale shape: one user-grain conditional aggregate (map-side
    combinable), then a single-row reduction — no joins, no windows.
    """
    from linkgraph_spark.functions.hashing import md5_long

    split = F.lit(split_ts).cast("timestamp")
    v4 = F.round(F.col("value") * 10000).cast("long")
    per_user = (
        events.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") < split, v4)), F.lit(0)
            ).alias("x4"),
            F.coalesce(
                F.sum(F.when(F.col("ts") >= split, v4)), F.lit(0)
            ).alias("y4"),
        )
        .select(
            (md5_long(F.col("user_id").cast("string")) % 2).alias("_variant"),
            "x4",
            "y4",
        )
    )
    s = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x4").alias("sx"),
        F.sum("y4").alias("sy"),
        F.sum(F.col("x4") * F.col("x4")).alias("sxx"),
        F.sum(F.col("x4") * F.col("y4")).alias("sxy"),
        F.sum(F.when(F.col("_variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("_variant") == 0, F.col("x4")).otherwise(0)).alias("sx0"),
        F.sum(F.when(F.col("_variant") == 0, F.col("y4")).otherwise(0)).alias("sy0"),
        F.sum(F.when(F.col("_variant") == 1, F.col("x4")).otherwise(0)).alias("sx1"),
        F.sum(F.when(F.col("_variant") == 1, F.col("y4")).otherwise(0)).alias("sy1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n, sx, sy, sxx, sxy = d("n"), d("sx"), d("sy"), d("sxx"), d("sxy")
    n0 = d("n0")
    n1 = n - n0
    var_num = n * sxx - sx * sx
    theta = F.when(var_num > 0, (n * sxy - sx * sy) / var_num).otherwise(
        F.lit(0.0)
    )
    scale = F.lit(10000.0)
    mean_x = sx / n / scale
    m0 = d("sy0") / n0 / scale
    m1 = d("sy1") / n1 / scale
    a0 = m0 - theta * (d("sx0") / n0 / scale - mean_x)
    a1 = m1 - theta * (d("sx1") / n1 / scale - mean_x)
    return s.select(
        F.col("n0").alias("n_control"),
        (F.col("n") - F.col("n0")).alias("n_treatment"),
        F.round(m0, 6).alias("mean_control"),
        F.round(m1, 6).alias("mean_treatment"),
        F.round(theta, 6).alias("theta"),
        F.round(a0, 6).alias("adj_mean_control"),
        F.round(a1, 6).alias("adj_mean_treatment"),
        F.round(a1 - a0, 6).alias("adj_lift"),
    )


def ab_test_cuped_sql(table: str = "events", split_ts: str = "2024-01-16") -> str:
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH cu AS (
      SELECT ({h}) % 2 AS variant,
             coalesce(sum(CASE WHEN ts < TIMESTAMP '{split_ts}'
               THEN CAST(round(value * 10000) AS BIGINT) END), 0) AS x4,
             coalesce(sum(CASE WHEN ts >= TIMESTAMP '{split_ts}'
               THEN CAST(round(value * 10000) AS BIGINT) END), 0) AS y4
      FROM {table} WHERE value IS NOT NULL
      GROUP BY user_id
    ),
    cs AS (
      SELECT count(*) AS n,
             CAST(sum(x4) AS BIGINT) AS sx, CAST(sum(y4) AS BIGINT) AS sy,
             CAST(sum(x4 * x4) AS BIGINT) AS sxx,
             CAST(sum(x4 * y4) AS BIGINT) AS sxy,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
             CAST(sum(CASE WHEN variant = 0 THEN x4 ELSE 0 END) AS BIGINT) AS sx0,
             CAST(sum(CASE WHEN variant = 0 THEN y4 ELSE 0 END) AS BIGINT) AS sy0,
             CAST(sum(CASE WHEN variant = 1 THEN x4 ELSE 0 END) AS BIGINT) AS sx1,
             CAST(sum(CASE WHEN variant = 1 THEN y4 ELSE 0 END) AS BIGINT) AS sy1
      FROM cu
    ),
    -- theta computed ONCE; the adj projections below reference the same
    -- value (previously the 7-line CASE was inlined four times)
    ct AS (
      SELECT *,
             CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
               THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               ELSE 0.0 END AS theta
      FROM cs
    ),
    ca AS (
      SELECT *,
             CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 10000.0
               - theta * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 10000.0
                          - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0)
               AS a0,
             CAST(sy1 AS DOUBLE) / CAST(n - n0 AS DOUBLE) / 10000.0
               - theta * (CAST(sx1 AS DOUBLE) / CAST(n - n0 AS DOUBLE) / 10000.0
                          - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0)
               AS a1
      FROM ct
    )
    SELECT CAST(n0 AS BIGINT) AS n_control,
           CAST(n - n0 AS BIGINT) AS n_treatment,
           round(CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 10000.0, 6)
             AS mean_control,
           round(CAST(sy1 AS DOUBLE) / CAST(n - n0 AS DOUBLE) / 10000.0, 6)
             AS mean_treatment,
           round(theta, 6) AS theta,
           round(a0, 6) AS adj_mean_control,
           round(a1, 6) AS adj_mean_treatment,
           round(a1 - a0, 6) AS adj_lift
    FROM ca
    """

def kaplan_meier_conversion(events: DataFrame) -> DataFrame:
    """Kaplan–Meier survival curve for signup→first-purchase, with
    right-censoring at the stream's last observed instant: each user
    enters at their FIRST ``signup``; the event is their first
    ``purchase`` strictly after it; users with no purchase are censored
    at ``max(ts)`` over the whole stream. Durations are whole days
    (floored). → ``[day, n_risk, n_events, survival]`` — one row per day
    with ≥1 conversion, ``survival = Π_{t ≤ day} (1 − d_t/n_t)``
    (censored users leave the risk set between event days, which is
    exactly what K-M handles and a naive conversion curve gets wrong).

    Scale shape: two user-grain aggregates (signup, first purchase
    after it) and a global max — then everything collapses to ≤ |days|
    rows; the survival product is an ordered prefix sum of
    ``ln(1 − d/n)`` over that tiny frame, exp'd back (identical ordered
    algebra in both engines; 6-dp rounding absorbs frame-order float
    noise).
    """
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
    # users whose every purchase precedes signup dropped out of first_p's
    # filter-then-group; re-attach them as censored via a left join back
    subjects = signups.join(
        first_p.select("user_id", "_fp_ts"), "user_id", "left"
    )
    end = events.agg(F.max("ts").alias("_end"))
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    dur = subjects.crossJoin(F.broadcast(end)).select(
        F.col("_fp_ts").isNotNull().alias("_event"),
        F.floor(
            (
                F.coalesce(us("_fp_ts"), us("_end")) - us("_s_ts")
            )
            / F.lit(86_400_000_000)
        ).alias("_day"),
    )
    per_day = dur.groupBy("_day").agg(
        F.sum(F.col("_event").cast("long")).alias("_d"),
        F.sum((~F.col("_event")).cast("long")).alias("_c"),
    )
    total = per_day.agg(F.sum(F.col("_d") + F.col("_c")).alias("_n"))
    w = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        per_day.crossJoin(F.broadcast(total))
        .withColumn(
            "_n_risk",
            F.col("_n")
            - F.coalesce(F.sum(F.col("_d") + F.col("_c")).over(w), F.lit(0)),
        )
        .withColumn(
            "_lnS",
            # the d == n_risk day drives survival to EXACT zero; ln(0) is
            # an error (DuckDB) / NULL (Spark), so that day contributes no
            # log term and the _dead flag below zeroes the curve instead
            F.sum(
                F.when(
                    (F.col("_d") > 0) & (F.col("_d") < F.col("_n_risk")),
                    F.log(1.0 - F.col("_d") / F.col("_n_risk").cast("double")),
                ).otherwise(F.lit(0.0))
            ).over(wcum),
        )
        .withColumn(
            "_dead",
            F.max((F.col("_d") >= F.col("_n_risk")).cast("int")).over(wcum),
        )
    )
    return (
        risk.where(F.col("_d") > 0)
        .select(
            F.col("_day").alias("day"),
            F.col("_n_risk").alias("n_risk"),
            F.col("_d").alias("n_events"),
            F.when(F.col("_dead") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp("_lnS"), 6))
            .alias("survival"),
        )
        .orderBy("day")
    )


def kaplan_meier_conversion_sql(table: str = "events") -> str:
    return f"""
    WITH km_s AS (
      SELECT user_id, min(ts) AS s_ts FROM {table}
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    km_fp AS (
      SELECT s.user_id, s.s_ts, min(p.ts) AS fp_ts
      FROM km_s s LEFT JOIN {table} p
        ON p.user_id = s.user_id AND p.event_type = 'purchase'
       AND p.ts > s.s_ts
      GROUP BY s.user_id, s.s_ts
    ),
    km_end AS (SELECT max(ts) AS end_ts FROM {table}),
    km_dur AS (
      SELECT fp_ts IS NOT NULL AS ev,
             CAST(floor((coalesce(epoch_us(fp_ts), epoch_us(end_ts))
                         - epoch_us(s_ts)) / 86400000000.0) AS BIGINT) AS day
      FROM km_fp CROSS JOIN km_end
    ),
    km_day AS (
      SELECT day, sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
             sum(CASE WHEN ev THEN 0 ELSE 1 END) AS c
      FROM km_dur GROUP BY day
    ),
    km_tot AS (SELECT sum(d + c) AS n FROM km_day),
    km_risk AS (
      SELECT day, d, c,
             n - coalesce(sum(d + c) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS n_risk
      FROM km_day CROSS JOIN km_tot
    ),
    km_surv AS (
      SELECT day, d, n_risk,
             sum(CASE WHEN d > 0 AND d < n_risk
                      THEN ln(1.0 - d / CAST(n_risk AS DOUBLE))
                      ELSE 0.0 END) OVER
               (ORDER BY day ROWS UNBOUNDED PRECEDING) AS lnS,
             max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER
               (ORDER BY day ROWS UNBOUNDED PRECEDING) AS dead
      FROM km_risk
    )
    SELECT day, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_events,
           CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lnS), 6) END AS survival
    FROM km_surv WHERE d > 0 ORDER BY day
    """


def revenue_trend_theilsen(events: DataFrame) -> DataFrame:
    """Theil–Sen robust trend of daily revenue: the MEDIAN of all
    pairwise day-to-day slopes — immune to the outlier days that wreck
    a least-squares fit. → one row ``[n_days, slope_per_day,
    intercept]`` (intercept = median of ``rev − slope·day``, the
    standard Theil–Sen companion estimate; both 4-dp-dollar units).

    Scale shape: the stream first collapses to ≤|days| exact-cent
    rows; the O(days²) pairwise self-join runs on THAT tiny frame
    (a month = 435 pairs; even a decade ≈ 6.7M — trivial), never on
    events. Slopes divide exact integers, and the medians are exact
    interpolated percentiles — engine-identical end to end.
    """
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("_day"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_r4"))
    )
    a = daily.select(F.col("_day").alias("_di"), F.col("_r4").alias("_ri"))
    b = daily.select(F.col("_day").alias("_dj"), F.col("_r4").alias("_rj"))
    slopes = a.join(b, F.col("_dj") > F.col("_di")).select(
        (
            (F.col("_rj") - F.col("_ri"))
            / (F.col("_dj") - F.col("_di")).cast("double")
        ).alias("_s")
    )
    slope = slopes.agg(F.percentile("_s", F.lit(0.5)).alias("_slope"))
    resid = daily.crossJoin(F.broadcast(slope)).select(
        (F.col("_r4") - F.col("_slope") * F.col("_day")).alias("_b"),
        "_slope",
    )
    return resid.groupBy("_slope").agg(
        F.count("*").alias("n_days"),
        F.round(F.col("_slope") / 10000.0, 6).alias("slope_per_day"),
        F.round(F.percentile("_b", F.lit(0.5)) / 10000.0, 6).alias("intercept"),
    ).select("n_days", "slope_per_day", "intercept")


def revenue_trend_theilsen_sql(table: str = "events") -> str:
    return f"""
    WITH tdaily AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS r4
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ),
    tslopes AS (
      SELECT (b.r4 - a.r4) / CAST(b.day - a.day AS DOUBLE) AS s
      FROM tdaily a JOIN tdaily b ON b.day > a.day
    ),
    tslope AS (SELECT quantile_cont(s, 0.5) AS slope FROM tslopes),
    tresid AS (
      SELECT r4 - slope * day AS b, slope FROM tdaily CROSS JOIN tslope
    )
    SELECT count(*) AS n_days,
           round(slope / 10000.0, 6) AS slope_per_day,
           round(quantile_cont(b, 0.5) / 10000.0, 6) AS intercept
    FROM tresid GROUP BY slope
    """


def revenue_changepoint(events: DataFrame) -> DataFrame:
    """CUSUM changepoint: the day where the cumulative deviation of
    daily revenue from its overall mean peaks — the single most likely
    level-shift point. → one row ``[change_day, cusum_peak,
    mean_before, mean_after]`` (revenues 4-dp dollars; tie on the peak
    → earliest day).

    The statistic stays EXACT: with daily cents ``x_t`` and total
    ``S``, the scaled CUSUM ``n·Σ_{i≤t}x_i − t·S`` is integer algebra
    (no mean division until display), so the argmax is the same row in
    both engines — no float-boundary flake on the peak choice.

    Scale shape: collapses to |days| rows, then one ordered prefix sum
    and a 1-row argmax; before/after means re-aggregate the daily rows.
    """
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("_day"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_x"))
    )
    tot = daily.agg(
        F.count("*").alias("_n"), F.sum("_x").alias("_sx")
    )
    wcum = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.crossJoin(F.broadcast(tot)).select(
        "_day",
        "_x",
        "_n",
        "_sx",
        F.sum("_x").over(wcum).alias("_cx"),
        F.row_number().over(Window.orderBy("_day")).alias("_t"),
    )
    scored = cum.select(
        "_day",
        "_t",
        "_n",
        "_sx",
        "_cx",
        F.abs(F.col("_n") * F.col("_cx") - F.col("_t") * F.col("_sx")).alias(
            "_score"
        ),
    )
    best = scored.orderBy(F.desc("_score"), F.asc("_day")).limit(1)
    return best.select(
        F.col("_day").alias("change_day"),
        F.round(
            F.col("_score") / (F.col("_n").cast("double") * 10000.0), 4
        ).alias("cusum_peak"),
        F.round(
            F.col("_cx") / F.col("_t").cast("double") / 10000.0, 4
        ).alias("mean_before"),
        F.when(
            F.col("_n") > F.col("_t"),
            F.round(
                (F.col("_sx") - F.col("_cx"))
                / (F.col("_n") - F.col("_t")).cast("double")
                / 10000.0,
                4,
            ),
        ).alias("mean_after"),
    )


def revenue_changepoint_sql(table: str = "events") -> str:
    return f"""
    WITH cdaily AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS x
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ),
    ctot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx FROM cdaily),
    ccum AS (
      SELECT day, n, sx,
             CAST(sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cx,
             row_number() OVER (ORDER BY day) AS t
      FROM cdaily CROSS JOIN ctot
    ),
    cscore AS (
      SELECT *, abs(n * cx - t * sx) AS score FROM ccum
    )
    SELECT day AS change_day,
           round(score / (CAST(n AS DOUBLE) * 10000.0), 4) AS cusum_peak,
           round(cx / CAST(t AS DOUBLE) / 10000.0, 4) AS mean_before,
           CASE WHEN n > t THEN
             round((sx - cx) / CAST(n - t AS DOUBLE) / 10000.0, 4)
           END AS mean_after
    FROM cscore
    ORDER BY score DESC, day ASC LIMIT 1
    """


def skyline2d(points: DataFrame, x: str, y: str) -> DataFrame:
    """Skyline (Pareto frontier, maximize both): the points no other
    point dominates (≥ in both coordinates, > in at least one).
    → ``[x, y]``, x asc — the classic database skyline operator.

    Scale shape, two-phase: (1) collapse to one max-y per distinct x
    (a dominated-by-equal-x point can never be a skyline point);
    (2) LOCAL skyline per Spark partition — sort by x desc inside the
    partition and keep rows whose y beats the running max (a point
    dominated locally is dominated globally, so survivors are a
    superset of the answer); (3) the same sweep globally over the ≤
    |local skyline| survivors — the only single-task step, bounded by
    the frontier size, not the input.
    """
    pts = points.groupBy(F.col(x).alias("_sx")).agg(
        F.max(F.col(y)).alias("_sy")
    ).withColumn("_pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(F.desc("_sx"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = pts.withColumn("_pm", F.max("_sy").over(local_w)).where(
        F.col("_pm").isNull() | (F.col("_sy") > F.col("_pm"))
    )
    global_w = (
        Window.orderBy(F.desc("_sx"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        local.withColumn("_gm", F.max("_sy").over(global_w))
        .where(F.col("_gm").isNull() | (F.col("_sy") > F.col("_gm")))
        .select(F.col("_sx").alias(x), F.col("_sy").alias(y))
        .orderBy(x)
    )


def user_value_skyline(events: DataFrame) -> DataFrame:
    """Gate query: the Pareto frontier of users over (event count,
    total 4-dp value) — the "most active AND most valuable" boundary no
    user strictly beats. → ``[n_events, value_sum]``, n_events asc."""
    per_user = (
        events.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_v4"),
        )
    )
    sky = skyline2d(per_user, "n_events", "_v4")
    return sky.select(
        "n_events", F.round(F.col("_v4") / 10000.0, 4).alias("value_sum")
    )


def user_value_skyline_sql(table: str = "events") -> str:
    """Oracle: the NOT EXISTS dominance definition, quadratic over the
    collapsed point set (fine at gate scale — definition, not plan)."""
    return f"""
    WITH sku AS (
      SELECT user_id, count(*) AS n,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v4
      FROM {table} WHERE value IS NOT NULL GROUP BY user_id
    ),
    skp AS (SELECT n, max(v4) AS v4 FROM sku GROUP BY n)
    SELECT p.n AS n_events, round(p.v4 / 10000.0, 4) AS value_sum
    FROM skp p
    WHERE NOT EXISTS (
      SELECT 1 FROM skp q
      WHERE q.n >= p.n AND q.v4 >= p.v4 AND (q.n > p.n OR q.v4 > p.v4)
    )
    ORDER BY n_events
    """


def revenue_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Exponentially weighted moving average of daily revenue
    (``ewma_t = α·x_t + (1−α)·ewma_{t−1}``, seeded at the first day) —
    the standard smoother behind ops dashboards and anomaly baselines.
    → ``[day, revenue, ewma]``, day asc (4-dp dollars).

    The recurrence is linearized into ONE ordered prefix sum:
    ``ewma_t = (1−α)^t · (x_0 + α·Σ_{i=1..t} x_i/(1−α)^i)`` — a window
    cumulative over the |days| frame, no iterative loop, identical
    closed-form algebra in both engines. The ``(1−α)^{-i}`` rescale
    grows exponentially, so this form is for BOUNDED frames (a month:
    0.7^-30 ≈ 4e4 — harmless); an unbounded stream would segment and
    re-seed, or keep the recurrence in a streaming state store.
    """
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("_day"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_x"))
    )
    t = F.row_number().over(Window.orderBy("_day")) - 1
    a = float(alpha)
    w = F.when(
        F.col("_t") == 0, F.col("_x").cast("double")
    ).otherwise(F.lit(a) * F.col("_x") / F.pow(F.lit(1.0 - a), F.col("_t")))
    wcum = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("_t", t)
        .withColumn("_w", w)
        .withColumn("_s", F.sum("_w").over(wcum))
        .select(
            F.col("_day").alias("day"),
            F.round(F.col("_x") / 10000.0, 4).alias("revenue"),
            F.round(
                F.pow(F.lit(1.0 - a), F.col("_t")) * F.col("_s") / 10000.0, 4
            ).alias("ewma"),
        )
        .orderBy("day")
    )


def revenue_ewma_sql(table: str = "events", alpha: float = 0.3) -> str:
    a = float(alpha)
    return f"""
    WITH edaily AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS x
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ),
    et AS (
      SELECT day, x, row_number() OVER (ORDER BY day) - 1 AS t FROM edaily
    ),
    ew AS (
      SELECT day, x, t,
             CASE WHEN t = 0 THEN CAST(x AS DOUBLE)
                  ELSE {a!r} * x / pow({1.0 - a!r}, t) END AS w
      FROM et
    ),
    es AS (
      SELECT day, x, t,
             sum(w) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
      FROM ew
    )
    SELECT day, round(x / 10000.0, 4) AS revenue,
           round(pow({1.0 - a!r}, t) * s / 10000.0, 4) AS ewma
    FROM es ORDER BY day
    """


def peak_concurrency(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Peak simultaneous sessions across all users and the earliest
    second it is reached — capacity planning's first number. Sessions
    are :func:`sessionize`'s gap-based intervals, CLOSED on both ends
    (a session live at second t covers start ≤ t ≤ end). → one row
    ``[peak_sessions, at_ts]`` (epoch seconds).

    The sweep-line, declaratively: +1 at each session start, −1 just
    AFTER each end (end+1, which makes the closed-interval tie rule
    explicit — a session ending at t still overlaps one starting at t),
    one ordered prefix sum over the ±1 stream, argmax with
    earliest-tie-break. Scale shape: |sessions|·2 delta rows, one
    ordered scan; the sessionize shuffle is the only event-sized stage.
    """
    sess = sessionize(events, gap_sec=gap_sec).select("start_ts", "end_ts")
    deltas = sess.select(
        F.col("start_ts").alias("_t"), F.lit(1).alias("_d")
    ).unionAll(
        sess.select((F.col("end_ts") + 1).alias("_t"), F.lit(-1).alias("_d"))
    )
    merged = deltas.groupBy("_t").agg(F.sum("_d").alias("_d"))
    wcum = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    run = merged.withColumn("_live", F.sum("_d").over(wcum))
    return (
        run.orderBy(F.desc("_live"), F.asc("_t"))
        .limit(1)
        .select(
            F.col("_live").alias("peak_sessions"), F.col("_t").alias("at_ts")
        )
    )


def peak_concurrency_sql(table: str = "events", gap_sec: int = 1800) -> str:
    return f"""
    WITH pce AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), pcf AS (
      SELECT *, CASE WHEN lag(ts_s) OVER
                   (PARTITION BY user_id ORDER BY ts_s) IS NULL
                 OR ts_s - lag(ts_s) OVER
                   (PARTITION BY user_id ORDER BY ts_s) > {int(gap_sec)}
                THEN 1 ELSE 0 END AS new_sess
      FROM pce
    ), pcs AS (
      SELECT *, sum(new_sess) OVER
               (PARTITION BY user_id ORDER BY ts_s
                ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM pcf
    ), pciv AS (
      SELECT min(ts_s) AS start_ts, max(ts_s) AS end_ts
      FROM pcs GROUP BY user_id, sess_id
    ), pcd AS (
      SELECT start_ts AS t, 1 AS d FROM pciv
      UNION ALL
      SELECT end_ts + 1 AS t, -1 AS d FROM pciv
    ), pcm AS (
      SELECT t, sum(d) AS d FROM pcd GROUP BY t
    ), pcr AS (
      SELECT t, sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS live
      FROM pcm
    )
    SELECT CAST(live AS BIGINT) AS peak_sessions, t AS at_ts
    FROM pcr ORDER BY live DESC, t ASC LIMIT 1
    """


def watermark_audit(events: DataFrame) -> DataFrame:
    """How late does data actually arrive? — the number a Structured
    Streaming watermark must be chosen from. Arrival order is proxied by
    ``event_id`` (the ingest-monotone id); an event is LATE when its
    event time trails the per-user running maximum of earlier-arrived
    events. → one row ``[n_events, n_late, late_frac, max_lateness_sec,
    p50_lateness_sec, p95_lateness_sec]`` (percentiles over LATE events
    only; NULLs when nothing is late — a zero watermark would do).

    Scale shape: ONE user-keyed window (running max over arrival order —
    the same keyed-state shape the stream itself would run), then a
    1-row aggregate with exact interpolated percentiles. Per-key
    lateness is what keyed streaming state experiences; a global
    total-order audit would need a single-partition sort and answers a
    question no keyed watermark asks.
    """
    wl = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_s = F.unix_timestamp("ts")
    late = events.select(
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.max(ts_s).over(wl) - ts_s, F.lit(0).cast("long")),
        ).alias("_late_s")
    )
    return late.agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("_late_s") > 0).cast("long")).alias("n_late"),
        F.round(
            F.sum((F.col("_late_s") > 0).cast("long"))
            / F.count("*").cast("double"),
            6,
        ).alias("late_frac"),
        F.max(F.when(F.col("_late_s") > 0, F.col("_late_s"))).alias(
            "max_lateness_sec"
        ),
        F.percentile(
            F.when(F.col("_late_s") > 0, F.col("_late_s")), F.lit(0.5)
        ).alias("p50_lateness_sec"),
        F.percentile(
            F.when(F.col("_late_s") > 0, F.col("_late_s")), F.lit(0.95)
        ).alias("p95_lateness_sec"),
    )


def watermark_audit_sql(table: str = "events") -> str:
    return f"""
    WITH wa AS (
      SELECT greatest(0, coalesce(
               max(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               - CAST(floor(epoch(ts)) AS BIGINT), 0)) AS late_s
      FROM {table}
    )
    SELECT count(*) AS n_events,
           CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           round(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS late_frac,
           max(CASE WHEN late_s > 0 THEN late_s END) AS max_lateness_sec,
           quantile_cont(CASE WHEN late_s > 0 THEN late_s END, 0.5)
             AS p50_lateness_sec,
           quantile_cont(CASE WHEN late_s > 0 THEN late_s END, 0.95)
             AS p95_lateness_sec
    FROM wa
    """


def decayed_engagement(
    events: DataFrame,
    half_life_days: float = 7.0,
    as_of: str = "2024-01-31",
    top_n: int = 50,
) -> DataFrame:
    """Exponential time-decay engagement score — the recency-weighted
    sum behind "active user" rankings: each event contributes
    ``value · 2^(−age_days/half_life)``. → ``[user_id, score]``, top
    ``top_n`` by score desc (tie → user_id asc).

    Determinism: age is an exact integer-microsecond difference; the
    decay weight is the same one-op double in both engines, and the
    per-user sum rides ONE map-side-combinable aggregate. Summation
    order of the weighted doubles is engine-dependent, so the score
    rounds to 6 dp — drift is ~1e-15 relative, far below the rounding.
    Top-n compiles to TakeOrdered (per-partition heads + one bounded
    merge), never a global sort.
    """
    asof_us = F.unix_micros(F.lit(as_of).cast("timestamp"))
    age_days = (
        asof_us - F.unix_micros(F.col("ts").cast("timestamp"))
    ) / F.lit(86_400_000_000.0)
    w = F.pow(F.lit(2.0), -age_days / F.lit(float(half_life_days)))
    return (
        events.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.round(F.sum(F.col("value") * w), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("user_id"))
        .limit(int(top_n))
    )


def decayed_engagement_sql(
    table: str = "events",
    half_life_days: float = 7.0,
    as_of: str = "2024-01-31",
    top_n: int = 50,
) -> str:
    return f"""
    SELECT user_id,
           round(sum(value * pow(2.0,
             -((epoch_us(TIMESTAMP '{as_of}') - epoch_us(ts))
               / 86400000000.0) / {float(half_life_days)!r})), 6) AS score
    FROM {table} WHERE value IS NOT NULL
    GROUP BY user_id
    ORDER BY score DESC, user_id ASC
    LIMIT {int(top_n)}
    """


def ab_test_msprt(
    events: DataFrame, tau: float = 0.1, alpha: float = 0.05
) -> DataFrame:
    """Always-valid A/B readout — the mixture sequential probability
    ratio test (Johari, Koomen, Pekelis & Walsh, KDD 2017, public
    recipe): unlike a fixed-horizon z-test, its p-value stays valid
    under CONTINUOUS monitoring, which is how dashboards are actually
    read. Effect δ̂ = treatment − control mean of per-user value sums
    (same md5 split as :func:`ab_test_srm`); with ``V = s²(1/n0+1/n1)``
    and a N(0, τ²) effect mixture, ``ln Λ = ½·ln(V/(V+τ²)) +
    δ̂²τ²/(2V(V+τ²))`` and the always-valid p is ``min(1, e^{−ln Λ})``.
    → one row ``[n_control, n_treatment, delta, var_delta, log_lambda,
    p_value, reject]`` (log-scale Λ so an overwhelming effect can't
    overflow to engine-formatted infinity).

    Determinism: every moment is an exact int64 sum of 4-dp-fixed
    values; the final projection is one identical double expression in
    both engines. One user-grain aggregate + a 1-row reduction.
    """
    from linkgraph_spark.functions.hashing import md5_long

    v4 = F.round(F.col("value") * 10000).cast("long")
    per_user = (
        events.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.sum(v4).alias("y4"))
        .select(
            (md5_long(F.col("user_id").cast("string")) % 2).alias("_v"), "y4"
        )
    )
    s = per_user.agg(
        F.count("*").alias("n"),
        F.sum("y4").alias("sy"),
        F.sum(F.col("y4") * F.col("y4")).alias("syy"),
        F.sum(F.when(F.col("_v") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("_v") == 0, F.col("y4")).otherwise(0)).alias("sy0"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n, sy, syy, n0 = d("n"), d("sy"), d("syy"), d("n0")
    n1 = n - n0
    scale = F.lit(10000.0)
    m0 = d("sy0") / n0 / scale
    m1 = (sy - d("sy0")) / n1 / scale
    delta = m1 - m0
    # pooled sample variance of the per-user metric, in dollars^2
    var = (syy - sy * sy / n) / (n - 1) / (scale * scale)
    v_delta = var * (1.0 / n0 + 1.0 / n1)
    t2 = F.lit(float(tau) * float(tau))
    log_lam = 0.5 * F.log(v_delta / (v_delta + t2)) + (
        delta * delta * t2
    ) / (2.0 * v_delta * (v_delta + t2))
    p = F.least(F.lit(1.0), F.exp(-log_lam))
    return s.select(
        F.col("n0").alias("n_control"),
        (F.col("n") - F.col("n0")).alias("n_treatment"),
        F.round(delta, 6).alias("delta"),
        F.round(v_delta, 6).alias("var_delta"),
        F.round(log_lam, 6).alias("log_lambda"),
        F.round(p, 6).alias("p_value"),
        (p < F.lit(float(alpha))).alias("reject"),
    )


def ab_test_msprt_sql(
    table: str = "events", tau: float = 0.1, alpha: float = 0.05
) -> str:
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    t2 = float(tau) * float(tau)
    return f"""
    WITH mu AS (
      SELECT ({h}) % 2 AS v,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS y4
      FROM {table} WHERE value IS NOT NULL
      GROUP BY user_id
    ),
    ms AS (
      SELECT count(*) AS n, CAST(sum(y4) AS BIGINT) AS sy,
             CAST(sum(y4 * y4) AS BIGINT) AS syy,
             sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n0,
             CAST(sum(CASE WHEN v = 0 THEN y4 ELSE 0 END) AS BIGINT) AS sy0
      FROM mu
    ),
    md AS (
      SELECT n, n0, sy, syy, sy0,
             (CAST(sy AS DOUBLE) - CAST(sy0 AS DOUBLE))
               / CAST(n - n0 AS DOUBLE) / 10000.0
             - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 10000.0 AS delta,
             (CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n - 1 AS DOUBLE) / (10000.0 * 10000.0)
             * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n - n0 AS DOUBLE))
               AS v_delta
      FROM ms
    ),
    ml AS (
      SELECT *,
             0.5 * ln(v_delta / (v_delta + {t2!r}))
             + (delta * delta * {t2!r})
               / (2.0 * v_delta * (v_delta + {t2!r})) AS log_lambda
      FROM md
    )
    SELECT CAST(n0 AS BIGINT) AS n_control,
           CAST(n - n0 AS BIGINT) AS n_treatment,
           round(delta, 6) AS delta,
           round(v_delta, 6) AS var_delta,
           round(log_lambda, 6) AS log_lambda,
           round(least(1.0, exp(-log_lambda)), 6) AS p_value,
           (least(1.0, exp(-log_lambda)) < {float(alpha)!r}) AS reject
    FROM ml
    """


def _poisson_cum(kmax: int = 7) -> list:
    """Cumulative Poisson(1) probabilities c_0..c_{kmax-1}, computed
    once in python — identical double literals in both engines."""
    import math

    out, acc, fact = [], 0.0, 1.0
    for k in range(kmax):
        if k > 0:
            fact *= k
        acc += math.exp(-1.0) / fact
        out.append(acc)
    return out


def bootstrap_mean_ci(
    events: DataFrame, n_replicates: int = 50
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value —
    the bootstrap that actually runs at 100 TB (each replicate weights
    every row by an independent Poisson(1) count instead of resampling
    n-of-n, so one pass computes all replicates; the at-scale form
    popularized by Chamandy et al., Google 2012 — public recipe).
    → one row ``[n_events, mean, ci_lo, ci_hi, n_replicates]`` (95% CI
    as the exact 2.5/97.5 percentiles of the replicate means).

    Determinism: the per-(event, replicate) weight inverts the
    Poisson(1) CDF at a portable-hash uniform (weights ≥ 7 truncate —
    P ≈ 8e-5, identically in both engines); replicate means divide
    exact int64 sums. Scale shape: rows × B weighted partial sums,
    all map-side combinable into B groups; the CI is a percentile over
    the B-row frame.
    """
    from linkgraph_spark.functions.hashing import md5_long

    cums = _poisson_cum()
    v4 = F.round(F.col("value") * 10000).cast("long")
    reps = (
        events.where(F.col("value").isNotNull())
        .select("event_id", v4.alias("_v4"))
        .withColumn(
            "_b",
            F.explode(F.array(*[F.lit(b) for b in range(int(n_replicates))])),
        )
    )
    u = (
        md5_long(
            F.concat_ws(
                ":", F.col("event_id").cast("string"), F.col("_b").cast("string")
            )
        )
        % F.lit(1 << 30)
    ).cast("double") / F.lit(float(1 << 30))
    w = sum(
        [(u > F.lit(c)).cast("long") for c in cums], F.lit(0).cast("long")
    )
    per_rep = (
        reps.withColumn("_w", w)
        .groupBy("_b")
        .agg(
            F.sum(F.col("_w") * F.col("_v4")).alias("_swv"),
            F.sum("_w").alias("_sw"),
        )
        .select(
            (F.col("_swv") / F.col("_sw").cast("double") / 10000.0).alias(
                "_mean_b"
            )
        )
    )
    point = events.where(F.col("value").isNotNull()).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(v4) / F.count("*").cast("double") / 10000.0, 6).alias(
            "mean"
        ),
    )
    ci = per_rep.agg(
        F.round(F.percentile("_mean_b", F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile("_mean_b", F.lit(0.975)), 6).alias("ci_hi"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_events",
        "mean",
        "ci_lo",
        "ci_hi",
        F.lit(int(n_replicates)).alias("n_replicates"),
    )


def bootstrap_mean_ci_sql(
    table: str = "events", n_replicates: int = 50
) -> str:
    from linkgraph_spark.functions.hashing import md5_long_sql

    cums = _poisson_cum()
    h = md5_long_sql(
        "concat(CAST(event_id AS VARCHAR), ':', CAST(b AS VARCHAR))"
    )
    wsum = " + ".join(
        f"(CASE WHEN u > {c!r} THEN 1 ELSE 0 END)" for c in cums
    )
    bs = ", ".join(str(b) for b in range(int(n_replicates)))
    return f"""
    WITH bev AS (
      SELECT event_id, CAST(round(value * 10000) AS BIGINT) AS v4
      FROM {table} WHERE value IS NOT NULL
    ),
    brep AS (
      SELECT event_id, v4, unnest([{bs}]) AS b FROM bev
    ),
    bu AS (
      SELECT v4, b,
             CAST(({h}) % {1 << 30} AS DOUBLE) / {float(1 << 30)!r} AS u
      FROM brep
    ),
    bw AS (SELECT v4, b, ({wsum}) AS w FROM bu),
    bm AS (
      SELECT CAST(sum(w * v4) AS BIGINT)
               / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / 10000.0 AS mean_b
      FROM bw GROUP BY b
    ),
    bp AS (
      SELECT count(*) AS n_events,
             round(CAST(sum(v4) AS BIGINT)
                   / CAST(count(*) AS DOUBLE) / 10000.0, 6) AS mean
      FROM bev
    ),
    bci AS (
      SELECT round(quantile_cont(mean_b, 0.025), 6) AS ci_lo,
             round(quantile_cont(mean_b, 0.975), 6) AS ci_hi
      FROM bm
    )
    SELECT n_events, mean, ci_lo, ci_hi,
           {int(n_replicates)} AS n_replicates
    FROM bp CROSS JOIN bci
    """


def uplift_by_decile(
    events: DataFrame,
    split_ts: str = "2024-01-16",
    half_life_days: float = 7.0,
) -> DataFrame:
    """Uplift (Qini-style) readout: users rank into deciles of their
    PRE-period decayed-engagement score; within each decile the
    POST-period purchase rate of treatment vs control (same md5 split
    as :func:`ab_test_srm`) gives the uplift — "whom does the treatment
    actually move". → ``[decile, n_control, n_treatment, rate_control,
    rate_treatment, uplift]``, decile 0 (lowest score) … 9; rates NULL
    when a decile lacks an arm.

    Determinism: the score reuses :func:`decayed_engagement`'s rounded
    form (identical doubles in both engines), decile edges are ONE
    exact-percentile aggregate over those scores, and bucketing is the
    same broadcast-edge comparison as :func:`value_psi_drift` — never
    an ntile window over the full population.
    """
    from linkgraph_spark.functions.hashing import md5_long

    split = F.lit(split_ts).cast("timestamp")
    asof_us = F.unix_micros(split)
    age_days = (
        asof_us - F.unix_micros(F.col("ts").cast("timestamp"))
    ) / F.lit(86_400_000_000.0)
    wgt = F.pow(F.lit(2.0), -age_days / F.lit(float(half_life_days)))
    per_user = events.groupBy("user_id").agg(
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("ts") < split) & F.col("value").isNotNull(),
                        F.col("value") * wgt,
                    )
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("_score"),
        F.max(
            (
                (F.col("ts") >= split)
                & (F.col("event_type") == "purchase")
            ).cast("int")
        ).alias("_conv"),
    ).select(
        "_score",
        "_conv",
        (md5_long(F.col("user_id").cast("string")) % 2).alias("_variant"),
    )
    qs = [i / 10.0 for i in range(1, 10)]
    edges = per_user.agg(
        F.percentile("_score", F.array(*[F.lit(q) for q in qs])).alias("_e")
    )
    bucketed = per_user.crossJoin(F.broadcast(edges)).select(
        "_variant",
        "_conv",
        F.aggregate(
            "_e", F.lit(0), lambda acc, e: acc + (F.col("_score") > e).cast("int")
        )
        .cast("long")
        .alias("decile"),
    )
    g = bucketed.groupBy("decile").agg(
        F.sum(F.when(F.col("_variant") == 0, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(F.col("_variant") == 1, 1).otherwise(0)).alias(
            "n_treatment"
        ),
        F.sum(F.when(F.col("_variant") == 0, F.col("_conv")).otherwise(0)).alias(
            "_c0"
        ),
        F.sum(F.when(F.col("_variant") == 1, F.col("_conv")).otherwise(0)).alias(
            "_c1"
        ),
    )
    r0 = F.when(
        F.col("n_control") > 0,
        F.round(F.col("_c0") / F.col("n_control").cast("double"), 6),
    )
    r1 = F.when(
        F.col("n_treatment") > 0,
        F.round(F.col("_c1") / F.col("n_treatment").cast("double"), 6),
    )
    return g.select(
        "decile",
        "n_control",
        "n_treatment",
        r0.alias("rate_control"),
        r1.alias("rate_treatment"),
        # a decile missing an arm has no uplift estimate (ANSI division
        # would throw; DuckDB's double division would leak an inf)
        F.when(
            (F.col("n_control") > 0) & (F.col("n_treatment") > 0),
            F.round(
                F.col("_c1") / F.col("n_treatment").cast("double")
                - F.col("_c0") / F.col("n_control").cast("double"),
                6,
            ),
        ).alias("uplift"),
    ).orderBy("decile")


def uplift_by_decile_sql(
    table: str = "events",
    split_ts: str = "2024-01-16",
    half_life_days: float = 7.0,
) -> str:
    from linkgraph_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    qs = ", ".join(str(i / 10.0) for i in range(1, 10))
    return f"""
    WITH uu AS (
      SELECT user_id,
             round(coalesce(sum(CASE WHEN ts < TIMESTAMP '{split_ts}'
                                      AND value IS NOT NULL
               THEN value * pow(2.0,
                 -((epoch_us(TIMESTAMP '{split_ts}') - epoch_us(ts))
                   / 86400000000.0) / {float(half_life_days)!r}) END), 0.0), 6)
               AS score,
             max(CASE WHEN ts >= TIMESTAMP '{split_ts}'
                       AND event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
             ({h}) % 2 AS variant
      FROM {table}
      GROUP BY user_id
    ),
    ue AS (SELECT quantile_cont(score, [{qs}]) AS e FROM uu),
    ub AS (
      SELECT variant, conv,
             (SELECT count(*) FROM unnest(e) AS t(x) WHERE score > x)
               AS decile
      FROM uu CROSS JOIN ue
    ),
    ug AS (
      SELECT decile,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_control,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_treatment,
             sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS c0,
             sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS c1
      FROM ub GROUP BY decile
    )
    SELECT decile, CAST(n_control AS BIGINT) AS n_control,
           CAST(n_treatment AS BIGINT) AS n_treatment,
           CASE WHEN n_control > 0
             THEN round(c0 / CAST(n_control AS DOUBLE), 6) END AS rate_control,
           CASE WHEN n_treatment > 0
             THEN round(c1 / CAST(n_treatment AS DOUBLE), 6) END
             AS rate_treatment,
           CASE WHEN n_control > 0 AND n_treatment > 0
             THEN round(c1 / CAST(n_treatment AS DOUBLE)
                        - c0 / CAST(n_control AS DOUBLE), 6) END AS uplift
    FROM ug ORDER BY decile
    """


# ---------------------------------------------------------------------------
# Exact Shapley channel attribution (wave 89)
# ---------------------------------------------------------------------------


def shapley_attribution(
    events: DataFrame, target: str = "purchase", max_channels: int = 12
) -> DataFrame:
    """→ [channel, shapley_scaled, shapley_conversions] — EXACT Shapley-value
    attribution of conversions to acquisition channels (Shapley 1953;
    data-driven multi-touch attribution per Dalessandro et al. 2012 — public
    formulation). Converters are users with a ``target`` event; a converter's
    coalition is the SET of distinct non-target event types they touched at
    or before their first conversion second. The characteristic function is
    ``v(S) = #converters whose touched-set ⊆ S`` (conversions fully explained
    by coalition S), and each channel's Shapley value is the classic weighted
    marginal sum — the unique attribution that is efficient (values sum to
    ``v(all) − v(∅)``, i.e. every conversion with ≥1 touch is fully split)
    and symmetric. First-touch (:func:`attribution`) answers "who was first";
    this answers "who deserves credit" under order-free cooperation.

    Exactness: the Shapley sum is computed in integer units of ``1/k!``
    (``shapley_scaled = k!·φ``, a BIGINT — weights ``|S|!·(k−1−|S|)!`` are
    exact integers, marginals are converter counts), so the oracle hash is
    bit-stable; ``shapley_conversions`` is the rounded double ``φ``. Bound:
    fits BIGINT while ``k!·n_converters < 2^63`` (k ≤ 12 enforced — event-type
    vocabularies are tiny by nature; ≈1.9e9 converters at k=12, far above any
    real channel count's audience).

    Scale shape: two fact-table passes (first-conversion min-agg + the
    user-keyed touch join, both map-side combinable / user-bounded), then an
    immediate collapse to COALITION-PATTERN grain — at most ``2^k ≤ 4096``
    rows no matter how many converters — and every remaining join (subset
    lattice, marginal pairs) runs on that bounded lattice. The only driver
    value is ``k`` itself (an O(1) one-row count used to size the lattice
    and validate the bound). No per-row Python, no iteration.

    Reference parity: the reference has no attribution surface (its analytics
    end at PageRank, pagerank_lambda/dynamodb/pagerank.py:51-99); engine
    extension for the experimentation/growth stack.
    """
    spark = events.sparkSession
    e = events.select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    t0 = (
        e.where(F.col("event_type") == target)
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t0"))
    )
    touched = (
        e.where(F.col("event_type") != target)
        .join(t0, "user_id")
        .where(F.col("ts_s") <= F.col("t0"))
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
    )
    chan_bits = (
        touched.select("channel")
        .distinct()
        .withColumn(
            "bit", F.row_number().over(Window.orderBy("channel")) - F.lit(1)
        )
    )
    k = chan_bits.count()  # O(1): |event-type vocabulary| rows
    schema = "channel string, shapley_scaled bigint, shapley_conversions double"
    if k == 0:
        return spark.createDataFrame([], schema)
    if k > max_channels:
        raise ValueError(
            f"shapley_attribution: {k} channels > max_channels={max_channels}; "
            "the exact 2^k coalition lattice is only sane for tiny channel "
            "vocabularies (k! also overflows the scaled BIGINT output)"
        )
    bit_of = F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
    masks = (
        t0.join(touched.join(chan_bits, "channel"), "user_id", "left")
        .groupBy("user_id")
        .agg(F.coalesce(F.sum(bit_of), F.lit(0)).cast("long").alias("mask"))
    )
    pat = masks.groupBy("mask").agg(F.count("*").alias("cnt"))  # ≤ 2^k rows
    lattice = spark.range(1 << k).select(F.col("id").alias("s"))
    v = (
        lattice.join(pat, F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("v"))
    )
    pairs = chan_bits.crossJoin(lattice).where(
        F.expr("(s & shiftleft(CAST(1 AS BIGINT), bit)) = 0")
    )
    vs = v.select(F.col("s").alias("s0"), F.col("v").alias("v_without"))
    vi = v.select(F.col("s").alias("s1"), F.col("v").alias("v_with"))
    weight = F.factorial(F.bit_count("s")) * F.factorial(
        F.lit(k - 1) - F.bit_count("s")
    )
    terms = (
        pairs.join(vs, F.col("s") == F.col("s0"))
        .join(vi, F.expr("s1 = (s | shiftleft(CAST(1 AS BIGINT), bit))"))
        .select(
            "channel",
            (
                weight.cast("decimal(38,0)")
                * (F.col("v_with") - F.col("v_without"))
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("channel")
        .agg(F.sum("term").alias("sc"))
        .select(
            "channel",
            F.col("sc").cast("long").alias("shapley_scaled"),
            F.round(
                F.col("sc").cast("double")
                / F.factorial(F.lit(k)).cast("double"),
                6,
            ).alias("shapley_conversions"),
        )
    )


def shapley_attribution_sql(
    target: str = "purchase", table: str = "events"
) -> str:
    """DuckDB oracle for :func:`shapley_attribution` (standalone query;
    computes k in-SQL and builds the coalition lattice from a constant
    4096-row generate_series — the engine's k ≤ 12 bound — filtered to
    ``s < 2^k``, since DuckDB's generate_series cannot take lateral
    column arguments)."""
    t = target.replace("'", "''")
    return f"""
    WITH sh_e AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM {table}
    ), sh_t0 AS (
      SELECT user_id, min(ts_s) AS t0 FROM sh_e
      WHERE event_type = '{t}' GROUP BY user_id
    ), sh_touch AS (
      SELECT DISTINCT e.user_id, e.event_type AS channel
      FROM sh_e e JOIN sh_t0 tt ON tt.user_id = e.user_id
      WHERE e.event_type <> '{t}' AND e.ts_s <= tt.t0
    ), sh_chan AS (
      SELECT channel,
             CAST(row_number() OVER (ORDER BY channel) - 1 AS BIGINT) AS bit
      FROM (SELECT DISTINCT channel FROM sh_touch)
    ), sh_k AS (SELECT count(*) AS k FROM sh_chan),
    sh_mask AS (
      SELECT tt.user_id,
             coalesce(sum(CAST(1 AS BIGINT) << c.bit), 0) AS mask
      FROM sh_t0 tt
      LEFT JOIN sh_touch u ON u.user_id = tt.user_id
      LEFT JOIN sh_chan c ON c.channel = u.channel
      GROUP BY tt.user_id
    ), sh_pat AS (SELECT mask, count(*) AS cnt FROM sh_mask GROUP BY mask),
    sh_lat AS (
      SELECT CAST(gs.s AS BIGINT) AS s
      FROM generate_series(0, 4095) gs(s), sh_k
      WHERE gs.s < (CAST(1 AS BIGINT) << k)
    ), sh_v AS (
      SELECT l.s, coalesce(sum(p.cnt), 0) AS v
      FROM sh_lat l LEFT JOIN sh_pat p ON (p.mask & l.s) = p.mask
      GROUP BY l.s
    ), sh_terms AS (
      SELECT c.channel, kk.k,
             factorial(CAST(bit_count(l.s) AS INT))
               * factorial(CAST(kk.k - 1 - bit_count(l.s) AS INT))
               * (vi.v - vs.v) AS term
      FROM sh_chan c
      CROSS JOIN sh_k kk
      JOIN sh_lat l ON (l.s & (CAST(1 AS BIGINT) << c.bit)) = 0
      JOIN sh_v vs ON vs.s = l.s
      JOIN sh_v vi ON vi.s = (l.s | (CAST(1 AS BIGINT) << c.bit))
    )
    SELECT channel,
           CAST(sum(term) AS BIGINT) AS shapley_scaled,
           round(CAST(sum(term) AS DOUBLE)
                 / CAST(factorial(CAST(k AS INT)) AS DOUBLE), 6)
             AS shapley_conversions
    FROM sh_terms GROUP BY channel, k
    """


# ---------------------------------------------------------------------------
# Seasonal decomposition: trend / day-of-week / residual (wave 95)
# ---------------------------------------------------------------------------


def _seasonal_parts(events: DataFrame):
    """Shared lattice for the wave-95 pair: densified daily revenue (u =
    4-dp-dollar units, missing calendar days are EXACT zero-revenue days —
    required for a calendar-correct centered MA), the 7-day centered trend
    sum, the detrended series scaled by 7 (exact BIGINT), and the per-dow
    seasonal numerator/denominator."""
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("day"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("x"))
    )
    rng = daily.groupBy().agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dense = (
        rng.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .join(daily, "day", "left")
        .select(
            "day",
            (((F.col("day") % 7) + 7) % 7).alias("dow"),
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        )
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = dense.select(
        "day",
        "dow",
        "x",
        F.when(F.count("*").over(w7) == 7, F.sum("x").over(w7)).alias("sum7"),
    ).withColumn("d7", F.lit(7) * F.col("x") - F.col("sum7"))
    seas = t.where(F.col("d7").isNotNull()).groupBy("dow").agg(
        F.sum("d7").alias("s_num"), F.count("*").alias("s_cnt")
    )
    return t.join(seas, "dow", "left")


def seasonal_decompose(events: DataFrame) -> DataFrame:
    """→ [day, dow, revenue, trend, seasonal, residual] — the classical
    additive decomposition of daily revenue (Persons 1919 lineage; the
    moving-average method of every stats-textbook "decompose"): trend =
    centered 7-day moving average (NULL on the 3 edge days each side),
    seasonal = the day-of-week mean of the detrended series, residual =
    revenue − trend − seasonal. The dashboard primitive that splits "we
    grew" from "it's Saturday" — complements the Theil–Sen trend and the
    per-dow profile, which each report one piece of this.

    Exactness: revenue is summed in exact 4-dp units; absent calendar
    days are densified to exact zeros (a gap would silently shift the
    centered window off-calendar); the detrended series is kept ×7 so it
    stays BIGINT (``d7 = 7x − Σ7``); ``dow = day mod 7`` (epoch-anchored,
    timezone-free, Thursday = 0). Every emitted double is one staged
    division of exact integers, identical text in both engines, rounded
    to 4 — bit-stable. Seasonal is emitted for edge days too (the dow
    index applies calendar-wide); residual only where trend exists.

    Scale shape: one fact-table aggregate to DAY grain, then everything
    runs on the |days| frame (a decade ≈ 3.7k rows) — the ordered windows
    are bounded exactly like the exact-percentile/EWMA family. No second
    pass over events.

    Reference parity: no time-series surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    j = _seasonal_parts(events)
    seasonal = F.when(
        F.col("s_cnt") > 0,
        F.round(
            F.col("s_num").cast("double") / (F.lit(70000.0) * F.col("s_cnt")),
            4,
        ),
    )
    residual = F.when(
        F.col("sum7").isNotNull() & (F.col("s_cnt") > 0),
        F.round(
            F.col("x") / F.lit(10000.0)
            - F.col("sum7") / F.lit(70000.0)
            - F.col("s_num").cast("double") / (F.lit(70000.0) * F.col("s_cnt")),
            4,
        ),
    )
    return (
        j.select(
            "day",
            "dow",
            F.round(F.col("x") / 10000.0, 4).alias("revenue"),
            F.round(F.col("sum7") / 70000.0, 4).alias("trend"),
            seasonal.alias("seasonal"),
            residual.alias("residual"),
        )
        .orderBy("day")
    )


_SEAS_CTES = """
    sdaily AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS x
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ), sdense AS (
      SELECT g.day, ((g.day % 7) + 7) % 7 AS dow, coalesce(d.x, 0) AS x
      FROM (SELECT unnest(generate_series(
              (SELECT min(day) FROM sdaily),
              (SELECT max(day) FROM sdaily))) AS day) g
      LEFT JOIN sdaily d ON d.day = g.day
    ), st AS (
      SELECT day, dow, x,
             CASE WHEN count(*) OVER w = 7 THEN sum(x) OVER w END AS sum7
      FROM sdense
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), std AS (
      SELECT *, 7 * x - sum7 AS d7 FROM st
    ), sseas AS (
      SELECT dow, sum(d7) AS s_num, count(*) AS s_cnt
      FROM std WHERE d7 IS NOT NULL GROUP BY dow
    ), sj AS (
      SELECT t.*, s.s_num, s.s_cnt FROM std t LEFT JOIN sseas s USING (dow)
    )"""


def seasonal_decompose_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`seasonal_decompose` (same staged divisions)."""
    return f"""
    WITH {_SEAS_CTES.format(table=table)}
    SELECT day, dow,
           round(x / 10000.0, 4) AS revenue,
           round(sum7 / 70000.0, 4) AS trend,
           CASE WHEN s_cnt > 0
                THEN round(CAST(s_num AS DOUBLE) / (70000.0 * s_cnt), 4)
           END AS seasonal,
           CASE WHEN sum7 IS NOT NULL AND s_cnt > 0
                THEN round(x / 10000.0 - sum7 / 70000.0
                           - CAST(s_num AS DOUBLE) / (70000.0 * s_cnt), 4)
           END AS residual
    FROM sj ORDER BY day
    """


def seasonal_strength(events: DataFrame) -> DataFrame:
    """→ one row [n_days, n_full, strength_trend, strength_seasonal] —
    Hyndman's STL strength-of-component measures (FPP3 §4.3, public
    formulation): ``F_T = max(0, 1 − Var(R)/Var(T+R))`` and ``F_S =
    max(0, 1 − Var(R)/Var(S+R))`` over the full-trend-window days of
    :func:`seasonal_decompose`. One number each for "is there a trend /
    weekly cycle worth modeling" — the triage stat before reaching for
    the decompose table itself.

    Exactness: the residual and the detrended/deseasonalized series are
    QUANTIZED to integer micro-dollars through the same staged divisions
    as the decompose columns (bit-identical across engines), and each
    population variance is the exact integer ``n·Σv² − (Σv)²`` — squares
    and sums in DECIMAL(38,0)/HUGEINT (a micro-dollar value can pass
    2^31.5, so its square must not touch BIGINT). The final ratio is one
    double division of exact integers, rounded to 6; a zero-variance
    denominator reports NULL (degenerate series, not a strength of 1).

    Scale shape: identical to :func:`seasonal_decompose` plus a one-row
    reduce over the |days| frame.
    """
    j = _seasonal_parts(events).where(
        F.col("sum7").isNotNull() & (F.col("s_cnt") > 0)
    )
    seas_d = F.col("s_num").cast("double") / (F.lit(70000.0) * F.col("s_cnt"))
    detr_d = F.col("x") / F.lit(10000.0) - F.col("sum7") / F.lit(70000.0)
    res_micro = F.round(F.lit(1e6) * (detr_d - seas_d), 0).cast("long")
    detr_micro = F.round(F.lit(1e6) * detr_d, 0).cast("long")
    des_micro = F.round(
        F.lit(1e6) * (F.col("x") / F.lit(10000.0) - seas_d), 0
    ).cast("long")
    q = j.select(
        res_micro.alias("r"), detr_micro.alias("t"), des_micro.alias("s")
    )

    def _var_num(c):
        d = F.col(c).cast("decimal(38,0)")
        return (
            F.count("*").cast("decimal(38,0)") * F.sum(d * d)
            - F.sum(d) * F.sum(d)
        )

    n_days = events.where(F.col("value").isNotNull()).select(
        _epoch_day("ts").alias("day")
    ).distinct().groupBy().agg(F.count("*").cast("long").alias("n_days"))
    s = q.groupBy().agg(
        F.count("*").cast("long").alias("n_full"),
        _var_num("r").alias("vr"),
        _var_num("t").alias("vt"),
        _var_num("s").alias("vs"),
    )
    return s.crossJoin(n_days).select(
        "n_days",
        "n_full",
        F.when(
            F.col("vs").cast("double") > 0,
            F.greatest(
                F.lit(0.0),
                F.round(
                    F.lit(1.0) - F.col("vr").cast("double") / F.col("vs").cast("double"), 6
                ),
            ),
        ).alias("strength_trend"),
        F.when(
            F.col("vt").cast("double") > 0,
            F.greatest(
                F.lit(0.0),
                F.round(
                    F.lit(1.0) - F.col("vr").cast("double") / F.col("vt").cast("double"), 6
                ),
            ),
        ).alias("strength_seasonal"),
    )


def seasonal_strength_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`seasonal_strength` — same micro
    quantization, HUGEINT variance numerators."""
    return f"""
    WITH {_SEAS_CTES.format(table=table)}, sq AS (
      SELECT
        CAST(round(1e6 * (x / 10000.0 - sum7 / 70000.0
               - CAST(s_num AS DOUBLE) / (70000.0 * s_cnt)), 0) AS BIGINT) AS r,
        CAST(round(1e6 * (x / 10000.0 - sum7 / 70000.0), 0) AS BIGINT) AS t,
        CAST(round(1e6 * (x / 10000.0
               - CAST(s_num AS DOUBLE) / (70000.0 * s_cnt)), 0) AS BIGINT) AS s
      FROM sj WHERE sum7 IS NOT NULL AND s_cnt > 0
    ), sv AS (
      SELECT CAST(count(*) AS BIGINT) AS n_full,
             count(*) * sum(CAST(r AS HUGEINT) * r) - sum(CAST(r AS HUGEINT)) * sum(CAST(r AS HUGEINT)) AS vr,
             count(*) * sum(CAST(t AS HUGEINT) * t) - sum(CAST(t AS HUGEINT)) * sum(CAST(t AS HUGEINT)) AS vt,
             count(*) * sum(CAST(s AS HUGEINT) * s) - sum(CAST(s AS HUGEINT)) * sum(CAST(s AS HUGEINT)) AS vs
      FROM sq
    ), snd AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days FROM sdaily
    )
    SELECT n_days, n_full,
           CASE WHEN CAST(vs AS DOUBLE) > 0 THEN greatest(0.0,
                round(1.0 - CAST(vr AS DOUBLE) / CAST(vs AS DOUBLE), 6))
           END AS strength_trend,
           CASE WHEN CAST(vt AS DOUBLE) > 0 THEN greatest(0.0,
                round(1.0 - CAST(vr AS DOUBLE) / CAST(vt AS DOUBLE), 6))
           END AS strength_seasonal
    FROM sv, snd
    """


# ---------------------------------------------------------------------------
# Activity streaks + hour-of-day entropy (wave 100)
# ---------------------------------------------------------------------------


def activity_streaks(events: DataFrame) -> DataFrame:
    """→ [streak_days, n_users] — the distribution of each user's LONGEST
    run of consecutive active calendar days (the retention/habit metric
    behind "7-day streak" product mechanics; the engagement-depth
    companion to :func:`dau_wau`'s stickiness ratio). A user active on
    days {1,2,3, 7,8} scores 3.

    Gaps-and-islands at USER-DAY grain: distinct (user, day), islands
    key ``day − row_number()`` per user, streak = island size, per-user
    max, then one global histogram. Exact integers end-to-end — the
    oracle hash is bit-stable.

    Scale shape: the fact table collapses to distinct user-days first
    (map-side combinable); every window partitions BY USER (bounded by a
    user's active days, never global); the final histogram is a grouped
    count over users. No single-partition sort anywhere.

    Reference parity: no engagement surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    day = _epoch_day("ts")
    ud = events.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = (F.col("day") - F.row_number().over(w)).alias("grp")
    streaks = (
        ud.select("user_id", "day", grp)
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").cast("long").alias("streak_days"))
    )
    return (
        streaks.groupBy("streak_days")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("streak_days")
    )


def activity_streaks_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`activity_streaks`."""
    return f"""
    WITH stk_ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
      FROM {table}
    ), stk_g AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
      FROM stk_ud
    ), stk_s AS (
      SELECT user_id, CAST(max(len) AS BIGINT) AS streak_days FROM (
        SELECT user_id, grp, count(*) AS len FROM stk_g GROUP BY 1, 2
      ) GROUP BY user_id
    )
    SELECT streak_days, CAST(count(*) AS BIGINT) AS n_users
    FROM stk_s GROUP BY streak_days ORDER BY streak_days
    """


def user_hour_entropy(events: DataFrame) -> DataFrame:
    """→ [user_id, n_events, n_hours_active, entropy] — per user, the
    Shannon entropy (nats) of their hour-of-day activity distribution
    over 24 UTC bins: a human sleeps (low entropy, ≤ ~2.5), a cron job
    doesn't (uniform ≈ ln 24 ≈ 3.178) — the classic bot-likeness signal
    in abuse triage, as one relational aggregate.

    Determinism: hour counts are exact; each entropy term
    ``p_h·ln(p_h)`` is computed from one IEEE division of exact integers
    and QUANTIZED to integer micro-nats before summing (the NB-scoring
    trick), so the per-user sum is order-invariant and the oracle hash
    is bit-stable; ``entropy`` is the rounded negated sum. Single-hour
    users get exactly 0.0 (ln 1 = 0 — no special case needed).

    Scale shape: one aggregate to (user, hour) grain, one to user grain
    — both map-side combinable, no windows, no second fact pass.
    """
    hour = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3_600_000_000))
        % 24
    ).alias("hour")
    uh = events.select("user_id", hour).groupBy("user_id", "hour").agg(
        F.count("*").alias("c")
    )
    wn = Window.partitionBy("user_id")
    n = F.sum("c").over(wn)
    term = F.round(
        F.lit(1e6)
        * (F.col("c").cast("double") / F.col("n"))
        * F.expr("ln(CAST(c AS DOUBLE) / n)"),
        0,
    ).cast("long")
    per = uh.withColumn("n", n).withColumn("t", term)
    return (
        per.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_hours_active"),
            F.round(-F.sum("t") / F.lit(1e6), 6).alias("entropy"),
        )
        .orderBy("user_id")
    )


def user_hour_entropy_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`user_hour_entropy` (same micro-nat
    quantization)."""
    return f"""
    WITH uhe_c AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % 24 AS hour,
             count(*) AS c
      FROM {table} GROUP BY 1, 2
    ), uhe_n AS (
      SELECT *, sum(c) OVER (PARTITION BY user_id) AS n FROM uhe_c
    ), uhe_t AS (
      SELECT user_id, n, c,
             CAST(round(1e6 * (CAST(c AS DOUBLE) / n)
                        * ln(CAST(c AS DOUBLE) / n), 0) AS BIGINT) AS t
      FROM uhe_n
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_hours_active,
           round(-sum(t) / 1e6, 6) AS entropy
    FROM uhe_t GROUP BY user_id ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# Two-sample KS test + Q-Q deciles (wave 102)
# ---------------------------------------------------------------------------

# Asymptotic two-sided KS p-value: Q_KS(lambda) = 2 Sum_{j>=1} (-1)^{j-1}
# e^{-2 j^2 lambda^2}, truncated at j = 5 (terms decay like e^{-2j^2};
# at the lambda where truncation error could matter, p is already ~1 and
# clamped). lambda uses the Stephens (1970) small-sample correction.
# Shared literal expression so both engines stage identical doubles.
_KS_P_EXPR = (
    "least(1.0, greatest(0.0, 2.0 * ("
    + " + ".join(
        f"({'-1.0' if j % 2 == 0 else '1.0'})"
        f" * exp(-2.0 * {j * j}.0 * lam * lam)"
        for j in range(1, 6)
    )
    + ")))"
)


def ks_test_values(
    events: DataFrame, type_a: str = "purchase", type_b: str = "click"
) -> DataFrame:
    """→ one row [n_a, n_b, d, p_value] — the two-sample Kolmogorov–
    Smirnov test comparing the ``value`` distributions of two event
    types (Kolmogorov 1933; Smirnov 1948): D = sup |F_a − F_b| computed
    EXACTLY, p from the standard asymptotic series with the Stephens
    (1970) effective-n correction (Numerical-Recipes formulation —
    public). The distribution-drift test that PSI's fixed bins
    approximate; this one is binless and exact in D.

    Exactness: values collapse to exact-cent grain; the ECDF gap at each
    grid point is the exact integer |c_a·n_b − c_b·n_a| (DECIMAL(38,0)/
    HUGEINT — the product touches n² at ~3e9 rows per side), maxed over
    the grid; ``d`` is that max over n_a·n_b (one staged division,
    rounded 6). The p-value series is one shared literal expression
    (5 terms, clamped to [0,1]); truncation error is < 1e-7 wherever
    p < 0.999. NULL d/p when either sample is empty.

    Scale shape: one aggregate to (type, cent) grain — a HISTOGRAM —
    then the cumulative window and the max reduce run over that bounded
    frame, never over events.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    ta, tb = str(type_a), str(type_b)
    g = (
        events.where(
            F.col("event_type").isin(ta, tb) & F.col("value").isNotNull()
        )
        .select(
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
            F.when(F.col("event_type") == ta, 1).otherwise(0).alias("ia"),
        )
        .groupBy("v")
        .agg(
            F.sum("ia").alias("ca_g"),
            F.sum(F.lit(1) - F.col("ia")).alias("cb_g"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    c = g.select(
        F.sum("ca_g").over(w).alias("ca"),
        F.sum("cb_g").over(w).alias("cb"),
        F.sum("ca_g").over(wa).alias("na"),
        F.sum("cb_g").over(wa).alias("nb"),
    )
    gap = F.abs(
        F.col("ca").cast("decimal(38,0)") * F.col("nb")
        - F.col("cb").cast("decimal(38,0)") * F.col("na")
    )
    s = c.groupBy().agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.max(gap).alias("d_num"),
    )
    d = (
        s.withColumn(
            "d_raw",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            ),
        )
        .withColumn(
            "ne",
            F.expr(
                "CASE WHEN n_a > 0 AND n_b > 0 THEN"
                " CAST(n_a AS DOUBLE) * n_b / (CAST(n_a AS DOUBLE) + n_b) END"
            ),
        )
        .withColumn(
            "lam",
            F.expr(
                "CASE WHEN ne > 0 THEN"
                " (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * d_raw END"
            ),
        )
    )
    return d.select(
        "n_a",
        "n_b",
        F.round("d_raw", 6).alias("d"),
        F.when(F.col("d_raw").isNotNull(), F.round(F.expr(_KS_P_EXPR), 6)).alias(
            "p_value"
        ),
    )


def ks_test_values_sql(
    type_a: str = "purchase", type_b: str = "click", table: str = "events"
) -> str:
    """DuckDB oracle for :func:`ks_test_values` — same HUGEINT gap, same
    literal p-value series."""
    a = type_a.replace("'", "''")
    b = type_b.replace("'", "''")
    return f"""
    WITH kst_g AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
             sum(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END) AS ca_g,
             sum(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END) AS cb_g
      FROM {table}
      WHERE event_type IN ('{a}', '{b}') AND value IS NOT NULL
      GROUP BY 1
    ), kst_c AS (
      SELECT sum(ca_g) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             sum(cb_g) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             sum(ca_g) OVER () AS na, sum(cb_g) OVER () AS nb
      FROM kst_g
    ), kst_s AS (
      SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             max(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na))
               AS d_num
      FROM kst_c
    ), kst_d AS (
      SELECT n_a, n_b,
             CASE WHEN n_a > 0 AND n_b > 0
                  THEN CAST(d_num AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             END AS d_raw,
             CASE WHEN n_a > 0 AND n_b > 0 THEN
               CAST(n_a AS DOUBLE) * n_b / (CAST(n_a AS DOUBLE) + n_b)
             END AS ne
      FROM kst_s
    ), kst_l AS (
      SELECT *, CASE WHEN ne > 0 THEN
                  (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * d_raw END AS lam
      FROM kst_d
    )
    SELECT n_a, n_b, round(d_raw, 6) AS d,
           CASE WHEN d_raw IS NOT NULL THEN round({_KS_P_EXPR}, 6) END
             AS p_value
    FROM kst_l
    """


def qq_deciles(
    events: DataFrame, type_a: str = "purchase", type_b: str = "click"
) -> DataFrame:
    """→ [p, q_a, q_b, gap] for p ∈ {0.1 … 0.9} — the quantile–quantile
    table of two event types' value distributions (exact linear-
    interpolation percentiles, the same estimator as
    :func:`value_percentiles`): the "WHERE do the distributions diverge"
    companion to :func:`ks_test_values`' single D. ``gap`` subtracts the
    ROUNDED quantiles so it cannot flip on a last-ulp difference.

    Scale shape: two grouped percentile aggregates (one sort per side,
    inside the aggregate), a one-row cross join, and a 9-element
    explode. Empty sides yield NULL quantiles, never an error.
    """
    ta, tb = str(type_a), str(type_b)
    arr = ", ".join(f"{(j + 1) / 10.0!r}D" for j in range(9))
    one = (
        events.where(F.col("value").isNotNull())
        .groupBy()
        .agg(
            F.expr(
                f"percentile(CASE WHEN event_type = '{ta}' THEN value END,"
                f" array({arr}))"
            ).alias("qa"),
            F.expr(
                f"percentile(CASE WHEN event_type = '{tb}' THEN value END,"
                f" array({arr}))"
            ).alias("qb"),
        )
    )
    ex = one.select(
        F.posexplode("qa").alias("j", "qa_v"), F.col("qb")
    ).select(
        ((F.col("j") + 1).cast("double") / 10.0).alias("p"),
        F.round("qa_v", 6).alias("q_a"),
        F.round(F.element_at("qb", F.col("j") + 1), 6).alias("q_b"),
    )
    return ex.select(
        "p", "q_a", "q_b", F.round(F.col("q_a") - F.col("q_b"), 6).alias("gap")
    ).orderBy("p")


def qq_deciles_sql(
    type_a: str = "purchase", type_b: str = "click", table: str = "events"
) -> str:
    """DuckDB oracle for :func:`qq_deciles` (quantile_cont lists indexed
    by a 9-row range lattice)."""
    a = type_a.replace("'", "''")
    b = type_b.replace("'", "''")
    arr = ", ".join(repr((j + 1) / 10.0) for j in range(9))
    return f"""
    WITH qqd_one AS (
      SELECT quantile_cont(CASE WHEN event_type = '{a}' THEN value END,
                           [{arr}]) AS qa,
             quantile_cont(CASE WHEN event_type = '{b}' THEN value END,
                           [{arr}]) AS qb
      FROM {table} WHERE value IS NOT NULL
    ), qqd_j AS (
      SELECT CAST(range AS INTEGER) AS j FROM range(9)
    ), qqd_r AS (
      SELECT CAST(j + 1 AS DOUBLE) / 10.0 AS p,
             round(qa[j + 1], 6) AS q_a, round(qb[j + 1], 6) AS q_b
      FROM qqd_one CROSS JOIN qqd_j
    )
    SELECT p, q_a, q_b, round(q_a - q_b, 6) AS gap
    FROM qqd_r ORDER BY p
    """


# ---------------------------------------------------------------------------
# Exact trimmed mean + daily cross-correlation (wave 104)
# ---------------------------------------------------------------------------


def trimmed_mean_values(events: DataFrame, trim: float = 0.1) -> DataFrame:
    """→ [event_type, n, k_cut, mean_raw, mean_trimmed] — the EXACT
    ``trim``-fraction trimmed mean of ``value`` per event type (drop the
    lowest and highest ⌊trim·n⌋ observations, average the rest — Tukey's
    robust location estimate): the outlier-immune number to quote when
    :func:`value_mad_outliers` says the mean is being dragged.

    Exactness — the whole point: no sort of raw rows and no doubles
    until the final division. Values collapse to the exact-cent
    HISTOGRAM; each cell's overlap with the kept rank window
    [k+1, n−k] is pure integer arithmetic (``min/max`` of cumulative
    ranks), the kept mass is Σ overlap·cents (DECIMAL(38,0)/HUGEINT —
    cents×count products), and both means are one staged division
    rounded to 6. ``mean_trimmed`` is NULL when n − 2k = 0 (everything
    trimmed). Ties at the cut straddle the boundary correctly because
    the overlap is computed in RANK space, not value space.

    Scale shape: one aggregate to (type, cent) grain, one cumulative
    window per type over that histogram, one grouped reduce.

    Reference parity: no robust-stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    t = float(trim)
    g = (
        events.where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        .groupBy("event_type", "v")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(w).alias("hi"),
        F.sum("c").over(wa).alias("n"),
    ).withColumn("lo", F.col("hi") - F.col("c") + 1)
    k = F.floor(F.col("n") * F.lit(t)).cast("long")
    ov = F.greatest(
        F.lit(0),
        F.least(F.col("hi"), F.col("n") - k)
        - F.greatest(F.col("lo"), k + 1)
        + 1,
    )
    per = c.select(
        "event_type",
        "n",
        k.alias("k"),
        (F.col("c").cast("decimal(38,0)") * F.col("v")).alias("cv"),
        (ov.cast("decimal(38,0)") * F.col("v")).alias("ov_v"),
    )
    s = per.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("k_cut"),
        F.sum("cv").alias("tot"),
        F.sum("ov_v").alias("kept"),
    )
    return s.select(
        "event_type",
        "n",
        "k_cut",
        F.round(
            F.col("tot").cast("double") / (F.lit(100.0) * F.col("n")), 6
        ).alias("mean_raw"),
        F.when(
            (F.col("n") - 2 * F.col("k_cut")) > 0,
            F.round(
                F.col("kept").cast("double")
                / (F.lit(100.0) * (F.col("n") - 2 * F.col("k_cut"))),
                6,
            ),
        ).alias("mean_trimmed"),
    ).orderBy("event_type")


def trimmed_mean_values_sql(table: str = "events", trim: float = 0.1) -> str:
    """DuckDB oracle for :func:`trimmed_mean_values` (same rank-space
    overlap arithmetic, HUGEINT mass sums)."""
    t = float(trim)
    return f"""
    WITH tmv_g AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v,
             count(*) AS c
      FROM {table} WHERE value IS NOT NULL GROUP BY 1, 2
    ), tmv_c AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM tmv_g
    ), tmv_o AS (
      SELECT event_type, v, c, hi, n, hi - c + 1 AS lo,
             CAST(floor(n * {t!r}) AS BIGINT) AS k
      FROM tmv_c
    ), tmv_p AS (
      SELECT event_type, n, k,
             CAST(c AS HUGEINT) * v AS cv,
             CAST(greatest(0, least(hi, n - k) - greatest(lo, k + 1) + 1)
                  AS HUGEINT) * v AS ov_v
      FROM tmv_o
    ), tmv_s AS (
      SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             CAST(max(k) AS BIGINT) AS k_cut,
             sum(cv) AS tot, sum(ov_v) AS kept
      FROM tmv_p GROUP BY event_type
    )
    SELECT event_type, n, k_cut,
           round(CAST(tot AS DOUBLE) / (100.0 * n), 6) AS mean_raw,
           CASE WHEN (n - 2 * k_cut) > 0
                THEN round(CAST(kept AS DOUBLE)
                           / (100.0 * (n - 2 * k_cut)), 6)
           END AS mean_trimmed
    FROM tmv_s ORDER BY event_type
    """


def daily_xcorr(
    events: DataFrame,
    type_x: str = "view",
    type_y: str = "purchase",
    max_lag: int = 7,
) -> DataFrame:
    """→ [lag, n_days, r] for lag ∈ [−max_lag, max_lag] — the Pearson
    cross-correlation between two event types' DAILY COUNT series, y
    shifted ``lag`` days after x (positive lag: x leads y — "views on
    Monday correlate with purchases on Wednesday" shows at lag 2). The
    lead/lag discovery primitive behind marketing-mix and capacity
    models; the argmax row is the data's own answer to "how long does
    conversion take at the aggregate level".

    Determinism: both series are densified integer counts (absent days
    are exact zeros — a gap must not silently re-align the lattice);
    all five moment sums per lag are exact (DECIMAL(38,0)/HUGEINT —
    daily counts square); r is one staged double expression of those
    integers, rounded to 6, NULL when either side is constant over the
    overlap (zero variance — undefined, not 0). Overlaps shorter than
    3 days report NULL too (r is meaningless on <3 points).

    Scale shape: one aggregate to (day) grain per type, densify on the
    day lattice, one 15-row lag lattice join against the |days| frame,
    one grouped reduce per lag. Nothing re-touches events.
    """
    tx, ty = str(type_x), str(type_y)
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("event_type").isin(tx, ty))
        .select(
            day.alias("day"),
            F.when(F.col("event_type") == tx, 1).otherwise(0).alias("ix"),
        )
        .groupBy("day")
        .agg(
            F.sum("ix").alias("x"),
            F.sum(F.lit(1) - F.col("ix")).alias("y"),
        )
    )
    rng = daily.groupBy().agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dense = (
        rng.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    lags = events.sparkSession.createDataFrame(
        [(int(l),) for l in range(-int(max_lag), int(max_lag) + 1)], "lag int"
    )
    xs = dense.select("day", "x")
    ys = dense.select(F.col("day").alias("dy"), "y")
    j = xs.crossJoin(lags).join(
        ys, F.col("dy") == F.col("day") + F.col("lag")
    )
    d38 = "decimal(38,0)"
    s = j.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
    )
    return s.select(
        "lag",
        "n_days",
        F.expr(
            "CASE WHEN n_days >= 3"
            " AND CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0"
            " AND CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0"
            " THEN round((CAST(n_days AS DOUBLE) * sxy"
            "             - CAST(sx AS DOUBLE) * sy)"
            " / sqrt((CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            "   * (CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),"
            " 6) END"
        ).alias("r"),
    ).orderBy("lag")


def daily_xcorr_sql(
    type_x: str = "view",
    type_y: str = "purchase",
    max_lag: int = 7,
    table: str = "events",
) -> str:
    """DuckDB oracle for :func:`daily_xcorr` (same densified lattice,
    HUGEINT moments, staged r)."""
    x = type_x.replace("'", "''")
    y = type_y.replace("'", "''")
    m = int(max_lag)
    return f"""
    WITH xcd_d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             sum(CASE WHEN event_type = '{x}' THEN 1 ELSE 0 END) AS x,
             sum(CASE WHEN event_type = '{y}' THEN 1 ELSE 0 END) AS y
      FROM {table} WHERE event_type IN ('{x}', '{y}') GROUP BY 1
    ), xcd_dense AS (
      SELECT g.day, coalesce(d.x, 0) AS x, coalesce(d.y, 0) AS y
      FROM (SELECT unnest(generate_series(
              (SELECT min(day) FROM xcd_d),
              (SELECT max(day) FROM xcd_d))) AS day) g
      LEFT JOIN xcd_d d ON d.day = g.day
    ), xcd_l AS (
      SELECT CAST(unnest(generate_series(-{m}, {m})) AS INTEGER) AS lag
    ), xcd_j AS (
      SELECT l.lag, a.x, b.y
      FROM xcd_dense a CROSS JOIN xcd_l l
      JOIN xcd_dense b ON b.day = a.day + l.lag
    ), xcd_s AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM xcd_j GROUP BY lag
    )
    SELECT lag, n_days,
           CASE WHEN n_days >= 3
                AND CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
                AND CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
                THEN round((CAST(n_days AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy)
                / sqrt((CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                6) END AS r
    FROM xcd_s ORDER BY lag
    """


# ---------------------------------------------------------------------------
# Cramér's V: event type x value tier association (wave 115)
# ---------------------------------------------------------------------------


def cramers_v_type_tier(events: DataFrame, tier_cents: int = 1000) -> DataFrame:
    """→ one row [n, n_rows_types, n_cols_tiers, chi2, cramers_v] — the
    chi-square association between event TYPE and value TIER (fixed
    ``tier_cents``-wide buckets of the exact cent value, capped at tier
    9), normalized to Cramér's V = √(χ²/(n·(min(r,c)−1))) (Cramér 1946):
    the 0-to-1 "are these two categoricals related at all" scalar —
    dashboards need it before any per-cell drilldown.

    Determinism: the contingency LATTICE is densified from the margins
    (zero cells contribute their full (0−e)²/e — dropping them halves χ²
    at perfect association); each cell's χ²
    contribution (o−e)²/e uses the rational expectation e = row·col/n
    computed ONCE per cell from exact BIGINTs (DECIMAL/HUGEINT products)
    and is QUANTIZED to integer micro-units before summing — the total
    is order-invariant and the oracle hash bit-stable. V is one staged
    sqrt of that integer over n·(min(r,c)−1), NULL for a degenerate
    single-row/column table (no association is definable).

    Scale shape: one aggregate to (type, tier) cell grain (bounded:
    |types|·10), margins re-derived from the cell table, one-row reduce.
    """
    w = int(tier_cents)
    cells = (
        events.where(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("t"),
            F.least(
                F.expr(
                    f"CAST(round(value * 100, 0) AS BIGINT) div {w}"
                ),
                F.lit(9),
            ).alias("tier"),
        )
        .groupBy("t", "tier")
        .agg(F.count("*").alias("c"))
    )
    rm = cells.groupBy("t").agg(F.sum("c").alias("rt"))
    cm = cells.groupBy("tier").agg(F.sum("c").alias("ct"))
    n1 = cells.groupBy().agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.countDistinct("t").cast("long").alias("r"),
        F.countDistinct("tier").cast("long").alias("k"),
    )
    lattice = (
        rm.crossJoin(cm)
        .join(cells, ["t", "tier"], "left")
        .select("t", "tier", "rt", "ct", F.coalesce("c", F.lit(0)).alias("c"))
    )
    terms = (
        lattice.crossJoin(n1)
        .select(
            F.expr(
                "CAST(round(1e6 * (CAST(c AS DOUBLE)"
                " - CAST(rt AS DOUBLE) * ct / n)"
                " * (CAST(c AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)"
                " / (CAST(rt AS DOUBLE) * ct / n), 0) AS BIGINT) AS u"
            )
        )
        .groupBy()
        .agg(F.coalesce(F.sum("u"), F.lit(0)).alias("chi2_u"))
    )
    return n1.crossJoin(terms).select(
        "n",
        F.col("r").alias("n_rows_types"),
        F.col("k").alias("n_cols_tiers"),
        F.expr("round(chi2_u / 1e6, 6)").alias("chi2"),
        F.expr(
            "CASE WHEN n > 0 AND least(r, k) >= 2 THEN"
            " round(sqrt((chi2_u / 1e6)"
            " / (CAST(n AS DOUBLE) * (least(r, k) - 1))), 6) END"
        ).alias("cramers_v"),
    )


def cramers_v_type_tier_sql(
    table: str = "events", tier_cents: int = 1000
) -> str:
    """DuckDB oracle for :func:`cramers_v_type_tier` (same micro-quantized
    cell terms)."""
    w = int(tier_cents)
    return f"""
    WITH crv_c AS (
      SELECT event_type AS t,
             least(CAST(round(value * 100, 0) AS BIGINT) // {w}, 9) AS tier,
             count(*) AS c
      FROM {table} WHERE value IS NOT NULL GROUP BY 1, 2
    ), crv_r AS (
      SELECT t, sum(c) AS rt FROM crv_c GROUP BY t
    ), crv_k AS (
      SELECT tier, sum(c) AS ct FROM crv_c GROUP BY tier
    ), crv_n AS (
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
             CAST(count(DISTINCT t) AS BIGINT) AS r,
             CAST(count(DISTINCT tier) AS BIGINT) AS k
      FROM crv_c
    ), crv_l AS (
      SELECT r.t, k.tier, r.rt, k.ct, coalesce(c.c, 0) AS c
      FROM crv_r r CROSS JOIN crv_k k
      LEFT JOIN crv_c c ON c.t = r.t AND c.tier = k.tier
    ), crv_t AS (
      SELECT coalesce(sum(CAST(round(1e6 * (CAST(c AS DOUBLE)
               - CAST(rt AS DOUBLE) * ct / n)
               * (CAST(c AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
               / (CAST(rt AS DOUBLE) * ct / n), 0) AS BIGINT)), 0) AS chi2_u
      FROM crv_l CROSS JOIN crv_n
    )
    SELECT n, r AS n_rows_types, k AS n_cols_tiers,
           round(chi2_u / 1e6, 6) AS chi2,
           CASE WHEN n > 0 AND least(r, k) >= 2 THEN
             round(sqrt((chi2_u / 1e6)
                   / (CAST(n AS DOUBLE) * (least(r, k) - 1))), 6) END
             AS cramers_v
    FROM crv_n, crv_t
    """


# --------------------------------------------------------------- wave 120
def revenue_drawdown(events: DataFrame) -> DataFrame:
    """→ one row [n_days, trough_day, peak_revenue, trough_revenue,
    max_drawdown] — the maximum drawdown of the DAILY revenue series:
    the deepest relative fall from the running peak,
    ddₜ = (max_{s≤t} r_s − rₜ) / max_{s≤t} r_s, the risk-manager's
    "how bad did it get" number that a variance read hides.

    Exactness: the daily series is exact 1e-4-dollar integers (the
    revenue_trend_theilsen grain); the running peak is an exact MAX
    window at day grain; the drawdown ratio is one staged division of
    exact integers, rounded 6 BEFORE the arg-max so the winning day is
    engine-stable (rounded-dd desc, earliest day breaks ties). Days
    with a nonpositive running peak report no drawdown (the ratio is
    meaningless) and are filtered before the pick; an empty stream
    yields zero rows. Revenues are reported back in dollars (÷1e4,
    exact halves at 6 dp).

    Scale shape: one events-grain aggregate collapses to ≤ |days|
    rows; the window, the filter and the top-1 all run at that bounded
    grain.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("_day"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_r4"))
    )
    w = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    dd = daily.select(
        "_day",
        "_r4",
        F.max("_r4").over(w).alias("_peak"),
        F.count("*").over(wa).alias("_n"),
    ).where(F.col("_peak") > 0)
    return (
        dd.select(
            F.col("_n").cast("long").alias("n_days"),
            F.col("_day").alias("trough_day"),
            F.round(F.col("_peak") / 10000.0, 6).alias("peak_revenue"),
            F.round(F.col("_r4") / 10000.0, 6).alias("trough_revenue"),
            F.round(
                (F.col("_peak") - F.col("_r4"))
                / F.col("_peak").cast("double"),
                6,
            ).alias("max_drawdown"),
        )
        .orderBy(F.desc("max_drawdown"), F.asc("trough_day"))
        .limit(1)
    )


def revenue_drawdown_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`revenue_drawdown` (same exact daily
    grain, same rounded-dd arg-max)."""
    return f"""
    WITH rdd_d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS r4
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ), rdd_p AS (
      SELECT day, r4,
             max(r4) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
             count(*) OVER () AS n
      FROM rdd_d
    )
    SELECT CAST(n AS BIGINT) AS n_days, day AS trough_day,
           round(peak / 10000.0, 6) AS peak_revenue,
           round(r4 / 10000.0, 6) AS trough_revenue,
           round((peak - r4) / CAST(peak AS DOUBLE), 6) AS max_drawdown
    FROM rdd_p
    WHERE peak > 0
    ORDER BY max_drawdown DESC, trough_day ASC
    LIMIT 1
    """


def dispersion_daily(events: DataFrame) -> DataFrame:
    """→ one row [n_days, mean_per_day, vmr, chi2, z, overdispersed] —
    the index-of-dispersion test (Fisher 1950 formulation) on the
    daily event-count series: chi² = Σ(xₜ−x̄)²/x̄ against the Poisson
    null (variance = mean). VMR = chi²/(n−1) is the variance-to-mean
    ratio — VMR ≫ 1 means bursty/clumped traffic, the thing a Poisson
    capacity model silently under-provisions for; z uses the classical
    √(2χ²) − √(2df−1) normal approximation (documented estimand).

    Exactness: daily counts, Σx and Σx² are exact BIGINT/DECIMAL(38,0)
    from one pass; the identity chi² = (n·Σx² − (Σx)²)/Σx makes the
    numerator and denominator exact integers with ONE staged division;
    vmr and z chain from the same exact inputs as shared literal
    expressions, rounded 6. NULL when n < 2 or Σx = 0;
    ``overdispersed`` compares the ROUNDED z to 1.644854 (one-sided
    0.05) so flag and number cannot disagree.

    Scale shape: one events-grain aggregate to day grain, one one-row
    reduce — no joins, no windows.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    day = _epoch_day("ts")
    d = events.groupBy(day.alias("_day")).agg(F.count("*").alias("x"))
    d38 = "decimal(38,0)"
    s = d.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
    )
    ok = "n >= 2 AND sx > 0"
    chi2 = (
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(sx AS DOUBLE)"
    )
    z = f"sqrt(2.0 * ({chi2})) - sqrt(2.0 * (n - 1) - 1.0)"
    return s.select(
        F.col("n").alias("n_days"),
        F.expr("CASE WHEN n > 0 THEN CAST(sx AS DOUBLE) / n END").alias(
            "mean_per_day"
        ),
        F.expr(
            f"CASE WHEN {ok} THEN round(({chi2}) / (n - 1.0), 6) END"
        ).alias("vmr"),
        F.expr(f"CASE WHEN {ok} THEN round({chi2}, 6) END").alias("chi2"),
        F.expr(f"CASE WHEN {ok} THEN round({z}, 6) END").alias("z"),
        F.expr(
            f"CASE WHEN {ok} THEN round({z}, 6) > 1.644854 END"
        ).alias("overdispersed"),
    )


def dispersion_daily_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`dispersion_daily` (same exact moments,
    shared staged chi²/z chain)."""
    ok = "n >= 2 AND sx > 0"
    chi2 = (
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(sx AS DOUBLE)"
    )
    z = f"sqrt(2.0 * ({chi2})) - sqrt(2.0 * (n - 1) - 1.0)"
    return f"""
    WITH dsp_d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             count(*) AS x
      FROM {table} GROUP BY 1
    ), dsp_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(x AS HUGEINT) * x) AS sxx
      FROM dsp_d
    )
    SELECT n AS n_days,
           CASE WHEN n > 0 THEN CAST(sx AS DOUBLE) / n END AS mean_per_day,
           CASE WHEN {ok} THEN round(({chi2}) / (n - 1.0), 6) END AS vmr,
           CASE WHEN {ok} THEN round({chi2}, 6) END AS chi2,
           CASE WHEN {ok} THEN round({z}, 6) END AS z,
           CASE WHEN {ok} THEN round({z}, 6) > 1.644854 END AS overdispersed
    FROM dsp_s
    """


# --------------------------------------------------------------- wave 123
def runs_test_revenue(events: DataFrame) -> DataFrame:
    """→ one row [n_used, n_above, n_below, runs, z, significant] — the
    Wald–Wolfowitz runs test (Wald & Wolfowitz 1940) for randomness of
    the DAILY revenue series around its median: too few runs means the
    series is trending/sticky (autocorrelated regimes), too many means
    it oscillates — either way a "days are i.i.d." assumption in a
    forecast or an A/B horizon calculation is wrong.

    Exactness: the daily series is exact 1e-4-dollar integers; the
    median is the exact interpolated percentile (the
    :func:`qq_deciles` estimator — identical in both engines), days
    EQUAL to the median drop (the standard convention, documented);
    above/below flags, run count (1 + sign changes via one lag at day
    grain), n₁ and n₂ are exact BIGINTs. z = (R − μ)/σ with
    μ = 2n₁n₂/N + 1 and σ² = 2n₁n₂(2n₁n₂−N)/(N²(N−1)) is ONE shared
    literal staged chain over those integers (no continuity
    correction — documented estimand), rounded 6. NULL when either
    side is empty or N < 2 (σ undefined); ``significant`` compares the
    ROUNDED |z| to 1.959964 so flag and number cannot disagree.

    Scale shape: one events-grain aggregate to day grain; the median,
    the lag and the reduce all run on that bounded frame.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("_day"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_r4"))
    )
    med = daily.groupBy().agg(
        F.expr("percentile(_r4, 0.5D)").alias("_med")
    )
    flg = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("_r4") != F.col("_med"))
        .select(
            "_day", (F.col("_r4") > F.col("_med")).cast("int").alias("s")
        )
    )
    w = Window.orderBy("_day")
    runs = flg.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull()
            | (F.col("s") != F.lag("s").over(w)),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    agg = runs.groupBy().agg(
        F.count("*").cast("long").alias("nu"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("s")).cast("long").alias("n2"),
        F.sum("brk").cast("long").alias("r"),
    )
    mu = "(2.0 * CAST(n1 AS DOUBLE) * n2 / nu + 1.0)"
    var = (
        "(2.0 * CAST(n1 AS DOUBLE) * n2"
        " * (2.0 * CAST(n1 AS DOUBLE) * n2 - nu))"
        " / (CAST(nu AS DOUBLE) * nu * (nu - 1.0))"
    )
    ok = f"n1 > 0 AND n2 > 0 AND nu >= 2 AND {var} > 0"
    z = f"(CAST(r AS DOUBLE) - {mu}) / sqrt({var})"
    return agg.select(
        F.col("nu").alias("n_used"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("runs"),
        F.expr(f"CASE WHEN {ok} THEN round({z}, 6) END").alias("z"),
        F.expr(
            f"CASE WHEN {ok} THEN abs(round({z}, 6)) > 1.959964 END"
        ).alias("significant"),
    )


def runs_test_revenue_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`runs_test_revenue` (same median
    estimator, same lag run count, shared staged z)."""
    mu = "(2.0 * CAST(n1 AS DOUBLE) * n2 / nu + 1.0)"
    var = (
        "(2.0 * CAST(n1 AS DOUBLE) * n2"
        " * (2.0 * CAST(n1 AS DOUBLE) * n2 - nu))"
        " / (CAST(nu AS DOUBLE) * nu * (nu - 1.0))"
    )
    ok = f"n1 > 0 AND n2 > 0 AND nu >= 2 AND {var} > 0"
    z = f"(CAST(r AS DOUBLE) - {mu}) / sqrt({var})"
    return f"""
    WITH rt_d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS r4
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ), rt_m AS (
      SELECT quantile_cont(r4, 0.5) AS med FROM rt_d
    ), rt_f AS (
      SELECT day, CAST(r4 > med AS INTEGER) AS s
      FROM rt_d CROSS JOIN rt_m WHERE r4 <> med
    ), rt_r AS (
      SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                       OR s <> lag(s) OVER (ORDER BY day)
                     THEN 1 ELSE 0 END AS brk
      FROM rt_f
    ), rt_a AS (
      SELECT CAST(count(*) AS BIGINT) AS nu,
             CAST(sum(s) AS BIGINT) AS n1,
             CAST(sum(1 - s) AS BIGINT) AS n2,
             CAST(sum(brk) AS BIGINT) AS r
      FROM rt_r
    )
    SELECT nu AS n_used, n1 AS n_above, n2 AS n_below, r AS runs,
           CASE WHEN {ok} THEN round({z}, 6) END AS z,
           CASE WHEN {ok} THEN abs(round({z}, 6)) > 1.959964 END
             AS significant
    FROM rt_a
    """


def turning_points_revenue(events: DataFrame) -> DataFrame:
    """→ one row [n_days, turning_points, expected, z, significant] —
    the turning-points test (Kendall & Stuart, The Advanced Theory of
    Statistics — classical randomness check) on the daily revenue
    series: count the STRICT local maxima/minima; an i.i.d. series has
    E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90, so too few turning
    points means trend/persistence and too many means alternation. The
    runs test's shape-blind cousin — reads the fine structure, not the
    median split.

    Exactness: daily revenues are exact integers; a turning point is
    the exact predicate (rₜ−rₜ₋₁)·(rₜ₊₁−rₜ) < 0 via one lag and one
    lead at day grain (plateau days — a zero diff — are NOT turning
    points, the strict convention, documented); T and n are exact
    BIGINTs and z is one shared literal staged chain, rounded 6. NULL
    when n < 3 (no interior days); ``significant`` compares the
    ROUNDED |z| to 1.959964.

    Scale shape: one events-grain aggregate to day grain; windows and
    the reduce run on that bounded frame.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("_day"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_r4"))
    )
    w = Window.orderBy("_day")
    tp = daily.select(
        F.when(
            (
                (F.col("_r4") - F.lag("_r4").over(w))
                * (F.lead("_r4").over(w) - F.col("_r4"))
            )
            < 0,
            1,
        )
        .otherwise(0)
        .alias("tp")
    )
    agg = tp.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum("tp").cast("long").alias("t"),
    )
    e = "(2.0 * CAST(n - 2 AS DOUBLE) / 3.0)"
    var = "((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)"
    ok = f"n >= 3 AND {var} > 0"
    z = f"(CAST(t AS DOUBLE) - {e}) / sqrt({var})"
    return agg.select(
        F.col("n").alias("n_days"),
        F.col("t").alias("turning_points"),
        F.expr(f"CASE WHEN n >= 3 THEN round({e}, 6) END").alias("expected"),
        F.expr(f"CASE WHEN {ok} THEN round({z}, 6) END").alias("z"),
        F.expr(
            f"CASE WHEN {ok} THEN abs(round({z}, 6)) > 1.959964 END"
        ).alias("significant"),
    )


def turning_points_revenue_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`turning_points_revenue` (same strict
    predicate, shared staged z)."""
    e = "(2.0 * CAST(n - 2 AS DOUBLE) / 3.0)"
    var = "((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)"
    ok = f"n >= 3 AND {var} > 0"
    z = f"(CAST(t AS DOUBLE) - {e}) / sqrt({var})"
    return f"""
    WITH tpt_d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS r4
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ), tpt_t AS (
      SELECT CASE WHEN (r4 - lag(r4) OVER (ORDER BY day))
                       * (lead(r4) OVER (ORDER BY day) - r4) < 0
                  THEN 1 ELSE 0 END AS tp
      FROM tpt_d
    ), tpt_a AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(tp) AS BIGINT) AS t
      FROM tpt_t
    )
    SELECT n AS n_days, t AS turning_points,
           CASE WHEN n >= 3 THEN round({e}, 6) END AS expected,
           CASE WHEN {ok} THEN round({z}, 6) END AS z,
           CASE WHEN {ok} THEN abs(round({z}, 6)) > 1.959964 END
             AS significant
    FROM tpt_a
    """


# --------------------------------------------------------------- wave 126
def mann_kendall_revenue(events: DataFrame) -> DataFrame:
    """→ one row [n_days, s_stat, z, trend] — the Mann–Kendall trend
    test (Mann 1945; Kendall 1975) on the daily revenue series: is
    there a monotone trend at all, judged nonparametrically from pair
    orderings. The significance companion to
    :func:`revenue_trend_theilsen` (which estimates HOW steep but
    never whether it's distinguishable from noise).

    Exactness: S = Σ_{i<j} sign(rⱼ−rᵢ) is an exact BIGINT from the
    bounded day-pair lattice; the tie-corrected variance numerator
    n(n−1)(2n+5) − Σt(t−1)(2t+5) is an exact DECIMAL(38,0)/HUGEINT
    from the value histogram; z applies the standard ±1 continuity
    correction as one shared literal CASE over (s, vn), rounded 6.
    NULL z when the variance is nonpositive (n < 2 or all days tied);
    ``trend`` labels increasing/decreasing/none by comparing the
    ROUNDED z to ±1.959964 so label and number cannot disagree.

    Scale shape: one events-grain aggregate to day grain; the pair
    join, histogram and reduce all run on that bounded frame (a
    decade ≈ 6.7M pairs — trivial).

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("d"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("r"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    s_stat = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .groupBy()
        .agg(
            F.coalesce(
                F.sum(
                    F.signum(
                        (F.col("b.r") - F.col("a.r")).cast("double")
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("s")
        )
    )
    d38 = "decimal(38,0)"
    ties = daily.groupBy("r").agg(F.count("*").alias("c"))
    vn = ties.groupBy().agg(
        F.coalesce(F.sum(F.lit(1)), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("nd"),
        F.coalesce(
            F.sum(
                F.col("c").cast(d38)
                * (F.col("c") - 1)
                * (2 * F.col("c") + 5)
            ),
            F.lit(0).cast(d38),
        ).alias("tsum"),
    )
    m = s_stat.crossJoin(vn).withColumn(
        "vnum",
        F.col("nd").cast(d38)
        * (F.col("nd") - 1)
        * (2 * F.col("nd") + 5)
        - F.col("tsum"),
    )
    z = (
        "CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)"
        " / sqrt(CAST(vnum AS DOUBLE) / 18.0)"
        " WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)"
        " / sqrt(CAST(vnum AS DOUBLE) / 18.0)"
        " ELSE 0.0 END"
    )
    return m.select(
        F.col("nd").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.expr(f"CASE WHEN vnum > 0 THEN round({z}, 6) END").alias("z"),
        F.expr(
            f"CASE WHEN vnum <= 0 THEN NULL"
            f" WHEN round({z}, 6) > 1.959964 THEN 'increasing'"
            f" WHEN round({z}, 6) < -1.959964 THEN 'decreasing'"
            f" ELSE 'none' END"
        ).alias("trend"),
    )


def mann_kendall_revenue_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`mann_kendall_revenue` (same pair signs,
    tie-corrected variance, continuity-corrected z)."""
    z = (
        "CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)"
        " / sqrt(CAST(vnum AS DOUBLE) / 18.0)"
        " WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)"
        " / sqrt(CAST(vnum AS DOUBLE) / 18.0)"
        " ELSE 0.0 END"
    )
    return f"""
    WITH mk_d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS r
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ), mk_s AS (
      SELECT CAST(coalesce(sum(CAST(sign(b.r - a.r) AS BIGINT)), 0)
                  AS BIGINT) AS s
      FROM mk_d a JOIN mk_d b ON a.d < b.d
    ), mk_t AS (
      SELECT r, count(*) AS c FROM mk_d GROUP BY r
    ), mk_v AS (
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nd,
             coalesce(sum(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5)), 0)
               AS tsum
      FROM mk_t
    ), mk_m AS (
      SELECT s, nd,
             CAST(nd AS HUGEINT) * (nd - 1) * (2 * nd + 5) - tsum AS vnum
      FROM mk_s CROSS JOIN mk_v
    )
    SELECT nd AS n_days, s AS s_stat,
           CASE WHEN vnum > 0 THEN round({z}, 6) END AS z,
           CASE WHEN vnum <= 0 THEN NULL
                WHEN round({z}, 6) > 1.959964 THEN 'increasing'
                WHEN round({z}, 6) < -1.959964 THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM mk_m
    """


# chi-square upper critical values at 0.05 for df 1..7 — exact literals
# shared by both engines so the reject flag never trusts an engine's
# quantile function.
_CHI2_CRIT_05 = (
    3.841459, 5.991465, 7.814728, 9.487729,
    11.070498, 12.591587, 14.067140,
)


def ljung_box_revenue(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """→ [lag, acf, q_lb, reject_white_noise] for lag 1..max_lag — the
    Ljung–Box portmanteau test (Ljung & Box 1978) on the DAILY revenue
    series: per-lag autocorrelation and the cumulative Q statistic
    against the white-noise null. The "is there ANY serial structure"
    gate to read before trusting an i.i.d. bootstrap or a naive
    forecast interval; pairs with :func:`mann_kendall_revenue` (trend)
    and :func:`runs_test_revenue` (median runs).

    Determinism: the series densifies onto the full day lattice
    (absent days are exact zero-revenue days — a calendar gap must not
    re-align lags); every ACF ingredient (lagged product sum Aₖ, head/
    tail sums, S₁, Σx², n) is an exact DECIMAL(38,0)/HUGEINT, and
    rₖ = (n²Aₖ − nS₁(Bₖ+Cₖ) + (n−k)S₁²) / (n²Σx² − nS₁²) is ONE shared
    staged expression per lag (the mean never materializes). Each
    lag's Q contribution rₖ²/(n−k) is nano-quantized before the
    cumulative sum, so Q is order-invariant; the reject flag compares
    the ROUNDED Q to the exact chi² 0.05 literal for df = lag (no
    engine quantile function is trusted). NULL acf/q when the variance
    is zero or n ≤ lag.

    Scale shape: one events-grain aggregate to day grain, densify,
    one |days|×max_lag lag join, a max_lag-row window — nothing
    re-touches events.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    m = int(max_lag)
    day = _epoch_day("ts")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("day"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("r"))
    )
    rng = daily.groupBy().agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    dense = (
        rng.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .join(daily, "day", "left")
        .select("day", F.coalesce("r", F.lit(0)).alias("r"))
    )
    d38 = "decimal(38,0)"
    base = dense.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("r").cast(d38)).alias("s1"),
        F.sum(F.col("r").cast(d38) * F.col("r")).alias("sxx"),
    )
    lags = events.sparkSession.createDataFrame(
        [(k, float(_CHI2_CRIT_05[k - 1])) for k in range(1, m + 1)],
        "lag int, crit double",
    )
    xs = dense.select("day", F.col("r").alias("xa"))
    ys = dense.select(F.col("day").alias("dy"), F.col("r").alias("xb"))
    j = xs.crossJoin(F.broadcast(lags.select("lag"))).join(
        ys, F.col("day") == F.col("dy") + F.col("lag")
    )
    # left-join from the lag dim: a lag with no pairs (n <= lag) must
    # still emit its NULL row, not vanish from the output
    per = lags.join(
        j.groupBy("lag").agg(
            F.sum(F.col("xa").cast(d38) * F.col("xb")).alias("ak"),
            F.sum(F.col("xa").cast(d38)).alias("bk"),
            F.sum(F.col("xb").cast(d38)).alias("ck"),
        ),
        "lag",
        "left",
    )
    rk = (
        "(CAST(n AS DOUBLE) * n * CAST(ak AS DOUBLE)"
        " - CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)"
        "   * (CAST(bk AS DOUBLE) + CAST(ck AS DOUBLE))"
        " + (CAST(n AS DOUBLE) - lag) * CAST(s1 AS DOUBLE)"
        "   * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * n * CAST(sxx AS DOUBLE)"
        "    - CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
    )
    ok = (
        "n > lag AND CAST(n AS DOUBLE) * n * CAST(sxx AS DOUBLE)"
        " - CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0"
    )
    terms = per.crossJoin(F.broadcast(base)).select(
        "lag",
        "crit",
        "n",
        F.expr(f"CASE WHEN {ok} THEN round({rk}, 6) END").alias("acf"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(round(1e9 * ({rk}) * ({rk}) / (n - lag), 0) AS BIGINT)"
            f" ELSE 0 END"
        ).alias("qk"),
        F.expr(f"CASE WHEN {ok} THEN 1 ELSE 0 END").alias("okf"),
    )
    w = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    out = terms.withColumn("qcum", F.sum("qk").over(w)).withColumn(
        "allok", F.min("okf").over(w)
    )
    qlb = (
        "CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)"
        " * CAST(qcum AS DOUBLE) / 1e9"
    )
    return out.select(
        "lag",
        "acf",
        F.expr(
            f"CASE WHEN allok = 1 THEN round({qlb}, 6) END"
        ).alias("q_lb"),
        F.expr(
            f"CASE WHEN allok = 1 THEN round({qlb}, 6) > crit END"
        ).alias("reject_white_noise"),
    ).orderBy("lag")


def ljung_box_revenue_sql(table: str = "events", max_lag: int = 7) -> str:
    """DuckDB oracle for :func:`ljung_box_revenue` (same densified
    lattice, exact moments, nano-quantized Q contributions)."""
    m = int(max_lag)
    crit_rows = ", ".join(
        f"({k}, {_CHI2_CRIT_05[k - 1]!r})" for k in range(1, m + 1)
    )
    rk = (
        "(CAST(n AS DOUBLE) * n * CAST(ak AS DOUBLE)"
        " - CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)"
        "   * (CAST(bk AS DOUBLE) + CAST(ck AS DOUBLE))"
        " + (CAST(n AS DOUBLE) - lag) * CAST(s1 AS DOUBLE)"
        "   * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * n * CAST(sxx AS DOUBLE)"
        "    - CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
    )
    ok = (
        "n > lag AND CAST(n AS DOUBLE) * n * CAST(sxx AS DOUBLE)"
        " - CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0"
    )
    qlb = (
        "CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)"
        " * CAST(qcum AS DOUBLE) / 1e9"
    )
    return f"""
    WITH lb_d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS r
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ), lb_dense AS (
      SELECT g.day, coalesce(d.r, 0) AS r
      FROM (SELECT unnest(generate_series(
              (SELECT min(day) FROM lb_d),
              (SELECT max(day) FROM lb_d))) AS day) g
      LEFT JOIN lb_d d ON d.day = g.day
    ), lb_base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(r AS HUGEINT)) AS s1,
             sum(CAST(r AS HUGEINT) * r) AS sxx
      FROM lb_dense
    ), lb_l(lag, crit) AS (VALUES {crit_rows}
    ), lb_j AS (
      SELECT l.lag, a.r AS xa, b.r AS xb
      FROM lb_dense a CROSS JOIN lb_l l
      JOIN lb_dense b ON a.day = b.day + l.lag
    ), lb_per AS (
      -- left join from the lag dim: a lag with no pairs still emits a row
      SELECT l.lag, l.crit, p.ak, p.bk, p.ck
      FROM lb_l l LEFT JOIN (
        SELECT lag, sum(CAST(xa AS HUGEINT) * xb) AS ak,
               sum(CAST(xa AS HUGEINT)) AS bk,
               sum(CAST(xb AS HUGEINT)) AS ck
        FROM lb_j GROUP BY lag) p USING (lag)
    ), lb_t AS (
      SELECT lag, crit, n,
             CASE WHEN {ok} THEN round({rk}, 6) END AS acf,
             CASE WHEN {ok} THEN
               CAST(round(1e9 * ({rk}) * ({rk}) / (n - lag), 0) AS BIGINT)
             ELSE 0 END AS qk,
             CASE WHEN {ok} THEN 1 ELSE 0 END AS okf
      FROM lb_per CROSS JOIN lb_base
    ), lb_c AS (
      SELECT *, sum(qk) OVER (ORDER BY lag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qcum,
             min(okf) OVER (ORDER BY lag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS allok
      FROM lb_t
    )
    SELECT lag, acf,
           CASE WHEN allok = 1 THEN round({qlb}, 6) END AS q_lb,
           CASE WHEN allok = 1 THEN round({qlb}, 6) > crit END
             AS reject_white_noise
    FROM lb_c ORDER BY lag
    """


# --------------------------------------------------------------- wave 135
# band edges sit inside the synthetic corpus's half-spend spread
# (p10 ~ 1171.47, p50 ~ 1606.00, p90 ~ 2234.29 dollars) so the default
# gate row exercises a real matrix, not one saturated cell
_TIER_EXPR = (
    "CASE WHEN cents IS NULL OR cents <= 0 THEN 'none'"
    " WHEN cents < 130000 THEN 'bronze'"
    " WHEN cents < 165000 THEN 'silver'"
    " WHEN cents < 200000 THEN 'gold'"
    " ELSE 'platinum' END"
)


def tier_migration(events: DataFrame) -> DataFrame:
    """→ [tier_from, tier_to, n_users, share_of_from] — the customer
    value-tier MIGRATION matrix between the stream's two time halves
    (split at the exact floored-median instant, the DiD cutoff
    convention): where did each first-half tier's customers end up?
    The lifecycle table behind churn/upgrade narratives — a static
    tier profile can stay flat while the matrix shows mass churning
    out of gold and refilling from bronze.

    Semantics: tiers use the FIXED value_tier_profile band edges on
    each half's per-user spend (exact cents; 'none' = no positive
    spend in that half), so the matrix is comparable across runs —
    per-half quantile tiers would re-norm away the drift this table
    exists to show. Cells with zero users are omitted (the matrix is
    sparse by nature); share_of_from is the row-normalized staged
    division, rounded 6.

    Scale shape: one global percentile (broadcast one row), one
    user-grain aggregate, one ≤25-cell aggregate, a bounded row-sum
    window over those cells.

    Reference parity: no events surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    cut = events.groupBy().agg(
        F.expr(
            "CAST(floor(percentile(unix_micros(CAST(ts AS TIMESTAMP)),"
            " 0.5D)) AS BIGINT)"
        ).alias("cut")
    )
    per = (
        events.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.expr("unix_micros(CAST(ts AS TIMESTAMP)) < cut"),
                    F.round(F.col("value") * 100, 0).cast("long"),
                ).otherwise(0)
            ).alias("pre"),
            F.sum(
                F.when(
                    F.expr("unix_micros(CAST(ts AS TIMESTAMP)) >= cut"),
                    F.round(F.col("value") * 100, 0).cast("long"),
                ).otherwise(0)
            ).alias("post"),
        )
    )
    t_from = _TIER_EXPR.replace("cents", "pre")
    t_to = _TIER_EXPR.replace("cents", "post")
    cells = per.groupBy(
        F.expr(t_from).alias("tier_from"), F.expr(t_to).alias("tier_to")
    ).agg(F.count("*").cast("long").alias("n_users"))
    w = Window.partitionBy("tier_from")
    return cells.select(
        "tier_from",
        "tier_to",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.sum("n_users").over(w), 6
        ).alias("share_of_from"),
    ).orderBy("tier_from", "tier_to")


def tier_migration_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`tier_migration` (same fixed band edges,
    same floored-median cutoff)."""
    t_from = _TIER_EXPR.replace("cents", "pre")
    t_to = _TIER_EXPR.replace("cents", "post")
    return f"""
    WITH tm_c AS (
      SELECT CAST(floor(quantile_cont(epoch_us(ts), 0.5)) AS BIGINT) AS cut
      FROM {table}
    ), tm_u AS (
      SELECT user_id,
             sum(CASE WHEN epoch_us(ts) < cut THEN
               CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS pre,
             sum(CASE WHEN epoch_us(ts) >= cut THEN
               CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS post
      FROM {table} CROSS JOIN tm_c
      GROUP BY user_id
    ), tm_cell AS (
      SELECT ({t_from}) AS tier_from, ({t_to}) AS tier_to,
             CAST(count(*) AS BIGINT) AS n_users
      FROM tm_u GROUP BY 1, 2
    )
    SELECT tier_from, tier_to, n_users,
           round(CAST(n_users AS DOUBLE)
                 / sum(n_users) OVER (PARTITION BY tier_from), 6)
             AS share_of_from
    FROM tm_cell
    ORDER BY tier_from, tier_to
    """


def dow_anova(events: DataFrame) -> DataFrame:
    """→ one row [n_days, f_stat, eta_squared] — one-way ANOVA of DAILY
    revenue across the day-of-week: does the weekly cycle explain the
    daily variance (η² = the seasonality share), and is F worth a
    seasonal model at all. The quantitative gate behind a dow_profile
    eyeball — read before shipping a weekday-seasonal forecast.

    Exactness: daily revenues are exact 1e-4-dollar integers; the
    day-of-week key is the epoch-day mod 7 (timezone-free and
    identical in both engines — epoch day 0 was a Thursday, the label
    doesn't matter for variance decomposition); per-dow (n, Σ, Σ²)
    are exact, the one rational per-group term a²/n micro-quantizes
    before the global sum (the supplier-ANOVA convention), and
    F/η² stage once, rounded 6. NULL when fewer than 2 distinct dows
    or zero within-group spread.

    Scale shape: one events-grain aggregate to day grain, one 7-row
    aggregate, a one-row reduce.

    Reference parity: no events surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    day = _epoch_day("ts")
    d38 = "decimal(38,0)"
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(day.alias("d"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("r"))
    )
    per = daily.groupBy((F.col("d") % 7).alias("dow")).agg(
        F.count("*").cast("long").alias("ni"),
        F.sum(F.col("r").cast(d38)).alias("ai"),
        F.sum(F.col("r").cast(d38) * F.col("r")).alias("bi"),
    )
    s = per.groupBy().agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("ai").alias("a"),
        F.sum("bi").alias("b"),
        F.sum(
            F.expr(
                "CAST(round(1e6 * CAST(ai AS DOUBLE) * CAST(ai AS DOUBLE)"
                " / ni, 0) AS decimal(38,0))"
            )
        ).alias("gq"),
    )
    ssb = (
        "(CAST(gq AS DOUBLE) / 1e6"
        " - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / n)"
    )
    ssw = "(CAST(b AS DOUBLE) - CAST(gq AS DOUBLE) / 1e6)"
    sst = (
        "(CAST(b AS DOUBLE)"
        " - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / n)"
    )
    ok = f"k >= 2 AND n > k AND {ssw} > 0"
    fstat = f"(({ssb}) / (k - 1.0)) / (({ssw}) / (CAST(n AS DOUBLE) - k))"
    return s.select(
        F.col("n").alias("n_days"),
        F.expr(f"CASE WHEN {ok} THEN round({fstat}, 6) END").alias(
            "f_stat"
        ),
        F.expr(
            f"CASE WHEN {ok} AND {sst} > 0 THEN"
            f" round(greatest(0.0, ({ssb}) / ({sst})), 6) END"
        ).alias("eta_squared"),
    )


def dow_anova_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`dow_anova` (same epoch-day mod-7 key,
    micro-quantized between-group mass)."""
    ssb = (
        "(CAST(gq AS DOUBLE) / 1e6"
        " - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / n)"
    )
    ssw = "(CAST(b AS DOUBLE) - CAST(gq AS DOUBLE) / 1e6)"
    sst = (
        "(CAST(b AS DOUBLE)"
        " - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / n)"
    )
    ok = f"k >= 2 AND n > k AND {ssw} > 0"
    fstat = f"(({ssb}) / (k - 1.0)) / (({ssw}) / (CAST(n AS DOUBLE) - k))"
    return f"""
    WITH dwa_d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS r
      FROM {table} WHERE value IS NOT NULL GROUP BY 1
    ), dwa_p AS (
      SELECT d % 7 AS dow, CAST(count(*) AS BIGINT) AS ni,
             sum(CAST(r AS HUGEINT)) AS ai,
             sum(CAST(r AS HUGEINT) * r) AS bi
      FROM dwa_d GROUP BY 1
    ), dwa_s AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS BIGINT) AS n,
             sum(ai) AS a, sum(bi) AS b,
             sum(CAST(round(1e6 * CAST(ai AS DOUBLE) * CAST(ai AS DOUBLE)
                 / ni, 0) AS HUGEINT)) AS gq
      FROM dwa_p
    )
    SELECT n AS n_days,
           CASE WHEN {ok} THEN round({fstat}, 6) END AS f_stat,
           CASE WHEN {ok} AND {sst} > 0 THEN
             round(greatest(0.0, ({ssb}) / ({sst})), 6) END AS eta_squared
    FROM dwa_s
    """


# --------------------------------------------------------------- wave 136
def type_pmi_daily(events: DataFrame) -> DataFrame:
    """→ [type_a, type_b, n_both, pmi] for type_a < type_b — pointwise
    mutual information between event types co-occurring within a
    (user, UTC day) unit: PMI > 0 means the two behaviors cluster in
    the same day beyond what their base rates predict, < 0 means they
    repel. The day-grain association read next to the user-grain
    jaccard — a pair can share USERS heavily yet never share a DAY.

    Exactness: unit counts (N units, per-type day-flags, pair
    co-occurrences) are exact BIGINTs from one (user, day)-grain
    aggregate; PMI = ln(n_ab·N / (n_a·n_b)) is ONE staged ln over
    exact integers (shared literal), rounded 6. Pairs that never
    co-occur are emitted with n_both = 0 and NULL pmi (−∞ is real
    information — omitting the row would hide perfect repulsion);
    the pair lattice densifies from the type dimension.

    Scale shape: one (user, day)-grain aggregate, one bounded
    type-pair lattice (|types|²/2), broadcast margins.

    Reference parity: no events surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    u = events.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.collect_set("event_type").alias("types")
    )
    flags = u.select(F.explode("types").alias("t"))
    marg = flags.groupBy("t").agg(F.count("*").alias("n"))
    nn = u.groupBy().agg(F.count("*").cast("long").alias("nn"))
    pairs = u.select(
        F.explode("types").alias("ta"), "types"
    ).select(
        "ta", F.explode("types").alias("tb")
    ).where(F.col("ta") < F.col("tb"))
    co = pairs.groupBy("ta", "tb").agg(F.count("*").alias("n_both"))
    ma = marg.select(F.col("t").alias("ta"), F.col("n").alias("na"))
    mb = marg.select(F.col("t").alias("tb"), F.col("n").alias("nb"))
    lattice = (
        ma.crossJoin(mb)
        .where(F.col("ta") < F.col("tb"))
        .join(co, ["ta", "tb"], "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "ta",
            "tb",
            F.coalesce("n_both", F.lit(0)).cast("long").alias("n_both"),
            "na",
            "nb",
            "nn",
        )
    )
    pmi = (
        "ln(CAST(n_both AS DOUBLE) * nn"
        " / (CAST(na AS DOUBLE) * nb))"
    )
    return lattice.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_both",
        F.expr(
            f"CASE WHEN n_both > 0 THEN round({pmi}, 6) END"
        ).alias("pmi"),
    ).orderBy("type_a", "type_b")


def type_pmi_daily_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`type_pmi_daily` (same unit grain,
    densified pair lattice, staged ln)."""
    pmi = (
        "ln(CAST(n_both AS DOUBLE) * nn"
        " / (CAST(na AS DOUBLE) * nb))"
    )
    return f"""
    WITH pmi_u AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             list_distinct(list(event_type)) AS types
      FROM {table} GROUP BY 1, 2
    ), pmi_f AS (
      SELECT unnest(types) AS t FROM pmi_u
    ), pmi_m AS (
      SELECT t, count(*) AS n FROM pmi_f GROUP BY t
    ), pmi_n AS (
      SELECT CAST(count(*) AS BIGINT) AS nn FROM pmi_u
    ), pmi_p AS (
      SELECT a.t AS ta, b.t AS tb, count(*) AS n_both
      FROM (SELECT user_id, d, unnest(types) AS t FROM pmi_u) a
      JOIN (SELECT user_id, d, unnest(types) AS t FROM pmi_u) b
        ON a.user_id = b.user_id AND a.d = b.d AND a.t < b.t
      GROUP BY 1, 2
    )
    SELECT ma.t AS type_a, mb.t AS type_b,
           CAST(coalesce(p.n_both, 0) AS BIGINT) AS n_both,
           CASE WHEN coalesce(p.n_both, 0) > 0 THEN round(ln(
             CAST(coalesce(p.n_both, 0) AS DOUBLE) * nn
             / (CAST(ma.n AS DOUBLE) * mb.n)), 6) END AS pmi
    FROM pmi_m ma
    JOIN pmi_m mb ON ma.t < mb.t
    LEFT JOIN pmi_p p ON p.ta = ma.t AND p.tb = mb.t
    CROSS JOIN pmi_n
    ORDER BY type_a, type_b
    """


def burstiness_index(events: DataFrame) -> DataFrame:
    """→ one row [n_gaps, mean_gap_s, b_index] — the Goh–Barabási
    burstiness parameter B = (σ−μ)/(σ+μ) over per-user inter-event
    times (Goh & Barabási, EPL 2008): B → −1 is a metronome, 0 is
    Poisson, → 1 is extreme burst-and-silence. The single number that
    says whether per-user activity can be modeled memorylessly —
    read with :func:`dispersion_daily` (which asks the same question
    of the aggregate arrival stream, a different null).

    Exactness: gaps are exact integer seconds from one lag window
    PARTITIONED BY USER (never global); μ and σ come from exact
    (n, Σg, Σg²) with the population-σ identity n·Σg² − (Σg)², and
    B is one shared staged chain, rounded 6. NULL when no user has
    two events or every gap is 0 (σ+μ = 0).

    Scale shape: one user-partitioned lag at event grain, a one-row
    reduce.

    Reference parity: no events surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    w = Window.partitionBy("user_id").orderBy(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))"), "event_id"
    )
    g = events.select(
        "user_id",
        (
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
            - F.lag(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull()).select(
        F.expr("gap_us DIV 1000000").alias("gap")
    )
    s = g.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum(F.col("gap").cast(d38)), F.lit(0).cast(d38)).alias(
            "sg"
        ),
        F.coalesce(
            F.sum(F.col("gap").cast(d38) * F.col("gap")), F.lit(0).cast(d38)
        ).alias("sgg"),
    )
    mu = "(CAST(sg AS DOUBLE) / n)"
    sd = (
        "sqrt((CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE)"
        " - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * n))"
    )
    ok = f"n >= 1 AND ({sd} + {mu}) > 0"
    b = f"({sd} - {mu}) / ({sd} + {mu})"
    return s.select(
        F.col("n").alias("n_gaps"),
        F.expr(f"CASE WHEN n >= 1 THEN round({mu}, 6) END").alias(
            "mean_gap_s"
        ),
        F.expr(f"CASE WHEN {ok} THEN round({b}, 6) END").alias("b_index"),
    )


def burstiness_index_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`burstiness_index` (same user-partitioned
    lag, population-σ identity, shared staged B)."""
    mu = "(CAST(sg AS DOUBLE) / n)"
    sd = (
        "sqrt((CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE)"
        " - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * n))"
    )
    ok = f"n >= 1 AND ({sd} + {mu}) > 0"
    b = f"({sd} - {mu}) / ({sd} + {mu})"
    return f"""
    WITH bi_g AS (
      SELECT (epoch_us(ts)
              - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                  ORDER BY epoch_us(ts), event_id)) // 1000000 AS gap
      FROM {table}
    ), bi_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             coalesce(sum(CAST(gap AS HUGEINT)), 0) AS sg,
             coalesce(sum(CAST(gap AS HUGEINT) * gap), 0) AS sgg
      FROM bi_g WHERE gap IS NOT NULL
    )
    SELECT n AS n_gaps,
           CASE WHEN n >= 1 THEN round({mu}, 6) END AS mean_gap_s,
           CASE WHEN {ok} THEN round({b}, 6) END AS b_index
    FROM bi_s
    """


def km_rmst(events: DataFrame) -> DataFrame:
    """→ one row [horizon_day, rmst_days, median_day] — the two scalars
    a survival CURVE (kaplan_meier_conversion) doesn't hand you
    directly: the restricted mean survival time (area under S(t) up to
    the horizon — the honest "average days-to-convert" under
    censoring; Royston & Parmar 2013 popularized the readout) and the
    median survival day (first event day where S drops to ≤ 0.5;
    NULL when the curve never reaches it — a real possibility the
    naive "median of observed conversion times" hides).

    Determinism: rebuilds the exact K-M frame (same subject
    construction), keeps the survival log-sum at day grain, and
    integrates the step function with one lag window over that bounded
    frame; every S(t) is rounded 6 BEFORE the median comparison (the
    flag-vs-number rule) and each rectangle's area term is
    micro-quantized before the sum, so both scalars are
    order-invariant. Horizon = the last observed day (max duration,
    event or censor). NULL rmst on an empty subject frame.

    Scale shape: the K-M construction (two user-grain aggregates, a
    global max), then every window runs on ≤ |days| rows.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
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
        F.col("_fp_ts").isNotNull().alias("_event"),
        F.floor(
            (F.coalesce(us("_fp_ts"), us("_end")) - us("_s_ts"))
            / F.lit(86_400_000_000)
        ).alias("_day"),
    )
    per_day = dur.groupBy("_day").agg(
        F.sum(F.col("_event").cast("long")).alias("_d"),
        F.sum((~F.col("_event")).cast("long")).alias("_c"),
    )
    total = per_day.agg(
        F.sum(F.col("_d") + F.col("_c")).alias("_n"),
        F.max("_day").alias("_hz"),
    )
    w = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("_day").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        per_day.crossJoin(F.broadcast(total))
        .withColumn(
            "_n_risk",
            F.col("_n")
            - F.coalesce(F.sum(F.col("_d") + F.col("_c")).over(w), F.lit(0)),
        )
        .withColumn(
            "_lnS",
            F.sum(
                F.when(
                    (F.col("_d") > 0) & (F.col("_d") < F.col("_n_risk")),
                    F.log(1.0 - F.col("_d") / F.col("_n_risk").cast("double")),
                ).otherwise(F.lit(0.0))
            ).over(wcum),
        )
        .withColumn(
            "_dead",
            F.max((F.col("_d") >= F.col("_n_risk")).cast("int")).over(wcum),
        )
        .withColumn(
            "_s",
            F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp("_lnS"), 6)
            ),
        )
    )
    wl = Window.orderBy("_day")
    seg = risk.select(
        "_day",
        "_hz",
        "_s",
        F.lag("_day").over(wl).alias("_pd"),
        F.lag("_s").over(wl).alias("_ps"),
    ).select(
        "_hz",
        "_day",
        "_s",
        # rectangle from the previous step day to this one at the
        # PREVIOUS survival level; the first segment runs from day 0 at
        # S = 1 (everyone alive before the first transition)
        F.expr(
            "CAST(round(1e6 * coalesce(_ps, 1.0)"
            " * (_day - coalesce(_pd, 0)), 0) AS BIGINT)"
        ).alias("qarea"),
    )
    agg = seg.groupBy("_hz").agg(
        F.sum("qarea").alias("qa"),
        F.min(
            F.when(F.col("_s") <= 0.5, F.col("_day"))
        ).alias("median_day"),
        F.max(F.when(F.col("_day") == F.col("_hz"), F.col("_s"))).alias(
            "_stail"
        ),
    )
    return agg.select(
        F.col("_hz").cast("long").alias("horizon_day"),
        F.expr("round(qa / 1e6, 6)").alias("rmst_days"),
        F.col("median_day").cast("long").alias("median_day"),
    )


def km_rmst_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`km_rmst` (same K-M frame, rounded-S
    median rule, micro-quantized rectangle areas)."""
    return f"""
    WITH kr_s AS (
      SELECT user_id, min(ts) AS s_ts FROM {table}
      WHERE event_type = 'signup' GROUP BY user_id
    ), kr_fp AS (
      SELECT s.user_id, s.s_ts, min(p.ts) AS fp_ts
      FROM kr_s s LEFT JOIN {table} p
        ON p.user_id = s.user_id AND p.event_type = 'purchase'
       AND p.ts > s.s_ts
      GROUP BY s.user_id, s.s_ts
    ), kr_dur AS (
      SELECT fp_ts IS NOT NULL AS ev,
             CAST(floor((epoch_us(coalesce(fp_ts,
                    (SELECT max(ts) FROM {table})))
                   - epoch_us(s_ts)) / 86400000000) AS BIGINT) AS day
      FROM kr_fp
    ), kr_pd AS (
      SELECT day, sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
             sum(CASE WHEN ev THEN 0 ELSE 1 END) AS c
      FROM kr_dur GROUP BY day
    ), kr_t AS (
      SELECT sum(d + c) AS n, max(day) AS hz FROM kr_pd
    ), kr_r AS (
      SELECT day, d, n, hz,
             n - coalesce(sum(d + c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM kr_pd CROSS JOIN kr_t
    ), kr_ln AS (
      SELECT day, hz,
             sum(CASE WHEN d > 0 AND d < n_risk
                      THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                      ELSE 0.0 END) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnS,
             max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
      FROM kr_r
    ), kr_sv AS (
      SELECT day, hz,
             CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lnS), 6) END AS s
      FROM kr_ln
    ), kr_seg AS (
      SELECT day, hz, s,
             CAST(round(1e6 * coalesce(lag(s) OVER (ORDER BY day), 1.0)
                  * (day - coalesce(lag(day) OVER (ORDER BY day), 0)), 0)
               AS BIGINT) AS qarea
      FROM kr_sv
    )
    SELECT CAST(max(hz) AS BIGINT) AS horizon_day,
           round(sum(qarea) / 1e6, 6) AS rmst_days,
           CAST(min(CASE WHEN s <= 0.5 THEN day END) AS BIGINT)
             AS median_day
    FROM kr_seg
    """


def stickiness_ratio(events: DataFrame) -> DataFrame:
    """→ one row [n_days, window_users, avg_dau, stickiness] — the
    DAU/MAU-style stickiness of the event stream over its own horizon:
    average daily active users divided by the window's distinct users.
    1.0 means everyone shows up every day; 1/n_days means each user
    appears once — the single engagement-quality scalar product
    reviews anchor on (the estimand here uses the WHOLE stream window
    as the "month", documented — the synthetic horizon is ~a month).
    The one-row MAU-denominator summary of what :func:`dau_wau` tracks
    as a daily DAU/WAU series — different denominator, different use:
    this is the quarter-report scalar, that is the ops dashboard.

    Exactness: per-day distinct-user counts and the window's distinct
    users are exact BIGINTs; avg_dau and stickiness are staged
    divisions rounded 6. NULL on an empty stream.

    Scale shape: one (day, user) distinct aggregate, one day-grain
    count, one global distinct count, a one-row combine.

    Reference parity: no events surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    du = events.select(
        _epoch_day("ts").alias("d"), "user_id"
    ).distinct()
    daily = du.groupBy("d").agg(F.count("*").alias("dau"))
    d38 = "decimal(38,0)"
    a = daily.groupBy().agg(
        F.count("*").cast("long").alias("n_days"),
        F.coalesce(F.sum(F.col("dau").cast(d38)), F.lit(0).cast(d38)).alias(
            "sdau"
        ),
    )
    wu = du.select("user_id").distinct().groupBy().agg(
        F.count("*").cast("long").alias("window_users")
    )
    return a.crossJoin(wu).select(
        "n_days",
        "window_users",
        F.expr(
            "CASE WHEN n_days > 0 THEN"
            " round(CAST(sdau AS DOUBLE) / n_days, 6) END"
        ).alias("avg_dau"),
        F.expr(
            "CASE WHEN n_days > 0 AND window_users > 0 THEN"
            " round(CAST(sdau AS DOUBLE) / n_days / window_users, 6) END"
        ).alias("stickiness"),
    )


def stickiness_ratio_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`stickiness_ratio` (same distinct
    grains, staged ratios)."""
    return f"""
    WITH st_du AS (
      SELECT DISTINCT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
               AS d, user_id
      FROM {table}
    ), st_daily AS (
      SELECT d, count(*) AS dau FROM st_du GROUP BY d
    ), st_a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             coalesce(sum(CAST(dau AS HUGEINT)), 0) AS sdau
      FROM st_daily
    ), st_w AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS window_users
      FROM st_du
    )
    SELECT n_days, window_users,
           CASE WHEN n_days > 0 THEN
             round(CAST(sdau AS DOUBLE) / n_days, 6) END AS avg_dau,
           CASE WHEN n_days > 0 AND window_users > 0 THEN
             round(CAST(sdau AS DOUBLE) / n_days / window_users, 6) END
             AS stickiness
    FROM st_a CROSS JOIN st_w
    """


# --------------------------------------------------------------- wave 143
def gk_gamma_tiers(events: DataFrame) -> DataFrame:
    """→ one row [n_users, concordant, discordant, gamma, somers_d] —
    Goodman–Kruskal gamma (Goodman & Kruskal 1954) and Somers' D
    between two ORDINAL per-user tiers: activity (event count buckets
    1 / 2-4 / 5-9 / 10+) and spend (the tier_migration band edges on
    total cents). Gamma ignores ties entirely ((C−D)/(C+D)); Somers'
    D_yx penalizes pairs tied on spend but not activity — the pair to
    quote for ordered contingency tables where Pearson is meaningless
    and tau-b's symmetric tie penalty isn't what you asked.

    Exactness: the tier lattice is bounded (4×4 cells of exact BIGINT
    counts), and C, D and the spend-tie count T_y are exact
    DECIMAL(38,0)/HUGEINT sums over the ≤256 cell-pair lattice — pair
    arithmetic never touches users. Both statistics are one staged
    division, rounded 6, NULL when no untied pairs exist (single
    occupied row or column).

    Scale shape: one user-grain aggregate, one ≤16-cell aggregate, a
    bounded cell self-join, a one-row reduce.

    Reference parity: no events surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    u = events.groupBy("user_id").agg(
        F.count("*").alias("a"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")), F.lit(0)
        ).alias("cents"),
    )
    atier = (
        "CASE WHEN a <= 1 THEN 0 WHEN a <= 4 THEN 1"
        " WHEN a <= 9 THEN 2 ELSE 3 END"
    )
    stier = (
        "CASE WHEN cents <= 0 THEN 0"
        " WHEN cents < 130000 THEN 1"
        " WHEN cents < 165000 THEN 2"
        " WHEN cents < 200000 THEN 3 ELSE 4 END"
    )
    cells = u.groupBy(
        F.expr(atier).alias("x"), F.expr(stier).alias("y")
    ).agg(F.count("*").alias("c"))
    a, b = cells.alias("a"), cells.alias("b")
    pairs = a.crossJoin(b)
    prod = (F.col("a.c").cast(d38) * F.col("b.c")).alias("p")
    agg = pairs.select(
        "a.x", "a.y", F.col("b.x").alias("x2"), F.col("b.y").alias("y2"), prod
    ).groupBy().agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("x") < F.col("x2")) & (F.col("y") < F.col("y2")),
                    F.col("p"),
                )
            ),
            F.lit(0).cast(d38),
        ).alias("cc"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("x") < F.col("x2")) & (F.col("y") > F.col("y2")),
                    F.col("p"),
                )
            ),
            F.lit(0).cast(d38),
        ).alias("dd"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("x") < F.col("x2")) & (F.col("y") == F.col("y2")),
                    F.col("p"),
                )
            ),
            F.lit(0).cast(d38),
        ).alias("ty"),
    )
    n = u.groupBy().agg(F.count("*").cast("long").alias("n_users"))
    gamma = (
        "(CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))"
        " / (CAST(cc AS DOUBLE) + CAST(dd AS DOUBLE))"
    )
    somers = (
        "(CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))"
        " / (CAST(cc AS DOUBLE) + CAST(dd AS DOUBLE) + CAST(ty AS DOUBLE))"
    )
    return n.crossJoin(agg).select(
        "n_users",
        F.col("cc").cast("long").alias("concordant"),
        F.col("dd").cast("long").alias("discordant"),
        F.expr(
            f"CASE WHEN cc + dd > 0 THEN round({gamma}, 6) END"
        ).alias("gamma"),
        F.expr(
            f"CASE WHEN cc + dd + ty > 0 THEN round({somers}, 6) END"
        ).alias("somers_d"),
    )


def gk_gamma_tiers_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`gk_gamma_tiers` (same bounded cell
    lattice, exact pair products)."""
    atier = (
        "CASE WHEN a <= 1 THEN 0 WHEN a <= 4 THEN 1"
        " WHEN a <= 9 THEN 2 ELSE 3 END"
    )
    stier = (
        "CASE WHEN cents <= 0 THEN 0"
        " WHEN cents < 130000 THEN 1"
        " WHEN cents < 165000 THEN 2"
        " WHEN cents < 200000 THEN 3 ELSE 4 END"
    )
    gamma = (
        "(CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))"
        " / (CAST(cc AS DOUBLE) + CAST(dd AS DOUBLE))"
    )
    somers = (
        "(CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))"
        " / (CAST(cc AS DOUBLE) + CAST(dd AS DOUBLE) + CAST(ty AS DOUBLE))"
    )
    return f"""
    WITH gk_u AS (
      SELECT user_id, count(*) AS a,
             coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)), 0)
               AS cents
      FROM {table} GROUP BY user_id
    ), gk_c AS (
      SELECT ({atier}) AS x, ({stier}) AS y, count(*) AS c
      FROM gk_u GROUP BY 1, 2
    ), gk_n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users FROM gk_u
    ), gk_p AS (
      SELECT coalesce(sum(CASE WHEN a.x < b.x AND a.y < b.y
               THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS cc,
             coalesce(sum(CASE WHEN a.x < b.x AND a.y > b.y
               THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS dd,
             coalesce(sum(CASE WHEN a.x < b.x AND a.y = b.y
               THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS ty
      FROM gk_c a CROSS JOIN gk_c b
    )
    SELECT n_users, CAST(cc AS BIGINT) AS concordant,
           CAST(dd AS BIGINT) AS discordant,
           CASE WHEN cc + dd > 0 THEN round({gamma}, 6) END AS gamma,
           CASE WHEN cc + dd + ty > 0 THEN round({somers}, 6) END
             AS somers_d
    FROM gk_n CROSS JOIN gk_p
    """


# --------------------------------------------------------------- wave 144
def exp_fit_gaps(events: DataFrame) -> DataFrame:
    """→ one row [n_gaps, mean_gap_s, d_stat, reject_exponential] — a
    Lilliefors-style KS check of whether per-user inter-event times
    follow the fitted exponential (the renewal/Poisson-process null):
    D = sup |ECDF(x) − (1 − e^{−x/mean})| with the mean estimated from
    the same data, compared to the Lilliefors large-sample 0.05
    critical 0.886/√n (Lilliefors 1969 — the plain KS table is wrong
    once the parameter is fitted, documented estimand). Read with
    :func:`burstiness_index`: B says HOW far from memoryless, this
    says whether "exponential" survives at all.

    Exactness: gaps are exact integer seconds (the burstiness lag,
    partitioned by user); the ECDF lives at gap-HISTOGRAM grain with
    exact cumulative counts, and the sup checks BOTH ECDF sides at
    each cell (the step function's jump can exceed the fitted CDF on
    either edge). The fitted CDF and every |·| term are shared staged
    expressions from exact integers (sg, n, x); d_stat is the max of
    identically-staged values, rounded 6. NULL when n = 0 or the mean
    gap is 0 (a degenerate point mass).

    Scale shape: one user-partitioned lag, one histogram aggregate,
    one bounded cumulative window, a one-row reduce.

    Reference parity: no events surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    w = Window.partitionBy("user_id").orderBy(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))"), "event_id"
    )
    g = events.select(
        "user_id",
        (
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
            - F.lag(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull()).select(
        F.expr("gap_us DIV 1000000").alias("x")
    )
    h = g.groupBy("x").agg(F.count("*").alias("c"))
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    cells = h.select(
        "x",
        "c",
        F.sum("c").over(wc).alias("hi"),
        F.sum("c").over(wa).alias("n"),
        F.sum(F.col("c").cast(d38) * F.col("x")).over(wa).alias("sg"),
    )
    fit = (
        "(1.0 - exp(-CAST(x AS DOUBLE) * n / CAST(sg AS DOUBLE)))"
    )
    term = (
        f"greatest(abs(CAST(hi AS DOUBLE) / n - {fit}),"
        f" abs((CAST(hi AS DOUBLE) - c) / n - {fit}))"
    )
    s = cells.where(F.col("sg") > 0).groupBy().agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.max("sg").alias("sgm"),
        F.max(F.expr(term)).alias("d_raw"),
    )
    empty_guard = g.groupBy().agg(
        F.count("*").cast("long").alias("n_all")
    )
    out = empty_guard.join(s, how="left_outer", on=F.lit(True))
    return out.select(
        F.col("n_all").alias("n_gaps"),
        F.expr(
            "CASE WHEN n_all > 0 AND sgm IS NOT NULL THEN"
            " round(CAST(sgm AS DOUBLE) / n_all, 6) END"
        ).alias("mean_gap_s"),
        F.expr(
            "CASE WHEN d_raw IS NOT NULL THEN round(d_raw, 6) END"
        ).alias("d_stat"),
        F.expr(
            "CASE WHEN d_raw IS NOT NULL AND n_all > 0 THEN"
            " round(d_raw, 6) > 0.886 / sqrt(CAST(n_all AS DOUBLE)) END"
        ).alias("reject_exponential"),
    )


def exp_fit_gaps_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`exp_fit_gaps` (same histogram-grain
    two-sided sup, shared fitted-CDF expression)."""
    fit = "(1.0 - exp(-CAST(x AS DOUBLE) * n / CAST(sg AS DOUBLE)))"
    term = (
        f"greatest(abs(CAST(hi AS DOUBLE) / n - {fit}),"
        f" abs((CAST(hi AS DOUBLE) - c) / n - {fit}))"
    )
    return f"""
    WITH ef_g AS (
      SELECT (epoch_us(ts)
              - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                  ORDER BY epoch_us(ts), event_id)) // 1000000 AS x
      FROM {table}
    ), ef_gg AS (
      SELECT x FROM ef_g WHERE x IS NOT NULL
    ), ef_h AS (
      SELECT x, count(*) AS c FROM ef_gg GROUP BY x
    ), ef_c AS (
      SELECT x, c,
             sum(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
             sum(c) OVER () AS n,
             sum(CAST(c AS HUGEINT) * x) OVER () AS sg
      FROM ef_h
    ), ef_s AS (
      SELECT CAST(max(n) AS BIGINT) AS n_gaps, max(sg) AS sgm,
             max({term}) AS d_raw
      FROM ef_c WHERE sg > 0
    ), ef_n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_all FROM ef_gg
    )
    SELECT n_all AS n_gaps,
           CASE WHEN n_all > 0 AND sgm IS NOT NULL THEN
             round(CAST(sgm AS DOUBLE) / n_all, 6) END AS mean_gap_s,
           CASE WHEN d_raw IS NOT NULL THEN round(d_raw, 6) END AS d_stat,
           CASE WHEN d_raw IS NOT NULL AND n_all > 0 THEN
             round(d_raw, 6) > 0.886 / sqrt(CAST(n_all AS DOUBLE)) END
             AS reject_exponential
    FROM ef_n LEFT JOIN ef_s ON TRUE
    """
