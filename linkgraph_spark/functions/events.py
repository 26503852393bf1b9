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
