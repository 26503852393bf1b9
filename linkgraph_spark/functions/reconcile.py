"""Pipeline reconciliation operators: order-invariant table checksums
and CDC-style snapshot diffs.

At 100 TB a pipeline hop is validated by comparing CHECKSUMS, not rows —
and migrations are validated by DIFFING snapshots, not re-reading both.
Both operators are pure aggregates/joins over the engine-portable md5
hash (``functions/hashing.py``), so the same number comes out of Spark,
DuckDB, or any engine with md5 — which is the whole point of a
reconciliation primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.functions.hashing import MERSENNE_P, md5_long, md5_long_sql

_NULL_SENTINEL = "__NULL__"


def table_checksum(df: DataFrame, cols: list) -> DataFrame:
    """Order-invariant content checksum: each row canonicalizes to a
    ``|``-joined string over ``cols`` (NULLs → the ``__NULL__`` sentinel —
    collision with real data is a documented, vanishing risk), hashes portably, and the per-row hashes SUM (mod-reduced
    so 2^31-bounded terms cannot overflow int64 below ~4e9 rows per
    partition aggregate). → one row ``[n_rows, checksum]``.

    Equal multisets of rows ⇒ equal checksums regardless of partitioning
    or order; any single-row change moves the sum with probability
    ~1 - 2^-31. Use integer/string/date columns: float and timestamp
    RENDERING differs across engines, so canonicalize those to strings
    yourself (round/format) before checksumming.

    Scale shape: map-side md5 + a single global sum — one pass, no
    shuffle beyond the final 1-row combine.
    """
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols]
    )
    term = md5_long(canon) % F.lit(MERSENNE_P)
    return df.agg(
        F.count("*").alias("n_rows"), F.sum(term).alias("checksum")
    )


def table_checksum_sql(table: str, cols: list) -> str:
    canon = " || '|' || ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{_NULL_SENTINEL}')" for c in cols
    )
    return f"""
    SELECT count(*) AS n_rows,
           sum({md5_long_sql(f"({canon})")} % {MERSENNE_P}) AS checksum
    FROM {table}
    """


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, cols: list
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key``: every key maps
    to ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    any compared column differs, NULL-safely) or ``unchanged``.
    → ``[key, status]``.

    Scale shape: ONE full-outer hash join on the key plus column
    equality in the projection — the CDC diff at its shuffle lower
    bound. Keys must be unique per snapshot (it's a snapshot, not a
    log); feed logs through a latest-per-key compaction first.
    """
    # presence is tracked by literal flags, NOT key nullability: a
    # NULL-key row never equi-joins, and judging its side by which key
    # column is NULL would misread it (an old NULL-key row must be
    # 'removed', not 'added')
    o = old.select(
        F.col(key).alias("_ko"),
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        F.col(key).alias("_kn"),
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = o.join(n, o._ko == n._kn, "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.coalesce("_ko", "_kn").alias(key), status.alias("status"))


def snapshot_diff_sql(
    old_sql: str, new_sql: str, key: str, cols: list
) -> str:
    same = " AND ".join(f"(o.{c} IS NOT DISTINCT FROM n.{c})" for c in cols)
    return f"""
    WITH old_s AS (SELECT TRUE AS _in_old, * FROM ({old_sql})),
         new_s AS (SELECT TRUE AS _in_new, * FROM ({new_sql}))
    SELECT coalesce(o.{key}, n.{key}) AS {key},
           CASE WHEN o._in_old IS NULL THEN 'added'
                WHEN n._in_new IS NULL THEN 'removed'
                WHEN {same} THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old_s o FULL OUTER JOIN new_s n ON o.{key} = n.{key}
    """


def fk_orphans(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Referential-integrity audit: child rows whose ``fk`` matches no
    parent ``pk``. → one row ``[n_child, n_orphans, orphan_frac]``
    (NULL fks are not orphans — a NULL reference is absent, not broken).

    Scale shape: the check is an anti-join against the parent KEY
    PROJECTION (one column, deduped map-side), then a 1-row count —
    never a full-row join. On a star schema the parent side is
    dimension-sized and broadcasts.
    """
    orphans = child.where(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias("_pk")).distinct(),
        F.col(fk) == F.col("_pk"),
        "left_anti",
    )
    return (
        child.agg(F.count("*").alias("n_child"))
        .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
        .select(
            "n_child",
            "n_orphans",
            F.round(F.col("n_orphans") / F.col("n_child"), 6).alias("orphan_frac"),
        )
    )


def fk_orphans_sql(child: str, parent: str, fk: str, pk: str) -> str:
    return f"""
    SELECT (SELECT count(*) FROM {child}) AS n_child,
           (SELECT count(*) FROM {child} c
            WHERE c.{fk} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}))
             AS n_orphans,
           round(
             (SELECT count(*) FROM {child} c
              WHERE c.{fk} IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}))
             * 1.0 / (SELECT count(*) FROM {child}), 6) AS orphan_frac
    """


def pk_uniqueness(df: DataFrame, keys: list) -> DataFrame:
    """Primary-key audit: does ``keys`` really identify rows? → one row
    ``[n_rows, n_keys, n_dup_keys, max_multiplicity]`` — unique iff
    ``n_rows == n_keys``. NULL key components group together (a NULL
    key appearing twice IS a duplicate worth flagging).

    Scale shape: one map-side-combinable count per key, then a 4-number
    roll-up of the per-key counts. No row ever leaves with its payload —
    only (key, count) pairs shuffle.
    """
    per_key = df.groupBy(*keys).agg(F.count("*").alias("_n"))
    return per_key.agg(
        F.sum("_n").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.sum((F.col("_n") > 1).cast("long")).alias("n_dup_keys"),
        F.max("_n").alias("max_multiplicity"),
    )


def pk_uniqueness_sql(table: str, keys: list) -> str:
    ks = ", ".join(keys)
    return f"""
    WITH per_key AS (
      SELECT {ks}, count(*) AS n FROM {table} GROUP BY {ks}
    )
    SELECT sum(n) AS n_rows, count(*) AS n_keys,
           sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS n_dup_keys,
           max(n) AS max_multiplicity
    FROM per_key
    """


def table_profile(df: DataFrame) -> DataFrame:
    """Per-column data-profiling audit: NULL count, exact distinct count,
    and numeric min/max for every column, in ONE pass. → one row per
    column ``[col_name, null_cnt, n_distinct, min_val, max_val]`` in the
    table's column order (min/max are doubles: numerics as-is, timestamps
    as exact epoch MICROseconds — ``unix_timestamp`` truncates
    sub-second and would diverge from DuckDB's fractional ``epoch()`` —
    strings/other → NULL: engine-portable formatting of arbitrary types
    is not, so the profile never stringifies).

    Scale shape: a single wide aggregate over one scan — Spark plans the
    k exact count-distincts as one Expand (k× the input rows through one
    shuffle, the price of exactness); at 100 TB swap
    ``approx_count_distinct`` in and keep the rest of the row identical.
    The melt to long form happens on the ONE aggregated row.
    """
    aggs = []
    kinds = {}
    for name, dtype in df.dtypes:
        aggs.append(F.sum(F.col(name).isNull().cast("long")).alias(f"__nc_{name}"))
        aggs.append(F.countDistinct(name).alias(f"__nd_{name}"))
        if dtype in ("tinyint", "smallint", "int", "bigint", "float", "double"):
            kinds[name] = "num"
            val = F.col(name).cast("double")
        elif dtype.startswith("timestamp"):
            kinds[name] = "ts"
            # unix_micros rejects TIMESTAMP_NTZ (how Spark reads these
            # parquet files); the cast is value-identity under the UTC
            # session timezone.
            val = F.unix_micros(F.col(name).cast("timestamp")).cast("double")
        else:
            kinds[name] = "other"
            val = F.lit(None).cast("double")
        aggs.append(F.min(val).alias(f"__mn_{name}"))
        aggs.append(F.max(val).alias(f"__mx_{name}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col(f"__nc_{name}").alias("null_cnt"),
                F.col(f"__nd_{name}").alias("n_distinct"),
                F.col(f"__mn_{name}").alias("min_val"),
                F.col(f"__mx_{name}").alias("max_val"),
            )
            for name, _ in df.dtypes
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def table_profile_sql(table: str, col_kinds: list) -> str:
    """``col_kinds``: ``[(name, 'num'|'ts'|'other'), ...]`` matching the
    Spark side's dtype classification (the registry pins it per table)."""
    aggs, arms = [], []
    for name, kind in col_kinds:
        if kind == "num":
            val = f"CAST({name} AS DOUBLE)"
        elif kind == "ts":
            val = f"CAST(epoch_us({name}) AS DOUBLE)"
        else:
            val = "CAST(NULL AS DOUBLE)"
        aggs.append(
            f"count(*) FILTER (WHERE {name} IS NULL) AS __nc_{name},"
            f" count(DISTINCT {name}) AS __nd_{name},"
            f" min({val}) AS __mn_{name}, max({val}) AS __mx_{name}"
        )
        arms.append(
            f"SELECT '{name}' AS col_name, __nc_{name} AS null_cnt,"
            f" __nd_{name} AS n_distinct, __mn_{name} AS min_val,"
            f" __mx_{name} AS max_val FROM a"
        )
    return (
        "WITH a AS (SELECT "
        + ", ".join(aggs)
        + f" FROM {table})\n"
        + "\nUNION ALL\n".join(arms)
    )


def user_value_state(events: DataFrame) -> DataFrame:
    """Per-user mergeable aggregate state: event count, exact 4-dp value
    sum, value min/max, and last event time. → ``[user_id, n_events,
    value_sum, value_min, value_max, last_ts]``.

    Every measure is chosen to be MERGEABLE (count→sum, sum→sum,
    min→min, max→max, max-ts→max), which is what makes
    :func:`merge_user_value_state` exact. The value sum is exact integer
    4-dp inside, divided back out only for display.
    """
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_v4"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            "n_events",
            F.round(F.col("_v4") / F.lit(10000.0), 4).alias("value_sum"),
            "value_min",
            "value_max",
            "last_ts",
        )
    )


def merge_user_value_state(base: DataFrame, delta_events: DataFrame) -> DataFrame:
    """Incremental view maintenance: fold a DELTA batch of raw events
    into an existing per-user state WITHOUT rescanning history. The
    result is row-for-row identical to recomputing
    :func:`user_value_state` over (history ∪ delta) — which is exactly
    what the oracle checks.

    The 100 TB story: the base state is |users| rows (bounded, slowly
    growing); the delta is one day/hour of events. Maintenance cost is
    O(|delta| + |touched users|) — one aggregate over the delta and one
    shuffle on user_id against the state — instead of O(|history|).
    Works because every measure in the state is mergeable; measures that
    aren't (exact distinct, medians) need their own mergeable sketch
    form before they can ride this path.
    """
    delta = user_value_state(delta_events)
    both = base.unionByName(delta)
    return (
        both.groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            # re-merge in exact 4-dp ints: the display division is lossless
            # to re-multiply because the stored sum is a 4-dp quantity
            F.sum(F.round(F.col("value_sum") * 10000).cast("long")).alias("_v4"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
            F.max("last_ts").alias("last_ts"),
        )
        .select(
            "user_id",
            "n_events",
            F.round(F.col("_v4") / F.lit(10000.0), 4).alias("value_sum"),
            "value_min",
            "value_max",
            "last_ts",
        )
    )


def user_value_state_sql(table: str = "events", where: str = "TRUE") -> str:
    """Oracle: the FULL recompute over the whole table — equivalence of
    the incremental merge to the from-scratch aggregate is the property
    under test."""
    return f"""
    SELECT user_id, count(*) AS n_events,
           round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
                 / 10000.0, 4) AS value_sum,
           min(value) AS value_min, max(value) AS value_max,
           max(ts) AS last_ts
    FROM {table} WHERE {where}
    GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# Order-total vs lineitem reconciliation (wave 110)
# ---------------------------------------------------------------------------

def order_total_reconciliation(
    orders, lineitem, tol_cents: int = 1
):
    """→ one row [n_orders, n_no_lines, n_matched, n_mismatched,
    max_abs_gap_cents, p50_abs_gap_cents] — the classic cross-table
    consistency audit: does ``o_totalprice`` equal the order's lineitem
    total ``Σ extendedprice·(1−discount)·(1+tax)`` within ``tol_cents``?
    The reconciliation every warehouse runs after an ingest — the
    header-vs-detail invariant TPC-H data satisfies and broken pipelines
    quietly don't. Orders with no lineitem rows are reported separately
    (they cannot be judged, only flagged).

    Exactness: both sides quantize to exact cents BEFORE comparing (one
    rounded product per line — identical staging in both engines — then
    BIGINT sums), the tolerance test is an integer comparison, and the
    gap percentile is the exact interpolated percentile over integer
    gaps. No raw-double equality anywhere.

    Scale shape: one lineitem aggregate to order grain (map-side
    combinable), one order-keyed equi-join, one-row reduce with an
    exact percentile over the |orders| frame.

    Reference parity: no reconciliation surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    li = (
        lineitem.select(
            "l_orderkey",
            F.round(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax"))
                * 100,
                0,
            )
            .cast("long")
            .alias("lc"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("lc").alias("li_c"))
    )
    j = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("o_c"),
    ).join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    gap = F.abs(F.col("o_c") - F.col("li_c"))
    tol = int(tol_cents)
    return j.groupBy().agg(
        F.count("*").cast("long").alias("n_orders"),
        F.coalesce(
            F.sum(F.when(F.col("li_c").isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_no_lines"),
        F.coalesce(
            F.sum(F.when(gap <= tol, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_matched"),
        F.coalesce(
            F.sum(F.when(gap > tol, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_mismatched"),
        F.max(gap).cast("long").alias("max_abs_gap_cents"),
        F.round(F.expr("percentile(abs(o_c - li_c), 0.5D)"), 6).alias(
            "p50_abs_gap_cents"
        ),
    )


def order_total_reconciliation_sql(
    orders: str = "orders", lineitem: str = "lineitem", tol_cents: int = 1
) -> str:
    """DuckDB oracle for :func:`order_total_reconciliation` (same cent
    staging; quantile_cont == Spark percentile)."""
    tol = int(tol_cents)
    return f"""
    WITH otr_li AS (
      SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                            * (1.0 + l_tax) * 100, 0) AS BIGINT)) AS li_c
      FROM {lineitem} GROUP BY 1
    ), otr_j AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS o_c, li_c
      FROM {orders} o LEFT JOIN otr_li l ON l.l_orderkey = o.o_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(CASE WHEN li_c IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_no_lines,
           CAST(coalesce(sum(CASE WHEN abs(o_c - li_c) <= {tol}
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_matched,
           CAST(coalesce(sum(CASE WHEN abs(o_c - li_c) > {tol}
                             THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_mismatched,
           CAST(max(abs(o_c - li_c)) AS BIGINT) AS max_abs_gap_cents,
           round(quantile_cont(abs(o_c - li_c), 0.5), 6)
             AS p50_abs_gap_cents
    FROM otr_j
    """
