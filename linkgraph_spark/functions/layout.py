"""Physical-layout utilities: Z-order (Morton) clustering keys and the
audit that shows WHY a lakehouse would rewrite 100 TB into them.

Data skipping lives or dies on per-file min/max ranges. Sorting by one
column makes that column's ranges tight and every other column's ranges
full-width; interleaving the bits of two columns (Morton / Z-order —
public technique, used by every lakehouse table format) bounds BOTH
dimensions' ranges per bucket, so predicates on EITHER column prune.
``zorder_audit`` quantifies exactly that: quantize both dimensions onto
a fixed grid over their observed ranges (what a real Z-order rewrite
does — interleaving raw skewed ints wastes the high bits), bucket rows
by the top bits of the Morton key, and report each bucket's span in
both dimensions: under a one-column sort the other dimension's spans
are full-width; under Z-order both shrink like 2^(-bits/2).

Everything is integer/floor arithmetic (``shiftleft``/``&``/``|``),
JVM whole-stage-codegen on the Spark side and the identical
expressions in the DuckDB oracle — no UDFs, bit-for-bit portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from linkgraph_spark.functions.events import _epoch_day

_QBITS = 8  # per-dimension grid resolution; Morton key is 2*_QBITS wide


def morton_key(x: Column, y: Column, bits: int = _QBITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit b of x
    lands at 2b, bit b of y at 2b+1. Unrolled masked shifts — a pure
    projection Catalyst folds into one codegen stage."""
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def morton_key_sql(x: str, y: str, bits: int = _QBITS) -> str:
    """The identical interleave as a SQL expression string."""
    xm = f"({x} & {(1 << bits) - 1})"
    ym = f"({y} & {(1 << bits) - 1})"
    terms = []
    for b in range(bits):
        terms.append(f"((({xm} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ym} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_audit(events: DataFrame, bucket_bits: int = 6) -> DataFrame:
    """Bucket events by the top ``bucket_bits`` of the Morton key over
    range-quantized (user_id, day) and report each bucket's row count
    and min/max span in BOTH dimensions. → ``[bucket, n_rows, user_min,
    user_max, day_min, day_max]``, bucket asc — the would-be per-file
    skipping index of a Z-ordered rewrite (tight spans in both columns
    ⇒ both ``user_id = ?`` and ``day BETWEEN ?`` predicates prune
    files).

    Quantization is ``floor((v − min) · 2^8 / (max − min + 1))`` onto a
    256-cell grid per dimension — exact double arithmetic on integers
    far below 2^53, so both engines compute identical cells. Scale
    shape: one 4-number range aggregate, then a map-only bit projection
    and one aggregate keyed on ≤ 2^bucket_bits values.
    """
    rows = events.select(F.col("user_id"), _epoch_day("ts").alias("_day"))
    rng = rows.agg(
        F.min("user_id").alias("_u0"),
        F.max("user_id").alias("_u1"),
        F.min("_day").alias("_d0"),
        F.max("_day").alias("_d1"),
    )
    grid = F.lit(1 << _QBITS)

    def q(v, lo, hi):
        return F.floor(
            (v - F.col(lo)) * grid / (F.col(hi) - F.col(lo) + 1)
        ).cast("long")

    keyed = rows.crossJoin(F.broadcast(rng)).select(
        "user_id",
        "_day",
        q(F.col("user_id"), "_u0", "_u1").alias("_qx"),
        q(F.col("_day"), "_d0", "_d1").alias("_qy"),
    )
    z = morton_key(F.col("_qx"), F.col("_qy"))
    shift = 2 * _QBITS - int(bucket_bits)
    return (
        keyed.select(F.shiftright(z, shift).alias("bucket"), "user_id", "_day")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("user_id").alias("user_min"),
            F.max("user_id").alias("user_max"),
            F.min("_day").alias("day_min"),
            F.max("_day").alias("day_max"),
        )
        .orderBy("bucket")
    )


def zorder_audit_sql(table: str = "events", bucket_bits: int = 6) -> str:
    shift = 2 * _QBITS - int(bucket_bits)
    grid = 1 << _QBITS
    mk = morton_key_sql("qx", "qy")
    return f"""
    WITH zrows AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS zday
      FROM {table}
    ),
    zrng AS (
      SELECT min(user_id) AS u0, max(user_id) AS u1,
             min(zday) AS d0, max(zday) AS d1
      FROM zrows
    ),
    zkeyed AS (
      SELECT user_id, zday,
             CAST(floor((user_id - u0) * {grid} / (u1 - u0 + 1.0)) AS BIGINT)
               AS qx,
             CAST(floor((zday - d0) * {grid} / (d1 - d0 + 1.0)) AS BIGINT)
               AS qy
      FROM zrows CROSS JOIN zrng
    )
    SELECT ({mk} >> {shift}) AS bucket,
           count(*) AS n_rows,
           min(user_id) AS user_min, max(user_id) AS user_max,
           min(zday) AS day_min, max(zday) AS day_max
    FROM zkeyed
    GROUP BY 1 ORDER BY bucket
    """


def _ring(n_shards: int, vnodes: int) -> list:
    """Deterministic consistent-hash ring: ``vnodes`` virtual nodes per
    shard at md5 positions, sorted. Pure python over literals — the ring
    is configuration, not data."""
    import hashlib

    pts = []
    for shard in range(int(n_shards)):
        for v in range(int(vnodes)):
            h = int(
                hashlib.md5(f"node:{shard}:{v}".encode()).hexdigest()[:15], 16
            )
            pts.append((h, shard))
    pts.sort()
    return pts


def rebalance_audit(
    keys: DataFrame, key: str, n_shards: int = 8, vnodes: int = 64
) -> DataFrame:
    """How many keys MOVE when a cluster grows from ``n_shards`` to
    ``n_shards + 1`` — mod-hashing vs a consistent-hash ring.
    → two rows ``[scheme, n_keys, n_moved, moved_frac]`` — the
    distributed-systems argument in one table: mod reshuffles
    ~n/(n+1) of all keys (every shard's residues re-deal), the ring
    moves only the ~1/(n+1) slice the new node claims. At 100 TB the
    moved fraction IS the re-replication bill.

    Both assignments are map-only projections: the rings are
    CONFIG-sized sorted literal arrays (n_shards·vnodes structs), and a
    key's owner is the first ring position ≥ its portable 60-bit hash
    (wrapping to the ring's first node) — no join, no shuffle except
    the final 2-group aggregate.
    """
    from linkgraph_spark.functions.hashing import md5_long

    def ring_col(pts):
        return F.array(
            *[
                F.struct(F.lit(p).alias("pos"), F.lit(s).alias("shard"))
                for p, s in pts
            ]
        )

    old_ring, new_ring = _ring(n_shards, vnodes), _ring(n_shards + 1, vnodes)
    kp = md5_long(F.concat(F.lit("key:"), F.col(key).cast("string")))

    def owner(ring_pts):
        arr = ring_col(ring_pts)
        hit = F.filter(arr, lambda r: r.pos >= F.col("_kp"))
        # try_element_at: a key hashing past the last ring position leaves
        # the filtered list empty (ANSI element_at throws); wrap to the
        # ring's first node
        return F.coalesce(
            F.try_element_at(hit, F.lit(1)).shard,
            F.element_at(arr, 1).shard,
        )

    tagged = keys.select(F.col(key), kp.alias("_kp")).select(
        (F.col(key).cast("long") % n_shards
         != F.col(key).cast("long") % (n_shards + 1)).alias("_mod_moved"),
        (owner(old_ring) != owner(new_ring)).alias("_ring_moved"),
    )
    agg = tagged.agg(
        F.count("*").alias("_n"),
        F.sum(F.col("_mod_moved").cast("long")).alias("_mm"),
        F.sum(F.col("_ring_moved").cast("long")).alias("_rm"),
    )
    out = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mod").alias("scheme"),
                    F.col("_n").alias("n_keys"),
                    F.col("_mm").alias("n_moved"),
                    F.round(F.col("_mm") / F.col("_n"), 6).alias("moved_frac"),
                ),
                F.struct(
                    F.lit("ring").alias("scheme"),
                    F.col("_n").alias("n_keys"),
                    F.col("_rm").alias("n_moved"),
                    F.round(F.col("_rm") / F.col("_n"), 6).alias("moved_frac"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return out.orderBy("scheme")


def rebalance_audit_sql(
    table: str = "orders",
    key: str = "o_orderkey",
    n_shards: int = 8,
    vnodes: int = 64,
) -> str:
    from linkgraph_spark.functions.hashing import md5_long_sql

    def ring_lit(pts):
        return (
            "["
            + ", ".join(f"{{'pos': {p}, 'shard': {s}}}" for p, s in pts)
            + "]"
        )

    old_r = ring_lit(_ring(n_shards, vnodes))
    new_r = ring_lit(_ring(n_shards + 1, vnodes))
    h = md5_long_sql(f"concat('key:', CAST({key} AS VARCHAR))")
    own = (
        "coalesce(list_filter({ring}, r -> r.pos >= kp)[1].shard,"
        " ({ring})[1].shard)"
    )
    return f"""
    WITH rk AS (
      SELECT {key} AS k, ({h}) AS kp FROM {table}
    ),
    rt AS (
      SELECT (k % {int(n_shards)} <> k % {int(n_shards) + 1}) AS mod_moved,
             ({own.format(ring=old_r)} <> {own.format(ring=new_r)})
               AS ring_moved
      FROM rk
    ),
    ra AS (
      SELECT count(*) AS n,
             sum(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS mm,
             sum(CASE WHEN ring_moved THEN 1 ELSE 0 END) AS rm
      FROM rt
    )
    SELECT 'mod' AS scheme, CAST(n AS BIGINT) AS n_keys,
           CAST(mm AS BIGINT) AS n_moved, round(mm / CAST(n AS DOUBLE), 6)
             AS moved_frac
    FROM ra
    UNION ALL
    SELECT 'ring', CAST(n AS BIGINT), CAST(rm AS BIGINT),
           round(rm / CAST(n AS DOUBLE), 6)
    FROM ra
    ORDER BY scheme
    """


def compaction_plan(
    sized: DataFrame, key: str, size_col: str, target: int
) -> DataFrame:
    """Greedy sequential compaction plan: key-ordered partitions pack
    into bins of ≈ ``target`` total size (a partition is never split; it
    lands in the bin its exclusive running total falls in, so a bin
    overshoots by at most one partition). → ``[bin, n_parts, total_size,
    first_key, last_key]``, bin asc — the merge groups a small-file
    compaction job would execute, keeping key ranges CONTIGUOUS so
    min/max pruning on ``key`` still works after the rewrite.

    Scale shape: the input is already partition-grain (one row per
    partition/file — bounded by catalog size, not data); one ordered
    prefix sum assigns bins and one aggregate summarizes them. Exact
    integer arithmetic end to end.
    """
    wcum = Window.orderBy("_k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    binned = sized.select(
        F.col(key).alias("_k"), F.col(size_col).cast("long").alias("_s")
    ).withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("_s").over(wcum), F.lit(0).cast("long"))
            / F.lit(int(target))
        ).cast("long"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("_s").alias("total_size"),
            F.min("_k").alias("first_key"),
            F.max("_k").alias("last_key"),
        )
        .orderBy("bin")
    )


def orders_compaction_plan(orders: DataFrame, target: int = 2000) -> DataFrame:
    """Gate query: pack the daily order partitions into ≈``target``-row
    merge groups. → ``[bin, n_parts, total_size, first_key, last_key]``
    (keys are epoch days)."""
    daily = orders.groupBy(
        _epoch_day("o_orderdate").alias("day")
    ).agg(F.count("*").alias("n_rows"))
    return compaction_plan(daily, "day", "n_rows", target)


def orders_compaction_plan_sql(
    table: str = "orders", target: int = 2000
) -> str:
    return f"""
    WITH cpd AS (
      SELECT CAST(floor(epoch_us(o_orderdate) / 86400000000) AS BIGINT)
               AS day,
             count(*) AS n_rows
      FROM {table} GROUP BY 1
    ),
    cpb AS (
      SELECT day, n_rows,
             CAST(floor(coalesce(sum(n_rows) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) / {int(target)}) AS BIGINT) AS bin
      FROM cpd
    )
    SELECT bin, count(*) AS n_parts,
           CAST(sum(n_rows) AS BIGINT) AS total_size,
           min(day) AS first_key, max(day) AS last_key
    FROM cpb GROUP BY bin ORDER BY bin
    """
