"""Deterministic hash-based sampling and train/test splitting.

The sampling a 100 TB curation pipeline actually needs is NOT
``df.sample()`` (RNG-seeded per task, irreproducible across retries,
partitionings, and engines) but *hash sampling*: a row is kept iff a
portable hash of its KEY lands under the rate threshold. Properties that
matter at scale:

- **replayable**: the same key always samples the same way — re-running a
  failed stage, or re-running next month on a grown table, keeps every
  previously-kept row (monotone under table growth);
- **entity-coherent**: keying by ``conv_id`` keeps or drops WHOLE
  conversations — no train/test leakage through sibling rows;
- **engine-portable**: built on the md5-based portable hash
  (``functions/hashing.py``), so the DuckDB oracle reproduces the exact
  row set — sampling is oracle-gated like any other operator;
- **map-only**: a filter on a scalar expression — pushes into the scan,
  no shuffle, no driver coordination.

The reference has no sampling at all (it always processes the full edge
file); these are engine additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph_spark.functions.hashing import md5_long, md5_long_sql

_BUCKETS = 1_000_000


def _bucket(key_cols: list[str], salt: str) -> Column:
    key = F.concat_ws("\x1f", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    return md5_long(key) % F.lit(_BUCKETS)


def _bucket_sql(key_exprs: list[str], salt: str) -> str:
    casts = ", ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    quoted = salt.replace("'", "''")  # keep the oracle valid for any salt
    key = f"concat_ws(chr(31), '{quoted}', {casts})"
    return f"({md5_long_sql(key)} % {_BUCKETS})"


def hash_sample(
    df: DataFrame, key_cols: list[str], rate: float, salt: str = ""
) -> DataFrame:
    """→ the rows whose key hashes under ``rate`` (0..1). Same key ⇒ same
    verdict, across runs, engines, and table growth. ``salt`` derives an
    independent sample from the same keys."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(_bucket(key_cols, salt) < int(rate * _BUCKETS))


def hash_sample_sql(key_exprs: list[str], rate: float, salt: str = "") -> str:
    """DuckDB predicate mirroring :func:`hash_sample` (drop into WHERE)."""
    return f"{_bucket_sql(key_exprs, salt)} < {int(rate * _BUCKETS)}"


def train_test_split(
    df: DataFrame, key_cols: list[str], test_rate: float = 0.1, salt: str = "split"
) -> DataFrame:
    """→ ``df`` plus a ``split`` column ('test' under ``test_rate``, else
    'train') — the leakage-safe deterministic split: keyed by entity, so
    all rows of one conversation/document land on the same side, and the
    assignment never moves when the table grows."""
    if not 0.0 <= test_rate <= 1.0:
        raise ValueError("test_rate must be in [0, 1]")
    return df.withColumn(
        "split",
        F.when(
            _bucket(key_cols, salt) < int(test_rate * _BUCKETS), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def train_test_split_sql(
    key_exprs: list[str], test_rate: float = 0.1, salt: str = "split"
) -> str:
    """DuckDB expression for the ``split`` column of :func:`train_test_split`."""
    return (
        f"CASE WHEN {_bucket_sql(key_exprs, salt)} < {int(test_rate * _BUCKETS)} "
        f"THEN 'test' ELSE 'train' END"
    )


def stratified_hash_sample(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """→ per-stratum hash sampling: each row's keep-rate comes from
    ``rates[row[strata_col]]`` (``default_rate`` otherwise). The curation
    move behind language/domain rebalancing at corpus scale — e.g. keep 5%
    of English but 80% of low-resource languages — with every property of
    :func:`hash_sample` intact (replayable, entity-coherent, monotone per
    stratum when a rate only grows, map-only: the rate lookup is a CASE
    expression folded into the scan filter, no join, no shuffle)."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    thresh = F.lit(int(default_rate * _BUCKETS))
    for s, r in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(r * _BUCKETS))
        ).otherwise(thresh)
    return df.where(_bucket(key_cols, salt) < thresh)


def stratified_hash_sample_sql(
    key_exprs: list[str],
    strata_expr: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> str:
    """DuckDB predicate mirroring :func:`stratified_hash_sample`."""
    cases = " ".join(
        f"WHEN {strata_expr} = '{s.replace(chr(39), chr(39) * 2)}'"
        f" THEN {int(r * _BUCKETS)}"
        for s, r in sorted(rates.items())
    )
    thresh = f"(CASE {cases} ELSE {int(default_rate * _BUCKETS)} END)"
    return f"{_bucket_sql(key_exprs, salt)} < {thresh}"


#: sub-buckets the two-phase stratified top-n splits each stratum into —
#: phase 1 ranks within (stratum, hash % _TOPN_SUBBUCKETS) so no single
#: task ever sorts a whole stratum; 64 bounds the phase-2 input at 64·n
#: rows per stratum while still splitting a hot stratum 64 ways.
_TOPN_SUBBUCKETS = 64


def _stratified_top_budget(df, key_cols, strata_col, budget, salt, prefix):
    """Shared two-phase per-stratum smallest-hash selection (used by
    :func:`top_n_hash_sample` and :func:`corpus_mixture` — ONE copy of the
    phase logic so the samplers can't diverge). ``budget`` is a Column (a
    literal for fixed n, a joined per-stratum column for mixtures).

    Phase 1 ranks within (stratum, hash % ``_TOPN_SUBBUCKETS``) so a hot
    stratum splits across sub-buckets; every row phase 1 drops is beaten
    by ≥ budget rows of its OWN stratum, so phase 2 (over ≤ 64·budget
    survivors per stratum) returns exactly the single-window result. Ties
    (60-bit hash collisions) break on the key string — total-order
    deterministic."""
    from pyspark.sql import Window

    hc_n, kc_n, bc_n, rn = (f"__{prefix}_{s}" for s in ("h", "k", "b", "rn"))
    for c in (hc_n, kc_n, bc_n, rn):
        if c in df.columns:
            raise ValueError(f"input already has internal column {c!r}")
    key = F.concat_ws(
        "\x1f", F.lit(salt), *[F.col(c).cast("string") for c in key_cols]
    )
    h = md5_long(key)
    hc, kc = F.col(hc_n), F.col(kc_n)
    w1 = Window.partitionBy(strata_col, bc_n).orderBy(hc.asc(), kc.asc())
    w2 = Window.partitionBy(strata_col).orderBy(hc.asc(), kc.asc())
    return (
        df.withColumn(hc_n, h)
        .withColumn(kc_n, key)
        .withColumn(bc_n, F.pmod(h, F.lit(_TOPN_SUBBUCKETS)))
        .withColumn(rn, F.row_number().over(w1))
        .where(F.col(rn) <= budget)
        .drop(rn)
        .withColumn(rn, F.row_number().over(w2))
        .where(F.col(rn) <= budget)
        .drop(rn, hc_n, kc_n, bc_n)
    )


def top_n_hash_sample(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """→ a FIXED-BUDGET deterministic sample: the ``n`` rows with the
    smallest portable key hash — per stratum when ``strata_col`` is given
    (e.g. exactly 10k eval docs per language). The complement of
    :func:`hash_sample`'s fixed-RATE contract: you trade monotonicity
    (a later-arriving smaller-hash key can evict one kept today — budget
    beats stability here) for an exact row budget; replayability and
    engine portability hold exactly as before.

    Plan shape: global (no strata) = sort-limit → TakeOrderedAndProject
    (per-partition heads, one n-sized merge — never a full sort);
    stratified = TWO-PHASE: rank within (stratum, hash-sub-bucket) first —
    a skewed stratum (en ≫ rest at corpus scale) splits across
    ``_TOPN_SUBBUCKETS`` tasks instead of one — then the final per-stratum
    rank runs over at most ``_TOPN_SUBBUCKETS × n`` survivors per stratum.
    Phase 1 keeps a superset of every stratum's true top-n (each row it
    drops is beaten by ≥ n rows of its own stratum), so the two-phase
    result is EXACTLY the single-window result. Ties (60-bit hash
    collisions) break on the key string, so the kept set is total-order
    deterministic."""
    if n < 0:
        raise ValueError("n must be >= 0")
    # double-underscore internal names: loud enough that a real schema
    # colliding with them is a caller bug worth surfacing
    for c in ("__tnhs_h", "__tnhs_k", "__tnhs_b", "__tnhs_rn"):
        if c in df.columns:
            raise ValueError(f"input already has internal column {c!r}")
    key = F.concat_ws(
        "\x1f", F.lit(salt), *[F.col(c).cast("string") for c in key_cols]
    )
    h = md5_long(key)
    if strata_col is None:
        return (
            df.withColumn("__tnhs_h", h)
            .withColumn("__tnhs_k", key)
            .orderBy("__tnhs_h", "__tnhs_k")
            .limit(n)
            .drop("__tnhs_h", "__tnhs_k")
        )
    return _stratified_top_budget(df, key_cols, strata_col, F.lit(n), salt, "tnhs")


def corpus_mixture(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    parts: dict[str, int],
    salt: str = "",
) -> DataFrame:
    """→ the largest deterministic sub-corpus whose stratum proportions hit
    the target mixture EXACTLY (floor rounding) — the data-mixing step of a
    training pipeline ("40% en, 20% de, ..." across sources/languages),
    keyed-hash deterministic like every sampler here.

    ``parts`` gives the mixture as INTEGER shares (``{"en": 4, "de": 2}`` =
    2:1) — integer arithmetic end to end, so the DuckDB oracle reproduces
    the exact budgets with no float-rounding divergence. With
    ``S = sum(parts)`` the feasible total is
    ``T = min_s floor(count_s * S / part_s)`` (the stratum that runs out
    first binds the whole mixture; a target stratum with zero rows ⇒ empty
    result) and each stratum keeps ``n_s = floor(part_s * T / S)`` rows —
    the ones with the smallest portable key hash, ties on the key string.

    Plan shape: one tiny per-stratum count agg, budgets broadcast back
    (|strata| rows — never a shuffle), then the same two-phase
    sub-bucketed top-n as :func:`top_n_hash_sample`, so a hot stratum
    (en ≫ rest at corpus scale) splits across ``_TOPN_SUBBUCKETS`` tasks
    instead of rank-sorting on one."""
    for s, p in parts.items():
        if p <= 0:
            raise ValueError(f"part for stratum {s!r} must be a positive int")
    for c in ("__cm_h", "__cm_k", "__cm_b", "__cm_rn", "__cm_n", "__cm_cnt"):
        if c in df.columns:
            raise ValueError(f"input already has internal column {c!r}")
    s_total = sum(parts.values())
    spark = df.sparkSession
    targets = spark.createDataFrame(
        sorted(parts.items()), f"{strata_col} string, __cm_part long"
    )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count("*").alias("__cm_cnt"))
        .join(targets, strata_col, "right")  # zero-row stratum must bind T to 0
        .select(
            strata_col,
            "__cm_part",
            F.coalesce("__cm_cnt", F.lit(0)).alias("__cm_cnt"),
        )
    )
    t_row = counts.agg(
        F.min(
            F.floor(F.col("__cm_cnt") * F.lit(s_total) / F.col("__cm_part"))
        ).alias("__cm_t")
    )
    budgets = counts.crossJoin(t_row).select(
        strata_col,
        F.floor(F.col("__cm_part") * F.col("__cm_t") / F.lit(s_total))
        .cast("long")
        .alias("__cm_n"),
    )
    return _stratified_top_budget(
        df.join(F.broadcast(budgets), strata_col),
        key_cols,
        strata_col,
        F.col("__cm_n"),
        salt,
        "cm",
    ).drop("__cm_n")


def corpus_mixture_sql(
    table: str,
    key_exprs: list[str],
    strata_expr: str,
    parts: dict[str, int],
    salt: str = "",
    *,
    select: str,
) -> str:
    """Self-contained DuckDB mirror of :func:`corpus_mixture` (single-window
    oracle; the two-phase Spark plan is value-identical by the same
    superset argument as ``top_n_hash_sample``). ``select`` is REQUIRED —
    it must name the output columns explicitly (the inner query carries
    working columns a ``*`` would leak)."""
    s_total = sum(parts.values())
    values = ", ".join(
        f"('{s.replace(chr(39), chr(39) * 2)}', {p})"
        for s, p in sorted(parts.items())
    )
    casts = ", ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    quoted = salt.replace("'", "''")
    key = f"concat_ws(chr(31), '{quoted}', {casts})"
    h = md5_long_sql(key)
    return f"""
    WITH cm_parts(__cm_s, __cm_part) AS (VALUES {values}),
    cm_counts AS (
      SELECT p.__cm_s, p.__cm_part, coalesce(c.__cm_cnt, 0) AS __cm_cnt
      FROM cm_parts p
      LEFT JOIN (
        SELECT {strata_expr} AS __cm_s, count(*) AS __cm_cnt
        FROM {table} GROUP BY 1
      ) c ON c.__cm_s = p.__cm_s
    ),
    cm_t AS (
      SELECT min(CAST(floor(__cm_cnt * {s_total} / __cm_part) AS BIGINT))
             AS __cm_t
      FROM cm_counts
    ),
    cm_budget AS (
      SELECT c.__cm_s,
             CAST(floor(c.__cm_part * t.__cm_t / {s_total}) AS BIGINT)
             AS __cm_n
      FROM cm_counts c CROSS JOIN cm_t t
    )
    SELECT {select} FROM (
      SELECT d.*, b.__cm_n,
             row_number() OVER (PARTITION BY {strata_expr}
                                ORDER BY {h}, {key}) AS __cm_rn
      FROM {table} d
      JOIN cm_budget b ON b.__cm_s = {strata_expr}
    ) WHERE __cm_rn <= __cm_n
    """


def pack_contexts(
    df: DataFrame,
    key_cols: list[str],
    text_col: str = "text",
    capacity: int = 2048,
    n_buckets: int = 8,
    salt: str = "",
) -> DataFrame:
    """→ ``df`` + [pack_bucket, seq_id, seq_offset, n_tokens]: assign each
    document a position in a packed fixed-capacity context stream — the
    concat-then-split packing LM training uses to fill context windows
    (documents are laid head-to-tail in a deterministic hash order; a
    window holds ``capacity`` whitespace tokens; a document starting at
    global token offset ``o`` belongs to sequence ``floor(o / capacity)``
    at in-sequence offset ``o % capacity``, straddling the boundary like
    the real thing).

    Scale shape: the stream is sharded into ``n_buckets`` independent
    hash buckets FIRST, so the running-total window only ever sorts one
    bucket — size it so a bucket fits a task (at 100 TB: tens of
    thousands of buckets), never a global sort. Deterministic: the order
    within a bucket is (portable hash, key), so re-runs and the DuckDB
    oracle place every document identically."""
    if capacity <= 0 or n_buckets <= 0:
        raise ValueError("capacity and n_buckets must be positive")
    from pyspark.sql import Window

    # output columns are additions, not replacements — surface a colliding
    # input schema loudly instead of silently overwriting it
    for c in (
        "__pc_h", "__pc_k", "__pc_t", "__pc_cum",
        "pack_bucket", "seq_id", "seq_offset", "n_tokens",
    ):
        if c in df.columns:
            raise ValueError(f"input already has column {c!r}")
    key = F.concat_ws(
        "\x1f", F.lit(salt), *[F.col(c).cast("string") for c in key_cols]
    )
    h = md5_long(key)
    n_tok = F.size(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col("__pc_h").asc(), F.col("__pc_k").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("__pc_h", h)
        .withColumn("__pc_k", key)
        .withColumn("pack_bucket", F.pmod(F.col("__pc_h"), F.lit(n_buckets)).cast("int"))
        .withColumn("__pc_t", n_tok.cast("long"))
        .withColumn("__pc_cum", F.sum("__pc_t").over(w))
    )
    offset = F.col("__pc_cum") - F.col("__pc_t")
    return (
        out.withColumn("seq_id", F.floor(offset / F.lit(capacity)).cast("long"))
        .withColumn("seq_offset", (offset % F.lit(capacity)).cast("long"))
        .withColumn("n_tokens", F.col("__pc_t"))
        .drop("__pc_h", "__pc_k", "__pc_t", "__pc_cum")
    )


def pack_contexts_sql(
    table: str,
    key_exprs: list[str],
    text_expr: str = "text",
    capacity: int = 2048,
    n_buckets: int = 8,
    salt: str = "",
    *,
    select: str,
) -> str:
    """Self-contained DuckDB mirror of :func:`pack_contexts`. ``select``
    is REQUIRED and must name the pass-through columns explicitly (the
    inner query carries working columns a ``*`` would leak; the pack
    columns are appended after it)."""
    casts = ", ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    quoted = salt.replace("'", "''")
    key = f"concat_ws(chr(31), '{quoted}', {casts})"
    h = md5_long_sql(key)
    return f"""
    WITH pc_base AS (
      SELECT *,
             {h} % {n_buckets} AS pack_bucket,
             CAST(len(string_split_regex(trim(coalesce({text_expr}, '')),
                                         '\\s+')) AS BIGINT) AS n_tokens,
             {h} AS __pc_h, {key} AS __pc_k
      FROM {table}
    ),
    pc_cum AS (
      SELECT *,
             sum(n_tokens) OVER (
               PARTITION BY pack_bucket ORDER BY __pc_h, __pc_k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS __pc_off
      FROM pc_base
    )
    SELECT {select},
           pack_bucket,
           CAST(floor(__pc_off / {capacity}) AS BIGINT) AS seq_id,
           CAST(__pc_off % {capacity} AS BIGINT) AS seq_offset,
           n_tokens
    FROM pc_cum
    """


def top_n_hash_sample_sql(
    key_exprs: list[str],
    n: int,
    strata_expr: str | None = None,
    salt: str = "",
) -> str:
    """DuckDB ORDER/QUALIFY mirror of :func:`top_n_hash_sample` — emits
    the ``(h, key)`` rank expression; embed as
    ``QUALIFY row_number() OVER (...) <= n`` or an ORDER BY/LIMIT."""
    casts = ", ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    quoted = salt.replace("'", "''")
    key = f"concat_ws(chr(31), '{quoted}', {casts})"
    h = md5_long_sql(key)
    if strata_expr is None:
        return f"ORDER BY {h}, {key} LIMIT {n}"
    return (
        f"QUALIFY row_number() OVER (PARTITION BY {strata_expr} "
        f"ORDER BY {h}, {key}) <= {n}"
    )


def weighted_hash_sample(
    df: DataFrame, key_cols: list[str], weight_col: str, n: int, salt: str = ""
) -> DataFrame:
    """→ ``n`` rows drawn without replacement with probability proportional
    to ``weight_col`` — the Efraimidis–Spirakis A-Res scheme
    ("Weighted random sampling with a reservoir", IPL 2006) on a
    *deterministic* uniform: each row's priority is u^(1/w) with
    u = portable-hash(key, salt) mapped into (0, 1], and the n largest
    priorities win. Same keys ⇒ same sample across runs, retries, and
    engines; a different ``salt`` derives an independent draw. Rows with
    non-positive or NULL weight are never selected (w → 0 limit).

    Scale shape: the priority is a map-only scalar expression; the
    selection ``ORDER BY priority LIMIT n`` compiles to
    TakeOrderedAndProject (per-partition top-n heaps, one O(n·P) driver
    merge) — no global sort, no full-stratum window. Ordering compares
    ln(u)/w (monotone in u^(1/w)) with the hash as tiebreak, so the
    winner set is stable under FP ties.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    h = _bucket(key_cols, salt)
    u = (h + F.lit(1)).cast("double") / F.lit(float(_BUCKETS + 1))  # (0, 1]
    w = F.col(weight_col).cast("double")
    pri = F.log(u) / w  # maximize u^(1/w) ⇔ maximize ln(u)/w (ln u ≤ 0)
    kept = (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("__whs_pri", pri)
        .withColumn("__whs_h", h)
    )
    return (
        kept.orderBy(F.desc("__whs_pri"), F.asc("__whs_h"))
        .limit(n)
        .drop("__whs_pri", "__whs_h")
    )


def weighted_hash_sample_sql(
    key_exprs: list[str], weight_expr: str, n: int, salt: str = ""
) -> str:
    """DuckDB ORDER/LIMIT mirror of :func:`weighted_hash_sample` — emits
    the WHERE + ORDER BY + LIMIT tail (prepend ``SELECT ... FROM t``)."""
    if n <= 0:
        raise ValueError("n must be positive")
    casts = ", ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    quoted = salt.replace("'", "''")
    key = f"concat_ws(chr(31), '{quoted}', {casts})"
    h = f"({md5_long_sql(key)} % {_BUCKETS})"
    u = f"(({h} + 1) * 1.0 / {float(_BUCKETS + 1)!r})"
    w = f"CAST({weight_expr} AS DOUBLE)"
    return (
        f"WHERE {w} IS NOT NULL AND {w} > 0 "
        f"ORDER BY (ln({u}) / {w}) DESC, {h} ASC LIMIT {n}"
    )


def _shuffle_order_keyed(
    documents: DataFrame, salt: str, partitions: int | None, key: str
) -> DataFrame:
    """Phase 1 of :func:`shuffle_order`: the range-partitioned keyed frame
    ``[doc_id, _h, _pid]``. NULL keys are dropped up front (they would
    all collide on ``hash(salt)`` and rank differently across engines)."""
    h = md5_long(F.concat_ws("\x1f", F.lit(salt), F.col(key).cast("string")))
    d = documents.where(F.col(key).isNotNull()).select(
        F.col(key).alias("doc_id"), h.alias("_h")
    )
    p = partitions or d.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return d.repartitionByRange(int(p), "_h", "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )


def _shuffle_order_ranked(d: DataFrame, off_df: DataFrame, n_shards: int) -> DataFrame:
    """Phase 2 of :func:`shuffle_order`: per-group local ranks + exclusive
    offsets → global rank and shard. Kept separate so the plan-shape tests
    assert on the SHIPPED plan (no single-partition window)."""
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy("_h", "doc_id")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .select(
            "doc_id",
            (F.col("_off") + F.col("_rn")).cast("long").alias("shuffle_rank"),
            ((F.col("_off") + F.col("_rn") - 1) % n_shards).cast("long").alias("shard"),
        )
    )


def shuffle_order(
    documents: DataFrame,
    salt: str = "s1",
    n_shards: int = 4,
    partitions: int | None = None,
    key: str = "doc_id",
) -> DataFrame:
    """→ ``[doc_id, shuffle_rank, shard]`` — the deterministic global
    training order: every document gets a dense 1-based rank in the order
    of a salted portable hash (re-salting = a fresh epoch permutation,
    same salt = bit-identical replay), plus a round-robin shard
    assignment for the writer. This is the "global shuffle before
    training" step every pretraining pipeline runs; doing it with
    ``df.sample``/RNG would be irreproducible across retries, and doing
    it with one ``row_number()`` window would serialize the corpus
    through a single reducer. NULL keys are dropped (they have no
    portable order); n_shards must be ≥ 1.

    Scale shape: the classic two-phase distributed enumeration —
    range-partition on the (hash, key) total order to define bounded,
    globally-ordered groups; count each group (one tiny driver collect of
    ``partitions`` rows, broadcast back as exclusive offsets); then a
    per-group ``row_number`` window keyed on the partition id — group
    sizes are corpus/``partitions`` by construction (uniform hash ranges,
    never a skewed data key), so no reducer sees more than one range.
    The window's hash exchange on the group id and its sort are the only
    O(data) costs (the range exchange does not pre-sort rows — sorting
    once inside the window is strictly cheaper than sorting twice).
    Rank is invariant to the range boundaries: any split of a total
    order yields the same offset + local rank.
    """
    if n_shards < 1:
        raise ValueError("shuffle_order needs n_shards >= 1")
    d = _shuffle_order_keyed(documents, salt, partitions, key).persist()
    sizes = {r["_pid"]: r["n"] for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = d.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _off long",
    )
    out = _shuffle_order_ranked(d, off_df, n_shards)
    # materialize the (doc_id, rank, shard) result before releasing the
    # keyed parent cache — eager, or the checkpoint would lazily recompute
    # from an unpersisted plan; in a production writer this frame streams
    # straight to the shard sink instead of checkpointing
    out = out.localCheckpoint(eager=True)
    d.unpersist()
    return out


def shuffle_order_sql(
    table: str = "documents", salt: str = "s1", n_shards: int = 4, key: str = "doc_id"
) -> str:
    """DuckDB oracle for :func:`shuffle_order` — the single-window
    formulation the two-phase plan is provably equal to."""
    quoted = salt.replace("'", "''")
    h = md5_long_sql(f"concat_ws(chr(31), '{quoted}', CAST({key} AS VARCHAR))")
    return f"""
    SELECT {key} AS doc_id,
           row_number() OVER (ORDER BY {h}, {key}) AS shuffle_rank,
           (row_number() OVER (ORDER BY {h}, {key}) - 1) % {n_shards} AS shard
    FROM {table}
    WHERE {key} IS NOT NULL
    """


def temperature_mixture(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    total_n: int,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """→ a deterministic ``total_n``-row sub-corpus whose strata are
    sampled with TEMPERATURE reweighting: stratum ``s`` gets
    ``n_s = min(count_s, floor(total_n · r_s))`` rows where
    ``r_s = count_s^α / Σ count^α`` — the α-smoothed mixing multilingual
    pretraining uses (α = 1/T; α=1 is proportional, α→0 uniform; XLM-R
    ships α≈0.3, mBERT ≈0.7). Unlike :func:`corpus_mixture` (exact
    integer shares you dictate), the shares here are DERIVED from the
    corpus counts — the knob that up-weights tail languages/sources
    without enumerating them. Selection per stratum is the same
    smallest-portable-hash top-n as every sampler here.

    Floor rounding means Σ n_s can undershoot ``total_n`` by < |strata|
    rows — deliberate (budgets stay per-stratum deterministic; no
    largest-remainder tie games).

    Cross-engine FP: weights are ``round(count^α, 6)`` and ratios
    ``round(w/Σw, 9)`` — two rounds that absorb last-ulp ``pow``/sum
    differences between engines before the floor.

    Plan shape: one tiny per-stratum count agg; weights/ratios are a
    window over |strata| rows; budgets broadcast back; then the shared
    two-phase sub-bucketed top-n (hot stratum splits across sub-bucket
    tasks). One data shuffle total beyond the count.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if total_n < 0:
        raise ValueError("total_n must be >= 0")
    for c in ("__tm_n", "__tm_cnt", "__tm_w", "__tm_r"):
        if c in df.columns:
            raise ValueError(f"input already has internal column {c!r}")
    from pyspark.sql import Window

    counts = df.groupBy(strata_col).agg(F.count("*").alias("__tm_cnt"))
    w = F.round(F.pow(F.col("__tm_cnt").cast("double"), F.lit(float(alpha))), 6)
    wall = Window.partitionBy()
    budgets = (
        counts.withColumn("__tm_w", w)
        .withColumn("__tm_r", F.round(F.col("__tm_w") / F.sum("__tm_w").over(wall), 9))
        .select(
            strata_col,
            F.least(
                F.col("__tm_cnt"),
                F.floor(F.lit(int(total_n)) * F.col("__tm_r")).cast("long"),
            ).alias("__tm_n"),
        )
    )
    return _stratified_top_budget(
        df.join(F.broadcast(budgets), strata_col),
        key_cols,
        strata_col,
        F.col("__tm_n"),
        salt,
        "tm",
    ).drop("__tm_n")


def temperature_mixture_sql(
    table: str,
    key_exprs: list[str],
    strata_expr: str,
    total_n: int,
    alpha: float = 0.5,
    salt: str = "",
    *,
    select: str,
) -> str:
    """Self-contained DuckDB mirror of :func:`temperature_mixture`
    (single-window oracle — value-identical to the two-phase Spark plan
    by the :func:`top_n_hash_sample` superset argument)."""
    casts = ", ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    quoted = salt.replace("'", "''")
    key = f"concat_ws(chr(31), '{quoted}', {casts})"
    h = md5_long_sql(key)
    return f"""
    WITH tm_counts AS (
      SELECT {strata_expr} AS __tm_s, count(*) AS __tm_cnt
      FROM {table} GROUP BY 1
    ),
    tm_budget AS (
      SELECT __tm_s,
             least(__tm_cnt,
                   CAST(floor({int(total_n)} * round(
                     round(pow(CAST(__tm_cnt AS DOUBLE), {float(alpha)!r}), 6)
                     / sum(round(pow(CAST(__tm_cnt AS DOUBLE), {float(alpha)!r}), 6))
                       OVER (), 9)) AS BIGINT)) AS __tm_n
      FROM tm_counts
    )
    SELECT {select} FROM (
      SELECT d.*, b.__tm_n,
             row_number() OVER (PARTITION BY {strata_expr}
                                ORDER BY {h}, {key}) AS __tm_rn
      FROM {table} d
      JOIN tm_budget b ON b.__tm_s = {strata_expr}
    ) WHERE __tm_rn <= __tm_n
    """


def token_budget_alloc(
    documents: DataFrame, budget: int, alpha: float = 0.5
) -> DataFrame:
    """→ ``[lang, tokens_avail, share, alloc_tokens, epochs]`` — the exact
    TOKEN-grain budget allocation across languages: availability counts
    from the corpus, α-temperature shares (``avail^α / Σ avail^α`` — the
    XLM-R/mBERT mixing knob), and a largest-remainder apportionment so the
    integer allocations sum to EXACTLY ``budget`` (floor everyone, then
    hand the leftover tokens to the largest fractional remainders, ties by
    lang asc).  ``epochs = alloc / avail`` is the repetition factor — the
    data-constrained-scaling number (Muennighoff et al. 2023, public
    result: beyond ~4 epochs repeated tokens stop helping), so a row with
    ``epochs > 4`` says the budget over-asks this language.

    Complements :func:`temperature_mixture` (which SELECTS rows and
    deliberately floors without remainder distribution): this one only
    PLANS, at token grain, and must hit the budget exactly — an allocation
    table a pipeline feeds back into per-language samplers.

    Cross-engine FP: the documented two-round trick (``round(avail^α, 6)``
    then ``round(w/Σw, 9)``) absorbs last-ulp pow/sum differences before
    any floor; ``share·budget`` is then one exact IEEE product of a
    9-dp-rounded double and an integer, identical in both engines.

    Scale: one per-doc map (token count) + one |langs|-row aggregate;
    the remainder window runs over the bounded language lattice only."""
    from pyspark.sql import Window

    toks = F.size(
        F.filter(
            F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "),
            lambda x: x != "",
        )
    )
    avail = (
        documents.select("lang", toks.alias("nt"))
        .groupBy("lang")
        .agg(F.sum("nt").cast("long").alias("tokens_avail"))
    )
    a = float(alpha)
    w = F.round(F.pow(F.col("tokens_avail").cast("double"), F.lit(a)), 6)
    ww = Window.partitionBy()  # |langs| rows — bounded lattice by contract
    shares = avail.select(
        "lang",
        "tokens_avail",
        F.round(w / F.sum(w).over(ww), 9).alias("share"),
    )
    b = int(budget)
    base = shares.select(
        "*",
        F.floor(F.col("share") * b).cast("long").alias("fl"),
        (F.col("share") * b - F.floor(F.col("share") * b)).alias("frac"),
    )
    wrank = Window.partitionBy().orderBy(F.desc("frac"), F.asc("lang"))
    wtot = Window.partitionBy()
    out = base.select(
        "*",
        F.row_number().over(wrank).alias("rk"),
        F.sum("fl").over(wtot).alias("fl_tot"),
    ).select(
        "lang",
        "tokens_avail",
        "share",
        (
            F.col("fl")
            + F.when(F.col("rk") <= F.lit(b) - F.col("fl_tot"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    )
    return out.select(
        "*",
        F.expr(
            "CASE WHEN tokens_avail > 0 THEN"
            " round(CAST(alloc_tokens AS DOUBLE) / tokens_avail, 6) END"
        ).alias("epochs"),
    )


def token_budget_alloc_sql(
    table: str = "documents", budget: int = 1000000, alpha: float = 0.5
) -> str:
    """DuckDB oracle for :func:`token_budget_alloc` — identical staging."""
    a, b = float(alpha), int(budget)
    return f"""
    WITH tba_av AS (
      SELECT lang,
             CAST(sum(len(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''
             ))) AS BIGINT) AS tokens_avail
      FROM {table} GROUP BY lang
    ), tba_sh AS (
      SELECT lang, tokens_avail,
             round(round(power(CAST(tokens_avail AS DOUBLE), {a:.17g}), 6)
                   / sum(round(power(CAST(tokens_avail AS DOUBLE), {a:.17g}), 6))
                     OVER (), 9) AS share
      FROM tba_av
    ), tba_b AS (
      SELECT *, CAST(floor(share * {b}) AS BIGINT) AS fl,
             share * {b} - floor(share * {b}) AS frac
      FROM tba_sh
    ), tba_r AS (
      SELECT *, row_number() OVER (ORDER BY frac DESC, lang ASC) AS rk,
             sum(fl) OVER () AS fl_tot
      FROM tba_b
    )
    SELECT lang, tokens_avail, share,
           CAST(fl + CASE WHEN rk <= {b} - fl_tot THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_tokens,
           CASE WHEN tokens_avail > 0 THEN
             round(CAST(fl + CASE WHEN rk <= {b} - fl_tot THEN 1 ELSE 0 END
                        AS DOUBLE) / tokens_avail, 6) END AS epochs
    FROM tba_r
    """
