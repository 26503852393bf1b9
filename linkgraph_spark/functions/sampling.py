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
    from pyspark.sql import Window

    hc, kc = F.col("__tnhs_h"), F.col("__tnhs_k")
    w1 = Window.partitionBy(strata_col, "__tnhs_b").orderBy(hc.asc(), kc.asc())
    w2 = Window.partitionBy(strata_col).orderBy(hc.asc(), kc.asc())
    return (
        df.withColumn("__tnhs_h", h)
        .withColumn("__tnhs_k", key)
        .withColumn("__tnhs_b", F.pmod(h, F.lit(_TOPN_SUBBUCKETS)))
        .withColumn("__tnhs_rn", F.row_number().over(w1))
        .where(F.col("__tnhs_rn") <= n)
        .drop("__tnhs_rn")
        .withColumn("__tnhs_rn", F.row_number().over(w2))
        .where(F.col("__tnhs_rn") <= n)
        .drop("__tnhs_rn", "__tnhs_h", "__tnhs_k", "__tnhs_b")
    )


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
