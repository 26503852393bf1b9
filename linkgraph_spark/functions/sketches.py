"""Bounded-memory frequency sketches with EXACT final answers.

The 100 TB problem these solve: "which values are frequent" over a
column whose cardinality is too large to aggregate exactly as a first
step (trillions of tokens, billions of URLs). A plain
``groupBy(value).count()`` shuffles one row per distinct value; when the
question is only about values above a frequency threshold, almost all
of that shuffle is waste.

``heavy_hitters`` is the classic two-phase answer (Misra–Gries 1982;
mergeable-summaries form in Agarwal et al., PODS 2012 — public
algorithms, original implementation):

  phase A  per-partition Misra–Gries summary with k counters, run as an
           Arrow-batched ``mapInPandas`` whose state is a k-entry dict —
           O(k) memory per task regardless of input size. Each batch is
           pre-reduced with a vectorized ``value_counts`` and merged by
           the summary-merge rule (sum, then subtract the k-th largest
           and drop non-positive) — the per-item undercount stays
           < n_p/k, so any value with partition frequency > n_p/k
           SURVIVES its partition summary.
  phase B  exact counts for the surviving candidates only: a broadcast
           semi-join of the input against ≤ k·P candidate values, then
           one tiny aggregate.

Correctness of the candidate set: if a value's GLOBAL count exceeds
n/k, then by pigeonhole some partition has count_p > n_p/k (otherwise
summing the per-partition bounds gives count ≤ n/k), so the value is in
that partition's summary and its exact count is taken in phase B. The
final output is therefore EXACT — every value with count·k > n, with
its true count — which is what lets a DuckDB ``GROUP BY ... HAVING``
oracle check it bit-for-bit.

Reference parity: the reference's analytics layer materializes full
per-key count tables and filters them (``pagerank_lambda/dynamodb/
pagerank.py:51-99`` reads per-key state rows); this module is the
bounded-memory formulation of the same "frequent keys" question.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch_counts: dict, k: int) -> dict:
    """Mergeable-summaries Misra–Gries merge: pointwise sum, then if more
    than k-1 counters remain, subtract the k-th largest count from all
    and drop the non-positive ones (Agarwal et al. 2012, §3)."""
    for v, c in batch_counts.items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > k - 1:
        kth = sorted(counters.values(), reverse=True)[k - 1]
        counters = {v: c - kth for v, c in counters.items() if c > kth}
    return counters


def heavy_hitters(df: DataFrame, col: str, k: int = 50) -> DataFrame:
    """All values of ``col`` whose count strictly exceeds n/k (NULLs
    excluded from both the values and n), with EXACT counts and corpus
    share. → ``[value, cnt, share]`` ordered by cnt desc, value asc.

    Two-phase Misra–Gries + exact-verify; see the module docstring for
    the memory bound and the superset proof. The threshold compare is
    ``cnt * k > n`` in exact integers — no float boundary.
    """
    proj = (
        df.select(F.col(col).cast("string").alias("value"))
        .where(F.col(col).isNotNull())
    )

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            vals = pdf["value"]
            n += len(vals)
            counters = _mg_merge(counters, vals.value_counts().to_dict(), k)
        # candidate rows carry the value; ONE extra row (value NULL)
        # carries the partition's row count for the exact n total.
        yield pd.DataFrame(
            {
                "value": list(counters.keys()) + [None],
                "part_rows": [0] * len(counters) + [n],
            }
        )

    summary = proj.mapInPandas(_mg, "value string, part_rows long")
    summary = summary.localCheckpoint(eager=True)  # one pass, reused twice
    total = summary.agg(F.sum("part_rows").alias("_n"))
    cands = summary.where(F.col("value").isNotNull()).select("value").distinct()
    return (
        proj.join(F.broadcast(cands), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(int(k)) > F.col("_n"))
        .select(
            "value",
            "cnt",
            F.round(F.col("cnt") / F.col("_n").cast("double"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), F.asc("value"))
    )


def heavy_hitter_terms(documents: DataFrame, k: int = 30) -> DataFrame:
    """Heavy-hitter TERMS of the corpus: tokens appearing in more than
    1/k of all token occurrences. Shares :func:`..text.vocab_stats`'s
    whitespace tokenization so the two views stay consistent.
    → ``[value, cnt, share]``."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = documents.select(F.explode(F.split(norm, " ")).alias("term"))
    return heavy_hitters(tok, "term", k=k)


def heavy_hitter_terms_sql(table: str = "documents", k: int = 30) -> str:
    """Oracle: the exact definition the sketch provably reproduces."""
    return f"""
    WITH tok AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS value
      FROM {table}
    ),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT value, count(*) AS cnt,
           round(count(*) / CAST(n AS DOUBLE), 6) AS share
    FROM tok CROSS JOIN tot
    GROUP BY value, n
    HAVING count(*) * {int(k)} > n
    ORDER BY cnt DESC, value ASC
    """


# --- invertible Bloom lookup table (set reconciliation) ---------------------
# Eppstein/Goodrich/Uyeda/Varghese, SIGCOMM 2011 (public algorithm,
# original implementation): two replicas compare 100-TB key sets by
# exchanging O(|difference|) sketch cells instead of the sets.

# one INDEPENDENT salted md5 per subtable (and one for the checksum):
# deriving all three positions from a single hash through affine maps
# correlates cross-subtable collisions (two keys whose difference lands
# in one collision band land in the others too), which manufactures
# unpeelable 2-cycles orders of magnitude above the random-hash rate —
# measured: 6 of 300 diff keys stuck at load 0.88 with the affine family,
# 0 with salted independent hashes.
_IBLT_SALTS = ("i0:", "i1:", "i2:")
_IBLT_CHK_SALT = "c:"
_P = 2_147_483_647


def _iblt_kh(key, salt: str) -> int:
    """Python mirror of the salted md5_long for driver-side decode."""
    import hashlib

    return int(
        hashlib.md5((salt + str(key)).encode()).hexdigest()[:15], 16
    )


def iblt_set_diff(
    a: DataFrame, b: DataFrame, key: str, cells: int = 1024
) -> DataFrame:
    """EXACT symmetric difference of two key sets via an invertible
    Bloom lookup table. → ``[key, side]`` (``a_only`` / ``b_only``),
    key asc. Raises if the table is too small to peel (use cells ≳
    1.5× the expected difference; the sketch sees only the DIFFERENCE,
    not the sets).

    Why at 100 TB: the anti-join answer shuffles both full key sets;
    this plan aggregates each side into a FIXED ``cells``-row sketch
    (one map-side-combinable pass per side — keys hash into one cell
    per subtable, a +1/−1 count, a key-XOR and a checksum-XOR), unions
    the sketches, and peels the difference out of pure cells
    driver-side (O(cells) work). Matching keys cancel inside the
    cells, so sketch size tracks the drift, not the data. Keys must be
    distinct per side (it's a set operation — dedup logs first).

    The three positions live in disjoint subtables (cells/3 each), so
    one key never double-hits a cell and XOR-cancels itself.
    """
    from linkgraph_spark.functions.hashing import md5_long

    m_sub = int(cells) // 3
    if m_sub < 1:
        raise ValueError("cells must be >= 3")

    def sketch(df: DataFrame, side: int) -> DataFrame:
        ks = F.col(key).cast("string")
        pos = F.array(
            *[
                (md5_long(F.concat(F.lit(salt), ks)) % F.lit(m_sub))
                + F.lit(j * m_sub)
                for j, salt in enumerate(_IBLT_SALTS)
            ]
        )
        chk = md5_long(F.concat(F.lit(_IBLT_CHK_SALT), ks)) % F.lit(_P)
        return df.select(
            F.col(key).cast("long").alias("_k"),
            F.lit(side).alias("_side"),
            chk.alias("_chk"),
            F.explode(pos).alias("_cell"),
        )

    u = sketch(a, 1).unionByName(sketch(b, -1))
    rows = (
        u.groupBy("_cell")
        .agg(
            F.sum("_side").alias("cnt"),
            F.expr("bit_xor(_k)").alias("kx"),
            F.expr("bit_xor(_chk)").alias("cx"),
        )
        .collect()
    )
    cell = {
        r._cell: [r.cnt, r.kx, r.cx] for r in rows
    }

    def positions(k: int) -> list:
        return [
            _iblt_kh(k, salt) % m_sub + j * m_sub
            for j, salt in enumerate(_IBLT_SALTS)
        ]

    def chk_of(k: int) -> int:
        return _iblt_kh(k, _IBLT_CHK_SALT) % _P

    out = []
    progress = True
    while progress:
        progress = False
        # iterate over a key snapshot but ALWAYS re-read the live cell
        # state: peeling mutates cells that appear later in the snapshot,
        # and acting on their stale values double-peels and corrupts the
        # table
        for c in list(cell.keys()):
            st = cell.get(c)
            if st is None:
                continue
            cnt, kx, cx = st
            if cnt in (1, -1) and cx == chk_of(kx):
                k, side = kx, cnt
                out.append((k, "a_only" if side == 1 else "b_only"))
                for p in positions(k):
                    ps = cell.setdefault(p, [0, 0, 0])
                    ps[0] -= side
                    ps[1] ^= k
                    ps[2] ^= chk_of(k)
                    if ps == [0, 0, 0]:
                        del cell[p]
                progress = True
    if any(st != [0, 0, 0] for st in cell.values()):
        raise ValueError(
            "IBLT undecodable: difference too large for "
            f"{cells} cells — rebuild with a larger table"
        )
    spark = a.sparkSession
    out.sort()
    return spark.createDataFrame(out, f"{key} long, side string")


def orders_replica_diff(orders: DataFrame, cells: int = 1024) -> DataFrame:
    """Gate query: two drifted replicas of the order-key set — replica A
    lost the keys divisible by 97, replica B the keys divisible by 101 —
    reconciled through the IBLT. → ``[o_orderkey, side]``."""
    keys = orders.select("o_orderkey").distinct()
    a = keys.where(F.col("o_orderkey") % 97 != 0)
    b = keys.where(F.col("o_orderkey") % 101 != 0)
    return iblt_set_diff(a, b, "o_orderkey", cells=cells)


def orders_replica_diff_sql(table: str = "orders") -> str:
    """Oracle: the anti-join DEFINITION of the symmetric difference."""
    return f"""
    WITH ik AS (SELECT DISTINCT o_orderkey FROM {table}),
    ia AS (SELECT o_orderkey FROM ik WHERE o_orderkey % 97 <> 0),
    ib AS (SELECT o_orderkey FROM ik WHERE o_orderkey % 101 <> 0)
    SELECT o_orderkey, 'a_only' AS side FROM ia
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ib)
    UNION ALL
    SELECT o_orderkey, 'b_only' AS side FROM ib
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ia)
    ORDER BY o_orderkey
    """


# ---------------------------------------------------------------------------
# Bloom-filter join prefilter audit (wave 94)
# ---------------------------------------------------------------------------

# Theoretical FPR (Bloom 1970): (1 - e^{-kn/m})^k. Staged as ONE shared
# expression string (n_members -> double, fixed k and m baked in) so the
# Spark and DuckDB doubles are structurally identical, like the OLS/erfc
# stages; the power is an explicit k-fold product (engine pow() libms
# may differ in the last ulp — a product of identical doubles cannot).


def _bloom_theory_expr(k: int, m_bits: int) -> str:
    x = f"(1.0 - exp(-({int(k)} * CAST(n_members AS DOUBLE)) / {int(m_bits)}.0))"
    return " * ".join([x] * int(k))


def bloom_prefilter_audit(
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    m_bits: int = 1024,
    k: int = 4,
) -> DataFrame:
    """→ one row [n_members, n_bits_set, n_probed, n_pass, n_member_hits,
    n_false_pos, n_false_neg, fpr_measured, fpr_theory] — build a Bloom
    filter (Bloom 1970) over the customer keys of one market segment and
    audit it as a JOIN PREFILTER for the orders fact table: how many
    distinct probed keys pass, how many passes are false positives vs the
    exact semi-join truth, and how the measured false-positive rate
    compares to the analytic (1 − e^{−kn/m})^k. ``n_false_neg`` is the
    structural invariant — a Bloom filter admits every true member, so it
    must be 0 (emitted, not assumed, so the audit would catch a broken
    hash family).

    This is THE shuffle-avoidance pattern at 100 TB: the filter is ≤
    ``m_bits`` bit positions (a table Catalyst broadcasts), the fact side
    is pre-filtered map-side before the expensive join, and the audit
    quantifies the recall/selectivity trade the prefilter buys. Positions
    come from the house affine family over the portable md5 hash
    (``hash_params(k)``), so both engines set identical bits.

    Exactness: every count is an exact BIGINT; ``fpr_measured`` is the
    rounded double of an integer ratio (NULL when no true negatives were
    probed); ``fpr_theory`` is staged through one shared expression with
    an explicit k-fold product (no engine ``pow``). Defaults (m=1024,
    k=4, n≈300 at sf0.01) deliberately run the filter SATURATED (~23%
    theoretical FPR) so the false-positive accounting is value-checked,
    not vacuously zero.

    Scale shape: build = one dimension-subset scan + a ≤ m_bits distinct;
    probe = one distinct on the fact key + a k-row explode joined against
    the broadcast bit table; final reduce is one row. No fact-table
    shuffle beyond the key distinct.

    Reference parity: no sketch surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from linkgraph_spark.functions.hashing import (
        affine_mod,
        hash_params,
        md5_long,
    )

    params = hash_params(k)

    def _positions(keycol):
        h = md5_long(keycol.cast("string"))
        return F.array(
            *[(affine_mod(h, a, b) % F.lit(m_bits)) for a, b in params]
        )

    members = customer.where(F.col("c_mktsegment") == segment).select(
        F.col("c_custkey").alias("key")
    )
    bits = (
        members.select(F.explode(_positions(F.col("key"))).alias("pos"))
        .distinct()
    )
    nm = members.groupBy().agg(F.count("*").cast("long").alias("n_members"))
    nb = bits.groupBy().agg(F.count("*").cast("long").alias("n_bits_set"))
    probe = orders.select(F.col("o_custkey").alias("key")).distinct()
    pp = probe.select(
        "key", F.explode(_positions(F.col("key"))).alias("pos")
    )
    per_key = (
        pp.join(bits.withColumn("hit", F.lit(1)), "pos", "left")
        .groupBy("key")
        .agg(
            (
                F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)) == 0
            ).alias("passes")
        )
        .join(members.withColumn("is_member", F.lit(True)), "key", "left")
        .select(
            "key",
            "passes",
            F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
        )
    )
    p, mb = F.col("passes"), F.col("is_member")
    s = per_key.groupBy().agg(
        F.count("*").cast("long").alias("n_probed"),
        F.coalesce(F.sum(p.cast("int")), F.lit(0)).cast("long").alias("n_pass"),
        F.coalesce(F.sum(mb.cast("int")), F.lit(0))
        .cast("long")
        .alias("n_member_hits"),
        F.coalesce(F.sum((p & ~mb).cast("int")), F.lit(0))
        .cast("long")
        .alias("n_false_pos"),
        F.coalesce(F.sum((mb & ~p).cast("int")), F.lit(0))
        .cast("long")
        .alias("n_false_neg"),
    )
    out = s.crossJoin(nm).crossJoin(nb)
    return out.select(
        "n_members",
        "n_bits_set",
        "n_probed",
        "n_pass",
        "n_member_hits",
        "n_false_pos",
        "n_false_neg",
        F.when(
            (F.col("n_probed") - F.col("n_member_hits")) > 0,
            F.round(
                F.col("n_false_pos").cast("double")
                / (F.col("n_probed") - F.col("n_member_hits")).cast("double"),
                6,
            ),
        ).alias("fpr_measured"),
        F.round(F.expr(_bloom_theory_expr(k, m_bits)), 6).alias("fpr_theory"),
    )


def bloom_prefilter_audit_sql(
    orders: str = "orders",
    customer: str = "customer",
    segment: str = "BUILDING",
    m_bits: int = 1024,
    k: int = 4,
) -> str:
    """DuckDB oracle for :func:`bloom_prefilter_audit` — same affine
    position family, same shared theory expression."""
    from linkgraph_spark.functions.hashing import (
        affine_mod_sql,
        hash_params,
        md5_long_sql,
    )

    seg = segment.replace("'", "''")
    params = hash_params(k)
    h = md5_long_sql("CAST(key AS VARCHAR)")
    mpos = " UNION ALL ".join(
        f"SELECT ({affine_mod_sql(h, a, b)}) % {int(m_bits)} AS pos"
        f" FROM blm_m"
        for a, b in params
    )
    ppos = " UNION ALL ".join(
        f"SELECT key, ({affine_mod_sql(h, a, b)}) % {int(m_bits)} AS pos"
        f" FROM blm_p"
        for a, b in params
    )
    return f"""
    WITH blm_m AS (
      SELECT c_custkey AS key FROM {customer} WHERE c_mktsegment = '{seg}'
    ), blm_bits AS (
      SELECT DISTINCT pos FROM ({mpos})
    ), blm_nm AS (
      SELECT CAST(count(*) AS BIGINT) AS n_members FROM blm_m
    ), blm_nb AS (
      SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM blm_bits
    ), blm_p AS (
      SELECT DISTINCT o_custkey AS key FROM {orders}
    ), blm_pp AS (
      {ppos}
    ), blm_key AS (
      SELECT pp.key,
             (sum(CASE WHEN b.pos IS NULL THEN 1 ELSE 0 END) = 0) AS passes,
             coalesce(max(CASE WHEN m.key IS NOT NULL THEN TRUE END), FALSE)
               AS is_member
      FROM blm_pp pp
      LEFT JOIN blm_bits b ON b.pos = pp.pos
      LEFT JOIN blm_m m ON m.key = pp.key
      GROUP BY pp.key
    ), blm_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_probed,
             CAST(coalesce(sum(CASE WHEN passes THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_pass,
             CAST(coalesce(sum(CASE WHEN is_member THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_member_hits,
             CAST(coalesce(sum(CASE WHEN passes AND NOT is_member
                                    THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_false_pos,
             CAST(coalesce(sum(CASE WHEN is_member AND NOT passes
                                    THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_false_neg
      FROM blm_key
    )
    SELECT n_members, n_bits_set, n_probed, n_pass, n_member_hits,
           n_false_pos, n_false_neg,
           CASE WHEN (n_probed - n_member_hits) > 0
                THEN round(CAST(n_false_pos AS DOUBLE)
                           / CAST(n_probed - n_member_hits AS DOUBLE), 6)
           END AS fpr_measured,
           round({_bloom_theory_expr(k, m_bits)}, 6) AS fpr_theory
    FROM blm_s, blm_nm, blm_nb
    """
