"""Deterministic hash sampling / splitting: the properties that make it
the right sampling at scale (replayable, monotone, entity-coherent)."""

from pyspark.sql import functions as F

from linkgraph_spark.functions.sampling import hash_sample, train_test_split


def _tbl(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 100).alias("conv_id"),
    )


def test_hash_sample_rate_and_determinism(spark):
    df = _tbl(spark)
    s1 = hash_sample(df, ["row_id"], 0.2)
    s2 = hash_sample(df, ["row_id"], 0.2)
    a = {r["row_id"] for r in s1.collect()}
    b = {r["row_id"] for r in s2.collect()}
    assert a == b  # replayable
    assert 0.15 < len(a) / 2000 < 0.25  # rate holds statistically

    # monotone under growth: the sample of a superset contains the sample
    # of the subset (kept keys never flip)
    small = {r["row_id"] for r in hash_sample(_tbl(spark, 500), ["row_id"], 0.2).collect()}
    assert small == {x for x in a if x < 500}

    # independent salts decorrelate
    c = {r["row_id"] for r in hash_sample(df, ["row_id"], 0.2, salt="other").collect()}
    assert c != a


def test_stratified_hash_sample_per_stratum_rates(spark):
    from linkgraph_spark.functions.sampling import stratified_hash_sample

    df = spark.range(3000).select(
        F.col("id").alias("row_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("zh"), F.lit("es")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    rates = {"en": 0.1, "zh": 0.9}
    out = stratified_hash_sample(df, ["row_id"], "lang", rates, default_rate=0.5)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.05 < got.get("en", 0) / 1000 < 0.16
    assert 0.84 < got["zh"] / 1000 < 0.96
    assert 0.4 < got["es"] / 1000 < 0.6  # default_rate stratum
    # per-stratum equivalence: a stratum's rows sample exactly as a plain
    # hash_sample at that stratum's rate (same hash, same salt)
    want_en = {
        r["row_id"]
        for r in hash_sample(df.where(F.col("lang") == "en"), ["row_id"], 0.1).collect()
    }
    got_en = {r["row_id"] for r in out.where(F.col("lang") == "en").collect()}
    assert got_en == want_en
    # zero default drops unlisted strata entirely
    none_es = stratified_hash_sample(df, ["row_id"], "lang", rates, default_rate=0.0)
    assert none_es.where(F.col("lang") == "es").count() == 0


def test_top_n_hash_sample_budget_and_determinism(spark):
    from linkgraph_spark.functions.sampling import top_n_hash_sample

    df = spark.range(900).select(
        F.col("id").alias("row_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("zh"), F.lit("es")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    # stratified: EXACTLY n per stratum, replayable
    s1 = top_n_hash_sample(df, ["row_id"], 40, strata_col="lang")
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 40, "zh": 40, "es": 40}
    s2 = top_n_hash_sample(df, ["row_id"], 40, strata_col="lang")
    assert {r["row_id"] for r in s1.collect()} == {r["row_id"] for r in s2.collect()}
    # global: exact budget; n > table size degrades to the full table
    assert top_n_hash_sample(df, ["row_id"], 17).count() == 17
    assert top_n_hash_sample(df, ["row_id"], 5000).count() == 900
    # a stratum smaller than n yields the whole stratum
    tiny = top_n_hash_sample(df.where(F.col("lang") == "en").limit(7), ["row_id"], 40, strata_col="lang")
    assert tiny.count() == 7


def test_train_test_split_entity_coherent(spark):
    df = _tbl(spark)
    out = train_test_split(df, ["conv_id"], test_rate=0.3)
    # every conv lands wholly on one side
    sides = out.groupBy("conv_id").agg(F.countDistinct("split").alias("k"))
    assert sides.where(F.col("k") > 1).count() == 0
    n_test = out.where(F.col("split") == "test").select("conv_id").distinct().count()
    assert 15 <= n_test <= 45  # ~30 of 100 convs

    # degenerate rates
    assert train_test_split(df, ["conv_id"], 0.0).where(F.col("split") == "test").count() == 0
    assert train_test_split(df, ["conv_id"], 1.0).where(F.col("split") == "train").count() == 0


def test_top_n_stratified_two_phase_plan_and_equivalence(spark):
    """Scale shape of the stratified fixed-budget sample: NO window may run
    over a whole raw stratum in one task. Phase 1 must partition by
    (stratum, hash-sub-bucket) — a hot stratum splits across sub-buckets —
    and only the bounded phase-2 window (≤ sub_buckets × n rows per
    stratum) partitions by the stratum alone. The two-phase result is
    proven identical to the naive single-window result."""
    from pyspark.sql import Window

    from linkgraph_spark.functions.hashing import md5_long
    from linkgraph_spark.functions.sampling import top_n_hash_sample

    df = spark.range(3000).select(
        F.col("id").alias("row_id"),
        # skewed mix: one hot stratum dominating, like `en` at corpus scale
        F.when(F.col("id") % 10 < 8, "en").otherwise("ko").alias("lang"),
    )
    out = top_n_hash_sample(df, ["row_id"], 25, strata_col="lang")

    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly two ranking windows ("Window" alone also matches Spark 4's
    # WindowGroupLimit pruning nodes — count the specs instead)
    assert plan.count("windowspecdefinition") == 2
    # phase 1 shuffles on (stratum, sub-bucket) — the hot-stratum splitter
    assert "hashpartitioning(lang" in plan and "__tnhs_b" in plan
    # the window that runs over the RAW input (the innermost/last one in
    # the plan string) is the sub-bucketed phase-1 window, never a
    # full-stratum window; phase 2 (first in the string) sees survivors only
    inner_spec = plan.rindex("windowspecdefinition")
    assert "__tnhs_b" in plan[inner_spec : inner_spec + 120]
    # Spark additionally inserts pre-shuffle WindowGroupLimit pruning, so
    # per-task state is bounded by n per (stratum, bucket) even before the
    # exchange — assert the insurance holds on this build
    assert "WindowGroupLimit" in plan

    # value equivalence vs the naive single-window plan
    key = F.concat_ws("\x1f", F.lit(""), F.col("row_id").cast("string"))
    h = md5_long(key)
    w = Window.partitionBy("lang").orderBy(h.asc(), key.asc())
    naive = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 25)
        .drop("rn")
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in naive.collect()}

    # internal-name collision is loud, not silent
    import pytest as _pytest

    clash = df.withColumn("__tnhs_h", F.lit(1))
    with _pytest.raises(ValueError, match="__tnhs_h"):
        top_n_hash_sample(clash, ["row_id"], 5, strata_col="lang")


def test_corpus_mixture_exact_budgets(spark):
    """Counts a:100 b:50 c:10 with parts 2:1:1 (S=4): the c stratum binds
    T = min(200, 200, 40) = 40 → budgets a=20, b=10, c=10 — exact mixture,
    deterministic, strata outside the target dropped entirely."""
    from linkgraph_spark.functions.sampling import corpus_mixture

    rows = (
        [(i, "a") for i in range(100)]
        + [(i + 100, "b") for i in range(50)]
        + [(i + 200, "c") for i in range(10)]
        + [(i + 300, "junk") for i in range(30)]  # not a target stratum
    )
    df = spark.createDataFrame(rows, "row_id long, lang string")
    out = corpus_mixture(df, ["row_id"], "lang", {"a": 2, "b": 1, "c": 1})
    got = [(r["row_id"], r["lang"]) for r in out.collect()]
    by = {}
    for _, s in got:
        by[s] = by.get(s, 0) + 1
    assert by == {"a": 20, "b": 10, "c": 10}
    # replayable
    again = [(r["row_id"], r["lang"]) for r in corpus_mixture(
        df, ["row_id"], "lang", {"a": 2, "b": 1, "c": 1}).collect()]
    assert sorted(got) == sorted(again)
    # a target stratum with ZERO rows binds T to 0 → empty mixture
    empty = corpus_mixture(df, ["row_id"], "lang", {"a": 1, "nosuch": 1})
    assert empty.count() == 0


def test_pack_contexts_layout_invariants(spark):
    """Packing must lay documents head-to-tail per bucket: within each
    bucket, offsets (seq_id*capacity + seq_offset) are exactly the running
    token total in (hash, key) order, starting at 0 with no gaps."""
    from linkgraph_spark.functions.sampling import pack_contexts

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (1 + i % 37))) for i in range(200)],
        "doc_id long, text string",
    )
    out = pack_contexts(docs, ["doc_id"], capacity=50, n_buckets=4).collect()
    assert len(out) == 200  # every doc placed exactly once
    by_bucket = {}
    for r in out:
        assert 0 <= r["pack_bucket"] < 4
        assert 0 <= r["seq_offset"] < 50
        g = r["seq_id"] * 50 + r["seq_offset"]  # global stream offset
        by_bucket.setdefault(r["pack_bucket"], []).append((g, r["n_tokens"]))
    for b, items in by_bucket.items():
        items.sort()
        expect = 0
        for g, n in items:
            assert g == expect  # head-to-tail, no gap, no overlap
            expect += n
    # deterministic placement
    again = pack_contexts(docs, ["doc_id"], capacity=50, n_buckets=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_corpus_mixture_plan_broadcast_and_two_phase(spark):
    """Scale shape of the mixture: the per-stratum budget table (|strata|
    rows) must attach via BROADCAST (never a shuffle of the corpus), and
    the ranking must be the same two-phase sub-bucketed shape as
    top_n_hash_sample — no window over a whole raw stratum in one task."""
    from linkgraph_spark.functions.sampling import corpus_mixture

    df = spark.range(3000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 8, "en").otherwise("ko").alias("lang"),
    )
    out = corpus_mixture(df, ["row_id"], "lang", {"en": 3, "ko": 1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # budgets, not a corpus shuffle
    assert plan.count("windowspecdefinition") == 2  # two-phase ranking
    inner_spec = plan.rindex("windowspecdefinition")
    assert "__cm_b" in plan[inner_spec : inner_spec + 120]  # phase 1 sub-bucketed


def test_pack_contexts_plan_bucketed_window(spark):
    """The packing cumsum must run per hash bucket — the window partition
    spec carries pack_bucket, so no task ever sorts the whole corpus."""
    from linkgraph_spark.functions.sampling import pack_contexts

    docs = spark.createDataFrame(
        [(i, "t " * (1 + i % 5)) for i in range(100)], "doc_id long, text string"
    )
    out = pack_contexts(docs, ["doc_id"], capacity=64, n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    spec = plan.index("windowspecdefinition")
    assert "pack_bucket" in plan[max(0, spec - 400) : spec + 120]
    assert "hashpartitioning(pack_bucket" in plan
