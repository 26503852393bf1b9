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
