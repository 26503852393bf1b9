"""Partitioned corpus sink: layout, round-trip, pruning, file counts."""

import os

from pyspark.sql import functions as F

from linkgraph_spark.sources.corpus import (
    read_corpus_partition,
    write_partitioned_corpus,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_roundtrip_and_layout(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "corpus")
    write_partitioned_corpus(docs, out, files_per_partition=2)
    langs = sorted(r.lang for r in docs.select("lang").distinct().collect())
    # hive layout: one directory per value
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == [f"lang={l}" for l in langs]
    # bounded file count per partition (no small-files explosion)
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d))
                 if f.endswith(".parquet")]
        assert 1 <= len(files) <= 2, (d, files)
    # content round-trips exactly (partition column restored on read)
    back = spark.read.parquet(out)
    key = lambda r: (r.doc_id, r.lang, r.source, r.n_chars)  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(map(key, docs.collect()))


def test_partition_pruning_reaches_the_scan(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "corpus")
    write_partitioned_corpus(docs, out)
    one = read_corpus_partition(spark, out, "lang", "de")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "lang" in plan.split("PartitionFilters", 1)[1][:200], plan
    got = one.count()
    assert got == docs.where(F.col("lang") == "de").count() > 0
    # pruning is semantic too: no other partition's rows leak
    assert one.select("lang").distinct().collect()[0].lang == "de"
