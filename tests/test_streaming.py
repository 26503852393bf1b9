from pyspark.sql import functions as F

from linkgraph_spark.streaming import (
    incremental_degrees,
    read_transcript_stream,
    stream_tool_edges,
    windowed_role_activity,
)
from linkgraph_spark.transcripts import synthesize_transcripts


def _write_transcripts(spark, path, n_convs=60):
    t = synthesize_transcripts(spark, n_convs=n_convs, min_turns=2, max_turns=20)
    # several files so the stream sees multiple micro-batches
    t.repartition(4).write.mode("overwrite").parquet(path)
    return t


def test_streamed_tool_edges_match_batch(spark, tmp_path):
    src = str(tmp_path / "stream_in")
    t = _write_transcripts(spark, src)
    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream_tool_edges(stream)
        .writeStream.format("memory")
        .queryName("tool_edges_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["src_key"], r["dst_key"])
        for r in spark.sql("SELECT src_key, dst_key FROM tool_edges_out").collect()
    )
    want = sorted(
        (f"{r['conv_id']}#{r['role']}", f"tool:{r['tool']}")
        for r in t.where(F.col("tool").isNotNull()).collect()
    )
    assert got == want


def test_windowed_activity_with_watermark(spark, tmp_path):
    src = str(tmp_path / "stream_in2")
    t = _write_transcripts(spark, src)
    stream = read_transcript_stream(spark, src)
    agg = windowed_role_activity(stream, window="60 minutes", watermark="120 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("activity_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["role"]): r["turns"]
        for r in spark.sql("SELECT * FROM activity_out").collect()
    }
    want = {
        (r["w"], r["role"]): r["turns"]
        for r in t.groupBy(
            F.window("ts", "60 minutes").getField("start").alias("w"), "role"
        )
        .agg(F.count("*").alias("turns"))
        .collect()
    }
    assert got == want


def test_incremental_degrees_match_batch(spark, tmp_path):
    src = str(tmp_path / "stream_in3")
    t = _write_transcripts(spark, src)
    state = str(tmp_path / "deg_state")
    ck = str(tmp_path / "deg_ck")
    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    q = incremental_degrees(stream, state, ck)
    q.awaitTermination(180)
    from linkgraph_spark.streaming import read_degree_state

    got = {
        (r["src_key"], r["dst_key"]): r["cnt"]
        for r in read_degree_state(spark, state).collect()
    }
    want = {
        (r["src_key"], r["dst_key"]): r["cnt"]
        for r in t.where(F.col("tool").isNotNull())
        .select(
            F.concat(F.col("conv_id"), F.lit("#"), F.col("role")).alias("src_key"),
            F.concat(F.lit("tool:"), F.col("tool")).alias("dst_key"),
        )
        .groupBy("src_key", "dst_key")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want


def test_incremental_degrees_replay_idempotent(spark, tmp_path):
    """At-least-once foreachBatch delivery: re-merging an already-merged
    batch_id must be a no-op (no double counting); a batch_id beyond the
    stored one merges normally."""
    from linkgraph_spark.streaming import merge_degree_batch, read_degree_state

    t = synthesize_transcripts(spark, n_convs=20, min_turns=2, max_turns=10)
    state = str(tmp_path / "replay_state")
    merge_degree_batch(t, 0, state)
    first = {
        (r["src_key"], r["dst_key"]): r["cnt"]
        for r in read_degree_state(spark, state).collect()
    }
    # replay batch 0 → unchanged
    merge_degree_batch(t, 0, state)
    replayed = {
        (r["src_key"], r["dst_key"]): r["cnt"]
        for r in read_degree_state(spark, state).collect()
    }
    assert replayed == first
    # genuinely new batch → counts double; old snapshot pruned
    merge_degree_batch(t, 1, state)
    after = {
        (r["src_key"], r["dst_key"]): r["cnt"]
        for r in read_degree_state(spark, state).collect()
    }
    assert after == {k: 2 * v for k, v in first.items()}
    import os

    assert not os.path.isdir(os.path.join(state, "v=0"))  # pruned
    assert os.path.isdir(os.path.join(state, "v=1"))


def test_degree_state_pre_pointer_layout_raises(spark, tmp_path):
    """A state dir with data but no _LATEST pointer (pre-snapshot flat
    parquet layout) must raise with a migration hint — treating it as
    empty would discard merged counts AND re-merge old batches (double
    counting)."""
    import pytest

    from linkgraph_spark.streaming import merge_degree_batch, read_degree_state

    state = tmp_path / "old_layout_state"
    state.mkdir()
    (state / "part-00000.parquet").write_bytes(b"not really parquet")
    with pytest.raises(FileNotFoundError, match="pre-snapshot"):
        read_degree_state(spark, str(state))
    t = synthesize_transcripts(spark, n_convs=20, min_turns=2, max_turns=10)
    with pytest.raises(FileNotFoundError, match="migration|pre-snapshot"):
        merge_degree_batch(t, 0, str(state))
    # hidden/marker files alone (e.g. Spark's _SUCCESS, .crc) still mean
    # "no prior state" — only real data triggers the refusal
    state2 = tmp_path / "markers_only"
    state2.mkdir()
    (state2 / ".part-0.crc").write_bytes(b"")
    merge_degree_batch(t, 0, str(state2))
    assert read_degree_state(spark, str(state2)).count() > 0


def test_stream_adjacent_edges_match_batch(spark, tmp_path):
    """Stateful adjacent-turn extraction across micro-batches equals the
    batch window derivation when turns arrive in order: the second file
    carries each conversation's LATER turns, so cross-batch bridging via
    the stored frontier is exercised."""
    import time as _time

    from linkgraph_spark.edges import derive_edge_keys
    from linkgraph_spark.streaming import stream_adjacent_edges

    t = synthesize_transcripts(spark, n_convs=30, min_turns=3, max_turns=12).cache()
    src = str(tmp_path / "adj_in")
    med = t.groupBy("conv_id").agg(F.max("turn_idx").alias("mx")).selectExpr(
        "conv_id", "cast(mx / 2 as int) as half"
    )
    early = t.join(med, "conv_id").where(F.col("turn_idx") <= F.col("half")).drop("half")
    late = t.join(med, "conv_id").where(F.col("turn_idx") > F.col("half")).drop("half")
    early.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.2)  # file-stream picks files up in modification order
    late.coalesce(1).write.mode("append").parquet(src)

    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream_adjacent_edges(stream)
        .writeStream.format("memory")
        .queryName("adj_edges_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["src_key"], r["dst_key"])
        for r in spark.sql("SELECT * FROM adj_edges_out").collect()
    )
    want = sorted(
        (r["src_key"], r["dst_key"])
        for r in derive_edge_keys(t).where(F.col("kind") == "adjacent_turn").collect()
    )
    assert got == want
    t.unpersist()


def test_stream_adjacent_edges_drop_counter(spark, tmp_path):
    """Out-of-order arrival (late half of each conversation first, early
    half second) must surface the dropped-turn count so backfill operators
    know which conversations to replay through the batch ETL — the default
    path drops those turns silently."""
    import time as _time

    from linkgraph_spark.edges import derive_edge_keys
    from linkgraph_spark.streaming import stream_adjacent_edges

    t = synthesize_transcripts(spark, n_convs=20, min_turns=4, max_turns=12).cache()
    src = str(tmp_path / "adj_ooo_in")
    med = t.groupBy("conv_id").agg(F.max("turn_idx").alias("mx")).selectExpr(
        "conv_id", "cast(mx / 2 as int) as half"
    )
    early = t.join(med, "conv_id").where(F.col("turn_idx") <= F.col("half")).drop("half")
    late = t.join(med, "conv_id").where(F.col("turn_idx") > F.col("half")).drop("half")
    late.coalesce(1).write.mode("overwrite").parquet(src)  # LATE arrives first
    _time.sleep(1.2)
    early.coalesce(1).write.mode("append").parquet(src)

    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream_adjacent_edges(stream, with_drop_counts=True)
        .writeStream.format("memory")
        .queryName("adj_ooo_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT * FROM adj_ooo_out").collect()
    dropped = sum(r["dropped_turns"] for r in out if r["dropped_turns"] is not None)
    assert dropped == early.count()  # every early turn is behind the frontier
    got = sorted(
        (r["src_key"], r["dst_key"]) for r in out if r["src_key"] is not None
    )
    want = sorted(  # edges come from the late subsequence only
        (r["src_key"], r["dst_key"])
        for r in derive_edge_keys(late).where(F.col("kind") == "adjacent_turn").collect()
    )
    assert got == want
    t.unpersist()


def test_stream_dedup_turns_drops_replays(spark, tmp_path):
    from linkgraph_spark.streaming import stream_dedup_turns

    src = str(tmp_path / "dedup_in")
    t = _write_transcripts(spark, src, n_convs=20)
    # replay every file once: at-least-once delivery of the same rows
    t.repartition(2).write.mode("append").parquet(src)
    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    q = (
        # watermark wider than the synthesized ts span: only DUPLICATES are
        # dropped (a tight watermark would also drop genuinely-late rows,
        # which is correct production behavior but not what this test pins)
        stream_dedup_turns(stream, watermark="30 days")
        .writeStream.format("memory")
        .queryName("dedup_turns_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT conv_id, turn_idx, count(*) AS c FROM dedup_turns_out "
        "GROUP BY conv_id, turn_idx HAVING count(*) > 1"
    ).count()
    assert got == 0  # no key emitted twice
    total = spark.sql("SELECT count(*) AS c FROM dedup_turns_out").collect()[0]["c"]
    assert total == t.select("conv_id", "turn_idx").distinct().count()


def test_stream_exact_dedup_first_occurrence(spark, tmp_path):
    from linkgraph_spark.streaming import stream_exact_dedup

    src = str(tmp_path / "docdedup_in")
    rows = [
        (0, "alpha beta gamma"),
        (1, "Alpha  beta gamma"),   # same normalized content as 0
        (2, "something else"),
        (3, "alpha beta gamma"),    # dup of 0 again
        (4, "unique four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("docdedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["n_prior_dups"]
        for r in spark.sql("SELECT * FROM docdedup_out").collect()
    }
    # keepers = min doc_id per digest; 0 had 2 same-batch dups (1, 3)
    assert got == {0: 2, 2: 0, 4: 0}


def test_stream_exact_dedup_drops_across_batches(spark, tmp_path):
    from linkgraph_spark.streaming import stream_exact_dedup

    src = str(tmp_path / "docdedup2_in")
    spark.createDataFrame(
        [(0, "same content"), (1, "other")], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # second file arrives as a later micro-batch with a cross-batch dup
    spark.createDataFrame(
        [(2, "same  CONTENT"), (3, "brand new")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("docdedup2_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM docdedup2_out").collect()
    )
    assert kept == [0, 1, 3]  # doc 2 dropped: digest already stateful


def test_windowed_tool_trending_matches_batch(spark, tmp_path):
    from linkgraph_spark.streaming import trending_tools, windowed_tool_counts

    src = str(tmp_path / "stream_in3")
    t = _write_transcripts(spark, src)
    stream = read_transcript_stream(spark, src)
    counts = windowed_tool_counts(stream, window="60 minutes", watermark="120 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("tool_counts_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink = spark.sql("SELECT * FROM tool_counts_out")
    got = sorted(
        (r["window_start"], r["rank"], r["tool"], r["n_calls"])
        for r in trending_tools(sink, k=2).collect()
    )
    # batch equivalent: same window + count + rank
    from pyspark.sql import Window

    batch = (
        t.where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", "60 minutes"), "tool")
        .agg(F.count("*").alias("n_calls"))
        .select(F.col("window.start").alias("window_start"), "tool", "n_calls")
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("n_calls"), F.asc("tool"))
    want = sorted(
        (r["window_start"], r["rank"], r["tool"], r["n_calls"])
        for r in batch.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 2)
        .collect()
    )
    assert got == want and len(got) > 0


def test_trending_tools_validates_k(spark):
    import pytest

    from linkgraph_spark.streaming import trending_tools

    df = spark.createDataFrame(
        [], "window_start timestamp, window_end timestamp, tool string, n_calls long"
    )
    with pytest.raises(ValueError):
        trending_tools(df, k=0)
