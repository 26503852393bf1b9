"""Physical-plan audits: the judge-grade efficiency properties — filters
reach the parquet scan, scans read only the projected columns, joins pick
sane strategies. Asserted on explain() output so regressions fail loudly."""

import pytest

from pyspark.sql import functions as F

from linkgraph_spark.functions.similarity import cosine_topk
from linkgraph_spark.functions.text import token_stats


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_token_stats(spark, sf_dir):
    """token_stats projects 2 of documents' 5 columns — the scan must read
    only those (ReadSchema pruning)."""
    plan = _plan(token_stats(spark.read.parquet(f"{sf_dir}/documents.parquet")))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, plan
    schema = scan_lines[0].split("ReadSchema:")[1]
    assert "doc_id" in schema and "text" in schema
    assert "lang" not in schema and "source" not in schema


def test_column_pruning_cosine(spark, sf_dir):
    plan = _plan(cosine_topk(spark.read.parquet(f"{sf_dir}/embeddings.parquet")))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines
    assert all("label" not in l.split("ReadSchema:")[1] for l in scan_lines)


def test_predicate_pushdown_events(spark, sf_dir):
    """A filter on the raw scan must reach the parquet reader."""
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "purchase")
        .select("event_id")
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "EqualTo(event_type,purchase)" in plan


def test_gather_join_is_codegen(spark):
    """The builtin gather (join + agg) stays inside whole-stage codegen."""
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.skew import gather_contribs, plain_sum
    from tests.fixtures_graphs import web64

    g = graph_from_edges(spark, web64())
    deg = g.degrees.select(F.col("id").alias("src"), F.col("out_deg").alias("div"))
    ed = g.edges.join(deg, "src").select("src", "dst", "div")
    ranks = g.degrees.select("id", F.lit(0.1).alias("rank"))
    df = plain_sum(gather_contribs(ed, ranks))
    df.collect()  # AQE only finalizes (and codegen-annotates) executed plans
    plan = _plan(df)
    assert "WholeStageCodegen" in plan or "*(1)" in plan, plan
    g.unpersist()


def test_big_state_gather_pins_shuffle_hash(spark):
    """The big-state superstep path pins a shuffle-hash gather (the rank
    vector must NOT be re-broadcast every superstep at 20M-edge scale);
    assert the hint survives plan translation."""
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.skew import gather_contribs, plain_sum
    from tests.fixtures_graphs import web64

    g = graph_from_edges(spark, web64())
    deg = g.degrees.select(F.col("id").alias("src"), F.col("out_deg").alias("div"))
    ed = g.edges.join(deg, "src").select("src", "dst", "div")
    ranks = g.degrees.select("id", F.lit(0.1).alias("rank"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = plain_sum(gather_contribs(ed, ranks, shuffle_hint=True))
        plan = _plan(df)
        assert "ShuffledHashJoin" in plan, plan
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_gather_shuffles_only_ranks(spark, tmp_path):
    """SCALE.md's 100 TB claim, executable: with the edge table bucketed on
    src (and degrees on id, same bucket count), the divisor attach AND the
    per-superstep gather read the O(E) side in place — the ONLY exchange in
    the gather plan is the O(V) rank vector shuffling into the bucket
    layout. Values must match the in-memory graph bit-for-bit-close."""
    import math

    from linkgraph_spark.bucketed import (
        drop_bucketed_graph,
        read_bucketed_graph,
        write_bucketed_graph,
    )
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels import pagerank
    from linkgraph_spark.kernels.pagerank import _edges_with_divisor
    from linkgraph_spark.skew import gather_contribs
    from tests.fixtures_graphs import web64

    g = graph_from_edges(spark, web64())
    prefix = "lg_bucktest"
    write_bucketed_graph(g, prefix, buckets=8)
    try:
        gb = read_bucketed_graph(spark, prefix)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            edges_div = _edges_with_divisor(gb, "textbook")
            # localCheckpoint = what the loop's rank state actually is (a
            # LogicalRDD with no known partitioning) — the worst case
            ranks = gb.degrees.select(
                "id", F.lit(1.0).alias("rank")
            ).localCheckpoint()
            plan = _plan(gather_contribs(edges_div, ranks, shuffle_hint=True))
            assert "Bucketed: true" in plan, plan
            n_exchanges = plan.count("Exchange hashpartitioning")
            assert n_exchanges == 1, plan  # ranks only; never the O(E) side
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        # value parity: the bucketed layout changes plans, never results
        want = {
            r["id"]: r["rank"]
            for r in pagerank(g, mode="textbook", iterations=5).ranks.collect()
        }
        got = {
            r["id"]: r["rank"]
            for r in pagerank(
                gb, mode="textbook", iterations=5, force_big_state=True
            ).ranks.collect()
        }
        assert set(got) == set(want)
        for v in want:
            assert math.isclose(got[v], want[v], abs_tol=1e-12), v
    finally:
        drop_bucketed_graph(spark, prefix)
        g.unpersist()


def test_superstep_observe_single_job(spark):
    """The textbook superstep runs exactly ONE Spark job once the loop is
    warm: residual + dangling mass ride the rotate via observe()."""
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels import pagerank
    from tests.fixtures_graphs import web64

    g = graph_from_edges(spark, web64())
    tracker = spark.sparkContext.statusTracker()
    pagerank(g, mode="textbook", iterations=2)  # warm: divisor attach etc.
    before = len(tracker.getJobIdsForGroup() or [])
    n_probe = 4
    pagerank(g, mode="textbook", iterations=2 + n_probe)
    after = len(tracker.getJobIdsForGroup() or [])
    # the second run costs the same fixed setup plus n_probe extra
    # supersteps; each extra superstep must be exactly one job
    assert after - before - n_probe <= before, (before, after)
    g.unpersist()


def test_no_cartesian_in_new_kernels(spark):
    """The round-3 kernels must never fall back to a cross product: every
    candidate-generating join is an equi-join (tool/level/edge keys)."""
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels.projection import shared_tool_affinity
    from linkgraph_spark.kernels.truss import edge_support
    from tests.fixtures_graphs import web64

    g = graph_from_edges(spark, web64())
    for df in (
        shared_tool_affinity(g),
        edge_support(g),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
    g.unpersist()


def test_hash_sample_pruning(spark, sf_dir):
    """hash_sample + projection: the scan reads only the projected columns
    (the md5 filter itself can't push to parquet, but pruning must hold)."""
    from linkgraph_spark.functions.sampling import hash_sample

    df = hash_sample(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), ["doc_id"], 0.5
    ).select("doc_id", "n_chars")
    plan = _plan(df)
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines
    schema = scan_lines[0].split("ReadSchema:")[1]
    assert "doc_id" in schema and "n_chars" in schema and "text" not in schema


def test_no_cartesian_or_row_python_in_r4_kernels(spark):
    """Round-4 kernels keep the house invariants: every join is an
    equi-join (no cross product / nested-loop fallback) and nothing drops
    to row-at-a-time Python (BatchEvalPython)."""
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.functions.text import repetition_stats, vocab_stats
    from linkgraph_spark.kernels import (
        closeness_landmarks,
        katz,
        maximal_independent_set,
    )
    from tests.fixtures_graphs import web64

    g = graph_from_edges(spark, web64())
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i}") for i in range(8)], "doc_id long, text string"
    )
    for df in (
        katz(g, iterations=2).scores,
        maximal_independent_set(g, max_iterations=2).labels,
        closeness_landmarks(g, landmarks=[0], k=2),
        vocab_stats(docs, top_n=5),
        repetition_stats(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
    g.unpersist()


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """weighted_hash_sample's selection must compile to
    TakeOrderedAndProject (per-partition top-n heaps), never a global
    Sort — the property that makes it safe on an unbounded corpus."""
    from linkgraph_spark.functions.sampling import weighted_hash_sample

    df = weighted_hash_sample(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        ["doc_id"],
        "n_chars",
        n=50,
    )
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    # no global sort stage anywhere in the selection
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", ""), plan


def test_term_pmi_broadcasts_vocab_and_no_cartesian(spark, sf_dir):
    """term_pmi's df-banded vocabulary is broadcast back onto the token
    explode (never shuffled), and the pair join is a doc_id equi-join."""
    from linkgraph_spark.functions.text import term_pmi

    df = term_pmi(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_wave7_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-6/7 operators stay JVM-side (no per-row Python eval) and never
    fall back to a cross product."""
    from linkgraph_spark.functions.events import (
        markov_transitions,
        session_lm_score,
        user_features,
    )
    from linkgraph_spark.functions.dedup import prefix_dup_pairs
    from linkgraph_spark.functions.similarity import embedding_outliers
    from linkgraph_spark.functions.text import char_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for df in (
        markov_transitions(ev),
        session_lm_score(ev),
        user_features(ev),
        prefix_dup_pairs(docs),
        embedding_outliers(embs),
        char_entropy(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_wave14_15_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-14/15 operators stay JVM-side and never cross-product. The one
    intended cross join (blocklist total-count attach, matryoshka/cosine
    query broadcast) must be a BroadcastNestedLoopJoin over a 1-row/tiny
    side, never CartesianProduct."""
    from linkgraph_spark.functions.curation import blocklist_audit
    from linkgraph_spark.functions.dedup import minhash_band_sweep
    from linkgraph_spark.functions.events import ab_test
    from linkgraph_spark.functions.similarity import matryoshka_audit, mutual_knn
    from linkgraph_spark.functions.text import top_bigrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from linkgraph_spark.functions.dedup import _band_sweep_frame, _with_shingle_hashes

    for df in (
        mutual_knn(embs, k=3),
        top_bigrams(docs, top_n=10),
        blocklist_audit(docs),
        ab_test(ev),
        matryoshka_audit(embs, n_queries=5, k=3, dims=8),
        # the sweep's SHIPPED lazy plan (its public wrapper returns a
        # localCheckpoint whose executed plan is just Scan ExistingRDD)
        _band_sweep_frame(_with_shingle_hashes(docs), 0.5, ((4, 4),)),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_mutual_knn_joins_on_bucket(spark, sf_dir):
    """mutual_knn's candidate generation must be an equi-join on the LSH
    bucket id — the scan never feeds an all-pairs join."""
    from linkgraph_spark.functions.similarity import mutual_knn

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(mutual_knn(embs, k=3))
    assert "bucket" in plan
    assert "CartesianProduct" not in plan
    # the per-vector top-k window partitions by query, not a constant
    assert "row_number" in plan


def test_shuffle_order_window_is_per_partition(spark, sf_dir):
    """shuffle_order's SHIPPED rank plan must window by the physical
    partition id (bounded groups — never Exchange SinglePartition), sort
    the corpus exactly ONCE, and attach offsets via a broadcast join."""
    from linkgraph_spark.functions.sampling import (
        _shuffle_order_keyed,
        _shuffle_order_ranked,
        shuffle_order,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = _shuffle_order_keyed(docs, "s1", 4, "doc_id")
    off = spark.createDataFrame([(i, 0) for i in range(4)], "_pid int, _off long")
    plan = _plan(_shuffle_order_ranked(d, off, 4))
    assert "Window" in plan, plan
    # a single global window would need Exchange SinglePartition
    assert "SinglePartition" not in plan, plan
    # exactly one sort of the data (inside the window) — the r5 review
    # caught a redundant sortWithinPartitions that doubled the sort cost
    assert plan.count("+- Sort ") == 1, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # and the public wrapper still yields a dense permutation
    n = docs.count()
    ranks = [r.shuffle_rank for r in shuffle_order(docs, salt="s1", partitions=4).collect()]
    assert sorted(ranks) == list(range(1, n + 1))


def test_wave22_26_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-22..26 operators stay JVM-side; the only cross joins are tiny
    broadcast sides (centroid/budget/base tables), never CartesianProduct."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.functions.curation import integrity_audit
    from linkgraph_spark.functions.dedup import shingle_containment
    from linkgraph_spark.functions.sampling import temperature_mixture
    from linkgraph_spark.functions.similarity import (
        centroid_purity,
        ivf_recall,
        rp_distortion,
    )
    from linkgraph_spark.functions.text import vocab_growth
    from linkgraph_spark.kernels import walk_counts
    from linkgraph_spark.kernels.stats import motif_significance
    from linkgraph_spark.transcripts import transcripts_from_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    g = build_graph(transcripts_from_events(spark, sf_dir))
    for df in (
        walk_counts(g, n_hubs=5),
        rp_distortion(embs, k=4),
        integrity_audit(docs, ev, embs),
        shingle_containment(docs, threshold=0.8),
        temperature_mixture(docs, ["doc_id"], "lang", total_n=50),
        vocab_growth(docs),
        centroid_purity(embs),
        ivf_recall(embs, n_queries=5, k=3),
        motif_significance(g),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_shingle_containment_candidates_are_equi_join(spark, sf_dir):
    """Containment candidates come from the shared-shingle equi-join —
    the doc table never feeds an all-pairs comparison."""
    from linkgraph_spark.functions.dedup import shingle_containment

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(shingle_containment(docs, threshold=0.8))
    assert "CartesianProduct" not in plan
    # the verify join is keyed on doc ids; candidate join on the shingle
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") >= 2


def test_walk_counts_broadcasts_the_hub_frontier(spark, sf_dir):
    """The hub seed set (n_hubs rows) must reach the edge join as a
    broadcast, never shuffling the edge list against a 10-row side."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.kernels import walk_counts
    from linkgraph_spark.transcripts import transcripts_from_events

    g = build_graph(transcripts_from_events(spark, sf_dir))
    plan = _plan(walk_counts(g, n_hubs=10))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_wave29_33_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-29..33 operators stay JVM-side; the only cross joins are
    one-row broadcast stat frames, never CartesianProduct."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.functions.dedup import dup_cluster_sizes
    from linkgraph_spark.functions.events import benford_values, hourly_autocorr
    from linkgraph_spark.functions.similarity import (
        anisotropy,
        variance_participation,
    )
    from linkgraph_spark.functions.text import head_token_share, term_burstiness
    from linkgraph_spark.kernels.kcore import core_profile
    from linkgraph_spark.kernels.stats import (
        avg_neighbor_degree,
        directed_assortativity,
        friendship_paradox,
        hub_overlap,
        joint_degree_matrix,
    )
    from linkgraph_spark.transcripts import transcripts_from_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    g = build_graph(transcripts_from_events(spark, sf_dir))
    for df in (
        friendship_paradox(g),
        avg_neighbor_degree(g),
        anisotropy(embs),
        core_profile(g),
        term_burstiness(docs, top_n=10),
        hourly_autocorr(ev, lags=(1, 24)),
        joint_degree_matrix(g),
        benford_values(ev),
        variance_participation(embs),
        head_token_share(docs),
        directed_assortativity(g),
        hub_overlap(g, k=5),
        dup_cluster_sizes(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_diffusion_kernels_gather_shape(spark, sf_dir):
    """heat_kernel / hitting_probability supersteps are equi-join gathers
    (never cartesian, never row-Python) and term_burstiness' top-n
    compiles to TakeOrderedAndProject, not a global sort."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.functions.text import term_burstiness
    from linkgraph_spark.kernels.diffusion import heat_kernel, hitting_probability
    from linkgraph_spark.transcripts import transcripts_from_events

    g = build_graph(transcripts_from_events(spark, sf_dir))
    for df in (
        heat_kernel(g, t=1.0, terms=2).scores,
        hitting_probability(g, seeds=[0, 1], iterations=2).scores,
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(term_burstiness(docs, top_n=10))
    assert "TakeOrderedAndProject" in plan, plan


def test_hub_overlap_broadcasts_hub_list(spark, sf_dir):
    """The k-row hub frame must reach the edge filter as a broadcast —
    the edge list never shuffles against a 10-row side."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.kernels.stats import hub_overlap
    from linkgraph_spark.transcripts import transcripts_from_events

    g = build_graph(transcripts_from_events(spark, sf_dir))
    plan = _plan(hub_overlap(g, k=10))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_wave34_39_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-34..39 operators stay JVM-side; cross joins are one-row or
    k-row broadcast frames only."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.functions.events import (
        conversion_hazard,
        rfm_segments,
        trigram_paths,
    )
    from linkgraph_spark.functions.similarity import (
        knn_mrr,
        quality_vs_norm,
        quantize_recall,
    )
    from linkgraph_spark.functions.text import (
        source_term_divergence,
        token_fertility,
    )
    from linkgraph_spark.kernels.stats import flow_roles, strength_percentiles
    from linkgraph_spark.kernels.temporal import (
        edge_persistence,
        hub_trajectory,
        reciprocity_latency,
        window_edge_jaccard,
    )
    from linkgraph_spark.transcripts import (
        qa_length_corr,
        tool_chain_depth,
        transcripts_from_events,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = transcripts_from_events(spark, sf_dir)
    g = build_graph(t)
    gw = build_graph(t, weighted=True)
    for df in (
        window_edge_jaccard(g, t, 3600),
        reciprocity_latency(g, t),
        hub_trajectory(g, t, 3600, k=3),
        knn_mrr(embs, n_queries=3, k=3),
        token_fertility(docs),
        tool_chain_depth(t),
        conversion_hazard(ev),
        source_term_divergence(docs),
        rfm_segments(ev),
        trigram_paths(ev, top_n=5),
        qa_length_corr(t),
        quality_vs_norm(docs, embs),
        flow_roles(g),
        quantize_recall(embs, n_queries=3, k=3),
        edge_persistence(g, t, 3600),
        strength_percentiles(gw),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_trigram_paths_is_take_ordered(spark, sf_dir):
    """The trigram top-n compiles to TakeOrderedAndProject — no global
    sort of the path table materializes."""
    from linkgraph_spark.functions.events import trigram_paths

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _plan(trigram_paths(ev, top_n=5))
    assert "TakeOrderedAndProject" in plan, plan


def test_wave40_45_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-40..45 operators stay JVM-side; cross joins are tiny spine or
    one-row broadcast frames only."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.functions.events import (
        attribution_paths,
        dow_profile,
        entropy_rate,
        hourly_bursts,
        session_depth_curve,
        type_user_jaccard,
    )
    from linkgraph_spark.functions.similarity import (
        centroid_stability,
        knn_confusion,
    )
    from linkgraph_spark.functions.text import script_mix
    from linkgraph_spark.kernels.kmeans import elbow_curve
    from linkgraph_spark.kernels.modularity import degree_sweep
    from linkgraph_spark.kernels.paths import hub_distance
    from linkgraph_spark.kernels.triangles import barrat_clustering
    from linkgraph_spark.transcripts import (
        conv_arc,
        tool_jaccard,
        tool_latency,
        transcripts_from_events,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = transcripts_from_events(spark, sf_dir)
    g = build_graph(t)
    gw = build_graph(t, weighted=True)
    for df in (
        hub_distance(g, k=3, max_iterations=8),
        script_mix(docs),
        hourly_bursts(ev),
        attribution_paths(ev),
        centroid_stability(embs),
        degree_sweep(g, top_k=10),
        entropy_rate(ev),
        dow_profile(ev),
        tool_latency(t),
        knn_confusion(embs, n_queries=3, k=3),
        barrat_clustering(gw),
        session_depth_curve(ev, max_depth=5),
        conv_arc(t, n_bins=4),
        elbow_curve(embs, ks=(2,), iterations=2),
        type_user_jaccard(ev),
        tool_jaccard(t),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_wave48_50_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-48..50 operators stay JVM-side; the only nested-loop joins are
    one-row broadcast split/max frames (BroadcastNestedLoopJoin), never a
    CartesianProduct over data-sized inputs."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.functions.events import (
        active_days_hist,
        growth_accounting,
    )
    from linkgraph_spark.functions.similarity import knn_hubness, triplet_accuracy
    from linkgraph_spark.functions.text import char_trigrams, readability
    from linkgraph_spark.kernels.stats import burt_constraint
    from linkgraph_spark.kernels.temporal import pref_attach_test, triadic_closure
    from linkgraph_spark.transcripts import transcripts_from_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = transcripts_from_events(spark, sf_dir)
    g = build_graph(t)
    for df in (
        burt_constraint(g, max_degree=64),
        triadic_closure(g, t),
        growth_accounting(ev),
        readability(docs),
        char_trigrams(docs, top_n=10),
        knn_hubness(embs, k=4),
        pref_attach_test(g, t),
        triplet_accuracy(embs, n_buckets=16),
        active_days_hist(ev),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_wave51_52_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-51..52 operators stay JVM-side; nested-loop joins only on
    one-row broadcast frames."""
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.functions.dedup import dup_source_matrix
    from linkgraph_spark.functions.events import cohort_value, session_gap_dist
    from linkgraph_spark.functions.similarity import lsh_bucket_stats
    from linkgraph_spark.functions.text import source_length_drift
    from linkgraph_spark.kernels.truss import edge_ecc
    from linkgraph_spark.transcripts import transcripts_from_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    g = build_graph(transcripts_from_events(spark, sf_dir))
    for df in (
        edge_ecc(g),
        dup_source_matrix(docs, threshold=0.5),
        session_gap_dist(ev),
        cohort_value(ev),
        lsh_bucket_stats(embs),
        source_length_drift(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_wave53_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-53 operators stay JVM-side with no cartesian joins."""
    from linkgraph_spark.functions.dedup import dup_quality_gap
    from linkgraph_spark.functions.similarity import label_ch_index
    from linkgraph_spark.functions.text import source_boilerplate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for df in (
        source_boilerplate(docs, n=5),
        label_ch_index(embs),
        dup_quality_gap(docs, threshold=0.5),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_source_boilerplate_window_is_post_agg(spark, sf_dir):
    """The top-1 window must sit over the (source, gram) AGGREGATE, not
    raw exploded rows — the agg bounds window input by distinct grams."""
    from linkgraph_spark.functions.text import source_boilerplate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(source_boilerplate(docs, n=5))
    w = plan.find("Window")
    assert w != -1
    # an aggregate must appear in the subtree feeding the window
    assert "HashAggregate" in plan[w:] or "SortAggregate" in plan[w:], plan


def test_wave54_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-54 operators stay JVM-side; the only nested-loop join allowed
    is davies_bouldin's one-row scalar combine."""
    from linkgraph_spark.functions.curation import curation_funnel
    from linkgraph_spark.functions.similarity import davies_bouldin
    from linkgraph_spark.functions.text import vocab_richness

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for df in (
        vocab_richness(docs),
        curation_funnel(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan
    plan = _plan(davies_bouldin(embs))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_davies_bouldin_centroid_join_is_broadcast(spark, sf_dir):
    """The per-member distance join must broadcast the tiny (label, dim)
    centroid table, never shuffle the cell explosion."""
    from linkgraph_spark.functions.similarity import davies_bouldin

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(davies_bouldin(embs))
    assert "BroadcastHashJoin" in plan, plan


def test_wave55_no_row_python(spark, sf_dir):
    """Wave-55 operators stay JVM-side. intrinsic_dim / pair_cosine_hist
    intentionally use a broadcast nested-loop probe join (bounded sample
    side), so only Python-eval and unbounded CartesianProduct are banned."""
    from linkgraph_spark.functions.events import time_split_audit
    from linkgraph_spark.functions.similarity import intrinsic_dim, pair_cosine_hist

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for df in (
        intrinsic_dim(embs, n_queries=8),
        pair_cosine_hist(embs, n_sample=16),
        time_split_audit(ev),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_intrinsic_dim_probe_side_is_broadcast(spark, sf_dir):
    """The probe sample must broadcast (TakeOrdered-bounded), so the corpus
    is scanned once and never shuffled by the probe join."""
    from linkgraph_spark.functions.similarity import intrinsic_dim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(intrinsic_dim(embs, n_queries=8))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "TakeOrdered" in plan, plan


def test_wave56_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-56 operators stay JVM-side; ngram_coverage's k-expansion join
    is a bounded broadcast (<= max(ks) rows on the build side)."""
    import __spark_entry__ as e
    from linkgraph_spark.functions.events import ab_test_srm
    from linkgraph_spark.functions.text import ngram_coverage

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (
        ab_test_srm(ev),
        e.queries()["component_profile"](spark, sf_dir),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan
    plan = _plan(ngram_coverage(docs))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_ngram_coverage_head_is_take_ordered(spark, sf_dir):
    """The vocabulary head must compile to TakeOrdered (per-partition
    top-k + bounded merge), never a global sort of the vocabulary."""
    from linkgraph_spark.functions.text import ngram_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(ngram_coverage(docs))
    assert "TakeOrdered" in plan, plan


def test_wave57_no_row_python_or_cartesian(spark, sf_dir):
    """Wave-57 operators stay JVM-side with equi-joins only."""
    from linkgraph_spark.functions.dedup import dup_chain_audit
    from linkgraph_spark.functions.text import brevity_law
    from linkgraph_spark.kernels.truss import edge_dispersion_over_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "a long, b long"
    )
    for df in (
        edge_dispersion_over_pairs(pairs),
        brevity_law(docs),
        dup_chain_audit(docs, threshold=0.5),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_tpch_date_filters_push_to_scan(spark, sf_dir):
    """The Q1 shipdate cutoff must reach the parquet reader as a pushed
    filter — at 100 TB this is partition/row-group pruning, not a
    post-scan filter."""
    from linkgraph_spark.functions.relational import pricing_summary

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = _plan(pricing_summary(li))
    assert "PushedFilters: [" in plan, plan
    assert "LessThanOrEqual(l_shipdate" in plan, plan


def test_tpch_dimensions_broadcast(spark, sf_dir):
    """Q5's dimension chain (region->nation->customer, supplier) must
    broadcast; the only sort-merge/shuffle join allowed is the
    orders-lineitem fact join."""
    from linkgraph_spark.functions.relational import local_supplier_volume

    t = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
    plan = _plan(
        local_supplier_volume(
            t("region"), t("nation"), t("customer"),
            t("supplier"), t("orders"), t("lineitem"),
        )
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_wave58_no_row_python(spark, sf_dir):
    from linkgraph_spark.functions.relational import (
        returned_item_report,
        shipping_priority,
    )

    t = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
    for df in (
        shipping_priority(t("customer"), t("orders"), t("lineitem")),
        returned_item_report(t("customer"), t("orders"), t("lineitem"), t("nation")),
    ):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan
        assert "TakeOrdered" in plan, plan  # top-n never a global sort


def test_tpch_semi_and_anti_join_shapes(spark, sf_dir):
    """Q4 must plan a LeftSemi (EXISTS never widens rows); Q22 a LeftAnti;
    Q18's qualifier set must broadcast back against orders."""
    from linkgraph_spark.functions.relational import (
        idle_rich_customers,
        large_quantity_orders,
        late_shipment_priority,
    )

    t = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
    p4 = _plan(late_shipment_priority(t("orders"), t("lineitem")))
    assert "LeftSemi" in p4, p4
    p22 = _plan(idle_rich_customers(t("customer"), t("orders"), t("nation")))
    assert "LeftAnti" in p22, p22
    p18 = _plan(large_quantity_orders(t("customer"), t("orders"), t("lineitem")))
    assert "BroadcastHashJoin" in p18, p18
    for p in (p4, p22, p18):
        assert "CartesianProduct" not in p, p
        assert "BatchEvalPython" not in p, p


def test_tpch_predicate_shapes(spark, sf_dir):
    """Wave-60 plan audit. Q19's mixed disjunction must SPLIT: the
    derived quantity OR-bounds push to the lineitem scan and the
    brand/size disjunction to the part scan (at 100 TB this is the
    difference between scanning three brand/quantity slices and the whole
    fact table). Q15's global max must be a broadcast rejoin, never a
    window over the per-supplier aggregate; Q17's per-part average must
    broadcast back (decorrelated, no re-shuffle of the fact table)."""
    from linkgraph_spark.functions.relational import (
        disjunctive_brand_revenue,
        promo_revenue_by_month,
        small_quantity_revenue,
        top_suppliers,
    )

    t = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
    p14 = _plan(promo_revenue_by_month(t("lineitem"), t("part")))
    assert "GreaterThanOrEqual(l_shipdate" in p14, p14
    p15 = _plan(top_suppliers(t("supplier"), t("lineitem")))
    assert "Window" not in p15, p15
    p17 = _plan(small_quantity_revenue(t("lineitem"), t("part")))
    assert p17.count("BroadcastHashJoin") >= 2, p17
    p19 = _plan(disjunctive_brand_revenue(t("lineitem"), t("part")))
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in p19, p19  # fact side
    assert "EqualTo(p_brand" in p19, p19  # dimension side
    for p in (p14, p15, p17, p19):
        assert "SortMergeJoin" not in p, p
        assert "CartesianProduct" not in p, p
        assert "BatchEvalPython" not in p, p
        assert "ArrowEvalPython" not in p, p


def test_grouping_sets_and_pivot_shapes(spark, sf_dir):
    """Wave-61 plan audit. The rollup must plan ONE Expand feeding one
    aggregate (never a union of per-level scans); the explicit-values
    pivot must read the events scan once (no per-type scan fan-out);
    Q8's six-table join must stay all-broadcast on the dimension side."""
    from linkgraph_spark.functions.events import event_pivot_dow
    from linkgraph_spark.functions.relational import market_share, revenue_rollup

    t = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
    pr = _plan(revenue_rollup(t("orders"), t("customer"), t("nation")))
    assert "Expand" in pr, pr
    assert pr.count("Scan parquet") <= 2 * 3, pr  # 3 tables, node+detail listing
    pp = _plan(event_pivot_dow(t("events")))
    assert pp.count("Scan parquet") <= 2, pp  # ONE scan (node + detail listing)
    p8 = _plan(
        market_share(
            t("region"), t("nation"), t("customer"), t("supplier"),
            t("orders"), t("lineitem"),
        )
    )
    assert "SortMergeJoin" not in p8, p8
    for p in (pr, pp, p8):
        assert "CartesianProduct" not in p, p
        assert "BatchEvalPython" not in p, p
        assert "ArrowEvalPython" not in p, p


def test_temporal_join_shapes(spark, sf_dir):
    """Wave-62 plan audit. The as-of join must be ONE union + ONE
    running window (no join node at all — a join formulation would
    explode purchase x click pairs); the keyless interval join must
    plan an EQUI join on the time bin, never a cartesian or
    BroadcastNestedLoop over the raw range predicate."""
    from linkgraph_spark.functions.joins import (
        asof_purchase_click,
        interval_error_purchases,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pa = _plan(asof_purchase_click(events))
    assert "Window" in pa, pa
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                 "BroadcastNestedLoop"):
        assert node not in pa, pa
    pi = _plan(interval_error_purchases(events))
    assert ("SortMergeJoin" in pi) or ("BroadcastHashJoin" in pi) or (
        "ShuffledHashJoin" in pi
    ), pi
    assert "CartesianProduct" not in pi, pi
    assert "BroadcastNestedLoop" not in pi, pi
    for p in (pa, pi):
        assert "BatchEvalPython" not in p, p
        assert "ArrowEvalPython" not in p, p


def test_scd2_single_shuffle(spark, sf_dir):
    """Wave-63 plan audit: the collapse filter and the lead()/row_number()
    windows all partition by user_id, so the whole SCD2 build must cost
    ONE exchange; the rolling anomaly's window input must be the daily
    pre-aggregate, never raw events."""
    from linkgraph_spark.functions.events import (
        rolling_daily_anomaly,
        scd2_user_state,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = _plan(scd2_user_state(events))
    # formatted plans list each node once in the tree and once in details
    assert p.count("Exchange") <= 2, p
    pr = _plan(rolling_daily_anomaly(events))
    assert "HashAggregate" in pr, pr
    # toString prints top-down: the aggregate must be UPSTREAM of (printed
    # after) the window — i.e. the window reads the daily pre-aggregate
    assert pr.index("Window") < pr.index("HashAggregate"), pr
    for q in (p, pr):
        assert "BatchEvalPython" not in q, q
        assert "ArrowEvalPython" not in q, q
