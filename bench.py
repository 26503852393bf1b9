"""Benchmark harness — prints ONE JSON line the driver records as BENCH_r{N}.json.

Covers BASELINE.json's two target quantities:

- **iterations-to-1e-6-convergence wall time**: textbook PageRank run to
  convergence on the sf-derived events actor graph (the same pipeline the
  correctness gate checks).
- **edges-scattered/sec**: fixed-iteration textbook PageRank on a large
  deterministic synthetic transcript graph (SPARK_GRAFT_BENCH_CONVS convs,
  default 100k → ~480k-edge actor graph incl. a 5k-turn hub conversation)
  plus, when present, the prebuilt 20M-edge probe — where superstep compute
  dominates fixed overhead.

Every per-query number is the MEDIAN OF 3 back-to-back runs (min/max spread
in BENCH/bench_detail.json, written each run — the printed line itself stays
small enough for the driver's tail capture): this VM's host-sharing shows 3-4x run-to-run
bandwidth noise (BENCH/BASELINE.md), so single-shot per-query deltas between
rounds are not attributable. SPARK_GRAFT_BENCH_REPS=1 for a quick pass.

Scaling efficiency (N vs 4N) is evidenced separately by
tools/scaling_run.py → BENCH/BASELINE.md (ladder of local[N] JVMs over
byte-identical prebuilt input).

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linkgraph_spark.edges import build_graph
from linkgraph_spark.kernels import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from linkgraph_spark.session import get_spark
from linkgraph_spark.transcripts import synthesize_transcripts, transcripts_from_events

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def timed(fn, cleanup=None, reps=REPS, warmup=0):
    """Run ``fn`` ``warmup`` discarded times then ``reps`` timed times
    back-to-back; return (last_output, {median,min,max}).

    ``cleanup(prev)`` frees the previous rep's artifact (persisted graphs)
    and runs BEFORE the next rep's timer starts, so each measured rep is
    independent — rep N+1 is not timed while rep N's blocks still occupy
    the block manager. ``warmup=1`` on the first query of a session
    absorbs one-time JVM/codegen/shuffle-service startup that otherwise
    pollutes the spread the medians exist to control."""
    out, ts = None, []
    for i in range(warmup + reps):
        if out is not None and cleanup is not None:
            cleanup(out)
            out = None
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        if i >= warmup:
            ts.append(dt)
    s = sorted(ts)
    return out, {
        "median": round(s[len(s) // 2], 3),
        "min": round(s[0], 3),
        "max": round(s[-1], 3),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(
        app_name="linkgraph_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    q: dict[str, dict] = {}

    # ---- sf-derived events graph: the full checked pipeline ----------------
    g_sf, q["etl_events_graph"] = timed(
        lambda: build_graph(transcripts_from_events(spark, sf_dir)),
        cleanup=lambda g: g.unpersist(),
        warmup=1,  # first Spark jobs of the process: JVM/codegen startup
    )
    _, q["pagerank_compat3_sf"] = timed(lambda: pagerank(g_sf, mode="compat").ranks.count())
    res_sf, q["pagerank_textbook_converge_sf"] = timed(lambda: pagerank(g_sf, mode="textbook"))
    _, q["components_sf"] = timed(
        lambda: connected_components(g_sf).labels.select("component").distinct().count()
    )
    _, q["labelprop3_sf"] = timed(lambda: label_propagation(g_sf, max_iterations=3).count())
    _, q["triangles_sf"] = timed(lambda: triangle_count(g_sf))
    from linkgraph_spark.kernels import adamic_adar, hits, shortest_paths

    _, q["hits5_sf"] = timed(lambda: hits(g_sf, iterations=5).scores.count())
    from linkgraph_spark.kernels import katz

    # the no-divisor gather: strictly lighter than a PageRank superstep
    _, q["katz5_sf"] = timed(lambda: katz(g_sf, iterations=5).scores.count())
    from linkgraph_spark.kernels import salsa

    # heaviest r5 kernel: two degree-normalized gathers per iteration
    _, q["salsa5_sf"] = timed(lambda: salsa(g_sf, iterations=5).scores.count())
    _, q["bfs_undirected_sf"] = timed(
        lambda: shortest_paths(g_sf, sources=[0], directed=False).distances.count()
    )
    # capped = the shipped at-scale config (gate runs the same caps); the
    # uncapped wedge enumeration is a small-graph oracle, not a benchmark
    _, q["adamic_adar_sf"] = timed(
        lambda: adamic_adar(g_sf, max_degree=32, top_k=10).count()
    )
    from linkgraph_spark.kernels import hyperball, k_truss, maximal_independent_set

    # symmetry-breaking family representative (MIS/coloring/matching share
    # the shrinking-frontier round shape; rounds are overhead-bound at sf)
    _, q["mis_sf"] = timed(
        lambda: maximal_independent_set(g_sf, max_iterations=8).labels.count()
    )

    # sketch-superstep workload class: HLL union gather per round
    _, q["hyperball6_sf"] = timed(
        lambda: hyperball(g_sf, max_r=6).centrality.count()
    )
    _, q["k_truss3_sf"] = timed(lambda: k_truss(g_sf, k=3).edges.count())
    from linkgraph_spark.kernels import node2vec_walks, temporal_edges, temporal_reachability

    # second-order walk corpus (hub-capped) + temporal relaxation sweep
    _, q["node2vec4_sf"] = timed(
        lambda: node2vec_walks(g_sf, walk_length=4, max_degree=64).count()
    )
    t_sf = transcripts_from_events(spark, sf_dir)
    te_sf = temporal_edges(g_sf, t_sf)
    _, q["temporal_reach_sf"] = timed(
        lambda: temporal_reachability(
            g_sf, te_sf, sources=list(range(50))
        ).arrivals.count()
    )
    from linkgraph_spark.kernels import attack_resilience

    # robustness-probe workload: top-k selection + induced subgraph +
    # one full hash-min component sweep (the CC-bound family)
    _, q["resilience_sf"] = timed(
        lambda: attack_resilience(g_sf, k=8).collect()
    )
    from linkgraph_spark.kernels import ppr_sweep, simrank

    # squared-wedge pair iteration (SimRank superstep family)
    _, q["simrank2_sf"] = timed(lambda: simrank(g_sf, iterations=2).count())
    # local-community composition: 5-iter PPR + one-edge-pass sweep cut
    _, q["ppr_sweep_sf"] = timed(
        lambda: ppr_sweep(g_sf, seeds=[0], iterations=5, top_k=50).count()
    )
    from linkgraph_spark.kernels import fiedler_sweep

    # spectral partitioning: 8 lazy-walk supersteps + the same sweep tail
    _, q["fiedler_sweep_sf"] = timed(
        lambda: fiedler_sweep(g_sf, iterations=8, top_k=50).count()
    )
    from linkgraph_spark.kernels import walk_counts

    # 3-hop walk-count fan-out from the top-10 hubs (broadcast frontier)
    _, q["walk_counts_sf"] = timed(lambda: walk_counts(g_sf, n_hubs=10).count())
    from linkgraph_spark.kernels.diffusion import heat_kernel

    # Poisson-weighted diffusion: 8 invariant-frame gather supersteps
    _, q["heat_kernel8_sf"] = timed(
        lambda: heat_kernel(g_sf, t=2.0, terms=8).scores.count()
    )
    from linkgraph_spark.kernels.graphlets import graphlet_census4

    # session-3 kernel representatives: the full 4-graphlet census (wedge
    # self-join + oriented K4 enumeration — the heaviest counting pass)
    _, q["graphlet_census4_sf"] = timed(
        lambda: graphlet_census4(g_sf).collect()
    )
    from linkgraph_spark.kernels.kcore import onion_decomposition

    # the true peel (degree recount per layer — rounds land in detail)
    onion_res, q["onion_sf"] = timed(lambda: onion_decomposition(g_sf))
    from linkgraph_spark.kernels.spectral import leaderrank

    # ground-node walk: 10 gather supersteps with observe-fused scalars
    _, q["leaderrank10_sf"] = timed(
        lambda: leaderrank(g_sf, iterations=10).scores.count()
    )
    from linkgraph_spark.kernels.cpm import clique_percolation3

    # triangle-community percolation: enumeration + incidence hash-min
    _, q["cpm3_sf"] = timed(
        lambda: clique_percolation3(g_sf).memberships.count()
    )
    n_edges_sf = g_sf.edges.count()
    g_sf.unpersist()

    # ---- pipeline ops at sf ------------------------------------------------
    from linkgraph_spark.functions.dedup import minhash_lsh_dups, simhash
    from linkgraph_spark.functions.similarity import cosine_topk, lsh_knn

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, q["minhash_lsh_dups"] = timed(lambda: minhash_lsh_dups(docs).count())
    _, q["simhash"] = timed(lambda: simhash(docs).count())
    _, q["cosine_topk"] = timed(lambda: cosine_topk(embs).count())
    _, q["lsh_knn"] = timed(lambda: lsh_knn(embs).count())
    from linkgraph_spark.kernels.kmeans import kmeans

    # trained-codebook workload: 4 Lloyd jobs + final broadcast assign
    _, q["kmeans8_sf"] = timed(lambda: kmeans(embs, k=8, iterations=4).count())
    from linkgraph_spark.kernels.kmeans import pq_codes

    # PQ training: two Lloyd chains on sliced halves (the ANN-index build)
    _, q["pq_codes_sf"] = timed(lambda: pq_codes(embs, subvectors=2, k=8, iterations=2).count())
    from linkgraph_spark.functions.similarity import lsh_recall

    # ANN evaluation composition: brute-force sample + bucket join + compare
    _, q["lsh_recall_sf"] = timed(lambda: lsh_recall(embs).count())
    from linkgraph_spark.functions.dedup import source_overlap
    from linkgraph_spark.functions.text import bpe_merges

    # per-shingle source fan-out join (bounded by |sources|^2)
    _, q["source_overlap_sf"] = timed(lambda: source_overlap(docs).count())
    # iterative argmax loop over the word-type table (8 TakeOrdered rounds)
    _, q["bpe_merges8_sf"] = timed(lambda: bpe_merges(docs, merges=8).count())
    from linkgraph_spark.functions.dedup import minhash_band_sweep
    from linkgraph_spark.functions.similarity import mutual_knn

    # every-vector LSH kNN + mutuality self-join (graph construction pass)
    _, q["mutual_knn_sf"] = timed(lambda: mutual_knn(embs, k=4).count())
    # 3 banding configs over one shingle table (LSH tuning pass)
    _, q["band_sweep_sf"] = timed(lambda: minhash_band_sweep(docs).count())
    from linkgraph_spark.functions.similarity import dbscan

    # density clustering: LSH pair gen + density count + core-graph CC loop
    _, q["dbscan_sf"] = timed(lambda: dbscan(embs, threshold=0.35, min_pts=3).count())
    from linkgraph_spark.kernels import kcenter

    # coreset selection: 8 literal-codebook projection rounds + argmax
    _, q["kcenter8_sf"] = timed(lambda: kcenter(embs, k=8).count())
    from linkgraph_spark.functions.dedup import shingle_containment

    # directed containment: shared-shingle equi-join + O(cand) verify
    _, q["containment_sf"] = timed(
        lambda: shingle_containment(docs, threshold=0.8).count()
    )
    from linkgraph_spark.functions.relational import (
        local_supplier_volume,
        pricing_summary,
    )

    # warehouse family representatives: pushed-filter scan-agg (Q1) and the
    # broadcast star join (Q5) over the TPC-H-shaped tables
    tbl = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
    _, q["tpch_q1_sf"] = timed(lambda: pricing_summary(tbl("lineitem")).count())
    _, q["tpch_q5_sf"] = timed(
        lambda: local_supplier_volume(
            tbl("region"), tbl("nation"), tbl("customer"),
            tbl("supplier"), tbl("orders"), tbl("lineitem"),
        ).count()
    )
    from linkgraph_spark.functions.events import session_windows
    from linkgraph_spark.functions.joins import asof_purchase_click

    # temporal-join family representatives: the as-of union-window and the
    # native session-window aggregate over the events stream
    _, q["asof_sf"] = timed(
        lambda: asof_purchase_click(tbl("events")).count()
    )
    _, q["sessions_sf"] = timed(lambda: session_windows(tbl("events")).count())

    from linkgraph_spark.functions.joins import nearest_click_purchase
    from linkgraph_spark.functions.sketches import heavy_hitter_terms

    # round-5 late-wave representatives: the Misra-Gries two-phase sketch
    # (Arrow mapInPandas candidates + exact verify) over the full token
    # stream, and the bidirectional nearest join (two RANGE window picks
    # on one shuffle)
    _, q["heavy_hitters_sf"] = timed(
        lambda: heavy_hitter_terms(docs, k=30).count()
    )
    _, q["nearest_sf"] = timed(
        lambda: nearest_click_purchase(tbl("events")).count()
    )

    # ---- large synthetic transcript graph: the throughput workload ---------
    t_large = synthesize_transcripts(
        spark, n_convs=bench_convs, min_turns=4, max_turns=40, hub_turns=5000
    )
    g_big, q["etl_big_graph"] = timed(
        lambda: build_graph(t_large), cleanup=lambda g: g.unpersist()
    )
    n_edges = g_big.edges.count()

    res_big, q["pagerank_textbook10_big"] = timed(
        lambda: pagerank(g_big, mode="textbook", iterations=10)
    )
    pr_wall = q["pagerank_textbook10_big"]["median"]
    eps = n_edges * res_big.iterations / pr_wall if pr_wall > 0 else 0.0
    _, q["components_big"] = timed(
        lambda: connected_components(g_big).labels.select("component").distinct().count()
    )

    # ---- symmetry-breaking / peel kernel family on the big graph -----------
    # (all claim geometrically shrinking frontiers — the per-round metrics
    # land in bench_detail.json as the evidence)
    from linkgraph_spark.kernels import (
        densest_subgraph,
        greedy_coloring,
        maximal_matching,
        temporal_components,
        temporal_edges,
    )

    col_res, q["coloring_big"] = timed(lambda: greedy_coloring(g_big))
    mat_res, q["matching_big"] = timed(lambda: maximal_matching(g_big))
    den_res, q["densest_big"] = timed(lambda: densest_subgraph(g_big))
    te_big = temporal_edges(g_big, t_large)
    _, q["temporal_components_big"] = timed(
        lambda: temporal_components(g_big, te_big).count()
    )
    # Borůvka MSF on the big graph: deterministic hash weights (the big
    # ETL builds the unweighted graph; MSF only needs SOME total order)
    from dataclasses import replace as _dc_replace

    from pyspark.sql import functions as F

    from linkgraph_spark.kernels import boruvka_msf

    g_big_w = _dc_replace(
        g_big,
        edges=g_big.edges.withColumn(
            "weight", ((F.col("src") * 7 + F.col("dst") * 13) % 97) / F.lit(10.0)
        ),
    )
    msf_res, q["msf_big"] = timed(lambda: boruvka_msf(g_big_w))
    kernel_rounds = {
        "onion_sf_peeled": [m["peeled"] for m in onion_res.metrics],
        "coloring_big_uncolored": [m["uncolored"] for m in col_res.metrics],
        "matching_big_live_edges": [m["live_edges"] for m in mat_res.metrics],
        "densest_big_survivors": [m["n"] for m in den_res.metrics],
        "msf_big_live_edges": [m["live_edges"] for m in msf_res.metrics],
    }
    g_big.unpersist()  # free cached blocks before the probe measurement
    # the kernel reps above each leave a RotatingState's FINAL checkpoint
    # alive (by contract it belongs to the caller — here it's discarded);
    # drop every leftover persistent RDD so the streaming and probe
    # measurements below run against a clean block manager
    _sc = spark.sparkContext
    _it = _sc._jsc.sc().getPersistentRDDs().iterator()
    while _it.hasNext():
        _sc._jsc.sc().unpersistRDD(_it.next()._1(), False)

    # ---- streaming ingest: stateful adjacent-edge extraction ---------------
    # N micro-batches of append-only transcript files through the
    # applyInPandasWithState operator; state is O(active conversations)
    stream_stats = _streaming_bench(spark, q)

    # ---- prebuilt 20M-edge probe graph (if present): throughput headline ---
    probe_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_graph_edges"
    )
    if os.path.isdir(probe_path):
        from pyspark.sql import functions as F

        from linkgraph_spark.edges import LinkGraph, vertex_degrees

        pe = spark.read.parquet(probe_path).persist()
        pv = (
            pe.select(F.col("src").alias("id"))
            .unionByName(pe.select(F.col("dst").alias("id")))
            .distinct()
            .withColumn("actor_key", F.col("id").cast("string"))
            .persist()
        )
        pd_ = vertex_degrees(pv, pe).persist()
        npv = pv.count()
        npe = pe.count()
        pd_.count()
        gp = LinkGraph(vertices=pv, edges=pe, degrees=pd_, num_vertices=npv)
        res_p, q["pagerank_probe20m_5it"] = timed(
            lambda: pagerank(gp, mode="textbook", iterations=5)
        )
        eps = npe * res_p.iterations / q["pagerank_probe20m_5it"]["median"]
        # same probe through the Arrow-vectorized CSR gather: measures the
        # block-reuse path against the builtin hash aggregate at a scale
        # where its setup cost can amortize
        _, q["pagerank_probe20m_csr"] = timed(
            lambda: pagerank(gp, mode="textbook", iterations=5, gather_mode="csr")
        )
        gp.unpersist()

    # The printed line stays SLIM (medians + headline numbers only): the
    # driver's tail-capture buffer truncated the r3 line once per-query
    # spread rode along, leaving BENCH_r03.json unparseable. Everything
    # beyond the headline goes to BENCH/bench_detail.json instead.
    detail = {
        "bench_reps": REPS,
        "query_spread": {k: {"min": v["min"], "max": v["max"]} for k, v in q.items()},
        "sf_graph_edges": n_edges_sf,
        "sf_iterations_to_1e-6": res_sf.iterations,
        "sf_converged": res_sf.converged,
        "big_graph_vertices": g_big.num_vertices,
        "big_graph_edges": n_edges,
        "kernel_rounds": kernel_rounds,
        "streaming": stream_stats,
        "cpus": cpus,
        "bench_convs": bench_convs,
        "scaling": _scaling_evidence(),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "BENCH", "bench_detail.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        detail_path = None
    out = {
        "metric": "pagerank_textbook_convergence_wall_sec",
        "value": q["pagerank_textbook_converge_sf"]["median"],
        "unit": "sec",
        "queries": {k: v["median"] for k, v in q.items()},
        "sf": sf,
        "edges_scattered_per_sec": round(eps, 1),
        "sf_iterations_to_1e-6": res_sf.iterations,
        # both the in-cache linear-region pair (2→8, the ≥0.8 evidence) and
        # the documented host-bound pair (8→32) — full story in
        # BENCH/BASELINE.md
        "scaling_eff_2_to_8": detail["scaling"].get("eff_2_to_8"),
        "scaling_eff_8_to_32": detail["scaling"].get("eff_8_to_32"),
        "detail_file": detail_path,
    }
    print(json.dumps(out))


def _streaming_bench(spark, q):
    """Drive the streaming path (round-3 carry-over item): N append-only
    transcript parquet files → micro-batches through the stateful
    ``stream_adjacent_edges`` operator and the ``incremental_degrees``
    foreachBatch merge. Adds two wall rows to ``q`` and returns
    rows/sec + state-size stats for bench_detail.json.

    Single-shot (reps=1): each wall already spans ``n_files``
    micro-batches, which self-averages the scheduler noise the per-query
    medians exist to absorb."""
    import shutil
    import tempfile

    from linkgraph_spark.streaming import (
        incremental_degrees,
        read_transcript_stream,
        stream_adjacent_edges,
    )

    # default sized so the 8-batch run stays ~1 min of the bench wall: the
    # stateful operator's cost is per-GROUP (conversation), not per-turn —
    # see SCALE.md "Streaming ingest" for the measured shape
    n_convs = int(os.environ.get("SPARK_GRAFT_STREAM_CONVS", "5000"))
    n_files = 8
    root = tempfile.mkdtemp(prefix="lg_stream_bench_")
    t_in = synthesize_transcripts(spark, n_convs=n_convs, min_turns=4, max_turns=40)
    n_turns = t_in.count()
    t_in.repartition(n_files).write.mode("overwrite").parquet(f"{root}/in")

    progress: dict = {}

    def run_adjacent():
        ck = tempfile.mkdtemp(prefix="ck_adj_", dir=root)
        stream = read_transcript_stream(spark, f"{root}/in", max_files_per_trigger=1)
        qy = (
            stream_adjacent_edges(stream)
            .writeStream.foreachBatch(lambda df, bid: df.count())
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
        stateful = [p for p in qy.recentProgress if p.get("stateOperators")]
        if stateful:
            progress["adjacent_state_rows"] = stateful[-1]["stateOperators"][0][
                "numRowsTotal"
            ]
            progress["adjacent_batches"] = len(stateful)
        return qy

    _, q["stream_adjacent_ingest"] = timed(run_adjacent, reps=1)

    def run_degree_merge():
        ck = tempfile.mkdtemp(prefix="ck_deg_", dir=root)
        state = tempfile.mkdtemp(prefix="state_deg_", dir=root)
        qy = incremental_degrees(
            read_transcript_stream(spark, f"{root}/in", max_files_per_trigger=1),
            state,
            ck,
        )
        qy.awaitTermination()
        return qy

    _, q["stream_degree_merge"] = timed(run_degree_merge, reps=1)
    stats = {
        "stream_convs": n_convs,
        "stream_turns": n_turns,
        "micro_batches": n_files,
        "adjacent_turns_per_sec": round(
            n_turns / q["stream_adjacent_ingest"]["median"], 1
        ),
        "degree_merge_turns_per_sec": round(
            n_turns / q["stream_degree_merge"]["median"], 1
        ),
        **progress,
    }
    shutil.rmtree(root, ignore_errors=True)
    return stats


def _scaling_evidence():
    """Summarize the separately measured N-vs-4N evidence (tools/
    scaling_run.py + tools/bandwidth_probe.py, full writeup in
    BENCH/BASELINE.md) so the per-round bench JSON carries the
    scaling-efficiency numbers the BASELINE metric names."""
    here = os.path.dirname(os.path.abspath(__file__))
    evidence = {}
    try:
        ladder = {}
        with open(os.path.join(here, "BENCH", "scaling_results.jsonl")) as fh:
            for line in fh:
                r = json.loads(line)
                ladder[r["cpus"]] = r["steady_edges_scattered_per_sec"]
        def eff(a, b):
            return round((ladder[b] / ladder[a]) / (b / a), 3)
        evidence["ladder_steady_eps"] = ladder
        evidence["eff_1_to_4"] = eff(1, 4)
        evidence["eff_2_to_8"] = eff(2, 8)
        evidence["eff_8_to_32"] = eff(8, 32)
    except Exception:
        pass
    for fname, key in (
        ("scaling_r2.jsonl", "fresh_pairs_eff_8_to_32"),
        ("scaling_r3.jsonl", "r3_fresh_pairs_eff_8_to_32"),
        ("scaling_r4.jsonl", "r4_fresh_pairs_eff"),
        ("scaling_r5.jsonl", "r5_fresh_pairs_eff"),
    ):
        try:
            pairs = {}
            with open(os.path.join(here, "BENCH", fname)) as fh:
                for line in fh:
                    r = json.loads(line)
                    pairs.setdefault(r.get("run"), {})[r["cpus"]] = r[
                        "steady_edges_scattered_per_sec"
                    ]
            out = {}
            for run, v in pairs.items():
                if len(v) == 2:  # each run is one same-session N-vs-kN pair
                    a, b = sorted(v)
                    out[f"{run}_{a}_to_{b}"] = round((v[b] / v[a]) / (b / a), 3)
            evidence[key] = out
        except Exception:
            pass
    return evidence


if __name__ == "__main__":
    main()
