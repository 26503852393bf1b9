"""Extra benchmarks for optimization work (guide §1.4): run a SUBSET of the
frozen bench.py queries by name, with the same data/session setup, so a
single heavy query can be isolated and re-measured quickly.

Usage:
    python bench_extra.py graphlet_census4_sf cpm3_sf
    SPARK_GRAFT_BENCH_REPS=1 python bench_extra.py stream_adjacent_ingest

Prints one JSON line {"queries": {...}} with median/min/max per query.
bench.py itself stays frozen — this file exists so optimization evidence
(OPTIMIZATION_r06.md) can cite per-query numbers without 12-minute runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linkgraph_spark.edges import build_graph
from linkgraph_spark.session import get_spark
from linkgraph_spark.transcripts import synthesize_transcripts, transcripts_from_events

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def timed(fn, cleanup=None, reps=REPS, warmup=0):
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


def main(names):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
    spark = get_spark(
        app_name="linkgraph_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    q: dict[str, dict] = {}
    names = set(names)

    def want(*ns):
        return bool(names & set(ns))

    need_sf_graph = want(
        "etl_events_graph", "pagerank_compat3_sf", "pagerank_textbook_converge_sf",
        "components_sf", "labelprop3_sf", "triangles_sf", "hits5_sf", "katz5_sf",
        "salsa5_sf", "bfs_undirected_sf", "adamic_adar_sf", "mis_sf",
        "hyperball6_sf", "k_truss3_sf", "node2vec4_sf", "temporal_reach_sf",
        "resilience_sf", "simrank2_sf", "ppr_sweep_sf", "fiedler_sweep_sf",
        "walk_counts_sf", "heat_kernel8_sf", "graphlet_census4_sf", "onion_sf",
        "leaderrank10_sf", "cpm3_sf",
    )
    g_sf = None
    if need_sf_graph:
        spark.sparkContext.setJobDescription("etl_events_graph")
        if "etl_events_graph" in names:
            g_sf, q["etl_events_graph"] = timed(
                lambda: build_graph(transcripts_from_events(spark, sf_dir)),
                cleanup=lambda g: g.unpersist(),
                warmup=1,
            )
        else:
            g_sf = build_graph(transcripts_from_events(spark, sf_dir))

    from linkgraph_spark.kernels import (
        adamic_adar,
        attack_resilience,
        connected_components,
        fiedler_sweep,
        hits,
        hyperball,
        k_truss,
        katz,
        label_propagation,
        maximal_independent_set,
        node2vec_walks,
        pagerank,
        ppr_sweep,
        salsa,
        shortest_paths,
        simrank,
        temporal_edges,
        temporal_reachability,
        triangle_count,
        walk_counts,
    )

    runners = {
        "pagerank_compat3_sf": lambda: pagerank(g_sf, mode="compat").ranks.count(),
        "pagerank_textbook_converge_sf": lambda: pagerank(g_sf, mode="textbook"),
        "components_sf": lambda: connected_components(g_sf)
        .labels.select("component")
        .distinct()
        .count(),
        "labelprop3_sf": lambda: label_propagation(g_sf, max_iterations=3).count(),
        "triangles_sf": lambda: triangle_count(g_sf),
        "hits5_sf": lambda: hits(g_sf, iterations=5).scores.count(),
        "katz5_sf": lambda: katz(g_sf, iterations=5).scores.count(),
        "salsa5_sf": lambda: salsa(g_sf, iterations=5).scores.count(),
        "bfs_undirected_sf": lambda: shortest_paths(
            g_sf, sources=[0], directed=False
        ).distances.count(),
        "adamic_adar_sf": lambda: adamic_adar(g_sf, max_degree=32, top_k=10).count(),
        "mis_sf": lambda: maximal_independent_set(g_sf, max_iterations=8).labels.count(),
        "hyperball6_sf": lambda: hyperball(g_sf, max_r=6).centrality.count(),
        "k_truss3_sf": lambda: k_truss(g_sf, k=3).edges.count(),
        "node2vec4_sf": lambda: node2vec_walks(
            g_sf, walk_length=4, max_degree=64
        ).count(),
        "resilience_sf": lambda: attack_resilience(g_sf, k=8).collect(),
        "simrank2_sf": lambda: simrank(g_sf, iterations=2).count(),
        "ppr_sweep_sf": lambda: ppr_sweep(
            g_sf, seeds=[0], iterations=5, top_k=50
        ).count(),
        "fiedler_sweep_sf": lambda: fiedler_sweep(
            g_sf, iterations=8, top_k=50
        ).count(),
        "walk_counts_sf": lambda: walk_counts(g_sf, n_hubs=10).count(),
    }

    if want("temporal_reach_sf"):
        t_sf = transcripts_from_events(spark, sf_dir)
        te_sf = temporal_edges(g_sf, t_sf)
        runners["temporal_reach_sf"] = lambda: temporal_reachability(
            g_sf, te_sf, sources=list(range(50))
        ).arrivals.count()

    from linkgraph_spark.kernels.cpm import clique_percolation3
    from linkgraph_spark.kernels.diffusion import heat_kernel
    from linkgraph_spark.kernels.graphlets import graphlet_census4
    from linkgraph_spark.kernels.kcore import onion_decomposition
    from linkgraph_spark.kernels.spectral import leaderrank

    runners.update(
        {
            "heat_kernel8_sf": lambda: heat_kernel(g_sf, t=2.0, terms=8).scores.count(),
            "graphlet_census4_sf": lambda: graphlet_census4(g_sf).collect(),
            "onion_sf": lambda: onion_decomposition(g_sf),
            "leaderrank10_sf": lambda: leaderrank(g_sf, iterations=10).scores.count(),
            "cpm3_sf": lambda: clique_percolation3(g_sf).memberships.count(),
        }
    )

    # ---- pipeline ops ------------------------------------------------------
    if want(
        "minhash_lsh_dups", "simhash", "cosine_topk", "lsh_knn", "kmeans8_sf",
        "pq_codes_sf", "lsh_recall_sf", "source_overlap_sf", "bpe_merges8_sf",
        "mutual_knn_sf", "band_sweep_sf", "dbscan_sf", "kcenter8_sf",
        "containment_sf", "heavy_hitters_sf",
    ):
        from linkgraph_spark.functions.dedup import (
            minhash_band_sweep,
            minhash_lsh_dups,
            shingle_containment,
            simhash,
            source_overlap,
        )
        from linkgraph_spark.functions.similarity import (
            cosine_topk,
            dbscan,
            lsh_knn,
            lsh_recall,
            mutual_knn,
        )
        from linkgraph_spark.functions.sketches import heavy_hitter_terms
        from linkgraph_spark.functions.text import bpe_merges
        from linkgraph_spark.kernels.kmeans import kmeans, pq_codes
        from linkgraph_spark.kernels import kcenter

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        runners.update(
            {
                "minhash_lsh_dups": lambda: minhash_lsh_dups(docs).count(),
                "simhash": lambda: simhash(docs).count(),
                "cosine_topk": lambda: cosine_topk(embs).count(),
                "lsh_knn": lambda: lsh_knn(embs).count(),
                "kmeans8_sf": lambda: kmeans(embs, k=8, iterations=4).count(),
                "pq_codes_sf": lambda: pq_codes(
                    embs, subvectors=2, k=8, iterations=2
                ).count(),
                "lsh_recall_sf": lambda: lsh_recall(embs).count(),
                "source_overlap_sf": lambda: source_overlap(docs).count(),
                "bpe_merges8_sf": lambda: bpe_merges(docs, merges=8).count(),
                "mutual_knn_sf": lambda: mutual_knn(embs, k=4).count(),
                "band_sweep_sf": lambda: minhash_band_sweep(docs).count(),
                "dbscan_sf": lambda: dbscan(embs, threshold=0.35, min_pts=3).count(),
                "kcenter8_sf": lambda: kcenter(embs, k=8).count(),
                "containment_sf": lambda: shingle_containment(
                    docs, threshold=0.8
                ).count(),
                "heavy_hitters_sf": lambda: heavy_hitter_terms(docs, k=30).count(),
            }
        )

    if want(
        "tpch_q1_sf", "tpch_q5_sf", "asof_sf", "sessions_sf", "nearest_sf"
    ):
        from linkgraph_spark.functions.events import session_windows
        from linkgraph_spark.functions.joins import (
            asof_purchase_click,
            nearest_click_purchase,
        )
        from linkgraph_spark.functions.relational import (
            local_supplier_volume,
            pricing_summary,
        )

        tbl = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
        runners.update(
            {
                "tpch_q1_sf": lambda: pricing_summary(tbl("lineitem")).count(),
                "tpch_q5_sf": lambda: local_supplier_volume(
                    tbl("region"), tbl("nation"), tbl("customer"),
                    tbl("supplier"), tbl("orders"), tbl("lineitem"),
                ).count(),
                "asof_sf": lambda: asof_purchase_click(tbl("events")).count(),
                "sessions_sf": lambda: session_windows(tbl("events")).count(),
                "nearest_sf": lambda: nearest_click_purchase(tbl("events")).count(),
            }
        )

    # ---- big graph ---------------------------------------------------------
    big_names = {
        "etl_big_graph", "pagerank_textbook10_big", "components_big",
        "coloring_big", "matching_big", "densest_big",
        "temporal_components_big", "msf_big",
    }
    if names & big_names:
        from dataclasses import replace as _dc_replace

        from pyspark.sql import functions as F

        from linkgraph_spark.kernels import (
            boruvka_msf,
            densest_subgraph,
            greedy_coloring,
            maximal_matching,
            temporal_components,
        )

        t_large = synthesize_transcripts(
            spark, n_convs=bench_convs, min_turns=4, max_turns=40, hub_turns=5000
        )
        if "etl_big_graph" in names:
            g_big, q["etl_big_graph"] = timed(
                lambda: build_graph(t_large), cleanup=lambda g: g.unpersist()
            )
        else:
            g_big = build_graph(t_large)
        runners.update(
            {
                "pagerank_textbook10_big": lambda: pagerank(
                    g_big, mode="textbook", iterations=10
                ),
                "components_big": lambda: connected_components(g_big)
                .labels.select("component")
                .distinct()
                .count(),
                "coloring_big": lambda: greedy_coloring(g_big),
                "matching_big": lambda: maximal_matching(g_big),
                "densest_big": lambda: densest_subgraph(g_big),
            }
        )
        if "temporal_components_big" in names:
            te_big = temporal_edges(g_big, t_large)
            runners["temporal_components_big"] = lambda: temporal_components(
                g_big, te_big
            ).count()
        if "msf_big" in names:
            g_big_w = _dc_replace(
                g_big,
                edges=g_big.edges.withColumn(
                    "weight",
                    ((F.col("src") * 7 + F.col("dst") * 13) % 97) / F.lit(10.0),
                ),
            )
            runners["msf_big"] = lambda: boruvka_msf(g_big_w)

    # ---- streaming ---------------------------------------------------------
    if want("stream_adjacent_ingest", "stream_degree_merge"):
        import shutil
        import tempfile

        from linkgraph_spark.streaming import (
            incremental_degrees,
            read_transcript_stream,
            stream_adjacent_edges,
        )

        n_convs = int(os.environ.get("SPARK_GRAFT_STREAM_CONVS", "5000"))
        n_files = 8
        root = tempfile.mkdtemp(prefix="lg_stream_extra_")
        t_in = synthesize_transcripts(
            spark, n_convs=n_convs, min_turns=4, max_turns=40
        )
        t_in.repartition(n_files).write.mode("overwrite").parquet(f"{root}/in")

        def run_adjacent():
            ck = tempfile.mkdtemp(prefix="ck_adj_", dir=root)
            stream = read_transcript_stream(
                spark, f"{root}/in", max_files_per_trigger=1
            )
            qy = (
                stream_adjacent_edges(stream)
                .writeStream.foreachBatch(lambda df, bid: df.count())
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            qy.awaitTermination()
            return qy

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

        runners["stream_adjacent_ingest"] = run_adjacent
        runners["stream_degree_merge"] = run_degree_merge

    for name in [n for n in sys.argv[1:] if n in runners and n not in q]:
        spark.sparkContext.setJobDescription(name)
        reps = 1 if name.startswith("stream_") else REPS
        _, q[name] = timed(runners[name], reps=reps)
    print(json.dumps({"queries": q}))


if __name__ == "__main__":
    main([a for a in sys.argv[1:]])
