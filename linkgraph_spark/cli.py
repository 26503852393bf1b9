"""spark-submit entry point.

Cluster launch (the north_rule's deployment shape)::

    zip -r engine.zip linkgraph_spark
    spark-submit --py-files engine.zip \\
        --conf spark.sql.shuffle.partitions=<2-3x cluster cores> \\
        --conf spark.sql.adaptive.enabled=true \\
        -m linkgraph_spark.cli pagerank \\
        --transcripts s3://bucket/transcripts --mode textbook \\
        --checkpoint s3://bucket/checkpoints/run1 --output s3://bucket/ranks

Local smoke::

    python -m linkgraph_spark.cli pagerank --synthetic-convs 1000 --iterations 3
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F
import json
import sys

from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.config import EngineConfig
from linkgraph_spark.edges import build_graph
from linkgraph_spark.kernels import (
    adamic_adar,
    connected_components,
    connected_components_star,
    hits,
    k_core,
    label_propagation,
    pagerank,
    random_walks,
    shortest_paths,
    shortest_paths_weighted,
    triangle_count,
)
from linkgraph_spark.session import get_spark
from linkgraph_spark.transcripts import synthesize_transcripts


def _load_graph(spark, args):
    if args.transcripts:
        t = spark.read.parquet(args.transcripts)
    else:
        t = synthesize_transcripts(spark, n_convs=args.synthetic_convs)
    weighted = (
        getattr(args, "mode", None) == "weighted"
        or args.kernel in ("sssp", "msf", "msfclusters")
    )
    return build_graph(t, weighted=weighted)


def main(argv=None):
    p = argparse.ArgumentParser(prog="linkgraph_spark")
    p.add_argument(
        "kernel",
        choices=[
            "pagerank", "components", "components_star", "labelprop",
            "triangles", "bfs", "sssp", "hits", "kcore", "linkpred",
            "walks", "node2vec", "etl", "scc", "ktruss", "betweenness", "hyperball",
            "stats", "community", "katz", "mis", "coloring", "diameter",
            "matching", "salsa", "eigenvector", "census", "richclub",
            "seedspread", "msf", "msfclusters", "overlap",
            "cliques", "resilience", "bowtie", "spammass", "contract",
            "simrank", "ballsizes", "pprsweep", "walkcounts", "motif",
            "avgdist", "wl", "squares", "heat", "hitprob", "coreprofile",
            "paradox", "huboverlap",
        ],
    )
    p.add_argument(
        "--removal",
        choices=["attack", "random"],
        default="attack",
        help="resilience: targeted hub removal or hash-random failure",
    )
    p.add_argument(
        "--rate", type=float, default=0.1, help="resilience --removal random: fraction removed"
    )
    p.add_argument("--k", type=int, default=3, help="k for ktruss")
    p.add_argument("--cuts", type=int, default=9, help="msfclusters: heaviest MSF edges to cut")
    p.add_argument("--n-samples", type=int, default=16, help="betweenness source sample")
    p.add_argument("--max-r", type=int, default=16, help="hyperball radius cap")
    p.add_argument("--sources", help="comma-separated source ids (bfs/sssp)")
    p.add_argument("--walk-length", type=int, default=8)
    p.add_argument("--walks-per-vertex", type=int, default=1)
    p.add_argument("--top-k", type=int, default=None, help="linkpred top-k per vertex")
    p.add_argument("--max-degree", type=int, default=None, help="linkpred wedge cap")
    p.add_argument("--transcripts", help="parquet/Iceberg path of the transcript table")
    p.add_argument("--synthetic-convs", type=int, default=1000)
    p.add_argument("--mode", choices=["textbook", "compat", "weighted"], default="textbook")
    p.add_argument(
        "--personalize-ids",
        help="comma-separated vertex ids for personalized PageRank "
        "(textbook/weighted modes)",
    )
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--max-iterations", type=int, default=100)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--alpha", type=float, default=0.05, help="katz attenuation")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--checkpoint", help="checkpoint store base path")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output", help="parquet output path for the result")
    p.add_argument(
        "--bucketed-prefix",
        help="etl kernel: additionally persist the graph as src/id-bucketed "
        "catalog tables (zero-edge-shuffle supersteps; see bucketed.py)",
    )
    p.add_argument("--buckets", type=int, default=32, help="bucket count for --bucketed-prefix")
    p.add_argument("--gather", choices=["builtin", "csr"], default="builtin")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args(argv)

    spark = get_spark(
        app_name=f"linkgraph_{args.kernel}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    g = _load_graph(spark, args)
    store = CheckpointStore(args.checkpoint) if args.checkpoint else None
    cfg = EngineConfig(damping=args.damping, tol=args.tol, max_iterations=args.max_iterations)

    if args.kernel == "etl":
        result = g.edges
        summary = {"vertices": g.num_vertices, "edges": g.edges.count()}
        if args.bucketed_prefix:
            from linkgraph_spark.bucketed import write_bucketed_graph

            write_bucketed_graph(g, args.bucketed_prefix, buckets=args.buckets)
            summary["bucketed_tables"] = [
                f"{args.bucketed_prefix}_{t}" for t in ("edges", "degrees", "vertices")
            ]
    elif args.kernel == "pagerank":
        pids = (
            [int(x) for x in args.personalize_ids.split(",")]
            if args.personalize_ids
            else None
        )
        res = pagerank(
            g, mode=args.mode, config=cfg, iterations=args.iterations,
            checkpoint=store, resume=args.resume, gather_mode=args.gather,
            personalize_ids=pids,
        )
        result = res.ranks.join(g.vertices, "id").select("id", "actor_key", "rank")
        summary = {
            "iterations": res.iterations,
            "converged": res.converged,
            "residual": res.residual,
            "metrics_tail": res.metrics[-1] if res.metrics else None,
        }
    elif args.kernel in ("bfs", "sssp"):
        srcs = [int(x) for x in (args.sources or "0").split(",")]
        pres = (
            shortest_paths(g, sources=srcs)
            if args.kernel == "bfs"
            else shortest_paths_weighted(g, sources=srcs)
        )
        result = pres.distances
        summary = {
            "reached": result.count(),
            "iterations": pres.iterations,
            "converged": pres.converged,
        }
    elif args.kernel == "hits":
        hres = hits(g, iterations=args.iterations or 5)
        result = hres.scores
        summary = {"iterations": hres.iterations}
    elif args.kernel == "kcore":
        kres = k_core(g)
        result = kres.coreness
        summary = {
            "iterations": kres.iterations,
            "converged": kres.converged,
            "max_core": result.agg({"core": "max"}).collect()[0][0],
        }
    elif args.kernel == "linkpred":
        result = adamic_adar(g, max_degree=args.max_degree, top_k=args.top_k)
        summary = {"candidates": result.count()}
    elif args.kernel == "walks":
        result = random_walks(
            g, walk_length=args.walk_length, walks_per_vertex=args.walks_per_vertex
        )
        summary = {"corpus_rows": result.count()}
    elif args.kernel == "node2vec":
        from linkgraph_spark.kernels import node2vec_walks

        result = node2vec_walks(
            g, walk_length=args.walk_length,
            walks_per_vertex=args.walks_per_vertex, max_degree=args.max_degree,
        )
        summary = {"corpus_rows": result.count()}
    elif args.kernel == "components_star":
        sres = connected_components_star(g, checkpoint=store, resume=args.resume)
        result = sres.labels
        summary = {
            "components": result.select("component").distinct().count(),
            "iterations": sres.iterations,
            "converged": sres.converged,
        }
    elif args.kernel == "components":
        cres = connected_components(g, checkpoint=store, resume=args.resume)
        result = cres.labels
        summary = {
            "components": result.select("component").distinct().count(),
            "iterations": cres.iterations,
            "converged": cres.converged,
        }
    elif args.kernel == "scc":
        from linkgraph_spark.kernels import strongly_connected_components

        scres = strongly_connected_components(g)
        result = scres.labels
        summary = {
            "sccs": result.select("scc").distinct().count(),
            "rounds": scres.rounds,
            "converged": scres.converged,
        }
    elif args.kernel == "ktruss":
        from linkgraph_spark.kernels import k_truss

        tres = k_truss(g, k=args.k, max_iterations=args.max_iterations)
        result = tres.edges
        summary = {
            "truss_edges": result.count(),
            "iterations": tres.iterations,
            "converged": tres.converged,
        }
    elif args.kernel == "betweenness":
        from linkgraph_spark.kernels import betweenness

        bres = betweenness(g, n_samples=args.n_samples)
        result = bres.scores
        summary = {
            "sources": len(bres.sources),
            "depth": bres.depth,
            "converged": bres.converged,
        }
    elif args.kernel == "hyperball":
        from linkgraph_spark.kernels import hyperball

        hbres = hyperball(g, max_r=args.max_r)
        result = hbres.centrality
        summary = {"iterations": hbres.iterations, "converged": hbres.converged}
    elif args.kernel == "community":
        from linkgraph_spark.kernels import conductance, modularity

        labels = label_propagation(
            g, max_iterations=args.iterations or 5,
            weighted=(args.mode == "weighted"),
        )
        q = modularity(g, labels).collect()[0]["modularity"]
        result = conductance(g, labels).join(
            labels.groupBy(F.col("label").alias("community")).count(), "community"
        )
        summary = {
            "communities": labels.select("label").distinct().count(),
            "modularity": q,
        }
    elif args.kernel == "katz":
        from linkgraph_spark.kernels import katz

        kzres = katz(g, iterations=args.iterations or 5, alpha=args.alpha)
        result = kzres.scores
        summary = {"iterations": kzres.iterations}
    elif args.kernel == "mis":
        from linkgraph_spark.kernels import maximal_independent_set

        mres = maximal_independent_set(g, max_iterations=args.max_iterations)
        result = mres.labels
        summary = {
            "in_set": result.where(F.col("status") == "in").count(),
            "iterations": mres.iterations,
            "converged": mres.converged,
        }
    elif args.kernel == "coloring":
        from linkgraph_spark.kernels import greedy_coloring

        cores = greedy_coloring(g, max_iterations=args.max_iterations)
        result = cores.colors
        summary = {
            # NULL = still uncolored (budget ran out), not a color
            "colors": result.where(F.col("color").isNotNull())
            .select("color")
            .distinct()
            .count(),
            "iterations": cores.iterations,
            "converged": cores.converged,
        }
    elif args.kernel == "matching":
        from linkgraph_spark.kernels import maximal_matching

        mares = maximal_matching(g, max_iterations=args.max_iterations)
        result = mares.matching
        summary = {
            "matched_pairs": result.count(),
            "iterations": mares.iterations,
            "converged": mares.converged,
        }
    elif args.kernel == "msf":
        from linkgraph_spark.kernels import boruvka_msf

        mres = boruvka_msf(g, max_iterations=args.max_iterations)
        result = mres.edges
        summary = {
            "forest_edges": result.count(),
            "rounds": mres.iterations,
            "converged": mres.converged,
        }
    elif args.kernel == "msfclusters":
        from linkgraph_spark.kernels import msf_clusters

        result = msf_clusters(g, cuts=args.cuts, max_iterations=args.max_iterations)
        summary = {"clusters": result.select("cluster").distinct().count()}
    elif args.kernel == "overlap":
        from linkgraph_spark.kernels import neighborhood_overlap

        result = neighborhood_overlap(g)
        summary = {"edges": result.count()}
    elif args.kernel == "cliques":
        from linkgraph_spark.kernels import four_cliques_per_vertex

        result = four_cliques_per_vertex(g)
        summary = {
            "in_a_4clique": result.where(F.col("four_cliques") > 0).count()
        }
    elif args.kernel == "resilience":
        from linkgraph_spark.kernels import (
            attack_resilience,
            random_failure_resilience,
        )

        if args.removal == "attack":
            result = attack_resilience(g, k=args.k)
        else:
            result = random_failure_resilience(g, rate=args.rate)
        summary = result.collect()[0].asDict()
    elif args.kernel == "bowtie":
        from linkgraph_spark.kernels import bowtie

        bres = bowtie(g)
        result = bres.sizes
        summary = {
            "converged": bres.converged,
            "categories": {r["category"]: r["n_vertices"] for r in result.collect()},
        }
    elif args.kernel == "spammass":
        from linkgraph_spark.kernels import spam_mass

        srcs = [int(x) for x in (args.sources or "0,1,2,3,4").split(",")]
        result = spam_mass(g, trusted_ids=srcs, iterations=args.iterations or 3)
        summary = {
            "trusted_seeds": srcs,
            "high_spam_mass": result.where(F.col("spam_mass") > 0.5).count(),
        }
    elif args.kernel == "contract":
        from linkgraph_spark.kernels import contract_vertices

        result = contract_vertices(g)
        summary = {"contracted_edges": result.count()}
    elif args.kernel == "simrank":
        from linkgraph_spark.kernels import simrank

        result = simrank(
            g, iterations=args.iterations or 2, max_out_degree=args.max_degree
        )
        summary = {"pairs": result.count(), "iterations": args.iterations or 2}
    elif args.kernel == "ballsizes":
        from linkgraph_spark.kernels import ball_sizes

        result = ball_sizes(g, max_degree=args.max_degree)
        summary = {
            "vertices": result.count(),
            "max_ball2": result.agg(F.max("ball2")).collect()[0][0],
        }
    elif args.kernel == "walkcounts":
        from linkgraph_spark.kernels import walk_counts

        result = walk_counts(g, n_hubs=args.top_k or 10)
        summary = {
            "hubs": result.count(),
            "max_walks3": result.agg(F.max("walks3")).collect()[0][0],
        }
    elif args.kernel == "motif":
        from linkgraph_spark.kernels.stats import motif_significance

        result = motif_significance(g)
        summary = result.collect()[0].asDict()
    elif args.kernel == "avgdist":
        from linkgraph_spark.kernels import avg_distance_landmarks

        srcs = [int(x) for x in (args.sources or "0,1,2,3,4").split(",")]
        result = avg_distance_landmarks(g, landmarks=srcs, k=args.iterations or 6)
        summary = result.collect()[0].asDict()
    elif args.kernel == "wl":
        from linkgraph_spark.kernels import wl_colors

        result = wl_colors(g, rounds=args.iterations or 3)
        summary = {
            "vertices": result.count(),
            "classes": result.select("wl_color").distinct().count(),
        }
    elif args.kernel == "squares":
        from linkgraph_spark.kernels import square_count

        result = square_count(g, max_degree=args.max_degree)
        summary = {"squares": result.collect()[0][0]}
    elif args.kernel == "pprsweep":
        from linkgraph_spark.kernels import ppr_sweep

        srcs = [int(x) for x in (args.sources or "0").split(",")]
        result = ppr_sweep(
            g, seeds=srcs, iterations=args.iterations or 5, top_k=args.top_k or 50
        )
        best = (
            result.where(F.col("phi").isNotNull())
            .orderBy(F.asc("phi"), F.asc("pos"))
            .limit(1)
            .collect()
        )
        summary = {
            "seeds": srcs,
            "best_cut": {"pos": best[0]["pos"], "phi": best[0]["phi"]} if best else None,
        }
    elif args.kernel == "salsa":
        from linkgraph_spark.kernels import salsa

        sres = salsa(g, iterations=args.iterations or 5)
        result = sres.scores
        summary = {"iterations": sres.iterations}
    elif args.kernel == "eigenvector":
        from linkgraph_spark.kernels import eigenvector_centrality

        eres = eigenvector_centrality(g, iterations=args.iterations or 8)
        result = eres.scores
        summary = {"iterations": eres.iterations}
    elif args.kernel == "census":
        from linkgraph_spark.kernels import directed_triangle_census

        result = directed_triangle_census(g)
        row = result.collect()[0]
        summary = {"cyclic": row["cyclic"], "transitive": row["transitive"]}
    elif args.kernel == "richclub":
        from linkgraph_spark.kernels import rich_club

        ks = [int(x) for x in (args.sources or "1,2,4,8,16").split(",")]
        result = rich_club(g, ks=ks)
        summary = {"ks": ks}
    elif args.kernel == "seedspread":
        from linkgraph_spark.kernels import seed_spread

        srcs = [int(x) for x in (args.sources or "0").split(",")]
        seeds = g.vertices.where(F.col("id").isin(srcs)).select(
            "id", F.col("id").alias("label")
        )
        result = seed_spread(g, seeds, max_iterations=args.max_iterations)
        summary = {
            "seeds": srcs,
            "reached": result.where(F.col("label").isNotNull()).count(),
        }
    elif args.kernel == "diameter":
        from linkgraph_spark.kernels import double_sweep_diameter

        srcs = [int(x) for x in (args.sources or "0").split(",")]
        result = double_sweep_diameter(g, seed=srcs[0], k=args.max_r)
        row = result.collect()[0]
        summary = {"far_id": row["far_id"], "diameter_lb": row["diameter_lb"]}
    elif args.kernel == "stats":
        from linkgraph_spark.kernels import degree_assortativity, reciprocity

        rec = reciprocity(g).collect()[0]["reciprocity"]
        asr = degree_assortativity(g).collect()[0]["assortativity"]
        result = spark.createDataFrame(
            [(rec, asr)], "reciprocity double, assortativity double"
        )
        summary = {"reciprocity": rec, "assortativity": asr}
    elif args.kernel == "heat":
        from linkgraph_spark.kernels.diffusion import heat_kernel

        res = heat_kernel(g, t=2.0, terms=args.iterations or 8)
        result = res.scores
        summary = {"terms": res.iterations, "mass": res.metrics[-1]["mass"]}
    elif args.kernel == "hitprob":
        from linkgraph_spark.kernels.diffusion import hitting_probability

        srcs = [int(x) for x in (args.sources or "0,1,2").split(",")]
        res = hitting_probability(g, seeds=srcs, iterations=args.iterations or 6)
        result = res.scores
        summary = {
            "seeds": srcs,
            "reached": result.where(F.col("p") > 0).count(),
        }
    elif args.kernel == "coreprofile":
        from linkgraph_spark.kernels.kcore import core_profile

        result = core_profile(g)
        summary = {"shells": result.count()}
    elif args.kernel == "paradox":
        from linkgraph_spark.kernels.stats import (
            directed_assortativity,
            friendship_paradox,
        )

        result = friendship_paradox(g)
        row = result.collect()[0]
        da = directed_assortativity(g).collect()[0]
        summary = {
            "paradox_frac": row["paradox_frac"],
            "edge_pov_deg": row["edge_pov_deg"],
            "r_out_in": da["r_out_in"],
        }
    elif args.kernel == "huboverlap":
        from linkgraph_spark.kernels.stats import hub_overlap

        result = hub_overlap(g, k=args.top_k or 10)
        summary = {"pairs": result.count()}
    elif args.kernel == "labelprop":
        result = label_propagation(
            g, max_iterations=args.iterations or 5, checkpoint=store,
            resume=args.resume, weighted=(args.mode == "weighted"),
        )
        summary = {"labels": result.select("label").distinct().count()}
    else:
        n = triangle_count(g)
        result = spark.createDataFrame([(n,)], "n_triangles long")
        summary = {"triangles": n}

    if args.output:
        result.write.mode("overwrite").parquet(args.output)
        summary["output"] = args.output
    else:
        result.show(20, truncate=False)
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
