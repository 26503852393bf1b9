"""Graph-analytics tour: the round-3 operator families on one graph.

The investigation a graph analyst actually runs on a transcript corpus —
health stats → communities (+ quality score) → cohesive cores → centrality
(three notions, three scale regimes) → slicing a suspicious hub's
neighborhood → temporal provenance → an embedding walk corpus. Every
operator here is oracle-gated in ``__spark_entry__``; this script shows
how they compose.

Run:  python examples/graph_analytics_tour.py [n_convs]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from linkgraph_spark.edges import build_graph
from linkgraph_spark.kernels import (
    betweenness,
    connected_components,
    degree_assortativity,
    effective_diameter,
    ego_graph,
    harmonic_landmarks,
    hyperball,
    induced_subgraph,
    k_truss,
    label_propagation,
    modularity,
    node2vec_walks,
    pagerank,
    reciprocity,
    shared_tool_affinity,
    skipgram_pairs,
    strongly_connected_components,
    temporal_edges,
    temporal_reachability,
)
from linkgraph_spark.session import get_spark
from linkgraph_spark.transcripts import synthesize_transcripts


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spark = get_spark(app_name="graph_tour", shuffle_partitions=8)
    t = synthesize_transcripts(spark, n_convs=n_convs, hub_turns=300)
    g = build_graph(t)
    report: dict = {"vertices": g.num_vertices, "edges": g.edges.count()}

    # 1. shape: is this graph healthy, and what is it like?
    report["reciprocity"] = reciprocity(g).collect()[0]["reciprocity"]
    report["assortativity"] = degree_assortativity(g).collect()[0]["assortativity"]

    # 2. structure: communities and their quality
    labels = label_propagation(g, max_iterations=5)
    report["modularity"] = modularity(g, labels).collect()[0]["modularity"]
    report["weak_components"] = (
        connected_components(g).labels.select("component").distinct().count()
    )
    report["strong_components"] = (
        strongly_connected_components(g).labels.select("scc").distinct().count()
    )

    # 3. cohesion: where are the dense cores?
    report["truss3_edges"] = k_truss(g, k=3).edges.count()

    # 4. who matters: three centralities, three scale regimes
    ranks = pagerank(g, mode="textbook")
    top = ranks.ranks.orderBy(F.desc("rank")).limit(3).collect()
    top_ids = [r["id"] for r in top]
    report["pagerank_top3"] = top_ids
    report["harmonic_of_top3"] = {
        r["id"]: r["harmonic"]
        for r in harmonic_landmarks(g, landmarks=top_ids, k=4).collect()
    }
    hb = hyperball(g, max_r=8)
    report["hyperball_rounds"] = hb.iterations
    # one sweep feeds both the per-vertex estimates and the diameter
    report["effective_diameter_q90"] = effective_diameter(g, q=0.9, result=hb)
    bw = betweenness(g, n_samples=8)
    report["max_betweenness"] = bw.scores.agg(F.max("betweenness")).collect()[0][0]

    # 5. investigate the biggest hub: slice, don't rescan
    hub = top_ids[0]
    neighborhood = ego_graph(g, sources=[hub], k=2)
    report["hub_2hop_vertices"] = neighborhood.num_vertices
    active = induced_subgraph(g, F.col("out_deg") >= 2)
    report["active_subgraph_vertices"] = active.num_vertices
    report["shared_tool_pairs"] = shared_tool_affinity(
        g, max_tool_users=512, min_shared=2
    ).count()

    # 6. provenance: who could the hub have influenced, respecting time?
    te = temporal_edges(g, t)
    report["temporal_reach_of_hub"] = temporal_reachability(
        g, te, sources=[hub]
    ).arrivals.count()

    # 7. training data: biased walk corpus → skip-gram pairs
    corpus = node2vec_walks(g, walk_length=4, max_degree=64)
    report["skipgram_pairs"] = skipgram_pairs(corpus, window=2).count()

    # 8. symmetry breaking + densest region (round-4 kernels): pick
    # non-conflicting actors, color the rest, find the hottest subgraph
    from linkgraph_spark.kernels import (
        densest_subgraph,
        greedy_coloring,
        maximal_independent_set,
        maximal_matching,
    )

    mis = maximal_independent_set(g, max_iterations=20)
    report["mis_size"] = mis.labels.where(F.col("status") == "in").count()
    col = greedy_coloring(g, max_iterations=40)
    report["colors_used"] = col.colors.select("color").distinct().count()
    mat = maximal_matching(g, max_iterations=20)
    report["matched_pairs"] = mat.matching.count()
    ds = densest_subgraph(g, epsilon=0.5)
    report["densest_density"] = round(ds.best_density, 3)
    report["densest_vertices"] = ds.densest_vertices.count()

    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
