"""Graph kernels: PageRank, connected components, label propagation,
triangle counting — all built on the same superstep scaffold (join → agg →
apply → checkpoint), the Spark-native form of the reference's
gather–apply–scatter loop (``pagerank_lambda/dynamodb/pagerank.py:108-112``).
"""

from linkgraph_spark.kernels.pagerank import pagerank, PageRankResult, remap_ranks
from linkgraph_spark.kernels.components import (
    ComponentsResult,
    attack_resilience,
    connected_components,
    connected_components_star,
    random_failure_resilience,
)
from linkgraph_spark.kernels.labelprop import seed_spread, label_propagation
from linkgraph_spark.kernels.paths import PathsResult, shortest_paths, shortest_paths_weighted
from linkgraph_spark.kernels.hits import HitsResult, hits
from linkgraph_spark.kernels.katz import KatzResult, katz
from linkgraph_spark.kernels.mis import MisResult, maximal_independent_set
from linkgraph_spark.kernels.coloring import ColoringResult, greedy_coloring
from linkgraph_spark.kernels.matching import MatchingResult, maximal_matching, vertex_cover
from linkgraph_spark.kernels.densest import DensestResult, densest_subgraph
from linkgraph_spark.kernels.linkpred import adamic_adar, link_scores, neighborhood_overlap
from linkgraph_spark.kernels.msf import MSFResult, boruvka_msf, msf_clusters
from linkgraph_spark.kernels.kmeans import (
    kcenter,
    kmeans,
    kmeans_profile,
    pq_codes,
    silhouette,
)
from linkgraph_spark.kernels.pca import pca_power
from linkgraph_spark.kernels.centrality import (
    HyperBallResult,
    avg_distance_landmarks,
    ball_sizes,
    walk_counts,
    closeness_landmarks,
    double_sweep_diameter,
    eccentricity_landmarks,
    effective_diameter,
    effective_diameter_landmarks,
    harmonic_landmarks,
    hyperball,
)
from linkgraph_spark.kernels.simrank import simrank
from linkgraph_spark.kernels.wl import wl_colors
from linkgraph_spark.kernels.betweenness import BetweennessResult, betweenness
from linkgraph_spark.kernels.modularity import (
    conductance,
    label_assortativity,
    label_mixing,
    modularity,
    ppr_sweep,
)
from linkgraph_spark.kernels.node2vec import node2vec_walks
from linkgraph_spark.kernels.projection import contract_vertices, shared_tool_affinity
from linkgraph_spark.kernels.temporal import (
    temporal_components,
    TemporalReachResult,
    densification,
    temporal_edges,
    temporal_motifs,
    temporal_reachability,
)
from linkgraph_spark.kernels.scc import SccResult, strongly_connected_components
from linkgraph_spark.kernels.bowtie import BowtieResult, bowtie
from linkgraph_spark.kernels.trustrank import spam_mass
from linkgraph_spark.kernels.spectral import (
    SpectralResult,
    eigenvector_centrality,
    fiedler_sweep,
    salsa,
)
from linkgraph_spark.kernels.stats import (
    centrality_degree_corr,
    degree_assortativity,
    degree_gini,
    degree_percentiles,
    degree_uniqueness,
    reciprocity,
    rich_club,
)
from linkgraph_spark.kernels.subgraph import ego_graph, induced_subgraph
from linkgraph_spark.kernels.truss import TrussResult, edge_support, k_truss, local_bridges
from linkgraph_spark.kernels.walks import random_walks, skipgram_pairs
from linkgraph_spark.kernels.kcore import KCoreResult, k_core
from linkgraph_spark.kernels.graphlets import graphlet_census4
from linkgraph_spark.kernels.cpm import (
    CpmResult,
    clique_percolation3,
    clique_percolation4,
    clique_percolation4_over_pairs,
)
from linkgraph_spark.kernels.kcore import onion_decomposition, OnionResult
from linkgraph_spark.kernels.spectral import leaderrank, spectral_radius
from linkgraph_spark.kernels.diffusion import label_spreading
from linkgraph_spark.kernels.stats import disparity_backbone, molloy_reed, struct_roles
from linkgraph_spark.kernels.modularity import partition_quality
from linkgraph_spark.kernels.temporal import pagerank_drift
from linkgraph_spark.kernels.centrality import subgraph_centrality4
from linkgraph_spark.kernels.triangles import (
    directed_triangle_census,
    four_cliques_over_pairs,
    four_cliques_per_vertex,
    square_count,
    triangle_count,
    triangles_per_vertex,
)

__all__ = [
    "kmeans",
    "kmeans_profile",
    "pq_codes",
    "silhouette",
    "pca_power",
    "pagerank",
    "remap_ranks",
    "PageRankResult",
    "ComponentsResult",
    "attack_resilience",
    "random_failure_resilience",
    "connected_components",
    "connected_components_star",
    "label_propagation",
    "PathsResult",
    "shortest_paths",
    "shortest_paths_weighted",
    "HitsResult",
    "hits",
    "katz",
    "KatzResult",
    "maximal_independent_set",
    "MisResult",
    "greedy_coloring",
    "ColoringResult",
    "maximal_matching",
    "MatchingResult",
    "vertex_cover",
    "densest_subgraph",
    "DensestResult",
    "adamic_adar",
    "random_walks",
    "skipgram_pairs",
    "node2vec_walks",
    "TemporalReachResult",
    "temporal_components",
    "temporal_edges",
    "densification",
    "temporal_reachability",
    "ego_graph",
    "induced_subgraph",
    "reciprocity",
    "degree_assortativity",
    "centrality_degree_corr",
    "degree_gini",
    "rich_club",
    "SpectralResult",
    "eigenvector_centrality",
    "salsa",
    "seed_spread",
    "directed_triangle_census",
    "four_cliques_over_pairs",
    "four_cliques_per_vertex",
    "modularity",
    "label_mixing",
    "conductance",
    "ppr_sweep",
    "simrank",
    "avg_distance_landmarks",
    "ball_sizes",
    "walk_counts",
    "fiedler_sweep",
    "kcenter",
    "square_count",
    "wl_colors",
    "BetweennessResult",
    "betweenness",
    "shared_tool_affinity",
    "SccResult",
    "strongly_connected_components",
    "BowtieResult",
    "bowtie",
    "spam_mass",
    "label_assortativity",
    "temporal_motifs",
    "degree_uniqueness",
    "contract_vertices",
    "TrussResult",
    "edge_support",
    "k_truss",
    "local_bridges",
    "link_scores",
    "neighborhood_overlap",
    "MSFResult",
    "boruvka_msf",
    "msf_clusters",
    "degree_percentiles",
    "HyperBallResult",
    "harmonic_landmarks",
    "hyperball",
    "effective_diameter",
    "effective_diameter_landmarks",
    "closeness_landmarks",
    "double_sweep_diameter",
    "eccentricity_landmarks",
    "KCoreResult",
    "k_core",
    "triangle_count",
    "triangles_per_vertex",
    "graphlet_census4",
    "CpmResult",
    "clique_percolation3",
    "clique_percolation4",
    "clique_percolation4_over_pairs",
    "onion_decomposition",
    "OnionResult",
    "leaderrank",
    "spectral_radius",
    "label_spreading",
    "disparity_backbone",
    "molloy_reed",
    "struct_roles",
    "partition_quality",
    "pagerank_drift",
    "subgraph_centrality4",
]