"""Sources & sinks: reference-format interop (SNAP-style edge-list text,
JSON inverted-adjacency partitions) plus the engine's native Parquet/
checkpoint tables."""

from linkgraph_spark.sources.edgelist import read_edge_list, write_adjacency_json, read_adjacency_json

__all__ = ["read_edge_list", "write_adjacency_json", "read_adjacency_json"]
