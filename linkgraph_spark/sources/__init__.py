"""Sources & sinks: reference-format interop (SNAP-style edge-list text,
JSON inverted-adjacency partitions), final-state export (JDBC/JSON/CSV —
the reference's external readout, ``dynamodb_get_json.py``), plus the
engine's native Parquet/checkpoint tables."""

from linkgraph_spark.sources.edgelist import (
    read_edge_list,
    write_adjacency_json,
    read_adjacency_json,
)
from linkgraph_spark.sources.export import (
    read_ranks_jdbc,
    write_ranks_csv,
    write_ranks_jdbc,
    write_ranks_json,
)

__all__ = [
    "read_edge_list",
    "write_adjacency_json",
    "read_adjacency_json",
    "read_ranks_jdbc",
    "write_ranks_csv",
    "write_ranks_jdbc",
    "write_ranks_json",
]
