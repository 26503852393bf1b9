"""linkgraph_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``manchann/PageRank_with_Lambda`` (see /root/reference, studied for behavior
only): graph ETL over an edge table, iterative PageRank with externalized
per-superstep state, partitioned adjacency, per-partition metrics — plus the
graph kernels (connected components, label propagation, triangle counting)
and large-scale training-data pipeline operators (dedup, similarity search,
text analysis) that a production deployment of such an engine needs.

Architecture (Spark-first, NOT a port of the reference's Lambda plumbing):

- the reference's S3-hosted ``{dst: [srcs]}`` JSON partitions
  (``pagerank_lambda/dynamodb/init_to_s3.py:55-86``) become a flat
  ``DataFrame[src, dst]`` edge table, range/hash partitioned by Spark;
- the reference's keyed mutable state stores (DynamoDB / MySQL / SQLite /
  fixed-width EFS files; ``pagerank_lambda/dynamodb/pagerank.py:51-64``)
  become immutable per-superstep rank DataFrames checkpointed to a
  snapshot-isolated table store (Parquet layout here; Iceberg on a cluster);
- the reference's per-key point lookups / batched ``WHERE page=a OR b``
  reads (``pagerank_lambda/sqlite/jg-sqlite-pagerank.py:90-109``) become a
  single hash join per superstep;
- the reference's Lambda fan-out (``dynamodb/driver.py:164-174``) becomes
  Spark task scheduling.
"""

from linkgraph_spark.config import EngineConfig
from linkgraph_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
