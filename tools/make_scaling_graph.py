"""One-time prebuild of the scaling-probe edge table (~20M edges, 4M
vertices, heavy-tailed in-degree with 2,000 hub destinations). Deterministic
arithmetic over spark.range — no RNG, no wall clock. Written to
BENCH/scaling_graph_edges (gitignored); tools/scaling_run.py reads it so
both parallelism levels consume byte-identical input.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from linkgraph_spark.session import get_spark
from pyspark.sql import functions as F

V = int(os.environ.get("SCALING_V", 4_000_000))
E = int(os.environ.get("SCALING_E", 20_000_000))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH", "scaling_graph_edges")

spark = get_spark(master="local[32]", shuffle_partitions=64)
e = spark.range(E).select(
    F.pmod(F.col("id") * F.lit(2654435761), F.lit(V)).alias("src"),
    F.when(F.col("id") % 20 < 3, F.pmod(F.col("id") * F.lit(40503), F.lit(2000)))
     .otherwise(F.pmod(F.col("id") * F.lit(179424673), F.lit(V))).alias("dst"),
).where(F.col("src") != F.col("dst"))
e.write.mode("overwrite").parquet(OUT)
print("WROTE", OUT)
