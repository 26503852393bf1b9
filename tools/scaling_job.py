"""One scaling-probe run at a given parallelism. Prints one JSON line.

Reads the prebuilt ~20M-edge probe table (tools/make_scaling_graph.py) so
every parallelism level consumes byte-identical input; the graph (vertices,
degrees) is fully materialized BEFORE the timed window, so the measurement
isolates superstep throughput — the quantity the north_rule's
scaling-efficiency criterion is about. The transcript→graph ETL is timed
separately (bench.py).

The probe runs compat-mode PageRank (the reference's own semantics: d=0.8,
fixed iterations — ``pagerank_lambda/dynamodb/pagerank.py:67,108``) with AQE
off: one Spark job per superstep, no adaptive re-planning noise, so the
wall time is the gather join + per-dst aggregate and the measurement is a
clean function of parallelism.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

from pyspark.sql import functions as F

from linkgraph_spark.edges import LinkGraph, vertex_degrees
from linkgraph_spark.kernels import pagerank
from linkgraph_spark.session import get_spark

EDGES_PATH = os.path.join(HERE, "..", "BENCH", "scaling_graph_edges")


def main():
    cpus = int(sys.argv[1])
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # conf-sweep hooks (tools/scaling_sweep.py): extra session confs as a
    # JSON dict + shuffle-partition override, so the identical probe can be
    # re-run under candidate tunings
    extra = json.loads(os.environ.get("SPARK_GRAFT_PROBE_CONF", "{}"))
    sp = int(os.environ.get("SPARK_GRAFT_PROBE_SHUFFLE", str(max(cpus, 2))))

    spark = get_spark(
        app_name=f"scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=sp,
        extra_conf={"spark.sql.adaptive.enabled": "false", **extra},
    )
    edges = spark.read.parquet(EDGES_PATH).persist()
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("actor_key", F.col("id").cast("string"))
        .persist()
    )
    degrees = vertex_degrees(vertices, edges).persist()
    n_vertices = vertices.count()
    n_edges = edges.count()
    degrees.count()  # materialize everything outside the timed window
    g = LinkGraph(vertices=vertices, edges=edges, degrees=degrees, num_vertices=n_vertices)

    t0 = time.monotonic()
    res = pagerank(g, mode="compat", iterations=iters)
    pr = time.monotonic() - t0
    walls = [round(m["wall_sec"], 2) for m in res.metrics]
    steady = statistics.median(walls[len(walls) // 2 :])  # exclude warm-up half

    print(
        json.dumps(
            {
                "cpus": cpus,
                "shuffle_partitions": sp,
                "conf": extra,
                "vertices": n_vertices,
                "edges": n_edges,
                "iterations": res.iterations,
                "pagerank_sec": round(pr, 2),
                "per_iteration_sec": walls,
                "steady_state_iteration_sec": steady,
                "edges_scattered_per_sec": round(n_edges * res.iterations / pr, 1),
                "steady_edges_scattered_per_sec": round(n_edges / steady, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
