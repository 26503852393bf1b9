"""End-to-end pipeline example: what a migrating user of the reference runs.

transcripts → actor graph → dedup the document corpus → rank actors →
components → export — every stage is an engine operator, composed the way
the 100 TB deployment would (swap the synthesize step for the Iceberg
transcript table and the local paths for s3a:// URIs; everything else is
identical).

Run:  python examples/end_to_end.py [n_convs] [out_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.edges import build_graph
from linkgraph_spark.functions.dedup import near_dup_clusters
from linkgraph_spark.kernels import connected_components, pagerank
from linkgraph_spark.session import get_spark
from linkgraph_spark.sources import write_ranks_json
from linkgraph_spark.transcripts import synthesize_transcripts


def main(n_convs: int = 500, out_dir: str = "/tmp/linkgraph_example") -> dict:
    spark = get_spark(app_name="linkgraph_example")

    # 1. ingest: transcript table (production: spark.read.table(iceberg_tbl))
    transcripts = synthesize_transcripts(spark, n_convs=n_convs)

    # 2. corpus dedup BEFORE graph analytics: one keeper per near-dup
    #    cluster of conversation texts
    docs = (
        transcripts.groupBy("conv_id")
        .agg(F.concat_ws(" ", F.collect_list("text")).alias("text"))
        .withColumn("doc_id", F.row_number().over(Window.orderBy("conv_id")) - 1)
        .select("doc_id", "text")
    )
    clusters = near_dup_clusters(docs, threshold=0.5)
    keepers = clusters.where(F.col("doc_id") == F.col("keeper_id")).count()

    # 3. graph build + checkpointed PageRank to convergence
    g = build_graph(transcripts)
    store = CheckpointStore(f"{out_dir}/checkpoints")
    res = pagerank(g, mode="textbook", checkpoint=store)

    # 4. structure: components with convergence guarantee
    cc = connected_components(g)

    # 5. export final ranks for downstream consumers (JDBC also available)
    top = (
        res.ranks.join(g.vertices, "id")
        .select("actor_key", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"))
    )
    write_ranks_json(top, f"{out_dir}/ranks_json")

    summary = {
        "conversations": n_convs,
        "doc_clusters_kept": keepers,
        "vertices": g.num_vertices,
        "pagerank_iterations": res.iterations,
        "pagerank_converged": res.converged,
        "components": cc.labels.select("component").distinct().count(),
        "cc_converged": cc.converged,
        "ranks_exported_to": f"{out_dir}/ranks_json",
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/linkgraph_example"
    main(n, out)
