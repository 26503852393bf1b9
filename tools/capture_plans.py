"""Capture `.explain("formatted")` for the queries touched in the r06
optimization round — including the IN-LOOP superstep plans of iterative
kernels, by hooking RotatingState.rotate (every superstep's materialized
DataFrame passes through it).

Usage:
    PYTHONPATH=<tree> python tools/capture_plans.py <suffix> <query> [...]

writes plans/r06/<query>_<suffix>.txt (suffix = before|after). The <tree>
on PYTHONPATH selects which code version builds the plans; output always
lands in THIS repo's plans/r06/.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    import linkgraph_spark.lineage as lineage
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.session import get_spark
    from linkgraph_spark.transcripts import synthesize_transcripts, transcripts_from_events

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plans", master="local[8]", shuffle_partitions=32)

    rotate_plans: list[str] = []
    orig_rotate = lineage.RotatingState.rotate

    def hooked(self, df):
        rotate_plans.append(explain_str(df))
        return orig_rotate(self, df)

    lineage.RotatingState.rotate = hooked

    def pick(i: int) -> str:
        if not rotate_plans:
            return ""
        return rotate_plans[i] if i < len(rotate_plans) else rotate_plans[-1]

    def write(name: str, text: str):
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")

    g_sf = None

    def graph():
        nonlocal g_sf
        if g_sf is None:
            g_sf = build_graph(transcripts_from_events(spark, sf_dir))
        return g_sf

    for name in names:
        rotate_plans.clear()
        if name == "pagerank_superstep":
            from linkgraph_spark.kernels import pagerank

            pagerank(graph(), mode="textbook", iterations=3)
            # plan 0 = init materialization; plan 2 = a steady superstep
            write(name, pick(2))
        elif name == "pagerank_superstep_copart":
            from linkgraph_spark.kernels import pagerank

            # >= 12 iterations selects the co-partitioned shuffle-hash
            # gather (long-loop small-regime shape)
            pagerank(graph(), mode="textbook", iterations=12)
            write(name, pick(2))
        elif name == "pagerank_superstep_big":
            from linkgraph_spark.kernels import pagerank

            pagerank(graph(), mode="textbook", iterations=3, force_big_state=True)
            write(name, pick(2))
        elif name == "cpm3_round":
            from linkgraph_spark.kernels.cpm import clique_percolation3

            clique_percolation3(graph(), max_iterations=3)
            write(name, pick(len(rotate_plans) - 1))  # the steady percolation round
        elif name == "temporal_components_round":
            from linkgraph_spark.kernels import temporal_edges
            from linkgraph_spark.kernels.temporal import temporal_components

            t = transcripts_from_events(spark, sf_dir)
            te = temporal_edges(graph(), t)
            temporal_components(graph(), te, max_iterations=3)
            write(name, pick(2))
        elif name == "fiedler_round":
            from linkgraph_spark.kernels.spectral import fiedler_sweep

            fiedler_sweep(graph(), iterations=3)
            write(name, pick(2))
        elif name == "graphlet_census4":
            from linkgraph_spark.kernels.graphlets import graphlet_census4

            import linkgraph_spark.kernels.graphlets as gl

            # hook the final localCheckpoint by explaining the pre-checkpoint
            # plan: rebuild the identical DataFrame via the module's code
            # path, then explain the result it checkpoints
            df = graphlet_census4(graph())
            # the returned df is a checkpoint scan; the interesting plan is
            # captured by explaining the module's internal construction —
            # dump what we can plus the executed shape marker
            write(name, explain_str(df))
        elif name == "salsa_round":
            from linkgraph_spark.kernels import salsa

            salsa(graph(), iterations=2)
            write(name, pick(2))
        elif name == "hyperball_round":
            from linkgraph_spark.kernels import hyperball

            hyperball(graph(), max_r=3)
            write(name, pick(2))
        elif name == "coloring_round":
            from linkgraph_spark.kernels import greedy_coloring

            greedy_coloring(graph())
            write(name, pick(2))
        elif name == "matching_round":
            from linkgraph_spark.kernels import maximal_matching

            maximal_matching(graph())
            write(name, pick(2))
        elif name == "msf_round":
            from dataclasses import replace as _dc_replace

            from pyspark.sql import functions as F

            from linkgraph_spark.kernels import boruvka_msf

            g = graph()
            gw = _dc_replace(
                g,
                edges=g.edges.withColumn(
                    "weight", ((F.col("src") * 7 + F.col("dst") * 13) % 97) / F.lit(10.0)
                ),
            )
            boruvka_msf(gw)
            write(name, pick(2))
        elif name == "onion_round":
            from linkgraph_spark.kernels.kcore import onion_decomposition

            onion_decomposition(graph())
            write(name, pick(3))
        elif name == "ktruss_round":
            from linkgraph_spark.kernels import k_truss

            k_truss(graph(), k=3)
            write(name, pick(1))
        elif name == "dbscan":
            from linkgraph_spark.functions.similarity import dbscan

            embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            df = dbscan(embs, threshold=0.35, min_pts=3)
            n = len(rotate_plans)
            write(name, (rotate_plans[min(2, n - 1)] if n else "") or explain_str(df))
        elif name == "etl_build_graph":
            from linkgraph_spark.edges import build_graph as bg

            g = bg(transcripts_from_events(spark, sf_dir))
            write(name, explain_str(g.edges) + "\n--- degrees ---\n" + explain_str(g.degrees))
            g.unpersist()
        else:
            print(f"unknown plan target {name}", file=sys.stderr)

    lineage.RotatingState.rotate = orig_rotate


if __name__ == "__main__":
    main()
