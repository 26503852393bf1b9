"""SparkSession factory with scale-appropriate defaults.

Locally this runs one JVM (``local[N]``); the confs are chosen so the same
code submitted via ``spark-submit --py-files`` to a multi-executor cluster
only needs ``shuffle_partitions`` retuned (O(cluster cores × 2-3)).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def pinned_superstep_confs(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int = 0,
    force_big: bool | None = None,
):
    """Pin the session confs every iterative superstep loop wants, restore
    them on ANY exit (measured −25-43% wall across 55k-3M-edge graphs):

    - AQE off: per-superstep re-planning costs more than it saves once the
      loop's plan shape is fixed;
    - small states: shuffle partitions scaled to the data (min 8), not the
      core count — 32 near-empty reducers are pure task overhead;
    - big states (>5M edges / >2M vertices): auto-broadcast off so the
      pinned shuffle-hash/sort joins are never replaced by re-broadcasting
      O(V) state every superstep.

    Yields ``big_state`` so callers can pick join hints to match.
    ``force_big`` overrides the size heuristic — it exists so tests can
    value-verify the big-state plan regime (shuffle-hash gather, AQE off,
    no broadcast) on small oracle graphs, not just at bench scale.
    """
    big = (
        force_big
        if force_big is not None
        else n_edges > 5_000_000 or n_vertices > 2_000_000
    )
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    )
    saved = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if big:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    else:
        sp_cur = int(saved["spark.sql.shuffle.partitions"])
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(sp_cur, max(8, n_edges // 100_000)))
        )
    try:
        yield big
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def get_spark(
    app_name: str = "linkgraph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the link-graph workload.

    AQE is on (runtime coalescing + skew-join splitting — the automatic half
    of our skew story; the explicit half is hub-broadcast in ``skew.py``).
    Arrow is on for the pandas-UDF CSR gather path. Timezone pinned UTC so
    results compare bit-for-bit with DuckDB oracles.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # NOTE: bigger is NOT better here — a 48g G1 heap showed 1-12s GC /
        # page-commit stalls per superstep; 12g runs steady (measured 4x
        # faster end-to-end on a 10M-edge PageRank)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
    )
    # shuffle spill to tmpfs when available: local-mode stand-in for the
    # fast local SSDs a real cluster's shuffle service would use
    if os.path.isdir("/dev/shm"):
        shuffle_dir = "/dev/shm/spark-local"
        os.makedirs(shuffle_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", shuffle_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
