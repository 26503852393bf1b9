"""FIXTURES.md F4 invariant & property checks."""

import math

from pyspark.sql import functions as F

from linkgraph_spark.config import EngineConfig
from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.edges import build_graph, graph_from_edges
from linkgraph_spark.kernels import connected_components, pagerank, triangle_count
from linkgraph_spark.transcripts import synthesize_transcripts
from tests.fixtures_graphs import web64


def _with_shuffle_partitions(spark, n):
    class _Ctx:
        def __enter__(self):
            self.old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(n))

        def __exit__(self, *a):
            spark.conf.set("spark.sql.shuffle.partitions", self.old)

    return _Ctx()


def test_determinism_across_parallelism(spark):
    """Same inputs at different shuffle parallelism: integer results (ids,
    components, triangles) are EXACTLY equal; floating ranks agree to 1e-12
    (double summation order varies with partitioning — exact int state and
    deterministic id assignment are what the engine guarantees)."""
    results = {}
    for parts in (3, 13):
        with _with_shuffle_partitions(spark, parts):
            t = synthesize_transcripts(spark, n_convs=40, min_turns=2, max_turns=20)
            g = build_graph(t)
            ids = {r["actor_key"]: r["id"] for r in g.vertices.collect()}
            comps = {r["id"]: r["component"] for r in connected_components(g).labels.collect()}
            tris = triangle_count(g)
            ranks = {
                r["id"]: r["rank"] for r in pagerank(g, mode="compat").ranks.collect()
            }
            results[parts] = (ids, comps, tris, ranks)
            g.unpersist()
    a, b = results[3], results[13]
    assert a[0] == b[0], "actor id assignment must be parallelism-invariant"
    assert a[1] == b[1]
    assert a[2] == b[2]
    assert set(a[3]) == set(b[3])
    for k in a[3]:
        assert math.isclose(a[3][k], b[3][k], abs_tol=1e-12)


def test_skewed_fixture_salting_equivalence(spark):
    """Hub conv (~100x degree): ranks identical with and without the skew
    machinery (salting + hub broadcast) — FIXTURES.md F4."""
    t = synthesize_transcripts(spark, n_convs=60, min_turns=2, max_turns=15, hub_turns=1500)
    g = build_graph(t)
    cfg = EngineConfig(hub_degree_threshold=2, salt_buckets=4)
    plain = {
        r["id"]: r["rank"]
        for r in pagerank(
            g, mode="textbook", iterations=6, use_hub_broadcast=False, use_salting=False
        ).ranks.collect()
    }
    skewed = {
        r["id"]: r["rank"]
        for r in pagerank(
            g, mode="textbook", iterations=6, config=cfg,
            use_hub_broadcast=True, use_salting=True,
        ).ranks.collect()
    }
    assert set(plain) == set(skewed)
    for k in plain:
        assert math.isclose(plain[k], skewed[k], abs_tol=1e-12)
    g.unpersist()


def test_gather_path_has_no_row_python(spark):
    """north_star / input_hint mandate: no per-row Python in the hot path.
    The builtin gather plan must contain no Python eval at all; the CSR path
    must be Arrow-vectorized (FlatMapGroupsInPandas), never BatchEvalPython."""
    from linkgraph_spark.csr import csr_block_sum
    from linkgraph_spark.skew import gather_contribs, plain_sum

    g = graph_from_edges(spark, web64())
    deg = g.degrees.select(F.col("id").alias("src"), F.col("out_deg").alias("div"))
    edges_div = g.edges.join(deg, "src").select("src", "dst", "div")
    ranks = g.degrees.select("id", F.lit(0.1).alias("rank"))

    builtin_plan = plain_sum(gather_contribs(edges_div, ranks))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in builtin_plan
    assert "ArrowEvalPython" not in builtin_plan  # fully JVM-side

    csr_plan = csr_block_sum(gather_contribs(edges_div, ranks))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in csr_plan  # row-python never allowed
    assert "FlatMapGroupsInPandas" in csr_plan  # Arrow-vectorized reduce
    g.unpersist()


def test_text_equality_through_checkpoint_resume(spark, tmp_path):
    """Per-turn text survives the full pipeline INCLUDING a checkpoint/
    resume cycle byte-identically under stable (conv_id, turn_idx) order."""
    t = synthesize_transcripts(spark, n_convs=15, min_turns=2, max_turns=10)
    before = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.orderBy("conv_id", "turn_idx").collect()
    ]
    g = build_graph(t)
    store = CheckpointStore(str(tmp_path / "ck"))
    pagerank(g, mode="compat", iterations=2, checkpoint=store)
    pagerank(g, mode="compat", iterations=4, checkpoint=store, resume=True)
    after = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.orderBy("conv_id", "turn_idx").collect()
    ]
    assert before == after
    g.unpersist()
