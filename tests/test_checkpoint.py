import os
import shutil

import pytest

from linkgraph_spark.checkpoint import CheckpointStore
from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels import pagerank
from tests.fixtures_graphs import web64


@pytest.fixture
def store(tmp_path):
    return CheckpointStore(str(tmp_path / "ck"))


def ranks_dict(res):
    return {r["id"]: r["rank"] for r in res.ranks.collect()}


def test_checkpoint_resume_identical(spark, store, tmp_path):
    """FIXTURES.md F4: kill after superstep k, resume, identical final vector."""
    g = graph_from_edges(spark, web64(n=40))
    full = ranks_dict(pagerank(g, mode="compat", iterations=6, checkpoint=store))
    # simulate a crash: wipe iterations 4..6, resume from 3
    for k in (4, 5, 6):
        shutil.rmtree(
            f"{store.base}/pagerank_compat/state/iteration={k}", ignore_errors=True
        )
    assert store.latest_iteration("pagerank_compat") == 3
    resumed = ranks_dict(
        pagerank(g, mode="compat", iterations=6, checkpoint=store, resume=True)
    )
    # allclose, not bit-equal: the resumed state is parquet-loaded with a
    # different partitioning, so float partial-sum MERGE order can differ
    # at the last bit (~1e-16) — far inside the 1e-6 north-rule tolerance
    assert set(resumed) == set(full)
    assert all(abs(resumed[k] - full[k]) < 1e-12 for k in full)
    g.unpersist()


def test_uncommitted_iteration_ignored(spark, store):
    """Snapshot-isolation analogue: a state dir without its _COMMIT manifest
    is invisible to resume (the capability the reference's byte-range locks
    protect — file_write_parallel/efs_with_lambda/lambda_function_lock.py)."""
    g = graph_from_edges(spark, web64(n=30))
    pagerank(g, mode="compat", iterations=3, checkpoint=store)
    # fake a torn write of iteration 4: data present, no commit manifest
    src = f"{store.base}/pagerank_compat/state/iteration=3"
    dst = f"{store.base}/pagerank_compat/state/iteration=4"
    shutil.copytree(src, dst)
    os.remove(f"{dst}/_COMMIT")
    assert store.latest_iteration("pagerank_compat") == 3
    with pytest.raises(FileNotFoundError):
        store.load_state(spark, "pagerank_compat", 4)
    g.unpersist()


def test_metrics_and_lineage_recorded(spark, store):
    g = graph_from_edges(spark, web64(n=30))
    pagerank(g, mode="compat", iterations=2, checkpoint=store)
    metrics = store.load_metrics(spark, "pagerank_compat")
    assert metrics.count() == 2
    lineage = store.load_lineage(spark, "pagerank_compat")
    rows = lineage.collect()
    assert {r["iteration"] for r in rows} == {1, 2}
    n = g.num_vertices
    per_iter = {}
    for r in rows:
        per_iter[r["iteration"]] = per_iter.get(r["iteration"], 0) + r["rows"]
    assert all(v == n for v in per_iter.values())
    g.unpersist()


def test_iceberg_backend_capability_gated(spark, tmp_path):
    """No Iceberg jars/catalog in this environment: the capability probe
    must say so and construction must fail LOUDLY (never a silent fallback
    to uncommitted writes)."""
    import pytest as _pytest

    from linkgraph_spark.checkpoint import IcebergCheckpointStore, iceberg_available

    assert iceberg_available(spark) is False
    with _pytest.raises(RuntimeError, match="Iceberg"):
        IcebergCheckpointStore("ck.state")


def test_iceberg_lineage_projection_from_files_metadata(spark):
    """IcebergCheckpointStore.load_lineage is a projection of the
    ``{table}.files`` metadata table; the projection itself is pure plan
    construction, driven here with a synthesized ``.files``-shaped frame
    (real metadata reads need the absent jars — only that read is
    environmental)."""
    from linkgraph_spark.checkpoint import _lineage_from_files

    files = spark.createDataFrame(
        [
            (("pagerank", 1), "s3://b/t/data/f1.parquet", 100, ((5, 900),)),
            (("pagerank", 1), "s3://b/t/data/f0.parquet", 50, ((0, 499),)),
            (("pagerank", 2), "s3://b/t/data/f2.parquet", 150, ((0, 900),)),
            (("components", 1), "s3://b/t/data/f3.parquet", 7, ((0, 6),)),
        ],
        "partition struct<kernel:string, iteration:int>, file_path string, "
        "record_count long, "
        "readable_metrics struct<id:struct<lower_bound:long, upper_bound:long>>",
    )
    got = {
        (r["iteration"], r["partition_id"]): (r["rows"], r["min_key"], r["max_key"])
        for r in _lineage_from_files(files, "pagerank", key_col="id").collect()
    }
    # file ordinal within iteration orders by path; other kernels excluded
    assert got == {
        (1, 0): (50, 0, 499),
        (1, 1): (100, 5, 900),
        (2, 0): (150, 0, 900),
    }
    # without a key_col (or bounds column), key spans are null, rows survive
    nb = _lineage_from_files(files.drop("readable_metrics"), "pagerank", "id")
    assert all(r["min_key"] is None for r in nb.collect())


class FakeCheckpointStore:
    """In-memory object exposing exactly the protocol surface the kernels
    call (write_state / latest_iteration / load_state) — the contract test
    proving kernels are truly backend-agnostic (the IcebergCheckpointStore
    shape works without Iceberg jars ever loading)."""

    def __init__(self):
        self.states: dict = {}  # (kernel, iteration) -> list[Row]
        self.metrics: dict = {}

    def write_state(self, kernel, iteration, state, key_col, metrics=None):
        self.states[(kernel, iteration)] = (state.schema, state.collect())
        self.metrics[(kernel, iteration)] = dict(metrics or {})

    def committed_iterations(self, kernel):
        return sorted(i for k, i in self.states if k == kernel)

    def latest_iteration(self, kernel):
        its = self.committed_iterations(kernel)
        return its[-1] if its else None

    def load_state(self, spark, kernel, iteration):
        schema, rows = self.states[(kernel, iteration)]
        return spark.createDataFrame(rows, schema)


def test_fake_backend_contract_pagerank_and_components_resume(spark):
    """Kernels must run + resume against ANY object with the store protocol,
    not just CheckpointStore — the backend-agnostic contract the Iceberg
    store relies on (its happy path can't execute without jars)."""
    from linkgraph_spark.kernels import connected_components

    g = graph_from_edges(spark, web64(n=40))
    fake = FakeCheckpointStore()
    full = ranks_dict(pagerank(g, mode="compat", iterations=6, checkpoint=fake))
    assert fake.latest_iteration("pagerank_compat") == 6
    # crash: forget iterations 4..6, resume from 3
    for k in (4, 5, 6):
        del fake.states[("pagerank_compat", k)]
    resumed = ranks_dict(
        pagerank(g, mode="compat", iterations=6, checkpoint=fake, resume=True)
    )
    assert set(resumed) == set(full)
    assert all(abs(resumed[k] - full[k]) < 1e-12 for k in full)

    fake2 = FakeCheckpointStore()
    want = {
        (r["id"], r["component"])
        for r in connected_components(g, checkpoint=fake2).labels.collect()
    }
    latest = fake2.latest_iteration("components")
    for k in fake2.committed_iterations("components")[1:]:
        del fake2.states[("components", k)]
    got = {
        (r["id"], r["component"])
        for r in connected_components(g, checkpoint=fake2, resume=True).labels.collect()
    }
    assert got == want and latest is not None
    g.unpersist()


def test_mis_and_coloring_resume(spark, tmp_path):
    """MIS and coloring resume from the latest committed round and end with
    exactly the uninterrupted run's result (both are deterministic
    functions of the snapshotted state)."""
    import shutil

    from linkgraph_spark.checkpoint import CheckpointStore
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels import greedy_coloring, maximal_independent_set

    g = graph_from_edges(spark, web64(n=40))
    for name, run in (
        ("mis", lambda **kw: maximal_independent_set(g, max_iterations=20, **kw)),
        ("coloring", lambda **kw: greedy_coloring(g, max_iterations=40, **kw)),
    ):
        store = CheckpointStore(str(tmp_path / f"{name}_ck"))
        full = run(checkpoint=store)
        assert full.converged
        col = "status" if name == "mis" else "color"
        want = {(r["id"], r[col]) for r in (full.labels if name == "mis" else full.colors).collect()}
        its = store.committed_iterations(name)
        assert len(its) >= 2
        for k in its[1:]:  # crash: forget all but the first round
            shutil.rmtree(tmp_path / f"{name}_ck" / name / "state" / f"iteration={k}")
        resumed = run(checkpoint=store, resume=True)
        assert resumed.converged
        got = {(r["id"], r[col]) for r in (resumed.labels if name == "mis" else resumed.colors).collect()}
        assert got == want
    g.unpersist()


def test_star_components_resume(spark, tmp_path):
    """connected_components_star resumes from the latest committed round's
    pointer set and ends with the same labels as the uninterrupted run."""
    from linkgraph_spark.checkpoint import CheckpointStore
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels import connected_components_star

    path = [(i, i + 1) for i in range(16)] + [(30, 31)]
    g = graph_from_edges(spark, path)
    store = CheckpointStore(str(tmp_path / "star_ck"))
    full = connected_components_star(g, checkpoint=store)
    assert full.converged
    want = {(r["id"], r["component"]) for r in full.labels.collect()}
    # resume from the first committed round only
    import shutil

    for k in store.committed_iterations("components_star")[1:]:
        shutil.rmtree(f"{store.base}/components_star/state/iteration={k}")
    resumed = connected_components_star(g, checkpoint=store, resume=True)
    assert resumed.converged
    got = {(r["id"], r["component"]) for r in resumed.labels.collect()}
    assert got == want
    g.unpersist()


def test_temporal_reach_resume(spark, store):
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels import temporal_reachability

    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)])
    te = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 6), (2, 3, 7)], "src long, dst long, ts long"
    )
    full = temporal_reachability(g, te, sources=[0], checkpoint=store)
    assert full.converged
    want = {r["id"]: r["arrival"] for r in full.arrivals.collect()}

    # resume from the latest committed round: load-only, identical values
    resumed = temporal_reachability(
        g, te, sources=[0], checkpoint=store, resume=True
    )
    assert resumed.converged and resumed.iterations >= full.iterations
    got = {r["id"]: r["arrival"] for r in resumed.arrivals.collect()}
    assert got == want
    g.unpersist()


def test_hyperball_resume_sketches_roundtrip(spark, store):
    from linkgraph_spark.edges import graph_from_edges
    from linkgraph_spark.kernels import hyperball

    g = graph_from_edges(spark, [(i, (i + 1) % 8) for i in range(8)])
    full = hyperball(g, max_r=8, checkpoint=store)
    assert full.converged
    want = {
        r["id"]: (r["ball_est"], r["harmonic_est"])
        for r in full.centrality.collect()
    }
    # resume: the HLL sketch bytes reload from parquet and the sweep
    # continues from the committed radius, landing on identical estimates
    resumed = hyperball(g, max_r=8, checkpoint=store, resume=True)
    got = {
        r["id"]: (r["ball_est"], r["harmonic_est"])
        for r in resumed.centrality.collect()
    }
    assert got == want
    g.unpersist()
