"""Lloyd k-means: sequential-replay oracle + empty-cluster contract."""

from pyspark.sql import Row

from linkgraph_spark.kernels.kmeans import kmeans, kmeans_profile


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def _lloyd_py(vecs, k, iterations):
    """The kernel's exact contract in pure python: init = vec_id<k,
    argmin squared L2 with ties to the lower cluster id, means rounded
    to 9 decimals, empty clusters keep their previous centroid."""

    def sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(cents):
        out = {}
        for i, v in enumerate(vecs):
            best = min(range(k), key=lambda c: (sqd(v, cents[c]), c))
            out[i] = best
        return out

    cents = {c: list(vecs[c]) for c in range(k)}
    for _ in range(iterations):
        a = assign(cents)
        for c in range(k):
            members = [vecs[i] for i, cl in a.items() if cl == c]
            if members:
                cents[c] = [
                    round(sum(m[p] for m in members) / len(members), 9)
                    for p in range(len(vecs[0]))
                ]
    a = assign(cents)
    return cents, {i: (a[i], round(sqd(vecs[i], cents[a[i]]), 6)) for i in a}


FIX = [
    [0.3, 1.7],
    [4.1, -2.2],
    [0.9, 2.3],
    [1.1, 1.2],
    [3.8, -1.7],
    [4.6, -2.9],
    [0.2, 0.8],
    [5.0, -3.3],
]


def test_kmeans_matches_sequential_lloyd(spark):
    _, want = _lloyd_py(FIX, k=2, iterations=3)
    got = {
        r.vec_id: (r.cluster, r.sqdist)
        for r in kmeans(_emb(spark, FIX), k=2, iterations=3).collect()
    }
    assert got == want


def test_kmeans_profile_sizes_match_assignment(spark):
    _, want = _lloyd_py(FIX, k=2, iterations=3)
    sizes = {}
    for cl, _ in want.values():
        sizes[cl] = sizes.get(cl, 0) + 1
    got = {
        r.cluster: r.n_members
        for r in kmeans_profile(_emb(spark, FIX), k=2, iterations=3).collect()
    }
    assert got == sizes


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # duplicate seeds: both centroids init at the origin, every point ties
    # and goes to cluster 0, so cluster 1 empties in round 1 and must KEEP
    # its (0,0) centroid; in round 2 the origin points flip back to the
    # kept centroid while the moved cluster-0 mean claims the far points.
    vecs = [[0.0, 0.0], [0.0, 0.0], [1.0, 0.0], [1.2, 0.0]]
    got = {
        r.vec_id: r.cluster
        for r in kmeans(_emb(spark, vecs), k=2, iterations=2).collect()
    }
    assert got == {0: 1, 1: 1, 2: 0, 3: 0}


def test_kmeans_refuses_missing_seed_ids(spark):
    import pytest

    df = _emb(spark, [[0.0, 1.0]])
    with pytest.raises(ValueError, match="vec_id 0..3"):
        kmeans(df, k=4, iterations=1).collect()


def test_kmeans_plan_assignment_is_shuffle_free(spark):
    """Scale shape: the final assignment embeds the codebook as literals,
    so its plan must be a pure projection — NO exchange of any kind (the
    vector table is never shuffled or joined) and no row-Python eval."""
    df = _emb(spark, FIX)
    out = kmeans(df, k=2, iterations=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle, no broadcast build either
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
