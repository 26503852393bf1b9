"""Wave-18 operators: greedy k-center coreset selection and the spectral
(Fiedler) bisection sweep."""

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.kmeans import kcenter
from linkgraph_spark.kernels.spectral import fiedler_sweep


def _r(x: float, n: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), ROUND_HALF_UP))


# ------------------------------------------------------------------- kcenter
def _kcenter_ref(vecs: dict, k: int):
    """Pure-python greedy farthest-point replay (same rounding/ties,
    float32 storage semantics)."""
    vecs = {i: _f32(v) for i, v in vecs.items()}
    sel = [min(vecs)]
    rows = [(1, sel[0], 0.0)]
    for r in range(2, k + 1):
        best = None
        for vid, v in vecs.items():
            if vid in sel:
                continue
            d2 = _r(
                min(
                    sum((x - y) * (x - y) for x, y in zip(v, vecs[s]))
                    for s in sel
                ),
                9,
            )
            if best is None or d2 > best[1] or (d2 == best[1] and vid < best[0]):
                best = (vid, d2)
        sel.append(best[0])
        rows.append((r, best[0], best[1]))
    return rows


def _f32(v):
    """Round-trip through float32 — the embedding column's storage type
    (0.1 stored as 0.100000024...), which the reference must replay."""
    import struct

    return [struct.unpack("f", struct.pack("f", float(x)))[0] for x in v]


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )


def test_kcenter_matches_greedy_reference(spark):
    # 3 well-separated blobs + spread: selection must alternate blobs
    vecs = {
        0: [0.0, 0.0], 1: [0.1, 0.0], 2: [0.0, 0.1],
        10: [10.0, 0.0], 11: [10.1, 0.0],
        20: [0.0, 10.0], 21: [0.0, 10.1],
    }
    got = [
        (r.center_rank, r.vec_id, r.dist2)
        for r in kcenter(_emb_df(spark, vecs), k=5).orderBy("center_rank").collect()
    ]
    assert got == pytest.approx(_kcenter_ref(vecs, 5))
    # greedy 2-approx intuition: the first three picks cover all 3 blobs
    first3 = {g[1] for g in got[:3]}
    assert 0 in first3
    assert first3 & {10, 11} and first3 & {20, 21}


def test_kcenter_radius_curve_nonincreasing(spark):
    vecs = {i: [float(i % 7), float((i * 3) % 5)] for i in range(20)}
    rows = kcenter(_emb_df(spark, vecs), k=8).orderBy("center_rank").collect()
    assert [(r.center_rank, r.vec_id, r.dist2) for r in rows] == pytest.approx(
        _kcenter_ref(vecs, 8)
    )
    d = [r.dist2 for r in rows][1:]  # coverage radius shrinks (weakly)
    assert all(a >= b for a, b in zip(d, d[1:]))


def test_kcenter_fewer_vectors_than_k(spark):
    vecs = {0: [0.0], 5: [1.0], 9: [3.0]}
    rows = kcenter(_emb_df(spark, vecs), k=8).collect()
    assert len(rows) == 3
    assert {r.vec_id for r in rows} == {0, 5, 9}


# ------------------------------------------------------------- fiedler sweep
_A = [(a, b) for a in range(4) for b in range(4) if a != b]
_B = [(a + 4, b + 4) for a, b in _A]
_TWO_CLIQUES = _A + _B + [(3, 4), (4, 3)]


def test_fiedler_sweep_finds_the_clique_cut(spark):
    g = graph_from_edges(spark, _TWO_CLIQUES)
    rows = fiedler_sweep(g, iterations=12, top_k=8).collect()
    phis = {r.pos: r.phi for r in rows}
    ids_at_4 = {r.id for r in rows if r.pos <= 4}
    # the Fiedler vector separates the cliques; the min-phi prefix is one
    # whole clique and phi there is the bridge over the clique volume
    assert ids_at_4 in ({0, 1, 2, 3}, {4, 5, 6, 7})
    assert phis[4] == pytest.approx(round(1 / 13, 6), abs=1e-9)
    assert phis[4] == min(p for p in phis.values() if p is not None)
    assert phis[8] is None  # full graph: complement volume 0


def test_fiedler_sweep_ring_halves(spark):
    # 12-ring: any contiguous half has cut 2, vol 12 -> phi 1/6; the
    # spectral order walks the ring so pos-6 prefix IS contiguous
    n = 12
    ring = [(i, (i + 1) % n) for i in range(n)]
    g = graph_from_edges(spark, ring)
    rows = fiedler_sweep(g, iterations=24, top_k=n).collect()
    phis = {r.pos: r.phi for r in rows}
    assert phis[n // 2] == pytest.approx(round(2 / 12, 6), abs=1e-9)
    # the prefix at every pos k<n is contiguous on the ring iff phi == 2/vol
    for k in range(2, n - 1):
        assert phis[k] >= round(2 / (2 * min(k, n - k)), 6) - 1e-9


def test_fiedler_sweep_excludes_isolated_and_requires_edges(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 0), (2, 3), (3, 2)])
    rows = fiedler_sweep(g, iterations=8, top_k=10).collect()
    assert len(rows) == 4  # only vertices with degree > 0 are swept
    import pyspark.sql.utils  # noqa: F401

    empty = graph_from_edges(spark, [(5, 5)])  # self-loop only -> no edges
    with pytest.raises(Exception):
        fiedler_sweep(empty, iterations=4, top_k=4)
