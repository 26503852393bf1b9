"""Wave-46 operators: PQ reconstruction distortion, repeat-purchase
loyalty histogram."""

import datetime

import pytest

from linkgraph_spark.functions.events import repeat_purchase
from linkgraph_spark.kernels.kmeans import pq_distortion


# ---------------------------------------------------------------- pq_distortion
def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_pq_distortion_exact_codebook_zero(spark):
    # 2 vectors, k=2: every vector IS a centroid -> zero distortion
    df = _embs(spark, [[0.0, 0.0, 1.0, 1.0], [5.0, 5.0, 9.0, 9.0]])
    r = pq_distortion(df, subvectors=2, k=2, iterations=2).collect()[0]
    assert r.n_vectors == 2 and r.subvectors == 2
    assert r.total_sq == 0.0 and r.mse_per_dim == 0.0


def test_pq_distortion_positive_and_bounded(spark):
    df = _embs(spark, [[0, 0], [1, 0], [4, 4], [5, 4], [0, 1], [9, 9]])
    r = pq_distortion(df, subvectors=2, k=2, iterations=2).collect()[0]
    assert r.n_vectors == 6
    assert r.total_sq > 0
    assert r.mse_per_dim == pytest.approx(r.total_sq / 6 / 2, abs=1e-6)


def test_pq_distortion_rejects_bad_split(spark):
    df = _embs(spark, [[1.0, 2.0, 3.0]])
    with pytest.raises(ValueError):
        pq_distortion(df, subvectors=2)


# -------------------------------------------------------------- repeat_purchase
def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_repeat_purchase_hand(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (0, t0, 1, "purchase", 10.0),
        (1, t0, 1, "purchase", 20.0),   # u1: 2 purchases, value 30
        (2, t0, 2, "purchase", 5.0),    # u2: 1 purchase, value 5
        (3, t0, 3, "view", 0.0),        # u3: never purchases
    ]
    got = {r.n_purchases: r for r in repeat_purchase(_ev(spark, rows)).collect()}
    assert got[0].n_users == 1 and got[0].value_share == 0.0
    assert got[1].n_users == 1 and got[1].value_share == pytest.approx(
        round(5 / 35, 6)
    )
    assert got[2].n_users == 1 and got[2].value_share == pytest.approx(
        round(30 / 35, 6)
    )
    assert sum(r.user_share for r in got.values()) == pytest.approx(1.0, abs=1e-5)


def test_repeat_purchase_no_purchases(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [(0, t0, 1, "view", 0.0), (1, t0, 2, "view", 0.0)]
    got = repeat_purchase(_ev(spark, rows)).collect()
    assert len(got) == 1 and got[0].n_purchases == 0
    assert got[0].user_share == 1.0 and got[0].value_share == 0.0
