"""Wave-55 operators: Two-NN intrinsic dimension, sampled pair-cosine
histogram, temporal-split leakage audit."""

import datetime
import math

import pytest

from linkgraph_spark.functions.events import time_split_audit
from linkgraph_spark.functions.similarity import intrinsic_dim, pair_cosine_hist


# ----------------------------------------------------------------- intrinsic_dim
def test_intrinsic_dim_matches_pure_python(spark):
    # irregular 1-D positions (a lattice would give mu=1 everywhere and
    # break the MLE by design); mirror the estimator in pure python
    pos = [0.0, 1.0, 3.0, 7.0, 15.0, 31.0, 63.0, 100.0]
    embs = spark.createDataFrame(
        [(i, [p, 2.0 * p]) for i, p in enumerate(pos)],
        "vec_id long, embedding array<float>",
    )
    scale = math.sqrt(5.0)  # |(p, 2p)| spacing factor
    logs = []
    for i, p in enumerate(pos):
        ds = sorted(
            round(abs(p - q) * scale, 9) for j, q in enumerate(pos) if j != i
        )
        if ds[0] > 0:
            logs.append(math.log(ds[1] / ds[0]))
    want = round(len(logs) / sum(logs), 6)
    r = intrinsic_dim(embs, n_queries=8).collect()[0]
    assert r.n_used == len(logs)
    assert r.intrinsic_dim == pytest.approx(want, abs=2e-6)


def test_intrinsic_dim_excludes_duplicates(spark):
    # probe with r1 = 0 (exact duplicate) must be dropped, not poison the MLE
    embs = spark.createDataFrame(
        [(0, [0.0]), (1, [0.0]), (2, [1.0]), (3, [3.0]), (4, [7.0])],
        "vec_id long, embedding array<float>",
    )
    r = intrinsic_dim(embs, n_queries=5).collect()[0]
    # vec 0 and 1 are duplicates of each other -> both probes excluded
    assert r.n_used == 3
    assert r.intrinsic_dim is not None and r.intrinsic_dim > 0


def test_intrinsic_dim_lattice_null(spark):
    # equally spaced points: r2/r1 = 1 for interior probes is possible but
    # a 2-point set has no second neighbor at all -> n_used = 0 -> NULL
    embs = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, embedding array<float>"
    )
    r = intrinsic_dim(embs, n_queries=2).collect()[0]
    assert r.n_used == 0
    assert r.intrinsic_dim is None


# -------------------------------------------------------------- pair_cosine_hist
def test_pair_cosine_hist_orthogonal_and_identical(spark):
    embs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.bucket_lo: r for r in pair_cosine_hist(embs, n_sample=3).collect()}
    # pairs: (0,1) cos 0 -> bucket 0.0; (0,2) cos 1 -> clamped 0.9; (1,2) 0.0
    assert rows[0.0].n_pairs == 2
    assert rows[0.9].n_pairs == 1
    assert sum(r.share for r in rows.values()) == pytest.approx(1.0, abs=1e-5)


def test_pair_cosine_hist_negative_bucket(spark):
    embs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = pair_cosine_hist(embs, n_sample=2).collect()
    assert len(rows) == 1
    assert rows[0].bucket_lo == pytest.approx(-1.0)


def test_pair_cosine_hist_sample_bounds_pairs(spark):
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = pair_cosine_hist(embs, n_sample=16).collect()
    assert sum(r.n_pairs for r in rows) == 16 * 15 // 2


# -------------------------------------------------------------- time_split_audit
def _ev(i, u, s):
    return (i, datetime.datetime.utcfromtimestamp(s), u, "view", 1.0)


EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def test_time_split_audit_hand(spark):
    # 5 events at t=0..4; 0.8-quantile of [0..4] = 3.2 -> train = t<=3.2
    ev = spark.createDataFrame(
        [_ev(0, 1, 0), _ev(1, 1, 1), _ev(2, 2, 2), _ev(3, 2, 3), _ev(4, 1, 4)],
        EV_SCHEMA,
    )
    r = time_split_audit(ev, train_frac=0.8).collect()[0]
    assert r.cutoff_s == pytest.approx(3.2)
    assert r.n_train == 4 and r.n_test == 1
    assert r.n_users_train == 2 and r.n_users_test == 1
    # user 1 appears in both halves -> full leakage
    assert r.n_users_both == 1
    assert r.user_leakage == pytest.approx(1.0)


def test_time_split_audit_no_leakage(spark):
    # disjoint users across the split
    ev = spark.createDataFrame(
        [_ev(0, 1, 0), _ev(1, 1, 1), _ev(2, 1, 2), _ev(3, 1, 3), _ev(4, 9, 100)],
        EV_SCHEMA,
    )
    r = time_split_audit(ev, train_frac=0.8).collect()[0]
    assert r.n_users_both == 0
    assert r.user_leakage == pytest.approx(0.0)


def test_time_split_audit_validates_frac(spark):
    ev = spark.createDataFrame([_ev(0, 1, 0)], EV_SCHEMA)
    with pytest.raises(ValueError):
        time_split_audit(ev, train_frac=1.0)
    with pytest.raises(ValueError):
        time_split_audit(ev, train_frac=0.0)
