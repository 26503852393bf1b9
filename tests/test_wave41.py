"""Wave-41 operators: first×last-touch attribution paths, split-half
centroid stability (value_concentration reuses rank_concentration's
tested machinery; its gate entry is value-checked by the oracle)."""

import datetime

import pytest

from linkgraph_spark.functions.events import attribution_paths
from linkgraph_spark.functions.similarity import centroid_stability


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _ts(sec):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec)


# ------------------------------------------------------------ attribution_paths
def test_attribution_paths_hand(spark):
    rows = [
        # u1: view → click → purchase  => (view, click)
        (0, _ts(0), 1, "view", 0.0),
        (1, _ts(10), 1, "click", 0.0),
        (2, _ts(20), 1, "purchase", 1.0),
        # u2: purchase first            => (purchase, (none))
        (3, _ts(0), 2, "purchase", 1.0),
        (4, _ts(10), 2, "view", 0.0),
        # u3: never converts            => excluded
        (5, _ts(0), 3, "view", 0.0),
        # u4: view → purchase → click → purchase: closer = view (before FIRST conv)
        (6, _ts(0), 4, "view", 0.0),
        (7, _ts(10), 4, "purchase", 1.0),
        (8, _ts(20), 4, "click", 0.0),
        (9, _ts(30), 4, "purchase", 1.0),
    ]
    got = {
        (r.first_touch, r.last_touch): r.n_users
        for r in attribution_paths(_ev(spark, rows)).collect()
    }
    assert got == {
        ("view", "click"): 1,
        ("purchase", "(none)"): 1,
        ("view", "view"): 1,
    }


def test_attribution_paths_no_converters(spark):
    rows = [(0, _ts(0), 1, "view", 0.0)]
    assert attribution_paths(_ev(spark, rows)).count() == 0


# ----------------------------------------------------------- centroid_stability
def _embs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, (v, l) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )


def test_centroid_stability_coherent_vs_split(spark):
    rows = [
        # label 1: all four near [1, 0] -> halves agree (cos ~ 1)
        ([1.0, 0.0], 1), ([1.0, 0.1], 1), ([1.0, -0.1], 1), ([1.0, 0.05], 1),
        # label 2: even half on x, odd half on y -> orthogonal centroids
        ([1.0, 0.0], 2), ([0.0, 1.0], 2), ([2.0, 0.0], 2), ([0.0, 2.0], 2),
    ]
    got = {r.label: r for r in centroid_stability(_embs(spark, rows)).collect()}
    assert got[1].n_even == 2 and got[1].n_odd == 2
    assert got[1].centroid_cos == pytest.approx(1.0, abs=0.01)
    assert got[2].centroid_cos == pytest.approx(0.0, abs=1e-9)


def test_centroid_stability_single_half_label_absent(spark):
    # label with only an even member produces no joined row
    rows = [([1.0, 0.0], 7)]
    assert centroid_stability(_embs(spark, rows)).count() == 0
