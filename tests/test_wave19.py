"""Wave-19 operators: kNN label-noise audit and the Goh–Barabási
burstiness coefficient."""

import math
import statistics

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.functions.events import burstiness
from linkgraph_spark.functions.similarity import label_outliers


# -------------------------------------------------------------- label noise
def _lab_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_label_outliers_flags_the_planted_mislabel(spark):
    # two tight clusters; vec 5 sits in cluster A's region but carries
    # B's label -> agreement 0; everyone else agrees fully
    rows = (
        [(i, [1.0, 0.01 * i, 0.0, 0.0], 0) for i in range(5)]
        + [(5, [1.0, 0.02, 0.001, 0.0], 1)]
        + [(10 + i, [0.0, 0.0, 1.0, 0.01 * i], 1) for i in range(5)]
    )
    got = {
        r.vec_id: (r.n_nbrs, r.n_agree, r.agreement)
        for r in label_outliers(_lab_df(spark, rows), k=3).collect()
    }
    assert got[5][0] == 3 and got[5][2] == 0.0  # the planted mislabel
    for i in range(5):
        assert got[i][2] is not None and got[i][2] <= 1.0
        # cluster-A members may pick up vec 5 (label 1) as a neighbor,
        # but at least 2 of 3 neighbors share their label
        assert got[i][2] >= round(2 / 3, 6) - 1e-9
    for i in range(10, 15):
        assert got[i][2] == 1.0  # cluster B is pure


def test_label_outliers_isolated_vector_is_null(spark):
    # one vector alone in its hyperplane bucket region may still share a
    # bucket; use a single-row table: no possible neighbor
    rows = [(0, [1.0, 0.0], 7)]
    (r,) = label_outliers(_lab_df(spark, rows), k=3).collect()
    assert (r.n_nbrs, r.n_agree, r.agreement) == (0, 0, None)


def test_label_outliers_row_per_vector(spark):
    rows = [(i, [float(i), 1.0], i % 2) for i in range(12)]
    out = label_outliers(_lab_df(spark, rows), k=2).collect()
    assert len(out) == 12 and len({r.vec_id for r in out}) == 12


# --------------------------------------------------------------- burstiness
def _ev_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_burstiness_metronome_is_minus_one(spark):
    # perfectly regular gaps: sigma = 0 -> B = (0-mu)/(0+mu) = -1
    rows = [(i, 1, f"2024-01-01 00:{i:02d}:00", "cron") for i in range(10)]
    (r,) = burstiness(_ev_df(spark, rows)).collect()
    assert r.n_gaps == 9 and r.mean_gap == 60.0 and r.b == -1.0


def test_burstiness_matches_python_stats(spark):
    gaps = [1, 1, 1, 100, 1, 1, 200, 1]  # bursty
    ts, t = [], 0
    for i, gp in enumerate([0] + gaps):
        t += gp
        ts.append((i, 1, t))
    df = spark.createDataFrame(
        [(i, u, s) for i, u, s in ts],
        "event_id long, user_id long, secs long",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds("secs").alias("ts"),
        F.lit("x").alias("event_type"),
    )
    (r,) = burstiness(df).collect()
    mu = statistics.mean(gaps)
    sd = statistics.stdev(gaps)  # sample stddev
    assert r.n_gaps == len(gaps)
    assert r.mean_gap == pytest.approx(round(mu, 6), abs=1e-9)
    assert r.b == pytest.approx(round((sd - mu) / (sd + mu), 6), abs=1e-9)
    assert r.b > 0  # bursty traffic is positive-B


def test_burstiness_single_gap_is_null(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00", "x"),
        (2, 1, "2024-01-01 00:01:00", "x"),
    ]
    (r,) = burstiness(_ev_df(spark, rows)).collect()
    assert r.n_gaps == 1 and r.b is None
