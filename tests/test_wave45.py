"""Wave-45 operators: k-means elbow curve, event-type user-base Jaccard,
tool conversation-set Jaccard."""

import datetime

import pytest

from linkgraph_spark.functions.events import type_user_jaccard
from linkgraph_spark.kernels.kmeans import elbow_curve
from linkgraph_spark.transcripts import tool_jaccard


# ------------------------------------------------------------------ elbow_curve
def test_elbow_curve_monotone_and_exact_fit(spark):
    # 4 points = 4 clusters at k=4: inertia hits 0; inertia non-increasing
    vecs = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]]
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.k: r.inertia for r in elbow_curve(df, ks=(2, 4), iterations=3).collect()}
    assert got[4] == 0.0
    assert got[2] >= got[4]
    with pytest.raises(ValueError):
        elbow_curve(df, ks=())


# ------------------------------------------------------------ type_user_jaccard
def test_type_user_jaccard_hand(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (0, t0, 1, "view", 0.0),
        (1, t0, 1, "click", 0.0),
        (2, t0, 2, "view", 0.0),
        (3, t0, 3, "buy", 0.0),
        (4, t0, 1, "view", 0.0),  # duplicate (type,user) collapses
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        (r.type_a, r.type_b): r for r in type_user_jaccard(df).collect()
    }
    assert got[("click", "view")].inter == 1
    assert got[("click", "view")].jaccard == 0.5  # {1} / {1,2}
    assert got[("buy", "view")].inter == 0 and got[("buy", "view")].jaccard == 0.0
    assert len(got) == 3  # all C(3,2) pairs present


# ----------------------------------------------------------------- tool_jaccard
def test_tool_jaccard_hand(spark):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "assistant", "x", "search", t0),
        ("c1", 1, "assistant", "x", "code", t0),
        ("c2", 0, "assistant", "x", "search", t0),
        ("c3", 0, "assistant", "x", "calc", t0),
        ("c1", 2, "assistant", "x", "search", t0),  # dup (tool, conv)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {(r.tool_a, r.tool_b): r for r in tool_jaccard(df).collect()}
    assert got[("code", "search")].inter == 1
    assert got[("code", "search")].jaccard == 0.5  # {c1} / {c1,c2}
    assert got[("calc", "code")].jaccard == 0.0
    assert len(got) == 3
