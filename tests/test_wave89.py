"""Wave-89 operators: exact Shapley channel attribution (Shapley 1953;
Dalessandro et al. 2012 multi-touch formulation) and exact tie-aware ROC
AUC via the Mann–Whitney identity (Hanley & McNeil 1982)."""

from datetime import datetime

import pytest

from linkgraph_spark.functions.events import shapley_attribution
from linkgraph_spark.functions.ml import auc_activity_purchase

_SCHEMA = "user_id long, event_type string, ts timestamp"


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, _ts(m)) for (u, t, m) in rows], _SCHEMA
    )


def test_shapley_two_channel_hand_computed(spark):
    # converters: u1={A}, u2={B}, u3={A,B}, u4={} (no touch),
    # u6={} (touch AFTER first purchase — excluded from the coalition);
    # u5 touches A but never converts -> contributes nothing.
    rows = [
        (1, "A", 0), (1, "purchase", 1),
        (2, "B", 0), (2, "purchase", 1),
        (3, "A", 0), (3, "B", 1), (3, "purchase", 2),
        (4, "purchase", 0),
        (5, "A", 0),
        (6, "purchase", 1), (6, "A", 5),
    ]
    out = {
        r.channel: (r.shapley_scaled, r.shapley_conversions)
        for r in shapley_attribution(_ev(spark, rows)).collect()
    }
    # v(∅)=2, v(A)=3, v(B)=3, v(AB)=5; k=2 so φ_A = ½(v(A)-v(∅)) +
    # ½(v(AB)-v(B)) = 1.5 and symmetrically φ_B = 1.5; scaled by k!=2.
    assert out == {"A": (3, 1.5), "B": (3, 1.5)}


def test_shapley_efficiency_and_dominance(spark):
    # A appears in every coalition, C never pre-conversion.
    rows = [
        (1, "A", 0), (1, "purchase", 1),
        (2, "A", 0), (2, "B", 1), (2, "purchase", 2),
        (3, "C", 5),  # non-converter
        (3, "A", 6),
    ]
    out = {r.channel: r.shapley_scaled for r in shapley_attribution(_ev(spark, rows)).collect()}
    # k=2 (A,B): C is never in a converter coalition so it is absent.
    assert set(out) == {"A", "B"}
    # efficiency: Σ scaled = k!·(v(all) − v(∅)) = 2·(2−0) = 4
    assert out["A"] + out["B"] == 4
    assert out["A"] > out["B"]  # A explains both conversions alone


def test_shapley_same_second_touch_counts(spark):
    # touch at the SAME second as the first conversion is inclusive (<=).
    rows = [(1, "A", 1), (1, "purchase", 1)]
    out = shapley_attribution(_ev(spark, rows)).collect()
    assert [(r.channel, r.shapley_scaled) for r in out] == [("A", 1)]


def test_shapley_empty_and_guard(spark):
    assert shapley_attribution(_ev(spark, [(1, "purchase", 0)])).count() == 0
    assert shapley_attribution(_ev(spark, [])).count() == 0
    rows = [(1, f"c{i:02d}", 0) for i in range(13)] + [(1, "purchase", 5)]
    with pytest.raises(ValueError, match="max_channels"):
        shapley_attribution(_ev(spark, rows))


def test_auc_hand_computed_with_ties(spark):
    # scores (non-purchase event counts): u1 pos 3, u2 pos 1, u3 neg 1,
    # u4 neg 2 -> pairs: (3>1)+(3>2)+(1=1 tie ½)+(1<2) = 2.5/4 = 0.625.
    rows = (
        [(1, "click", m) for m in range(3)] + [(1, "purchase", 9)]
        + [(2, "click", 0), (2, "purchase", 9)]
        + [(3, "click", 0)]
        + [(4, "click", 0), (4, "view", 1)]
    )
    r = auc_activity_purchase(_ev(spark, rows)).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_num2, r.auc) == (2, 2, 5, 0.625)


def test_auc_perfect_and_degenerate(spark):
    rows = [(1, "click", 0), (1, "view", 1), (1, "purchase", 9), (2, "click", 0)]
    r = auc_activity_purchase(_ev(spark, rows)).collect()[0]
    assert (r.auc_num2, r.auc) == (2, 1.0)  # 2·n_pos·n_neg·AUC = 2·1·1·1
    # single-class input: auc NULL, integers still reported
    r = auc_activity_purchase(_ev(spark, [(1, "click", 0)])).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (0, 1, None)
