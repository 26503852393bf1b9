"""Wave-90 operators: exact depth-1 CART split (Breiman et al. 1984,
chi-square ≡ Gini identity) and Benjamini–Hochberg FDR (Benjamini &
Hochberg 1995) over per-metric two-proportion A/B z-tests."""

import hashlib
from datetime import datetime

from linkgraph_spark.functions.ml import bh_fdr_metrics, decision_stump

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, v, _TS) for (u, t, v) in rows], _SCHEMA
    )


def _variant(uid):
    # python mirror of functions.hashing.md5_long(user_id) % 2
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def test_stump_hand_computed(spark):
    rows = [
        (1, "purchase", 1.00), (1, "click", 1.00), (1, "purchase", 2.00),
        (1, "click", 3.00), (1, "click", 3.00),
    ]
    r = decision_stump(_ev(spark, rows)).collect()
    assert len(r) == 1
    r = r[0]
    # thr=200: D = 2*2 - 0*3 = 4, J = 16/6; gain = 2*J/25
    assert (r.threshold_cents, r.n_left, r.pos_left, r.n_right, r.pos_right) == (
        200, 3, 2, 2, 0,
    )
    assert r.chi2 == round(16 / 6, 6)
    assert r.gini_gain == round(32 / 150, 6)


def test_stump_tie_breaks_to_smaller_threshold(spark):
    # thr=100 and thr=200 both score J=1/2 -> smaller threshold wins
    rows = [(1, "purchase", 1.0), (1, "click", 2.0), (1, "purchase", 3.0)]
    r = decision_stump(_ev(spark, rows)).collect()[0]
    assert r.threshold_cents == 100
    assert r.chi2 == 0.5


def test_stump_degenerate_single_value(spark):
    rows = [(1, "purchase", 5.0), (2, "click", 5.0)]
    assert decision_stump(_ev(spark, rows)).count() == 0


def test_bh_fdr_flags_the_planted_effect(spark):
    users = list(range(1, 41))
    treat = [u for u in users if _variant(u) == 1]
    ctrl = [u for u in users if _variant(u) == 0]
    assert treat and ctrl  # md5 split covers both arms on 40 users
    rows = [(u, "view", 1.0) for u in users]          # universal: pooled=1
    rows += [(u, "click", 1.0) for u in treat]        # perfect treatment lift
    rows += [(u, "signup", 1.0) for u in treat[:1] + ctrl[:1]]  # near-null
    out = {r.metric: r for r in bh_fdr_metrics(_ev(spark, rows), q=0.1).collect()}
    # universal metric: pooled rate 1 -> degenerate, excluded from the family
    assert out["view"].z is None and out["view"].significant is None
    assert out["view"].bh_rank is None
    # planted effect: strongest z, rank 1, significant under BH at q=0.1
    assert out["click"].bh_rank == 1
    assert out["click"].significant is True
    assert out["click"].z > 3
    assert 0.0 <= out["click"].p < 0.01
    # near-null metric: small |z|, p near 1, not significant
    assert out["signup"].significant is False
    assert out["signup"].p > 0.2
    # ranks are dense over the non-degenerate family
    ranks = sorted(r.bh_rank for r in out.values() if r.bh_rank is not None)
    assert ranks == [1, 2]


def test_bh_p_is_a_probability_and_monotone_in_abs_z(spark):
    users = list(range(1, 61))
    treat = [u for u in users if _variant(u) == 1]
    ctrl = [u for u in users if _variant(u) == 0]
    rows = [(u, "strong", 1.0) for u in treat]
    rows += [(u, "weak", 1.0) for u in treat] + [(u, "weak", 1.0) for u in ctrl[: len(ctrl) // 2]]
    rows += [(u, "base", 1.0) for u in users[: len(users) // 2]]
    out = {r.metric: r for r in bh_fdr_metrics(_ev(spark, rows)).collect()}
    zs = {m: abs(r.z) for m, r in out.items() if r.z is not None}
    ps = {m: r.p for m, r in out.items() if r.p is not None}
    for m in ps:
        assert 0.0 <= ps[m] <= 1.0
    pairs = sorted(zs, key=zs.get)  # ascending |z| -> descending p
    for a, b in zip(pairs, pairs[1:]):
        assert ps[a] >= ps[b]
