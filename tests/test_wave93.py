"""Wave-93 operators: holdout Brier score (Brier 1950) and reliability
bins (Murphy 1973 decomposition) over the deterministic md5 user split —
score-conditional rate model fit on train, evaluated on test."""

import hashlib
from datetime import datetime

from linkgraph_spark.functions.ml import brier_holdout, calibration_bins

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, 1.0, _TS) for (u, t) in rows], _SCHEMA
    )


def _variant(uid):
    # python mirror of functions.hashing.md5_long(user_id) % 2
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def _split(pool, need_train, need_test):
    tr = [u for u in pool if _variant(u) == 0][:need_train]
    te = [u for u in pool if _variant(u) == 1][:need_test]
    assert len(tr) == need_train and len(te) == need_test
    return tr, te


def _user(uid, score, y):
    rows = [(uid, "click")] * score
    if y:
        rows.append((uid, "purchase"))
    if not rows:  # score 0, y=0 still needs presence in the table
        rows.append((uid, "view"))
    return rows


def test_brier_perfectly_calibrated_is_zero(spark):
    tr, te = _split(range(1, 40), 4, 4)
    rows = []
    # train: score 2 -> always positive; score 1 -> never positive
    for u in tr[:2]:
        rows += _user(u, 2, True)
    for u in tr[2:]:
        rows += _user(u, 1, False)
    # test mirrors the same deterministic outcome per score
    for u in te[:2]:
        rows += _user(u, 2, True)
    for u in te[2:]:
        rows += _user(u, 1, False)
    r = brier_holdout(_ev(spark, rows)).collect()[0]
    assert (r.n_train, r.n_test) == (4, 4)
    assert r.base_rate_nano == 500_000_000
    assert r.brier == 0.0


def test_brier_hand_computed_with_fallback(spark):
    tr, te = _split(range(1, 60), 4, 3)
    rows = []
    # train: score 1 with rate 3/4 -> r_nano = 750000000; global rate 3/4
    for u in tr[:3]:
        rows += _user(u, 1, True)
    rows += _user(tr[3], 1, False)
    # test: two score-1 users (one pos, one neg) + one UNSEEN score 5 (neg)
    rows += _user(te[0], 1, True)
    rows += _user(te[1], 1, False)
    rows += _user(te[2], 5, False)
    r = brier_holdout(_ev(spark, rows)).collect()[0]
    assert (r.n_train, r.n_test, r.base_rate_nano) == (4, 3, 750_000_000)
    # errors (nano): pos@0.75 -> -.25e9; neg@0.75 -> .75e9; fallback .75e9
    num = 250_000_000**2 + 750_000_000**2 * 2
    assert r.brier == round(num / (1e18 * 3), 6)


def test_brier_null_when_a_half_is_empty(spark):
    # all users in the test half -> no train rows -> NULL brier
    te_only = [u for u in range(1, 40) if _variant(u) == 1][:3]
    rows = []
    for u in te_only:
        rows += _user(u, 1, True)
    r = brier_holdout(_ev(spark, rows)).collect()[0]
    assert r.n_train == 0 and r.n_test == 3
    assert r.brier is None and r.base_rate_nano is None
    # and the bins drop unpredictable rows entirely
    assert calibration_bins(_ev(spark, rows)).count() == 0


def test_calibration_bins_hand_computed(spark):
    tr, te = _split(range(1, 80), 6, 4)
    rows = []
    # train: score 1 rate 1/3 (bin 3); score 2 rate 1.0 (clamps to bin 9)
    rows += _user(tr[0], 1, True)
    rows += _user(tr[1], 1, False)
    rows += _user(tr[2], 1, False)
    for u in tr[3:6]:
        rows += _user(u, 2, True)
    # test: two score-1 users (one pos), two score-2 users (both pos)
    rows += _user(te[0], 1, True)
    rows += _user(te[1], 1, False)
    rows += _user(te[2], 2, True)
    rows += _user(te[3], 2, True)
    out = {r.bin: r for r in calibration_bins(_ev(spark, rows)).collect()}
    assert set(out) == {3, 9}
    b3, b9 = out[3], out[9]
    assert b3.n == 2 and b3.pred_rate == round(1 / 3, 6) and b3.obs_rate == 0.5
    assert b9.n == 2 and b9.pred_rate == 1.0 and b9.obs_rate == 1.0
