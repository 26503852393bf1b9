"""Wave-107 operators: reciprocal rank fusion over bounded top lists
(Cormack et al. 2009) and NDCG@k (Järvelin & Kekäläinen 2002)."""

import math
from datetime import datetime

from linkgraph_spark.functions.ml import ndcg_activity_spend, rrf_user_ranking

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _users(spark, spec):
    # spec: {user_id: (n_events, total_spend_dollars)}
    rows = []
    for u, (n, spend) in spec.items():
        per = spend / n
        rows += [(u, "click", per, _TS)] * n
    return spark.createDataFrame(rows, _SCHEMA)


def test_rrf_hand_computed(spark):
    # u1 most active, u3 biggest spender, u2 strong on both
    ev = _users(spark, {1: (10, 1.0), 2: (8, 80.0), 3: (2, 100.0)})
    out = {r.user_id: r for r in rrf_user_ranking(ev).collect()}
    # activity ranks: u1=1, u2=2, u3=3; spend ranks: u3=1, u2=2, u1=3
    assert (out[1].rank_activity, out[1].rank_spend) == (1, 3)
    assert (out[2].rank_activity, out[2].rank_spend) == (2, 2)
    assert (out[3].rank_activity, out[3].rank_spend) == (3, 1)

    def rrf(ra, rb):
        return round(1e6 / (60 + ra)) + round(1e6 / (60 + rb))

    assert out[1].rrf_micro == rrf(1, 3) == out[3].rrf_micro
    assert out[2].rrf_micro == rrf(2, 2)
    # 1/x is convex: the (1,3) corners edge out the (2,2) balance
    # (32266 > 32258 micro); the corner tie breaks by user_id
    assert rrf(1, 3) > rrf(2, 2)
    order = [r.user_id for r in rrf_user_ranking(ev).collect()]
    assert order == [1, 3, 2]


def test_rrf_absent_from_one_list(spark):
    # 3 users, top_lists=2: u3 is in neither top-2... make asymmetry:
    ev = _users(spark, {1: (10, 1.0), 2: (8, 80.0), 3: (2, 100.0)})
    out = {r.user_id: r for r in
           rrf_user_ranking(ev, top_lists=2).collect()}
    # u3 misses the activity top-2 but leads spend
    assert out[3].rank_activity is None and out[3].rank_spend == 1
    assert out[3].rrf_micro == round(1e6 / 61)
    assert out[1].rank_spend is None  # u1 misses the spend top-2


def test_ndcg_perfect_and_inverted(spark):
    # activity order == spend order -> ndcg 1
    ev = _users(spark, {1: (10, 100.0), 2: (5, 50.0), 3: (2, 10.0)})
    r = ndcg_activity_spend(ev, k=3).collect()[0]
    assert r.ndcg == 1.0
    # inverted: most active user spends least
    ev2 = _users(spark, {1: (10, 10.0), 2: (5, 50.0), 3: (2, 100.0)})
    r2 = ndcg_activity_spend(ev2, k=3).collect()[0]
    dcg = (
        round(1000 * 1e6 / math.log2(2))
        + round(5000 * 1e6 / math.log2(3))
        + round(10000 * 1e6 / math.log2(4))
    )
    idcg = (
        round(10000 * 1e6 / math.log2(2))
        + round(5000 * 1e6 / math.log2(3))
        + round(1000 * 1e6 / math.log2(4))
    )
    assert r2.dcg_micro == dcg and r2.idcg_micro == idcg
    assert r2.ndcg == round(dcg / idcg, 6)
    assert r2.ndcg < 1.0


def test_ndcg_zero_relevance_is_null(spark):
    rows = [(1, "click", 0.0, _TS), (2, "click", 0.0, _TS)]
    ev = spark.createDataFrame(rows, _SCHEMA)
    r = ndcg_activity_spend(ev, k=2).collect()[0]
    assert r.idcg_micro == 0 and r.ndcg is None
