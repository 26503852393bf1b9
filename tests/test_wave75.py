"""Wave-75 operators: PSI drift monitor (reference-decile bins), CUPED
variance-reduced A/B readout, positional-index phrase search."""

import datetime as dt

from linkgraph_spark.functions.events import ab_test_cuped, value_psi_drift
from linkgraph_spark.functions.hashing import md5_long
from linkgraph_spark.functions.text import phrase_search
from pyspark.sql import functions as F

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, "e", v, None) for (i, t, u, v) in rows], _EV_SCHEMA
    )


# ------------------------------------------------------------------- PSI
def test_psi_buckets_by_reference_deciles_and_flags_shift(spark):
    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    # reference: values 1..10 -> deciles split one value per bucket
    rows = [(i, pre, i, float(i)) for i in range(1, 11)]
    # current: all mass at 10 -> bucket 9 only
    rows += [(100 + i, post, i, 10.0) for i in range(5)]
    out = value_psi_drift(_ev(spark, rows)).collect()
    by = {r.bucket: r for r in out}
    assert len(by) == 10 and set(by) == set(range(10))
    assert all(by[b].n_ref == 1 for b in range(10))
    assert by[9].n_cur == 5 and all(by[b].n_cur == 0 for b in range(9))
    # empty-on-one-side buckets yield NULL terms, never +-inf
    assert all(by[b].psi_term is None for b in range(9))
    # bucket 9: p1=0.1, p2=1.0 -> (1-0.1)*ln(10) > 2 (severe drift)
    assert by[9].psi_term is not None and by[9].psi_term > 2.0


def test_cuped_theta_recovers_linear_relation_and_kills_variance(spark):
    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    # 8 users, Y exactly = 2*X regardless of arm -> theta == 2 and the
    # adjusted means coincide (all between-arm difference explained by X)
    for u in range(1, 9):
        x = float(u)
        rows.append((u * 10, pre, u, x))
        rows.append((u * 10 + 1, post, u, 2 * x))
    out = ab_test_cuped(_ev(spark, rows)).collect()[0]
    assert out.n_control + out.n_treatment == 8
    assert out.theta == 2.0
    assert abs(out.adj_lift) < 1e-6
    # raw means differ unless the hash split landed perfectly balanced
    assert out.adj_mean_control == out.adj_mean_treatment


def test_cuped_degenerate_preperiod_falls_back_to_raw_means(spark):
    post = dt.datetime(2024, 1, 20)
    rows = [(u, post, u, float(u)) for u in range(1, 5)]  # no pre events
    out = ab_test_cuped(_ev(spark, rows)).collect()[0]
    assert out.theta == 0.0
    assert out.adj_mean_control == out.mean_control
    assert out.adj_mean_treatment == out.mean_treatment


def test_cuped_split_matches_srm_hash_convention(spark):
    # the variant assignment must be the shared md5 split
    pre = dt.datetime(2024, 1, 10)
    rows = [(u, pre, u, 1.0) for u in range(1, 20)]
    df = _ev(spark, rows)
    n_control = (
        df.select("user_id")
        .distinct()
        .where(md5_long(F.col("user_id").cast("string")) % 2 == 0)
        .count()
    )
    assert ab_test_cuped(df).collect()[0].n_control == n_control


# ---------------------------------------------------------- phrase search
def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_phrase_search_is_token_adjacency_not_substring(spark):
    docs = _docs(
        spark,
        [
            "the table hash join",        # match
            "a tablet hashing device",    # substring but NOT token match
            "table of hash",              # non-adjacent
            "table hash table hash x",    # two occurrences
        ],
    )
    rows = phrase_search(docs, "table hash").collect()
    assert [(r.doc_id, r.n_occurrences) for r in rows] == [(0, 1), (3, 2)]


def test_phrase_search_three_term_chain_and_case_fold(spark):
    docs = _docs(spark, ["Big Hash Join here", "big join hash here"])
    rows = phrase_search(docs, "big HASH join").collect()
    assert [(r.doc_id, r.n_occurrences) for r in rows] == [(0, 1)]


def test_phrase_search_overlapping_occurrences_count_each_start(spark):
    docs = _docs(spark, ["go go go"])
    rows = phrase_search(docs, "go go").collect()
    assert [(r.doc_id, r.n_occurrences) for r in rows] == [(0, 2)]
