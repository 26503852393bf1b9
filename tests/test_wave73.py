"""Wave-73 operators: Misra–Gries two-phase heavy hitters (exact output),
digest-pruned join (relational Bloom prune, exact result), semi-additive
period-end balances, ratio-to-parent revenue shares."""

import datetime as dt

from pyspark.sql import functions as F

from linkgraph_spark.functions.events import period_end_balances
from linkgraph_spark.functions.joins import digest_pruned_join
from linkgraph_spark.functions.relational import region_nation_share
from linkgraph_spark.functions.sketches import _mg_merge, heavy_hitters


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------- heavy hitters
def test_mg_merge_keeps_at_most_k_minus_1_and_undercounts_bounded():
    counters = {}
    # stream: 'a' x 60, then 40 distinct singletons, k=5 -> only 'a' heavy
    batches = [{"a": 30}, {f"x{i}": 1 for i in range(20)}, {"a": 30}, {
        f"y{i}": 1 for i in range(20)
    }]
    n = 0
    for b in batches:
        n += sum(b.values())
        counters = _mg_merge(counters, b, 5)
        assert len(counters) <= 4
    # undercount bound: stored >= true - n/k
    assert counters.get("a", 0) >= 60 - n / 5
    assert "a" in counters


def test_heavy_hitters_exact_strict_threshold_and_many_partitions(spark):
    # 100 rows over 16 partitions: 'hot' 26 (> 100/4 = 25: in),
    # 'warm' 25 (== n/k: strict > excludes), 49 singletons
    rows = (
        [("hot",)] * 26 + [("warm",)] * 25 + [(f"s{i}",) for i in range(49)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(16)
    got = heavy_hitters(df, "v", k=4).collect()
    assert [(r.value, r.cnt) for r in got] == [("hot", 26)]
    assert got[0].share == round(26 / 100, 6)


def test_heavy_hitters_ignores_nulls_and_counts_exactly(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 10 + [("b",)] * 3, "v string"
    ).repartition(4)
    # n = 8 non-null; k=2 -> threshold 4: only 'a'
    got = heavy_hitters(df, "v", k=2).collect()
    assert [(r.value, r.cnt) for r in got] == [("a", 5)]


def test_heavy_hitters_phase_b_is_broadcast_pruned(spark):
    df = spark.createDataFrame([("a",)] * 9 + [("b",)], "v string")
    plan = _plan(heavy_hitters(df, "v", k=3))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


# ---------------------------------------------------------- digest-pruned join
def test_digest_join_equals_plain_join_even_with_heavy_collisions(spark):
    # bits=2 -> 4 buckets: massive false-positive rate; result must STILL
    # be exactly the plain inner join
    fact = spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "k long, payload long"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 50, 7)], "dk long, name string"
    )
    got = digest_pruned_join(fact, dim, "k", "dk", bits=2)
    expect = fact.join(dim, fact.k == dim.dk)
    assert sorted(got.collect()) == sorted(expect.collect())


def test_digest_join_prunes_non_matching_fact_rows(spark):
    # with ample bits, a fact key whose bucket no dim key occupies is
    # filtered BEFORE the join: the semi-join output is only the survivors
    fact = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    dim = spark.createDataFrame([(1, "x")], "dk long, name string")
    got = digest_pruned_join(fact, dim, "k", "dk", bits=20)
    assert [r.k for r in got.collect()] == [1]
    plan = _plan(got)
    assert plan.count("BroadcastHashJoin") >= 1 and "LeftSemi" in plan


# ------------------------------------------------------- period-end balances
def test_period_end_balance_takes_last_event_per_user_day(spark):
    d = dt.datetime
    events = spark.createDataFrame(
        [
            # user 1, day 1: two events -> later ts (value 7.5) wins
            (1, d(2024, 1, 1, 9), 1, "click", 2.0, None),
            (2, d(2024, 1, 1, 18), 1, "click", 7.5, None),
            # user 2, day 1: same ts as user-1's late event -> independent
            (3, d(2024, 1, 1, 18), 2, "click", 1.25, None),
            # user 1, day 2: NULL value excluded; only event 5 counts
            (4, d(2024, 1, 2, 8), 1, "click", None, None),
            (5, d(2024, 1, 2, 7), 1, "click", 3.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = period_end_balances(events).collect()
    assert [(r.period, r.n_users, r.balance) for r in rows] == [
        ("2024-01-01", 2, 8.75),
        ("2024-01-02", 1, 3.0),
    ]


def test_period_end_balance_tie_breaks_on_event_id(spark):
    d = dt.datetime(2024, 3, 5, 12)
    events = spark.createDataFrame(
        [(1, d, 1, "e", 10.0, None), (2, d, 1, "e", 20.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    assert period_end_balances(events).collect()[0].balance == 20.0


def test_period_end_balance_has_no_window_exchange(spark):
    # the last-per-user pick must be an aggregate (max_by), not a window
    # sort — assert no Window node in the physical plan
    events = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "e", 1.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    assert "Window" not in _plan(period_end_balances(events))


# ------------------------------------------------------- region/nation share
def test_region_nation_share_reconciles_to_parents(spark):
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 0), (2, "N2", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    customer = spark.createDataFrame(
        [(10, 0), (11, 1), (12, 2)], "c_custkey long, c_nationkey int"
    )
    orders = spark.createDataFrame(
        [(1, 10, 30.0), (2, 10, 10.0), (3, 11, 60.0), (4, 12, 50.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    rows = region_nation_share(orders, customer, nation, region).collect()
    by = {(r.r_name, r.n_name): r for r in rows}
    assert by[("EUROPE", "N0")].revenue == 40.0
    assert by[("EUROPE", "N0")].share_of_region == 0.4
    assert by[("EUROPE", "N1")].share_of_region == 0.6
    assert by[("ASIA", "N2")].share_of_region == 1.0
    # shares of total sum to 1 (exact cents -> exact ratios of the total)
    assert (
        abs(sum(r.share_of_total for r in rows) - 1.0) < 1e-9
    )
    assert by[("ASIA", "N2")].share_of_total == round(50 / 150, 6)
