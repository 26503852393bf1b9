"""Wave-61 operators: grouping sets (rollup + grouping_id), pivot,
and TPC-H Q8 conditional market share."""

from pyspark.sql import functions as F

from linkgraph_spark.functions.events import EVENT_TYPES, event_pivot_dow
from linkgraph_spark.functions.relational import market_share, revenue_rollup

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_rollup_levels_reconcile(spark):
    rows = revenue_rollup(
        _t(spark, "orders"), _t(spark, "customer"), _t(spark, "nation")
    ).collect()
    detail = [r for r in rows if r.gid == 0]
    per_nation = [r for r in rows if r.gid == 1]
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].n_name is None and grand[0].order_year is None
    # counts roll up exactly at every level
    assert sum(r.n_orders for r in detail) == grand[0].n_orders
    assert sum(r.n_orders for r in per_nation) == grand[0].n_orders
    by_nation = {}
    for r in detail:
        by_nation[r.n_name] = by_nation.get(r.n_name, 0) + r.n_orders
    assert by_nation == {r.n_name: r.n_orders for r in per_nation}
    # no other grouping ids in a 2-column rollup (2 = year-only never emitted)
    assert {r.gid for r in rows} == {0, 1, 3}
    assert grand[0].n_orders == _t(spark, "orders").count()


def test_market_share_bounds_and_population(spark):
    t = lambda n: _t(spark, n)  # noqa: E731
    rows = market_share(
        t("region"), t("nation"), t("customer"), t("supplier"),
        t("orders"), t("lineitem"),
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.nation_revenue <= r.total_revenue
        assert 0.0 <= r.mkt_share <= 1.0
    # a prefix matching every nation gives share 1 in every year
    all_rows = market_share(
        t("region"), t("nation"), t("customer"), t("supplier"),
        t("orders"), t("lineitem"), supp_nation_prefix="NATION_",
    ).collect()
    assert all(r.mkt_share == 1.0 for r in all_rows)
    # a prefix matching no nation gives share 0
    none_rows = market_share(
        t("region"), t("nation"), t("customer"), t("supplier"),
        t("orders"), t("lineitem"), supp_nation_prefix="XXX",
    ).collect()
    assert all(r.mkt_share == 0.0 for r in none_rows)


def test_event_pivot_dow_cells_reconcile(spark):
    events = _t(spark, "events")
    rows = event_pivot_dow(events).collect()
    assert 1 <= len(rows) <= 7
    assert all(0 <= r.dow <= 6 for r in rows)
    # the pivoted cells sum back to the raw per-type counts
    raw = {
        r["event_type"]: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    for t in EVENT_TYPES:
        assert sum(getattr(r, t) for r in rows) == raw.get(t, 0)
    # absent types pivot to all-zero columns, not NULL
    odd = event_pivot_dow(events, types=("click", "no_such_type"))
    got = odd.agg(F.sum("no_such_type")).collect()[0][0]
    assert got == 0


def test_cube_adds_year_only_level(spark):
    from linkgraph_spark.functions.relational import revenue_cube

    rows = revenue_cube(
        _t(spark, "orders"), _t(spark, "customer"), _t(spark, "nation")
    ).collect()
    assert {r.gid for r in rows} == {0, 1, 2, 3}
    grand = [r for r in rows if r.gid == 3][0]
    # the year-only level (gid=2, the set rollup lacks) reconciles too
    year_only = [r for r in rows if r.gid == 2]
    assert all(r.n_name is None for r in year_only)
    assert sum(r.n_orders for r in year_only) == grand.n_orders
    detail = [r for r in rows if r.gid == 0]
    by_year = {}
    for r in detail:
        by_year[r.order_year] = by_year.get(r.order_year, 0) + r.n_orders
    assert by_year == {r.order_year: r.n_orders for r in year_only}
