"""Classic warehouse analytics over the TPC-H-shaped tables.

The testdata ships a trimmed TPC-H star schema (``lineitem`` ``orders``
``customer`` ``supplier`` ``part`` ``nation`` ``region``) alongside the
graph/document tables; these operators are the canonical OLAP shapes
(TPC-H spec, public domain — Q1/Q3/Q5/Q10 adapted to the trimmed
columns) expressed Spark-first:

- **fact-side filters are literal predicates on the scan** so Catalyst
  pushes them into the parquet reader (``PushedFilters``) — at 100 TB
  the date window is the difference between scanning a month and
  scanning seven years;
- **dimensions broadcast** (region/nation/customer/supplier are tiny by
  star-schema construction) — no shuffle touches the fact table except
  the final groupBy on low-cardinality keys, which combines map-side;
- money aggregates are rounded to 2 dp and averages to 6 dp IN BOTH
  engines, so float summation order can't flake the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1: per (returnflag, linestatus) pricing summary of lineitems
    shipped on or before ``cutoff``. → ``[l_returnflag, l_linestatus,
    sum_qty, sum_base_price, sum_disc_price, sum_charge, avg_qty,
    avg_price, avg_disc, count_order]``.

    Scale shape: one pushed-down date filter, one 6-way hash aggregate on
    a ~6-value composite key (fully map-side combinable) — the canonical
    "scan fast, aggregate small" plan.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(F.col("l_shipdate") <= _ts(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def pricing_summary_sql(cutoff: str = "1998-09-02") -> str:
    return f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{cutoff}'
    GROUP BY l_returnflag, l_linestatus
    """


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
    n: int = 10,
) -> DataFrame:
    """TPC-H Q3: the ``n`` highest-revenue undelivered orders for one
    market segment — orders placed before ``date`` with lineitems shipped
    after it. → ``[l_orderkey, revenue, o_orderdate, o_orderpriority]``.

    Scale shape: the segment filter shrinks customer BEFORE the broadcast
    (dimension-side pruning), both date filters push to the fact scans,
    the orders⋈lineitem join is the only big shuffle, and the top-n is a
    TakeOrdered on the aggregated (per-order) rows. Ties broken by
    orderkey so the cut is deterministic.
    """
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < _ts(date)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(F.col("l_shipdate") > _ts(date)).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(li, ords.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum("_rev"), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(n)
    )


def shipping_priority_sql(
    segment: str = "BUILDING", date: str = "1998-03-15", n: int = 10
) -> str:
    seg = segment.replace("'", "''")
    return f"""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{seg}'
      AND o_orderdate < TIMESTAMP '{date}'
      AND l_shipdate > TIMESTAMP '{date}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT {int(n)}
    """


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5: revenue per nation from orders where customer and
    supplier share the nation, one region, one order-year window.
    → ``[n_name, revenue]``.

    Scale shape: region→nation→customer collapses to ONE broadcast-sized
    (custkey → nationkey) dimension before touching facts; supplier
    broadcasts the same way; the order-date window pushes to the orders
    scan; the only big shuffle is orders⋈lineitem. The local-supplier
    condition (c_nationkey = s_nationkey) rides the join as an equi-key,
    never a post-filter on a wider join.
    """
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("_cnat"), "n_name")
    supp = supplier.select("s_suppkey", F.col("s_nationkey").alias("_snat"))
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    return (
        ords.join(li, ords.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (F.col("_cnat") == F.col("_snat")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("_rev"), 2).alias("revenue"))
    )


def local_supplier_volume_sql(
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> str:
    rn = region_name.replace("'", "''")
    return f"""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = '{rn}'
      AND o_orderdate >= TIMESTAMP '{date_from}'
      AND o_orderdate < TIMESTAMP '{date_to}'
    GROUP BY n_name
    """


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1995-10-01",
    date_to: str = "1996-01-01",
    n: int = 20,
) -> DataFrame:
    """TPC-H Q10: the ``n`` customers who returned the most revenue in one
    order quarter. → ``[c_custkey, c_name, n_name, revenue, c_acctbal]``.

    Scale shape: returnflag filter pushes to the lineitem scan, the
    quarter window to the orders scan; customer⋈nation broadcasts; the
    per-customer aggregate is the one shuffle; top-n is TakeOrdered with
    a custkey tie-break on the ROUNDED revenue (both engines rank the
    same rounded values, so the cut can't flake).
    """
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    ).select("o_orderkey", "o_custkey")
    cust = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        ords.join(li, ords.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum("_rev"), 2).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(n)
    )


def returned_item_report_sql(
    date_from: str = "1995-10-01", date_to: str = "1996-01-01", n: int = 20
) -> str:
    return f"""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{date_from}'
      AND o_orderdate < TIMESTAMP '{date_to}'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT {int(n)}
    """


def late_shipment_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    grace_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 adapted (the trimmed schema has no commit/receipt dates):
    of the orders placed in one quarter, how many — per order priority —
    had at least one lineitem shipped more than ``grace_days`` after the
    order date. → ``[o_orderpriority, order_count]``. The EXISTS shape:
    the probe is a LEFT SEMI join, so each order contributes at most once
    no matter how many lineitems are late, and no lineitem columns
    survive the join.

    Scale shape: quarter filter pushed to the orders scan, one semi-join
    (equi on orderkey + the lateness range condition riding it), one
    5-key hash aggregate.
    """
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    )
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = ords.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {int(grace_days)} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def late_shipment_priority_sql(
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    grace_days: int = 60,
) -> str:
    return f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{date_from}'
      AND o.o_orderdate < TIMESTAMP '{date_to}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {int(grace_days)} DAY
      )
    GROUP BY o_orderpriority
    """


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13: the distribution of orders-per-customer INCLUDING the
    zero-order customers — → ``[c_count, custdist]``. The outer-join
    shape: an inner join would silently drop exactly the customers the
    distribution's head (c_count = 0) is about.

    Scale shape: one per-customer count on the orders side (map-side
    combinable), a LEFT join from the customer spine, one ≤ max-orders
    histogram aggregate.
    """
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("_n"))
    return (
        customer.select("c_custkey")
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("_n", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def customer_order_distribution_sql() -> str:
    return """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, coalesce(o.n, 0) AS c_count
      FROM customer c
      LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
        ON o.o_custkey = c.c_custkey
    )
    GROUP BY c_count
    """


def large_quantity_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    threshold: float = 250.0,
) -> DataFrame:
    """TPC-H Q18: orders whose TOTAL lineitem quantity exceeds
    ``threshold``, with their customer. → ``[c_custkey, c_name,
    o_orderkey, o_orderdate, o_totalprice, total_qty]``. The
    HAVING-over-aggregate shape: the qualifying keys come from an
    aggregate filter, then rejoin the fact side.

    Scale shape: one per-order quantity aggregate (map-side combinable)
    filtered to the rare qualifiers, which then BROADCASTS back against
    orders; customer broadcasts onto the survivors. The fact table is
    scanned once and never re-shuffled.
    """
    qual = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > threshold)
    )
    return (
        orders.join(F.broadcast(qual), orders.o_orderkey == qual.l_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


def large_quantity_orders_sql(threshold: float = 250.0) -> str:
    return f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, q.total_qty
    FROM (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > {threshold!r}
    ) q
    JOIN orders o ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """


def idle_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    date_from: str = "1999-01-01",
    date_to: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22 adapted (no phone column — grouped by nation): customers
    with an above-average positive account balance and NO orders in the
    window — dormant high-value accounts. → ``[n_name, numcust,
    totacctbal]``. The anti-join + scalar-subquery shape.

    Scale shape: the positive-balance average is one scalar aggregate
    broadcast as a literal join; the no-orders test is a LEFT ANTI join
    against the window-filtered orders (pushed-down dates); nation
    broadcasts. No correlated per-row subquery survives planning.
    """
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    rich = (
        customer.join(F.broadcast(avg_bal), F.lit(True))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    window_orders = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    ).select("o_custkey")
    idle = rich.join(
        window_orders, rich.c_custkey == window_orders.o_custkey, "left_anti"
    )
    return (
        idle.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            idle.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def idle_rich_customers_sql(
    date_from: str = "1999-01-01", date_to: str = "2000-01-01"
) -> str:
    return f"""
    SELECT n.n_name, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{date_from}'
          AND o.o_orderdate < TIMESTAMP '{date_to}'
      )
    GROUP BY n.n_name
    """

def promo_revenue_by_month(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 adapted (per month over a year instead of one month):
    what share of each ship-month's revenue came from promo-type parts.
    → ``[ship_month, promo_revenue, total_revenue, promo_share_pct]``.
    The conditional-aggregate shape: one pass computes both the
    conditional and unconditional sums — no second scan, no self-join.

    Scale shape: the year window pushes to the lineitem scan; part (the
    only dimension) broadcasts; one ~12-key hash aggregate with map-side
    combine. The share is computed FROM the 2-dp-rounded sums so both
    engines divide identical numerators.
    """
    li = lineitem.where(
        (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
    ).select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    p = part.select("p_partkey", "p_type")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("ship_month")
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == promo_type, F.col("_rev")).otherwise(F.lit(0.0))),
                2,
            ).alias("promo_revenue"),
            F.round(F.sum("_rev"), 2).alias("total_revenue"),
        )
    )
    return agg.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_share_pct"),
    )


def promo_revenue_by_month_sql(
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    promo_type: str = "PROMO",
) -> str:
    pt = promo_type.replace("'", "''")
    return f"""
    WITH agg AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             round(sum(CASE WHEN p_type = '{pt}'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END), 2) AS promo_revenue,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '{date_from}'
        AND l_shipdate < TIMESTAMP '{date_to}'
      GROUP BY 1
    )
    SELECT ship_month, promo_revenue, total_revenue,
           round(100.0 * promo_revenue / total_revenue, 6) AS promo_share_pct
    FROM agg
    """


def top_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose shipped revenue in one quarter is
    the maximum over all suppliers. → ``[s_suppkey, s_name,
    total_revenue]``. The max-over-aggregate rejoin shape: the qualifier
    is itself an aggregate of the aggregate.

    Scale shape: quarter filter pushed to the fact scan, one per-supplier
    aggregate (map-side combinable, |suppliers| rows), the global max is
    a scalar broadcast joined back — no window over the whole aggregate,
    no second fact scan. Ties (several suppliers at the max) all survive,
    exactly like the spec's view formulation.
    """
    li = lineitem.where(
        (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
    ).select(
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    rev = li.groupBy("l_suppkey").agg(F.round(F.sum("_rev"), 2).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.lit(True))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


def top_suppliers_sql(
    date_from: str = "1996-01-01", date_to: str = "1996-04-01"
) -> str:
    return f"""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{date_from}'
        AND l_shipdate < TIMESTAMP '{date_to}'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    frac: float = 0.2,
) -> DataFrame:
    """TPC-H Q17 adapted (per brand instead of one brand+container):
    revenue locked in unusually small orders — lineitems whose quantity
    is below ``frac`` of their part's average quantity — per brand.
    → ``[p_brand, small_qty_revenue, small_qty_lines]``. The correlated
    scalar-subquery shape (``l_quantity < frac * (SELECT avg ... WHERE
    same part)``) decorrelated into a per-part aggregate rejoin.

    Scale shape: the per-part average is one map-side-combinable
    aggregate (|parts| rows, dimension-sized) that BROADCASTS back onto
    the fact scan; the brand dimension broadcasts too; final aggregate is
    ~|brands| keys. The fact table is scanned twice but shuffled never.
    Determinism: quantities are whole numbers, so the per-part sum is an
    exact integer and ``avg`` is bit-identical in both engines; the
    strict ``<`` then cuts identically.
    """
    avg_q = lineitem.groupBy("l_partkey").agg(F.avg("l_quantity").alias("_avg_qty"))
    small = lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(avg_q), "l_partkey"
    ).where(F.col("l_quantity") < F.lit(frac) * F.col("_avg_qty"))
    p = part.select("p_partkey", "p_brand")
    return (
        small.join(F.broadcast(p), small.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count("*").alias("small_qty_lines"),
        )
    )


def small_quantity_revenue_sql(frac: float = 0.2) -> str:
    return f"""
    WITH avg_q AS (
      SELECT l_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           round(sum(l_extendedprice), 2) AS small_qty_revenue,
           count(*) AS small_qty_lines
    FROM lineitem l
    JOIN avg_q a ON a.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < {frac!r} * a.avg_qty
    GROUP BY p_brand
    """


def disjunctive_brand_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    arms: tuple = (
        ("Brand#4", 1, 15, 1, 20),
        ("Brand#19", 10, 30, 10, 30),
        ("Brand#25", 20, 50, 20, 40),
    ),
) -> DataFrame:
    """TPC-H Q19 adapted: revenue matched by an OR of brand-specific
    conjunctions — each arm is ``(brand, size_lo, size_hi, qty_lo,
    qty_hi)`` — reported per brand. → ``[p_brand, revenue, lines]``.
    The disjunctive-predicate shape: the filter mixes fact and dimension
    columns across OR arms, so naive planning evaluates it post-join.

    Scale shape: part broadcasts; Catalyst extracts the dimension-only
    disjunction (brand IN ... AND size ranges) onto the part side and the
    derived fact-only bound (l_quantity BETWEEN global lo/hi) onto the
    lineitem scan, so both scans prune before the join evaluates the full
    disjunction as its residual.
    """
    p = part.select("p_partkey", "p_brand", "p_size")
    j = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    cond = F.lit(False)
    for brand, slo, shi, qlo, qhi in arms:
        cond = cond | (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
    return (
        j.where(cond)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("lines"),
        )
    )


def disjunctive_brand_revenue_sql(
    arms: tuple = (
        ("Brand#4", 1, 15, 1, 20),
        ("Brand#19", 10, 30, 10, 30),
        ("Brand#25", 20, 50, 20, 40),
    ),
) -> str:
    ors = " OR ".join(
        f"(p_brand = '{b.replace(chr(39), chr(39) * 2)}' AND p_size BETWEEN {int(sl)} AND {int(sh)}"
        f" AND l_quantity BETWEEN {int(ql)} AND {int(qh)})"
        for b, sl, sh, ql, qh in arms
    )
    return f"""
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {ors}
    GROUP BY p_brand
    """

def revenue_rollup(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Order revenue with ROLLUP subtotals — per (nation, order-year),
    per nation, and grand total, distinguished by ``grouping_id``.
    → ``[n_name, order_year, gid, revenue, n_orders]``. The
    grouping-sets shape: Spark plans ONE scan + an ``Expand`` (each row
    replicated once per grouping set) feeding a single hash aggregate —
    never one job per subtotal level.

    Scale shape: dimensions broadcast; Expand multiplies rows 3x BEFORE
    the aggregate but map-side combine collapses them to
    |nations x years| partials, so the shuffle stays dimension-sized.
    Both engines emit the same grouping_id bitmask (verified: leftmost
    rollup column = most significant bit in Spark AND DuckDB).
    """
    cust = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "n_name")
    j = orders.select(
        "o_custkey", F.year("o_orderdate").alias("order_year"), "o_totalprice"
    ).join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
    return (
        j.rollup("n_name", "order_year")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select("n_name", "order_year", "gid", "revenue", "n_orders")
    )


def revenue_rollup_sql() -> str:
    return """
    SELECT n_name, year(o_orderdate) AS order_year,
           grouping(n_name, year(o_orderdate)) AS gid,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY ROLLUP(n_name, year(o_orderdate))
    """


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    supp_nation_prefix: str = "NATION_1",
) -> DataFrame:
    """TPC-H Q8 adapted: per order year, the share of one region's order
    revenue delivered by suppliers from nations matching a prefix.
    → ``[order_year, nation_revenue, total_revenue, mkt_share]``. The
    two-population conditional-share shape: numerator and denominator
    come from ONE pass (sum of a CASE), never two scans diffed.

    Scale shape: both dimension chains (region→nation→customer and
    nation→supplier) collapse to broadcast maps before touching facts;
    the only big shuffle is orders⋈lineitem; the final aggregate is
    |years| keys. Share divides the 2-dp-rounded sums so both engines
    rank identical values.
    """
    nat_r = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(nat_r), customer.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("_snk"), "n_name")),
        supplier.s_nationkey == F.col("_snk"),
    ).select("s_suppkey", F.col("n_name").alias("_sn"))
    ords = orders.select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("order_year")
    ).join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    agg = (
        ords.join(li, ords.o_orderkey == li.l_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("order_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("_sn").startswith(supp_nation_prefix), F.col("_rev")
                    ).otherwise(F.lit(0.0))
                ),
                2,
            ).alias("nation_revenue"),
            F.round(F.sum("_rev"), 2).alias("total_revenue"),
        )
    )
    return agg.select(
        "order_year",
        "nation_revenue",
        "total_revenue",
        F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias("mkt_share"),
    )


def market_share_sql(
    region_name: str = "ASIA", supp_nation_prefix: str = "NATION_1"
) -> str:
    rn = region_name.replace("'", "''")
    pf = supp_nation_prefix.replace("'", "''")
    return f"""
    WITH agg AS (
      SELECT year(o_orderdate) AS order_year,
             round(sum(CASE WHEN starts_with(sn.n_name, '{pf}')
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END), 2) AS nation_revenue,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM region r
      JOIN nation cn ON cn.n_regionkey = r.r_regionkey
      JOIN customer ON c_nationkey = cn.n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r.r_name = '{rn}'
      GROUP BY 1
    )
    SELECT order_year, nation_revenue, total_revenue,
           round(nation_revenue / total_revenue, 6) AS mkt_share
    FROM agg
    """

def nation_pair_volume(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations, both directions,
    per ship year — rows where (cust nation, supp nation) is (a, b) OR
    (b, a). → ``[supp_nation, cust_nation, ship_year, revenue]``.
    The symmetric-pair shape: the disjunction couples columns from TWO
    different dimension chains, so it can only ride the join residual.

    Scale shape: each nation filter prunes its dimension BEFORE the
    broadcast (customer and supplier shrink to two nations' worth); the
    only big shuffle is orders⋈lineitem; the pair disjunction evaluates
    on broadcast-joined columns, 4 tiny rows wide.
    """
    nat = nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("ship_year"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    pair = (F.col("cust_nation") == nation_a) & (F.col("supp_nation") == nation_b) | (
        F.col("cust_nation") == nation_b
    ) & (F.col("supp_nation") == nation_a)
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(pair)
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.round(F.sum("_rev"), 2).alias("revenue"))
    )


def nation_pair_volume_sql(
    nation_a: str = "NATION_1", nation_b: str = "NATION_2"
) -> str:
    a = nation_a.replace("'", "''")
    b = nation_b.replace("'", "''")
    return f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS ship_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE (cn.n_name = '{a}' AND sn.n_name = '{b}')
       OR (cn.n_name = '{b}' AND sn.n_name = '{a}')
    GROUP BY 1, 2, 3
    """


def waiting_suppliers(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    grace_days: int = 60,
    n: int = 20,
) -> DataFrame:
    """TPC-H Q21 adapted (lateness = shipped more than ``grace_days``
    after the order date): suppliers who were the ONLY late shipper on
    multi-supplier orders. → ``[s_name, numwait]``, top ``n`` by count.
    The spec's EXISTS(other supplier) AND NOT EXISTS(other LATE
    supplier) pair decorrelates into two per-order aggregates — counts
    replace both correlated subqueries.

    Scale shape: one orders⋈lineitem shuffle computes per-(order,
    supplier) lateness flags; two map-side-combinable per-order
    aggregates (distinct suppliers, late suppliers) gate the result;
    supplier broadcasts onto the survivors. No self-join of the fact
    table — the aggregate formulation reads lineitem once.
    """
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    flagged = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr(f"INTERVAL {int(grace_days)} DAYS")
                ).cast("int")
            ).alias("_late")
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count("*").alias("_n_supp"),
        F.sum("_late").alias("_n_late"),
        F.max(F.when(F.col("_late") == 1, F.col("l_suppkey"))).alias("_lone_supp"),
    )
    lone = per_order.where((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
    return (
        lone.groupBy("_lone_supp")
        .agg(F.count("*").alias("numwait"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("_lone_supp") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(n)
    )


def waiting_suppliers_sql(grace_days: int = 60, n: int = 20) -> str:
    return f"""
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate >
                   o_orderdate + INTERVAL {int(grace_days)} DAY
                 THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
             max(CASE WHEN late = 1 THEN l_suppkey END) AS lone_supp
      FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM per_order JOIN supplier ON s_suppkey = lone_supp
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT {int(n)}
    """


def parts_supplier_counts(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    size_bucket: int = 10,
) -> DataFrame:
    """TPC-H Q16 adapted: distinct supplier counts per (brand, size
    bucket), EXCLUDING suppliers with a negative account balance (the
    spec's complaints exclusion). → ``[p_brand, size_bucket,
    supplier_cnt]``. The anti-join + count-distinct shape.

    Scale shape: the exclusion list is dimension-sized and broadcasts
    as a LEFT ANTI join BEFORE the expensive distinct; the (part,
    supplier) pairs dedup map-side; the final count-distinct runs on
    pre-deduped pairs, so the shuffle carries each pair once.
    """
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti")
    )
    p = part.select(
        "p_partkey",
        "p_brand",
        (F.floor(F.col("p_size") / size_bucket) * size_bucket).alias("size_bucket"),
    )
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "size_bucket")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def parts_supplier_counts_sql(size_bucket: int = 10) -> str:
    return f"""
    SELECT p_brand,
           CAST(floor(p_size / {int(size_bucket)}) * {int(size_bucket)} AS BIGINT)
             AS size_bucket,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
    JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY 1, 2
    """

def revenue_cube(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """CUBE companion to :func:`revenue_rollup`: all FOUR grouping sets —
    (nation, year), nation-only, year-only (the set ROLLUP cannot
    express), and grand total. → ``[n_name, order_year, gid, revenue,
    n_orders]`` with gid ∈ {0, 1, 2, 3}.

    Scale shape: identical to the rollup — one Expand (4x here) into one
    map-side-combinable aggregate; the year-only subtotal costs no extra
    scan, which is the entire point of grouping sets over UNION ALL.
    """
    cust = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "n_name")
    j = orders.select(
        "o_custkey", F.year("o_orderdate").alias("order_year"), "o_totalprice"
    ).join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
    return (
        j.cube("n_name", "order_year")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select("n_name", "order_year", "gid", "revenue", "n_orders")
    )


def revenue_cube_sql() -> str:
    return """
    SELECT n_name, year(o_orderdate) AS order_year,
           grouping(n_name, year(o_orderdate)) AS gid,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY CUBE(n_name, year(o_orderdate))
    """


def forecast_revenue_delta(
    lineitem: DataFrame,
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6: revenue that would have been gained by eliminating small
    discounts — one scalar ``sum(extendedprice * discount)`` over
    lineitems in a ship-year with discount in a narrow band and small
    quantity. → ``[revenue]`` (one row).

    Scale shape: the purest scan-aggregate in the suite — every predicate
    is a literal comparison that pushes into the parquet scan
    (PushedFilters on shipdate/discount/quantity), and the aggregate is a
    single partial+final sum with no grouping key. At 100 TB this reads
    only the row groups whose min/max straddle the year.
    """
    return (
        lineitem.where(
            (F.col("l_shipdate") >= _ts(year_start))
            & (F.col("l_shipdate") < _ts(year_end))
            & (F.col("l_discount") >= F.lit(disc_lo))
            & (F.col("l_discount") <= F.lit(disc_hi))
            & (F.col("l_quantity") < F.lit(max_qty))
        )
        .agg(
            F.round(
                F.coalesce(F.sum(F.col("l_extendedprice") * F.col("l_discount")), F.lit(0.0)),
                2,
            ).alias("revenue")
        )
    )


def forecast_revenue_delta_sql(
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> str:
    return f"""
    SELECT round(coalesce(sum(l_extendedprice * l_discount), 0.0), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{year_start}'
      AND l_shipdate <  TIMESTAMP '{year_end}'
      AND l_discount >= {disc_lo} AND l_discount <= {disc_hi}
      AND l_quantity < {max_qty}
    """


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    p_type: str = "STANDARD",
    n: int = 100,
) -> DataFrame:
    """TPC-H Q2 (adapted): for each part of one type, the supplier(s) in
    one region offering it at the LOWEST unit price, ordered by supplier
    account balance. → ``[s_acctbal, s_name, n_name, p_partkey, p_name,
    min_cost]``.

    Adaptation (documented): the trimmed schema ships no ``partsupp``, so
    the part–supplier offer relation is derived from ``lineitem`` — a
    supplier "offers" a part at ``min(l_extendedprice / l_quantity)``
    over its shipments, rounded to 6 dp in BOTH engines so the groupwise-
    min equality join-back can't flake on float noise. The operator shape
    is the real Q2's: a correlated groupwise-min subquery (here a window
    min + equality filter on the Spark side; a correlated scalar subquery
    in the oracle — the two canonical decorrelations of the same plan).

    Scale shape: the lineitem scan projects three columns and aggregates
    to |part×supplier| offers before anything joins; region/nation/
    supplier/part are broadcast dims; the window min partitions by
    p_partkey (offer rows, not fact rows). Top-n is a TakeOrdered.
    """
    sup = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    nation.n_regionkey == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = part.where(F.col("p_type") == p_type).select("p_partkey", "p_name")
    offers = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("_unit"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.min("_unit"), 6).alias("cost"))
    )
    from pyspark.sql import Window

    scoped = (
        offers.join(F.broadcast(parts), offers.l_partkey == parts.p_partkey)
        .join(F.broadcast(sup), offers.l_suppkey == sup.s_suppkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        scoped.withColumn("min_cost", F.min("cost").over(w))
        .where(F.col("cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(n)
    )


def min_cost_supplier_sql(
    region_name: str = "EUROPE", p_type: str = "STANDARD", n: int = 100
) -> str:
    rn = region_name.replace("'", "''")
    pt = p_type.replace("'", "''")
    return f"""
    WITH offers AS (
        SELECT l_partkey, l_suppkey,
               round(min(l_extendedprice / l_quantity), 6) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), scoped AS (
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
        FROM offers
        JOIN part ON p_partkey = l_partkey AND p_type = '{pt}'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey AND r_name = '{rn}'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost AS min_cost
    FROM scoped s
    WHERE cost = (SELECT min(cost) FROM scoped i WHERE i.p_partkey = s.p_partkey)
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT {int(n)}
    """


def product_type_profit(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_like: str = "widget",
) -> DataFrame:
    """TPC-H Q9 (adapted): per (supplier nation, order year) profit on
    parts whose name contains a token. → ``[nation, o_year, profit]``.

    Adaptation (documented): no ``partsupp.ps_supplycost`` in the trimmed
    schema, so profit is gross revenue ``sum(extendedprice*(1-discount))``
    rather than revenue minus supply cost — the 5-way join DAG
    (part⋈lineitem⋈supplier⋈nation + orders for the year) is the real
    Q9's, which is the operator under test.

    Scale shape: the p_name filter shrinks part before broadcast, so the
    fact scan is pre-pruned by the broadcast-join's runtime filter; the
    orders join ships only (orderkey, year); the final group key is
    (25 nations × 7 years) — fully map-side combinable.

    Profit per line is computed as an exact integer in 10^-4-dollar
    units (``round(price·100)·(100 − round(discount·100))`` — prices and
    discounts are 2-dp by construction), so the group sum is the SAME
    integer in both engines regardless of summation order; the one final
    division back to dollars is a single identical double op.
    """
    parts = part.where(F.col("p_name").contains(name_like)).select("p_partkey")
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    ords = orders.select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    amount4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100).cast("long") - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        lineitem.select(
            "l_partkey", "l_suppkey", "l_orderkey", amount4.alias("_a4")
        )
        .join(F.broadcast(parts), F.col("l_partkey") == parts.p_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("_a4") / F.lit(10000.0), 2).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


def product_type_profit_sql(name_like: str = "widget") -> str:
    tok = name_like.replace("'", "''")
    return f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS BIGINT) / 10000.0, 2) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%{tok}%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation ASC, o_year DESC
    """


def important_parts(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_3",
    fraction: float = 0.002,
) -> DataFrame:
    """TPC-H Q11 (adapted): parts representing a significant share of one
    nation's total traded value. → ``[p_partkey, value]``, value desc.

    Values are summed as exact integer cents (prices are 2-dp by
    construction), so the HAVING threshold compare is over the SAME
    integers in both engines — no float-summation-order flake at the
    share boundary.

    Adaptation (documented): no ``partsupp`` (availqty × supplycost), so
    a part's "value" held by the nation's suppliers is the summed
    ``l_extendedprice`` of their shipments of it. The operator under test
    is the real Q11's global-scalar-subquery shape: HAVING sum > fraction
    × (scalar total over the SAME scope).

    Scale shape: one scoped fact aggregate to |parts| rows; the scalar
    total re-aggregates THOSE rows (not the fact table) and broadcasts as
    a 1-row cross join — no second fact scan, no single-partition window.
    """
    nk = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    sup = supplier.join(
        F.broadcast(nk), supplier.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey")
    per_part = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("_cents"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("_cents").alias("_vc"))
    )
    total = per_part.agg(F.sum("_vc").alias("_tc"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("_vc").cast("double")
            > F.col("_tc").cast("double") * F.lit(fraction)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("_vc") / F.lit(100.0), 2).alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("p_partkey"))
    )


def important_parts_sql(
    nation_name: str = "NATION_3", fraction: float = 0.002
) -> str:
    nn = nation_name.replace("'", "''")
    return f"""
    WITH scoped AS (
        SELECT l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey AND n_name = '{nn}'
    ), per_part AS (
        SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS vc
        FROM scoped GROUP BY l_partkey
    ), tot AS (SELECT CAST(sum(vc) AS BIGINT) AS tc FROM per_part)
    SELECT l_partkey AS p_partkey, round(vc / 100.0, 2) AS value
    FROM per_part CROSS JOIN tot
    WHERE CAST(vc AS DOUBLE) > CAST(tc AS DOUBLE) * {fraction}
    ORDER BY value DESC, p_partkey ASC
    """


def shipping_speed_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    fast_days: int = 30,
) -> DataFrame:
    """TPC-H Q12 (adapted): does slow shipping correlate with order
    priority? Lineitems shipped in a year are bucketed FAST/SLOW by
    order→ship lag, and each bucket counts critical- vs normal-priority
    orders. → ``[ship_speed, high_line_count, low_line_count]``.

    Adaptation (documented): the trimmed lineitem has no l_shipmode /
    l_commitdate / l_receiptdate, so Q12's ship-mode buckets become a
    derived speed bucket (``datediff(shipdate, orderdate) <= fast_days``)
    — the operator shape (fact⋈fact equi-join + conditional CASE
    aggregation on a derived group key) is the real Q12's.

    Scale shape: the ship-year predicate pushes to the lineitem scan; the
    only shuffle is the orderkey equi-join (orders ships two columns);
    the aggregate key has two values — entirely map-side combinable.
    Timestamps are midnight-normalized so Spark datediff and DuckDB
    date_diff('day') agree exactly.
    """
    li = lineitem.where(
        (F.col("l_shipdate") >= _ts(year_start))
        & (F.col("l_shipdate") < _ts(year_end))
    ).select("l_orderkey", "l_shipdate")
    j = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    speed = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= fast_days,
        F.lit("FAST"),
    ).otherwise(F.lit("SLOW"))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


def shipping_speed_priority_sql(
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    fast_days: int = 30,
) -> str:
    return f"""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= {int(fast_days)}
                THEN 'FAST' ELSE 'SLOW' END AS ship_speed,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '{year_start}'
      AND l_shipdate <  TIMESTAMP '{year_end}'
    GROUP BY 1
    ORDER BY ship_speed
    """


def promotion_suppliers(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_3",
    name_like: str = "bolt",
    year_start: str = "1997-01-01",
    year_end: str = "1998-01-01",
    min_qty: float = 50.0,
) -> DataFrame:
    """TPC-H Q20 (adapted): suppliers in one nation who moved real volume
    (> ``min_qty`` units of some single part) of a promoted part family
    in a year — candidates for a promotion. → ``[s_suppkey, s_name]``.

    Adaptation (documented): the real Q20 compares ``ps_availqty``
    against half the year's shipped quantity; without partsupp the
    predicate becomes "some (supplier, part) pair's shipped quantity
    exceeds ``min_qty``". The operator chain under test is the real
    Q20's: nested semi-joins (supplier ⋉ having-aggregate ⋉ part-name
    filter) with no fact columns surviving past the aggregate.

    Scale shape: the year filter pushes to the fact scan; part (name-
    filtered) broadcasts into the aggregate's input; the HAVING reduces
    to |supplier×part| rows before the supplier semi-join (left_semi, so
    duplicates never fan out); nation broadcasts.
    """
    parts = part.where(F.col("p_name").contains(name_like)).select("p_partkey")
    vol = (
        lineitem.where(
            (F.col("l_shipdate") >= _ts(year_start))
            & (F.col("l_shipdate") < _ts(year_end))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(parts), F.col("l_partkey") == parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > F.lit(min_qty))
        .select("l_suppkey")
    )
    nk = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    return (
        supplier.join(
            F.broadcast(nk), supplier.s_nationkey == F.col("n_nationkey")
        )
        .join(vol, supplier.s_suppkey == vol.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def promotion_suppliers_sql(
    nation_name: str = "NATION_3",
    name_like: str = "bolt",
    year_start: str = "1997-01-01",
    year_end: str = "1998-01-01",
    min_qty: float = 50.0,
) -> str:
    nn = nation_name.replace("'", "''")
    tok = name_like.replace("'", "''")
    return f"""
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey AND n_name = '{nn}'
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_name LIKE '%{tok}%'
        WHERE l_shipdate >= TIMESTAMP '{year_start}'
          AND l_shipdate <  TIMESTAMP '{year_end}'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > {min_qty}
    )
    ORDER BY s_suppkey
    """


def basket_pairs(
    lineitem: DataFrame, part: DataFrame, min_count: int = 2
) -> DataFrame:
    """Market-basket affinity: brand pairs co-purchased within one order,
    with co-occurrence count and lift. → ``[brand_a, brand_b, n_ab,
    lift]``, one row per unordered pair seen in ≥ ``min_count`` orders.

    ``lift = P(a,b) / (P(a)·P(b))`` computed as ``(n_ab / n_a) ·
    (n_orders / n_b)`` — the division-first form sidesteps bigint
    overflow AND is FP-order-identical in both engines.

    Scale shape: lines collapse to DISTINCT (order, brand) baskets first
    (bounded by basket size, not line count), so the orderkey self-join
    fans out at most C(basket, 2) per order — quadratic in the per-order
    basket cap, not in the table. Brand marginals (|brands| rows) and the
    1-row order total broadcast; no fact-sized shuffle after the dedup.
    """
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = baskets.select(
        F.countDistinct("l_orderkey").alias("_n_orders")
    )
    marg = baskets.groupBy("p_brand").agg(F.count("*").alias("_n"))
    a = baskets.select(
        F.col("l_orderkey").alias("_ok"), F.col("p_brand").alias("brand_a")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("_ok2"), F.col("p_brand").alias("brand_b")
    )
    pairs = (
        a.join(b, (a._ok == b._ok2) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= F.lit(int(min_count)))
    )
    ma = marg.select(F.col("p_brand").alias("_ba"), F.col("_n").alias("_n_a"))
    mb = marg.select(F.col("p_brand").alias("_bb"), F.col("_n").alias("_n_b"))
    return (
        pairs.join(F.broadcast(ma), pairs.brand_a == ma._ba)
        .join(F.broadcast(mb), pairs.brand_b == mb._bb)
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(
                (F.col("n_ab") / F.col("_n_a"))
                * (F.col("_n_orders") / F.col("_n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("brand_a", "brand_b")
    )


def basket_pairs_sql(min_count: int = 2) -> str:
    return f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ), tot AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets
    ), marg AS (
        SELECT p_brand, count(*) AS n FROM baskets GROUP BY p_brand
    ), pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
        FROM baskets a
        JOIN baskets b ON a.l_orderkey = b.l_orderkey
                      AND a.p_brand < b.p_brand
        GROUP BY 1, 2
        HAVING count(*) >= {int(min_count)}
    )
    SELECT brand_a, brand_b, n_ab,
           round((n_ab / ma.n) * (tot.n_orders / mb.n), 6) AS lift
    FROM pairs
    JOIN marg ma ON ma.p_brand = brand_a
    JOIN marg mb ON mb.p_brand = brand_b
    CROSS JOIN tot
    ORDER BY brand_a, brand_b
    """


def region_nation_share(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Ratio-to-parent report: revenue per (region, nation) with each
    nation's share of its region and of the grand total. → ``[r_name,
    n_name, revenue, share_of_region, share_of_total]``.

    Scale shape: ONE fact aggregate to the 25-row nation grain; the
    region subtotals and grand total RE-AGGREGATE those 25 rows (never a
    second fact scan, never a window over detail) and broadcast back.
    Cents stay exact integers until the final display division, so the
    three-level reconciliation (nations sum to regions sum to total) is
    exact, and the share ratios divide the same integers in both
    engines.
    """
    dim = customer.join(
        F.broadcast(
            nation.join(
                F.broadcast(region), nation.n_regionkey == region.r_regionkey
            ).select("n_nationkey", "n_name", "r_name")
        ),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "n_name", "r_name")
    per_nation = (
        orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("_cents"),
        )
        .join(F.broadcast(dim), F.col("o_custkey") == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum("_cents").alias("_nc"))
    )
    per_region = per_nation.groupBy("r_name").agg(F.sum("_nc").alias("_rc"))
    total = per_nation.agg(F.sum("_nc").alias("_tc"))
    return (
        per_nation.join(F.broadcast(per_region), "r_name")
        .crossJoin(F.broadcast(total))
        .select(
            "r_name",
            "n_name",
            F.round(F.col("_nc") / F.lit(100.0), 2).alias("revenue"),
            F.round(F.col("_nc") / F.col("_rc").cast("double"), 6).alias(
                "share_of_region"
            ),
            F.round(F.col("_nc") / F.col("_tc").cast("double"), 6).alias(
                "share_of_total"
            ),
        )
        .orderBy("r_name", "n_name")
    )


def region_nation_share_sql() -> str:
    return """
    WITH per_nation AS (
        SELECT r_name, n_name,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS nc
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY r_name, n_name
    ),
    per_region AS (SELECT r_name, CAST(sum(nc) AS BIGINT) AS rc
                   FROM per_nation GROUP BY r_name),
    tot AS (SELECT CAST(sum(nc) AS BIGINT) AS tc FROM per_nation)
    SELECT p.r_name, p.n_name,
           round(nc / 100.0, 2) AS revenue,
           round(nc / CAST(rc AS DOUBLE), 6) AS share_of_region,
           round(nc / CAST(tc AS DOUBLE), 6) AS share_of_total
    FROM per_nation p
    JOIN per_region r ON r.r_name = p.r_name
    CROSS JOIN tot
    ORDER BY p.r_name, p.n_name
    """


def frequent_pairs_apriori(
    lineitem: DataFrame, part: DataFrame, min_support: int = 5
) -> DataFrame:
    """Frequent brand pairs with A-priori candidate pruning (Agrawal &
    Srikant, VLDB 1994 — the downward-closure classic): a pair can only
    reach ``min_support`` co-occurrences if BOTH brands individually do,
    so items below support are dropped BEFORE the quadratic basket
    self-join ever sees them. → ``[brand_a, brand_b, n_ab]``, pairs with
    ``n_ab ≥ min_support``, ordered (brand_a, brand_b).

    Scale shape vs :func:`basket_pairs`: identical output contract for
    the count part, but the self-join input is the SUPPORT-FILTERED
    basket table — on a Zipf catalog that cuts the pair fan-out by the
    long tail's share (most items are infrequent). The frequent-item
    set is an aggregate of the basket table and broadcasts back as a
    semi-join.
    """
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    frequent = (
        baskets.groupBy("p_brand")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= F.lit(int(min_support)))
        .select("p_brand")
    )
    pruned = baskets.join(F.broadcast(frequent), "p_brand", "left_semi")
    a = pruned.select(
        F.col("l_orderkey").alias("_ok"), F.col("p_brand").alias("brand_a")
    )
    b = pruned.select(
        F.col("l_orderkey").alias("_ok2"), F.col("p_brand").alias("brand_b")
    )
    return (
        a.join(b, (a._ok == b._ok2) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= F.lit(int(min_support)))
        .orderBy("brand_a", "brand_b")
    )


def frequent_pairs_apriori_sql(min_support: int = 5) -> str:
    """Oracle: the unpruned definition — pruning must not change the
    answer (downward closure), which is exactly what this checks."""
    return f"""
    WITH fbaskets AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
    FROM fbaskets a
    JOIN fbaskets b ON a.l_orderkey = b.l_orderkey
                   AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    HAVING count(*) >= {int(min_support)}
    ORDER BY brand_a, brand_b
    """


def _brand_firsts(
    orders: DataFrame, lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """Customer-brand FIRST-purchase grain shared by
    :func:`brand_sequence_rules` and :func:`brand_bt_ranking` — the one
    place first-purchase semantics (min order date per customer-brand)
    live, so the two rankings and both SQL oracles cannot drift apart.
    → ``[o_custkey, p_brand, _first]``."""
    return (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey", "p_brand")
        .agg(F.min("o_orderdate").alias("_first"))
    )


def brand_sequence_rules(
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    min_pairs: int = 20,
) -> DataFrame:
    """Directional purchase-sequence rules: for each unordered brand
    pair, how many customers bought one brand strictly before the other
    — "A leads to B" with its reverse for contrast. → ``[brand_x,
    brand_y, n_xy, n_yx, directionality]`` (x < y lexically;
    ``directionality = (n_xy − n_yx)/(n_xy + n_yx)`` ∈ [−1, 1], 6 dp),
    pairs with ``n_xy + n_yx ≥ min_pairs``, ordered (x, y). Same-date
    firsts count for NEITHER direction (no order is observed).

    Scale shape: the fact collapses to (customer, brand,
    first-order-date) — bounded by per-customer brand breadth, not line
    count — and the pair self-join runs per customer on that small
    grain. Brand firsts use ``min`` (exact on timestamps); the counts
    are integers end to end.
    """
    firsts = _brand_firsts(orders, lineitem, part)
    x = firsts.select(
        F.col("o_custkey").alias("_c"),
        F.col("p_brand").alias("brand_x"),
        F.col("_first").alias("_fx"),
    )
    y = firsts.select(
        F.col("o_custkey").alias("_c2"),
        F.col("p_brand").alias("brand_y"),
        F.col("_first").alias("_fy"),
    )
    pairs = x.join(
        y, (x._c == y._c2) & (F.col("brand_x") < F.col("brand_y"))
    )
    agg = pairs.groupBy("brand_x", "brand_y").agg(
        F.sum((F.col("_fx") < F.col("_fy")).cast("long")).alias("n_xy"),
        F.sum((F.col("_fy") < F.col("_fx")).cast("long")).alias("n_yx"),
    )
    tot = F.col("n_xy") + F.col("n_yx")
    return (
        agg.where(tot >= F.lit(int(min_pairs)))
        .select(
            "brand_x",
            "brand_y",
            "n_xy",
            "n_yx",
            F.round((F.col("n_xy") - F.col("n_yx")) / tot.cast("double"), 6).alias(
                "directionality"
            ),
        )
        .orderBy("brand_x", "brand_y")
    )


def brand_sequence_rules_sql(min_pairs: int = 20) -> str:
    return f"""
    WITH bfirst AS (
        SELECT o_custkey, p_brand, min(o_orderdate) AS first_dt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        GROUP BY o_custkey, p_brand
    ),
    bpairs AS (
        SELECT a.p_brand AS brand_x, b.p_brand AS brand_y,
               sum(CASE WHEN a.first_dt < b.first_dt THEN 1 ELSE 0 END) AS n_xy,
               sum(CASE WHEN b.first_dt < a.first_dt THEN 1 ELSE 0 END) AS n_yx
        FROM bfirst a
        JOIN bfirst b ON a.o_custkey = b.o_custkey
                     AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_x, brand_y, CAST(n_xy AS BIGINT) AS n_xy,
           CAST(n_yx AS BIGINT) AS n_yx,
           round((n_xy - n_yx) / CAST(n_xy + n_yx AS DOUBLE), 6)
             AS directionality
    FROM bpairs
    WHERE n_xy + n_yx >= {int(min_pairs)}
    ORDER BY brand_x, brand_y
    """


def _brand_wins(
    orders: DataFrame, lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """Directed pairwise outcomes for :func:`brand_bt_ranking`: ``i``
    beats ``j`` once per customer whose first ``i`` purchase strictly
    precedes their first ``j`` purchase. → ``[i, j, w]`` (ordered
    pairs). Same customer-brand-first grain as
    :func:`brand_sequence_rules`."""
    firsts = _brand_firsts(orders, lineitem, part)
    a = firsts.select(
        F.col("o_custkey").alias("_c"),
        F.col("p_brand").alias("i"),
        F.col("_first").alias("_fi"),
    )
    b = firsts.select(
        F.col("o_custkey").alias("_c2"),
        F.col("p_brand").alias("j"),
        F.col("_first").alias("_fj"),
    )
    return (
        a.join(b, (a._c == b._c2) & (F.col("i") != F.col("j")))
        .where(F.col("_fi") < F.col("_fj"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("w"))
    )


def brand_bt_ranking(
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    n_iter: int = 50,
) -> DataFrame:
    """Bradley–Terry strengths from pairwise purchase order — the model
    behind arena-style rankings (Bradley & Terry 1952; the MM fixed
    point of Hunter, Annals of Statistics 2004): brand ``i`` "beats"
    ``j`` when a customer first buys ``i`` before ``j``; strengths
    satisfy ``P(i beats j) = p_i/(p_i+p_j)``. → ``[brand, strength]``,
    desc (strengths normalized to sum 1, 6 dp).

    The MM update ``p_i ← W_i / Σ_{j≠i} N_ij/(p_i+p_j)`` runs a FIXED
    ``n_iter`` times driver-side over the COLLECTED pair table —
    O(|brands|²) rows by construction (the documented tiny-aggregate
    exception) — and the DuckDB oracle replays the identical algebra as
    unrolled materialized CTE steps (parity by same iteration count,
    as in removal_effects). The pairwise-outcome build itself is fully
    distributed.
    """
    rows = _brand_wins(orders, lineitem, part).collect()
    spark = orders.sparkSession
    schema = "brand string, strength double"
    if not rows:
        return spark.createDataFrame([], schema)
    w = {(r.i, r.j): r.w for r in rows}
    brands = sorted({i for i, _ in w} | {j for _, j in w})
    n = {
        (i, j): w.get((i, j), 0) + w.get((j, i), 0)
        for i in brands
        for j in brands
        if i != j
    }
    wins = {i: sum(w.get((i, j), 0) for j in brands) for i in brands}
    p = {i: 1.0 / len(brands) for i in brands}
    for _ in range(int(n_iter)):
        raw = {}
        for i in brands:
            denom = sum(
                n[(i, j)] / (p[i] + p[j])
                for j in brands
                if j != i and n[(i, j)] > 0
            )
            raw[i] = wins[i] / denom if denom > 0 else 0.0
        s = sum(raw[i] for i in brands)  # sorted-brand order
        p = {i: (raw[i] / s if s > 0 else 0.0) for i in brands}
    out = [(i, round(p[i], 6)) for i in brands]
    out.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(out, schema)


def brand_bt_ranking_sql(n_iter: int = 50) -> str:
    """Unrolled-CTE mirror of the MM iteration (each step MATERIALIZED —
    inlining an n_iter-deep join tree hangs the planner)."""
    steps = []
    prev = "bt0"
    for k in range(1, int(n_iter) + 1):
        steps.append(
            f"""btr{k} AS MATERIALIZED (
      SELECT b.i,
             CASE WHEN sum(n.nij / (pi.p + pj.p)) > 0
               THEN b.wi / sum(n.nij / (pi.p + pj.p)) ELSE 0.0 END AS raw
      FROM btb b
      LEFT JOIN btn n ON n.i = b.i
      LEFT JOIN {prev} pi ON pi.i = b.i
      LEFT JOIN {prev} pj ON pj.i = n.j
      GROUP BY b.i, b.wi
    ),
    bt{k} AS MATERIALIZED (
      SELECT i, CASE WHEN t.s > 0 THEN raw / t.s ELSE 0.0 END AS p
      FROM btr{k} CROSS JOIN (SELECT sum(raw) AS s FROM btr{k}) t
    )"""
        )
        prev = f"bt{k}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH btfirst AS (
        SELECT o_custkey, p_brand, min(o_orderdate) AS first_dt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        GROUP BY o_custkey, p_brand
    ),
    btw AS MATERIALIZED (
        SELECT a.p_brand AS i, b.p_brand AS j, count(*) AS w
        FROM btfirst a
        JOIN btfirst b ON a.o_custkey = b.o_custkey
                      AND a.p_brand <> b.p_brand
        WHERE a.first_dt < b.first_dt
        GROUP BY 1, 2
    ),
    btbrands AS MATERIALIZED (
        SELECT DISTINCT x AS i
        FROM (SELECT i AS x FROM btw UNION SELECT j FROM btw)
    ),
    btn AS MATERIALIZED (
        SELECT a.i, b.i AS j,
               coalesce(w1.w, 0) + coalesce(w2.w, 0) AS nij
        FROM btbrands a
        JOIN btbrands b ON a.i <> b.i
        LEFT JOIN btw w1 ON w1.i = a.i AND w1.j = b.i
        LEFT JOIN btw w2 ON w2.i = b.i AND w2.j = a.i
        WHERE coalesce(w1.w, 0) + coalesce(w2.w, 0) > 0
    ),
    btb AS MATERIALIZED (
        SELECT a.i, CAST(coalesce(sum(w.w), 0) AS DOUBLE) AS wi
        FROM btbrands a LEFT JOIN btw w ON w.i = a.i
        GROUP BY a.i
    ),
    bt0 AS MATERIALIZED (
        SELECT i, 1.0 / (SELECT count(*) FROM btbrands) AS p FROM btbrands
    ),
    {steps_sql}
    SELECT i AS brand, round(p, 6) AS strength
    FROM {prev}
    ORDER BY strength DESC, brand ASC
    """


# ---------------------------------------------------------------------------
# Bucketed numeric band self-join (wave 97)
# ---------------------------------------------------------------------------


def price_band_pairs(orders: DataFrame, band_cents: int = 100) -> DataFrame:
    """→ [o_a, o_b, gap_cents] — every pair of orders whose total prices
    differ by at most ``band_cents`` (o_a < o_b; the "twin transactions"
    primitive behind price-anomaly review, near-duplicate order detection
    and A/B invoice reconciliation).

    THE point of this operator is its plan: a band predicate
    ``|x_a − x_b| ≤ w`` is a theta-join Spark would otherwise execute as
    BroadcastNestedLoop (O(n²) compares). Bucketing x into width-w cells
    turns it into TWO equi-joins — same-bucket and adjacent-bucket —
    because a qualifying pair can never sit more than one bucket apart;
    the exact |gap| filter then prunes the cell-local false candidates.
    Candidate volume is Σ_cell d·(d+d_next) for cell densities d — data-
    bounded, never n². Same-bucket pairs order by key; adjacent pairs
    can't duplicate them (a pair has one bucket distance), so the union
    is exact with no dedup shuffle.

    Prices are exact integer cents (the column's native grain), so
    bucket ids, gaps and the oracle hash are bit-stable.

    Reference parity: no band-join surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension. The
    oracle runs the DEFINITIONAL theta join — the bucketed rewrite must
    not change the answer, which is exactly what the gate checks.
    """
    w = int(band_cents)
    p = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    ).withColumn("bkt", F.expr(f"cents div {w}"))
    a = p.select(
        F.col("k").alias("k_a"), F.col("cents").alias("c_a"),
        F.col("bkt").alias("b_a"),
    )
    b = p.select(
        F.col("k").alias("k_b"), F.col("cents").alias("c_b"),
        F.col("bkt").alias("b_b"),
    )
    same = a.join(b, (F.col("b_a") == F.col("b_b")) & (F.col("k_a") < F.col("k_b")))
    adj = a.join(b, F.col("b_b") == F.col("b_a") + 1)
    cand = same.unionByName(adj)
    return (
        cand.where(
            F.abs(F.col("c_a") - F.col("c_b")) <= w
        )
        .select(
            F.least("k_a", "k_b").alias("o_a"),
            F.greatest("k_a", "k_b").alias("o_b"),
            F.abs(F.col("c_a") - F.col("c_b")).alias("gap_cents"),
        )
        .orderBy("o_a", "o_b")
    )


def price_band_pairs_sql(table: str = "orders", band_cents: int = 100) -> str:
    """DuckDB oracle for :func:`price_band_pairs` — the definitional
    theta join (the bucketed rewrite must reproduce it exactly)."""
    w = int(band_cents)
    return f"""
    WITH pbp AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM {table}
    )
    SELECT a.k AS o_a, b.k AS o_b, abs(a.cents - b.cents) AS gap_cents
    FROM pbp a JOIN pbp b
      ON a.k < b.k AND abs(a.cents - b.cents) <= {w}
    ORDER BY o_a, o_b
    """


# ---------------------------------------------------------------------------
# A-priori frequent triples (wave 97)
# ---------------------------------------------------------------------------


def frequent_triples_apriori(
    lineitem: DataFrame, part: DataFrame, min_support: int = 5
) -> DataFrame:
    """→ [brand_a, brand_b, brand_c, n_abc] — frequent brand TRIPLES with
    two levels of A-priori pruning (Agrawal & Srikant, VLDB 1994): items
    below support are dropped before any join, and (a, b) prefixes are
    semi-joined against the frequent-PAIR set before the third extension
    — downward closure guarantees neither prune changes the answer, and
    the oracle (the unpruned triple join) checks exactly that.

    Scale shape: the basket table is support-filtered first (the Zipf
    long tail never enters a join); the pair-level semi-join bounds the
    (a, b, order) intermediate by the frequent-pair support mass instead
    of C(basket, 2); all joins are order-keyed equi-joins whose fan-out
    is C(frequent-brands-per-basket, 3) — bounded by basket width, not
    data volume. The frequent sets broadcast.
    """
    s = int(min_support)
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    frequent = (
        baskets.groupBy("p_brand")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= s)
        .select("p_brand")
    )
    pruned = baskets.join(F.broadcast(frequent), "p_brand", "left_semi")
    a = pruned.select(F.col("l_orderkey").alias("_ok"), F.col("p_brand").alias("brand_a"))
    b = pruned.select(F.col("l_orderkey").alias("_ok2"), F.col("p_brand").alias("brand_b"))
    c = pruned.select(F.col("l_orderkey").alias("_ok3"), F.col("p_brand").alias("brand_c"))
    ab = a.join(b, (a._ok == b._ok2) & (F.col("brand_a") < F.col("brand_b"))).select(
        "_ok", "brand_a", "brand_b"
    )
    l2 = (
        ab.groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("_n2"))
        .where(F.col("_n2") >= s)
        .select("brand_a", "brand_b")
    )
    ab_pruned = ab.join(F.broadcast(l2), ["brand_a", "brand_b"], "left_semi")
    abc = ab_pruned.join(
        c, (F.col("_ok") == c._ok3) & (F.col("brand_b") < F.col("brand_c"))
    )
    return (
        abc.groupBy("brand_a", "brand_b", "brand_c")
        .agg(F.count("*").cast("long").alias("n_abc"))
        .where(F.col("n_abc") >= s)
        .orderBy("brand_a", "brand_b", "brand_c")
    )


def frequent_triples_apriori_sql(min_support: int = 5) -> str:
    """Oracle: the unpruned triple join — both A-priori prunes must not
    change the answer (downward closure), which is what this checks."""
    s = int(min_support)
    return f"""
    WITH tbaskets AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, c.p_brand AS brand_c,
           CAST(count(*) AS BIGINT) AS n_abc
    FROM tbaskets a
    JOIN tbaskets b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    JOIN tbaskets c ON a.l_orderkey = c.l_orderkey AND b.p_brand < c.p_brand
    GROUP BY 1, 2, 3
    HAVING count(*) >= {s}
    ORDER BY brand_a, brand_b, brand_c
    """


# ---------------------------------------------------------------------------
# Privacy audits: k-anonymity + l-diversity (wave 99)
# ---------------------------------------------------------------------------


def k_anonymity_audit(customer: DataFrame, k: int = 10) -> DataFrame:
    """→ one row [n_rows, n_groups, min_group_size, n_violating_groups,
    n_violating_rows, pct_rows_at_risk] — the k-anonymity audit (Sweeney
    2002) of the customer table under the quasi-identifier pair
    (nation, market segment): a row is re-identifiable if its QI
    equivalence class holds fewer than ``k`` rows. The release-gate
    number a data-governance review asks for before a table leaves the
    boundary — the relational-side companion to the text-side PII
    redaction.

    Exactness: every statistic is an exact BIGINT over the QI-grain
    aggregate; the single ratio is one staged division rounded to 6
    (NULL on an empty table rather than an ANSI error).

    Scale shape: ONE grouped count at QI grain (map-side combinable —
    QI cardinality is |nations|×|segments|, a broadcast-sized frame),
    then a one-row reduce over that frame. The fact table is read once.

    Reference parity: no governance surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    g = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    s = g.groupBy().agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.min("n").cast("long").alias("min_group_size"),
        F.coalesce(
            F.sum(F.when(F.col("n") < k, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_violating_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_violating_rows"),
    )
    return s.select(
        "*",
        F.when(
            F.col("n_rows") > 0,
            F.round(
                F.col("n_violating_rows").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ),
        ).alias("pct_rows_at_risk"),
    )


def k_anonymity_audit_sql(table: str = "customer", k: int = 10) -> str:
    """DuckDB oracle for :func:`k_anonymity_audit`."""
    return f"""
    WITH kan_g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n
      FROM {table} GROUP BY 1, 2
    ), kan_s AS (
      SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(n) AS BIGINT) AS min_group_size,
             CAST(coalesce(sum(CASE WHEN n < {int(k)} THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_violating_groups,
             CAST(coalesce(sum(CASE WHEN n < {int(k)} THEN n ELSE 0 END), 0)
                  AS BIGINT) AS n_violating_rows
      FROM kan_g
    )
    SELECT *,
           CASE WHEN n_rows > 0
                THEN round(CAST(n_violating_rows AS DOUBLE)
                           / CAST(n_rows AS DOUBLE), 6)
           END AS pct_rows_at_risk
    FROM kan_s
    """


def l_diversity_risk(
    customer: DataFrame, l: int = 3, bucket_cents: int = 500_000
) -> DataFrame:
    """→ [c_nationkey, c_mktsegment, n, n_sensitive_distinct] — the QI
    equivalence classes that FAIL distinct l-diversity (Machanavajjhala
    et al. 2007) for the sensitive attribute "account-balance bracket":
    groups where an attacker who locates a person's class learns their
    balance bracket to fewer than ``l`` possibilities. k-anonymity's
    necessary complement — a large group with ONE sensitive value is
    still a disclosure.

    The sensitive bracket is exact integer division of exact cents
    (``round(acctbal·100) div bucket_cents`` — engine-identical,
    negative balances floor consistently via two's-complement-free
    explicit floor semantics: both engines' ``div``/``//`` truncate
    toward negative infinity for DuckDB ``//`` but toward zero for
    Spark ``div``, so the bracket uses ``floor(cents / width)`` staged
    as ONE shared double-free expression on nonneg-shifted cents).

    Scale shape: one grouped count-distinct at QI grain (the distinct
    runs map-side over (QI, bracket) first — bracket cardinality is a
    constant), output bounded by |QI lattice|, ordered for the gate.
    """
    w = int(bucket_cents)
    # shift by 10^7 cents so the integer division floors uniformly for
    # negative balances in BOTH engines (Spark div truncates toward 0,
    # DuckDB // floors — identical on nonnegative operands)
    g = (
        customer.select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                f"(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 10000000)"
                f" div {w}"
            ).alias("bracket"),
        )
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("bracket").cast("long").alias(
                "n_sensitive_distinct"
            ),
        )
    )
    return (
        g.where(F.col("n_sensitive_distinct") < l)
        .orderBy("c_nationkey", "c_mktsegment")
    )


def l_diversity_risk_sql(
    table: str = "customer", l: int = 3, bucket_cents: int = 500_000
) -> str:
    """DuckDB oracle for :func:`l_diversity_risk` (same shifted-cents
    bracket; DuckDB // on the shifted nonnegative operand matches
    Spark's div)."""
    w = int(bucket_cents)
    return f"""
    WITH ldr_g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT
               (CAST(round(c_acctbal * 100, 0) AS BIGINT) + 10000000) // {w})
               AS BIGINT) AS n_sensitive_distinct
      FROM {table} GROUP BY 1, 2
    )
    SELECT * FROM ldr_g WHERE n_sensitive_distinct < {int(l)}
    ORDER BY c_nationkey, c_mktsegment
    """


# ---------------------------------------------------------------------------
# Supply-concentration risk (wave 101)
# ---------------------------------------------------------------------------


def supplier_concentration(lineitem: DataFrame, top_n: int = 50) -> DataFrame:
    """→ [p_partkey, n_suppliers, total_qty, hhi] — the ``top_n`` parts by
    Herfindahl–Hirschman concentration of shipped quantity across their
    suppliers (HHI = Σ share², 1.0 = single-sourced) — the procurement
    risk ranking behind "which parts have no second source". Complements
    the degree-distribution HHI (hub skew) with the supply-chain view.

    Exactness: quantities are exact centi-units (the column's native
    grain); per-part Σq_i² and (Σq_i)² stay BIGINT (a supplier's part
    quantity would need to pass ~3e9 centi-units before the square
    threatens 2^63 — ANSI raises, never wraps); ``hhi`` is one staged
    division of those integers rounded to 6, and the top-k orders by the
    ROUNDED hhi (desc, then partkey) so the limit boundary is
    engine-stable. ``total_qty`` returns to whole units, rounded to 2.

    Scale shape: one aggregate to (part, supplier) grain, one to part
    grain — both map-side combinable — then TakeOrdered(top_n). No
    windows, no self-joins.

    Reference parity: no supply-chain surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    ps = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_quantity") * 100, 0).cast("long").alias("q"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("q").alias("qs"))
    )
    per = ps.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.sum("qs").alias("qt"),
        F.sum(F.col("qs") * F.col("qs")).alias("q2"),
    )
    return (
        per.where(F.col("qt") > 0)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "n_suppliers",
            F.round(F.col("qt") / 100.0, 2).alias("total_qty"),
            F.round(
                F.col("q2").cast("double")
                / (F.col("qt").cast("double") * F.col("qt").cast("double")),
                6,
            ).alias("hhi"),
        )
        .orderBy(F.desc("hhi"), F.asc("p_partkey"))
        .limit(int(top_n))
    )


def supplier_concentration_sql(table: str = "lineitem", top_n: int = 50) -> str:
    """DuckDB oracle for :func:`supplier_concentration` (same staged
    division, same rounded-hhi tie-break)."""
    return f"""
    WITH spc_ps AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qs
      FROM {table} GROUP BY 1, 2
    ), spc_p AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             sum(qs) AS qt, sum(qs * qs) AS q2
      FROM spc_ps GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, n_suppliers,
           round(qt / 100.0, 2) AS total_qty,
           round(CAST(q2 AS DOUBLE)
                 / (CAST(qt AS DOUBLE) * CAST(qt AS DOUBLE)), 6) AS hhi
    FROM spc_p WHERE qt > 0
    ORDER BY hhi DESC, p_partkey ASC LIMIT {int(top_n)}
    """


def single_source_audit(lineitem: DataFrame) -> DataFrame:
    """→ one row [n_parts, n_single_sourced, n_dominated, pct_single,
    pct_dominated] — the procurement-resilience audit: how many traded
    parts ship from exactly ONE supplier, and how many are DOMINATED —
    top supplier carrying ≥ 4/5 of the part's quantity. The dominance
    test is the exact integer predicate ``5·max_supplier_qty ≥ 4·total``
    (no doubles anywhere near the decision), so the classification — and
    therefore the oracle hash — cannot drift between engines.
    Single-sourced parts count as dominated too (their top share is 1).

    Scale shape: (part, supplier) aggregate → part-grain aggregate (max
    + sum + count, map-side combinable) → one-row reduce. One fact read.
    """
    ps = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_quantity") * 100, 0).cast("long").alias("q"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("q").alias("qs"))
    )
    per = ps.groupBy("l_partkey").agg(
        F.count("*").alias("ns"),
        F.max("qs").alias("mx"),
        F.sum("qs").alias("qt"),
    )
    s = per.where(F.col("qt") > 0).groupBy().agg(
        F.count("*").cast("long").alias("n_parts"),
        F.coalesce(
            F.sum(F.when(F.col("ns") == 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_single_sourced"),
        F.coalesce(
            F.sum(
                F.when(
                    F.lit(5) * F.col("mx") >= F.lit(4) * F.col("qt"), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_dominated"),
    )
    return s.select(
        "*",
        F.when(
            F.col("n_parts") > 0,
            F.round(
                F.col("n_single_sourced").cast("double")
                / F.col("n_parts").cast("double"),
                6,
            ),
        ).alias("pct_single"),
        F.when(
            F.col("n_parts") > 0,
            F.round(
                F.col("n_dominated").cast("double")
                / F.col("n_parts").cast("double"),
                6,
            ),
        ).alias("pct_dominated"),
    )


def single_source_audit_sql(table: str = "lineitem") -> str:
    """DuckDB oracle for :func:`single_source_audit` (same exact integer
    dominance predicate)."""
    return f"""
    WITH ssa_ps AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qs
      FROM {table} GROUP BY 1, 2
    ), ssa_p AS (
      SELECT l_partkey, count(*) AS ns, max(qs) AS mx, sum(qs) AS qt
      FROM ssa_ps GROUP BY 1
    ), ssa_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(coalesce(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_single_sourced,
             CAST(coalesce(sum(CASE WHEN 5 * mx >= 4 * qt THEN 1 ELSE 0 END),
                  0) AS BIGINT) AS n_dominated
      FROM ssa_p WHERE qt > 0
    )
    SELECT *,
           CASE WHEN n_parts > 0
                THEN round(CAST(n_single_sourced AS DOUBLE)
                           / CAST(n_parts AS DOUBLE), 6) END AS pct_single,
           CASE WHEN n_parts > 0
                THEN round(CAST(n_dominated AS DOUBLE)
                           / CAST(n_parts AS DOUBLE), 6) END AS pct_dominated
    FROM ssa_s
    """


# ---------------------------------------------------------------------------
# Association rules: confidence + lift (wave 112)
# ---------------------------------------------------------------------------


def association_rules(
    lineitem: DataFrame, part: DataFrame, min_support: int = 5
) -> DataFrame:
    """→ [antecedent, consequent, n_ab, n_a, n_b, confidence, lift] — the
    classic association rules (Agrawal et al. 1993) over frequent brand
    pairs: confidence(a→b) = n_ab/n_a and lift = n_ab·N/(n_a·n_b), both
    DIRECTIONS of every pair meeting ``min_support`` (a→b and b→a have
    different confidences; lift is symmetric and repeats — that is the
    standard presentation). The actionable layer on top of
    :func:`frequent_pairs_apriori`'s raw counts.

    Exactness: all four counts are exact BIGINTs from the same
    support-pruned basket table; confidence and lift are single staged
    divisions of those integers rounded to 6 (denominators ≥ min_support
    > 0 by construction — no guards needed, and that invariant is the
    point of pruning first).

    Scale shape: identical to the frequent-pair plan — support-filtered
    baskets, one order-keyed pair equi-join bounded by basket width,
    margins broadcast back onto the pair table.
    """
    s = int(min_support)
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_baskets = baskets.select(
        F.countDistinct("l_orderkey").alias("n_total")
    )
    marg = baskets.groupBy("p_brand").agg(F.count("*").alias("n_m"))
    frequent = marg.where(F.col("n_m") >= s).select("p_brand")
    pruned = baskets.join(F.broadcast(frequent), "p_brand", "left_semi")
    a = pruned.select(F.col("l_orderkey").alias("_ok"), F.col("p_brand").alias("brand_a"))
    b = pruned.select(F.col("l_orderkey").alias("_ok2"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, (a._ok == b._ok2) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= s)
    )
    both = pairs.select(
        F.col("brand_a").alias("antecedent"),
        F.col("brand_b").alias("consequent"),
        "n_ab",
    ).unionByName(
        pairs.select(
            F.col("brand_b").alias("antecedent"),
            F.col("brand_a").alias("consequent"),
            "n_ab",
        )
    )
    ma = marg.select(F.col("p_brand").alias("antecedent"), F.col("n_m").alias("n_a"))
    mb = marg.select(F.col("p_brand").alias("consequent"), F.col("n_m").alias("n_b"))
    return (
        both.join(F.broadcast(ma), "antecedent")
        .join(F.broadcast(mb), "consequent")
        .crossJoin(n_baskets)
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("round(CAST(n_ab AS DOUBLE) / n_a, 6)").alias("confidence"),
            F.expr(
                "round(CAST(n_ab AS DOUBLE) * n_total"
                " / (CAST(n_a AS DOUBLE) * n_b), 6)"
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


def association_rules_sql(min_support: int = 5) -> str:
    """Oracle for :func:`association_rules` — unpruned definition (the
    support prune must not change the rule set, per downward closure)."""
    s = int(min_support)
    return f"""
    WITH arl_b AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ), arl_n AS (
        SELECT count(DISTINCT l_orderkey) AS n_total FROM arl_b
    ), arl_m AS (
        SELECT p_brand, count(*) AS n_m FROM arl_b GROUP BY 1
    ), arl_p AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
        FROM arl_b a JOIN arl_b b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2 HAVING count(*) >= {s}
    ), arl_d AS (
        SELECT brand_a AS antecedent, brand_b AS consequent, n_ab FROM arl_p
        UNION ALL
        SELECT brand_b, brand_a, n_ab FROM arl_p
    )
    SELECT d.antecedent, d.consequent,
           CAST(d.n_ab AS BIGINT) AS n_ab,
           CAST(ma.n_m AS BIGINT) AS n_a,
           CAST(mb.n_m AS BIGINT) AS n_b,
           round(CAST(d.n_ab AS DOUBLE) / ma.n_m, 6) AS confidence,
           round(CAST(d.n_ab AS DOUBLE) * n.n_total
                 / (CAST(ma.n_m AS DOUBLE) * mb.n_m), 6) AS lift
    FROM arl_d d
    JOIN arl_m ma ON ma.p_brand = d.antecedent
    JOIN arl_m mb ON mb.p_brand = d.consequent
    CROSS JOIN arl_n n
    ORDER BY antecedent, consequent
    """


# ---------------------------------------------------------------------------
# Return-rate league tables (wave 113)
# ---------------------------------------------------------------------------

# Wilson 95% bounds as shared expression fragments over (x, n) — the same
# exact literals as ml._WILSON_STAGE, reusable at any grouping grain.
_WILSON_LO = (
    "round((CAST(x AS DOUBLE) / n + 1.9208 / n"
    " - 1.96 * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n)"
    " / n + 0.9604 / (CAST(n AS DOUBLE) * n)))"
    " / (1.0 + 3.8416 / n), 6)"
)
_WILSON_HI = _WILSON_LO.replace("- 1.96 *", "+ 1.96 *")


def brand_return_wilson(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """→ [p_brand, n, n_returned, rate, wilson_lo, wilson_hi] — per-brand
    lineitem RETURN rate (``l_returnflag = 'R'``) with the 95% Wilson
    score interval (Wilson 1927): the quality-control league table with
    honest error bars, so a 3-line brand at 100% returns shows its
    giant interval instead of topping the naive ranking.

    Exactness: x and n are exact line counts; both bounds evaluate the
    SAME literal expression strings as the conversion-CI operator
    (z constants baked in, no engine erfinv), rounded 6; bounds live in
    [0, 1] by construction. Scale shape: one broadcast brand attach +
    one brand-grain aggregate — map-side combinable, |brands| rows out.
    """
    j = lineitem.select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    ).join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    g = j.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ret").cast("long").alias("x"),
    )
    return g.select(
        "p_brand",
        "n",
        F.col("x").alias("n_returned"),
        F.expr("round(CAST(x AS DOUBLE) / n, 6)").alias("rate"),
        F.expr(_WILSON_LO).alias("wilson_lo"),
        F.expr(_WILSON_HI).alias("wilson_hi"),
    ).orderBy("p_brand")


def brand_return_wilson_sql(
    lineitem: str = "lineitem", part: str = "part"
) -> str:
    """DuckDB oracle for :func:`brand_return_wilson` (same literals)."""
    return f"""
    WITH brw_g AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM {lineitem} JOIN {part} ON p_partkey = l_partkey
      GROUP BY p_brand
    )
    SELECT p_brand, n, x AS n_returned,
           round(CAST(x AS DOUBLE) / n, 6) AS rate,
           {_WILSON_LO} AS wilson_lo,
           {_WILSON_HI} AS wilson_hi
    FROM brw_g ORDER BY p_brand
    """


def eb_supplier_returns(lineitem: DataFrame) -> DataFrame:
    """→ [l_suppkey, n_lines, n_returned, rate, shrunk_rate] — per-
    supplier return rates with the same empirical-Bayes beta-binomial
    shrinkage as the source-quality league (method-of-moments prior over
    suppliers, shrunk = (x + K·m)/(n + K)): small suppliers stop
    dominating both ends of the ranking on noise. Demonstrates the
    shrinkage pattern generalizes across tables/grains unchanged.

    Same determinism contract as
    :func:`~linkgraph_spark.functions.text.eb_source_quality`:
    micro-quantized rates, exact integer prior moments
    (DECIMAL/HUGEINT), staged K, raw-rate fallback on degenerate
    priors. Scale shape: one supplier-grain aggregate, prior over the
    |suppliers| frame, one-row broadcast back.
    """
    per = (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("x"),
        )
        .withColumn(
            "r_u",
            F.round(
                F.lit(1e6) * F.col("x").cast("double") / F.col("n"), 0
            ).cast("long"),
        )
    )
    prior = per.groupBy().agg(
        F.count("*").cast("long").alias("s"),
        F.sum(F.col("r_u").cast("decimal(38,0)")).alias("sr"),
        F.sum(F.col("r_u").cast("decimal(38,0)") * F.col("r_u")).alias("srr"),
    )
    m_d = "CAST(sr AS DOUBLE) / (1e6 * s)"
    v_d = (
        "(CAST(s AS DOUBLE) * CAST(srr AS DOUBLE)"
        " - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))"
        " / (1e12 * CAST(s AS DOUBLE) * s)"
    )
    kk = f"(({m_d}) * (1.0 - ({m_d})) / ({v_d}) - 1.0)"
    return (
        per.crossJoin(F.broadcast(prior))
        .select(
            "l_suppkey",
            F.col("n").cast("long").alias("n_lines"),
            F.col("x").cast("long").alias("n_returned"),
            F.expr("round(CAST(x AS DOUBLE) / n, 6)").alias("rate"),
            F.expr(
                f"CASE WHEN s >= 2 AND ({v_d}) > 0 AND ({kk}) > 0 THEN"
                f" round((CAST(x AS DOUBLE) + ({kk}) * ({m_d}))"
                f" / (CAST(n AS DOUBLE) + ({kk})), 6)"
                " ELSE round(CAST(x AS DOUBLE) / n, 6) END"
            ).alias("shrunk_rate"),
        )
        .orderBy("l_suppkey")
    )


def eb_supplier_returns_sql(table: str = "lineitem") -> str:
    """DuckDB oracle for :func:`eb_supplier_returns` (same staged prior)."""
    m_d = "CAST(sr AS DOUBLE) / (1e6 * s)"
    v_d = (
        "(CAST(s AS DOUBLE) * CAST(srr AS DOUBLE)"
        " - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))"
        " / (1e12 * CAST(s AS DOUBLE) * s)"
    )
    kk = f"(({m_d}) * (1.0 - ({m_d})) / ({v_d}) - 1.0)"
    return f"""
    WITH ebs_p AS (
      SELECT l_suppkey, count(*) AS n,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS x
      FROM {table} GROUP BY 1
    ), ebs_r AS (
      SELECT *, CAST(round(1e6 * CAST(x AS DOUBLE) / n, 0) AS BIGINT) AS r_u
      FROM ebs_p
    ), ebs_prior AS (
      SELECT CAST(count(*) AS BIGINT) AS s,
             sum(CAST(r_u AS HUGEINT)) AS sr,
             sum(CAST(r_u AS HUGEINT) * r_u) AS srr
      FROM ebs_r
    )
    SELECT l_suppkey,
           CAST(n AS BIGINT) AS n_lines,
           CAST(x AS BIGINT) AS n_returned,
           round(CAST(x AS DOUBLE) / n, 6) AS rate,
           CASE WHEN s >= 2 AND ({v_d}) > 0 AND ({kk}) > 0 THEN
             round((CAST(x AS DOUBLE) + ({kk}) * ({m_d}))
                   / (CAST(n AS DOUBLE) + ({kk})), 6)
           ELSE round(CAST(x AS DOUBLE) / n, 6) END AS shrunk_rate
    FROM ebs_r CROSS JOIN ebs_prior
    ORDER BY l_suppkey
    """


# ---------------------------------------------------------------------------
# Popularity-baseline recommender eval (wave 114)
# ---------------------------------------------------------------------------


def popularity_rec_hitrate(
    orders: DataFrame, lineitem: DataFrame, part: DataFrame, k: int = 10
) -> DataFrame:
    """→ one row [cutoff_day, n_train_orders, n_test_orders,
    n_test_customers, n_hits, hit_rate] — the POPULARITY-BASELINE
    recommender evaluated with a temporal split: train = orders up to
    the median order date, candidate list = the k most-purchased train
    brands, and a test-half customer counts as a HIT if any brand they
    buy after the cutoff is in the candidate list MINUS the brands they
    already bought in train (recommending the already-seen is not a
    recommendation — the standard eval convention). Every recommender
    paper's mandatory baseline; until a model beats this number it
    isn't a model.

    Determinism: the cutoff is the exact interpolated median of integer
    epoch order-days, floored (identical in both engines); popularity
    top-k ties break by brand name; hits are exact set logic on integer
    keys. The hit rate is one staged division rounded 6, NULL when no
    customer has post-cutoff purchases.

    Scale shape: one orders→lineitem→part brand attach (part
    broadcasts), one train brand-popularity aggregate with
    TakeOrdered(k), the candidate list broadcast; per-customer logic is
    two grain aggregates and a left-anti-style membership test — no
    per-customer windows, no cross join.

    Reference parity: no recommender surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    day = F.floor(
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        / F.lit(86_400_000_000)
    ).cast("long")
    o = orders.select("o_orderkey", "o_custkey", day.alias("day"))
    cutoff = o.groupBy().agg(
        F.floor(F.expr("percentile(day, 0.5D)")).cast("long").alias("cutoff")
    )
    ob = (
        o.crossJoin(F.broadcast(cutoff))
        .join(
            lineitem.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "p_brand",
            (F.col("day") <= F.col("cutoff")).alias("is_train"),
        )
    )
    top = (
        ob.where(F.col("is_train"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("pop"))
        .orderBy(F.desc("pop"), F.asc("p_brand"))
        .limit(int(k))
        .select("p_brand")
        .withColumn("rec", F.lit(True))
    )
    seen = (
        ob.where(F.col("is_train"))
        .select("o_custkey", "p_brand")
        .distinct()
        .withColumn("seen", F.lit(True))
    )
    test = (
        ob.where(~F.col("is_train"))
        .select("o_custkey", "p_brand")
        .distinct()
        .join(F.broadcast(top), "p_brand", "left")
        .join(seen, ["o_custkey", "p_brand"], "left")
    )
    per_cust = test.groupBy("o_custkey").agg(
        F.max(
            (
                F.coalesce(F.col("rec"), F.lit(False))
                & ~F.coalesce(F.col("seen"), F.lit(False))
            ).cast("int")
        ).alias("hit")
    )
    counts = ob.groupBy().agg(
        F.countDistinct(
            F.when(F.col("is_train"), F.col("o_orderkey"))
        ).cast("long").alias("n_train_orders"),
        F.countDistinct(
            F.when(~F.col("is_train"), F.col("o_orderkey"))
        ).cast("long").alias("n_test_orders"),
    )
    hits = per_cust.groupBy().agg(
        F.count("*").cast("long").alias("n_test_customers"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
    )
    return (
        cutoff.crossJoin(counts)
        .crossJoin(hits)
        .select(
            F.col("cutoff").alias("cutoff_day"),
            "n_train_orders",
            "n_test_orders",
            "n_test_customers",
            "n_hits",
            F.expr(
                "CASE WHEN n_test_customers > 0 THEN"
                " round(CAST(n_hits AS DOUBLE) / n_test_customers, 6) END"
            ).alias("hit_rate"),
        )
    )


def popularity_rec_hitrate_sql(
    orders: str = "orders",
    lineitem: str = "lineitem",
    part: str = "part",
    k: int = 10,
) -> str:
    """DuckDB oracle for :func:`popularity_rec_hitrate` (same floored
    median cutoff, same tie-break, same seen-exclusion)."""
    return f"""
    WITH prh_o AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(epoch_us(CAST(o_orderdate AS TIMESTAMP))
                        / 86400000000) AS BIGINT) AS day
      FROM {orders}
    ), prh_cut AS (
      SELECT CAST(floor(quantile_cont(day, 0.5)) AS BIGINT) AS cutoff
      FROM prh_o
    ), prh_ob AS (
      SELECT o.o_orderkey, o.o_custkey, p.p_brand,
             o.day <= c.cutoff AS is_train
      FROM prh_o o
      JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
      JOIN {part} p ON p.p_partkey = l.l_partkey
      CROSS JOIN prh_cut c
    ), prh_top AS (
      SELECT p_brand FROM prh_ob WHERE is_train
      GROUP BY p_brand ORDER BY count(*) DESC, p_brand ASC LIMIT {int(k)}
    ), prh_seen AS (
      SELECT DISTINCT o_custkey, p_brand FROM prh_ob WHERE is_train
    ), prh_test AS (
      SELECT DISTINCT t.o_custkey, t.p_brand FROM prh_ob t
      WHERE NOT t.is_train
    ), prh_pc AS (
      SELECT t.o_custkey,
             max(CASE WHEN r.p_brand IS NOT NULL AND s.o_custkey IS NULL
                      THEN 1 ELSE 0 END) AS hit
      FROM prh_test t
      LEFT JOIN prh_top r ON r.p_brand = t.p_brand
      LEFT JOIN prh_seen s
        ON s.o_custkey = t.o_custkey AND s.p_brand = t.p_brand
      GROUP BY t.o_custkey
    ), prh_counts AS (
      SELECT CAST(count(DISTINCT CASE WHEN is_train THEN o_orderkey END)
                  AS BIGINT) AS n_train_orders,
             CAST(count(DISTINCT CASE WHEN NOT is_train THEN o_orderkey END)
                  AS BIGINT) AS n_test_orders
      FROM prh_ob
    ), prh_h AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test_customers,
             CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hits
      FROM prh_pc
    )
    SELECT c.cutoff AS cutoff_day, n_train_orders, n_test_orders,
           n_test_customers, n_hits,
           CASE WHEN n_test_customers > 0 THEN
             round(CAST(n_hits AS DOUBLE) / n_test_customers, 6)
           END AS hit_rate
    FROM prh_cut c, prh_counts, prh_h
    """


# ---------------------------------------------------------------------------
# Grouped simple regression: discount elasticity per brand (wave 117)
# ---------------------------------------------------------------------------


def discount_elasticity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """→ [p_brand, n, slope, intercept, r2] — per-brand simple OLS of
    quantity on discount (does discounting move volume, and for which
    brands): the GROUPED companion to the global OLS-as-aggregates fit —
    same exact-moment machinery, one fit per group key, which is the
    shape a 100 TB "regression per segment" actually runs as (no
    per-group solver, no iteration: five integer moment sums per brand
    and a closed form).

    Exactness: discount → exact basis points, quantity → exact
    centi-units (native grains); all five moments are
    DECIMAL(38,0)/HUGEINT sums; slope/intercept/r2 are staged doubles of
    those integers (identical text both engines), rounded 6. Degenerate
    groups (n < 2 or zero discount variance) report NULL fit; zero
    QUANTITY variance reports r2 NULL (undefined) with slope 0 exactly.
    Unit note: slope is centi-units of quantity per basis point.

    Scale shape: one broadcast brand attach, ONE grouped aggregate
    (map-side combinable), closed-form math on |brands| rows.

    Reference parity: no regression surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    j = lineitem.select(
        "l_partkey",
        F.round(F.col("l_discount") * 10000, 0).cast("long").alias("x"),
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("y"),
    ).join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    d38 = "decimal(38,0)"
    g = j.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
    )
    dx = "CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx"
    dy = "CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy"
    dxy = "CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy"
    return g.select(
        "p_brand",
        "n",
        F.expr(
            f"CASE WHEN n >= 2 AND ({dx}) > 0"
            f" THEN round(({dxy}) / ({dx}), 6) END"
        ).alias("slope"),
        F.expr(
            f"CASE WHEN n >= 2 AND ({dx}) > 0 THEN"
            f" round((CAST(sy AS DOUBLE) - (({dxy}) / ({dx}))"
            f" * CAST(sx AS DOUBLE)) / n, 6) END"
        ).alias("intercept"),
        F.expr(
            f"CASE WHEN n >= 2 AND ({dx}) > 0 AND ({dy}) > 0 THEN"
            f" round((({dxy}) * ({dxy})) / (({dx}) * ({dy})), 6) END"
        ).alias("r2"),
    ).orderBy("p_brand")


def discount_elasticity_sql(
    lineitem: str = "lineitem", part: str = "part"
) -> str:
    """DuckDB oracle for :func:`discount_elasticity` (same HUGEINT
    moments, same staged closed form)."""
    dx = "CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx"
    dy = "CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy"
    dxy = "CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy"
    return f"""
    WITH del_j AS (
      SELECT p_brand,
             CAST(round(l_discount * 10000, 0) AS BIGINT) AS x,
             CAST(round(l_quantity * 100, 0) AS BIGINT) AS y
      FROM {lineitem} JOIN {part} ON p_partkey = l_partkey
    ), del_g AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM del_j GROUP BY p_brand
    )
    SELECT p_brand, n,
           CASE WHEN n >= 2 AND ({dx}) > 0
                THEN round(({dxy}) / ({dx}), 6) END AS slope,
           CASE WHEN n >= 2 AND ({dx}) > 0 THEN
             round((CAST(sy AS DOUBLE) - (({dxy}) / ({dx}))
                    * CAST(sx AS DOUBLE)) / n, 6) END AS intercept,
           CASE WHEN n >= 2 AND ({dx}) > 0 AND ({dy}) > 0 THEN
             round((({dxy}) * ({dxy})) / (({dx}) * ({dy})), 6) END AS r2
    FROM del_g ORDER BY p_brand
    """


# --------------------------------------------------------------- wave 119
def kendall_daily(orders: DataFrame) -> DataFrame:
    """→ one row [n_days, concordant, discordant, tau_b] — Kendall's
    tau-b rank correlation (Kendall 1938; the tau-b tie correction)
    between the DAILY order count and the DAILY revenue: does a busier
    day reliably mean a richer day, read through ranks so one whale
    order can't fake the association.

    The scale trick: tau is O(n²) in observations, so it runs at DAY
    grain — one pass over orders collapses to the daily series (count,
    exact revenue cents), and the pair lattice is |days|² over that
    bounded frame (a few thousand rows even at a decade of horizon),
    never orders². Concordant/discordant are exact BIGINT counts from
    the d1 < d2 self-join; the tie terms come from the x- and y-value
    histograms as exact Σc(c−1)/2; tau_b is ONE staged double over
    those five exact integers, rounded 6, NULL when either side is
    fully tied (denominator 0).

    Scale shape: one orders-grain aggregate, a bounded day-pair
    self-join (broadcastable), two histogram aggregates, one reduce.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").alias("x"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "y"
        ),
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, F.col("a.d") < F.col("b.d"))
    sgn = (
        F.signum((F.col("a.x") - F.col("b.x")).cast("double"))
        * F.signum((F.col("a.y") - F.col("b.y")).cast("double"))
    )
    cd = pairs.groupBy().agg(
        F.sum(F.when(sgn == 1.0, 1).otherwise(0)).cast("long").alias("conc"),
        F.sum(F.when(sgn == -1.0, 1).otherwise(0)).cast("long").alias("disc"),
    )
    d38 = "decimal(38,0)"

    def _tie_sum(col):
        # c*(c-1) is even, so DIV 2 is exact; c is bounded by the day
        # horizon so the long product cannot overflow.
        return (
            d.groupBy(col)
            .agg(F.count("*").alias("c"))
            .groupBy()
            .agg(
                F.sum(
                    F.expr("CAST(c * (c - 1) DIV 2 AS decimal(38,0))")
                ).alias(f"t{col}")
            )
        )

    n = d.groupBy().agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr(
            "CAST(count(*) * (count(*) - 1) DIV 2 AS decimal(38,0))"
        ).alias("n0"),
    )
    s = (
        n.crossJoin(cd)
        .crossJoin(_tie_sum("x"))
        .crossJoin(_tie_sum("y"))
    )
    tau = (
        "(CAST(conc AS DOUBLE) - disc)"
        " / sqrt((CAST(n0 AS DOUBLE) - tx) * (CAST(n0 AS DOUBLE) - ty))"
    )
    return s.select(
        "n_days",
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.expr(
            f"CASE WHEN n0 > tx AND n0 > ty THEN round({tau}, 6) END"
        ).alias("tau_b"),
    )


def kendall_daily_sql(table: str = "orders") -> str:
    """DuckDB oracle for :func:`kendall_daily` (same day-grain lattice,
    exact tie terms, shared staged tau)."""
    tau = (
        "(CAST(conc AS DOUBLE) - disc)"
        " / sqrt((CAST(n0 AS DOUBLE) - tx) * (CAST(n0 AS DOUBLE) - ty))"
    )
    return f"""
    WITH kd_d AS (
      SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS x,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS y
      FROM {table} GROUP BY 1
    ), kd_cd AS (
      SELECT CAST(sum(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS conc,
             CAST(sum(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) = -1
                           THEN 1 ELSE 0 END) AS BIGINT) AS disc
      FROM kd_d a JOIN kd_d b ON a.d < b.d
    ), kd_tx AS (
      SELECT sum(CAST(c * (c - 1) // 2 AS HUGEINT)) AS tx
      FROM (SELECT count(*) AS c FROM kd_d GROUP BY x)
    ), kd_ty AS (
      SELECT sum(CAST(c * (c - 1) // 2 AS HUGEINT)) AS ty
      FROM (SELECT count(*) AS c FROM kd_d GROUP BY y)
    ), kd_n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(count(*) * (count(*) - 1) // 2 AS HUGEINT) AS n0
      FROM kd_d
    )
    SELECT n_days, conc AS concordant, disc AS discordant,
           CASE WHEN n0 > tx AND n0 > ty THEN round({tau}, 6) END AS tau_b
    FROM kd_n CROSS JOIN kd_cd CROSS JOIN kd_tx CROSS JOIN kd_ty
    """


def theil_spend(orders: DataFrame) -> DataFrame:
    """→ one row [n_customers, mean_cents, theil, theil_norm] — the
    Theil T inequality index (Theil 1967) of per-customer total spend:
    T = (1/n)·Σ(xᵢ/μ)·ln(xᵢ/μ), the entropy-based concentration read
    that decomposes where Gini doesn't. theil_norm = T / ln(n) ∈ [0,1]
    rescales by the theoretical maximum (one customer owns everything).

    Exactness: per-customer spend is exact cents; the identity
    T = (Σx·ln x)/Σx − ln(μ) needs ONE data-dependent double per
    customer — x·ln(x) — which is micro-quantized (round ×1e6 →
    DECIMAL(38,0)) before the sum so the total is order-invariant
    across partitionings; everything after is a shared literal staged
    chain over three exact numbers (Σq, Σx, n), clamped at 0 (the
    uniform-spend ulp residue), rounded 6. NULL when there are no
    customers or no revenue; theil_norm NULL when n < 2 (ln n = 0).

    Scale shape: one customer-grain aggregate, one one-row reduce —
    no joins, no windows.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "x"
        )
    )
    s = c.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast(d38)).alias("s1"),
        F.sum(
            F.when(
                F.col("x") > 0,
                F.round(
                    F.col("x").cast("double") * F.expr("ln(x)") * 1e6, 0
                ).cast(d38),
            ).otherwise(F.lit(0).cast(d38))
        ).alias("sq"),
    )
    theil = (
        "greatest(0.0, CAST(sq AS DOUBLE) / 1e6 / CAST(s1 AS DOUBLE)"
        " - ln(CAST(s1 AS DOUBLE) / n))"
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.expr(
            "CASE WHEN n > 0 THEN CAST(s1 AS DOUBLE) / n END"
        ).alias("mean_cents"),
        F.expr(
            f"CASE WHEN n > 0 AND s1 > 0 THEN round({theil}, 6) END"
        ).alias("theil"),
        F.expr(
            f"CASE WHEN n > 1 AND s1 > 0"
            f" THEN round({theil} / ln(CAST(n AS DOUBLE)), 6) END"
        ).alias("theil_norm"),
    )


def theil_spend_sql(table: str = "orders") -> str:
    """DuckDB oracle for :func:`theil_spend` (same micro-quantized
    x·ln x terms, same shared staged chain)."""
    theil = (
        "greatest(0.0, CAST(sq AS DOUBLE) / 1e6 / CAST(s1 AS DOUBLE)"
        " - ln(CAST(s1 AS DOUBLE) / n))"
    )
    return f"""
    WITH th_c AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS x
      FROM {table} GROUP BY o_custkey
    ), th_s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS s1,
             sum(CASE WHEN x > 0 THEN
                   CAST(round(CAST(x AS DOUBLE) * ln(x) * 1e6, 0) AS HUGEINT)
                 ELSE 0 END) AS sq
      FROM th_c
    )
    SELECT n AS n_customers,
           CASE WHEN n > 0 THEN CAST(s1 AS DOUBLE) / n END AS mean_cents,
           CASE WHEN n > 0 AND s1 > 0 THEN round({theil}, 6) END AS theil,
           CASE WHEN n > 1 AND s1 > 0
                THEN round({theil} / ln(CAST(n AS DOUBLE)), 6) END
             AS theil_norm
    FROM th_s
    """


# --------------------------------------------------------------- wave 122
def lorenz_deciles(orders: DataFrame) -> DataFrame:
    """→ 10 rows [decile, n_customers, spend, spend_share, cum_share] —
    the Lorenz curve of per-customer total spend at decile grain
    (Lorenz 1905): customers sorted poorest→richest, decile k's share
    of total revenue and the running cumulative share (the curve whose
    gap from the diagonal IS the Gini). The "bottom half of customers
    carries 9% of revenue" table every monetization review opens with.

    The scale trick: NO global sort of customers and NO ntile window —
    decile membership is a pure integer function of RANK,
    decile(r) = ((r−1)·10) DIV N + 1, so each spend-histogram cell
    [lo, hi] splits across the 10-row decile lattice by exact integer
    overlap (the trimmed-mean rank-space machinery), and every decile
    mass is a DECIMAL(38,0)/HUGEINT Σ overlap·cents. Cross-engine the
    boundaries floor identically (Spark DIV / DuckDB //). Shares are
    staged divisions of exact integers rounded 6; cum_share divides the
    exact cumulative DECIMAL (a 10-row window), so it is monotone and
    ends at exactly 1. Deciles with no customers (n < 10) emit zero
    rows of mass, not gaps; zero total revenue reports NULL shares.

    Scale shape: one customer-grain aggregate, one histogram-grain
    cumulative window, a 10-row lattice join, a 10-row window.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "x"
        )
    )
    h = cust.groupBy("x").agg(F.count("*").alias("c"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    cells = h.select(
        "x",
        "c",
        F.sum("c").over(w).alias("hi"),
        F.sum("c").over(wa).alias("nn"),
        F.sum(F.col("c").cast(d38) * F.col("x")).over(wa).alias("ss"),
    ).withColumn("lo", F.col("hi") - F.col("c") + 1)
    dec = orders.sparkSession.createDataFrame(
        [(k,) for k in range(1, 11)], "decile int"
    )
    j = cells.crossJoin(F.broadcast(dec)).select(
        "decile",
        "x",
        "nn",
        "ss",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("hi"), F.expr("(decile * nn + 9) DIV 10")
            )
            - F.greatest(
                F.col("lo"), F.expr("((decile - 1) * nn + 9) DIV 10 + 1")
            )
            + 1,
        ).alias("ov"),
    )
    per = j.groupBy("decile").agg(
        F.max("nn").cast("long").alias("nn"),
        F.max("ss").alias("ss"),
        F.sum("ov").cast("long").alias("n_customers"),
        F.sum(F.col("ov").cast(d38) * F.col("x")).alias("spend_c"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    out = per.withColumn("cum_c", F.sum("spend_c").over(wd))
    return out.select(
        "decile",
        "n_customers",
        F.round(F.col("spend_c").cast("double") / 100.0, 6).alias("spend"),
        F.expr(
            "CASE WHEN ss > 0 THEN"
            " round(CAST(spend_c AS DOUBLE) / CAST(ss AS DOUBLE), 6) END"
        ).alias("spend_share"),
        F.expr(
            "CASE WHEN ss > 0 THEN"
            " round(CAST(cum_c AS DOUBLE) / CAST(ss AS DOUBLE), 6) END"
        ).alias("cum_share"),
    ).orderBy("decile")


def lorenz_deciles_sql(table: str = "orders") -> str:
    """DuckDB oracle for :func:`lorenz_deciles` (same rank-space decile
    overlap, HUGEINT mass sums)."""
    return f"""
    WITH lz_c AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS x
      FROM {table} GROUP BY o_custkey
    ), lz_h AS (
      SELECT x, count(*) AS c FROM lz_c GROUP BY x
    ), lz_cells AS (
      SELECT x, c,
             sum(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
             sum(c) OVER () AS nn,
             sum(CAST(c AS HUGEINT) * x) OVER () AS ss
      FROM lz_h
    ), lz_d AS (
      SELECT CAST(unnest(generate_series(1, 10)) AS INTEGER) AS decile
    ), lz_j AS (
      SELECT d.decile, c.x, c.nn, c.ss,
             greatest(0, least(c.hi, (d.decile * c.nn + 9) // 10)
               - greatest(c.hi - c.c + 1,
                          ((d.decile - 1) * c.nn + 9) // 10 + 1) + 1) AS ov
      FROM lz_cells c CROSS JOIN lz_d d
    ), lz_p AS (
      SELECT decile, CAST(max(nn) AS BIGINT) AS nn, max(ss) AS ss,
             CAST(sum(ov) AS BIGINT) AS n_customers,
             sum(CAST(ov AS HUGEINT) * x) AS spend_c
      FROM lz_j GROUP BY decile
    ), lz_o AS (
      SELECT *, sum(spend_c) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
      FROM lz_p
    )
    SELECT decile, n_customers,
           round(CAST(spend_c AS DOUBLE) / 100.0, 6) AS spend,
           CASE WHEN ss > 0 THEN
             round(CAST(spend_c AS DOUBLE) / CAST(ss AS DOUBLE), 6) END
             AS spend_share,
           CASE WHEN ss > 0 THEN
             round(CAST(cum_c AS DOUBLE) / CAST(ss AS DOUBLE), 6) END
             AS cum_share
    FROM lz_o ORDER BY decile
    """


def gini_spend(orders: DataFrame) -> DataFrame:
    """→ one row [n_customers, total_revenue, gini] — the Gini
    coefficient of per-customer total spend via the exact rank-sum
    identity G = (2·Σrᵢxᵢ − (N+1)·S) / (N·S) (x ascending, ties
    order-free): the single-number revenue-concentration read next to
    :func:`lorenz_deciles`' curve and :func:`theil_spend`'s
    decomposable cousin.

    Exactness — fully integer until one division: a tied histogram
    cell's rank·value mass is x·(lo+hi)·(hi−lo+1) DIV 2 (the
    consecutive-rank sum — one factor is always even, so DIV is exact
    and identical Spark/DuckDB); Σrx, S and N are DECIMAL(38,0)/
    HUGEINT; the numerator 2·Σrx − (N+1)·S stays exact; G is ONE
    staged division rounded 6, NULL on an empty frame or zero revenue.

    Scale shape: one customer-grain aggregate, one histogram-grain
    cumulative window, a one-row reduce.

    Reference parity: the graph-side cousin is kernels/stats.py
    `degree_gini`; this is the warehouse-side measure over orders.
    """
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "x"
        )
    )
    h = cust.groupBy("x").agg(F.count("*").alias("c"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cells = h.select(
        "x",
        "c",
        F.sum("c").over(w).alias("hi"),
    ).withColumn("lo", F.col("hi") - F.col("c") + 1)
    s = cells.groupBy().agg(
        F.coalesce(F.max("hi"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.col("c").cast(d38) * F.col("x")), F.lit(0).cast(d38)
        ).alias("ss"),
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(x AS decimal(38,0)) * (lo + hi) * c DIV 2"
                )
            ),
            F.lit(0).cast(d38),
        ).alias("srx"),
    )
    gini = (
        "(2.0 * CAST(srx AS DOUBLE) - (CAST(n AS DOUBLE) + 1)"
        " * CAST(ss AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE))"
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("ss").cast("double") / 100.0, 6).alias(
            "total_revenue"
        ),
        F.expr(
            f"CASE WHEN n > 0 AND ss > 0 THEN round({gini}, 6) END"
        ).alias("gini"),
    )


def gini_spend_sql(table: str = "orders") -> str:
    """DuckDB oracle for :func:`gini_spend` (same exact rank-sum
    identity, HUGEINT mass sums)."""
    gini = (
        "(2.0 * CAST(srx AS DOUBLE) - (CAST(n AS DOUBLE) + 1)"
        " * CAST(ss AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE))"
    )
    return f"""
    WITH gn_c AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS x
      FROM {table} GROUP BY o_custkey
    ), gn_h AS (
      SELECT x, count(*) AS c FROM gn_c GROUP BY x
    ), gn_cells AS (
      SELECT x, c,
             sum(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      FROM gn_h
    ), gn_s AS (
      SELECT CAST(coalesce(max(hi), 0) AS BIGINT) AS n,
             coalesce(sum(CAST(c AS HUGEINT) * x), 0) AS ss,
             coalesce(sum(CAST(x AS HUGEINT) * ((hi - c + 1) + hi) * c // 2),
                      0) AS srx
      FROM gn_cells
    )
    SELECT n AS n_customers,
           round(CAST(ss AS DOUBLE) / 100.0, 6) AS total_revenue,
           CASE WHEN n > 0 AND ss > 0 THEN round({gini}, 6) END AS gini
    FROM gn_s
    """


# --------------------------------------------------------------- wave 124
def abc_brands(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """→ [brand, revenue, revenue_share, cum_share, abc_class] — ABC /
    Pareto inventory classification of brands by discounted revenue
    (the classic 80/95 split: class A carries the first 80% of
    revenue, B the next 15%, C the tail): the stocking-policy and
    curation-priority table every supply review opens with.

    Classification is FULLY INTEGER: per-line discounted cents are
    exact (round once per line), brand revenue and the descending
    cumulative are DECIMAL(38,0)/HUGEINT, and the class predicate
    compares 5·cum_before < 4·total (A) / 20·cum_before < 19·total
    (B) — no double ever decides a class, so the boundary brand cannot
    flip engines. A brand is classed by the cumulative revenue BEFORE
    it in (revenue desc, brand asc) order — the deterministic total
    order; shares are staged divisions rounded 6 for display only.

    Scale shape: one lineitem-grain join+aggregate to BRAND grain
    (bounded: 25 values), then every window runs on that tiny frame —
    the Pareto curve at unbounded part grain would need a global
    ordered prefix and is deliberately NOT offered.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    rev = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                    0,
                ).cast("long").cast(d38)
            ).alias("rev_c")
        )
    )
    w = Window.orderBy(F.desc("rev_c"), F.asc("brand")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wa = Window.partitionBy()
    c = rev.select(
        "brand",
        "rev_c",
        F.coalesce(F.sum("rev_c").over(w), F.lit(0).cast(d38)).alias("cum_b"),
        F.sum("rev_c").over(wa).alias("tot"),
    )
    return c.select(
        "brand",
        F.round(F.col("rev_c").cast("double") / 100.0, 6).alias("revenue"),
        F.expr(
            "CASE WHEN tot > 0 THEN"
            " round(CAST(rev_c AS DOUBLE) / CAST(tot AS DOUBLE), 6) END"
        ).alias("revenue_share"),
        F.expr(
            "CASE WHEN tot > 0 THEN"
            " round((CAST(cum_b AS DOUBLE) + CAST(rev_c AS DOUBLE))"
            " / CAST(tot AS DOUBLE), 6) END"
        ).alias("cum_share"),
        F.expr(
            "CASE WHEN 5 * cum_b < 4 * tot THEN 'A'"
            " WHEN 20 * cum_b < 19 * tot THEN 'B' ELSE 'C' END"
        ).alias("abc_class"),
    ).orderBy(F.desc("rev_c"), F.asc("brand"))


def abc_brands_sql(
    lineitem: str = "lineitem", part: str = "part"
) -> str:
    """DuckDB oracle for :func:`abc_brands` (same integer class
    predicates, same descending total order)."""
    return f"""
    WITH abc_r AS (
      SELECT p_brand AS brand,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS HUGEINT)) AS rev_c
      FROM {lineitem} JOIN {part} ON l_partkey = p_partkey
      GROUP BY p_brand
    ), abc_c AS (
      SELECT brand, rev_c,
             coalesce(sum(rev_c) OVER (ORDER BY rev_c DESC, brand ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_b,
             sum(rev_c) OVER () AS tot
      FROM abc_r
    )
    SELECT brand,
           round(CAST(rev_c AS DOUBLE) / 100.0, 6) AS revenue,
           CASE WHEN tot > 0 THEN
             round(CAST(rev_c AS DOUBLE) / CAST(tot AS DOUBLE), 6) END
             AS revenue_share,
           CASE WHEN tot > 0 THEN
             round((CAST(cum_b AS DOUBLE) + CAST(rev_c AS DOUBLE))
                   / CAST(tot AS DOUBLE), 6) END AS cum_share,
           CASE WHEN 5 * cum_b < 4 * tot THEN 'A'
                WHEN 20 * cum_b < 19 * tot THEN 'B' ELSE 'C' END
             AS abc_class
    FROM abc_c
    ORDER BY rev_c DESC, brand ASC
    """


def ship_delay_profile(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """→ [priority, n_lines, p50_days, p90_days, max_days, avg_days] —
    the order-to-ship latency distribution per order priority: the SLA
    audit that says whether '1-URGENT' actually ships faster than
    '5-LOW', read as exact percentiles instead of the mean a few
    stragglers own.

    Exactness: the gap is an exact integer day difference (both sides
    cast to DATE first so the difference is calendar days, not a
    truncated interval); p50/p90 are the exact interpolated
    percentiles over those integers (the house estimator — engine-
    identical); avg is one staged division of the exact day sum,
    rounded 6. min/max/n are exact integers.

    Scale shape: one pk-fk join at lineitem grain, then one grouped
    aggregate to the bounded priority dimension (5 values) — the
    percentile sort happens inside the aggregate per group.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    j = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).cast("long").alias("gap"),
    )
    return (
        j.groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.round(F.expr("percentile(gap, 0.5D)"), 6).alias("p50_days"),
            F.round(F.expr("percentile(gap, 0.9D)"), 6).alias("p90_days"),
            F.max("gap").alias("max_days"),
            F.round(
                F.sum(F.col("gap").cast(d38)).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_days"),
        )
        .orderBy("priority")
    )


def ship_delay_profile_sql(
    lineitem: str = "lineitem", orders: str = "orders"
) -> str:
    """DuckDB oracle for :func:`ship_delay_profile` (same exact day
    gaps, same interpolated percentiles)."""
    return f"""
    WITH sdp_g AS (
      SELECT o_orderpriority AS priority,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) AS BIGINT) AS gap
      FROM {lineitem} JOIN {orders} ON l_orderkey = o_orderkey
    )
    SELECT priority, CAST(count(*) AS BIGINT) AS n_lines,
           round(quantile_cont(gap, 0.5), 6) AS p50_days,
           round(quantile_cont(gap, 0.9), 6) AS p90_days,
           max(gap) AS max_days,
           round(CAST(sum(CAST(gap AS HUGEINT)) AS DOUBLE) / count(*), 6)
             AS avg_days
    FROM sdp_g
    GROUP BY priority ORDER BY priority
    """


# --------------------------------------------------------------- wave 131
def poissonness_basket(lineitem: DataFrame) -> DataFrame:
    """→ one row [n_orders, n_points, slope, lambda_hat, r2] — the
    Poissonness plot (Hoaglin 1980) for order basket sizes: under a
    Poisson(λ) basket model the metameter φ(k) = ln(k!·n_k/N) is
    LINEAR in k with slope ln λ, so the fit's r² is a one-number
    goodness-of-Poisson read and exp(slope) recovers λ̂. The
    assortment/capacity modeler's "can I treat baskets as Poisson"
    gate, next to :func:`events`' dispersion test for arrivals.

    Exactness: k counts and the basket histogram are exact BIGINTs;
    φ(k) = ln k! + ln n_k − ln N sums three logs of EXACT integers
    (factorial stays integral — k is bounded by the widest order, and
    the three-term form avoids the k!·n_k overflow), micro-nat-
    quantized per point so the OLS moments are exact integer sums; the
    slope/intercept/r² closed forms stage once from those integers
    (quantization scale cancels in slope and r²), rounded 6. NULL fit
    when fewer than 2 distinct basket sizes; r² NULL when φ is flat.

    Scale shape: one lineitem-grain aggregate to order grain, one
    histogram aggregate (≤ max-basket rows), a one-row reduce.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("k")
    )
    h = baskets.groupBy("k").agg(F.count("*").alias("nk"))
    tot = h.groupBy().agg(F.sum("nk").cast("long").alias("nn"))
    phi = (
        "ln(CAST(factorial(CAST(k AS INT)) AS DOUBLE))"
        " + ln(CAST(nk AS DOUBLE)) - ln(CAST(nn AS DOUBLE))"
    )
    pts = h.crossJoin(F.broadcast(tot)).select(
        F.col("k").cast("long").alias("x"),
        F.expr(f"CAST(round(1e6 * ({phi}), 0) AS BIGINT)").alias("qy"),
    )
    s = pts.groupBy().agg(
        F.count("*").cast("long").alias("m"),
        F.max("x").alias("_"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("qy").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("qy")).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("qy").cast(d38) * F.col("qy")).alias("syy"),
    ).drop("_")
    num = (
        "(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    dxx = (
        "(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    dyy = (
        "(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    slope = f"({num} / {dxx} / 1e6)"
    return tot.crossJoin(s).select(
        F.col("nn").alias("n_orders"),
        F.col("m").alias("n_points"),
        F.expr(
            f"CASE WHEN m >= 2 AND {dxx} > 0 THEN round({slope}, 6) END"
        ).alias("slope"),
        F.expr(
            f"CASE WHEN m >= 2 AND {dxx} > 0"
            f" THEN round(exp({slope}), 6) END"
        ).alias("lambda_hat"),
        F.expr(
            f"CASE WHEN m >= 2 AND {dxx} > 0 AND {dyy} > 0 THEN"
            f" round({num} * {num} / ({dxx} * {dyy}), 6) END"
        ).alias("r2"),
    )


def poissonness_basket_sql(table: str = "lineitem") -> str:
    """DuckDB oracle for :func:`poissonness_basket` (same three-log
    metameter, micro-nat quantization, staged closed forms)."""
    phi = (
        "ln(CAST(factorial(CAST(k AS INT)) AS DOUBLE))"
        " + ln(CAST(nk AS DOUBLE)) - ln(CAST(nn AS DOUBLE))"
    )
    num = (
        "(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    dxx = (
        "(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    dyy = (
        "(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    slope = f"({num} / {dxx} / 1e6)"
    return f"""
    WITH pb_b AS (
      SELECT l_orderkey, count(*) AS k FROM {table} GROUP BY l_orderkey
    ), pb_h AS (
      SELECT k, count(*) AS nk FROM pb_b GROUP BY k
    ), pb_n AS (
      SELECT CAST(sum(nk) AS BIGINT) AS nn FROM pb_h
    ), pb_p AS (
      SELECT CAST(k AS BIGINT) AS x,
             CAST(round(1e6 * ({phi}), 0) AS BIGINT) AS qy
      FROM pb_h CROSS JOIN pb_n
    ), pb_s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(qy AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * qy) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(qy AS HUGEINT) * qy) AS syy
      FROM pb_p
    )
    SELECT nn AS n_orders, m AS n_points,
           CASE WHEN m >= 2 AND {dxx} > 0 THEN round({slope}, 6) END
             AS slope,
           CASE WHEN m >= 2 AND {dxx} > 0 THEN round(exp({slope}), 6) END
             AS lambda_hat,
           CASE WHEN m >= 2 AND {dxx} > 0 AND {dyy} > 0 THEN
             round({num} * {num} / ({dxx} * {dyy}), 6) END AS r2
    FROM pb_n CROSS JOIN pb_s
    """


def duplicate_payments_audit(orders: DataFrame) -> DataFrame:
    """→ one row [n_groups, n_orders_involved, excess_orders,
    exposure] — the accounts-payable double-payment audit: order
    groups sharing (customer, exact cent total, calendar day) with
    more than one order key. ``exposure`` sums the EXCESS copies'
    amounts — the money at risk if every extra key is a re-submitted
    payment; the fraud/ops queue is sized by ``excess_orders``.

    Exactness: the grouping key uses exact cents and the DATE-cast
    day, group counts are exact BIGINTs, exposure = Σ(c−1)·cents is an
    exact DECIMAL(38,0)/HUGEINT reported in dollars (÷100, exact
    halves). Zero duplicate groups yields an honest all-zeros row (an
    audit must affirmatively say "clean", not return nothing).

    Scale shape: one orders-grain aggregate on the composite key, one
    filtered one-row reduce — no joins, no windows.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    g = orders.groupBy(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    ).agg(F.count("*").alias("c"))
    dup = g.where(F.col("c") > 1)
    return dup.groupBy().agg(
        F.coalesce(F.count("*"), F.lit(0)).cast("long").alias("n_groups"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias(
            "n_orders_involved"
        ),
        F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long").alias(
            "excess_orders"
        ),
        F.round(
            F.coalesce(
                F.sum((F.col("c") - 1).cast(d38) * F.col("cents")),
                F.lit(0).cast(d38),
            ).cast("double")
            / 100.0,
            6,
        ).alias("exposure"),
    )


def duplicate_payments_audit_sql(table: str = "orders") -> str:
    """DuckDB oracle for :func:`duplicate_payments_audit` (same exact
    composite key and excess arithmetic)."""
    return f"""
    WITH dpa_g AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d, count(*) AS c
      FROM {table} GROUP BY 1, 2, 3
    ), dpa_d AS (
      SELECT * FROM dpa_g WHERE c > 1
    )
    SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS n_groups,
           CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orders_involved,
           CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS excess_orders,
           round(CAST(coalesce(sum(CAST(c - 1 AS HUGEINT) * cents), 0)
                 AS DOUBLE) / 100.0, 6) AS exposure
    FROM dpa_d
    """


def price_consistency_audit(lineitem: DataFrame) -> DataFrame:
    """→ one row [n_parts, n_inconsistent, share, max_spread] — the
    catalog price-consistency audit: parts whose UNIT price
    (extendedprice / quantity) differs across lines. A consistent
    catalog prices a part identically everywhere; drift means manual
    overrides, currency bugs, or stale caches — ``max_spread`` (the
    widest per-part max−min unit price, in dollars) sizes the worst
    offender for the triage queue.

    Exactness: the unit price quantizes ONCE per line to exact cents
    (round(100·ep/qty) — one staged division then integer), so
    per-part distinct counts and min/max are exact; the share is one
    staged division rounded 6 and max_spread is an exact cent
    difference reported in dollars. Zero-quantity lines are excluded
    (unit price undefined) — documented. An all-consistent catalog
    reports an affirmative zeros row.

    Scale shape: one lineitem-grain map, one part-grain aggregate,
    a one-row reduce — no joins, no windows.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    up = lineitem.where(F.col("l_quantity") > 0).select(
        "l_partkey",
        F.expr(
            "CAST(round(100.0 * l_extendedprice / l_quantity, 0) AS BIGINT)"
        ).alias("ucents"),
    )
    per = up.groupBy("l_partkey").agg(
        F.countDistinct("ucents").alias("k"),
        (F.max("ucents") - F.min("ucents")).alias("spread"),
    )
    return per.groupBy().agg(
        F.coalesce(F.count("*"), F.lit(0)).cast("long").alias("n_parts"),
        F.coalesce(
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_inconsistent"),
        F.expr(
            "CASE WHEN count(*) > 0 THEN"
            " round(CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS DOUBLE)"
            " / count(*), 6) END"
        ).alias("share"),
        F.round(
            F.coalesce(F.max("spread"), F.lit(0)).cast("double") / 100.0, 6
        ).alias("max_spread"),
    )


def price_consistency_audit_sql(table: str = "lineitem") -> str:
    """DuckDB oracle for :func:`price_consistency_audit` (same once-
    quantized unit cents)."""
    return f"""
    WITH pca_u AS (
      SELECT l_partkey,
             CAST(round(100.0 * l_extendedprice / l_quantity, 0) AS BIGINT)
               AS ucents
      FROM {table} WHERE l_quantity > 0
    ), pca_p AS (
      SELECT l_partkey, count(DISTINCT ucents) AS k,
             max(ucents) - min(ucents) AS spread
      FROM pca_u GROUP BY l_partkey
    )
    SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS n_parts,
           CAST(coalesce(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_inconsistent,
           CASE WHEN count(*) > 0 THEN
             round(CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 6) END AS share,
           round(CAST(coalesce(max(spread), 0) AS DOUBLE) / 100.0, 6)
             AS max_spread
    FROM pca_p
    """


# --------------------------------------------------------------- wave 133
def ship_delay_anova(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """→ one row [k_suppliers, n_lines, f_stat, eta_squared] — one-way
    ANOVA of the order-to-ship day gap ACROSS SUPPLIERS: does who
    ships explain the latency variance, summarized by the F ratio and
    η² (the variance share suppliers explain). The supplier-scorecard
    gate: η² near 0 says latency is systemic, near 1 says it's a
    vendor problem — read before chasing individual suppliers through
    :func:`ship_delay_profile`-style drilldowns.

    Exactness: day gaps are exact integers; per-supplier (n, Σg, Σg²)
    are exact DECIMAL(38,0)/HUGEINT; the only non-integer per-group
    quantity — a_i²/n_i — is MICRO-QUANTIZED per supplier before the
    global sum (order-invariant across partitionings), and SSB/SSW/F/
    η² stage from (G, A, B, N, k) as shared literal chains, rounded 6.
    NULL when k < 2, N ≤ k, or the within-group spread is 0. No
    F-significance flag: at warehouse df the F critical is ~1.0 and
    the honest readout is the effect size, not a star.

    Scale shape: one pk-fk join at lineitem grain, one supplier-grain
    aggregate, a one-row reduce — group count never materializes rows.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    g = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select(
        "l_suppkey",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).cast("long").alias("gap"),
    )
    per = g.groupBy("l_suppkey").agg(
        F.count("*").cast("long").alias("ni"),
        F.sum(F.col("gap").cast(d38)).alias("ai"),
        F.sum(F.col("gap").cast(d38) * F.col("gap")).alias("bi"),
    )
    s = per.groupBy().agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("ai").alias("a"),
        F.sum("bi").alias("b"),
        F.sum(
            F.expr(
                "CAST(round(1e6 * CAST(ai AS DOUBLE) * CAST(ai AS DOUBLE)"
                " / ni, 0) AS decimal(38,0))"
            )
        ).alias("gq"),
    )
    ssb = (
        "(CAST(gq AS DOUBLE) / 1e6"
        " - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / n)"
    )
    ssw = "(CAST(b AS DOUBLE) - CAST(gq AS DOUBLE) / 1e6)"
    sst = (
        "(CAST(b AS DOUBLE)"
        " - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / n)"
    )
    ok = f"k >= 2 AND n > k AND {ssw} > 0"
    fstat = f"(({ssb}) / (k - 1.0)) / (({ssw}) / (CAST(n AS DOUBLE) - k))"
    return s.select(
        F.col("k").alias("k_suppliers"),
        F.col("n").alias("n_lines"),
        F.expr(f"CASE WHEN {ok} THEN round({fstat}, 6) END").alias(
            "f_stat"
        ),
        F.expr(
            f"CASE WHEN {ok} AND {sst} > 0 THEN"
            f" round(greatest(0.0, ({ssb}) / ({sst})), 6) END"
        ).alias("eta_squared"),
    )


def ship_delay_anova_sql(
    lineitem: str = "lineitem", orders: str = "orders"
) -> str:
    """DuckDB oracle for :func:`ship_delay_anova` (same micro-quantized
    between-group mass, shared staged chains)."""
    ssb = (
        "(CAST(gq AS DOUBLE) / 1e6"
        " - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / n)"
    )
    ssw = "(CAST(b AS DOUBLE) - CAST(gq AS DOUBLE) / 1e6)"
    sst = (
        "(CAST(b AS DOUBLE)"
        " - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / n)"
    )
    ok = f"k >= 2 AND n > k AND {ssw} > 0"
    fstat = f"(({ssb}) / (k - 1.0)) / (({ssw}) / (CAST(n AS DOUBLE) - k))"
    return f"""
    WITH sda_g AS (
      SELECT l_suppkey,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) AS BIGINT) AS gap
      FROM {lineitem} JOIN {orders} ON l_orderkey = o_orderkey
    ), sda_p AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS ni,
             sum(CAST(gap AS HUGEINT)) AS ai,
             sum(CAST(gap AS HUGEINT) * gap) AS bi
      FROM sda_g GROUP BY l_suppkey
    ), sda_s AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS BIGINT) AS n,
             sum(ai) AS a, sum(bi) AS b,
             sum(CAST(round(1e6 * CAST(ai AS DOUBLE) * CAST(ai AS DOUBLE)
                 / ni, 0) AS HUGEINT)) AS gq
      FROM sda_p
    )
    SELECT k AS k_suppliers, n AS n_lines,
           CASE WHEN {ok} THEN round({fstat}, 6) END AS f_stat,
           CASE WHEN {ok} AND {sst} > 0 THEN
             round(greatest(0.0, ({ssb}) / ({sst})), 6) END AS eta_squared
    FROM sda_s
    """


def order_aging_profile(orders: DataFrame) -> DataFrame:
    """→ [priority, n_open, p50_age, p90_age, max_age] — the open-order
    aging table: for orders still open (status 'O') at the ledger's
    snapshot instant (the max order date — a closed dataset's "today"),
    how old is the backlog per priority. The ops-review table that
    catches an urgent queue quietly aging out of its SLA.

    Exactness: ages are exact integer day differences from the exact
    global max date (broadcast one row); percentiles are the house
    interpolated estimator over those integers; n/max are exact. A
    ledger with no open orders returns zero rows (there is no backlog
    to age).

    Scale shape: one global max (one row, broadcast), one filtered
    aggregate to the bounded priority dimension.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    asof = orders.groupBy().agg(
        F.max(F.to_date("o_orderdate")).alias("as_of")
    )
    aged = (
        orders.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(asof))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("as_of"), F.to_date("o_orderdate"))
            .cast("long")
            .alias("age"),
        )
    )
    return (
        aged.groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_open"),
            F.round(F.expr("percentile(age, 0.5D)"), 6).alias("p50_age"),
            F.round(F.expr("percentile(age, 0.9D)"), 6).alias("p90_age"),
            F.max("age").alias("max_age"),
        )
        .orderBy("priority")
    )


def order_aging_profile_sql(table: str = "orders") -> str:
    """DuckDB oracle for :func:`order_aging_profile` (same exact ages
    and interpolated percentiles)."""
    return f"""
    WITH oap_a AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS as_of FROM {table}
    ), oap_g AS (
      SELECT o_orderpriority AS priority,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), as_of)
                  AS BIGINT) AS age
      FROM {table} CROSS JOIN oap_a
      WHERE o_orderstatus = 'O'
    )
    SELECT priority, CAST(count(*) AS BIGINT) AS n_open,
           round(quantile_cont(age, 0.5), 6) AS p50_age,
           round(quantile_cont(age, 0.9), 6) AS p90_age,
           max(age) AS max_age
    FROM oap_g GROUP BY priority ORDER BY priority
    """


# --------------------------------------------------------------- wave 137
def hill_tail_spend(orders: DataFrame, k: int = 50) -> DataFrame:
    """→ one row [k_used, xmin, alpha] — the Hill estimator (Hill 1975)
    of the Pareto tail index of per-customer spend over the top-``k``
    order statistics: α̂ = k / Σᵢ ln(xᵢ/x₍ₖ₊₁₎). The heavy-tail
    EXPONENT to quote next to :func:`gini_spend`'s concentration and
    kernels/stats.py `degree_powerlaw`'s histogram fit — α ≤ 2 means
    the spend variance is effectively infinite and every mean-based
    whale forecast is fiction.

    Determinism: the top-(k+1) spenders come from ONE TakeOrdered pass
    with exact-cent values and custkey tie-break (never a global
    window); each ln(xᵢ/x_min) term is micro-nat-quantized before the
    sum so α̂ is order-invariant; the estimate stages once, rounded 6.
    NULL when fewer than k+1 positive-spend customers or when all top
    values tie x_min (zero log-sum — the tail is degenerate, not
    Pareto).

    Scale shape: one customer-grain aggregate, a TakeOrdered(k+1), a
    broadcast of the (k+1)-th value, a k-row reduce.

    Reference parity: no stats surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    kk = int(k)
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "x"
        )
    ).where(F.col("x") > 0)
    top = cust.orderBy(F.desc("x"), F.asc("o_custkey")).limit(kk + 1)
    xmin = top.orderBy(F.asc("x"), F.desc("o_custkey")).limit(1).select(
        F.col("x").alias("xmin")
    )
    s = (
        top.crossJoin(F.broadcast(xmin))
        .where(F.col("x") > F.col("xmin"))
        .groupBy("xmin")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.sum(
                F.expr(
                    "CAST(round(1e6 * ln(CAST(x AS DOUBLE)"
                    " / CAST(xmin AS DOUBLE)), 0) AS BIGINT)"
                )
            ).alias("ql"),
        )
    )
    nct = cust.groupBy().agg(F.count("*").cast("long").alias("nc"))
    out = nct.join(s, how="left_outer", on=F.lit(True))
    return out.select(
        F.coalesce(F.col("k_used"), F.lit(0)).alias("k_used"),
        F.expr(
            "CASE WHEN xmin IS NOT NULL THEN"
            " round(CAST(xmin AS DOUBLE) / 100.0, 6) END"
        ).alias("xmin"),
        F.expr(
            f"CASE WHEN nc >= {kk + 1} AND ql > 0 THEN"
            f" round(CAST(k_used AS DOUBLE) / (ql / 1e6), 6) END"
        ).alias("alpha"),
    )


def hill_tail_spend_sql(table: str = "orders", k: int = 50) -> str:
    """DuckDB oracle for :func:`hill_tail_spend` (same TakeOrdered
    frame, micro-nat quantized log terms)."""
    kk = int(k)
    return f"""
    WITH ht_c AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS x
      FROM {table} GROUP BY o_custkey HAVING sum(
        CAST(round(o_totalprice * 100, 0) AS BIGINT)) > 0
    ), ht_top AS (
      SELECT o_custkey, x FROM ht_c
      ORDER BY x DESC, o_custkey ASC LIMIT {kk + 1}
    ), ht_min AS (
      SELECT x AS xmin FROM ht_top
      ORDER BY x ASC, o_custkey DESC LIMIT 1
    ), ht_s AS (
      SELECT xmin, CAST(count(*) AS BIGINT) AS k_used,
             sum(CAST(round(1e6 * ln(CAST(x AS DOUBLE)
                 / CAST(xmin AS DOUBLE)), 0) AS BIGINT)) AS ql
      FROM ht_top CROSS JOIN ht_min
      WHERE x > xmin GROUP BY xmin
    ), ht_n AS (
      SELECT CAST(count(*) AS BIGINT) AS nc FROM ht_c
    )
    SELECT coalesce(k_used, 0) AS k_used,
           CASE WHEN xmin IS NOT NULL THEN
             round(CAST(xmin AS DOUBLE) / 100.0, 6) END AS xmin,
           CASE WHEN nc >= {kk + 1} AND ql > 0 THEN
             round(CAST(k_used AS DOUBLE) / (ql / 1e6), 6) END AS alpha
    FROM ht_n LEFT JOIN ht_s ON TRUE
    """


# --------------------------------------------------------------- wave 139
def return_delay_trend(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """→ one row [n_lines, n_returned, z, significant] — the
    Cochran–Armitage trend test asking whether RETURN probability
    rises with shipping delay, doses = ordered delay buckets
    (0-2 / 3-5 / 6-10 / 11+ days, scores 0..3), outcome =
    l_returnflag = 'R'. The logistics causal smoking gun: a
    significant positive z says slow fulfilment is costing
    merchandise, not just goodwill.

    Exactness: day gaps and bucket scores are exact integers; the CA
    closed form squares only SUMS (the wave-121 convention), so
    everything before the final z stays DECIMAL(38,0)/HUGEINT; z is
    one shared staged chain, rounded 6, NULL when returns are
    all-or-nothing or all lines share one bucket; ``significant``
    compares the ROUNDED |z| to 1.959964.

    Scale shape: one pk-fk join at lineitem grain, one 4-row bucket
    aggregate, a one-row reduce.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    g = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select(
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).cast("long").alias("gap"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    tier = (
        "CASE WHEN gap <= 2 THEN 0 WHEN gap <= 5 THEN 1"
        " WHEN gap <= 10 THEN 2 ELSE 3 END"
    )
    t = g.groupBy(F.expr(tier).alias("s")).agg(
        F.count("*").alias("nk"), F.sum("y").alias("rk")
    )
    m = t.groupBy().agg(
        F.sum("nk").cast("long").alias("nn"),
        F.sum("rk").cast("long").alias("rr"),
        F.sum(F.col("s").cast(d38) * F.col("nk")).alias("ssn"),
        F.sum(F.col("s").cast(d38) * F.col("rk")).alias("ssr"),
        F.sum(F.col("s").cast(d38) * F.col("s") * F.col("nk")).alias("sns2"),
    ).withColumn(
        "tn",
        F.col("nn").cast(d38) * F.col("ssr")
        - F.col("rr").cast(d38) * F.col("ssn"),
    ).withColumn(
        "mm",
        F.col("nn").cast(d38) * F.col("sns2") - F.col("ssn") * F.col("ssn"),
    )
    ok = "rr > 0 AND rr < nn AND mm > 0"
    z = (
        "CAST(tn AS DOUBLE) * sqrt(CAST(nn AS DOUBLE))"
        " / sqrt(CAST(rr AS DOUBLE) * (nn - rr) * CAST(mm AS DOUBLE))"
    )
    return m.select(
        F.col("nn").alias("n_lines"),
        F.col("rr").alias("n_returned"),
        F.expr(f"CASE WHEN {ok} THEN round({z}, 6) END").alias("z"),
        F.expr(
            f"CASE WHEN {ok} THEN abs(round({z}, 6)) > 1.959964 END"
        ).alias("significant"),
    )


def return_delay_trend_sql(
    lineitem: str = "lineitem", orders: str = "orders"
) -> str:
    """DuckDB oracle for :func:`return_delay_trend` (same buckets, same
    exact CA moments)."""
    tier = (
        "CASE WHEN gap <= 2 THEN 0 WHEN gap <= 5 THEN 1"
        " WHEN gap <= 10 THEN 2 ELSE 3 END"
    )
    ok = "rr > 0 AND rr < nn AND mm > 0"
    z = (
        "CAST(tn AS DOUBLE) * sqrt(CAST(nn AS DOUBLE))"
        " / sqrt(CAST(rr AS DOUBLE) * (nn - rr) * CAST(mm AS DOUBLE))"
    )
    return f"""
    WITH rdt_g AS (
      SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
                  CAST(l_shipdate AS DATE)) AS BIGINT) AS gap,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM {lineitem} JOIN {orders} ON l_orderkey = o_orderkey
    ), rdt_t AS (
      SELECT ({tier}) AS s, count(*) AS nk, sum(y) AS rk
      FROM rdt_g GROUP BY 1
    ), rdt_m AS (
      SELECT CAST(sum(nk) AS BIGINT) AS nn, CAST(sum(rk) AS BIGINT) AS rr,
             sum(CAST(s AS HUGEINT) * nk) AS ssn,
             sum(CAST(s AS HUGEINT) * rk) AS ssr,
             sum(CAST(s AS HUGEINT) * s * nk) AS sns2
      FROM rdt_t
    ), rdt_f AS (
      SELECT nn, rr,
             CAST(nn AS HUGEINT) * ssr - CAST(rr AS HUGEINT) * ssn AS tn,
             CAST(nn AS HUGEINT) * sns2 - ssn * ssn AS mm
      FROM rdt_m
    )
    SELECT nn AS n_lines, rr AS n_returned,
           CASE WHEN {ok} THEN round({z}, 6) END AS z,
           CASE WHEN {ok} THEN abs(round({z}, 6)) > 1.959964 END
             AS significant
    FROM rdt_f
    """


# --------------------------------------------------------------- wave 140
def gini_jackknife(orders: DataFrame) -> DataFrame:
    """→ one row [n_customers, gini, se, ci_lo, ci_hi] — the Gini of
    per-customer spend WITH a delete-one jackknife standard error
    (Efron 1982's estimator; the standard way to put an interval on a
    Gini) and the normal 95% CI. A Gini without an SE invites
    over-reading quarter-to-quarter wiggles; this is the honest
    version of :func:`gini_spend`.

    The scale trick — the jackknife runs at HISTOGRAM grain, not
    customer grain: deleting a member of a tied value cell changes
    Σrᵢxᵢ by −r·x − (mass above r), and the rank terms CANCEL within
    the cell (−r·x + (r−lo+1)·x = x·(1−lo)), so every member of a cell
    shares one leave-one-out Gini. Each cell's G₍ᵢ₎ stages from exact
    DECIMAL(38,0)/HUGEINT aggregates (srx, ss, n, the cell's prefix
    mass and lo), is NANO-quantized, and the weighted jackknife
    moments are exact integer sums — SE and CI stage once, rounded 6.
    NULL se/ci when n < 2 or total spend is 0; a uniform ledger
    reports se = 0 exactly.

    Scale shape: one customer-grain aggregate, one histogram-grain
    cumulative window, a histogram-grain map, two one-row reduces.

    Reference parity: extends :func:`gini_spend`; no stats surface in
    the reference (pagerank_lambda/dynamodb/pagerank.py:51-99).
    """
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "x"
        )
    )
    h = cust.groupBy("x").agg(F.count("*").alias("c"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cells = h.select(
        "x",
        "c",
        F.sum("c").over(w).alias("hi"),
        F.sum(F.col("c").cast(d38) * F.col("x")).over(w).alias("cumx"),
    ).withColumn("lo", F.col("hi") - F.col("c") + 1)
    base = cells.groupBy().agg(
        F.coalesce(F.max("hi"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.max("cumx"), F.lit(0).cast(d38)).alias("ss"),
        F.coalesce(
            F.sum(F.expr("CAST(x AS decimal(38,0)) * (lo + hi) * c DIV 2")),
            F.lit(0).cast(d38),
        ).alias("srx"),
    )
    gini = (
        "(2.0 * CAST(srx AS DOUBLE) - (CAST(n AS DOUBLE) + 1)"
        " * CAST(ss AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE))"
    )
    # leave-one-out per cell: srx' = srx - ss + prefix_before + x*(1 - lo)
    gdel = (
        "(2.0 * (CAST(srx AS DOUBLE) - CAST(ss AS DOUBLE)"
        "  + (CAST(cumx AS DOUBLE) - CAST(c AS DOUBLE) * x)"
        "  + CAST(x AS DOUBLE) * (1 - lo))"
        " - CAST(n AS DOUBLE) * (CAST(ss AS DOUBLE) - x))"
        " / ((CAST(n AS DOUBLE) - 1) * (CAST(ss AS DOUBLE) - x))"
    )
    per = (
        cells.crossJoin(F.broadcast(base))
        .where(F.expr("ss - x > 0 AND n >= 2"))
        .select(
            "c",
            F.expr(
                f"CAST(round(1e9 * ({gdel}), 0) AS decimal(38,0))"
            ).alias("q"),
        )
    )
    jk = per.groupBy().agg(
        F.coalesce(F.sum(F.col("c").cast(d38)), F.lit(0).cast(d38)).alias(
            "cn"
        ),
        F.coalesce(
            F.sum(F.col("c").cast(d38) * F.col("q")), F.lit(0).cast(d38)
        ).alias("sq"),
        F.coalesce(
            F.sum(F.col("c").cast(d38) * F.col("q") * F.col("q")),
            F.lit(0).cast(d38),
        ).alias("sqq"),
    )
    se = (
        "sqrt((CAST(n AS DOUBLE) - 1)"
        " * (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)"
        "    - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)))"
        " / (CAST(n AS DOUBLE) * 1e9)"
    )
    ok = "n >= 2 AND ss > 0 AND cn = n"
    return base.crossJoin(jk).select(
        F.col("n").alias("n_customers"),
        F.expr(
            f"CASE WHEN n > 0 AND ss > 0 THEN round({gini}, 6) END"
        ).alias("gini"),
        F.expr(f"CASE WHEN {ok} THEN round({se}, 6) END").alias("se"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" round(({gini}) - 1.959964 * ({se}), 6) END"
        ).alias("ci_lo"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" round(({gini}) + 1.959964 * ({se}), 6) END"
        ).alias("ci_hi"),
    )


def gini_jackknife_sql(table: str = "orders") -> str:
    """DuckDB oracle for :func:`gini_jackknife` (same cell-grain
    leave-one-out identity, nano-quantized G₍ᵢ₎)."""
    gini = (
        "(2.0 * CAST(srx AS DOUBLE) - (CAST(n AS DOUBLE) + 1)"
        " * CAST(ss AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE))"
    )
    gdel = (
        "(2.0 * (CAST(srx AS DOUBLE) - CAST(ss AS DOUBLE)"
        "  + (CAST(cumx AS DOUBLE) - CAST(c AS DOUBLE) * x)"
        "  + CAST(x AS DOUBLE) * (1 - lo))"
        " - CAST(n AS DOUBLE) * (CAST(ss AS DOUBLE) - x))"
        " / ((CAST(n AS DOUBLE) - 1) * (CAST(ss AS DOUBLE) - x))"
    )
    se = (
        "sqrt((CAST(n AS DOUBLE) - 1)"
        " * (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)"
        "    - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)))"
        " / (CAST(n AS DOUBLE) * 1e9)"
    )
    ok = "n >= 2 AND ss > 0 AND cn = n"
    return f"""
    WITH gj_c AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS x
      FROM {table} GROUP BY o_custkey
    ), gj_h AS (
      SELECT x, count(*) AS c FROM gj_c GROUP BY x
    ), gj_cells AS (
      SELECT x, c,
             sum(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
             sum(CAST(c AS HUGEINT) * x) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumx
      FROM gj_h
    ), gj_l AS (
      SELECT x, c, hi, cumx, hi - c + 1 AS lo FROM gj_cells
    ), gj_b AS (
      SELECT CAST(coalesce(max(hi), 0) AS BIGINT) AS n,
             coalesce(max(cumx), 0) AS ss,
             coalesce(sum(CAST(x AS HUGEINT) * (lo + hi) * c // 2), 0)
               AS srx
      FROM gj_l
    ), gj_per AS (
      SELECT c, CAST(round(1e9 * ({gdel}), 0) AS HUGEINT) AS q
      FROM gj_l CROSS JOIN gj_b
      WHERE ss - x > 0 AND n >= 2
    ), gj_jk AS (
      SELECT coalesce(sum(CAST(c AS HUGEINT)), 0) AS cn,
             coalesce(sum(CAST(c AS HUGEINT) * q), 0) AS sq,
             coalesce(sum(CAST(c AS HUGEINT) * q * q), 0) AS sqq
      FROM gj_per
    )
    SELECT n AS n_customers,
           CASE WHEN n > 0 AND ss > 0 THEN round({gini}, 6) END AS gini,
           CASE WHEN {ok} THEN round({se}, 6) END AS se,
           CASE WHEN {ok} THEN
             round(({gini}) - 1.959964 * ({se}), 6) END AS ci_lo,
           CASE WHEN {ok} THEN
             round(({gini}) + 1.959964 * ({se}), 6) END AS ci_hi
    FROM gj_b CROSS JOIN gj_jk
    """


# --------------------------------------------------------------- wave 141
def js_brand_price(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """→ [brand, n_lines, raw_mean, shrunk_mean] — James–Stein
    shrinkage of per-brand mean line price toward the grand mean
    (James & Stein 1961; the Efron–Morris 1975 batting-average
    recipe): each brand's mean moves toward the pooled mean by a
    factor 1 − (k−3)·σ̂²/Σ(mᵢ−m̄)², where σ̂² is the mean squared
    standard error of a brand mean. The dominance theorem's point —
    for k ≥ 4 the shrunk table beats the raw means in total squared
    error — applied where a merchandiser actually reads means from
    noisy small brands. Positive-part rule: the factor clamps at 0.

    Exactness: per-brand (n, Σcents, Σcents²) are exact; every
    per-brand double (its mean, its squared deviation contribution,
    its variance term) is MICRO-QUANTIZED before the cross-brand sums
    so the shrink factor is order-invariant; the factor and shrunk
    means stage once from those integers, rounded 6. With k < 4 the
    estimator does not dominate — raw means are returned and
    shrunk_mean = raw_mean (documented); zero between-brand spread
    shrinks fully to the grand mean.

    Scale shape: one pk-fk join + brand-grain aggregate (bounded 25
    rows), two one-row reduces, a broadcast back.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    per = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("ni"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                .cast(d38)
            ).alias("ai"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                .cast(d38)
                * F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("bi"),
        )
    )
    tot = per.groupBy().agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("ai").alias("a"),
    )
    mean_i = "(CAST(ai AS DOUBLE) / ni)"
    gmean = "(CAST(a AS DOUBLE) / n)"
    # per-brand sampling variance of the mean: s_i^2 / n_i with the
    # n-scaled identity; quantized to micro-cents^2
    vterm = (
        f"CASE WHEN ni >= 2 THEN"
        f" ((CAST(ni AS DOUBLE) * CAST(bi AS DOUBLE)"
        f"   - CAST(ai AS DOUBLE) * CAST(ai AS DOUBLE))"
        f"  / (CAST(ni AS DOUBLE) * (ni - 1.0))) / ni"
        f" ELSE 0.0 END"
    )
    dev = f"({mean_i} - {gmean})"
    j = per.crossJoin(F.broadcast(tot))
    moms = j.groupBy().agg(
        F.coalesce(
            F.sum(F.expr(f"CAST(round(1e6 * ({vterm}), 0) AS {d38})")),
            F.lit(0).cast(d38),
        ).alias("qv"),
        F.coalesce(
            F.sum(
                F.expr(f"CAST(round(1e6 * {dev} * {dev}, 0) AS {d38})")
            ),
            F.lit(0).cast(d38),
        ).alias("qd"),
    )
    factor = (
        "greatest(0.0, 1.0 - (CAST(k AS DOUBLE) - 3.0)"
        " * (CAST(qv AS DOUBLE) / k) / CAST(qd AS DOUBLE))"
    )
    out = j.crossJoin(F.broadcast(moms))
    return out.select(
        "brand",
        F.col("ni").alias("n_lines"),
        F.expr(f"round({mean_i} / 100.0, 6)").alias("raw_mean"),
        F.expr(
            f"CASE WHEN k >= 4 AND qd > 0 THEN"
            f" round(({gmean} + ({factor}) * {dev}) / 100.0, 6)"
            f" WHEN k >= 4 THEN round({gmean} / 100.0, 6)"
            f" ELSE round({mean_i} / 100.0, 6) END"
        ).alias("shrunk_mean"),
    ).orderBy("brand")


def js_brand_price_sql(
    lineitem: str = "lineitem", part: str = "part"
) -> str:
    """DuckDB oracle for :func:`js_brand_price` (same micro-quantized
    shrink moments, positive-part rule)."""
    mean_i = "(CAST(ai AS DOUBLE) / ni)"
    gmean = "(CAST(a AS DOUBLE) / n)"
    vterm = (
        f"CASE WHEN ni >= 2 THEN"
        f" ((CAST(ni AS DOUBLE) * CAST(bi AS DOUBLE)"
        f"   - CAST(ai AS DOUBLE) * CAST(ai AS DOUBLE))"
        f"  / (CAST(ni AS DOUBLE) * (ni - 1.0))) / ni"
        f" ELSE 0.0 END"
    )
    dev = f"({mean_i} - {gmean})"
    factor = (
        "greatest(0.0, 1.0 - (CAST(k AS DOUBLE) - 3.0)"
        " * (CAST(qv AS DOUBLE) / k) / CAST(qd AS DOUBLE))"
    )
    return f"""
    WITH js_p AS (
      SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS ni,
             sum(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 AS HUGEINT)) AS ai,
             sum(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 AS HUGEINT)
                 * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS bi
      FROM {lineitem} JOIN {part} ON l_partkey = p_partkey
      GROUP BY p_brand
    ), js_t AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS BIGINT) AS n,
             sum(ai) AS a
      FROM js_p
    ), js_m AS (
      SELECT coalesce(sum(CAST(round(1e6 * ({vterm}), 0) AS HUGEINT)), 0)
               AS qv,
             coalesce(sum(CAST(round(1e6 * {dev} * {dev}, 0) AS HUGEINT)),
               0) AS qd
      FROM js_p CROSS JOIN js_t
    )
    SELECT brand, ni AS n_lines,
           round({mean_i} / 100.0, 6) AS raw_mean,
           CASE WHEN k >= 4 AND qd > 0 THEN
             round(({gmean} + ({factor}) * {dev}) / 100.0, 6)
           WHEN k >= 4 THEN round({gmean} / 100.0, 6)
           ELSE round({mean_i} / 100.0, 6) END AS shrunk_mean
    FROM js_p CROSS JOIN js_t CROSS JOIN js_m
    ORDER BY brand
    """


# --------------------------------------------------------------- wave 142
def price_index_halves(lineitem: DataFrame) -> DataFrame:
    """→ one row [n_parts_common, laspeyres, paasche, fisher] — the
    classic bilateral price indices between the ledger's two time
    halves (split at the exact median ship date): Laspeyres weights
    price relatives by BASE-period quantities, Paasche by CURRENT, and
    Fisher is their geometric mean (the "ideal" index). The inflation
    read on the catalog itself — distinct from revenue trend, which
    conflates price and volume.

    Semantics: per part and half, the average unit price is the exact
    ratio A/Q of summed extended-price cents to summed centi-quantity;
    only parts traded in BOTH halves enter (documented — a bilateral
    index is undefined off the common basket). With half-total
    quantities as weights, Σp̄₀Q₀ = ΣA₀ and Σp̄₁Q₁ = ΣA₁ are EXACT, and
    the two cross terms (A₁Q₀/Q₁, A₀Q₁/Q₀) are the only rationals —
    each MICRO-QUANTIZED per part before its sum, so every index is a
    staged ratio of exact integers, rounded 6. NULL when the common
    basket is empty or a denominator is 0.

    Scale shape: one lineitem-grain aggregate to (part, half), a
    part-grain self-pair, four exact sums, a one-row reduce.

    Reference parity: no relational surface in the reference
    (pagerank_lambda/dynamodb/pagerank.py:51-99); engine extension.
    """
    d38 = "decimal(38,0)"
    cut = lineitem.groupBy().agg(
        F.expr(
            "CAST(floor(percentile(unix_micros(CAST(l_shipdate AS"
            " TIMESTAMP)), 0.5D)) AS BIGINT)"
        ).alias("cut")
    )
    ph = (
        lineitem.crossJoin(F.broadcast(cut))
        .groupBy(
            "l_partkey",
            F.expr(
                "CASE WHEN unix_micros(CAST(l_shipdate AS TIMESTAMP))"
                " >= cut THEN 1 ELSE 0 END"
            ).alias("h"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                .cast(d38)
            ).alias("a"),
            F.sum(
                F.round(F.col("l_quantity") * 100, 0).cast("long").cast(d38)
            ).alias("q"),
        )
    )
    h0 = ph.where(F.col("h") == 0).select(
        "l_partkey", F.col("a").alias("a0"), F.col("q").alias("q0")
    )
    h1 = ph.where(F.col("h") == 1).select(
        "l_partkey", F.col("a").alias("a1"), F.col("q").alias("q1")
    )
    both = h0.join(h1, "l_partkey").where(
        (F.col("q0") > 0) & (F.col("q1") > 0)
    )
    s = both.groupBy().agg(
        F.count("*").cast("long").alias("np"),
        F.coalesce(F.sum("a0"), F.lit(0).cast(d38)).alias("sa0"),
        F.coalesce(F.sum("a1"), F.lit(0).cast(d38)).alias("sa1"),
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(round(1e6 * CAST(a1 AS DOUBLE) * CAST(q0 AS"
                    " DOUBLE) / CAST(q1 AS DOUBLE), 0) AS decimal(38,0))"
                )
            ),
            F.lit(0).cast(d38),
        ).alias("x10"),
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(round(1e6 * CAST(a0 AS DOUBLE) * CAST(q1 AS"
                    " DOUBLE) / CAST(q0 AS DOUBLE), 0) AS decimal(38,0))"
                )
            ),
            F.lit(0).cast(d38),
        ).alias("x01"),
    )
    lasp = "(CAST(x10 AS DOUBLE) / 1e6 / CAST(sa0 AS DOUBLE))"
    paas = "(CAST(sa1 AS DOUBLE) / (CAST(x01 AS DOUBLE) / 1e6))"
    return s.select(
        F.col("np").alias("n_parts_common"),
        F.expr(
            f"CASE WHEN np > 0 AND sa0 > 0 THEN round({lasp}, 6) END"
        ).alias("laspeyres"),
        F.expr(
            f"CASE WHEN np > 0 AND x01 > 0 THEN round({paas}, 6) END"
        ).alias("paasche"),
        F.expr(
            f"CASE WHEN np > 0 AND sa0 > 0 AND x01 > 0 THEN"
            f" round(sqrt(({lasp}) * ({paas})), 6) END"
        ).alias("fisher"),
    )


def price_index_halves_sql(table: str = "lineitem") -> str:
    """DuckDB oracle for :func:`price_index_halves` (same median split,
    micro-quantized cross terms)."""
    lasp = "(CAST(x10 AS DOUBLE) / 1e6 / CAST(sa0 AS DOUBLE))"
    paas = "(CAST(sa1 AS DOUBLE) / (CAST(x01 AS DOUBLE) / 1e6))"
    return f"""
    WITH pix_c AS (
      SELECT CAST(floor(quantile_cont(epoch_us(l_shipdate), 0.5))
                  AS BIGINT) AS cut
      FROM {table}
    ), pix_ph AS (
      SELECT l_partkey,
             CASE WHEN epoch_us(l_shipdate) >= cut THEN 1 ELSE 0 END AS h,
             sum(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 AS HUGEINT)) AS a,
             sum(CAST(CAST(round(l_quantity * 100, 0) AS BIGINT)
                 AS HUGEINT)) AS q
      FROM {table} CROSS JOIN pix_c
      GROUP BY 1, 2
    ), pix_b AS (
      SELECT h0.l_partkey, h0.a AS a0, h0.q AS q0, h1.a AS a1, h1.q AS q1
      FROM (SELECT * FROM pix_ph WHERE h = 0) h0
      JOIN (SELECT * FROM pix_ph WHERE h = 1) h1 USING (l_partkey)
      WHERE h0.q > 0 AND h1.q > 0
    ), pix_s AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             coalesce(sum(a0), 0) AS sa0, coalesce(sum(a1), 0) AS sa1,
             coalesce(sum(CAST(round(1e6 * CAST(a1 AS DOUBLE)
               * CAST(q0 AS DOUBLE) / CAST(q1 AS DOUBLE), 0) AS HUGEINT)),
               0) AS x10,
             coalesce(sum(CAST(round(1e6 * CAST(a0 AS DOUBLE)
               * CAST(q1 AS DOUBLE) / CAST(q0 AS DOUBLE), 0) AS HUGEINT)),
               0) AS x01
      FROM pix_b
    )
    SELECT np AS n_parts_common,
           CASE WHEN np > 0 AND sa0 > 0 THEN round({lasp}, 6) END
             AS laspeyres,
           CASE WHEN np > 0 AND x01 > 0 THEN round({paas}, 6) END
             AS paasche,
           CASE WHEN np > 0 AND sa0 > 0 AND x01 > 0 THEN
             round(sqrt(({lasp}) * ({paas})), 6) END AS fisher
    FROM pix_s
    """
