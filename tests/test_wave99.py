"""Wave-99 operators: k-anonymity audit (Sweeney 2002) and distinct
l-diversity risk groups (Machanavajjhala et al. 2007) over the customer
quasi-identifier lattice."""

from linkgraph_spark.functions.relational import (
    k_anonymity_audit,
    l_diversity_risk,
)

_SCHEMA = "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double"


def _cust(spark, rows):
    return spark.createDataFrame(
        [(i + 1, n, s, b) for i, (n, s, b) in enumerate(rows)], _SCHEMA
    )


def test_k_anonymity_hand_computed(spark):
    rows = (
        [(1, "BUILDING", 10.0)] * 5    # group of 5: violates k=10
        + [(1, "MACHINERY", 10.0)] * 12  # group of 12: safe
        + [(2, "BUILDING", 10.0)] * 2   # group of 2: violates
    )
    r = k_anonymity_audit(_cust(spark, rows), k=10).collect()[0]
    assert (r.n_rows, r.n_groups, r.min_group_size) == (19, 3, 2)
    assert (r.n_violating_groups, r.n_violating_rows) == (2, 7)
    assert r.pct_rows_at_risk == round(7 / 19, 6)


def test_k_anonymity_all_safe(spark):
    rows = [(1, "BUILDING", 10.0)] * 10
    r = k_anonymity_audit(_cust(spark, rows), k=10).collect()[0]
    assert (r.n_violating_groups, r.n_violating_rows, r.pct_rows_at_risk) == (
        0, 0, 0.0,
    )


def test_l_diversity_flags_homogeneous_group(spark):
    # group A: 4 rows, ALL in one $5000 bracket -> 1 distinct < l=3
    # group B: 3 rows in 3 different brackets -> safe
    rows = (
        [(1, "BUILDING", 100.0), (1, "BUILDING", 200.0),
         (1, "BUILDING", 300.0), (1, "BUILDING", 400.0)]
        + [(2, "MACHINERY", 100.0), (2, "MACHINERY", 5100.0),
           (2, "MACHINERY", -100.0)]
    )
    out = l_diversity_risk(_cust(spark, rows), l=3).collect()
    assert [(r.c_nationkey, r.c_mktsegment, r.n, r.n_sensitive_distinct)
            for r in out] == [(1, "BUILDING", 4, 1)]


def test_l_diversity_negative_balance_floors_consistently(spark):
    # -100.00 -> shifted cents 9990000 -> bracket 19; +100.00 -> bracket 20:
    # a negative and a small positive balance are DIFFERENT brackets
    rows = [(1, "BUILDING", -100.0), (1, "BUILDING", 100.0)]
    out = l_diversity_risk(_cust(spark, rows), l=3).collect()
    assert out[0].n_sensitive_distinct == 2
