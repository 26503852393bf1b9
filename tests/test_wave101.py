"""Wave-101 operators: per-part supplier HHI ranking and the
single-source / dominance procurement audit (exact integer 4/5
predicate)."""

from linkgraph_spark.functions.relational import (
    single_source_audit,
    supplier_concentration,
)

_SCHEMA = "l_partkey long, l_suppkey long, l_quantity double"


def _li(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_hhi_hand_computed(spark):
    rows = [
        (1, 10, 10.0),            # part 1: single supplier -> hhi 1.0
        (2, 10, 5.0), (2, 11, 5.0),  # part 2: 50/50 -> hhi 0.5
        (3, 10, 8.0), (3, 11, 1.0), (3, 12, 1.0),  # 0.64+0.01+0.01
    ]
    out = {r.p_partkey: r for r in supplier_concentration(_li(spark, rows)).collect()}
    assert out[1].hhi == 1.0 and out[1].n_suppliers == 1
    assert out[2].hhi == 0.5 and out[2].total_qty == 10.0
    assert out[3].hhi == 0.66 and out[3].n_suppliers == 3
    # ranking: hhi desc, then partkey
    order = [r.p_partkey for r in supplier_concentration(_li(spark, rows)).collect()]
    assert order == [1, 3, 2]


def test_hhi_repeated_lines_same_supplier_aggregate(spark):
    # two lines from one supplier are ONE share
    rows = [(1, 10, 3.0), (1, 10, 7.0), (1, 11, 10.0)]
    r = supplier_concentration(_li(spark, rows)).collect()[0]
    assert r.n_suppliers == 2 and r.hhi == 0.5


def test_single_source_audit_hand_computed(spark):
    rows = [
        (1, 10, 10.0),                      # single-sourced AND dominated
        (2, 10, 8.0), (2, 11, 2.0),         # top share 0.8 -> dominated (>=)
        (3, 10, 7.9), (3, 11, 2.1),         # 0.79 -> not dominated
        (4, 10, 5.0), (4, 11, 5.0),         # 0.5 -> safe
    ]
    r = single_source_audit(_li(spark, rows)).collect()[0]
    assert (r.n_parts, r.n_single_sourced, r.n_dominated) == (4, 1, 2)
    assert r.pct_single == 0.25 and r.pct_dominated == 0.5
