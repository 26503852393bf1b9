"""Wave-97 operators: bucketed numeric band self-join (equi-join rewrite
of the |x_a − x_b| ≤ w theta join) and A-priori frequent triples
(Agrawal & Srikant 1994, two pruning levels)."""

from linkgraph_spark.functions.relational import (
    frequent_triples_apriori,
    price_band_pairs,
)


def _orders(spark, rows):
    return spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")


def test_band_pairs_same_adjacent_and_excluded(spark):
    # cents: 10, 99 (bucket 0), 101, 199 (bucket 1), 250 (bucket 2)
    o = _orders(
        spark,
        [(1, 0.10), (2, 0.99), (3, 1.01), (4, 1.99), (5, 2.50)],
    )
    got = [(r.o_a, r.o_b, r.gap_cents) for r in price_band_pairs(o, 100).collect()]
    assert got == [
        (1, 2, 89),   # same bucket
        (1, 3, 91),   # adjacent buckets
        (2, 3, 2),    # adjacent buckets, tiny gap
        (2, 4, 100),  # adjacent buckets, gap == band (inclusive)
        (3, 4, 98),   # same bucket
        (4, 5, 51),   # adjacent buckets
    ]
    # NOT present: (1,4)/(2,5)/(3,5) exceed the band; (1,5) is 2 buckets apart


def test_band_pairs_exhaustive_against_naive(spark):
    # the real contract: bucketed rewrite == naive theta join, exhaustively
    cents = [10, 99, 101, 150, 199, 250, 420, 430, 900]
    o = _orders(spark, [(i + 1, c / 100.0) for i, c in enumerate(cents)])
    got = {(r.o_a, r.o_b, r.gap_cents) for r in price_band_pairs(o, 100).collect()}
    want = {
        (i + 1, j + 1, abs(cents[i] - cents[j]))
        for i in range(len(cents))
        for j in range(i + 1, len(cents))
        if abs(cents[i] - cents[j]) <= 100
    }
    assert got == want


def test_band_pairs_plan_is_equi_join(spark):
    o = _orders(spark, [(i, float(i)) for i in range(1, 50)])
    plan = price_band_pairs(o, 100)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _baskets(spark, order_brands):
    parts, items, pk = [], [], 0
    brand_key = {}
    for ok, brands in order_brands:
        for b in brands:
            if b not in brand_key:
                pk += 1
                brand_key[b] = pk
                parts.append((pk, b))
            items.append((ok, brand_key[b]))
    part = spark.createDataFrame(parts, "p_partkey long, p_brand string")
    li = spark.createDataFrame(items, "l_orderkey long, l_partkey long")
    return li, part


def test_frequent_triples_hand_computed(spark):
    li, part = _baskets(
        spark,
        [
            (1, ["X", "Y", "Z"]),
            (2, ["X", "Y", "Z"]),
            (3, ["X", "Y", "W"]),  # W is infrequent -> item-pruned
        ],
    )
    out = [(r.brand_a, r.brand_b, r.brand_c, r.n_abc)
           for r in frequent_triples_apriori(li, part, min_support=2).collect()]
    assert out == [("X", "Y", "Z", 2)]


def test_frequent_triples_duplicate_parts_one_vote(spark):
    # two parts of the SAME brand in one order count once (distinct baskets)
    li, part = _baskets(spark, [(1, ["A", "B", "C"]), (2, ["A", "B", "C"])])
    extra = spark.createDataFrame([(1, 1)], "l_orderkey long, l_partkey long")
    li = li.unionByName(extra)  # duplicate (order 1, brand A)
    out = frequent_triples_apriori(li, part, min_support=2).collect()
    assert [(r.brand_a, r.brand_b, r.brand_c, r.n_abc) for r in out] == [
        ("A", "B", "C", 2)
    ]
