"""Wave-103 operators: Adjusted Rand Index (Hubert & Arabie 1985) and
sqrt-normalized mutual information (Strehl & Ghosh 2002) between two
categorical partitions."""

import math

from linkgraph_spark.functions.ml import adjusted_rand, nmi_partitions

_SCHEMA = "doc_id long, lang string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(rows)], _SCHEMA
    )


def test_identical_partitions_are_perfect(spark):
    rows = [("en", "s1")] * 3 + [("fr", "s2")] * 2 + [("de", "s3")] * 2
    r = adjusted_rand(_docs(spark, rows)).collect()[0]
    assert r.n == 7 and r.ari == 1.0
    m = nmi_partitions(_docs(spark, rows)).collect()[0]
    assert m.nmi == 1.0
    assert m.h_a == m.h_b  # identical partitions, identical entropies


def test_ari_hand_computed(spark):
    # classic 2x2: A = {en x3, fr x3}; B splits each class 2/1 crosswise
    rows = [
        ("en", "s1"), ("en", "s1"), ("en", "s2"),
        ("fr", "s2"), ("fr", "s2"), ("fr", "s1"),
    ]
    r = adjusted_rand(_docs(spark, rows)).collect()[0]
    # cells: (en,s1)=2,(en,s2)=1,(fr,s2)=2,(fr,s1)=1 -> sum_pairs = 1+0+1+0 = 2
    # a margins 3,3 -> a_pairs 6; b margins 3,3 -> b_pairs 6; C(6,2)=15
    assert (r.sum_pairs, r.a_pairs, r.b_pairs) == (2, 6, 6)
    e = 6 * 6 / 15
    assert r.ari == round((2 - e) / ((6 + 6) / 2 - e), 6)


def test_degenerate_partitions(spark):
    # one-cluster side vs scattered side: ARI is DEFINED and 0 (no
    # agreement beyond chance), NMI undefined (zero entropy on one side)
    rows = [("en", "s1"), ("en", "s2"), ("en", "s3")]
    r = adjusted_rand(_docs(spark, rows)).collect()[0]
    assert r.ari == 0.0
    m = nmi_partitions(_docs(spark, rows)).collect()[0]
    assert m.h_a == 0.0 and m.nmi is None
    # BOTH sides one cluster: max index == expected index -> ARI undefined
    rows2 = [("en", "s1")] * 3
    r2 = adjusted_rand(_docs(spark, rows2)).collect()[0]
    assert r2.ari is None


def test_nmi_independent_partitions_near_zero(spark):
    # perfectly independent 2x2 -> MI exactly 0 (clamped from ulp residue)
    rows = [
        ("en", "s1"), ("en", "s2"), ("fr", "s1"), ("fr", "s2"),
    ] * 3
    m = nmi_partitions(_docs(spark, rows)).collect()[0]
    assert m.mi == 0.0 and m.nmi == 0.0
    # entropies are the rounded MICRO-NAT sums (quantize-then-sum), not
    # round(ln 2, 6): two 0.5*ln(0.5) terms each round half-up
    h_expect = round(-2 * round(1e6 * 0.5 * math.log(0.5)) / 1e6, 6)
    assert m.h_a == h_expect == m.h_b
    assert abs(m.h_a - math.log(2)) < 2e-6
