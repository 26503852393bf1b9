"""Wave-112 operators: association rules (Agrawal et al. 1993
confidence/lift over frequent pairs) and language confusability via
char-trigram profile cosines (Cavnar & Trenkle 1994)."""

from linkgraph_spark.functions.relational import association_rules
from linkgraph_spark.functions.text import lang_confusability


def _baskets(spark, order_brands):
    parts, items, pk, brand_key = [], [], 0, {}
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


def test_rules_hand_computed(spark):
    # A in 4 baskets, B in 2, AB together in 2, N = 4
    li, part = _baskets(
        spark,
        [(1, ["A", "B"]), (2, ["A", "B"]), (3, ["A"]), (4, ["A"])],
    )
    out = {(r.antecedent, r.consequent): r
           for r in association_rules(li, part, min_support=2).collect()}
    ab, ba = out[("A", "B")], out[("B", "A")]
    assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 4, 2)
    assert ab.confidence == 0.5          # A -> B: 2/4
    assert ba.confidence == 1.0          # B -> A: 2/2
    # lift symmetric: 2*4/(4*2) = 1.0 (independent)
    assert ab.lift == ba.lift == 1.0


def test_rules_positive_lift(spark):
    # C and D always co-occur; E floats alone -> lift(C,D) = N/n share
    li, part = _baskets(
        spark,
        [(1, ["C", "D"]), (2, ["C", "D"]), (3, ["E"]), (4, ["E"])],
    )
    out = {(r.antecedent, r.consequent): r
           for r in association_rules(li, part, min_support=2).collect()}
    cd = out[("C", "D")]
    assert cd.confidence == 1.0
    assert cd.lift == round(2 * 4 / (2 * 2), 6) == 2.0
    assert ("E", "C") not in out  # never co-occurs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_confusability_identical_profiles(spark):
    rows = [(1, "abcabc", "en"), (2, "abcabc", "fr")]
    out = lang_confusability(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.lang_a, r.lang_b) == ("en", "fr")
    assert r.cosine == 1.0  # identical trigram profiles


def test_confusability_disjoint_profiles_absent(spark):
    rows = [(1, "aaaaaa", "en"), (2, "zzzzzz", "fr")]
    # no shared trigram -> inner join empty -> no row (cosine 0 implicit)
    assert lang_confusability(_docs(spark, rows)).count() == 0


def test_confusability_hand_computed(spark):
    # en: 'aba'x1,'bab'x1 ; fr: 'aba'x2  -> dot=2, |en|²=2, |fr|²=4
    rows = [(1, "abab", "en"), (2, "abaaba", "fr")]
    # fr trigrams: aba, baa, aab, aba -> aba x2, baa x1, aab x1
    out = lang_confusability(_docs(spark, rows)).collect()[0]
    # dot = 1*2 (aba only shared); norms: en 1+1=2, fr 4+1+1=6
    assert out.n_shared_trigrams == 1
    assert out.cosine == round(2 / (2 * 6) ** 0.5, 6)
