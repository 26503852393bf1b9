"""Wave-108 operators: tie-aware Spearman at histogram grain and
Cohen's kappa for the lang-id heuristic."""

from datetime import datetime

from linkgraph_spark.functions.ml import spearman_activity_spend
from linkgraph_spark.functions.text import lang_id_kappa

_SCHEMA = "user_id long, event_type string, value double, ts timestamp"
_TS = datetime(2024, 1, 1)


def _users(spark, spec):
    rows = []
    for u, (n, spend) in spec.items():
        per = spend / n
        rows += [(u, "click", per, _TS)] * n
    return spark.createDataFrame(rows, _SCHEMA)


def test_spearman_perfect_monotone(spark):
    ev = _users(spark, {1: (1, 1.0), 2: (2, 5.0), 3: (3, 9.0), 4: (4, 100.0)})
    r = spearman_activity_spend(ev).collect()[0]
    assert (r.n, r.rho) == (4, 1.0)  # monotone, outlier-immune


def test_spearman_perfect_inverse(spark):
    ev = _users(spark, {1: (4, 1.0), 2: (3, 2.0), 3: (2, 3.0), 4: (1, 4.0)})
    r = spearman_activity_spend(ev).collect()[0]
    assert r.rho == -1.0


def test_spearman_ties_midrank(spark):
    # x: 1,1,2 -> midranks 1.5,1.5,3; y: 10,20,30 -> ranks 1,2,3
    ev = _users(spark, {1: (1, 0.10), 2: (1, 0.20), 3: (2, 0.30)})
    r = spearman_activity_spend(ev).collect()[0]
    # hand Pearson on (1.5,1.5,3) vs (1,2,3):
    # n*Sab - Sa*Sb = 3*13.5 - 36 = 4.5; denoms 4.5 and 6
    assert r.rho == round(4.5 / (4.5 * 6.0) ** 0.5, 6)


def test_spearman_constant_side_is_null(spark):
    ev = _users(spark, {1: (2, 1.0), 2: (2, 5.0), 3: (2, 9.0)})
    r = spearman_activity_spend(ev).collect()[0]
    assert r.rho is None  # activity constant -> all ranks tied


_DOCS = "doc_id long, text string, lang string"
_EN = "the of and to in is was for on as"
_DE = "der die und das nicht ich ist du sie es"
_FR = "le la et les des en un du une que"


def test_kappa_perfect_agreement(spark):
    rows = [(1, _EN, "en"), (2, _DE, "de"), (3, _FR, "fr"), (4, _EN, "en")]
    d = spark.createDataFrame(rows, _DOCS)
    r = lang_id_kappa(d).collect()[0]
    assert (r.n, r.n_agree, r.po) == (4, 4, 1.0)
    # margins: pred en=2,de=1,fr=1; label same -> pe = (4+1+1)/16
    assert r.pe == round(6 / 16, 6)
    assert r.kappa == 1.0


def test_kappa_chance_corrected_below_accuracy(spark):
    # heuristic right on 2 of 4; kappa must sit below raw accuracy
    rows = [(1, _EN, "en"), (2, _DE, "de"), (3, _EN, "fr"), (4, _DE, "en")]
    d = spark.createDataFrame(rows, _DOCS)
    r = lang_id_kappa(d).collect()[0]
    assert r.n_agree == 2 and r.po == 0.5
    # pred margins: en=2, de=2; label margins: en=2, de=1, fr=1
    pe = (2 * 2 + 2 * 1) / 16
    assert r.pe == round(pe, 6)
    assert r.kappa == round((0.5 - pe) / (1 - pe), 6)
    assert r.kappa < r.po
