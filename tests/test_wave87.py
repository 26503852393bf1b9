"""Wave-87 operators: ML-as-aggregates (exact-moment OLS, Naive Bayes)."""

from linkgraph_spark.functions.ml import nb_lang_confusion, ols_price_model

_LI_SCHEMA = (
    "l_orderkey long, l_quantity double, l_extendedprice double,"
    " l_discount double"
)


def _li(spark, rows):
    return spark.createDataFrame(rows, _LI_SCHEMA)


def test_ols_recovers_exact_linear_fit(spark):
    # y = 3 + 2*q + 10*d exactly -> r2 = 1, rmse = 0
    rows = []
    i = 0
    for q in range(1, 6):
        for d in (0.0, 0.05, 0.10):
            rows.append((i, float(q), 3.0 + 2.0 * q + 10.0 * d, d))
            i += 1
    out = ols_price_model(_li(spark, rows)).collect()[0]
    assert out.n_rows == 15
    assert abs(out.b0 - 3.0) < 1e-6
    assert abs(out.b_qty - 2.0) < 1e-6
    assert abs(out.b_disc - 10.0) < 1e-6
    assert out.r2 == 1.0
    assert out.rmse == 0.0


def test_ols_matches_numpy_lstsq_on_noisy_data(spark):
    import numpy as np

    rng_rows = []
    for i in range(60):
        q = 1.0 + (i * 7) % 9
        d = ((i * 3) % 11) / 100.0
        noise = ((i * 13) % 7 - 3) / 100.0  # deterministic, cent-exact
        y = round(5.0 + 1.5 * q - 20.0 * d + noise, 2)
        rng_rows.append((i, q, y, d))
    out = ols_price_model(_li(spark, rng_rows)).collect()[0]
    X = np.array([[1.0, r[1], r[3]] for r in rng_rows])
    Y = np.array([r[2] for r in rng_rows])
    beta, *_ = np.linalg.lstsq(X, Y, rcond=None)
    assert abs(out.b0 - beta[0]) < 1e-4
    assert abs(out.b_qty - beta[1]) < 1e-4
    assert abs(out.b_disc - beta[2]) < 1e-4
    resid = Y - X @ beta
    assert abs(out.rmse - float(np.sqrt((resid**2).mean()))) < 1e-4
    assert 0.9 < out.r2 <= 1.0


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_nb_separable_corpus_classifies_diagonal(spark):
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog ate the bone", "en"),
        (2, "le chat dort sur le tapis", "fr"),
        (3, "le chien mange un os", "fr"),
    ]
    out = {
        (r.lang, r.pred_lang): r.n_docs
        for r in nb_lang_confusion(_docs(spark, rows)).collect()
    }
    assert out == {("en", "en"): 2, ("fr", "fr"): 2}


def test_nb_deterministic_and_counts_conserved(spark):
    rows = [
        (i, f"tok{i % 3} tok{i % 5} shared shared", ("en", "fr", "de")[i % 3])
        for i in range(30)
    ]
    df = _docs(spark, rows)
    a = sorted(map(tuple, nb_lang_confusion(df).collect()))
    b = sorted(map(tuple, nb_lang_confusion(df).collect()))
    assert a == b
    assert sum(r[2] for r in a) == 30  # every doc predicted exactly once
