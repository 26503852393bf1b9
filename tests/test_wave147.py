"""Wave-147 operator: interpolated Kneser-Ney bigram held-out perplexity
(continuation counts, add-1 escape, md5 split) vs a pure-python mirror."""

import hashlib
import math

import pytest

from linkgraph_spark.functions.text import kn_bigram_perplexity


def _variant(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 2


def _ref(docs, d=0.75):
    tr_bg, te_bg, vocab = [], [], set()
    for doc_id, text in docs:
        tk = [t for t in " ".join(text.lower().split()).split(" ") if t]
        pairs = list(zip(tk, tk[1:]))
        if _variant(doc_id) == 0:
            tr_bg.extend(pairs)
            vocab.update(tk)
        else:
            te_bg.extend(pairs)
    cb, cu, n1u, n1w = {}, {}, {}, {}
    for u, w in tr_bg:
        cb[(u, w)] = cb.get((u, w), 0) + 1
    for (u, w), c in cb.items():
        cu[u] = cu.get(u, 0) + c
        n1u[u] = n1u.get(u, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    B, V = len(cb), len(vocab)
    nll_sum, unseen = 0, 0
    for u, w in te_bg:
        pc = (n1w.get(w, 0) + 1.0) / (B + V + 1.0)
        if u in cu:
            p = max(cb.get((u, w), 0) - d, 0.0) / cu[u] + (d * n1u[u] / cu[u]) * pc
        else:
            p = pc
            unseen += 1
        nll_sum += int(round(-1e6 * math.log(p)))
    n = len(te_bg)
    out = dict(
        n_train_bigrams=len(tr_bg), n_bigram_types=B, vocab=V,
        n_test_bigrams=n,
        unseen_ctx_rate=round(unseen / n, 6) if n else None,
        avg_nll=round(nll_sum / (1e6 * n), 6) if n else None,
        ppl=round(math.exp(nll_sum / (1e6 * n)), 6) if n else None,
    )
    return out


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _first_ids_by_variant(k_each=6):
    """Deterministic doc ids covering both md5 halves."""
    tr = [i for i in range(100) if _variant(i) == 0][:k_each]
    te = [i for i in range(100) if _variant(i) == 1][:k_each]
    return tr, te


def test_kn_matches_python_reference(spark):
    tr, te = _first_ids_by_variant()
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
        "the cat saw the dog",
        "dogs and cats play",
        "the mat was flat",
    ]
    docs = [(i, texts[j % len(texts)]) for j, i in enumerate(tr)] + [
        (i, texts[(j + 2) % len(texts)] + " zebra") for j, i in enumerate(te)
    ]
    row = kn_bigram_perplexity(_docs_df(spark, docs)).collect()[0]
    want = _ref(docs)
    got = row.asDict()
    for k, v in want.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v, abs=2e-6), k
        else:
            assert got[k] == v, k
    # sanity: every probability < 1 → ppl > 1; unseen contexts got counted
    assert got["ppl"] > 1.0
    assert got["unseen_ctx_rate"] is not None


def test_kn_continuation_beats_raw_frequency(spark):
    # "francisco" appears often but ONLY after "san"; "common" completes
    # many contexts. KN's continuation count must make p_cont(common) >
    # p_cont(francisco) despite equal unigram frequency — the signature
    # property plain add-k smoothing lacks.
    tr, te = _first_ids_by_variant()
    train_text = (
        "san francisco san francisco san francisco san francisco "
        "a common b common c common d common"
    )
    docs = [(tr[0], train_text), (te[0], "x common x francisco")]
    # both test bigrams have unseen context "x" → scored by p_cont alone
    row = kn_bigram_perplexity(_docs_df(spark, docs)).collect()[0]
    want = _ref(docs)
    assert row.avg_nll == pytest.approx(want["avg_nll"], abs=2e-6)
    # the test doc's bigrams: (x,common) and (x,francisco) have unseen
    # context "x"; (common,x) has the SEEN context "common" → 2/3 unseen
    assert want["unseen_ctx_rate"] == round(2 / 3, 6)
    assert row.unseen_ctx_rate == pytest.approx(2 / 3, abs=1e-6)


def test_kn_empty_test_half_reports_null_metrics(spark):
    tr, _ = _first_ids_by_variant()
    docs = [(i, "alpha beta gamma") for i in tr[:3]]
    row = kn_bigram_perplexity(_docs_df(spark, docs)).collect()[0]
    assert row.n_test_bigrams == 0
    assert row.avg_nll is None and row.ppl is None and row.unseen_ctx_rate is None


def test_kn_single_token_docs_contribute_nothing(spark):
    tr, te = _first_ids_by_variant()
    docs = [(tr[0], "hello world again"), (te[0], "solo"), (te[1], "hello world")]
    row = kn_bigram_perplexity(_docs_df(spark, docs)).collect()[0]
    want = _ref(docs)
    assert row.n_test_bigrams == want["n_test_bigrams"] == 1
    assert row.avg_nll == pytest.approx(want["avg_nll"], abs=2e-6)
