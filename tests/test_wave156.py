"""Wave-156 operator: exact token-budget allocation (largest remainder +
repetition epochs)."""

import math

import pytest

from linkgraph_spark.functions.sampling import token_budget_alloc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _ref(rows, budget, alpha=0.5):
    avail = {}
    for _, lang, text in rows:
        avail[lang] = avail.get(lang, 0) + len(text.lower().split())
    w = {l: round(c ** alpha, 6) for l, c in avail.items()}
    tot = sum(w.values())
    share = {l: round(v / tot, 9) for l, v in w.items()}
    fl = {l: int(math.floor(share[l] * budget)) for l in share}
    frac = {l: share[l] * budget - fl[l] for l in share}
    left = budget - sum(fl.values())
    order = sorted(share, key=lambda l: (-frac[l], l))
    alloc = dict(fl)
    for l in order[:left]:
        alloc[l] += 1
    return {
        l: (avail[l], share[l], alloc[l], round(alloc[l] / avail[l], 6))
        for l in share
    }


def test_allocation_sums_exactly_to_budget_and_matches_ref(spark):
    rows = [
        (1, "en", "a b c d e f g h i j " * 30),   # 300 tokens
        (2, "de", "x y z w v " * 8),              # 40
        (3, "fr", "l m n " * 5),                  # 15
        (4, "en", "k k k k k " * 10),             # 50
    ]
    budget = 997  # prime: floors cannot hit it without the remainder pass
    got = {
        r.lang: (r.tokens_avail, r.share, r.alloc_tokens, r.epochs)
        for r in token_budget_alloc(_docs(spark, rows), budget).collect()
    }
    want = _ref([(i, l, t) for i, l, t in rows], budget)
    assert set(got) == set(want)
    for l in want:
        assert got[l][0] == want[l][0], l
        assert got[l][1] == pytest.approx(want[l][1], abs=2e-9)
        assert got[l][2] == want[l][2], l
        assert got[l][3] == pytest.approx(want[l][3], abs=2e-6)
    assert sum(v[2] for v in got.values()) == budget


def test_epochs_flags_over_asked_tail_language(spark):
    rows = [
        (1, "en", "tok " * 1000),
        (2, "rare", "tok " * 10),
    ]
    got = {
        r.lang: r for r in token_budget_alloc(_docs(spark, rows), 2000, alpha=0.3).collect()
    }
    # temperature up-weights the tail: the rare language is asked for far
    # more tokens than it has (epochs >> 1), english stays under 1
    assert got["rare"].epochs > 4
    assert got["en"].epochs < 2
    assert got["en"].alloc_tokens + got["rare"].alloc_tokens == 2000


def test_alpha_one_is_proportional(spark):
    rows = [(1, "a", "t " * 300), (2, "b", "t " * 100)]
    got = {
        r.lang: r for r in token_budget_alloc(_docs(spark, rows), 400, alpha=1.0).collect()
    }
    assert got["a"].alloc_tokens == 300 and got["b"].alloc_tokens == 100
    assert got["a"].epochs == got["b"].epochs == 1.0
