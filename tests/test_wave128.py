"""Wave-128 operator: MMR diversified reranking over embeddings."""

import math

from linkgraph_spark.functions.similarity import mmr_rerank

_SCHEMA = "vec_id long, embedding array<float>, label int"


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs.items()], _SCHEMA
    )


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(d / (na * nb), 6)


def _mmr_hand(vecs, k, lam):
    q = vecs[min(vecs)]
    cand = {i: _cos(q, v) for i, v in vecs.items() if i != min(vecs)}
    maxsim = {i: 0.0 for i in cand}
    picked = []
    for rk in range(1, k + 1):
        if not cand:
            break
        best = min(
            cand,
            key=lambda i: (
                -round(lam * cand[i] - (1 - lam) * maxsim[i], 6), i,
            ),
        )
        picked.append(
            (rk, best, cand[best],
             round(lam * cand[best] - (1 - lam) * maxsim[best], 6))
        )
        del cand[best]
        for i in cand:
            maxsim[i] = max(maxsim[i], _cos(vecs[i], vecs[best]))
    return picked


def test_mmr_hand_computed_prefers_diversity(spark):
    # query at e1; a cluster of near-copies near e1, one distinct vector
    vecs = {
        0: [1.0, 0.0, 0.0],        # query
        1: [0.98, 0.2, 0.0],       # best relevance
        2: [0.97, 0.22, 0.01],     # near-copy of 1
        3: [0.96, 0.24, 0.02],     # near-copy of 1
        4: [0.7, 0.0, 0.7],        # different direction, decent relevance
    }
    out = mmr_rerank(_emb(spark, vecs), k=3, n_candidates=4, lam=0.5).collect()
    hand = _mmr_hand(vecs, 3, 0.5)
    assert [(r.rk, r.vec_id) for r in out] == [(h[0], h[1]) for h in hand]
    for r, h in zip(out, hand):
        assert r.relevance == h[2]
        assert r.mmr_score == h[3]
    # diversity: pick 2 is the distinct vector, not the near-copy
    assert out[0].vec_id == 1
    assert out[1].vec_id == 4


def test_mmr_first_pick_is_max_relevance(spark):
    vecs = {
        0: [1.0, 0.0],
        5: [0.9, 0.1],
        6: [0.5, 0.5],
        7: [0.0, 1.0],
    }
    out = mmr_rerank(_emb(spark, vecs), k=2, n_candidates=3).collect()
    assert out[0].vec_id == 5
    assert out[0].mmr_score == round(0.7 * out[0].relevance, 6)


def test_mmr_fewer_candidates_than_k(spark):
    vecs = {0: [1.0, 0.0], 1: [0.8, 0.6], 2: [0.0, 1.0]}
    out = mmr_rerank(_emb(spark, vecs), k=5, n_candidates=10).collect()
    assert len(out) == 2  # only two candidates exist
    assert [r.rk for r in out] == [1, 2]
