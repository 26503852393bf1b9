"""Wave-125 operator: Burrows' Delta stylometric distance between
sources over the top-k corpus terms."""

import math

from linkgraph_spark.functions.text import burrows_delta

_SCHEMA = "doc_id long, text string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(rows, 1)], _SCHEMA
    )


def _delta_hand(corpus, top_k):
    """Reference Delta with the engine's nano/micro quantization."""
    import collections

    stf = collections.defaultdict(collections.Counter)
    for s, t in corpus:
        stf[s].update(t.lower().split())
    ctf = collections.Counter()
    for c in stf.values():
        ctf.update(c)
    top = sorted(ctf, key=lambda w: (-ctf[w], w))[:top_k]
    srcs = sorted(stf)
    q = {}
    for s in srcs:
        tt = sum(stf[s].values())
        for w in top:
            q[(s, w)] = round(1e9 * stf[s][w] / tt)
    usable = []
    for w in top:
        vals = [q[(s, w)] for s in srcs]
        n = len(vals)
        vn = n * sum(v * v for v in vals) - sum(vals) ** 2
        if vn > 0:
            usable.append((w, n, vn))
    out = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            zs = sum(
                round(1e6 * abs(q[(a, w)] - q[(b, w)]) * n / math.sqrt(vn))
                for w, n, vn in usable
            )
            out[(a, b)] = round(zs / 1e6 / len(usable), 6)
    return len(usable), out


def test_burrows_hand_computed(spark):
    corpus = [
        ("s1", "the cat and the dog and the bird"),
        ("s1", "the fish and the cat"),
        ("s2", "a cat a dog a mouse of things"),
        ("s2", "of mice and a man of sorts"),
        ("s3", "the dog and the dog and the dog"),
    ]
    k_eff, hand = _delta_hand(corpus, top_k=5)
    out = {
        (r.source_a, r.source_b): r
        for r in burrows_delta(_docs(spark, corpus), top_k=5).collect()
    }
    assert set(out) == set(hand)
    for pair, r in out.items():
        assert r.n_terms == k_eff
        assert r.delta == hand[pair]
    # s1 and s3 share the the/and function-word profile more than s2 does
    assert out[("s1", "s3")].delta < out[("s1", "s2")].delta


def test_burrows_identical_styles_near_zero(spark):
    corpus = [
        ("x", "alpha beta gamma alpha beta"),
        ("y", "alpha beta gamma alpha beta"),
        ("z", "gamma gamma gamma delta delta"),
    ]
    out = {
        (r.source_a, r.source_b): r.delta
        for r in burrows_delta(_docs(spark, corpus), top_k=4).collect()
    }
    assert out[("x", "y")] == 0.0
    assert out[("x", "z")] > 0.0


def test_burrows_zero_variance_terms_excluded(spark):
    # 'same' appears at the identical rate everywhere -> excluded
    corpus = [
        ("a", "same same one"),
        ("b", "same same two"),
    ]
    rows = burrows_delta(_docs(spark, corpus), top_k=3).collect()
    assert len(rows) == 1
    r = rows[0]
    # usable terms: 'one' and 'two' (each 1/3 vs 0); 'same' tied at 2/3
    assert r.n_terms == 2
    assert r.delta is not None and r.delta > 0
