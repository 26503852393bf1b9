"""Wave-105 operators: tail-head overlap (document seam detection) and
held-out add-1 unigram perplexity over the md5 doc split."""

import hashlib
import math

from linkgraph_spark.functions.dedup import tail_head_overlap
from linkgraph_spark.functions.text import heldout_perplexity

_SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _variant(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 2


def test_seam_max_k_and_direction(spark):
    rows = [
        (1, "aa bb cc dd ee"),       # tail: ... cc dd ee
        (2, "cc dd ee ff gg"),       # head: cc dd ee ...
        (3, "zz yy xx"),
    ]
    out = tail_head_overlap(_docs(spark, rows)).collect()
    assert [(r.doc_a, r.doc_b, r.overlap_tokens) for r in out] == [(1, 2, 3)]
    # direction matters: doc2's tail (ee ff gg) is NOT doc1's head


def test_seam_both_directions_reported(spark):
    rows = [(1, "xx yy aa bb"), (2, "aa bb xx yy")]
    out = {(r.doc_a, r.doc_b): r.overlap_tokens
           for r in tail_head_overlap(_docs(spark, rows)).collect()}
    assert out == {(1, 2): 2, (2, 1): 2}


def test_seam_matches_only_at_exact_overlap_length(spark):
    # a 6-token seam aligns ONLY at k=6: tail-4 of doc1 is t3..t6 while
    # head-4 of doc2 is t1..t4 — searching with max_k below the true
    # seam length finds nothing (a window contract, not a recall bug)
    shared = "t1 t2 t3 t4 t5 t6"
    rows = [(1, f"aa {shared}"), (2, f"{shared} zz")]
    full = tail_head_overlap(_docs(spark, rows), max_k=6).collect()
    assert [(r.doc_a, r.doc_b, r.overlap_tokens) for r in full] == [(1, 2, 6)]
    assert tail_head_overlap(_docs(spark, rows), max_k=4).count() == 0


def test_seam_hot_prefix_cap(spark):
    # a viral 2-token header shared by docs 2..5 is excised at cap 2
    rows = [(1, "qq rr hh kk")] + [
        (i, f"hh kk u{i} v{i}") for i in range(2, 6)
    ]
    uncapped = tail_head_overlap(_docs(spark, rows)).collect()
    assert len(uncapped) == 4  # doc1 -> each of 2..5
    capped = tail_head_overlap(_docs(spark, rows), max_doc_freq=2).collect()
    assert capped == []


def test_heldout_perplexity_hand_computed(spark):
    # force a known split: find one train doc id and one test doc id
    tr_id = next(i for i in range(1, 50) if _variant(i) == 0)
    te_id = next(i for i in range(1, 50) if _variant(i) == 1)
    rows = [(tr_id, "aa aa bb"), (te_id, "aa cc")]
    r = heldout_perplexity(_docs(spark, rows)).collect()[0]
    # train: T=3 tokens, V=2 types; test tokens: aa (c=2), cc (OOV, c=0)
    assert (r.n_train_tokens, r.n_test_tokens, r.vocab, r.n_oov) == (3, 2, 2, 1)
    assert r.oov_rate == 0.5
    u1 = round(-1e6 * math.log((2 + 1) / (3 + 2 + 1)))
    u2 = round(-1e6 * math.log((0 + 1) / (3 + 2 + 1)))
    assert r.avg_nll == round((u1 + u2) / 2e6, 6)
    assert r.ppl == round(math.exp((u1 + u2) / 2e6), 6)


def test_heldout_empty_half_is_null(spark):
    te_id = next(i for i in range(1, 50) if _variant(i) == 1)
    r = heldout_perplexity(_docs(spark, [(te_id, "aa bb")])).collect()[0]
    assert r.n_train_tokens == 0 and r.ppl is None and r.avg_nll is None
