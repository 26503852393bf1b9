"""Wave-91 operator: duplicate-span localization — maximal runs of
consecutive aligned word-3-gram shingles between document pairs
(gaps-and-islands over a shared-shingle equi-join; substring-dedup
motivation of Lee et al. 2022)."""

from linkgraph_spark.functions.dedup import dup_spans

_SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_single_shared_span_hand_computed(spark):
    # 5-token shared run "the quick brown fox jumps" = 3 consecutive shingles
    rows = [
        (1, "the quick brown fox jumps over"),
        (2, "yesterday the quick brown fox jumps away"),
    ]
    out = dup_spans(_docs(spark, rows), min_run=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # doc1 shingles at p=1..4; doc2 at p=2..5 ("the quick brown" is p=1 vs 2)
    assert (r.start_a, r.start_b) == (1, 2)
    assert r.match_len == 3  # shingles: the-quick-brown, quick-brown-fox, brown-fox-jumps
    assert r.span_tokens == 5


def test_two_islands_same_pair(spark):
    # shared prefix (4 tokens) and shared suffix (4 tokens), different offsets
    rows = [
        (1, "alpha beta gamma delta XX epsilon zeta eta theta"),
        (2, "alpha beta gamma delta YY ZZ epsilon zeta eta theta"),
    ]
    out = sorted(
        dup_spans(_docs(spark, rows), min_run=2).collect(),
        key=lambda r: r.start_a,
    )
    assert len(out) == 2
    assert (out[0].start_a, out[0].start_b, out[0].match_len) == (1, 1, 2)
    assert out[0].span_tokens == 4
    # suffix: doc1 p=6..7, doc2 p=7..8 (offset -1), 2 shingles = 4 tokens
    assert (out[1].start_a, out[1].start_b, out[1].match_len) == (6, 7, 2)
    assert out[1].span_tokens == 4


def test_min_run_filters_short_matches(spark):
    # only one shared shingle -> run length 1 < min_run=2 -> no row
    rows = [
        (1, "aa bb cc xx yy"),
        (2, "zz aa bb cc qq"),
    ]
    assert dup_spans(_docs(spark, rows), min_run=2).count() == 0
    # but min_run=1 surfaces it
    r = dup_spans(_docs(spark, rows), min_run=1).collect()
    assert len(r) == 1 and r[0].match_len == 1 and r[0].span_tokens == 3


def test_normalization_case_and_whitespace(spark):
    rows = [
        (1, "  The   QUICK brown fox  "),
        (2, "the quick brown fox"),
    ]
    r = dup_spans(_docs(spark, rows), min_run=2).collect()
    assert len(r) == 1 and r[0].match_len == 2 and r[0].span_tokens == 4


def test_short_docs_skipped(spark):
    # <3 tokens hosts no 3-gram: exact dedup owns those
    rows = [(1, "aa bb"), (2, "aa bb"), (3, "aa bb cc dd"), (4, "aa bb cc dd")]
    out = dup_spans(_docs(spark, rows), min_run=2).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(3, 4)]
    assert out[0].match_len == 2 and out[0].span_tokens == 4


def test_hot_shingle_cap_drops_stopword_fanout(spark):
    # a shingle present in all 4 docs is excised under max_doc_freq=2;
    # the unique 4-shingle run between docs 1-2 survives (split not needed
    # here: the hot shingle is outside the run)
    hot = "of the and"
    rows = [
        (1, f"uniq1 uniq2 uniq3 uniq4 uniq5 uniq6 {hot}"),
        (2, f"uniq1 uniq2 uniq3 uniq4 uniq5 uniq6 {hot}"),
        (3, f"xx yy {hot} zz"),
        (4, f"pp qq {hot} rr"),
    ]
    capped = dup_spans(_docs(spark, rows), min_run=2, max_doc_freq=2)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (1, 2) in got
    assert (3, 4) not in got  # their only shared shingles were the hot ones


def test_offset_diagonals_do_not_merge(spark):
    # doc2 repeats the doc1 phrase twice -> two distinct alignment offsets,
    # each its own island (not one merged run)
    rows = [
        (1, "mm nn oo pp"),
        (2, "mm nn oo pp qq mm nn oo pp"),
    ]
    out = sorted(
        dup_spans(_docs(spark, rows), min_run=2).collect(),
        key=lambda r: r.start_b,
    )
    assert [(r.start_a, r.start_b, r.match_len) for r in out] == [
        (1, 1, 2),
        (1, 6, 2),
    ]
