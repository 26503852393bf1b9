"""Wave-111 operator: full-document containment via the dup-spans
gaps-and-islands machinery (Lee et al. 2022 substring-dedup verdict)."""

from linkgraph_spark.functions.dedup import contained_docs

_SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_containment_direction_and_size(spark):
    rows = [
        (1, "bb cc dd"),                       # 3 tokens, inside doc 2
        (2, "aa bb cc dd ee"),                 # host
        (3, "zz yy xx ww"),                    # unrelated
    ]
    out = contained_docs(_docs(spark, rows)).collect()
    assert [(r.inner_doc, r.outer_doc, r.n_tokens_inner) for r in out] == [
        (1, 2, 3)
    ]


def test_partial_overlap_is_not_containment(spark):
    # docs share a 3-token run but neither contains the other
    rows = [(1, "aa bb cc dd"), (2, "bb cc dd ee")]
    assert contained_docs(_docs(spark, rows)).count() == 0


def test_exact_duplicates_contain_each_other(spark):
    rows = [(1, "aa bb cc dd"), (2, "aa bb cc dd")]
    out = {(r.inner_doc, r.outer_doc)
           for r in contained_docs(_docs(spark, rows)).collect()}
    assert out == {(1, 2), (2, 1)}  # honest both-ways verdict


def test_interrupted_match_is_not_containment(spark):
    # doc 1's shingles all appear in doc 2 but NOT as one aligned run
    rows = [(1, "aa bb cc dd ee"), (2, "aa bb cc XX cc dd ee")]
    out = contained_docs(_docs(spark, rows)).collect()
    assert out == []


def test_higher_direction_wins_when_host_is_prefix_extension(spark):
    # inner at the END of the host (offset alignment != 0)
    rows = [(1, "cc dd ee"), (2, "aa bb cc dd ee")]
    out = contained_docs(_docs(spark, rows)).collect()
    assert [(r.inner_doc, r.outer_doc) for r in out] == [(1, 2)]
