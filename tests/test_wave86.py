"""Wave-86 operator: TextRank keyword extraction."""

from linkgraph_spark.functions.text import term_pagerank


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_textrank_hub_term_outranks_leaves(spark):
    # 'hub' co-occurs with every leaf; leaves only with the hub — the
    # star center must rank first
    docs = _docs(
        spark,
        ["hub alpha", "hub beta", "hub gamma", "hub delta"],
    )
    rows = term_pagerank(docs, top_n=10).collect()
    assert rows[0].term == "hub"
    leaves = {r.term: r.rank for r in rows[1:]}
    assert set(leaves) == {"alpha", "beta", "gamma", "delta"}
    # symmetric leaves tie exactly (same rounded rank)
    assert len(set(leaves.values())) == 1
    # probability mass conserved (no dangling leak on the symmetrized graph)
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-4


def test_textrank_ranks_by_structure_not_raw_frequency(spark):
    # 'filler' repeats many times but only ever next to itself-adjacent
    # 'x'; 'bridge' connects two otherwise separate cliques
    docs = _docs(
        spark,
        [
            "x filler x filler x filler x filler",
            "a bridge b",
            "c bridge d",
            "a b",
            "c d",
        ],
    )
    rows = term_pagerank(docs, top_n=10).collect()
    by = {r.term: r.rank for r in rows}
    assert by["bridge"] > by["filler"] * 0.9  # bridge is structurally central


def test_textrank_self_loops_dropped(spark):
    docs = _docs(spark, ["same same same other"])
    rows = term_pagerank(docs, top_n=10).collect()
    # graph is just same<->other: two vertices, equal rank
    assert {r.term for r in rows} == {"same", "other"}
    assert len({r.rank for r in rows}) == 1
