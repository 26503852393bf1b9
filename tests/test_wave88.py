"""Wave-88 operators: bipartite butterfly counting over the conv×tool
graph (Sanei-Mehri, Sariyüce & Tirthapura, KDD 2018 — public algorithm)."""

from linkgraph_spark.transcripts import butterfly_stats, tool_butterflies


def _tc(spark, rows):
    # only (conv_id, tool) matter to the butterfly operators
    return spark.createDataFrame(rows, "conv_id string, tool string")


_ROWS = [
    ("c1", "A"),
    ("c1", "A"),  # duplicate invocation — must dedup to one bipartite edge
    ("c1", "B"),
    ("c2", "A"),
    ("c2", "B"),
    ("c3", "A"),
    ("c3", "B"),
    ("c3", "C"),
    ("c4", "C"),
    ("c4", None),  # null tool — dropped
]


def test_per_tool_butterflies_hand_counted(spark):
    # co(A,B)=3 -> C(3,2)=3 butterflies on A and B; C shares only single
    # convs with A/B (co=1 -> 0) but still appears via the tool spine.
    out = {r.tool: r.butterflies for r in tool_butterflies(_tc(spark, _ROWS)).collect()}
    assert out == {"A": 3, "B": 3, "C": 0}


def test_global_butterfly_stats_hand_counted(spark):
    row = butterfly_stats(_tc(spark, _ROWS)).collect()[0]
    assert row.n_edges == 8
    assert row.n_tools == 3
    assert row.n_convs == 4
    # wedges per conv: c1 C(2,2)=1, c2 1, c3 C(3,2)=3, c4 0
    assert row.n_wedges == 5
    assert row.n_butterflies == 3


def test_max_conv_tools_cap_drops_whole_conversation(spark):
    # cap=2 excises c3 (3 distinct tools) entirely: co(A,B) falls to 2
    # -> 1 butterfly; c4 (degree 1) survives so C stays in the spine.
    out = {
        r.tool: r.butterflies
        for r in tool_butterflies(_tc(spark, _ROWS), max_conv_tools=2).collect()
    }
    assert out == {"A": 1, "B": 1, "C": 0}
    row = butterfly_stats(_tc(spark, _ROWS), max_conv_tools=2).collect()[0]
    assert (row.n_edges, row.n_convs, row.n_wedges, row.n_butterflies) == (5, 3, 2, 1)


def test_empty_and_butterfly_free_graphs(spark):
    row = butterfly_stats(_tc(spark, [("c9", None)])).collect()[0]
    assert (row.n_edges, row.n_tools, row.n_convs, row.n_wedges, row.n_butterflies) == (
        0,
        0,
        0,
        0,
        0,
    )
    assert tool_butterflies(_tc(spark, [("c9", None)])).count() == 0
    # a star (one conv, many tools) has wedges but zero butterflies
    star = [("c1", t) for t in ("A", "B", "C", "D")]
    row = butterfly_stats(_tc(spark, star)).collect()[0]
    assert row.n_wedges == 6
    assert row.n_butterflies == 0


def test_butterfly_oracle_matches_duckdb(spark):
    import duckdb

    from linkgraph_spark.transcripts import butterfly_stats_sql, tool_butterflies_sql

    sdf = _tc(spark, _ROWS)
    pdf = sdf.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)

    got = sorted(
        (r.tool, r.butterflies) for r in tool_butterflies(sdf).collect()
    )
    want = sorted(
        map(tuple, con.execute("WITH " + tool_butterflies_sql("t")).fetchall())
    )
    assert got == want

    got1 = tuple(butterfly_stats(sdf).collect()[0])
    want1 = con.execute("WITH " + butterfly_stats_sql("t")).fetchall()[0]
    assert got1 == tuple(want1)

    # the capped variants stay oracle-equivalent too
    got2 = sorted(
        (r.tool, r.butterflies)
        for r in tool_butterflies(sdf, max_conv_tools=2).collect()
    )
    want2 = sorted(
        map(
            tuple,
            con.execute(
                "WITH " + tool_butterflies_sql("t", max_conv_tools=2)
            ).fetchall(),
        )
    )
    assert got2 == want2
