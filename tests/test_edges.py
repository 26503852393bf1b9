from pyspark.sql import functions as F

from linkgraph_spark.edges import (
    assign_actor_ids,
    build_graph,
    clean_edges,
    derive_edge_keys,
)
from linkgraph_spark.transcripts import synthesize_transcripts


def test_transcript_schema_and_determinism(spark):
    t1 = synthesize_transcripts(spark, n_convs=8, min_turns=3, max_turns=10)
    t2 = synthesize_transcripts(spark, n_convs=8, min_turns=3, max_turns=10)
    assert t1.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,tool:string,ts:timestamp>"
    )
    rows1 = sorted(t1.collect())
    rows2 = sorted(t2.collect())
    assert rows1 == rows2
    # turn_idx dense and unique per conv
    per_conv = {}
    for r in rows1:
        per_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for turns in per_conv.values():
        assert sorted(turns) == list(range(len(turns)))


def test_text_equality_invariant(spark):
    """Every transcript row's text survives the pipeline byte-identical under
    stable (conv_id, turn_idx) ordering (input_hint invariant)."""
    t = synthesize_transcripts(spark, n_convs=20, min_turns=2, max_turns=12)
    before = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.orderBy("conv_id", "turn_idx").collect()
    ]
    g = build_graph(t)  # run the full derivation — must not mutate its input
    g.edges.count()
    after = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.orderBy("conv_id", "turn_idx").collect()
    ]
    assert before == after
    assert all(x[2] == f"{x[0]}:{x[1]}:" + x[2].split(":", 2)[2] for x in after)
    g.unpersist()


def test_cleaning_semantics(spark):
    t = synthesize_transcripts(spark, n_convs=12, min_turns=3, max_turns=12)
    cleaned = clean_edges(derive_edge_keys(t))
    rows = cleaned.collect()
    pairs = [(r["src_key"], r["dst_key"]) for r in rows]
    assert len(pairs) == len(set(pairs)), "dedup failed"
    assert all(s != d for s, d in pairs), "self-loop survived"


def test_id_assignment_is_sorted_rank(spark):
    t = synthesize_transcripts(spark, n_convs=30, min_turns=2, max_turns=20)
    cleaned = clean_edges(derive_edge_keys(t))
    ids = assign_actor_ids(cleaned, num_partitions=5).collect()
    by_key = sorted(ids, key=lambda r: r["actor_key"])
    assert [r["id"] for r in by_key] == list(range(len(ids)))


def test_id_assignment_parallelism_invariant(spark):
    t = synthesize_transcripts(spark, n_convs=30, min_turns=2, max_turns=20)
    cleaned = clean_edges(derive_edge_keys(t))
    a = {r["actor_key"]: r["id"] for r in assign_actor_ids(cleaned, num_partitions=2).collect()}
    b = {r["actor_key"]: r["id"] for r in assign_actor_ids(cleaned, num_partitions=7).collect()}
    assert a == b


def test_tool_edges_present(spark):
    t = synthesize_transcripts(spark, n_convs=50, min_turns=2, max_turns=30)
    raw = derive_edge_keys(t)
    kinds = {r["kind"] for r in raw.select("kind").distinct().collect()}
    assert kinds == {"adjacent_turn", "tool_invocation"}
    tool_dsts = (
        raw.where(F.col("kind") == "tool_invocation").select("dst_key").distinct().collect()
    )
    assert all(r["dst_key"].startswith("tool:") for r in tool_dsts)


def test_hub_fixture_has_hub(spark):
    t = synthesize_transcripts(spark, n_convs=20, min_turns=2, max_turns=10, hub_turns=500)
    g = build_graph(t)
    hub_key = "convhub#assistant"
    hub_deg = (
        g.degrees.join(g.vertices, "id").where(F.col("actor_key") == hub_key).collect()
    )
    assert hub_deg and hub_deg[0]["out_deg"] >= 1  # dedup collapses repeats
    search = g.vertices.where(F.col("actor_key") == "tool:search")
    assert search.count() == 1
    g.unpersist()


def test_cli_weighted_and_personalized(spark, tmp_path, capsys):
    """The spark-submit entry point exposes weighted mode and
    --personalize-ids (previously unreachable from the CLI)."""
    import json

    from linkgraph_spark.cli import main

    rc = main(
        [
            "pagerank", "--synthetic-convs", "40", "--mode", "weighted",
            "--iterations", "2", "--output", str(tmp_path / "wr"),
        ]
    )
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    assert json.loads(out)["iterations"] == 2
    rc = main(
        [
            "pagerank", "--synthetic-convs", "40", "--personalize-ids", "0,1,2",
            "--iterations", "2", "--output", str(tmp_path / "pr"),
        ]
    )
    assert rc == 0


def test_cli_round3_kernels(spark, tmp_path, capsys):
    """Every round-3 kernel is reachable from the spark-submit entry point
    and reports its summary contract."""
    import json

    from linkgraph_spark.cli import main

    def run(*argv):
        rc = main(list(argv) + ["--synthetic-convs", "40", "--output",
                                str(tmp_path / argv[0])])
        assert rc == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        )

    assert run("scc")["converged"]
    assert run("ktruss", "--k", "3")["converged"]
    s = run("betweenness", "--n-samples", "4")
    assert s["sources"] == 4 and s["converged"]
    assert run("hyperball", "--max-r", "4")["iterations"] >= 1
    st = run("stats")
    assert "reciprocity" in st and "assortativity" in st
    assert run("node2vec", "--walk-length", "2")["corpus_rows"] > 0


def test_cli_wave13_kernels(spark, tmp_path, capsys):
    """The wave-13 graph kernels are reachable from the spark-submit
    entry point and report their summary contracts."""
    import json

    from linkgraph_spark.cli import main

    def run(*argv):
        rc = main(list(argv) + ["--synthetic-convs", "40", "--output",
                                str(tmp_path / argv[0])])
        assert rc == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        )

    bt = run("bowtie")
    assert bt["converged"] and sum(bt["categories"].values()) > 0
    sm = run("spammass", "--sources", "0,1", "--iterations", "2")
    assert sm["trusted_seeds"] == [0, 1]
    assert run("contract")["contracted_edges"] > 0


def test_cli_wave16_17_kernels(spark, tmp_path, capsys):
    """simrank / ballsizes / pprsweep are reachable from the spark-submit
    entry point and report their summary contracts."""
    import json

    from linkgraph_spark.cli import main

    def run(*argv):
        rc = main(list(argv) + ["--synthetic-convs", "40", "--output",
                                str(tmp_path / argv[0])])
        assert rc == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        )

    sr = run("simrank", "--iterations", "2")
    assert sr["pairs"] > 0 and sr["iterations"] == 2
    bs = run("ballsizes")
    assert bs["vertices"] > 0 and bs["max_ball2"] >= 1
    ps = run("pprsweep", "--sources", "0", "--top-k", "10")
    assert ps["seeds"] == [0] and ps["best_cut"]["phi"] is not None


def test_cli_wave29_33_kernels(spark, tmp_path, capsys):
    """heat / hitprob / coreprofile / paradox / huboverlap are reachable
    from the spark-submit entry point and report their summary contracts."""
    import json

    from linkgraph_spark.cli import main

    def run(*argv):
        rc = main(list(argv) + ["--synthetic-convs", "40", "--output",
                                str(tmp_path / argv[0])])
        assert rc == 0
        return json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        )

    hk = run("heat", "--iterations", "4")
    assert hk["terms"] == 4 and hk["mass"] > 0
    hp = run("hitprob", "--sources", "0,1", "--iterations", "3")
    assert hp["seeds"] == [0, 1] and hp["reached"] >= 2
    assert run("coreprofile")["shells"] >= 1
    pd = run("paradox")
    assert 0.0 <= pd["paradox_frac"] <= 1.0
    assert run("huboverlap", "--top-k", "5")["pairs"] == 10
