import math

import pytest

from linkgraph_spark.edges import build_graph, graph_from_edges
from linkgraph_spark.kernels import pagerank
from linkgraph_spark.transcripts import synthesize_transcripts
from tests.fixtures_graphs import DIRTY, STAR10, TRI3, TWO_COMPS, web64
from tests.oracles import clean, pagerank_compat, pagerank_textbook


def ranks_dict(result):
    return {r["id"]: r["rank"] for r in result.ranks.collect()}


def assert_close(got, want, tol=1e-6):
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=tol), (v, got[v], want[v])


@pytest.mark.parametrize("edges", [TRI3, STAR10, TWO_COMPS, DIRTY, web64()],
                         ids=["tri3", "star10", "two_comps", "dirty", "web64"])
def test_compat_matches_reference_oracle(spark, edges):
    g = graph_from_edges(spark, edges)
    res = pagerank(g, mode="compat")
    assert res.iterations == 3
    assert_close(ranks_dict(res), pagerank_compat(edges))
    g.unpersist()


@pytest.mark.parametrize("edges", [TRI3, STAR10, web64()], ids=["tri3", "star10", "web64"])
def test_textbook_matches_power_iteration(spark, edges):
    g = graph_from_edges(spark, edges)
    res = pagerank(g, mode="textbook")
    want, _ = pagerank_textbook(edges)
    assert res.converged
    assert_close(ranks_dict(res), want, tol=1e-5)
    g.unpersist()


def test_tri3_closed_form(spark):
    g = graph_from_edges(spark, TRI3)
    res = pagerank(g, mode="textbook")
    got = ranks_dict(res)
    for v in (0, 1, 2):
        assert math.isclose(got[v], 1.0 / 3.0, abs_tol=1e-6)
    g.unpersist()


def test_rank_mass_conserved_textbook(spark):
    g = graph_from_edges(spark, web64())
    res = pagerank(g, mode="textbook", iterations=5)
    total = sum(ranks_dict(res).values())
    assert math.isclose(total, 1.0, abs_tol=1e-9)
    g.unpersist()


def test_compat_on_transcript_graph(spark):
    t = synthesize_transcripts(spark, n_convs=8, min_turns=3, max_turns=10)
    g = build_graph(t)
    edge_pairs = [(r["src"], r["dst"]) for r in g.edges.collect()]
    assert edge_pairs, "tiny transcript graph should produce edges"
    res = pagerank(g, mode="compat")
    assert_close(ranks_dict(res), pagerank_compat(edge_pairs))
    g.unpersist()


def test_salting_and_hub_broadcast_do_not_change_results(spark):
    edges = web64(n=48)
    g = graph_from_edges(spark, edges)
    base = ranks_dict(pagerank(g, mode="textbook", iterations=8, use_hub_broadcast=False))
    from linkgraph_spark.config import EngineConfig

    cfg = EngineConfig(hub_degree_threshold=3, salt_buckets=4)
    hub = ranks_dict(
        pagerank(
            g, mode="textbook", iterations=8, config=cfg,
            use_hub_broadcast=True, use_salting=True,
        )
    )
    assert_close(hub, base, tol=1e-12)
    g.unpersist()


def test_personalized_pagerank(spark):
    from tests.oracles import pagerank_personalized

    edges = web64(n=40)
    g = graph_from_edges(spark, edges)
    sources = [0, 1, 2]
    res = pagerank(g, mode="textbook", personalize_ids=sources)
    want, _ = pagerank_personalized(edges, sources)
    assert res.converged
    assert_close(ranks_dict(res), want, tol=1e-5)
    g.unpersist()


def test_weighted_pagerank_on_transcripts(spark):
    from linkgraph_spark.edges import build_graph
    from linkgraph_spark.transcripts import synthesize_transcripts
    from tests.oracles import pagerank_weighted

    t = synthesize_transcripts(spark, n_convs=25, min_turns=3, max_turns=15)
    g = build_graph(t, weighted=True)
    wedges = [(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()]
    assert any(w > 1 for _, _, w in wedges), "fixture should have multi-edges"
    res = pagerank(g, mode="weighted")
    want, _ = pagerank_weighted(wedges)
    assert res.converged
    assert_close(ranks_dict(res), want, tol=1e-5)
    g.unpersist()


def test_big_state_plan_regime_value_equal(spark):
    """The >5M-edge plan regime (AQE off, auto-broadcast off, pinned
    shuffle-hash gather + shuffle-hash apply join) is normally only hit by
    bench-scale graphs, so no oracle exercises it. Force it on the sf0.001
    fixture and assert both join regimes produce identical values for
    compat + textbook PageRank and connected components."""
    from linkgraph_spark.kernels import connected_components
    from linkgraph_spark.transcripts import transcripts_from_events

    g = build_graph(transcripts_from_events(spark, "/root/testdata/sf0.001"))

    for mode, iters in (("compat", None), ("textbook", 5)):
        small = ranks_dict(pagerank(g, mode=mode, iterations=iters))
        big = ranks_dict(
            pagerank(g, mode=mode, iterations=iters, force_big_state=True)
        )
        assert set(small) == set(big)
        for v in small:  # float sums reorder across join plans → tolerance
            assert math.isclose(small[v], big[v], rel_tol=0, abs_tol=1e-12), v

    lab_small = {
        r["id"]: r["component"] for r in connected_components(g).labels.collect()
    }
    lab_big = {
        r["id"]: r["component"]
        for r in connected_components(g, force_big_state=True).labels.collect()
    }
    assert lab_small == lab_big  # integer labels: exact
    g.unpersist()


def test_profile_stage_breakdown(spark):
    """profile=True adds per-stage superstep timings (the reference's
    per-vertex get/rank/put observability, pagerank.py:93-99)."""
    from linkgraph_spark.edges import graph_from_edges
    from tests.fixtures_graphs import web64

    g = graph_from_edges(spark, web64())
    res = pagerank(g, mode="textbook", iterations=2, profile=True)
    assert len(res.metrics) == 2
    for m in res.metrics:
        assert set(m["stage_sec"]) == {"gather", "gather_agg"}
        assert all(v >= 0 for v in m["stage_sec"].values())
    # default path records no stage breakdown (one job per superstep)
    res2 = pagerank(g, mode="textbook", iterations=1)
    assert "stage_sec" not in res2.metrics[0]
    g.unpersist()


def test_pagerank_warm_start_incremental(spark):
    # real pipeline: converge on day-1 transcripts, then one more
    # conversation arrives. Ids shift across rebuilds (sorted-rank
    # assignment), so the warm vector crosses via actor_key (remap_ranks);
    # warm re-convergence starts log(dist_cold/dist_warm)/log(1/d)
    # supersteps ahead of a cold uniform start (the slow eigenmode decays
    # at d per superstep for BOTH — the head start is the whole win) and
    # lands on the same fixpoint.
    from linkgraph_spark.kernels.pagerank import remap_ranks

    g1 = build_graph(synthesize_transcripts(spark, n_convs=100, hub_turns=300))
    cold1 = pagerank(g1, mode="textbook")
    assert cold1.converged

    # warm start on the SAME graph: residual already under tol
    warm_same = pagerank(g1, mode="textbook", init_ranks=cold1.ranks)
    assert warm_same.converged and warm_same.iterations <= 2

    g2 = build_graph(synthesize_transcripts(spark, n_convs=101, hub_turns=300))
    cold2 = pagerank(g2, mode="textbook")
    warm2 = pagerank(
        g2, mode="textbook", init_ranks=remap_ranks(g1, cold1.ranks, g2)
    )
    assert warm2.converged and cold2.converged
    assert warm2.iterations < cold2.iterations
    a = {r["id"]: r["rank"] for r in cold2.ranks.collect()}
    b = {r["id"]: r["rank"] for r in warm2.ranks.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[i] - b[i]) < 1e-5 for i in a)

    with pytest.raises(ValueError):
        pagerank(g1, mode="textbook", init_ranks=cold1.ranks, resume=True)
    with pytest.raises(ValueError):
        pagerank(g1, mode="compat", init_ranks=cold1.ranks)
    for gg in (g1, g2):
        gg.unpersist()
