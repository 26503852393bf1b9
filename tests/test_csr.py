import math

from linkgraph_spark.config import EngineConfig
from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels import pagerank
from tests.fixtures_graphs import web64
from tests.oracles import pagerank_compat


def test_csr_gather_matches_builtin(spark):
    edges = web64(n=48)
    g = graph_from_edges(spark, edges)
    cfg = EngineConfig(block_width=8)
    builtin = {
        r["id"]: r["rank"]
        for r in pagerank(g, mode="compat", config=cfg).ranks.collect()
    }
    csr = {
        r["id"]: r["rank"]
        for r in pagerank(g, mode="compat", config=cfg, gather_mode="csr").ranks.collect()
    }
    want = pagerank_compat(edges)
    for v in want:
        assert math.isclose(csr[v], want[v], abs_tol=1e-9)
        assert math.isclose(csr[v], builtin[v], abs_tol=1e-12)
    g.unpersist()


def test_csr_textbook_converges(spark):
    g = graph_from_edges(spark, web64(n=32))
    cfg = EngineConfig(block_width=4)
    res = pagerank(g, mode="textbook", config=cfg, gather_mode="csr")
    assert res.converged
    total = sum(r["rank"] for r in res.ranks.collect())
    assert math.isclose(total, 1.0, abs_tol=1e-9)
    g.unpersist()
