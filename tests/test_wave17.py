"""Wave-17 operators: PageRank-Nibble sweep cut, per-user transition
entropy, and the canonical text-normalization pass."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.functions.events import transition_entropy
from linkgraph_spark.functions.text import normalize_text
from linkgraph_spark.kernels.modularity import ppr_sweep


def _r(x: float, n: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), ROUND_HALF_UP))


# two 4-cliques joined by one bridge (3-4), bidirectional
_A = [(a, b) for a in range(4) for b in range(4) if a != b]
_B = [(a + 4, b + 4) for a, b in _A]
_BRIDGE = [(3, 4), (4, 3)]
_TWO_CLIQUES = _A + _B + _BRIDGE


def _ppr_ref(edges, seeds, iters, d=0.85):
    """Textbook personalized PageRank, engine-exact algebra:
    r0 = tele; r_k = tele·((1−d) + d·danglingmass) + d·gather."""
    edges = sorted({(s, t) for s, t in edges if s != t})
    verts = sorted({v for e in edges for v in e})
    out = {v: [] for v in verts}
    for s, t in edges:
        out[s].append(t)
    tele = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in verts}
    r = dict(tele)
    for _ in range(iters):
        dm = sum(r[v] for v in verts if not out[v])
        g = {v: 0.0 for v in verts}
        for u in verts:
            if out[u]:
                share = r[u] / len(out[u])
                for v in out[u]:
                    g[v] += share
    # noqa: E501 — single superstep body
        r = {v: tele[v] * ((1 - d) + d * dm) + d * g[v] for v in verts}
    return r


def _sweep_ref(edges, ranks, top_k):
    """Conductance sweep over the (rounded-rank, id)-ordered prefix."""
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    vol_g = 2 * len(und)
    order = sorted(ranks, key=lambda v: (-_r(ranks[v], 6), v))[:top_k]
    rows = []
    prefix = set()
    for pos, v in enumerate(order, start=1):
        prefix.add(v)
        vol = sum(deg.get(u, 0) for u in prefix)
        cut = sum(1 for a, b in und if (a in prefix) != (b in prefix))
        denom = min(vol, vol_g - vol)
        phi = _r(cut / denom, 6) if denom > 0 else None
        rows.append((pos, v, phi))
    return rows


def test_ppr_sweep_matches_reference_curve(spark):
    g = graph_from_edges(spark, _TWO_CLIQUES)
    got = [
        (r.pos, r.id, r.phi)
        for r in ppr_sweep(g, seeds=[0], iterations=8, top_k=8)
        .orderBy("pos")
        .collect()
    ]
    ranks = _ppr_ref(_TWO_CLIQUES, [0], 8)
    want = _sweep_ref(_TWO_CLIQUES, ranks, 8)
    assert [(p, i) for p, i, _ in got] == [(p, i) for p, i, _ in want]
    for (_, _, gphi), (_, _, wphi) in zip(got, want):
        assert gphi == pytest.approx(wphi, abs=2e-6)


def test_ppr_sweep_dips_at_community_boundary(spark):
    # once the prefix covers clique A exactly, only the bridge is cut:
    # phi = 1 / min(volA, volG - volA) = 1 / 13 — the curve minimum
    g = graph_from_edges(spark, _TWO_CLIQUES)
    rows = ppr_sweep(g, seeds=[0], iterations=8, top_k=8).collect()
    phis = {r.pos: r.phi for r in rows}
    ids_at_4 = {r.id for r in rows if r.pos <= 4}
    assert ids_at_4 == {0, 1, 2, 3}  # PPR ranks the seed's clique first
    assert phis[4] == pytest.approx(round(1 / 13, 6), abs=1e-9)
    assert phis[4] == min(p for p in phis.values() if p is not None)


def test_ppr_sweep_web_graph_reference(spark):
    from tests.fixtures_graphs import web64

    edges = web64(32, 2)
    g = graph_from_edges(spark, edges)
    got = [
        (r.pos, r.id, r.phi)
        for r in ppr_sweep(g, seeds=[0, 1], iterations=5, top_k=12)
        .orderBy("pos")
        .collect()
    ]
    want = _sweep_ref(edges, _ppr_ref(edges, [0, 1], 5), 12)
    assert [(p, i) for p, i, _ in got] == [(p, i) for p, i, _ in want]
    for (_, _, gphi), (_, _, wphi) in zip(got, want):
        assert gphi == pytest.approx(wphi, abs=2e-6)


# -------------------------------------------------------- transition entropy
def test_transition_entropy_loop_vs_silent(spark):
    rows = [
        # user 1: a->b->a->b within the gap: counts {ab:2, ba:1}
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "a"),
        (4, 1, "2024-01-01 00:03:00", "b"),
        # user 2: one event -> no transitions
        (5, 2, "2024-01-01 00:00:00", "a"),
        # user 3: two events separated by > gap -> chain broken
        (6, 3, "2024-01-01 00:00:00", "a"),
        (7, 3, "2024-01-02 00:00:00", "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.user_id: (r.n_trans, r.entropy)
        for r in transition_entropy(df, gap_sec=1800).collect()
    }
    h1 = round(math.log(3) - (2 * math.log(2)) / 3, 6)
    assert got == {1: (3, h1), 2: (0, 0.0), 3: (0, 0.0)}


def test_transition_entropy_uniform_is_log_n(spark):
    # four distinct transitions once each: H = ln 4
    rows = [
        (i, 1, f"2024-01-01 00:0{i}:00", t)
        for i, t in enumerate(["a", "b", "c", "d", "a"])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    (r,) = transition_entropy(df).collect()
    assert (r.n_trans, r.entropy) == (4, round(math.log(4), 6))


# ------------------------------------------------------------ normalize_text
def test_normalize_text_cases(spark):
    rows = [
        (1, "Hello  World"),
        (2, "\tTabs\nand\r\nnewlines  "),
        (3, "already clean"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.norm_text, r.n_norm_chars, r.changed)
        for r in normalize_text(df).collect()
    }
    assert got[1] == ("hello world", 11, True)
    assert got[2] == ("tabs and newlines", 17, True)
    assert got[3] == ("already clean", 13, False)
    assert got[4] == ("", 0, False)
    assert got[5] == ("", 0, False)
