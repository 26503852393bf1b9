"""Wave-155 operator: structural-role clustering (ReFeX-style features +
the deterministic Lloyd kernel)."""

import itertools
import math

import pytest

from linkgraph_spark.edges import graph_from_edges
from linkgraph_spark.kernels.stats import struct_roles


def _features(edges):
    out_d, in_d, ud, adj = {}, {}, {}, {}
    und = set()
    for a, b in edges:
        if a == b:
            continue
        out_d[a] = out_d.get(a, 0) + 1
        in_d[b] = in_d.get(b, 0) + 1
        und.add((min(a, b), max(a, b)))
    for a, b in und:
        ud[a] = ud.get(a, 0) + 1
        ud[b] = ud.get(b, 0) + 1
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tv = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                tv[v] = tv.get(v, 0) + 1
    verts = sorted(set(out_d) | set(in_d) | set(ud))
    f = {}
    for v in verts:
        d = ud.get(v, 0)
        f[v] = [
            math.log(1.0 + out_d.get(v, 0)),
            math.log(1.0 + in_d.get(v, 0)),
            math.log(1.0 + tv.get(v, 0)),
            math.log(1.0 + d * (d - 1) / 2),
        ]
    return f


def _lloyd_ref(f, k, iterations):
    cents = {j: list(f[j]) for j in range(k)}

    def assign():
        out = {}
        for v, x in f.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(x, cents[j])), j)
                for j in range(k)
            )
            out[v] = best
        return out

    for _ in range(iterations):
        asg = assign()
        sums = {j: [0.0] * 4 for j in range(k)}
        counts = {j: 0 for j in range(k)}
        for v, (_, j) in asg.items():
            counts[j] += 1
            for i in range(4):
                sums[j][i] += f[v][i]
        for j in range(k):
            if counts[j]:
                cents[j] = [s / counts[j] for s in sums[j]]
    return {v: (j, round(s, 6)) for v, (s, j) in assign().items()}


def test_struct_roles_match_reference_lloyd(spark):
    # a hub-and-spoke glued to a triangle pod and a chain: distinct
    # structural signatures
    edges = (
        [(0, i) for i in range(1, 6)]          # hub 0 with 5 leaves
        + [(6, 7), (7, 8), (8, 6)]             # triangle pod
        + [(2, 9), (9, 10), (10, 11)]          # chain
        + [(3, 6)]                             # connect
    )
    got = {
        r.id: (r.role, r.sqdist)
        for r in struct_roles(graph_from_edges(spark, edges), k=3).collect()
    }
    want = _lloyd_ref(_features(edges), 3, 4)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0], v
        assert got[v][1] == pytest.approx(want[v][1], abs=2e-6)


def test_struct_roles_separate_hub_from_leaves_and_pod(spark):
    edges = [(0, i) for i in range(1, 8)] + [(10, 11), (11, 12), (12, 10)]
    got = {
        r.id: r.role
        for r in struct_roles(graph_from_edges(spark, edges), k=3).collect()
    }
    leaf_roles = {got[i] for i in range(2, 8)}
    assert len(leaf_roles) == 1  # all leaves share a role
    assert got[0] not in leaf_roles  # the hub does not
    pod_roles = {got[i] for i in (10, 11, 12)}
    assert len(pod_roles) == 1 and pod_roles != leaf_roles  # pod is its own
