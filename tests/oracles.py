"""NumPy / pure-Python oracles (FIXTURES.md F3).

The compat oracle transliterates the reference's per-page math
(``pagerank_lambda/dynamodb/pagerank.py:71-88``; init/constants
``dynamodb/driver.py:113,124,127-135,157-159``) with snapshot-read (Jacobi)
superstep semantics — the well-defined barrier-per-iteration execution the
Spark engine implements. (The reference's actual Lambda run is barrier-free
and therefore nondeterministic; SURVEY.md §2.4 quirk 2 pins the oracle to
the synchronous schedule.)
"""

from collections import Counter, defaultdict


def clean(edges):
    """Reference ETL cleaning: drop self-loops, dedup (init_to_s3.py:63-76)."""
    seen = set()
    out = []
    for s, d in edges:
        if s is None or d is None or s == d or (s, d) in seen:
            continue
        seen.add((s, d))
        out.append((s, d))
    return out


def pagerank_compat(edges, n_iters=3, d=0.8):
    """Reference-compat PageRank: divisor = contributor's in-degree-or-1,
    remain=(1-d)/N, init 1/N, fixed iterations, only destinations updated."""
    edges = clean(edges)
    nodes = sorted({u for e in edges for u in e})
    in_nbrs = defaultdict(list)
    for s, t in edges:
        in_nbrs[t].append(s)
    relation_length = {v: (len(in_nbrs[v]) if in_nbrs[v] else 1) for v in nodes}
    n = len(nodes)
    remain = (1.0 - d) / n
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iters):
        new = dict(rank)
        for v in nodes:
            if in_nbrs[v]:
                s = sum(rank[u] / relation_length[u] for u in in_nbrs[v])
                new[v] = d * s + remain
        rank = new
    return rank


def pagerank_textbook(edges, d=0.85, tol=1e-6, max_iters=200):
    """Textbook power iteration: out-degree divisor, dangling mass
    redistributed uniformly, run to L-inf residual < tol."""
    edges = clean(edges)
    nodes = sorted({u for e in edges for u in e})
    out_deg = Counter(s for s, _ in edges)
    in_nbrs = defaultdict(list)
    for s, t in edges:
        in_nbrs[t].append(s)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    iters = 0
    for _ in range(max_iters):
        iters += 1
        dangling = sum(rank[v] for v in nodes if out_deg[v] == 0)
        base = (1.0 - d) / n + d * dangling / n
        new = {}
        for v in nodes:
            s = sum(rank[u] / out_deg[u] for u in in_nbrs[v])
            new[v] = base + d * s
        resid = max(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if resid < tol:
            break
    return rank, iters


def components_oracle(edges):
    """Union-find; labels = min member id per component."""
    edges = clean(edges)
    nodes = sorted({u for e in edges for u in e})
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in edges:
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    return {v: find(v) for v in nodes}


def labelprop_oracle(edges, max_iters=5):
    """Synchronous LPA, mode of undirected neighbor labels, ties → min."""
    edges = clean(edges)
    nodes = sorted({u for e in edges for u in e})
    nbrs = defaultdict(set)
    for s, t in edges:
        nbrs[s].add(t)
        nbrs[t].add(s)
    label = {v: v for v in nodes}
    for _ in range(max_iters):
        new = {}
        for v in nodes:
            if not nbrs[v]:
                new[v] = label[v]
                continue
            freq = Counter(label[u] for u in nbrs[v])
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        label = new
    return label


def triangles_oracle(edges):
    """Exact triangle count on the undirected simple graph."""
    edges = clean(edges)
    und = set()
    for s, t in edges:
        und.add((min(s, t), max(s, t)))
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    count = 0
    for a, b in und:
        count += len([c for c in nbrs[a] & nbrs[b] if c > b])
    return count


def pagerank_weighted(weighted_edges, d=0.85, tol=1e-6, max_iters=200):
    """Weighted textbook PageRank: contrib = rank * w / total outgoing w."""
    nodes = sorted({u for (s, t, w) in weighted_edges for u in (s, t)})
    w_out = defaultdict(float)
    in_nbrs = defaultdict(list)
    for s, t, w in weighted_edges:
        w_out[s] += w
        in_nbrs[t].append((s, w))
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    iters = 0
    for _ in range(max_iters):
        iters += 1
        dangling = sum(rank[v] for v in nodes if w_out[v] == 0)
        base = (1.0 - d) / n + d * dangling / n
        new = {}
        for v in nodes:
            s = sum(rank[u] * w / w_out[u] for u, w in in_nbrs[v])
            new[v] = base + d * s
        resid = max(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if resid < tol:
            break
    return rank, iters


def pagerank_personalized(edges, sources, d=0.85, tol=1e-6, max_iters=200):
    """Personalized PageRank: teleport mass on `sources`; dangling mass
    redistributes along the same teleport vector."""
    edges = clean(edges)
    nodes = sorted({u for e in edges for u in e})
    out_deg = Counter(s for s, _ in edges)
    in_nbrs = defaultdict(list)
    for s, t in edges:
        in_nbrs[t].append(s)
    tele = {v: (1.0 / len(sources) if v in set(sources) else 0.0) for v in nodes}
    rank = dict(tele)
    iters = 0
    for _ in range(max_iters):
        iters += 1
        dangling = sum(rank[v] for v in nodes if out_deg[v] == 0)
        new = {}
        for v in nodes:
            s = sum(rank[u] / out_deg[u] for u in in_nbrs[v])
            new[v] = tele[v] * ((1.0 - d) + d * dangling) + d * s
        resid = max(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if resid < tol:
            break
    return rank, iters
