"""Deterministic fixture graphs (FIXTURES.md F2) — no RNG beyond fixed
arithmetic, no wall clock."""

TRI3 = [(0, 1), (1, 2), (2, 0)]

# hub 0 <- spokes 1..9, plus 0 -> 1
STAR10 = [(s, 0) for s in range(1, 10)] + [(0, 1)]

TWO_COMPS = TRI3 + [(10, 11), (11, 12)]

# dirty variant: self-loops + duplicate edges + a dangling pure source
DIRTY = TRI3 + [(0, 0), (1, 2), (1, 2), (7, 0)]


def web64(n: int = 64, m: int = 3, seed: int = 42):
    """Seeded Barabasi-style preferential-attachment digraph via a simple LCG.

    Each new vertex v (m..n-1) links to m targets drawn preferentially from
    the degree-weighted endpoint list — deterministic given the seed.
    """
    state = seed
    def lcg(bound):
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return state % bound

    endpoints = list(range(m))  # seed vertices
    edges = []
    for v in range(m, n):
        targets = set()
        while len(targets) < m:
            t = endpoints[lcg(len(endpoints))]
            if t != v:
                targets.add(t)
        for t in sorted(targets):
            edges.append((v, t))
            endpoints.extend([v, t])
    return edges
