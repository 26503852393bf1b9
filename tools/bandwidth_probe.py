"""STREAM-style memory-bandwidth probe → evidence for BENCH/BASELINE.md.

Measures the box's aggregate memory bandwidth (GB/s) at a ladder of
process counts with a numpy triad (a[:] = b + s*c over arrays far larger
than LLC). If aggregate GB/s stops growing past K processes, any
memory-bound workload (like a shuffle-heavy PageRank superstep) cannot
scale past K threads ON THIS BOX — while a real cluster's 4N executors
bring 4x the memory channels. This is the calibration that separates
"the engine stops scaling" from "the box stops scaling".

Each worker is its own process (no GIL interaction); arrays are 256 MiB
per worker (≫ any cache); the triad runs for a fixed number of sweeps and
reports bytes moved / wall. Deterministic, no RNG.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

N = 32 * 1024 * 1024  # doubles per array → 256 MiB per array, 768 MiB/worker
SWEEPS = 8
LEVELS = [1, 2, 4, 8, 16, 32]


def _triad(barrier, q):
    import numpy as np

    a = np.zeros(N)
    b = np.full(N, 1.5)
    c = np.full(N, 2.5)
    # touch everything before timing
    a += b
    barrier.wait()  # all workers sweep CONCURRENTLY — the point of the probe
    for _ in range(SWEEPS):
        np.add(b, 3.0 * c, out=a)
    q.put(time.monotonic())


def measure(workers: int) -> float:
    """Aggregate GB/s = total bytes moved / global wall (barrier start →
    last finish). Summing per-worker rates would overstate whenever workers
    don't fully overlap (allocation stagger at high counts)."""
    barrier = mp.Barrier(workers + 1)
    q = mp.Queue()
    procs = [mp.Process(target=_triad, args=(barrier, q)) for _ in range(workers)]
    for p in procs:
        p.start()
    barrier.wait()
    t0 = time.monotonic()
    last_finish = max(q.get() for _ in procs)
    for p in procs:
        p.join()
    # triad moves 3 arrays x 8 bytes per element per sweep (2 reads + 1 write)
    return (workers * 3 * 8 * N * SWEEPS) / (last_finish - t0)


REPS = 3


def main():
    import statistics

    med, best = {}, {}
    for w in LEVELS:
        rates = sorted(measure(w) / 1e9 for _ in range(REPS))
        med[w] = round(statistics.median(rates), 1)
        best[w] = round(rates[-1], 1)  # noise only ever slows a run
        print(
            f"workers={w:3d}  aggregate median {med[w]:6.1f}  best {best[w]:6.1f} GB/s"
            f"  (n={REPS})",
            flush=True,
        )
    print(
        json.dumps(
            {
                "triad_gb_per_sec_median": med,
                "triad_gb_per_sec_best": best,
                "array_mib": N * 8 // (1 << 20),
            }
        )
    )


if __name__ == "__main__":
    main()
