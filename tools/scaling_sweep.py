"""8→32 scaling-efficiency conf sweep (round-3 verdict item #10).

Round 2 established eff(8→32) ≈ 0.42-0.45 and attributed the gap to the
shared-host memory system (bandwidth probe + pure-CPU calibration in
BENCH/BASELINE.md). This sweep asks the remaining question: is ANY of that
gap engine-recoverable via session tuning? Each variant runs the identical
20M-edge probe job (tools/scaling_job.py) at local[8] then local[32]
BACK-TO-BACK in fresh JVMs (same-session pairing is the only way to get an
attributable ratio on this 3-4x-noise box — see BENCH/BASELINE.md) and
reports steady-state throughput at both plus eff = (eps32/eps8)/4.

Variants: off-heap memory, bigger shuffle buffers, shuffle-partition
multiples of the core count. Appends raw records to
BENCH/scaling_sweep_r3.jsonl and the base pair to BENCH/scaling_r3.jsonl
(picked up by bench.py's scaling evidence).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

VARIANTS = [
    ("base", {}, 1),
    (
        "offheap16g",
        {
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "16g",
        },
        1,
    ),
    (
        "bigbuf",
        {
            "spark.shuffle.file.buffer": "1m",
            "spark.reducer.maxSizeInFlight": "96m",
            "spark.shuffle.unsafe.file.output.buffer": "1m",
        },
        1,
    ),
    ("sp2x", {}, 2),  # shuffle partitions = 2 x cores
    ("sp4x", {}, 4),
]


def run_level(cpus: int, iters: int, conf: dict, sp_mult: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_PROBE_CONF"] = json.dumps(conf)
    env["SPARK_GRAFT_PROBE_SHUFFLE"] = str(max(cpus * sp_mult, 2))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling_job.py"), str(cpus), str(iters)],
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    iters = int(os.environ.get("SPARK_GRAFT_SCALING_ITERS", "10"))
    only = set(sys.argv[1:])  # optionally sweep a subset by name
    sweep_path = os.path.join(REPO, "BENCH", "scaling_sweep_r3.jsonl")
    pairs_path = os.path.join(REPO, "BENCH", "scaling_r3.jsonl")
    summary = {}
    for name, conf, sp_mult in VARIANTS:
        if only and name not in only:
            continue
        seq = 0
        if os.path.exists(sweep_path):  # unique run id per repeated pair
            with open(sweep_path) as fh:
                seq = sum(json.loads(l).get("variant") == name for l in fh) // 2
        pair = {}
        for cpus in (8, 32):  # back-to-back: the only attributable pairing
            r = run_level(cpus, iters, conf, sp_mult)
            r["variant"] = name
            r["run"] = f"r3_{name}_{seq}"
            pair[cpus] = r
            with open(sweep_path, "a") as fh:
                fh.write(json.dumps(r) + "\n")
        eff = round(
            pair[32]["steady_edges_scattered_per_sec"]
            / pair[8]["steady_edges_scattered_per_sec"]
            / 4.0,
            3,
        )
        summary[name] = {
            "eps8": pair[8]["steady_edges_scattered_per_sec"],
            "eps32": pair[32]["steady_edges_scattered_per_sec"],
            "eff_8_to_32": eff,
        }
        print(json.dumps({name: summary[name]}), flush=True)
        if name == "base":
            with open(pairs_path, "a") as fh:
                for r in pair.values():
                    fh.write(json.dumps(r) + "\n")
    print(json.dumps({"sweep": summary}))


if __name__ == "__main__":
    main()
