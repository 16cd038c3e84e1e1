"""Pure-CPU SMT-ceiling probe — no Spark, no I/O.

Measures aggregate arithmetic throughput at several worker counts to
establish what the HOST can scale to, independent of the engine. On
this sandbox the box advertises 32 CPUs but they are 16 physical cores
with 2-way SMT: going 8 -> 32 workers yields only ~2.4x aggregate
throughput, so an engine "scaling efficiency" computed across that
boundary measures hyperthread sharing, not the engine. BASELINE.md
cites this probe for the choice of local[2] -> local[8] as the N -> 4N
evidence pairing and for the SMT-normalized reading of the
local[8] -> local[32] pairing.

Usage:  python tools/cpu_probe.py [worker_counts...]   (default 1 2 8 32)
Prints one JSON line: {"per_level": {n: ops_per_sec}, "ratios": {...}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

SPIN_ITERS = 4_000_000


def _spin(_: int) -> float:
    """Fixed-work integer/float mix, ~0.5 s on an idle core."""
    t0 = time.perf_counter()
    acc = 0
    x = 1.0001
    for i in range(SPIN_ITERS):
        acc += i & 1023
        x *= 1.0000001
    dt = time.perf_counter() - t0
    # keep acc/x alive so the loop isn't elided
    return dt + (acc + x) * 0.0


def measure(n_workers: int, rounds: int = 3) -> float:
    """Aggregate ops/sec with n_workers concurrent spinners (min-of-rounds
    wall time — same noise model as bench.py: host load is additive)."""
    best_wall = float("inf")
    with mp.Pool(n_workers) as pool:
        pool.map(_spin, range(n_workers))  # warm fork/import
        for _ in range(rounds):
            t0 = time.perf_counter()
            pool.map(_spin, range(n_workers))
            best_wall = min(best_wall, time.perf_counter() - t0)
    return n_workers * SPIN_ITERS / best_wall


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 8, 32]
    per_level = {n: round(measure(n), 1) for n in levels}
    ratios = {}
    for lo in levels:
        for hi in levels:
            if hi == 4 * lo:
                ratios[f"{lo}->{hi}"] = round(per_level[hi] / per_level[lo], 3)
    print(json.dumps({"per_level": per_level, "ratios_4x": ratios}))


if __name__ == "__main__":
    main()
