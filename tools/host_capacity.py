"""Host CPU capacity curve — the measurement behind BASELINE.md's choice of
the 2→8-core window for N→4N scaling evidence.

Runs P independent busy-loop processes (no JVM, no shared state, no memory
traffic) and reports aggregate throughput per P.  If the host delivered P
dedicated cores, per-process throughput would be flat; on this sandbox it
drops sharply past ~8-12 processes (vCPU oversubscription), capping any
workload's 8→32 scaling efficiency at the printed hardware ratio.

Usage: python tools/host_capacity.py [seconds_per_level]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def burn(q, seconds: float):
    n = 0
    x = 1.0
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 + 0.1
        n += 10000
    q.put(n)


def measure(p: int, seconds: float) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=burn, args=(q, seconds)) for _ in range(p)]
    for pr in procs:
        pr.start()
    total = sum(q.get() for _ in procs)
    for pr in procs:
        pr.join()
    return total / seconds / 1e6


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    results = {}
    for p in (1, 2, 4, 8, 16, 32):
        results[p] = measure(p, seconds)
        print(f"procs={p:3d} total_mops={results[p]:8.1f} per_proc={results[p] / p:6.2f}")
    for lo, hi in ((2, 8), (8, 32)):
        if results.get(lo) and results.get(hi):
            eff = (results[hi] / results[lo]) / (hi / lo)
            print(f"hardware scaling {lo}->{hi}: {results[hi] / results[lo]:.2f}x "
                  f"(efficiency cap {eff:.2f})")


if __name__ == "__main__":
    main()
