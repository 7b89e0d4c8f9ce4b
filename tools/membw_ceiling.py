"""Memory-bandwidth scaling ceiling for this host.

`tools/cpu_ceiling.py` bounds what a cache-resident, compute-pure job
can measure at N→4N.  A DATA pipeline is not cache-resident: scans,
shuffles, and Arrow batches stream through DRAM, and on one box every
core shares the same memory controller.  This harness measures that
second, usually tighter bound: N concurrent processes (no Spark, no
IPC in the hot loop) each stream-sum a 256 MB float64 array — far
beyond L3 — and the aggregate GB/s at each level is the host's
deliverable bandwidth.  Efficiency (agg_4N / agg_N) / 4 is the best
N→4N scaling ANY bandwidth-bound stage can show here; on a real
cluster, 4× executors bring 4× memory controllers and this bound
does not apply.

Usage: python tools/membw_ceiling.py [levels...]   (default: 1 4)
Prints one JSON report with aggregate GB/s per level and all
N→4N efficiency pairs.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

MB = 256
SECONDS = 8.0


def _worker(q, barrier, seconds: float, mb: int) -> None:
    a = np.ones(mb * 1024 * 1024 // 8)
    float(a.sum())  # fault pages in before the barrier
    barrier.wait()
    t_end = time.perf_counter() + seconds
    n = 0
    while time.perf_counter() < t_end:
        float(a.sum())
        n += 1
    q.put(n * a.nbytes)


def measure(nproc: int, seconds: float = SECONDS, mb: int = MB) -> float:
    """Aggregate streamed GB/s across nproc concurrent processes."""
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(nproc)
    ps = [
        mp.Process(target=_worker, args=(q, barrier, seconds, mb))
        for _ in range(nproc)
    ]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds / 1e9


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 4]
    measure(1, seconds=2.0)  # warm-up, discarded
    gbs = {n: round(measure(n), 2) for n in levels}
    pairs = {
        f"{a}->{b}": round((gbs[b] / gbs[a]) / 4, 3)
        for a in levels
        for b in levels
        if b == 4 * a
    }
    print(
        json.dumps(
            {
                "array_mb": MB,
                "seconds_per_level": SECONDS,
                "aggregate_gb_per_sec": gbs,
                "n_to_4n_efficiency": pairs,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
