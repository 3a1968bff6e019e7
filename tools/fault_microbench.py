"""Page-fault serialization microbenchmark — reproduces the environment
note in BENCH/BASELINE.md.

Each worker mmaps an anonymous region and touches one byte per 4 KiB
page (pure first-touch faults, no compute). On a healthy kernel the
per-proc rate is flat with concurrency; on this sandbox VM it collapses
~70x between 8 and 32 concurrent workers, which is the mechanism that
caps Spark-level (JVM shuffle buffer / page-cache / worker heap) scaling
while leaving arena-reusing numpy compute unaffected.

Run: python tools/fault_microbench.py [mb_per_proc]
Prints one JSON line: per-proc and aggregate MB/s at 1, 8, 32 procs.
"""

from __future__ import annotations

import json
import mmap
import multiprocessing as mp
import statistics
import sys
import time


def _worker(barrier, q, n_bytes: int):
    barrier.wait()
    t0 = time.time()
    m = mmap.mmap(-1, n_bytes)
    step = 4096
    for off in range(0, n_bytes, step):
        m[off] = 1  # first touch: one minor fault per page
    t1 = time.time()
    m.close()
    q.put((t0, t1, n_bytes))


def measure(n_procs: int, mb: int) -> dict:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_procs)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(barrier, q, mb << 20))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    res = [q.get() for _ in range(n_procs)]
    for p in procs:
        p.join()
    per = [r[2] / (r[1] - r[0]) / (1 << 20) for r in res]
    wall = max(r[1] for r in res) - min(r[0] for r in res)
    return {
        "procs": n_procs,
        "per_proc_mb_s": round(statistics.median(per), 1),
        "aggregate_mb_s": round(n_procs * mb / wall, 1),
    }


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    out = {"mb_per_proc": mb, "runs": [measure(n, mb) for n in (1, 8, 32)]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
