"""Kernel-level scaling evidence: the Myers scoring kernel run in N
independent processes (no JVM, no shuffle) on identical synthetic pair
workloads — isolates the ALGORITHM's scaling from this sandbox VM's
serialized page-fault path (see BENCH/BASELINE.md). Prints one JSON line
and appends to BENCH/BASELINE.md."""

import json
import multiprocessing as mp
import os
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")


def work(args):
    seed, n_pairs = args
    import numpy as np

    from sassy_spark.kernel.myers import banded_edit_distances

    rng = random.Random(seed)
    words = [
        "".join(rng.choice("abcdefghij") for _ in range(rng.randrange(2, 11)))
        for _ in range(1000)
    ]

    def doc():
        return " ".join(rng.choice(words) for _ in range(rng.randrange(40, 600)))

    def mut(s, e):
        s = list(s)
        for _ in range(e):
            op = rng.choice("ids")
            if op == "i":
                s.insert(rng.randrange(len(s) + 1), "x")
            elif op == "d" and s:
                del s[rng.randrange(len(s))]
            elif s:
                s[rng.randrange(len(s))] = "y"
        return "".join(s)

    a_l, b_l, k_l = [], [], []
    for _ in range(n_pairs):
        a = doc()
        b = mut(a, rng.randrange(0, 30)) if rng.random() < 0.5 else doc()
        a_l.append(a)
        b_l.append(b)
        k_l.append(int(-(-0.05 * max(len(a), len(b)) // 1)))
    order = sorted(range(n_pairs), key=lambda i: len(b_l[i]))
    a_l = [a_l[i] for i in order]
    b_l = [b_l[i] for i in order]
    karr = np.array([k_l[i] for i in order])
    t = time.time()
    for lo in range(0, n_pairs, 512):
        banded_edit_distances(a_l[lo : lo + 512], b_l[lo : lo + 512], karr[lo : lo + 512])
    return n_pairs / (time.time() - t)


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    out = {}
    for n in (8, 32):
        with mp.Pool(n) as p:
            t = time.time()
            rates = p.map(work, [(100 + i, n_pairs) for i in range(n)])
            wall = time.time() - t
        out[f"procs_{n}"] = {
            "aggregate_pairs_per_sec": round(n * n_pairs / wall, 1),
            "per_proc_pairs_per_sec": round(sum(rates) / len(rates), 1),
        }
    eff = (
        out["procs_32"]["aggregate_pairs_per_sec"]
        / out["procs_8"]["aggregate_pairs_per_sec"]
    ) / 4.0
    out["kernel_scaling_efficiency_8_to_32"] = round(eff, 3)
    print(json.dumps(out))
    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.write(
            f"\n## Kernel scaling run {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"Myers scoring kernel, {n_pairs} pairs/proc, no JVM:\n\n"
            f"| procs | aggregate pairs/s | per-proc pairs/s |\n|---|---|---|\n"
            f"| 8  | {out['procs_8']['aggregate_pairs_per_sec']} | {out['procs_8']['per_proc_pairs_per_sec']} |\n"
            f"| 32 | {out['procs_32']['aggregate_pairs_per_sec']} | {out['procs_32']['per_proc_pairs_per_sec']} |\n\n"
            f"**Kernel scaling efficiency 8 -> 32: {eff:.3f}**\n"
        )


if __name__ == "__main__":
    main()
