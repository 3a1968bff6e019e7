"""Per-stage Spark-level scaling breakdown, 8 vs 32 cores.

The end-to-end Spark efficiency on this sandbox VM is fault-path bound
(see BENCH/BASELINE.md environment note); this tool shows WHICH stages
bind where, by timing each pipeline stage separately in its own JVM at
local[8] and local[32] on the same deterministic input:

  stage 1 blocking      — the sketch UDF scan (CPU-bound Python workers)
  stage 1.5 candidates  — self-join + dedup (shuffle-bound)
  stage 2 scoring       — text join + kernel UDF (CPU + one shuffle)

Prints one JSON line and appends a markdown table to BENCH/BASELINE.md.
Run: python tools/spark_stage_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sassy_spark import build_spark
from sassy_spark.sources.pages import generate_pages
from sassy_spark.operators import linkage

cores = {cores}
spark = build_spark(app_name=f"stage_scaling_{{cores}}", cores=cores)
pages = generate_pages(spark, {n_pages}, seed=42).drop("cluster_id").persist()
pages.count()

t = {{}}
t0 = time.time()
keys = linkage.blocking_keys(pages).persist()
n_keys = keys.count()
t["blocking"] = round(time.time() - t0, 2)

lens = pages.select("url", F.length("text").alias("len"))
t0 = time.time()
pairs = linkage.candidate_pairs(keys, lens=lens, k_frac=0.05).persist()
n_pairs = pairs.count()
t["candidates"] = round(time.time() - t0, 2)

t0 = time.time()
n_scored = linkage.score_pairs(pairs, pages, k=None, k_frac=0.05).count()
t["scoring"] = round(time.time() - t0, 2)

print("RESULT " + json.dumps({{
    "cores": cores, "pages": {n_pages}, "keys": n_keys,
    "pairs": n_pairs, "scored": n_scored, "stages": t,
}}))
spark.stop()
"""


def run_one(cores: int, n_pages: int) -> dict:
    code = RUNNER.format(repo=str(REPO), cores=cores, n_pages=n_pages)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT from cores={cores}: {p.stderr[-2000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    r8 = run_one(8, n_pages)
    r32 = run_one(32, n_pages)
    stages = {}
    for s in ("blocking", "candidates", "scoring"):
        eff = (r8["stages"][s] / r32["stages"][s]) / 4.0
        stages[s] = {
            "sec_8": r8["stages"][s],
            "sec_32": r32["stages"][s],
            "speedup": round(r8["stages"][s] / r32["stages"][s], 2),
            "efficiency": round(eff, 3),
        }
    out = {"n_pages": n_pages, "stages": stages}
    print(json.dumps(out))
    rows = "\n".join(
        f"| {s} | {v['sec_8']} | {v['sec_32']} | {v['speedup']}x | "
        f"{v['efficiency']:.3f} |"
        for s, v in stages.items()
    )
    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.write(
            f"\n## Spark per-stage scaling 8 vs 32 cores "
            f"{time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"{n_pages} pages, one JVM per measurement (separate "
            f"processes), stage outputs persisted so each stage is timed "
            f"in isolation:\n\n"
            f"| stage | sec @8 | sec @32 | speedup | efficiency |\n"
            f"|---|---|---|---|---|\n{rows}\n"
        )


if __name__ == "__main__":
    main()
