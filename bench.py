"""Per-round benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": ..., plus engine-specific extras}.

Headline queries: the relational/kernel set from __spark_entry__ at
$SPARK_GRAFT_SF_DIR, plus the flagship ER pipeline (blocking -> candidate
pairs -> banded Myers scoring) on deterministic synthetic pages, reported
as candidate-pairs-scored/sec (the north metric).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ER_PAGES = int(os.environ.get("SASSY_BENCH_PAGES", "12000"))

BENCH_QUERIES = [
    "q02_agg_partial_final",
    "q06_window_top1",
    "q12_lag_window",
    "q13_edit_distance_adjacent",
    "q14_search_occurrences",
    "q15_ngram_jaccard",
    "q19_cosine_topk",
    "q20_minhash_near_dup",
    "q22_connected_components",
]


def main() -> None:
    import __spark_entry__ as E
    from sassy_spark import build_spark
    from sassy_spark.operators import linkage
    from sassy_spark.sources.pages import generate_pages

    spark = build_spark(app_name="sassy_bench", cores=CPUS)
    qs = E.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    # flagship: ER candidate scoring throughput on synthetic pages
    pages = generate_pages(spark, ER_PAGES, seed=42).drop("cluster_id")
    pages = pages.persist()
    n_pages = pages.count()
    t0 = time.time()
    scored = linkage.link(
        pages, k=None, k_frac=0.05
    )
    n_pairs = scored.count()
    er_sec = time.time() - t0
    timings["er_pipeline"] = round(er_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline queries + ER candidate scoring (total wall sec)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cpus": CPUS,
                "er_pages": n_pages,
                "er_candidate_pairs_scored": n_pairs,
                "er_pairs_per_sec": round(n_pairs / er_sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
