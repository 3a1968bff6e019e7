"""Round-6 optimization harness (bench.py is FROZEN — this file carries
the extra measurements the optimization guide §1 asks for).

Usage:
    python bench_extra.py q22_connected_components q116_qgram_count_join \
        [--reps 2] [--sink count|noop] [--plan plans/r06 --suffix before] \
        [--sf /root/testdata/sf0.1] [--warmup]

Times each named query in isolation (same `.count()` methodology as the
frozen bench.py by default; `--sink noop` forces every column instead),
optionally writing `.explain("formatted")` output to
plans/r06/<query>_<suffix>.txt. Also accepts the pseudo-query
`er_pipeline` (the bench's flagship linkage stage at
$SASSY_BENCH_PAGES pages, default 12000).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sink", choices=["count", "noop"], default="count")
    ap.add_argument("--plan", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warmup", action="store_true",
                    help="one untimed sf0.001 pass per query first")
    args = ap.parse_args()

    import __spark_entry__ as E
    from sassy_spark import build_spark

    spark = build_spark(app_name="bench_extra")
    qs = E.queries()
    out: dict = {"sf": args.sf, "sink": args.sink, "timings": {}}

    def run_one(name: str, sf: str) -> None:
        if name == "er_pipeline":
            from sassy_spark.operators import linkage
            from sassy_spark.sources.pages import generate_pages

            n = int(os.environ.get("SASSY_BENCH_PAGES", "12000"))
            pages = generate_pages(spark, n, seed=42).drop("cluster_id")
            pages = pages.persist()
            pages.count()
            df = linkage.link(pages, k=None, k_frac=0.05)
        else:
            E._Q22_LABEL_MEMO.clear()
            df = qs[name](spark, sf)
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        if name == "er_pipeline":
            pages.unpersist()

    for name in args.queries:
        if args.warmup:
            spark.sparkContext.setJobDescription(f"warmup {name}")
            try:
                run_one(name, "/root/testdata/sf0.001")
            except Exception as exc:  # noqa: BLE001
                print(f"warmup {name}: {exc}", file=sys.stderr)
        if args.plan and name != "er_pipeline":
            E._Q22_LABEL_MEMO.clear()
            plan_dir = Path(args.plan)
            plan_dir.mkdir(parents=True, exist_ok=True)
            try:
                txt = qs[name](spark, args.sf)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception:  # noqa: BLE001 — fall back to captured stdout
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    qs[name](spark, args.sf).explain("formatted")
                txt = buf.getvalue()
            (plan_dir / f"{name}_{args.suffix}.txt").write_text(txt)
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra {name}")
            t0 = time.time()
            run_one(name, args.sf)
            samples.append(round(time.time() - t0, 3))
        out["timings"][name] = {"min": min(samples), "samples": samples}
        print(f"{name}: {samples} -> {min(samples)}", flush=True)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
