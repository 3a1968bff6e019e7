"""Command-line interface — parity with the reference's CLI verbs.

    python -m sassy_spark search -p PATTERN [-p ...] -k 2 \
        --input texts.parquet --id-col doc_id --text-col text [--tsv]
    python -m sassy_spark filter -p PATTERN -k 2 --input ... [--invert] \
        --output kept.parquet
    python -m sassy_spark link --input pages.parquet --checkpoint CK \
        --output entities.parquet [--k-frac 0.05]

reference: `sassy search/grep/filter` (bin/grep.rs), TSV output contract
README.md:211-239. `link` is the engine's own pipeline verb.
"""

from __future__ import annotations

import argparse
import sys


def _read_texts(spark, args):
    from pyspark.sql import functions as F

    df = spark.read.parquet(args.input)
    return df.select(
        F.col(args.id_col).cast("string").alias("text_id"),
        F.col(args.text_col).alias("text"),
    )


def _patterns_df(spark, args):
    pats = list(args.pattern or [])
    if args.pattern_file:
        with open(args.pattern_file) as f:
            pats += [ln.strip() for ln in f if ln.strip()]
    if not pats:
        sys.exit("no patterns: use -p or --pattern-file")
    return spark.createDataFrame(
        [(f"p{i}", p) for i, p in enumerate(pats)], ["pat_id", "pattern"]
    )


def cmd_search(args) -> None:
    from sassy_spark.operators.search import search
    from sassy_spark.session import build_spark

    spark = build_spark(app_name="sassy_cli")
    m = search(
        _patterns_df(spark, args),
        _read_texts(spark, args),
        k=args.k,
        mode=args.mode,
        with_trace=not args.no_trace,
        case_sensitive=not args.ignore_case,
        rc=args.rc,
        profile=args.alphabet,
        alpha=args.alpha,
        max_overhang=args.max_overhang,
    )
    m = m.orderBy("text_id", "start", "pat_id")
    if args.output:
        if args.tsv:
            m.write.mode("overwrite").option("sep", "\t").option(
                "header", True
            ).csv(args.output)
        else:
            m.write.mode("overwrite").parquet(args.output)
    else:
        # reference TSV contract to stdout
        print("pat_id\ttext_id\tcost\tstrand\tstart\tend\tmatch_region\tcigar")
        for r in m.collect():
            print(
                "\t".join(
                    "" if v is None else str(v)
                    for v in (
                        r.pat_id,
                        r.text_id,
                        r.cost,
                        r.strand,
                        r.start,
                        r.end,
                        r.match_region,
                        r.cigar,
                    )
                )
            )
    spark.stop()


def cmd_crispr(args) -> None:
    from sassy_spark.operators.search import crispr_search, write_matches_tsv
    from sassy_spark.session import build_spark

    spark = build_spark(app_name="sassy_cli")
    m = crispr_search(
        _patterns_df(spark, args),
        _read_texts(spark, args),
        k=args.k,
        pam_length=args.pam_length,
        allow_pam_edits=args.allow_pam_edits,
        max_n_frac=args.max_n_frac,
        rc=not args.no_rc,
    )
    if args.output:
        write_matches_tsv(m, args.output)
    else:
        m.orderBy("text_id", "start").show(100, truncate=False)
    spark.stop()


def cmd_filter(args) -> None:
    from sassy_spark.operators.search import filter_matching, search
    from sassy_spark.session import build_spark

    spark = build_spark(app_name="sassy_cli")
    texts = _read_texts(spark, args)
    m = search(
        _patterns_df(spark, args),
        texts,
        k=args.k,
        mode="best",
        with_trace=False,
        case_sensitive=not args.ignore_case,
        rc=args.rc,
        profile=args.alphabet,
        alpha=args.alpha,
        max_overhang=args.max_overhang,
    )
    kept = filter_matching(texts, m, invert=args.invert)
    if args.output:
        kept.write.mode("overwrite").parquet(args.output)
        print(f"wrote {spark.read.parquet(args.output).count()} records")
    else:
        for r in kept.orderBy("text_id").collect():
            print(f"{r.text_id}\t{r.text}")
    spark.stop()


def cmd_link(args) -> None:
    # delegate to the spark-submit pipeline runner
    from sassy_spark import run_pipeline

    sys.argv = [
        "run_pipeline",
        "--output",
        args.output,
        "--checkpoint",
        args.checkpoint,
        "--k-frac",
        str(args.k_frac),
    ] + (["--input", args.input] if args.input else [])
    run_pipeline.main()


def main() -> None:
    ap = argparse.ArgumentParser(prog="sassy_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("-p", "--pattern", action="append")
        p.add_argument("--pattern-file")
        p.add_argument("-k", type=int, default=0)
        p.add_argument("--input", required=True)
        p.add_argument("--id-col", default="doc_id")
        p.add_argument("--text-col", default="text")
        p.add_argument("-i", "--ignore-case", action="store_true")
        p.add_argument("--rc", action="store_true")
        p.add_argument(
            "--alphabet",
            choices=["ascii", "dna", "iupac", "ascii_ci"],
            default="ascii",
            help="matching profile (reference: ASCII/DNA/IUPAC)",
        )
        p.add_argument(
            "--alpha", type=float, default=None,
            help="overhang cost per pattern char hanging over a text end",
        )
        p.add_argument("--max-overhang", type=int, default=None)
        p.add_argument("--output")

    s = sub.add_parser("search", help="report approximate matches (TSV)")
    common(s)
    s.add_argument(
        "--mode", choices=["local_minima", "all", "best"], default="local_minima"
    )
    s.add_argument("--no-trace", action="store_true")
    s.add_argument("--tsv", action="store_true")
    s.set_defaults(fn=cmd_search)

    f = sub.add_parser("filter", help="keep records with >=1 match")
    common(f)
    f.add_argument("--invert", action="store_true")
    f.set_defaults(fn=cmd_filter)

    c = sub.add_parser(
        "crispr", help="guide search with exact-PAM constraint (IUPAC)"
    )
    common(c)
    c.add_argument("--pam-length", type=int, default=3)
    c.add_argument("--allow-pam-edits", action="store_true")
    c.add_argument("--max-n-frac", type=float, default=None)
    c.add_argument("--no-rc", action="store_true")
    c.set_defaults(fn=cmd_crispr)

    l = sub.add_parser("link", help="full ER pipeline")
    l.add_argument("--input")
    l.add_argument("--output", required=True)
    l.add_argument("--checkpoint", required=True)
    l.add_argument("--k-frac", type=float, default=0.05)
    l.set_defaults(fn=cmd_link)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
