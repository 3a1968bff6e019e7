"""The `search` operator family — sassy's public semantics on DataFrames.

Reference parity (RagnarGrootKoerkamp/sassy):
  * ``search``            — Searcher::search / search_all / only_best_match
    (src/search.rs:510-525, 685-700, 442-445) as a DataFrame operator:
    patterns x texts -> match rows.
  * output schema         — the reference's TSV contract (README.md:211-239,
    bin/grep.rs:710-738): pat_id, text_id, cost, strand, start, end,
    match_region, cigar.
  * ``filter_matching``   — the `filter` subcommand (bin/grep.rs:589-622):
    emit records with >= 1 match; --invert = anti join.
  * ``cost_histogram``    — per-cost match counts (bin/grep.rs:309-328),
    partial/final agg.

Physical design (Spark-first, NOT a port): the pattern set is small
(like sassy's -p/-l/-f pattern sources) so it is *broadcast* to every
task; texts stream through ``mapInPandas`` in Arrow batches and the
numpy kernel advances all (pattern x text) lanes of a batch at once —
one scan of the text corpus total, no pattern x text shuffle. This is
the same shape as sassy v2's "one text pass, patterns in SIMD lanes"
(src/pattern_tiling/search.rs:326-445), realized with Spark's broadcast +
batch vectorization instead of AVX lanes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import myers

MATCH_SCHEMA = (
    "pat_id string, text_id string, cost int, strand string, "
    "start long, end long, match_region string, cigar string"
)


def search(
    patterns_df: DataFrame,
    texts_df: DataFrame,
    k: int,
    mode: str = "local_minima",
    with_trace: bool = True,
    case_sensitive: bool = True,
    rc: bool = False,
    pat_id: str = "pat_id",
    pattern: str = "pattern",
    text_id: str = "text_id",
    text: str = "text",
) -> DataFrame:
    """Approximate-occurrence search of every pattern in every text.

    mode: 'local_minima' (reference default search), 'all' (search_all),
    'best' (only_best_match). ``with_trace=False`` mirrors without_trace
    (src/search.rs:448-451): skips traceback, cigar/start/match_region null.
    ``rc=True`` also reports reverse-complement-strand matches
    (strand '-'): occurrences of revcomp(pattern), same text coordinates —
    the reference's search_handle_rc semantics (src/search.rs:787-881)
    realized as an extra broadcast lane instead of reversed-text machinery.
    """
    pats_local = [
        (str(r[0]), str(r[1]), "+")
        for r in patterns_df.select(pat_id, pattern).collect()
    ]
    if rc:
        from ..functions.text import reverse_complement_str

        pats_local += [
            (pid, reverse_complement_str(p), "-") for pid, p, _ in pats_local
        ]
    spark = texts_df.sparkSession
    bc = spark.sparkContext.broadcast(pats_local)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pats = bc.value
        pat_ids = [p[0] for p in pats]
        pat_strs = [p[1] for p in pats]
        strands = [p[2] for p in pats]
        if not case_sensitive:
            pat_strs = [p.lower() for p in pat_strs]
        for pdf in batches:
            tids = pdf[text_id].astype(str).to_numpy()
            txts = pdf[text].to_numpy()
            if not case_sensitive:
                txts = np.array([t.lower() for t in txts], dtype=object)
            n_t, n_p = len(txts), len(pat_strs)
            if n_t == 0 or n_p == 0:
                yield _empty_match_pdf()
                continue
            # batch layout: pattern-major lanes over the text batch
            rep_p = [p for p in pat_strs for _ in range(n_t)]
            rep_t = list(txts) * n_p
            res = myers.semiglobal_search(rep_p, rep_t, k, mode=mode)
            rows = []
            for lane, (ends, costs) in enumerate(res):
                if len(ends) == 0:
                    continue
                pi, ti = divmod(lane, n_t)
                orig_t = pdf[text].iloc[ti]
                for e, c in zip(ends.tolist(), costs.tolist()):
                    if with_trace:
                        start, cigar = myers.traceback(
                            pat_strs[pi], rep_t[lane], int(e), int(c)
                        )
                        region = orig_t[start:e]
                    else:
                        start, cigar, region = None, None, None
                    rows.append(
                        (
                            pat_ids[pi],
                            tids[ti],
                            int(c),
                            strands[pi],
                            start,
                            int(e),
                            region,
                            cigar,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "pat_id",
                    "text_id",
                    "cost",
                    "strand",
                    "start",
                    "end",
                    "match_region",
                    "cigar",
                ],
            ) if rows else _empty_match_pdf()

    from .linkage import _fan_out_small_input

    src = _fan_out_small_input(texts_df.select(text_id, text), text_id)
    return src.mapInPandas(run, schema=MATCH_SCHEMA)


def _empty_match_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "pat_id": pd.Series(dtype=object),
            "text_id": pd.Series(dtype=object),
            "cost": pd.Series(dtype="int32"),
            "strand": pd.Series(dtype=object),
            "start": pd.Series(dtype="float"),
            "end": pd.Series(dtype="int64"),
            "match_region": pd.Series(dtype=object),
            "cigar": pd.Series(dtype=object),
        }
    )


def filter_matching(
    texts_df: DataFrame,
    matches_df: DataFrame,
    invert: bool = False,
    text_id: str = "text_id",
) -> DataFrame:
    """Records with >= 1 match (semi join); invert -> records with none
    (anti join). Reference `filter` subcommand, bin/grep.rs:589-622."""
    how = "left_anti" if invert else "left_semi"
    keys = matches_df.select(text_id).distinct()
    return texts_df.join(keys, on=text_id, how=how)


def cost_histogram(matches_df: DataFrame) -> DataFrame:
    """Match count per edit cost 0..k — Spark's partial/final hash agg is
    the distributed analog of the reference's per-thread local histograms
    merged at the end (bin/grep.rs:515-580)."""
    return matches_df.groupBy("cost").agg(F.count("*").alias("n_matches")).orderBy("cost")


def best_match_per_pair(matches_df: DataFrame) -> DataFrame:
    """only_best_match as a relational op: min cost, rightmost end
    tie-break (reference src/search.rs:1403-1410) via min_by on a
    (cost, -end) sort key struct."""
    return matches_df.groupBy("pat_id", "text_id").agg(
        F.min("cost").alias("cost"),
        F.expr("max_by(end, struct(-cost, end))").alias("end"),
    )
