"""Pairwise string-similarity operators beyond edit distance.

Jaro-Winkler is the classic record-linkage similarity for short
identifying fields (person/org names, titles, URL slugs) — transposition
tolerant with a common-prefix boost. Damerau-Levenshtein is the
transposition-tolerant typo distance. Both complement the Myers
edit-distance kernel (`operators/linkage.score_pairs`): run them on a
short extracted field as cheap second scorers or tie-breaking features
next to `normalized_cost`.

Scale notes (100 TB audit):
- each similarity is a SCALAR pandas UDF over two already-joined short
  string columns; the only exchanges are ONE narrow pre-score
  repartition of the pairs (1 task/core — blocked joins upstream can
  leave every candidate pair in one partition and single-thread the
  kernel; see _score_pairs_on_field) plus the two field-attachment
  joins, whose fields side is narrow (url + a <=64-char slice), so
  Catalyst broadcasts it at any realistic dimension size and
  sort-merges correctly beyond that;
- the kernels are batch-vectorized numpy over byte matrices
  (`kernel/jaro.py`, `kernel/damerau.py`); the UDFs chunk each Arrow
  batch so the working-set matrices stay cache-resident regardless of
  Arrow's batch sizing.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Bound the (rows x len x len) work matrices: 2048 rows x 64 x 64 bytes
# ~ 8 MB per boolean matrix for JW — cache-friendly, mirrors the Myers
# kernel's 1 MiB task-batch bound rationale. Damerau keeps an int32 DP
# tensor of the same shape family, so it chunks 4x smaller.
_CHUNK_ROWS = 2048


def _chunked_series(kernel: Callable, out_dtype, chunk_rows: int):
    """Wrap a bytes-batch kernel as a two-Series function: encode str ->
    UTF-8 (None and non-str -> b''), run the kernel per chunk."""

    def run(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        n = len(a)
        out = np.zeros(n, dtype=out_dtype)
        av = a.to_numpy(dtype=object)
        bv = b.to_numpy(dtype=object)
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            ab = [
                x.encode("utf-8") if isinstance(x, str) else b""
                for x in av[lo:hi]
            ]
            bb = [
                x.encode("utf-8") if isinstance(x, str) else b""
                for x in bv[lo:hi]
            ]
            out[lo:hi] = kernel(ab, bb)
        return pd.Series(out)

    return run


def _jw_series(a: pd.Series, b: pd.Series) -> pd.Series:
    from sassy_spark.kernel.jaro import jaro_winkler_batch

    return _chunked_series(jaro_winkler_batch, "float64", _CHUNK_ROWS)(a, b)


def _dl_series(a: pd.Series, b: pd.Series) -> pd.Series:
    from sassy_spark.kernel.damerau import damerau_levenshtein_batch

    return _chunked_series(
        damerau_levenshtein_batch, "int64", max(_CHUNK_ROWS // 4, 1)
    )(a, b)


def _score_pairs_on_field(
    pairs: DataFrame,
    fields: DataFrame,
    url: str,
    field_col: str,
    out_col: str,
    series_fn: Callable,
    return_ddl: str,
    score_partitions: int | None = None,
) -> DataFrame:
    """Attach a short field to both sides of each pair (LEFT joins — a
    pair whose url is missing from fields is KEPT and scores against the
    empty string, same as a present-but-NULL field) and append the
    kernel's score column.

    The joined frame is hash-repartitioned to ``score_partitions``
    (default: 1 task/core) AFTER the field joins, immediately before
    the kernel UDF: a blocked equi-join upstream routinely leaves ALL
    candidate pairs in a handful of partitions (measured: q68's 599k
    nation-blocked pairs in ONE partition — the kernel ran
    single-threaded, 5.8s instead of ~1s), and even a pre-join fan-out
    dies whenever the fields side is too big to broadcast (the
    sort-merge ENSURE_REQUIREMENTS exchanges re-key it and AQE then
    coalesces the narrow post-join output BY BYTES — wrong for a
    CPU-bound kernel stage). Unlike linkage.score_pairs (2 KB text
    payloads, where the exchange must happen pre-join), these rows
    carry only short fields, so one post-join exchange is the cheap,
    plan-shape-independent guarantee. REPARTITION_BY_NUM is exempt
    from AQE coalescing, so the task count holds.
    ``score_partitions=0`` inherits the upstream partitioning (no
    exchange).
    """
    if score_partitions is None:
        score_partitions = (
            pairs.sparkSession.sparkContext.defaultParallelism
        )
    f = fields.select(F.col(url), F.col(field_col).alias("_f"))
    df = pairs.join(
        f.select(F.col(url).alias("url_a"), F.col("_f").alias("_fa")),
        "url_a",
        "left",
    ).join(
        f.select(F.col(url).alias("url_b"), F.col("_f").alias("_fb")),
        "url_b",
        "left",
    )
    if score_partitions:
        df = df.repartition(
            score_partitions, F.col("url_a"), F.col("url_b")
        )
    # the pandas_udf is created lazily: decorating at module level would
    # parse the return-type DDL, which needs an active SparkContext and
    # breaks plain `import sassy_spark.operators.strsim` before a
    # session exists
    udf = pandas_udf(series_fn, return_ddl)
    return df.withColumn(out_col, udf(F.col("_fa"), F.col("_fb"))).drop(
        "_fa", "_fb"
    )


def jaro_winkler_pairs(
    pairs: DataFrame,
    fields: DataFrame,
    url: str = "url",
    field_col: str = "field",
    out_col: str = "jw",
    score_partitions: int | None = None,
) -> DataFrame:
    """Score candidate pairs with Jaro-Winkler on a short field.

    pairs:  (url_a, url_b [, ...carried columns])
    fields: (url, field) — one short string per record (pre-slice long
            text upstream; JW on multi-KB bodies is the wrong tool, use
            score_pairs / MinHash for those).

    Returns pairs with ``out_col`` (double in [0, 1]) appended. Missing
    or NULL fields score as the empty string (JW = 0.0 against anything
    non-empty).
    """
    return _score_pairs_on_field(
        pairs, fields, url, field_col, out_col, _jw_series, "double",
        score_partitions=score_partitions,
    )


def damerau_pairs(
    pairs: DataFrame,
    fields: DataFrame,
    url: str = "url",
    field_col: str = "field",
    out_col: str = "dl",
    score_partitions: int | None = None,
) -> DataFrame:
    """Unrestricted Damerau-Levenshtein distance on a short field per
    candidate pair (kernel/damerau.py — transposition-tolerant typo
    distance). Same join shape and scale properties as
    jaro_winkler_pairs; missing or NULL fields score as the empty string
    (distance = other side's byte length)."""
    return _score_pairs_on_field(
        pairs, fields, url, field_col, out_col, _dl_series, "long",
        score_partitions=score_partitions,
    )


def affine_gap_pairs(
    pairs: DataFrame,
    fields: DataFrame,
    url: str = "url",
    field_col: str = "field",
    out_col: str = "aff",
    sub: int = 2,
    gap_open: int = 3,
    gap_extend: int = 1,
    score_partitions: int | None = None,
) -> DataFrame:
    """Affine-gap (Gotoh 1982) alignment distance on a short field per
    candidate pair: a gap of length L costs ``gap_open + L *
    gap_extend``, a substitution ``sub`` — the record-linkage distance
    for fields differing by a missing WORD (dropped middle name, elided
    street suffix) rather than scattered typos, which Levenshtein
    over-penalizes at cost L. Kernel: kernel/gotoh.py, the three-matrix
    minimal-cost recurrence vectorized across the pair axis with
    rolling rows (fuzz-pinned to a scalar DP in tests/test_strsim.py).
    Same join shape and 100 TB scale properties as jaro_winkler_pairs;
    missing or NULL fields score as the empty string (distance =
    gap_open + gap_extend * other side's byte length)."""

    def series(a: pd.Series, b: pd.Series) -> pd.Series:
        from sassy_spark.kernel.gotoh import affine_gap_batch

        def kernel(ab, bb):
            return affine_gap_batch(
                ab, bb, sub=sub, gap_open=gap_open, gap_extend=gap_extend
            )

        return _chunked_series(kernel, "int64", max(_CHUNK_ROWS // 4, 1))(
            a, b
        )

    return _score_pairs_on_field(
        pairs, fields, url, field_col, out_col, series, "long",
        score_partitions=score_partitions,
    )


# Monge-Elkan caps: 12 tokens per side bounds the flattened token-pair
# batch at 144 JW evaluations per row; chunking at _CHUNK_ROWS//4 rows
# keeps each kernel call <= ~74k short-token pairs.
_ME_MAX_TOKENS = 12
_ME_TOKEN_RE = r"[a-z0-9]+"


def _me_series(a: pd.Series, b: pd.Series) -> pd.Series:
    """Quantized Monge-Elkan over two short-field Series.

    Monge-Elkan (Monge & Elkan 1996) is the classic hybrid tokenized
    similarity for multi-token identifying fields:

        ME(A, B) = mean over tokens ta of A of  max over tb of B  JW(ta, tb)

    Quantization contract (what makes this exactly oracle-able): each
    per-token max-JW is floored to integer MICROS before the mean, and
    the mean is integer floor-division by the token count —

        me_qmicros = ( sum_i floor(1e6 * max_j JW(ta_i, tb_j)) ) // |A|

    max over float64 is exact and the per-pair JW doubles are already
    bit-pinned to DuckDB's builtin (tests/test_kernel_hypothesis.py), so
    every arithmetic step after the kernel is exact integer math on both
    engines — no float-summation-order hazard in the mean. Empty token
    lists on either side score 0.
    """
    import re

    import numpy as np

    from sassy_spark.kernel.jaro import jaro_winkler_batch

    tok = re.compile(_ME_TOKEN_RE)
    n = len(a)
    out = np.zeros(n, dtype=np.int64)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    step = max(_CHUNK_ROWS // 4, 1)

    def toks(x):
        if not isinstance(x, str):
            return []
        return tok.findall(x.lower())[:_ME_MAX_TOKENS]

    for lo in range(0, n, step):
        hi = min(lo + step, n)
        ta = [toks(x) for x in av[lo:hi]]
        tb = [toks(x) for x in bv[lo:hi]]
        flat_a: list[bytes] = []
        flat_b: list[bytes] = []
        seg: list[int] = []  # flattened (row, token_i) segment id
        seg_row: list[int] = []  # chunk-local row of each segment
        nseg = 0
        for r, (xs, ys) in enumerate(zip(ta, tb)):
            if not xs or not ys:
                continue
            for x in xs:
                xb = x.encode("ascii")
                for y in ys:
                    flat_a.append(xb)
                    flat_b.append(y.encode("ascii"))
                    seg.append(nseg)
                seg_row.append(r)
                nseg += 1
        if nseg == 0:
            continue
        jw = jaro_winkler_batch(flat_a, flat_b)
        tokmax = np.zeros(nseg, dtype=np.float64)
        np.maximum.at(tokmax, np.asarray(seg, dtype=np.int64), jw)
        tmic = np.floor(tokmax * 1e6).astype(np.int64)
        row_sum = np.zeros(hi - lo, dtype=np.int64)
        np.add.at(row_sum, np.asarray(seg_row, dtype=np.int64), tmic)
        n_a = np.fromiter(
            (len(xs) if xs and ys else 0 for xs, ys in zip(ta, tb)),
            dtype=np.int64,
            count=hi - lo,
        )
        scored = n_a > 0
        res = np.zeros(hi - lo, dtype=np.int64)
        res[scored] = row_sum[scored] // n_a[scored]
        out[lo:hi] = res
    return pd.Series(out)


def soft_tfidf_pairs(
    pairs: DataFrame,
    fields: DataFrame,
    url: str = "url",
    field_col: str = "field",
    out_col: str = "stfidf_q",
    theta_q4: int = 9000,
    max_tokens: int = 16,
    idf_scale: int = 100,
    idf_cap: int = 1_000_000,
) -> DataFrame:
    """Quantized soft-TF-IDF (Cohen, Ravikumar & Fienberg 2003) — the
    hybrid scorer that beat both plain TF-IDF and plain edit distance
    on name-matching benchmarks: corpus-weighted token overlap where
    tokens need not match EXACTLY, only with Jaro-Winkler >= theta.

        score(A, B) = sum over tokens w of A with best-JW >= theta of
                      V(w, A) * V(v*, B) * JW(w, v*),
        v* = the argmax-JW token of B for w

    Exact-integer variant (what makes it hash-oracle-able in DuckDB,
    same contract family as q74's Monge-Elkan):
      - SET token semantics: lowercase [a-z0-9]+ runs, distinct, sorted,
        first ``max_tokens`` (binary tf — fields are short identifying
        strings where repeated tokens are rare);
      - integer IDF: widf(t) = min(idf_cap, (N * idf_scale) // df(t))
        with N = corpus row count and df from the SAME capped token
        sets — exact integer division on both engines, saturating at
        idf_cap so the per-term product widf*widf*jwq4 stays < 2^60
        regardless of corpus size (no BIGINT overflow at any N);
      - JW floored to ten-thousandths (jwq4) straight off the kernel
        doubles, which are bit-pinned to DuckDB's builtin;
      - deterministic argmax: max over the lexicographic struct
        (jwq4, widf_v, v) — identical struct-comparison semantics in
        Spark and DuckDB;
      - no vector normalization (the classic formulation's L2 norm is
        irrational; for ranking/thresholding the unnormalized integer
        score is monotone-equivalent per pair family and keeps every
        post-kernel step exact).

    Plan shape (100 TB audit): one groupBy(token) for df, one
    groupBy(url) to pack per-doc (token, widf) arrays, two equi-joins
    attaching the arrays to the pair ends (narrow: <= max_tokens
    structs), a double explode bounding kernel work at max_tokens^2 JW
    evaluations per pair, then two groupBys keyed by (pair, token) and
    (pair) — all standard shuffles on bounded-width rows, kernel is the
    same Arrow-batched JW as jaro_winkler_pairs. Missing urls or empty
    token sets on either side score 0 (left join back to pairs).
    """
    spark_n = fields.select(F.count("*").alias("_n"))
    toks = (
        fields.select(
            F.col(url),
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.filter(
                            F.split(
                                F.lower(F.col(field_col)), "[^a-z0-9]+"
                            ),
                            lambda x: x != "",
                        )
                    )
                ),
                1,
                max_tokens,
            ).alias("_toks"),
        )
        .select(F.col(url), F.explode("_toks").alias("_tok"))
    )
    dfreq = toks.groupBy("_tok").agg(F.count("*").alias("_df"))
    widf = dfreq.crossJoin(F.broadcast(spark_n)).select(
        "_tok",
        F.least(
            F.lit(idf_cap),
            F.expr(f"(_n * {idf_scale}) DIV _df"),
        ).alias("_widf"),
    )
    packed = (
        toks.join(widf, "_tok")
        .groupBy(url)
        .agg(
            F.collect_list(F.struct("_tok", "_widf")).alias("_tw")
        )
    )
    tp = (
        pairs.select("url_a", "url_b")
        .join(
            packed.select(
                F.col(url).alias("url_a"), F.col("_tw").alias("_ta")
            ),
            "url_a",
        )
        .join(
            packed.select(
                F.col(url).alias("url_b"), F.col("_tw").alias("_tb")
            ),
            "url_b",
        )
        .select(
            "url_a",
            "url_b",
            F.explode("_ta").alias("_a"),
            F.col("_tb"),
        )
        .select(
            "url_a",
            "url_b",
            F.col("_a._tok").alias("_w"),
            F.col("_a._widf").alias("_widf_w"),
            F.explode("_tb").alias("_b"),
        )
        .select(
            "url_a",
            "url_b",
            "_w",
            "_widf_w",
            F.col("_b._tok").alias("_v"),
            F.col("_b._widf").alias("_widf_v"),
        )
    )
    jw_udf = pandas_udf(_jw_series, "double")
    scored = tp.withColumn(
        "_jwq4",
        F.floor(jw_udf(F.col("_w"), F.col("_v")) * 1e4).cast("long"),
    )
    best = scored.groupBy("url_a", "url_b", "_w", "_widf_w").agg(
        F.max(F.struct("_jwq4", "_widf_v", "_v")).alias("_best")
    )
    sums = (
        best.where(F.col("_best._jwq4") >= theta_q4)
        .groupBy("url_a", "url_b")
        .agg(
            F.sum(
                F.col("_widf_w")
                * F.col("_best._widf_v")
                * F.col("_best._jwq4")
            ).alias(out_col)
        )
    )
    return pairs.join(sums, ["url_a", "url_b"], "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long")
    )


def monge_elkan_pairs(
    pairs: DataFrame,
    fields: DataFrame,
    url: str = "url",
    field_col: str = "field",
    out_col: str = "me_qmicros",
    score_partitions: int | None = None,
) -> DataFrame:
    """Quantized Monge-Elkan hybrid similarity per candidate pair.

    The third classic record-linkage scorer next to edit distance and
    Jaro-Winkler: tokenize both short fields (lowercase ASCII runs of
    ``[a-z0-9]+``, first 12 tokens), then average over the left field's
    tokens the best Jaro-Winkler match in the right field. Asymmetric by
    definition (scored left-to-right, like the original formulation).

    Returns pairs with ``out_col`` (long, floor-micros in [0, 1e6])
    appended — see ``_me_series`` for the exact quantization contract.
    Same join shape and 100 TB scale properties as jaro_winkler_pairs:
    the field-attach joins broadcast a narrow dimension, the UDF itself
    is shuffle-free, and the token caps bound per-row kernel work at
    144 JW evaluations regardless of input length.
    """
    return _score_pairs_on_field(
        pairs, fields, url, field_col, out_col, _me_series, "long",
        score_partitions=score_partitions,
    )
