"""Pairwise string-similarity operators beyond edit distance.

Jaro-Winkler is the classic record-linkage similarity for short
identifying fields (person/org names, titles, URL slugs) — transposition
tolerant with a common-prefix boost. It complements the Myers
edit-distance kernel (`operators/linkage.score_pairs`): run JW on a
short extracted field as a cheap second scorer, or as a tie-breaking
feature next to `normalized_cost`.

Scale notes (100 TB audit):
- the similarity itself is a SCALAR pandas UDF over two already-joined
  short string columns — no shuffle of its own; the only exchanges are
  the two field-attachment joins, and the fields side is narrow
  (url + a <=64-char slice), so Catalyst broadcasts it at any realistic
  dimension size and sort-merges correctly beyond that;
- the kernel is batch-vectorized numpy over byte matrices
  (`kernel/jaro.py`); the UDF chunks each Arrow batch so the
  O(rows * len_a * len_b) match matrices stay cache-resident regardless
  of Arrow's batch sizing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Bound the (rows x len x len) boolean work matrices: 2048 rows x 64 x 64
# bytes ~ 8 MB per matrix — cache-friendly, mirrors the Myers kernel's
# 1 MiB task-batch bound rationale.
_CHUNK_ROWS = 2048


# the pandas_udf is created lazily: decorating at module level would
# parse the return-type DDL, which needs an active SparkContext and
# breaks plain `import sassy_spark.operators.strsim` before a session
# exists
def _jw_series(a: pd.Series, b: pd.Series) -> pd.Series:
    from sassy_spark.kernel.jaro import jaro_winkler_batch

    import numpy as np

    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    for lo in range(0, n, _CHUNK_ROWS):
        hi = min(lo + _CHUNK_ROWS, n)
        ab = [x.encode("utf-8") if isinstance(x, str) else b"" for x in av[lo:hi]]
        bb = [x.encode("utf-8") if isinstance(x, str) else b"" for x in bv[lo:hi]]
        out[lo:hi] = jaro_winkler_batch(ab, bb)
    return pd.Series(out)


def jaro_winkler_pairs(
    pairs: DataFrame,
    fields: DataFrame,
    url: str = "url",
    field_col: str = "field",
    out_col: str = "jw",
) -> DataFrame:
    """Score candidate pairs with Jaro-Winkler on a short field.

    pairs:  (url_a, url_b [, ...carried columns])
    fields: (url, field) — one short string per record (pre-slice long
            text upstream; JW on multi-KB bodies is the wrong tool, use
            score_pairs / MinHash for those).

    Returns pairs with ``out_col`` (double in [0, 1]) appended.
    """
    f = fields.select(F.col(url), F.col(field_col).alias("_f"))
    df = pairs.join(
        f.select(F.col(url).alias("url_a"), F.col("_f").alias("_fa")), "url_a"
    ).join(
        f.select(F.col(url).alias("url_b"), F.col("_f").alias("_fb")), "url_b"
    )
    jw_udf = pandas_udf(_jw_series, "double")
    return df.withColumn(out_col, jw_udf(F.col("_fa"), F.col("_fb"))).drop(
        "_fa", "_fb"
    )


def _dl_series(a: pd.Series, b: pd.Series) -> pd.Series:
    from sassy_spark.kernel.damerau import damerau_levenshtein_batch

    import numpy as np

    n = len(a)
    out = np.zeros(n, dtype=np.int64)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    # smaller chunk than JW: the DP tensor is (rows x L^2) int32
    step = max(_CHUNK_ROWS // 4, 1)
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        ab = [x.encode("utf-8") if isinstance(x, str) else b"" for x in av[lo:hi]]
        bb = [x.encode("utf-8") if isinstance(x, str) else b"" for x in bv[lo:hi]]
        out[lo:hi] = damerau_levenshtein_batch(ab, bb)
    return pd.Series(out)


def damerau_pairs(
    pairs: DataFrame,
    fields: DataFrame,
    url: str = "url",
    field_col: str = "field",
    out_col: str = "dl",
) -> DataFrame:
    """Unrestricted Damerau-Levenshtein distance on a short field per
    candidate pair (kernel/damerau.py — transposition-tolerant typo
    distance). Same join shape and scale properties as
    jaro_winkler_pairs; intended for short identifying fields."""
    f = fields.select(F.col(url), F.col(field_col).alias("_f"))
    df = pairs.join(
        f.select(F.col(url).alias("url_a"), F.col("_f").alias("_fa")), "url_a"
    ).join(
        f.select(F.col(url).alias("url_b"), F.col("_f").alias("_fb")), "url_b"
    )
    dl_udf = pandas_udf(_dl_series, "long")
    return df.withColumn(out_col, dl_udf(F.col("_fa"), F.col("_fb"))).drop(
        "_fa", "_fb"
    )
