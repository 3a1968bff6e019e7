"""User-facing Searcher API — parity with the reference's Python binding.

The reference exposes ``sassy.Searcher(alphabet, rc=..., alpha=...)`` with
``search / search_all / search_many`` (reference src/python.rs:27-153).
This engine's equivalent speaks DataFrames: the same verbs (and the same
constructor vocabulary — alphabet profile, rc, overhang alpha), lifted to
tables, so a reference user can port call sites 1:1:

    s = sassy_spark.Searcher(alphabet="iupac", rc=True, alpha=0.5)
    matches = s.search(patterns_df, texts_df, k=2)        # local minima
    all_m   = s.search_all(patterns_df, texts_df, k=2)    # every end pos
    best    = s.search_best(patterns_df, texts_df, k=2)   # one per pair
    aln     = s.search_all_alignments(patterns_df, texts_df, k=2)

For small in-memory inputs there are list convenience wrappers that build
the DataFrames for you (`search_lists`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import search as _ops


class Searcher:
    """DataFrame approximate-occurrence searcher.

    ``alphabet``: 'ascii' (exact chars — the web-text default), 'dna',
    'iupac' (ambiguity-class matching, reference src/profiles/iupac.rs),
    'ascii_ci', or a codepoint->mask dict. ``case_sensitive=False``
    reproduces the reference's Ascii<false> casefolding profile
    (src/profiles/ascii.rs:94-119). ``rc=True`` also searches the
    reverse-complement strand (strand '-' rows). ``alpha``/
    ``max_overhang``: overhang scoring — the pattern may hang over text
    ends at cost floor(alpha * overhang) (src/search.rs:231-248).
    """

    def __init__(
        self,
        alphabet: str | dict | None = "ascii",
        case_sensitive: bool = True,
        with_trace: bool = True,
        rc: bool = False,
        alpha: float | None = None,
        max_overhang: int | None = None,
    ):
        self.alphabet = alphabet
        self.case_sensitive = case_sensitive
        self.with_trace = with_trace
        self.rc = rc
        self.alpha = alpha
        self.max_overhang = max_overhang

    def _kw(self, **kw) -> dict:
        base = dict(
            with_trace=self.with_trace,
            case_sensitive=self.case_sensitive,
            rc=self.rc,
            alpha=self.alpha,
            max_overhang=self.max_overhang,
            profile=self.alphabet,
        )
        base.update(kw)
        return base

    def search(self, patterns: DataFrame, texts: DataFrame, k: int, **kw) -> DataFrame:
        return _ops.search(patterns, texts, k, mode="local_minima", **self._kw(**kw))

    def search_all(self, patterns: DataFrame, texts: DataFrame, k: int, **kw) -> DataFrame:
        return _ops.search(patterns, texts, k, mode="all", **self._kw(**kw))

    def search_best(self, patterns: DataFrame, texts: DataFrame, k: int, **kw) -> DataFrame:
        return _ops.search(patterns, texts, k, mode="best", **self._kw(**kw))

    def search_all_alignments(
        self, patterns: DataFrame, texts: DataFrame, k: int, **kw
    ) -> DataFrame:
        """Every distinct cost-minimal alignment per end position
        (reference search_all_alignments, src/search.rs:708-754)."""
        return _ops.search(
            patterns, texts, k, mode="all_alignments", **self._kw(**kw)
        )

    def search_with_fn(
        self, patterns: DataFrame, texts: DataFrame, k: int, filter_fn, **kw
    ) -> DataFrame:
        """search_with_fn (src/search.rs:767-784): ``filter_fn(pattern,
        text_prefix, strand) -> bool`` drops end positions before
        traceback (the PAM-filter hook)."""
        return _ops.search(
            patterns, texts, k, mode="all", end_filter=filter_fn, **self._kw(**kw)
        )

    def search_lists(
        self,
        spark: SparkSession,
        patterns: list[str],
        texts: list[str],
        k: int,
        mode: str = "local_minima",
    ) -> DataFrame:
        pats = spark.createDataFrame(
            [(f"p{i}", p) for i, p in enumerate(patterns)], ["pat_id", "pattern"]
        )
        txts = spark.createDataFrame(
            [(f"t{i}", t) for i, t in enumerate(texts)], ["text_id", "text"]
        )
        return _ops.search(pats, txts, k, mode=mode, **self._kw())

    def filter(self, texts: DataFrame, patterns: DataFrame, k: int, invert: bool = False) -> DataFrame:
        """The `filter` subcommand: texts with >= 1 (or zero, invert=True)
        approximate matches."""
        m = _ops.search(
            patterns, texts, k, mode="best", **self._kw(with_trace=False)
        )
        return _ops.filter_matching(texts, m, invert=invert)
