"""User-facing Searcher API — parity with the reference's Python binding.

The reference exposes ``sassy.Searcher(alphabet, rc=..., alpha=...)`` with
``search / search_all / search_many`` (reference src/python.rs:27-153).
This engine's equivalent speaks DataFrames: the same verbs, lifted to
tables, so a reference user can port call sites 1:1:

    s = sassy_spark.Searcher(case_sensitive=False)
    matches = s.search(patterns_df, texts_df, k=2)        # local minima
    all_m   = s.search_all(patterns_df, texts_df, k=2)    # every end pos
    best    = s.search_best(patterns_df, texts_df, k=2)   # one per pair

For small in-memory inputs there are list convenience wrappers that build
the DataFrames for you (`search_lists`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import search as _ops


class Searcher:
    """DataFrame approximate-occurrence searcher (ASCII/UTF-8 profile).

    ``case_sensitive=False`` reproduces the reference's Ascii<false>
    casefolding profile (src/profiles/ascii.rs:94-119). No DNA/IUPAC
    profiles: web text has no reverse-complement strand — ``strand`` is
    always '+' in output for schema parity with the reference TSV.
    """

    def __init__(self, case_sensitive: bool = True, with_trace: bool = True):
        self.case_sensitive = case_sensitive
        self.with_trace = with_trace

    def search(self, patterns: DataFrame, texts: DataFrame, k: int, **kw) -> DataFrame:
        return _ops.search(
            patterns,
            texts,
            k,
            mode="local_minima",
            with_trace=self.with_trace,
            case_sensitive=self.case_sensitive,
            **kw,
        )

    def search_all(self, patterns: DataFrame, texts: DataFrame, k: int, **kw) -> DataFrame:
        return _ops.search(
            patterns,
            texts,
            k,
            mode="all",
            with_trace=self.with_trace,
            case_sensitive=self.case_sensitive,
            **kw,
        )

    def search_best(self, patterns: DataFrame, texts: DataFrame, k: int, **kw) -> DataFrame:
        return _ops.search(
            patterns,
            texts,
            k,
            mode="best",
            with_trace=self.with_trace,
            case_sensitive=self.case_sensitive,
            **kw,
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
        return _ops.search(
            pats,
            txts,
            k,
            mode=mode,
            with_trace=self.with_trace,
            case_sensitive=self.case_sensitive,
        )

    def filter(self, texts: DataFrame, patterns: DataFrame, k: int, invert: bool = False) -> DataFrame:
        """The `filter` subcommand: texts with >= 1 (or zero, invert=True)
        approximate matches."""
        m = _ops.search(
            patterns,
            texts,
            k,
            mode="best",
            with_trace=False,
            case_sensitive=self.case_sensitive,
        )
        return _ops.filter_matching(texts, m, invert=invert)
