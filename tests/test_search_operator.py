"""DataFrame-level search operator: sassy search/search_all/filter
semantics (golden cases from the reference's test shapes, SURVEY §5.1)."""

import pytest
from pyspark.sql import functions as F

from sassy_spark.operators.search import (
    best_match_per_pair,
    cost_histogram,
    filter_matching,
    search,
)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        ("t1", "xxxneedlexxx"),
        ("t2", "the neXdle is here and the needle too"),
        ("t3", "nothing to see"),
        ("t4", "needle"),
    ]
    return spark.createDataFrame(rows, ["text_id", "text"])


@pytest.fixture(scope="module")
def patterns(spark):
    return spark.createDataFrame([("p1", "needle")], ["pat_id", "pattern"])


def test_search_exact(spark, patterns, texts):
    m = search(patterns, texts, k=0, mode="all").collect()
    got = {(r.text_id, r.end, r.cost) for r in m}
    assert ("t1", 9, 0) in got
    assert ("t4", 6, 0) in got
    assert ("t2", 33, 0) in got
    assert all(r.cost == 0 for r in m)
    # match_region must reproduce the pattern for exact matches
    assert all(r.match_region == "needle" for r in m)


def test_search_k1_finds_substitution(spark, patterns, texts):
    m = search(patterns, texts, k=1, mode="local_minima")
    t2 = [r for r in m.collect() if r.text_id == "t2"]
    costs = sorted(r.cost for r in t2)
    assert costs[0] == 0  # exact 'needle'
    assert 1 in costs  # 'neXdle'


def test_without_trace_schema(spark, patterns, texts):
    m = search(patterns, texts, k=1, with_trace=False)
    rows = m.collect()
    assert all(r.start is None and r.cigar is None for r in rows)
    assert len(rows) > 0


def test_filter_matching_semi_and_anti(spark, patterns, texts):
    m = search(patterns, texts, k=1)
    keep = filter_matching(texts, m)
    drop = filter_matching(texts, m, invert=True)
    assert {r.text_id for r in keep.collect()} == {"t1", "t2", "t4"}
    assert {r.text_id for r in drop.collect()} == {"t3"}


def test_cost_histogram(spark, patterns, texts):
    m = search(patterns, texts, k=1, mode="all")
    h = {r.cost: r.n_matches for r in cost_histogram(m).collect()}
    assert h[0] >= 3
    assert 1 in h


def test_best_match_per_pair(spark, patterns, texts):
    m = search(patterns, texts, k=1, mode="all")
    b = best_match_per_pair(m)
    rows = {r.text_id: (r.cost, r.end) for r in b.collect()}
    assert rows["t1"] == (0, 9)
    # t2: best cost 0; rightmost best end = the exact needle at 31
    assert rows["t2"] == (0, 33)


def test_case_insensitive(spark):
    pats = spark.createDataFrame([("p", "NeEdLe")], ["pat_id", "pattern"])
    txts = spark.createDataFrame([("t", "xxNEEDLExx")], ["text_id", "text"])
    assert search(pats, txts, k=0, case_sensitive=False).count() == 1
    assert search(pats, txts, k=0, case_sensitive=True).count() == 0


def test_rc_search(spark):
    pats = spark.createDataFrame([("g1", "ACGTT")], ["pat_id", "pattern"])
    txts = spark.createDataFrame(
        [("t1", "ccccAACGTcccc")], ["text_id", "text"]  # revcomp(ACGTT)=AACGT
    )
    fwd_only = search(pats, txts, k=0, mode="all")
    assert fwd_only.count() == 0
    both = search(pats, txts, k=0, mode="all", rc=True)
    rows = both.collect()
    assert len(rows) == 1
    assert rows[0].strand == "-"
    assert rows[0].match_region == "AACGT"
