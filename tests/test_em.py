"""EM Fellegi-Sunter estimation: fixed-point pins + separation."""

import pytest

from sassy_spark.operators.em import em_fit, em_step, pattern_counts

pytestmark = pytest.mark.usefixtures("spark")


def test_em_step_hand_pinned():
    # 1 feature, patterns (True, 6) (False, 4), default inits.
    # wm(T)=(1e5*9e5)//1e6=90000, wu(T)=(9e5*1e5)//1e6=90000 -> r=500000
    # wm(F)=10000, wu(F)=810000 -> r=(1e6*10000)//820000=12195
    # sr=6*500000+4*12195=3048780, snr=6951220, sr1=snr1=3000000
    m, u, p = em_step(
        [((True,), 6), ((False,), 4)], [900_000], [100_000], 100_000
    )
    assert m == [3_000_000_000_000 // 3_048_780] == [984_000]
    assert u == [3_000_000_000_000 // 6_951_220] == [431_578]
    assert p == 304_878


def test_em_step_clamps_and_degenerate():
    # all patterns all-true with r -> everything lands in the match
    # class; u update's snr stays > 0 via the (1e6 - r) mass
    m, u, p = em_step([((True,), 10)], [999_999], [1], 999_999)
    assert 1 <= m[0] <= 999_999
    assert 1 <= u[0] <= 999_999
    assert 1 <= p <= 999_999
    # empty pattern list: parameters unchanged
    assert em_step([], [5], [7], 9) == ([5], [7], 9)


def test_em_fit_planted_separation(spark):
    # 200 planted matches agree on (nearly) everything; 800 planted
    # non-matches agree on (nearly) nothing. EM must recover m >> u
    # per feature and a match prior near 0.2 — with NO labels.
    rows = (
        [(True, True, True)] * 190
        + [(False, True, True)] * 10
        + [(False, False, False)] * 780
        + [(True, False, False)] * 20
    )
    pairs = spark.createDataFrame(rows, ["f1", "f2", "f3"])
    got = {
        r["feature"]: r.asDict()
        for r in em_fit(pairs, ["f1", "f2", "f3"], n_iter=5).collect()
    }
    for k in ("f1", "f2", "f3"):
        assert got[k]["m_qmicros"] > 800_000, got[k]
        assert got[k]["u_qmicros"] < 100_000, got[k]
    p = got["f1"]["p_qmicros"]
    assert 150_000 < p < 300_000, p
    assert len({v["p_qmicros"] for v in got.values()}) == 1


def test_em_fit_zero_iterations_returns_init(spark):
    pairs = spark.createDataFrame(
        [(True,), (False,)], ["f1"]
    )
    (r,) = em_fit(pairs, ["f1"], n_iter=0).collect()
    assert (r["m_qmicros"], r["u_qmicros"], r["p_qmicros"]) == (
        900_000,
        100_000,
        100_000,
    )


def test_pattern_counts_bounded(spark):
    rows = [(i % 2 == 0, i % 3 == 0) for i in range(1000)]
    pairs = spark.createDataFrame(rows, ["a", "b"])
    pats = pattern_counts(pairs, ["a", "b"]).collect()
    assert len(pats) <= 4
    assert sum(r["c"] for r in pats) == 1000
