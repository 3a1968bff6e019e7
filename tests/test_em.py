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


def test_fs_score_hand_pinned_and_saturation(spark):
    from sassy_spark.operators.em import fs_score

    params = spark.createDataFrame(
        [("f1", 900_000, 100_000, 50_000), ("f2", 999_999, 1, 50_000)],
        "feature string, m_qmicros long, u_qmicros long, p_qmicros long",
    )
    pairs = spark.createDataFrame(
        [(1, True, False), (2, False, False), (3, True, True)],
        ["pid", "f1", "f2"],
    )
    got = {
        r["pid"]: r["lr_qmicros"]
        for r in fs_score(pairs, params, ["f1", "f2"]).collect()
    }
    # pid 1: lr = (1e6*9e5)//1e5 = 9e6; then disagree on f2:
    #   (9e6 * (1e6-999999)) // (1e6-1) = 9e6 // 999999 = 9
    assert got[1] == (9_000_000 * 1) // 999_999 == 9
    # pid 2: (1e6*1e5)//9e5 = 111111; * 1 // 999999 = 0
    assert got[2] == 0
    # pid 3: (1e6*9e5)//1e5 = 9e6; (9e6*999999)//1 = 9e12 -> cap 1e12
    assert got[3] == 1_000_000_000_000


def test_fs_score_missing_feature_raises(spark):
    from sassy_spark.operators.em import fs_score

    params = spark.createDataFrame(
        [("f1", 900_000, 100_000, 50_000)],
        "feature string, m_qmicros long, u_qmicros long, p_qmicros long",
    )
    pairs = spark.createDataFrame([(True, True)], ["f1", "f2"])
    with pytest.raises(ValueError, match="f2"):
        fs_score(pairs, params, ["f1", "f2"])
