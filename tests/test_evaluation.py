"""cluster_metrics: hand-computed pairwise + B-cubed pins."""

import pytest

from sassy_spark.operators.evaluation import cluster_metrics

pytestmark = pytest.mark.usefixtures("spark")


def _row(spark, pred_rows, true_rows):
    pred = spark.createDataFrame(pred_rows, ["url", "cluster_id"])
    truth = spark.createDataFrame(true_rows, ["url", "cluster_id"])
    (r,) = cluster_metrics(pred, truth).collect()
    return r.asDict()


def test_textbook_example(spark):
    # truth: {a,b,c} {d,e}; pred splits the big cluster: {a,b} {c} {d,e}
    truth = [(x, "t1") for x in "abc"] + [(x, "t2") for x in "de"]
    pred = [("a", "p1"), ("b", "p1"), ("c", "p2"), ("d", "p3"), ("e", "p3")]
    r = _row(spark, pred, truth)
    # pairs: truth same-cluster = C(3,2)+C(2,2) = 4; pred = 1+0+1 = 2
    # tp = pairs same in both = {ab, de} = 2; fp = 0; fn = 2
    assert (r["n"], r["tp"], r["fp"], r["fn"]) == (5, 2, 0, 2)
    assert r["precision_qmicros"] == 1_000_000
    assert r["recall_qmicros"] == 500_000
    # f1 = 2*2 / (2*2 + 0 + 2) = 2/3
    assert r["f1_qmicros"] == 666_666
    # b-cubed precision: cells (p1,t1,2) (p2,t1,1) (p3,t2,2)
    #   = (4/2 + 1/1 + 4/2)/5 = 1.0
    assert r["bcubed_precision_qmicros"] == 1_000_000
    # b-cubed recall = (4/3 + 1/3 + 4/2)/5: per-cell floor-micros then //5
    exp = (
        (1_000_000 * 4) // 3 + (1_000_000 * 1) // 3 + (1_000_000 * 4) // 2
    ) // 5
    assert r["bcubed_recall_qmicros"] == exp


def test_perfect_match(spark):
    rows = [("a", "x"), ("b", "x"), ("c", "y")]
    r = _row(spark, rows, rows)
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)
    for k in (
        "precision_qmicros",
        "recall_qmicros",
        "f1_qmicros",
        "bcubed_precision_qmicros",
        "bcubed_recall_qmicros",
    ):
        assert r[k] == 1_000_000, k


def test_all_singletons_vs_one_cluster(spark):
    # pred all singletons, truth one cluster: no predicted pairs
    pred = [(x, x) for x in "abcd"]
    truth = [(x, "t") for x in "abcd"]
    r = _row(spark, pred, truth)
    assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 6)
    assert r["precision_qmicros"] == 0  # degenerate: 0 predicted pairs
    assert r["recall_qmicros"] == 0
    assert r["f1_qmicros"] == 0
    assert r["bcubed_precision_qmicros"] == 1_000_000  # each own cluster
    assert r["bcubed_recall_qmicros"] == 250_000  # (4 * (1e6*1)//4) // 4


def test_inner_join_on_ids(spark):
    # records labeled on only one side are excluded from the metric
    pred = [("a", "p"), ("b", "p"), ("zz", "p")]
    truth = [("a", "t"), ("b", "t"), ("yy", "t")]
    r = _row(spark, pred, truth)
    assert r["n"] == 2
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)


def test_adjusted_rand_textbook(spark):
    from sassy_spark.operators.evaluation import adjusted_rand

    # truth: {a,b,c} {d,e}; pred splits: {a,b} {c} {d,e}
    # S=2, A=2, B=4, T=10 -> ARI = 2*(20-8)/(60-16) = 24/44
    truth = spark.createDataFrame(
        [(x, "t1") for x in "abc"] + [(x, "t2") for x in "de"],
        ["url", "cluster_id"],
    )
    pred = spark.createDataFrame(
        [("a", "p1"), ("b", "p1"), ("c", "p2"), ("d", "p3"), ("e", "p3")],
        ["url", "cluster_id"],
    )
    (r,) = adjusted_rand(pred, truth).collect()
    assert (r["n"], r["s_pairs"], r["a_pairs"], r["b_pairs"]) == (5, 2, 2, 4)
    assert r["t_pairs"] == 10
    assert r["ari_qmicros"] == (1_000_000 * 24) // 44  # 545454


def test_adjusted_rand_perfect_and_degenerate(spark):
    from sassy_spark.operators.evaluation import adjusted_rand

    rows = [("a", "x"), ("b", "x"), ("c", "y")]
    df = spark.createDataFrame(rows, ["url", "cluster_id"])
    (r,) = adjusted_rand(df, df).collect()
    assert r["ari_qmicros"] == 1_000_000

    singles = spark.createDataFrame(
        [(x, x) for x in "abcd"], ["url", "cluster_id"]
    )
    (r,) = adjusted_rand(singles, singles).collect()
    assert r["ari_qmicros"] == 0  # den = 0: conventional 0


def test_adjusted_rand_negative_truncates_toward_zero(spark):
    from sassy_spark.operators.evaluation import adjusted_rand

    # anti-correlated: truth {a,b}{c,d}, pred {a,c}{b,d}
    # S=0, A=B=2, T=6 -> ARI = 2*(0-4)/(24-8) = -0.5
    truth = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("c", "t2"), ("d", "t2")],
        ["url", "cluster_id"],
    )
    pred = spark.createDataFrame(
        [("a", "p1"), ("c", "p1"), ("b", "p2"), ("d", "p2")],
        ["url", "cluster_id"],
    )
    (r,) = adjusted_rand(pred, truth).collect()
    assert r["ari_qmicros"] == -500_000


def test_refinement_stats(spark):
    from sassy_spark.operators.evaluation import refinement_stats

    fine = spark.createDataFrame(
        [("a", "f1"), ("b", "f1"), ("c", "f2"), ("d", "f3"), ("e", "f3")],
        ["url", "cluster_id"],
    )
    coarse = spark.createDataFrame(
        [("a", "C1"), ("b", "C1"), ("c", "C1"), ("d", "C2"), ("e", "C2")],
        ["url", "cluster_id"],
    )
    got = {
        r["coarse_cluster_id"]: (
            r["n_members"], r["n_fine"], r["fragmented"]
        )
        for r in refinement_stats(fine, coarse).collect()
    }
    assert got == {"C1": (3, 2, True), "C2": (2, 1, False)}


def test_transitivity_audit_statuses_and_degree_cap(spark):
    """Planted wedge graph: 1-2-3 open (1-3 scored+rejected), 2-3-4
    open (2-4 never compared), 1-2 / 2-3 / 3-4 are links; a closed
    triangle 5-6-7 emits nothing; hub 100 with degree over the cap is
    excluded as a middle."""
    from sassy_spark.operators.evaluation import transitivity_audit

    links = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),
            (5, 6), (6, 7), (5, 7),          # closed triangle: no row
            (100, 200), (100, 201), (100, 202),  # hub middle, degree 3
        ],
        ["id_a", "id_b"],
    )
    scored = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (1, 3),  # 1-3 compared, rejected
            (5, 6), (6, 7), (5, 7),
            (100, 200), (100, 201), (100, 202),
        ],
        ["id_a", "id_b"],
    )
    got = {
        (r.id_a, r.id_b): (r.n_witnesses, r.status)
        for r in transitivity_audit(links, scored).collect()
    }
    assert got == {
        (1, 3): (1, "scored_nonmatch"),
        (2, 4): (1, "not_compared"),
        (200, 201): (1, "not_compared"),
        (200, 202): (1, "not_compared"),
        (201, 202): (1, "not_compared"),
    }
    # cap the middle degree below the hub's: its wedges disappear,
    # the chain wedges (middle degree 2) survive
    capped = {
        (r.id_a, r.id_b)
        for r in transitivity_audit(links, scored, max_degree=2).collect()
    }
    assert capped == {(1, 3), (2, 4)}


def test_calibration_table_decades_and_rates(spark):
    from sassy_spark.operators.evaluation import calibration_table

    scored = spark.createDataFrame(
        [
            # decade 6 (1e6 <= lr < 1e7): 2 pairs, 1 true -> 500000
            (1_000_000, True), (9_999_999, False),
            # decade 0 (lr < 10): 3 pairs, 0 true -> 0
            (1, False), (5, False), (9, False),
            # decade 12 (the saturation cap): 1 pair, 1 true -> 1e6
            (1_000_000_000_000, True),
        ],
        "lr_qmicros long, is_match boolean",
    )
    got = {
        r.lr_decade: (r.n_pairs, r.n_true, r.match_rate_qmicros)
        for r in calibration_table(scored).collect()
    }
    assert got == {
        6: (2, 1, 500_000),
        0: (3, 0, 0),
        12: (1, 1, 1_000_000),
    }


def test_threshold_sweep_hand_pinned(spark):
    """Curve over 3 distinct scores: cumulative tp/fp from the top,
    exact integer P/R/F1 quantization."""
    from sassy_spark.operators.evaluation import threshold_sweep

    scored = spark.createDataFrame(
        [
            (900, True), (900, True),          # 2 true at 900
            (700, True), (700, False),         # mixed band
            (500, False), (500, False), (500, False),
        ],
        "score long, is_match boolean",
    )
    got = {
        r.threshold: (r.tp, r.fp, r.fn, r.precision_qmicros,
                      r.recall_qmicros, r.f1_qmicros)
        for r in threshold_sweep(scored).collect()
    }
    # total_true = 3
    assert got[900] == (2, 0, 1, 1_000_000, 666_666, 800_000)
    assert got[700] == (3, 1, 0, 750_000, 1_000_000, 857_142)
    assert got[500] == (3, 4, 0, 428_571, 1_000_000, 600_000)
