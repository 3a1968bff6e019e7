"""Clustering-quality metrics for entity resolution, computed
distributively — no pair expansion anywhere.

Two standard ER evaluation families over a (predicted, truth) pair of
labelings:

- **pairwise precision/recall/F1** (the north metric of this engine):
  counts of record PAIRS that agree/disagree across the two labelings.
  Naively this is O(N^2); here every count comes from cluster-size
  aggregations using the identity  #same-cluster-pairs = sum C(n, 2)
  over clusters — three groupBys, one row out.
- **B-cubed precision/recall** (Bagga & Baldwin '98): per-record
  overlap ratios averaged over the corpus, the standard complement to
  pairwise F1 when cluster sizes are skewed (pairwise F1 is dominated
  by the biggest clusters; B-cubed weights every record equally).

Quantization contract (what makes the DuckDB oracle compare exact):
ratios are never emitted as doubles. Each is floor-quantized to micros
with INTEGER arithmetic only —

    precision_qmicros = (1_000_000 * tp)          // (tp + fp)
    recall_qmicros    = (1_000_000 * tp)          // (tp + fn)
    f1_qmicros        = (2_000_000 * tp)          // (2*tp + fp + fn)
    bcubed_*_qmicros  = ( sum over (pred, truth) cells of
                          (1_000_000 * c*c) // n_side ) // N

For B-cubed the quantization happens per cell BEFORE the sum (each
cell's c^2/n is floored to micros independently), so the sum is
order-independent integer math on both engines; the result understates
the true B-cubed by < (#cells + 1) / N micros.

Records present in only one labeling are excluded (inner join on id):
metrics are defined over the co-labeled corpus.

Int64 domain (know your limits before 10^12-doc runs): the B-cubed
cell term ``1e6 * c^2`` stays in int64 for cell counts c <= ~3.0e6,
and the pairwise C(n,2) identities for cluster sizes n <= ~4.3e9.
A (pred, truth) cell holding more than 3M records means a mega-cluster
agreement — at web scale that is almost always an upstream blocking or
transitive-closure bug worth failing on, but Spark's non-ANSI mode
would WRAP silently here, so run metric jobs with
``spark.sql.ansi.enabled=true`` (overflow then raises) or pre-check
``max(c)`` if clusters that large are legitimate in your domain.

Scale notes (100 TB audit): the id join shuffles (id, label) narrow
rows once; every metric after that is a map-side-combining groupBy of
label keys, then a single-row final aggregate. Skewed cluster sizes
affect only count magnitudes, never row fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def adjusted_rand(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "url",
    pred_col: str = "cluster_id",
    true_col: str = "cluster_id",
) -> DataFrame:
    """Adjusted Rand Index between two labelings, exact integer math.

    The chance-corrected external clustering metric (Hubert & Arabie
    '85) — the standard complement to pairwise F1 (which ignores
    true-negative agreement) and B-cubed (which weights records, not
    pairs). Computed entirely from cluster-size aggregations via the
    same sum-C(n,2) identities as :func:`cluster_metrics` — no pair
    expansion anywhere.

    With S = sum over contingency cells of C(c,2), A/B = sum of
    C(size,2) over pred/truth clusters, T = C(n,2):

        ARI = (S - A*B/T) / ((A+B)/2 - A*B/T)
            = 2*(T*S - A*B) / (T*(A+B) - 2*A*B)

    Quantization contract: ``ari_qmicros`` is the second form scaled by
    1e6 and integer-divided, truncating toward zero via an explicit
    sign/abs split (ARI can be negative for anti-correlated labelings;
    Spark ``div`` and DuckDB ``//`` disagree on negative operands, the
    split makes both engines truncate identically). The denominator is
    always >= 0 (A(T-B) + B(T-A) with A, B <= T); when it is 0 (both
    labelings all-singletons or all-one-cluster) the conventional 0 is
    emitted.

    Int64 domain: the products T*S, T*(A+B) and 2*A*B must stay below
    2^63 (~9.2e18). For bounded cluster sizes s, A ~ n*(s-1)/2, so
    A*B <= 4.6e18 holds up to roughly n ~ 4e8 co-labeled records at
    s <= 10; T*S needs T ~ n^2/2 <= 3e9 pairs per labeling side —
    beyond that, cast the five count columns this emits to
    decimal(38,0) (Spark) / HUGEINT (DuckDB) and redo the final ratio
    downstream. Like :func:`cluster_metrics`, run with
    ``spark.sql.ansi.enabled=true`` so an overflow raises instead of
    wrapping.

    Columns: n, s_pairs, a_pairs, b_pairs, t_pairs, ari_qmicros — all
    longs.
    """
    cells = _joint(pred, truth, id_col, pred_col, true_col).localCheckpoint(
        eager=True
    )
    psz = cells.groupBy("_p").agg(F.sum("_c").alias("_np"))
    tsz = cells.groupBy("_t").agg(F.sum("_c").alias("_nt"))

    s = cells.select(
        F.sum(F.expr("(_c * (_c - 1)) div 2")).cast("long").alias("v")
    )
    a = psz.select(
        F.sum(F.expr("(_np * (_np - 1)) div 2")).cast("long").alias("v")
    )
    b = tsz.select(
        F.sum(F.expr("(_nt * (_nt - 1)) div 2")).cast("long").alias("v")
    )
    n = cells.select(F.sum("_c").cast("long").alias("v"))

    z = F.lit(0).cast("long")
    row = (
        n.select(F.col("v").alias("n"))
        .crossJoin(s.select(F.col("v").alias("s_pairs")))
        .crossJoin(a.select(F.col("v").alias("a_pairs")))
        .crossJoin(b.select(F.col("v").alias("b_pairs")))
        .select(
            F.coalesce("n", z).alias("n"),
            F.coalesce("s_pairs", z).alias("s_pairs"),
            F.coalesce("a_pairs", z).alias("a_pairs"),
            F.coalesce("b_pairs", z).alias("b_pairs"),
        )
        .withColumn("t_pairs", F.expr("(n * (n - 1)) div 2"))
    )
    q = F.expr(
        f"CASE WHEN t_pairs * (a_pairs + b_pairs)"
        f"          - 2 * a_pairs * b_pairs <= 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(sign(2 * (t_pairs * s_pairs - a_pairs * b_pairs)) "
        f"          AS BIGINT) "
        f"     * (({_M} * abs(2 * (t_pairs * s_pairs - a_pairs * b_pairs)))"
        f"        div (t_pairs * (a_pairs + b_pairs)"
        f"             - 2 * a_pairs * b_pairs)) END"
    )
    return row.select(
        "n", "s_pairs", "a_pairs", "b_pairs", "t_pairs",
        q.alias("ari_qmicros"),
    )


def _joint(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str,
    pred_col: str,
    true_col: str,
) -> DataFrame:
    """(pred_label, true_label, c) cell counts over co-labeled ids."""
    p = pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_p"))
    t = truth.select(F.col(id_col).alias("_id"), F.col(true_col).alias("_t"))
    return (
        p.join(t, "_id")
        .groupBy("_p", "_t")
        .agg(F.count("*").alias("_c"))
    )


def refinement_stats(
    fine: DataFrame,
    coarse: DataFrame,
    id_col: str = "url",
    fine_col: str = "cluster_id",
    coarse_col: str = "cluster_id",
) -> DataFrame:
    """Per-coarse-cluster fragmentation under a finer labeling.

    The threshold-sensitivity audit of an ER pipeline: resolve at a
    loose threshold (coarse) and at a strict one (fine), then ask how
    each coarse entity decomposes — a coarse cluster spanning many fine
    sub-clusters is glued by borderline edges and is the first place a
    threshold change (or a chaining over-merge) shows up. Works for
    ANY two labelings (not just true refinements): n_fine counts the
    distinct fine labels co-occurring inside the coarse cluster.

    Returns (coarse_cluster_id, n_members, n_fine, fragmented) — one
    row per coarse cluster over the co-labeled ids, fragmented =
    (n_fine > 1).

    Scale notes: built on the same (fine, coarse, count) contingency
    cells as the metrics above — one id join, one groupBy of label
    pairs, one groupBy of coarse labels; all counts map-side combine,
    nothing expands pairs.
    """
    cells = _joint(fine, coarse, id_col, fine_col, coarse_col)
    return (
        cells.groupBy("_t")
        .agg(
            F.sum("_c").cast("long").alias("n_members"),
            F.count("*").cast("long").alias("n_fine"),
        )
        .select(
            F.col("_t").alias("coarse_cluster_id"),
            "n_members",
            "n_fine",
            (F.col("n_fine") > 1).alias("fragmented"),
        )
    )


def cluster_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "url",
    pred_col: str = "cluster_id",
    true_col: str = "cluster_id",
) -> DataFrame:
    """One-row DataFrame of pairwise + B-cubed metrics (quantized).

    Columns: n, tp, fp, fn, precision_qmicros, recall_qmicros,
    f1_qmicros, bcubed_precision_qmicros, bcubed_recall_qmicros — all
    longs, exact integer arithmetic end-to-end (see module docstring
    for the quantization contract). Degenerate cases (no co-labeled
    records, or no same-cluster pairs on a side) emit 0 for the
    affected ratios rather than null.
    """
    # The cells table is tiny (one row per (pred, truth) cluster pair)
    # but its lineage carries BOTH labeling pipelines (often a full CC
    # run each); six aggregate branches consume it below, so materialize
    # it exactly once — an eager localCheckpoint both runs the upstream
    # a single time and truncates the lineage the branches re-plan.
    cells = _joint(pred, truth, id_col, pred_col, true_col).localCheckpoint(
        eager=True
    )
    psz = cells.groupBy("_p").agg(F.sum("_c").alias("_np"))
    tsz = cells.groupBy("_t").agg(F.sum("_c").alias("_nt"))

    # pairwise counts from C(n,2) identities — integer div keeps the
    # arithmetic exact (n*(n-1) is always even)
    tp = cells.select(
        F.sum(F.expr("(_c * (_c - 1)) div 2")).cast("long").alias("v")
    )
    pp = psz.select(
        F.sum(F.expr("(_np * (_np - 1)) div 2")).cast("long").alias("v")
    )
    tt = tsz.select(
        F.sum(F.expr("(_nt * (_nt - 1)) div 2")).cast("long").alias("v")
    )
    n = cells.select(F.sum("_c").cast("long").alias("v"))

    # B-cubed cell terms: (1e6 * c^2) // n_side, summed as integers
    bp = (
        cells.join(psz, "_p")
        .select(
            F.expr(f"({_M} * _c * _c) div _np").alias("q")
        )
        .agg(F.sum("q").alias("v"))
    )
    br = (
        cells.join(tsz, "_t")
        .select(
            F.expr(f"({_M} * _c * _c) div _nt").alias("q")
        )
        .agg(F.sum("q").alias("v"))
    )

    row = (
        n.select(F.col("v").alias("n"))
        .crossJoin(tp.select(F.col("v").alias("tp")))
        .crossJoin(pp.select(F.col("v").alias("pp")))
        .crossJoin(tt.select(F.col("v").alias("tt")))
        .crossJoin(bp.select(F.col("v").alias("bp")))
        .crossJoin(br.select(F.col("v").alias("br")))
    )
    z = F.lit(0).cast("long")
    out = row.select(
        F.coalesce("n", z).alias("n"),
        F.coalesce("tp", z).alias("tp"),
        (F.coalesce("pp", z) - F.coalesce("tp", z)).alias("fp"),
        (F.coalesce("tt", z) - F.coalesce("tp", z)).alias("fn"),
        F.coalesce("bp", z).alias("_bp"),
        F.coalesce("br", z).alias("_br"),
    )
    return out.select(
        "n",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr(f"({_M} * tp) div (tp + fp)"),
        ).otherwise(z).alias("precision_qmicros"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.expr(f"({_M} * tp) div (tp + fn)"),
        ).otherwise(z).alias("recall_qmicros"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.expr(f"({2 * _M} * tp) div (2 * tp + fp + fn)"),
        ).otherwise(z).alias("f1_qmicros"),
        F.when(F.col("n") > 0, F.expr("_bp div n")).otherwise(z).alias(
            "bcubed_precision_qmicros"
        ),
        F.when(F.col("n") > 0, F.expr("_br div n")).otherwise(z).alias(
            "bcubed_recall_qmicros"
        ),
    )


def transitivity_audit(
    links: DataFrame,
    scored: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_degree: int = 256,
) -> DataFrame:
    """Open-wedge transitivity audit over pairwise link decisions — the
    pre-clustering complement of the closed-triangle edge-support
    operator (cluster repair, q100): before transitive closure glues
    A-B-C chains into one entity, report every OPEN wedge — A-B and
    B-C decided as links while A-C is NOT — split by WHY it is open:

    - ``scored_nonmatch``: A-C was compared and rejected — direct
      evidence against merging A,B,C; many of these means transitive
      closure will override the scorer and precision will fall;
    - ``not_compared``: A-C never met in any block — a blocking blind
      spot; the closure's verdict on A,C rests on the B path alone.

    ``links``: decided link pairs (id_a < id_b). ``scored``: ALL
    compared pairs (id_a < id_b) — the candidate set the scorer saw
    (links must be a subset; only membership is used).

    Returns (id_a, id_b, n_witnesses, status) — one row per open
    wedge endpoint pair, n_witnesses = number of distinct middle
    records connecting them.

    Scale notes (100 TB audit): wedges are generated middle-out
    (sym-edge self-join on the middle id), so a hub of degree d emits
    d^2 wedge rows; middles with link-degree > ``max_degree`` are
    excluded (their entities are mega-clusters whose audit belongs to
    the cluster-level tools, and the d^2 blowup would dominate the
    shuffle) — the same explicit-cap contract as cbs_pairs. Everything
    is narrow id pairs; the status classification is two left
    anti/semi-style joins, no UDFs.
    """
    e = links.select(F.col(id_a).alias("_a"), F.col(id_b).alias("_b"))
    sym = e.union(e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
    deg = sym.groupBy("_a").agg(F.count("*").alias("_d"))
    mid = sym.join(
        deg.where(F.col("_d") <= max_degree).select("_a"), "_a"
    )
    wedge = (
        mid.select(F.col("_a").alias("_m"), F.col("_b").alias("wa"))
        .join(
            mid.select(F.col("_a").alias("_m"), F.col("_b").alias("wb")),
            "_m",
        )
        .where(F.col("wa") < F.col("wb"))
        .groupBy(F.col("wa").alias("_a"), F.col("wb").alias("_b"))
        .agg(F.count_distinct("_m").alias("n_witnesses"))
    )
    open_w = wedge.join(e, ["_a", "_b"], "left_anti")
    s = scored.select(
        F.col(id_a).alias("_a"),
        F.col(id_b).alias("_b"),
        F.lit(True).alias("_seen"),
    ).dropDuplicates(["_a", "_b"])
    return (
        open_w.join(s, ["_a", "_b"], "left")
        .select(
            F.col("_a").alias(id_a),
            F.col("_b").alias(id_b),
            "n_witnesses",
            F.when(F.col("_seen"), F.lit("scored_nonmatch"))
            .otherwise(F.lit("not_compared"))
            .alias("status"),
        )
    )


def calibration_table(
    scored: DataFrame,
    is_match_col: str = "is_match",
    score_col: str = "lr_qmicros",
) -> DataFrame:
    """Score calibration / reliability table — the ER answer to "can I
    trust the likelihood ratio as a probability?": bucket scored pairs
    by exact integer LR decade (digits(score) - 1, no float log on
    any engine) and report the EMPIRICAL match rate per bucket against
    labeled/planted truth. A well-calibrated FS model shows the rate
    rising monotonically through the decades; a flat or inverted run
    of buckets is the first sign the conditional-independence
    assumption broke (correlated features double-count evidence).

    Returns (lr_decade, n_pairs, n_true, match_rate_qmicros) with the
    rate floor-quantized to micros in integer arithmetic.

    Scale notes: one map-side-combining groupBy on a <= 13-value key
    (decades of a 1e12-saturated score); nothing else.
    """
    dec = (
        F.length(F.col(score_col).cast("string")) - F.lit(1)
    ).cast("int")
    return (
        scored.groupBy(dec.alias("lr_decade"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(
                F.when(F.col(is_match_col), F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_true"),
        )
        .withColumn(
            "match_rate_qmicros",
            F.expr("(1000000 * n_true) div n_pairs").cast("long"),
        )
    )


def threshold_sweep(
    scored: DataFrame,
    score_col: str = "score",
    is_match_col: str = "is_match",
) -> DataFrame:
    """Full precision/recall/F1 curve over every distinct score
    threshold — the label-driven way to SET the match threshold the
    other operators consume (predict match iff score >= t). For each
    distinct score t, counts are cumulative from the top of the score
    order: tp = true pairs at or above t, fp = false pairs at or above
    t, fn = true pairs below t; precision/recall/F1 floor-quantized to
    micros in integer arithmetic (the repo-wide oracle contract).

    Scale notes (100 TB audit): pairs collapse FIRST to one row per
    distinct score (a combining groupBy with true/false subtotals —
    the curve's resolution, not the pair count, bounds everything
    downstream); the cumulative tp/fp then come from
    blocking.global_prefix_sum over the descending score order (range
    repartition + partition-local cumsum + broadcast offsets), never a
    single-partition window. Returns one row per distinct score:
    (threshold, tp, fp, fn, precision_qmicros, recall_qmicros,
    f1_qmicros).
    """
    from .blocking import global_prefix_sum

    per_score = (
        scored.groupBy(F.col(score_col).cast("long").alias("threshold"))
        .agg(
            F.sum(
                F.when(F.col(is_match_col), F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("_t"),
            F.sum(
                F.when(F.col(is_match_col), F.lit(0)).otherwise(F.lit(1))
            ).cast("long").alias("_f"),
        )
        .withColumn("_neg", -F.col("threshold"))
    )
    cum_t = global_prefix_sum(per_score, ["_neg"], "_t", out_col="tp")
    cum = global_prefix_sum(cum_t, ["_neg"], "_f", out_col="fp")
    total_true = scored.where(F.col(is_match_col)).count()
    return cum.select(
        "threshold",
        "tp",
        "fp",
        (F.lit(int(total_true)) - F.col("tp")).cast("long").alias("fn"),
        F.expr("(1000000 * tp) div (tp + fp)").cast("long").alias(
            "precision_qmicros"
        ),
        F.expr(f"(1000000 * tp) div {max(int(total_true), 1)}")
        .cast("long")
        .alias("recall_qmicros"),
        F.expr(
            f"(2000000 * tp) div (2 * tp + fp + ({int(total_true)} - tp))"
        )
        .cast("long")
        .alias("f1_qmicros"),
    )
