"""Unsupervised Fellegi-Sunter parameter estimation via EM.

q64 scores pairs with m/u probabilities estimated against a truth
proxy; the classic production alternative (Winkler '88, and what
splink/fastLink do) needs NO labels: treat match status as a latent
variable and run EM over the comparison-vector distribution. For K
binary agreement features the sufficient statistics are just the
2^K **pattern counts** — EM never touches pairs again after one
distributed aggregation.

Model (conditional independence / naive Bayes, the standard FS form):

    P(pattern g) = p * prod_k m_k^g_k (1-m_k)^(1-g_k)
                 + (1-p) * prod_k u_k^g_k (1-u_k)^(1-g_k)

E-step: responsibility r_g = P(match | g); M-step: m_k, u_k, p from
r-weighted pattern counts.

Fixed-point contract (what makes the DuckDB oracle compare exact):
every probability lives as integer micros in [0, 1e6]. Products fold
LEFT TO RIGHT with a floor division after each multiply:

    w_m(g) = fold(p,   t_1 .. t_K)   with t_k = m_k if g_k else 1e6-m_k
    w_u(g) = fold(1e6-p, ...)        where fold(a, t) = (a * t) // 1e6
    r_g    = (1e6 * w_m) // (w_m + w_u)     (0 when both weights
                                             underflow to 0)
    m_k'   = clamp( (1e6 * sum_g c_g*r_g*g_k)       // sum_g c_g*r_g )
    u_k'   = clamp( (1e6 * sum_g c_g*(1e6-r_g)*g_k) // sum_g c_g*(1e6-r_g) )
    p'     = clamp( sum_g c_g*r_g // N )

clamp keeps parameters in [1, 1e6-1] so no weight degenerates to an
exact 0/1 spike (the standard EM boundary guard). The fold order, the
floor after every multiply, and the clamp are part of the contract —
an oracle must replicate them verbatim, and then both engines do
exact int64 arithmetic end to end. Quantization cost: each fold step
loses < 1 micro, so estimates sit within ~K+1 micros of the real-
valued EM fixpoint per iteration — noise far below estimation error.

Int64 domain: the largest intermediate is 1e6 * sum(c_g * r_g)
<= 1e12 * N_pairs, safe through N ~ 9e6 pairs... which is why the
driver-side sums below run on PYTHON ints (arbitrary precision), not
in Spark: only the pattern counts (<= 2^K rows) are computed
distributed and collected; the EM loop is O(2^K * K * n_iter) integer
ops on the driver, independent of corpus size. At 10^12 candidate
pairs the aggregation is still one map-side-combining groupBy of K
booleans; the collect is still <= 2^K rows. (An oracle engine doing
the same sums in int64/int128 matches exactly as long as
1e12 * N_pairs fits — document N when porting.)

Reference parity: estimates the same (m, u, p) the Fellegi-Sunter
likelihood-ratio scorer consumes (q64 / operators docstrings cite
reference semantics); sassy itself has no probabilistic layer — this
is part of the cluster-scale ER reimagining, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def pattern_counts(pairs: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Distributed sufficient statistics: one row per agreement pattern.

    Columns: the K boolean features + ``c`` (long). At most 2^K rows
    regardless of input size; the groupBy combines map-side.
    """
    keys = [F.col(c).cast("boolean").alias(c) for c in feature_cols]
    return pairs.groupBy(*keys).agg(F.count("*").alias("c"))


def _clamp(x: int) -> int:
    return max(1, min(_M - 1, x))


def em_step(
    patterns: list[tuple[tuple[bool, ...], int]],
    m: list[int],
    u: list[int],
    p: int,
) -> tuple[list[int], list[int], int]:
    """One fixed-point EM iteration over pattern counts (pure ints)."""
    k_n = len(m)
    sr = 0
    snr = 0
    n = 0
    srk = [0] * k_n
    snrk = [0] * k_n
    for g, c in patterns:
        wm = p
        wu = _M - p
        for k in range(k_n):
            wm = (wm * (m[k] if g[k] else _M - m[k])) // _M
            wu = (wu * (u[k] if g[k] else _M - u[k])) // _M
        r = (_M * wm) // (wm + wu) if (wm + wu) > 0 else 0
        n += c
        sr += c * r
        snr += c * (_M - r)
        for k in range(k_n):
            if g[k]:
                srk[k] += c * r
                snrk[k] += c * (_M - r)
    m2 = [
        _clamp((_M * srk[k]) // sr) if sr > 0 else m[k] for k in range(k_n)
    ]
    u2 = [
        _clamp((_M * snrk[k]) // snr) if snr > 0 else u[k]
        for k in range(k_n)
    ]
    p2 = _clamp(sr // n) if n > 0 else p
    return m2, u2, p2


_LR_CAP = 1_000_000_000_000  # 1e12 micros = likelihood ratio 1e6


def fs_score(
    pairs: DataFrame,
    params: DataFrame,
    feature_cols: list[str],
    lr_col: str = "lr_qmicros",
) -> DataFrame:
    """Score pairs with the FS likelihood ratio from fitted parameters.

    The consumer of :func:`em_fit`: for each pair, the match/non-match
    likelihood ratio under conditional independence,

        LR = prod_k (m_k / u_k)^g_k * ((1-m_k) / (1-u_k))^(1-g_k)

    folded in fixed point exactly like the fit: start at 1e6 micros,
    then per feature ``lr = (lr * num_k) // den_k`` with num/den the
    agreeing or disagreeing (m, u) sides, SATURATED at 1e12 micros
    after every step (LR 1e6 — beyond any decision threshold). The cap
    is part of the contract: it both bounds the largest intermediate at
    1e12 * 1e6 < 2^63 (no overflow however extreme the u's) and makes
    the fold exactly reproducible in any integer engine. Fold order =
    ``feature_cols`` order. ``em_fit``'s [1, 1e6-1] clamp guarantees
    den_k >= 1.

    params: the (feature, m_qmicros, u_qmicros, ...) frame from
    em_fit — K rows, collected driver-side (tiny) and inlined as
    literals so the scoring projection is a single JVM-side select
    over the pairs; no join, no UDF.

    Returns ``pairs`` with ``lr_col`` appended (long).
    """
    rows = {r["feature"]: r for r in params.collect()}
    missing = [c for c in feature_cols if c not in rows]
    if missing:
        raise ValueError(f"params missing features: {missing}")
    e = f"CAST({_M} AS BIGINT)"
    for c in feature_cols:
        m_k = int(rows[c]["m_qmicros"])
        u_k = int(rows[c]["u_qmicros"])
        num = f"(CASE WHEN `{c}` THEN {m_k} ELSE {_M - m_k} END)"
        den = f"(CASE WHEN `{c}` THEN {u_k} ELSE {_M - u_k} END)"
        e = (
            f"LEAST(({e} * CAST({num} AS BIGINT))"
            f" div CAST({den} AS BIGINT), CAST({_LR_CAP} AS BIGINT))"
        )
    return pairs.withColumn(lr_col, F.expr(e).cast("long"))


def em_fit(
    pairs: DataFrame,
    feature_cols: list[str],
    n_iter: int = 2,
    m_init: int = 900_000,
    u_init: int = 100_000,
    p_init: int = 100_000,
) -> DataFrame:
    """Fit FS parameters by EM; returns one row per feature.

    Columns: feature (string), m_qmicros, u_qmicros, p_qmicros (longs;
    p repeated on every row). The ONLY driver-side data is the <= 2^K
    pattern-count rows — see module docstring for the scale argument.
    """
    rows = pattern_counts(pairs, feature_cols).collect()
    patterns = [
        (tuple(bool(r[c]) for c in feature_cols), int(r["c"])) for r in rows
    ]
    m = [int(m_init)] * len(feature_cols)
    u = [int(u_init)] * len(feature_cols)
    p = int(p_init)
    for _ in range(int(n_iter)):
        m, u, p = em_step(patterns, m, u, p)
    spark = pairs.sparkSession
    out = [
        (feature_cols[k], m[k], u[k], p) for k in range(len(feature_cols))
    ]
    return spark.createDataFrame(
        out, "feature string, m_qmicros long, u_qmicros long, p_qmicros long"
    )


def em_step_levels(
    patterns: list[tuple[tuple[int, ...], int]],
    m: list[list[int]],
    u: list[list[int]],
    p: int,
) -> tuple[list[list[int]], list[list[int]], int]:
    """One fixed-point EM iteration over MULTI-LEVEL pattern counts.

    The production Fellegi-Sunter form (Winkler): each comparison
    feature takes one of L ordered agreement levels (disagree /
    close / agree ...), and the model keeps a probability per
    (feature, level) for each class: m[k][l] = P(gamma_k = l | match),
    u[k][l] = P(gamma_k = l | non-match). The binary :func:`em_step`
    is the L=2 special case. Same fixed-point contract: micros,
    floor after every multiply, [1, 1e6-1] clamp; per-class level
    probabilities are re-estimated from responsibility-weighted level
    counts, so no explicit normalization step exists to drift.
    """
    k_n = len(m)
    sr = 0
    snr = 0
    n = 0
    srk = [[0] * len(m[k]) for k in range(k_n)]
    snrk = [[0] * len(u[k]) for k in range(k_n)]
    for g, c in patterns:
        wm = p
        wu = _M - p
        for k in range(k_n):
            wm = (wm * m[k][g[k]]) // _M
            wu = (wu * u[k][g[k]]) // _M
        r = (_M * wm) // (wm + wu) if (wm + wu) > 0 else 0
        n += c
        sr += c * r
        snr += c * (_M - r)
        for k in range(k_n):
            srk[k][g[k]] += c * r
            snrk[k][g[k]] += c * (_M - r)
    m2 = [
        [
            _clamp((_M * srk[k][l]) // sr) if sr > 0 else m[k][l]
            for l in range(len(m[k]))
        ]
        for k in range(k_n)
    ]
    u2 = [
        [
            _clamp((_M * snrk[k][l]) // snr) if snr > 0 else u[k][l]
            for l in range(len(u[k]))
        ]
        for k in range(k_n)
    ]
    p2 = _clamp(sr // n) if n > 0 else p
    return m2, u2, p2


def em_fit_levels(
    pairs: DataFrame,
    level_cols: list[str],
    n_levels: int,
    n_iter: int = 2,
    m_init: list[int] | None = None,
    u_init: list[int] | None = None,
    p_init: int = 100_000,
) -> DataFrame:
    """Fit multi-level FS parameters by EM; one row per (feature, level).

    ``level_cols`` hold small ints in [0, n_levels) (level 0 =
    strongest disagreement by convention). Initial per-level
    probabilities default to a linear ramp (ascending for m,
    descending for u) — pass explicit ``m_init`` / ``u_init`` micros
    when an oracle must replicate the run (the inits are part of the
    fixed-point contract). Columns: feature, level, m_qmicros,
    u_qmicros, p_qmicros (p repeated).

    Scale: identical to :func:`em_fit` — ONE map-side-combining
    groupBy reduces any corpus to <= n_levels^K pattern counts; the
    loop is driver-side integer ops on those counts.
    """
    if m_init is None:
        denom = n_levels * (n_levels + 1) // 2
        m_init = [(_M * (l + 1)) // denom for l in range(n_levels)]
    if u_init is None:
        denom = n_levels * (n_levels + 1) // 2
        u_init = [
            (_M * (n_levels - l)) // denom for l in range(n_levels)
        ]
    keys = [F.col(c).cast("int").alias(c) for c in level_cols]
    rows = pairs.groupBy(*keys).agg(F.count("*").alias("c")).collect()
    patterns = [
        (tuple(int(r[c]) for c in level_cols), int(r["c"])) for r in rows
    ]
    for g, _ in patterns:
        if any(l < 0 or l >= n_levels for l in g):
            raise ValueError(f"level out of range in pattern {g}")
    m = [list(m_init) for _ in level_cols]
    u = [list(u_init) for _ in level_cols]
    p = int(p_init)
    for _ in range(int(n_iter)):
        m, u, p = em_step_levels(patterns, m, u, p)
    spark = pairs.sparkSession
    out = [
        (level_cols[k], l, m[k][l], u[k][l], p)
        for k in range(len(level_cols))
        for l in range(n_levels)
    ]
    return spark.createDataFrame(
        out,
        "feature string, level int, m_qmicros long, u_qmicros long,"
        " p_qmicros long",
    )


def value_frequency_u(
    records: DataFrame, field_col: str
) -> DataFrame:
    """Value-specific u-probabilities (Winkler frequency adjustment,
    the fastLink ``term frequency`` option): for each distinct value v
    of ``field_col``,

        u_v = P(random pair agrees AND shares v)
            = c_v * (c_v - 1) / (N * (N - 1))

    in floor-micros, clamped to >= 1 (a unique value has u_v = 0
    analytically; the clamp keeps the likelihood ratio finite, same
    boundary guard as EM). Agreeing on a RARE value is much stronger
    match evidence than agreeing on a common one — the global-u FS
    scorer (fs_score) treats "both named Smith" and "both named
    Xylophanes" identically; this operator does not.

    Returns (value, c, u_qmicros); NULL field values are excluded
    (NULL agrees with nothing). Scale: ONE map-side-combining groupBy
    on the field; N comes from summing the counts frame itself — no
    second pass over the records. Int64 domain: 1e6 * c_v * (c_v - 1)
    needs c_v <= ~3e6 per value and N <= ~3e9 overall; beyond that,
    swap the micros product to decimal(38,0) (same escape hatch as
    evaluation.adjusted_rand).
    """
    counts = (
        records.where(F.col(field_col).isNotNull())
        .groupBy(F.col(field_col).alias("value"))
        .agg(F.count("*").alias("c"))
    )
    tot = counts.agg(F.sum("c").alias("n"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "value",
        "c",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(
                "(CAST(1000000 AS BIGINT) * c * (c - 1))"
                " div (n * (n - 1))"
            ),
        )
        .cast("long")
        .alias("u_qmicros"),
    )


def frequency_adjusted_weights(
    pairs: DataFrame,
    records: DataFrame,
    field_col: str,
    m_qmicros: int,
    url: str = "url",
    pair_a: str = "url_a",
    pair_b: str = "url_b",
) -> DataFrame:
    """Score pairs with frequency-adjusted FS agreement weights.

    For a pair agreeing on field value v:
        lr = min((1e6 * m) // u_v, 1e12)        (rare v -> huge lr)
    for a disagreeing (or NULL-valued) pair:
        lr = (1e6 * (1e6 - m)) // (1e6 - u_glob)
    where u_glob = sum_v u_v-mass = (1e6 * sum_v c_v*(c_v-1))
    // (N*(N-1)) — the probability a random pair agrees at all, the
    exact global u the unadjusted scorer would use (clamped to
    <= 1e6 - 1 so the disagreement denominator stays positive).

    Same saturation contract as fs_score (cap 1e12 after the divide).
    u_glob folds in as a LITERAL: the aggregate is one row, collected
    driver-side (bounded), so the scoring projection stays a pure
    JVM-side select + one equi-join on the value (broadcast when the
    value dictionary is small). Returns pairs + (agrees boolean,
    u_qmicros, lr_qmicros); u_qmicros is NULL for disagreeing pairs.
    """
    u_df = value_frequency_u(records, field_col)
    row = u_df.agg(
        F.sum(F.col("c") * (F.col("c") - 1)).alias("sa"),
        F.sum("c").alias("n"),
    ).collect()[0]
    sa, n = int(row["sa"] or 0), int(row["n"] or 0)
    u_glob = (
        min((_M * sa) // (n * (n - 1)), _M - 1) if n > 1 else 1
    )
    dis_lr = min((_M * (_M - m_qmicros)) // (_M - u_glob), 10**12)
    fields = records.select(
        F.col(url).alias("_u"), F.col(field_col).alias("_v")
    )
    sides = (
        pairs.join(
            fields.withColumnRenamed("_u", pair_a).withColumnRenamed(
                "_v", "_va"
            ),
            pair_a,
            "left",
        ).join(
            fields.withColumnRenamed("_u", pair_b).withColumnRenamed(
                "_v", "_vb"
            ),
            pair_b,
            "left",
        )
    )
    agrees = (
        F.col("_va").isNotNull()
        & F.col("_vb").isNotNull()
        & (F.col("_va") == F.col("_vb"))
    )
    joined = sides.withColumn("agrees", agrees).join(
        u_df.select(F.col("value").alias("_va"), "u_qmicros"),
        "_va",
        "left",
    )
    return joined.select(
        *[F.col(c) for c in pairs.columns],
        "agrees",
        F.when(F.col("agrees"), F.col("u_qmicros"))
        .cast("long")
        .alias("u_qmicros"),
        F.when(
            F.col("agrees"),
            F.least(
                F.expr(
                    f"(CAST(1000000 AS BIGINT)"
                    f" * CAST({int(m_qmicros)} AS BIGINT))"
                    f" div u_qmicros"
                ),
                F.lit(10**12).cast("long"),
            ),
        )
        .otherwise(F.lit(int(dis_lr)).cast("long"))
        .alias("lr_qmicros"),
    )


def fs_score_levels(
    pairs: DataFrame,
    params: DataFrame,
    level_cols: list[str],
    lr_col: str = "lr_qmicros",
) -> DataFrame:
    """Score pairs with the MULTI-LEVEL FS likelihood ratio — the
    consumer of :func:`em_fit_levels`, and the standard way to handle
    MISSING comparisons: give "missing" its own agreement level, and
    EM drives that level's m and u together (P(missing) is roughly
    class-independent under MAR), so its factor m/u ≈ 1 and a missing
    field neither supports nor opposes the match — the
    pairwise-deletion behavior of production linkers, derived rather
    than hardcoded.

    Fold contract (identical shape to :func:`fs_score`): start at 1e6
    micros; per feature in ``level_cols`` order,
    ``lr = least((lr * m[k][level]) div u[k][level], 1e12)``.
    ``em_fit_levels``' clamp guarantees every u >= 1. Params are
    collected driver-side (n_features x n_levels rows, tiny) and
    inlined as CASE literals — single JVM-side projection, no join,
    no UDF.
    """
    rows = params.collect()
    table: dict[str, dict[int, tuple[int, int]]] = {}
    for r in rows:
        table.setdefault(r["feature"], {})[int(r["level"])] = (
            int(r["m_qmicros"]),
            int(r["u_qmicros"]),
        )
    missing = [c for c in level_cols if c not in table]
    if missing:
        raise ValueError(f"params missing features: {missing}")
    e = f"CAST({_M} AS BIGINT)"
    for c in level_cols:
        levels = table[c]
        num = (
            "(CASE "
            + " ".join(
                f"WHEN `{c}` = {l} THEN {mu[0]}"
                for l, mu in sorted(levels.items())
            )
            + " ELSE 1 END)"
        )
        den = (
            "(CASE "
            + " ".join(
                f"WHEN `{c}` = {l} THEN {mu[1]}"
                for l, mu in sorted(levels.items())
            )
            + " ELSE 1 END)"
        )
        e = (
            f"LEAST(({e} * CAST({num} AS BIGINT))"
            f" div CAST({den} AS BIGINT), CAST({_LR_CAP} AS BIGINT))"
        )
    return pairs.withColumn(lr_col, F.expr(e).cast("long"))
