"""Classic record-linkage blocking strategies beyond host/MinHash-LSH.

Three textbook blocking families that complement `linkage.blocking_keys`
(URL-host + MinHash bands) for the stage-1 candidate generation of an
entity-resolution pipeline:

- **phonetic blocking** (`phonetic_key`): a Soundex-family code over a
  short name-like field, as a pure Catalyst column expression — records
  whose names sound alike land in the same block even when spelled
  differently. The exact algorithm is specified below so the DuckDB
  oracle can express the identical regexp/translate chain.
- **sorted-neighborhood** (Hernandez & Stolfo, SIGMOD '95)
  (`global_rank` + `sorted_neighborhood_pairs`): sort the corpus by a
  fuzzy key and pair every record with its `window` successors in the
  global order. The global rank is computed scale-safely (range
  repartition + per-partition row_number + cumulative offsets — never a
  single-partition global window), and the windowed self-join is an
  equi-join on integer rank after a bounded `explode` fan-out.
- **meta-blocking / CBS pruning** (Papadakis et al., TKDE '14)
  (`cbs_pairs`): given a many-to-many (record, block) table from any
  mix of blocking schemes, weight each candidate pair by the number of
  blocks it co-occurs in (Common Blocks Scheme) and keep only pairs
  above a threshold — the standard way to prune the candidate explosion
  of cheap blocking keys before the expensive pairwise scorer runs.

Scale notes (100 TB audit):
- `phonetic_key` is pure JVM-side Catalyst (translate + regexp chain),
  no UDF, no shuffle of its own;
- `global_rank`'s only driver-side collect is one row per partition
  (bounded by the partition count, never by data size);
- `sorted_neighborhood_pairs` shuffles (rank, id) integer pairs only —
  the fan-out is exactly `window` rows per record, and the join is an
  integer equi-join that AQE can freely re-plan;
- `cbs_pairs` caps every block at `max_block_size` BEFORE the
  within-block self-join (skipped mega-blocks are the caller's signal
  to refine that scheme), so the pair expansion per block is bounded by
  max_block_size**2 regardless of key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Soundex-style consonant classes for A..Z (vowels + H/W/Y -> 0):
# B F P V -> 1, C G J K Q S X Z -> 2, D T -> 3, L -> 4, M N -> 5, R -> 6
_PHONETIC_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_PHONETIC_TO = "01230120022455012623010202"


def phonetic_key(col: Column) -> Column:
    """Soundex-family phonetic blocking key, pure Catalyst.

    Exact spec (deterministic, mirrored 1:1 by the DuckDB oracle in
    `__spark_entry__.oracle_sql()['q71_phonetic_blocking']`):

    1. uppercase, strip every character outside A-Z;
    2. key head = first remaining letter;
    3. map the REST through the Soundex consonant classes
       (``_PHONETIC_FROM`` -> ``_PHONETIC_TO``);
    4. collapse runs of the same non-zero digit to one digit
       (adjacent-equal collapse only — unlike classic Soundex this spec
       does NOT merge across H/W separators, and does NOT drop a first
       digit equal to the head letter's class);
    5. drop the zeros (vowels/H/W/Y);
    6. head + digits, truncated/right-padded with '0' to 4 chars.
       An input with no A-Z letters at all keys to '0000'.
    """
    s = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    digits = F.translate(F.substring(s, 2, 1 << 30), _PHONETIC_FROM, _PHONETIC_TO)
    for d in "123456":
        digits = F.regexp_replace(digits, d + "{2,}", d)
    digits = F.regexp_replace(digits, "0", "")
    key = F.rpad(
        F.substring(F.concat(F.substring(s, 1, 1), digits), 1, 4), 4, "0"
    )
    return F.when(s == F.lit(""), F.lit("0000")).otherwise(key)


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based global rank by ``order_cols``, scale-safe.

    `row_number().over(Window.orderBy(...))` with no partitionBy pulls
    the whole frame through ONE partition — the classic driver-shaped
    bottleneck. This does it the distributed way:

    1. `repartitionByRange(order_cols)` — contiguous, ordered ranges
       (partition i's keys all sort <= partition i+1's);
    2. per-partition `row_number` (window partitioned by the physical
       partition id — parallel, no global shuffle);
    3. per-partition counts -> cumulative offsets, collected to the
       driver (one row PER PARTITION, bounded by the partition count)
       and joined back as a broadcast.

    ``order_cols`` must be a total order (append a unique id as the
    last column) or ranks of tied rows are partition-placement
    dependent.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    d = d.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    d = d.withColumn("_rn", F.row_number().over(w)).persist()
    # one row per physical partition — driver-bounded by design
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    if not offsets:  # empty input: rank column exists, zero rows
        d.unpersist()
        return df.withColumn(rank_col, F.lit(0).cast("long")).limit(0)
    off = spark.createDataFrame(offsets, ["_pid", "_off"])
    out = (
        d.join(F.broadcast(off), "_pid")
        .withColumn(rank_col, (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )
    d.unpersist()
    return out


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
    window: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs: every record pairs with its
    `window` successors in the global (key_cols, id_col) order.

    Returns (id_a, id_b, gap) where gap in [1, window] is the rank
    distance. The id tie-break makes the order total, so the pair set
    is deterministic. The windowed self-join is expressed as a bounded
    explode (each record emits `window` integer probe ranks) followed
    by an integer equi-join — one shuffle of (rank, id) pairs, no range
    join, no single-partition window.
    """
    ranked = global_rank(
        df.select(id_col, *key_cols),
        [*key_cols, id_col],
        num_partitions=num_partitions,
    ).select(id_col, "rank")
    probes = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("rank").alias("rank_a"),
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + window)
        ).alias("rank"),
    )
    return (
        probes.join(
            ranked.select(F.col(id_col).alias("id_b"), "rank"), "rank"
        )
        .select(
            "id_a",
            "id_b",
            (F.col("rank") - F.col("rank_a")).cast("long").alias("gap"),
        )
    )


def cbs_pairs(
    doc_blocks: DataFrame,
    id_col: str = "id",
    block_col: str = "block",
    min_common: int = 2,
    max_block_size: int = 4096,
) -> DataFrame:
    """Meta-blocking with Common-Blocks-Scheme weighting.

    ``doc_blocks``: many-to-many (id, block) rows from any mix of
    blocking schemes (phonetic keys, hosts, LSH bands, length buckets).
    Emits (id_a, id_b, cbs) with id_a < id_b and cbs = number of
    distinct blocks the pair shares, keeping only cbs >= min_common —
    the agreement-across-schemes prune that cuts cheap-key false
    candidates before pairwise scoring.

    Blocks larger than ``max_block_size`` are dropped BEFORE the
    self-join (a stop-key, same rationale as candidate_pairs'
    max_block_size): a mega-block is a degenerate key whose pairs
    would dominate the shuffle without adding discriminative weight.
    """
    db = doc_blocks.select(
        F.col(id_col).alias("_id"), F.col(block_col).alias("_blk")
    ).dropDuplicates(["_id", "_blk"])
    sizes = db.groupBy("_blk").agg(F.count("*").alias("_bs"))
    db = db.join(
        sizes.where(F.col("_bs") <= max_block_size).select("_blk"), "_blk"
    )
    a = db.select(F.col("_blk"), F.col("_id").alias("id_a"))
    b = db.select(F.col("_blk"), F.col("_id").alias("id_b"))
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("cbs"))
        .where(F.col("cbs") >= min_common)
    )


def prefix_filter_pairs(
    tokens: DataFrame,
    id_col: str = "id",
    token_col: str = "token",
    threshold: float = 0.7,
) -> DataFrame:
    """Prefix-filter candidate generation for a Jaccard set-similarity
    join (the PPJoin family: Chaudhuri et al. ICDE'06 prefix filter,
    Xiao et al. WWW'08).

    ``tokens``: (id, token) rows — one row per distinct token of each
    record's token set (duplicates are dropped defensively). For a
    Jaccard threshold ``t``, every record keeps only the first
    ``n - ceil(t*n) + 1`` of its ``n`` tokens in the GLOBAL rarity
    order (ascending document frequency, ties by token string);
    candidates are the distinct pairs sharing at least one prefix
    token, further pruned by the length filter
    ``min(n_a, n_b) >= t * max(n_a, n_b)``.

    Completeness guarantee (why the prefix is sound): if
    J(A, B) >= t then |A ∩ B| >= ceil(t * max(|A|, |B|)), so A and B
    cannot disagree on ALL of their first ``n - ceil(t*n) + 1`` tokens
    of any shared total order — they must share a prefix token. Every
    qualifying pair therefore survives; the filter only prunes pairs
    that provably cannot reach the threshold. Verification (actual
    Jaccard on the survivors) is the caller's stage-2 scorer, e.g.
    ``dedup.ngram_jaccard_verify``.

    Scale notes (100 TB audit):
    - the document-frequency table is vocabulary-sized (a dimension),
      joined on token — Catalyst broadcasts it when small and
      sort-merges beyond that;
    - the per-record rarity sort is a window partitioned by id — one
      shuffle of (id, token, df) rows, never a global sort;
    - the candidate self-join keys on PREFIX tokens only, which are by
      construction the rarest ~(1-t) fraction of each record's tokens:
      hot tokens are excluded from the join key exactly because a
      common token is never in a short prefix — the prefix filter is
      inherently skew-resistant, no salting needed;
    - output pairs are distinct (id_a < id_b) narrow integer/string
      rows.
    """
    tok = tokens.select(
        F.col(id_col).alias("_id"), F.col(token_col).alias("_tok")
    ).dropDuplicates(["_id", "_tok"])
    n = tok.groupBy("_id").agg(F.count("*").alias("_n"))
    dfreq = tok.groupBy("_tok").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "_tok")
    ranked = (
        tok.join(dfreq, "_tok")
        .join(n, "_id")
        .withColumn("_rk", F.row_number().over(w))
    )
    prefix = ranked.where(
        F.col("_rk")
        <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
    )
    a = prefix.select(
        F.col("_id").alias("id_a"), "_tok", F.col("_n").alias("_na")
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), "_tok", F.col("_n").alias("_nb")
    )
    return (
        a.join(b, "_tok")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.least("_na", "_nb")
            >= F.lit(threshold) * F.greatest("_na", "_nb")
        )
        .select("id_a", "id_b")
        .distinct()
    )


def scheme_stats(
    doc_blocks: DataFrame,
    truth_pairs: DataFrame,
    n_records: int,
    id_col: str = "id",
    scheme_col: str = "scheme",
    block_col: str = "block",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Comparative blocking-quality statistics per scheme.

    The standard way to CHOOSE a blocking key (Christen's survey
    terminology): for each candidate scheme, the two numbers that
    matter are

    - **reduction ratio** RR = 1 - comparisons / C(N, 2): how much of
      the quadratic pair space the scheme prunes. ``comparisons`` is
      sum over the scheme's blocks of C(block_size, 2) — counted WITH
      multiplicity if a record sits in several blocks of one scheme
      (multi-block schemes can drive RR negative; that is the signal
      they over-generate).
    - **pairs completeness** PC = covered / |truth|: the fraction of
      known matching pairs the scheme co-blocks at all — blocking
      RECALL; a fast scheme that separates true matches is worthless.

    doc_blocks: (id, scheme, block) — many rows per record, one per
    scheme membership. truth_pairs: (id_a, id_b) labeled/derived match
    pairs. ``n_records`` is the corpus size for the RR denominator
    (pass it in; the operator must not guess the corpus from the
    blocks table, which may already be filtered).

    Returns one row per scheme: (scheme, n_blocks, max_block_size,
    comparisons, covered_truth, total_truth, pc_qmicros, rr_qmicros)
    — the ratios floor-quantized to micros with integer arithmetic
    (rr_qmicros = 1e6 - (1e6*comparisons) div C(N,2), exact on both
    engines).

    Scale notes (100 TB audit): sizes and comparisons are map-side-
    combining groupBys of (scheme, block); coverage joins each truth
    pair to its two membership lists and dedups (scheme, pair) — the
    fan-out is bounded by blocks-per-record per side, NEVER block
    size, so a mega-block costs nothing here (it just loses RR);
    everything downstream of the joins is one row per scheme.
    """
    db = doc_blocks.select(
        F.col(id_col).alias("_id"),
        F.col(scheme_col).alias("_sch"),
        F.col(block_col).alias("_blk"),
    ).dropDuplicates(["_id", "_sch", "_blk"])
    sizes = db.groupBy("_sch", "_blk").agg(F.count("*").alias("_s"))
    per = sizes.groupBy("_sch").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.max("_s").cast("long").alias("max_block_size"),
        F.sum(F.expr("(_s * (_s - 1)) div 2")).cast("long").alias(
            "comparisons"
        ),
    )
    t = truth_pairs.select(
        F.col(id_a).alias("_ta"), F.col(id_b).alias("_tb")
    )
    cov = (
        t.join(
            db.select(
                F.col("_id").alias("_ta"), "_sch", "_blk"
            ),
            "_ta",
        )
        .join(
            db.select(
                F.col("_id").alias("_tb"),
                F.col("_sch").alias("_sch2"),
                F.col("_blk").alias("_blk2"),
            ),
            "_tb",
        )
        .where(
            (F.col("_sch2") == F.col("_sch"))
            & (F.col("_blk2") == F.col("_blk"))
        )
        .select("_sch", "_ta", "_tb")
        .distinct()
        .groupBy("_sch")
        .agg(F.count("*").cast("long").alias("covered_truth"))
        .withColumnRenamed("_sch", "_sch_cov")
    )
    total = t.agg(F.count("*").cast("long").alias("total_truth"))
    total_pairs = int(n_records) * (int(n_records) - 1) // 2
    z = F.lit(0).cast("long")
    return (
        per.join(cov, per["_sch"] == cov["_sch_cov"], "left")
        .drop("_sch_cov")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("_sch").alias("scheme"),
            "n_blocks",
            "max_block_size",
            "comparisons",
            F.coalesce("covered_truth", z).alias("covered_truth"),
            "total_truth",
            F.when(
                F.col("total_truth") > 0,
                F.expr("(1000000 * coalesce(covered_truth, 0))"
                       " div total_truth"),
            ).otherwise(z).alias("pc_qmicros"),
            (
                F.lit(1_000_000).cast("long")
                - F.expr(f"(1000000 * comparisons) div {total_pairs}")
            ).cast("long").alias("rr_qmicros"),
        )
    )


def _pj_base(records: DataFrame, id_col: str, key_col: str, k: int) -> DataFrame:
    """(_id, _key, _len) rows, keys shorter than k+1 excluded."""
    key = F.col(key_col)
    return records.where(F.length(key) >= k + 1).select(
        F.col(id_col).alias("_id"),
        key.alias("_key"),
        F.length(key).alias("_len"),
    )


def _pj_index(base: DataFrame, k: int) -> DataFrame:
    """The k+1 even-partition segments with their start offsets."""
    k1 = k + 1
    seg_expr = (
        f"transform(sequence(0, {k}), i -> struct("
        f" 1 + i * (_len div {k1})"
        f"   + greatest(0, i - ({k1} - _len % {k1})) AS start,"
        f" (_len div {k1})"
        f"   + if(i >= {k1} - _len % {k1}, 1, 0) AS len))"
    )
    return base.select(
        F.col("_id").alias("id_i"),
        F.col("_len").alias("len_i"),
        F.col("_key"),
        F.explode(F.expr(seg_expr)).alias("_s"),
    ).select(
        "id_i",
        "len_i",
        F.expr("substring(_key, _s.start, _s.len)").alias("_seg"),
        F.col("_s.start").alias("start_i"),
    )


def _pj_probe(base: DataFrame, k: int) -> DataFrame:
    """Every substring whose length can be a segment length of a
    partner within the +-k length band."""
    k1 = k + 1
    sub_expr = (
        f"flatten(transform("
        f" sequence(greatest(1, (_len - {k}) div {k1}),"
        f"          (_len + {k}) div {k1} + 1),"
        f" m -> transform(sequence(1, greatest(_len - m + 1, 0)),"
        f"   p -> struct(substring(_key, p, m) AS sub, p AS pos))))"
    )
    return base.select(
        F.col("_id").alias("id_p"),
        F.col("_len").alias("len_p"),
        F.explode(F.expr(sub_expr)).alias("_q"),
    ).select(
        "id_p",
        "len_p",
        F.col("_q.sub").alias("_seg"),
        F.col("_q.pos").alias("pos_p"),
    )


def passjoin_pairs(
    records: DataFrame,
    id_col: str = "id",
    key_col: str = "key",
    k: int = 2,
) -> DataFrame:
    """Pass-Join: exact partition-based edit-distance similarity
    self-join (Li, Deng & Feng, "PASS-JOIN: A Partition-based Method
    for Similarity Joins", PVLDB 5(3) 2011). Complements the FILTERING
    families (prefix q75, suffix q108, LSH q20) with the classic
    LOSSLESS segment scheme: the output is provably the full set of
    pairs within edit distance ``k`` — no recall knob, no cap.

    How: each key of length L is split into ``k+1`` contiguous
    segments by the even-partition scheme (first ``(k+1) - L%(k+1)``
    segments of length ``L div (k+1)``, the rest one longer). By
    pigeonhole, k edit operations can touch at most k segments, so any
    partner within distance k contains at least one segment VERBATIM,
    and (each edit shifts downstream positions by at most one) that
    occurrence starts within ``k`` of the segment's own start. The
    plan:

    1. index side: ``k+1`` (segment, start) rows per record — bounded
       explode, pure Catalyst;
    2. probe side: every substring of each key whose length could be a
       segment length of a partner with ``|L_a - L_b| <= k`` — lengths
       span ``(L-k) div (k+1)`` .. ``(L+k) div (k+1) + 1``, so
       ~``(2k/(k+1) + 2) * L`` rows per record (O(k*L) like the paper's
       substring selection; its tighter multi-match window is an
       optimization, not a correctness requirement);
    3. equi-join on the substring VALUE with the position filter
       ``|start_probe - start_index| <= k`` and length filter
       ``|L_a - L_b| <= k`` folded into the join condition — both
       filters are sound per the pigeonhole argument, so no true pair
       is lost;
    4. canonical a<b dedup, then exact verification with the built-in
       banded ``levenshtein(a, b, k)`` (JVM-side, early-exits above
       the threshold).

    Keys shorter than ``k+1`` characters cannot host ``k+1`` non-empty
    segments and are excluded (document upstream, or pad).

    Returns ``(id_a, id_b, ed)`` with ``id_a < id_b`` and ``ed <= k``
    — byte-for-byte the brute-force all-pairs result, which is exactly
    what the DuckDB oracle recomputes.

    Scale notes (100 TB audit): both explodes are bounded (k+1 and
    O(k*L) rows/record); the join keys on short substrings PLUS the
    equi-joinable attributes, and hot segment values spread across
    start positions; verification is a narrow-pair join back to the
    keys followed by a codegen'd banded levenshtein — no UDF anywhere.
    Worst-case hot segments (a corpus of near-identical keys) degrade
    to the true pair count, which is the OUTPUT size — inherent to a
    lossless join, not a plan defect.
    """
    base = _pj_base(records, id_col, key_col, k)
    idx = _pj_index(base, k)
    probe = _pj_probe(base, k)
    cand = (
        probe.join(
            idx,
            (probe["_seg"] == idx["_seg"])
            # strict <: the segment pigeonhole holds for EITHER side as
            # the indexed one (k edits between a and b destroy <= k of
            # WHICHEVER key's k+1 segments, so the other key contains one
            # of them verbatim within +-k positions) — fixing min-id as
            # the probe emits each candidate in one orientation instead
            # of two and halves the join output feeding the distinct
            # (round 6; candidate true-pair coverage unchanged, pinned by
            # the brute-force test + oracle)
            & (F.abs(F.col("pos_p") - F.col("start_i")) <= k)
            & (F.abs(F.col("len_p") - F.col("len_i")) <= k)
            & (F.col("id_p") < F.col("id_i")),
        )
        .select(
            F.col("id_p").alias("id_a"),
            F.col("id_i").alias("id_b"),
        )
        .distinct()
    )
    ka = base.select(F.col("_id").alias("id_a"), F.col("_key").alias("_ka"))
    kb = base.select(F.col("_id").alias("id_b"), F.col("_key").alias("_kb"))
    # banded verify: levenshtein(_, _, k) returns -1 above the threshold
    return (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .withColumn("ed", F.levenshtein("_ka", "_kb", k))
        .where(F.col("ed") >= 0)
        .select("id_a", "id_b", "ed")
    )


def passjoin_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "id",
    key_col: str = "key",
    k: int = 2,
) -> DataFrame:
    """Bipartite (R-S) Pass-Join: all (left, right) pairs within edit
    distance ``k`` between TWO tables — same lossless segment scheme
    as :func:`passjoin_pairs`, indexing the RIGHT side's ``k+1``
    segments and probing with the LEFT side's substrings. The
    incremental-ER workhorse: a small new batch probes a large indexed
    corpus (or its entity representatives) without any self-join over
    the corpus, so per-batch cost scales with the batch, not the
    accumulated data.

    Returns ``(id_l, id_r, ed)`` with ``ed <= k`` — exactly the
    brute-force cross levenshtein result (same pigeonhole + position +
    length filter soundness as the self-join variant). Ids may collide
    across the two tables; no canonicalization is applied.
    """
    lbase = _pj_base(left, id_col, key_col, k)
    rbase = _pj_base(right, id_col, key_col, k)
    probe = _pj_probe(lbase, k)
    idx = _pj_index(rbase, k)
    cand = (
        probe.join(
            idx,
            (probe["_seg"] == idx["_seg"])
            & (F.abs(F.col("pos_p") - F.col("start_i")) <= k)
            & (F.abs(F.col("len_p") - F.col("len_i")) <= k),
        )
        .select(
            F.col("id_p").alias("id_l"), F.col("id_i").alias("id_r")
        )
        .distinct()
    )
    kl = lbase.select(F.col("_id").alias("id_l"), F.col("_key").alias("_kl"))
    kr = rbase.select(F.col("_id").alias("id_r"), F.col("_key").alias("_kr"))
    return (
        cand.join(kl, "id_l")
        .join(kr, "id_r")
        .withColumn("ed", F.levenshtein("_kl", "_kr", k))
        .where(F.col("ed") >= 0)
        .select("id_l", "id_r", "ed")
    )


def suffix_pairs(
    records: DataFrame,
    id_col: str = "id",
    key_col: str = "key",
    min_len: int = 6,
    max_block_size: int | None = 50,
) -> DataFrame:
    """Suffix-array blocking (Aizawa & Oyama 2005): every suffix of the
    blocking-key value with length >= ``min_len`` becomes a block key,
    so records agreeing on any sufficiently-long TAIL of the key land
    in a common block — robust to prefix noise (titles, honorifics,
    "www."/scheme junk at the front of a URL slug) that defeats plain
    prefix or exact blocking.

    Blocks larger than ``max_block_size`` are DROPPED ENTIRELY — the
    published algorithm's own stopword rule (a suffix shared by
    thousands of records, e.g. " inc", has no discriminating power and
    would otherwise dominate the pair expansion); ``None`` disables the
    cap. Returns distinct candidate pairs ``(id_a, id_b)`` with
    id_a < id_b.

    Scale notes (100 TB audit): one bounded explode (at most
    ``len(key) - min_len + 1`` suffixes per record — slice the key
    upstream), one groupBy(suffix) for block sizes, and a within-block
    self-join whose expansion is bounded by max_block_size**2 per
    block regardless of key skew (same contract as cbs_pairs); the
    final distinct dedups pairs sharing several suffixes. All JVM-side
    Catalyst — no UDFs.
    """
    key = F.col(key_col)
    sfx = (
        records.where(F.length(key) >= min_len)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, length({key_col})"
                    f" - {int(min_len)} + 1),"
                    f" i -> substring({key_col}, i))"
                )
            ).alias("_suffix"),
        )
    )
    if max_block_size is not None:
        sizes = sfx.groupBy("_suffix").agg(F.count("*").alias("_n"))
        sfx = sfx.join(
            sizes.where(F.col("_n") <= max_block_size).select("_suffix"),
            "_suffix",
        )
    return (
        sfx.alias("a")
        .join(sfx.alias("b"), "_suffix")
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )


def grid_distance_pairs(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: int = 10,
    cell: int | None = None,
) -> DataFrame:
    """Spatial-tolerance matching: all point pairs within Euclidean
    distance ``radius`` (integer coordinates — microdegrees, metres,
    whatever the caller scaled to), via uniform-grid blocking. The
    geocoded-records ER primitive: two address records whose
    coordinates fall within the tolerance are candidates no matter
    what their strings say.

    Grid scheme (lossless): with ``cell >= radius`` (default
    ``cell = radius``), any pair within ``radius`` lies in the same or
    an adjacent cell, so indexing each point ONCE under its own cell
    and probing the 3x3 neighborhood finds every qualifying pair; the
    verify step keeps exactly ``dx^2 + dy^2 <= radius^2`` (integer
    arithmetic end to end — the DuckDB oracle recomputes it
    bit-for-bit). Returns (id_a, id_b, d2) with id_a < id_b.

    Scale notes (100 TB audit): the probe explode is a constant 9 rows
    per point; the join is an equi-join on (cell_x, cell_y) int pairs;
    a dense hot cell degrades to its own pair count, bounded by
    density * cell^2 — pick ``cell`` near ``radius`` (never larger
    than needed) to keep per-cell membership minimal. Note on negative
    coordinates: SQL ``div`` truncates toward zero (identically in
    Spark and DuckDB, which is what keeps the two engines bit-equal),
    so the cell containing the origin spans (-cell, cell) — width
    2*cell-1 rather than cell. Losslessness is unaffected (cells
    remain intervals, and any span <= radius <= cell still touches at
    most two adjacent cells per axis), but per-cell density at the
    origin can be ~2x the stated bound per axis. No UDFs, no driver
    collect.
    """
    c = int(cell) if cell is not None else int(radius)
    if c < radius:
        raise ValueError("cell must be >= radius for lossless 3x3 probing")
    p = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    idx = p.select(
        F.col("_id").alias("id_i"),
        F.col("_x").alias("xi"),
        F.col("_y").alias("yi"),
        F.expr(f"_x div {c}").alias("cx"),
        F.expr(f"_y div {c}").alias("cy"),
    )
    probe = p.select(
        F.col("_id").alias("id_p"),
        F.col("_x").alias("xp"),
        F.col("_y").alias("yp"),
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dx ->"
                f" transform(sequence(-1, 1), dy ->"
                f" struct(_x div {c} + dx AS cx, _y div {c} + dy AS cy))))"
            )
        ).alias("_c"),
    ).select(
        "id_p", "xp", "yp",
        F.col("_c.cx").alias("cx"), F.col("_c.cy").alias("cy"),
    )
    r2 = int(radius) * int(radius)
    d2 = (
        (F.col("xp") - F.col("xi")) * (F.col("xp") - F.col("xi"))
        + (F.col("yp") - F.col("yi")) * (F.col("yp") - F.col("yi"))
    )
    return (
        probe.join(idx, ["cx", "cy"])
        .where(F.col("id_p") < F.col("id_i"))
        .where(d2 <= F.lit(r2))
        .select(
            F.col("id_p").alias("id_a"),
            F.col("id_i").alias("id_b"),
            d2.cast("long").alias("d2"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def multipass_sn_pairs(
    df: DataFrame,
    passes: dict[str, list[str]],
    id_col: str = "id",
    window: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Multi-pass sorted neighborhood — the FULL Hernandez & Stolfo
    merge/purge design: a single sort key always splits some true
    matches (a typo in its first character teleports the record across
    the sort order), so the published remedy is SEVERAL independent
    cheap keys, each with a SMALL window, unioned. ``passes`` maps a
    pass name to its ordering columns; each pass runs the scale-safe
    :func:`sorted_neighborhood_pairs` (distributed global rank, never
    a single-partition window), pairs are canonicalized to id_a < id_b
    across passes, and the output carries ``n_passes`` — in how many
    sort orders the pair fell within the window (a cheap agreement
    weight, usable exactly like cbs_pairs' CBS count).

    Returns (id_a, id_b, n_passes).

    Scale notes (100 TB audit): cost is additive over passes (each is
    one range repartition + an integer rank equi-join with window-
    bounded fan-out); the union shuffles narrow id pairs once for the
    final groupBy. The id tie-break in every pass makes each order
    total and the result deterministic.
    """
    out: DataFrame | None = None
    for name, cols in passes.items():
        p = sorted_neighborhood_pairs(
            df, cols, id_col=id_col, window=window,
            num_partitions=num_partitions,
        ).select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.lit(name).alias("_pass"),
        )
        out = p if out is None else out.unionByName(p)
    if out is None:
        raise ValueError("passes must be non-empty")
    return out.groupBy("id_a", "id_b").agg(
        F.count_distinct("_pass").alias("n_passes")
    )


def qgram_count_pairs(
    records: DataFrame,
    id_col: str = "id",
    key_col: str = "key",
    q: int = 3,
    k: int = 2,
) -> DataFrame:
    """Positional q-gram count-filter join (Gravano et al., "Approximate
    String Joins in a Database (Almost) for Free", VLDB 2001) — the
    third classic lossless edit-distance candidate scheme alongside
    segment pigeonhole (:func:`passjoin_pairs`) and prefix filtering
    (:func:`prefix_filter_pairs`), and the one originally designed as
    plain relational algebra, so it maps 1:1 onto a DataFrame plan:

    1. every key explodes into its ``L - q + 1`` positional q-grams;
    2. candidate pairs must share, at compatible positions
       (``|pos_a - pos_b| <= k``) and lengths (``|L_a - L_b| <= k``),
       at least ``LB = max(L_a, L_b) - q + 1 - q*k`` gram occurrences
       (each of the k edits can destroy at most q grams; the survivors
       align within +-k — the paper's count + position filters);
    3. survivors verify with banded ``levenshtein(a, b, k)``.

    Losslessness needs ``LB >= 1``; keys shorter than ``q * (k + 1)``
    are excluded (for them the count filter would be vacuous AND a
    true pair could share zero grams — the paper's padding variant
    trades this for sentinel grams; callers with short keys should
    pad upstream). Returns (id_a, id_b, ed), identical to brute force
    on the included keys.

    Round-6 rework (guide §2.3 "shuffle fewer bytes" / §1.2 "fix the
    distributed algorithm first"): the original formulation joined ALL
    positional grams of every key and evaluated the count filter in a
    groupBy over the join output — measured at sf0.1, that join
    emitted 19.8M rows to keep 2,851 candidates. The paper's own
    substring-selection idea bounds the probe side instead: if
    ``ed(a, b) <= k`` then at most ``q*k`` of a's grams are destroyed,
    so among a's FIRST ``q*k + 1`` grams at least one survives
    verbatim in b, displaced by at most k positions (hence found at
    ``pos_b <= q*k + 1 + k``). The candidate join therefore only needs
    probe grams at ``pos <= q*k + 1`` against index grams at
    ``pos <= q*k + 1 + k`` — O(q*k) rows per key instead of O(L) —
    and every true pair still appears (the count filter restricted to
    this window degenerates to ``>= 1 shared gram``, which is exactly
    the join condition). Survivors go straight to the banded
    ``levenshtein(a, b, k)`` verify: computing the full count filter
    for the surviving candidates costs MORE than the verify itself
    (the count needs a ~2*(L-q+1)-row join per candidate; the banded
    verify is one codegen'd O(L*k) expression), measured 6.7s vs 3.4s
    for the whole chain at sf0.1. Output pinned identical to brute
    force by test + oracle.

    Scale notes (100 TB audit): the join key is NOT the bare gram —
    hot trigrams ("the" in web text) would concentrate the shuffle —
    but ``(gram, pos div (k+1))``: the probe side fans each windowed
    gram to its 3 adjacent position buckets (|delta pos| <= k spans at
    most one bucket boundary at width k+1). Per record the join sees
    <= 3*(q*k+1) probe rows and <= q*k+1+k index rows, independent of
    key length; candidates are deduped (narrow id pairs) before the
    text-touching verify joins. Worst-case candidate count (a corpus
    sharing its first q*k+1+q-1 characters) degrades toward the true
    pair count like every lossless scheme.
    """
    lb_floor = q * (k + 1)
    w = q * k + 1
    key = F.col(key_col)
    base = records.where(F.length(key) >= lb_floor).select(
        F.col(id_col).alias("_id"),
        key.alias("_key"),
        F.length(key).alias("_len"),
    )
    # only the window grams are ever joined — build just those
    # (pos <= w + k; probe further restricts to pos <= w)
    gram_expr = (
        f"transform(sequence(1, least(_len - {q} + 1, {w + k})),"
        f" p -> struct(substring(_key, p, {q}) AS g, p AS pos))"
    )
    grams = base.select(
        "_id", "_len", F.explode(F.expr(gram_expr)).alias("_g")
    ).select(
        "_id",
        "_len",
        F.col("_g.g").alias("_gram"),
        F.col("_g.pos").alias("_pos"),
        F.expr(f"_g.pos div {k + 1}").alias("_bkt"),
    )
    probe = grams.where(F.col("_pos") <= w).select(
        F.col("_id").alias("id_a"),
        F.col("_len").alias("la"),
        "_gram",
        F.col("_pos").alias("pa"),
        F.explode(
            F.expr(f"sequence(_bkt - 1, _bkt + 1)")
        ).alias("_bkt"),
    )
    idx = grams.select(
        F.col("_id").alias("id_b"),
        F.col("_len").alias("lb"),
        "_gram",
        F.col("_pos").alias("pb"),
        "_bkt",
    )
    cand = (
        probe.join(idx, ["_gram", "_bkt"])
        # strict <: the window pigeonhole holds for EITHER side as probe
        # (each of the k edits destroys <= q grams of WHICHEVER key you
        # call `a`, so one of a's first w grams survives verbatim in b
        # within +-k positions) — so fixing the min-id side as the probe
        # still finds every true pair, and the join emits each candidate
        # in one orientation instead of two (round 6: halves the join
        # output feeding the distinct — measured 3.17M -> 1.6M rows at
        # sf0.1 with the candidate set's true-pair coverage unchanged,
        # pinned by the brute-force oracle)
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.abs(F.col("pa") - F.col("pb")) <= k)
        .where(F.abs(F.col("la") - F.col("lb")) <= k)
        .select("id_a", "id_b")
        .distinct()
    )
    ka = base.select(F.col("_id").alias("id_a"), F.col("_key").alias("_ka"))
    kb = base.select(F.col("_id").alias("id_b"), F.col("_key").alias("_kb"))
    return (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .withColumn("ed", F.levenshtein("_ka", "_kb", k))
        .where(F.col("ed") >= 0)
        .select("id_a", "id_b", "ed")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scale-safe INCLUSIVE prefix sum of ``value_col`` in the global
    ``order_cols`` order — the same two-level trick as
    :func:`global_rank` (whose offsets are the special case value=1):
    range-repartition so partition ranges tile the order, cumsum
    inside each partition with a partition-local window, collect ONE
    (partition, total) row per partition, broadcast the cumulative
    offsets back. ``order_cols`` must be a total order.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    d = d.withColumn("_pid", F.spark_partition_id())
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_csum", F.sum(F.col(value_col)).over(w)).persist()
    totals = sorted(
        (r["_pid"], r["t"])
        for r in d.groupBy("_pid")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += int(t)
    if not offsets:
        d.unpersist()
        return df.withColumn(out_col, F.lit(0).cast("long")).limit(0)
    off = spark.createDataFrame(offsets, ["_pid", "_off"])
    out = (
        d.join(F.broadcast(off), "_pid")
        .withColumn(out_col, (F.col("_csum") + F.col("_off")).cast("long"))
        .drop("_pid", "_csum", "_off")
    )
    d.unpersist()
    return out


def block_purging(
    doc_blocks: DataFrame,
    budget: int,
    id_col: str = "id",
    block_col: str = "block",
) -> DataFrame:
    """Comparison-budgeted block purging (the meta-blocking
    preprocessing step of Papadakis et al., made deterministic):
    blocks are admitted SMALLEST FIRST — ascending (pair count, block
    key) — while the running total of within-block comparisons
    C(size, 2) stays <= ``budget``; every block past the budget point
    is purged. Small blocks are the discriminative ones, so this keeps
    maximal discriminating power per comparison spent and gives the
    pair-generation stage a HARD worst-case bound (the budget), not a
    per-block cap — the knob a 10^12-row deployment actually sets
    ("this much compute"), complementing max_block_size ("this much
    skew").

    Returns the retained blocks: (block, size, comparisons,
    cum_comparisons) with cum_comparisons <= budget. Join the result
    back to ``doc_blocks`` on ``block`` to filter memberships.

    Scale notes (100 TB audit): block sizes are one combining groupBy;
    the admission order needs a GLOBAL cumulative sum, computed with
    :func:`global_prefix_sum` (range repartition + partition-local
    window + one broadcast-joined offset row per partition) — never a
    single-partition window; the driver sees one row per partition.
    """
    sizes = (
        doc_blocks.select(
            F.col(id_col).alias("_id"), F.col(block_col).alias("block")
        )
        .dropDuplicates(["_id", "block"])
        .groupBy("block")
        .agg(F.count("*").cast("long").alias("size"))
        .withColumn(
            "comparisons", F.expr("(size * (size - 1)) div 2")
        )
    )
    cum = global_prefix_sum(
        sizes, ["comparisons", "block"], "comparisons",
        out_col="cum_comparisons",
    )
    return cum.where(F.col("cum_comparisons") <= budget).select(
        "block", "size", "comparisons", "cum_comparisons"
    )


def block_filtering(
    doc_blocks: DataFrame,
    r: int = 3,
    id_col: str = "id",
    block_col: str = "block",
) -> DataFrame:
    """Block filtering (Papadakis et al., the PER-RECORD companion of
    the global-budget :func:`block_purging`): every record keeps only
    its ``r`` SMALLEST blocks — the most discriminative memberships —
    and drops the rest. Where purging answers "how much total compute"
    (one global knob), filtering bounds each record's comparison
    exposure individually: after it, a record meets at most
    ``r * (max retained block size)`` partners no matter how many
    cheap keys fired on it, which is what keeps schema-agnostic token
    blocking (every token a key) tractable.

    Deterministic: blocks rank per record by ascending (block size,
    block key); ties beyond ``r`` are cut by the key order. Returns
    the retained (id, block, block_size, rank) memberships.

    Scale notes (100 TB audit): sizes are one combining groupBy; the
    per-record rank is a window partitioned by RECORD id — bounded by
    blocks-per-record (the explode factor of the upstream scheme),
    never by block size, so a hot BLOCK costs nothing here and a hot
    RECORD is capped by its own key count. No collect, no UDF.
    """
    db = doc_blocks.select(
        F.col(id_col).alias("id"), F.col(block_col).alias("block")
    ).dropDuplicates(["id", "block"])
    sizes = db.groupBy("block").agg(
        F.count("*").cast("long").alias("block_size")
    )
    w = Window.partitionBy("id").orderBy("block_size", "block")
    return (
        db.join(sizes, "block")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(r))
        .select("id", "block", "block_size", "rank")
    )


def pair_range_tasks(
    doc_blocks: DataFrame,
    cap: int,
    id_col: str = "id",
    block_col: str = "block",
) -> DataFrame:
    """PairRange load balancing (Kolb, Thor & Rahm's Dedoop, ICDE
    2012): enumerate every within-block comparison in one GLOBAL pair
    order and cut that order into fixed-size tasks of ``cap``
    comparisons each — so the expensive matching stage runs over
    equal-work tasks no matter how skewed the blocking was. Block caps
    (max_block_size) and budgets (block_purging) bound HOW MANY
    comparisons exist; PairRange bounds WHERE they run: a 10^6-record
    hot block no longer lands on one reducer, it is sliced across
    ceil(C(n,2)/cap) tasks.

    The enumeration is fully deterministic and closed-form:

    * records get a 0-based in-block index ``i`` by ascending id
      (global_rank over (block, id) minus the block's first rank);
    * blocks get an exclusive global comparison offset ``off`` =
      prefix sum of C(n,2) in block-key order (global_prefix_sum);
    * pair (i, j), i < j, in a block of n records has local index
      ``i*(2n-i-1)/2 + (j-i-1)`` (row-major upper triangle), global
      index ``off + local``, and ``task_id = global div cap``.

    Returns (block, id_a, id_b, pair_index, task_id): every task
    except the last holds exactly ``cap`` pairs. Repartition the
    result by task_id and the comparison stage is balanced by
    construction.

    Scale notes (100 TB audit): ranks and offsets come from the
    range-repartition two-level primitives (one collected row per
    PARTITION, never per block); the pair expansion itself is the
    block self-join every blocking scheme ultimately pays — its
    OUTPUT is what this operator balances. Compose with block_purging
    / block_filtering upstream to bound the total; everything here is
    pure Catalyst integer arithmetic, no UDF, no sqrt-inverse tricks.
    """
    memb = (
        doc_blocks.select(
            F.col(id_col).alias("_id"), F.col(block_col).alias("block")
        )
        .dropDuplicates(["_id", "block"])
    )
    ranked = global_rank(memb, ["block", "_id"], rank_col="_gr")
    first = ranked.groupBy("block").agg(F.min("_gr").alias("_fr"))
    idx = (
        ranked.join(first, "block")
        .withColumn("_i", (F.col("_gr") - F.col("_fr")).cast("long"))
        .select("block", "_id", "_i")
    )
    sizes = (
        memb.groupBy("block")
        .agg(F.count("*").cast("long").alias("_n"))
        .withColumn("_c", F.expr("(_n * (_n - 1)) div 2"))
        .where(F.col("_c") > 0)
    )
    offs = global_prefix_sum(sizes, ["block"], "_c", out_col="_cum")
    offs = offs.withColumn("_off", F.col("_cum") - F.col("_c")).select(
        "block", "_n", "_off"
    )
    a = idx.select(
        "block", F.col("_id").alias("id_a"), F.col("_i").alias("_ia")
    )
    b = idx.select(
        "block", F.col("_id").alias("id_b"), F.col("_i").alias("_ib")
    )
    return (
        a.join(b, "block")
        .where(F.col("_ia") < F.col("_ib"))
        .join(offs, "block")
        .withColumn(
            "pair_index",
            (
                F.col("_off")
                + F.expr("(_ia * (2 * _n - _ia - 1)) div 2")
                + (F.col("_ib") - F.col("_ia") - 1)
            ).cast("long"),
        )
        .withColumn(
            "task_id", F.expr(f"pair_index div {int(cap)}").cast("long")
        )
        .select("block", "id_a", "id_b", "pair_index", "task_id")
    )
