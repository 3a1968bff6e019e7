"""Deduplication operators over a documents table — the training-data-
pipeline companions to the linkage pipeline.

All operators take a DataFrame with (id, text) (or embeddings) and
return either per-document verdicts or duplicate pairs/groups. Exact
dedup is pure Catalyst (hash groupBy); the near-dup family reuses the
engine's sketch functions (MinHash-LSH, SimHash, winnowing) and the
n-gram Jaccard verifier. Designed so the expensive verify only sees
LSH-gated candidates — the same cheap-gate/expensive-verify shape as the
reference's hierarchical prefilter (src/pattern_tiling/general.rs:60-102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    hamming64,
    make_fingerprint_udf,
    make_simhash_udf,
)
from ..functions.text import char_ngrams, normalize


# ------------------------------------------------------------------- exact


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_dups, doc_ids).
    One shuffle on the 64-bit content hash; the text column never moves
    (only the hash does) — at 100 TB this is the difference between a
    100 TB shuffle and a ~1% one."""
    h = df.select(
        F.col(id_col).alias("doc_id"), F.xxhash64(text_col).alias("content_hash")
    )
    return (
        h.groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def dedup_exact_keep_first(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id representative of each identical-content group —
    window top-1 per content hash (no join back, single shuffle)."""
    w = Window.partitionBy(F.xxhash64(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ----------------------------------------------------------------- minhash


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    bands: int = 16,
    ngram: int = 5,
    seed: int = 42,
    jaccard_threshold: float = 0.7,
    max_block_size: int = 512,
    candidates_out: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs via shingle->minhash->band->bucket-join, with an
    exact n-gram Jaccard verify on candidates. Output:
    (id_a, id_b, jaccard).

    ``candidates_out``: optional parquet path that receives the LSH-gated
    candidate pair set BEFORE verification — the audit handoff that lets an
    external engine (the DuckDB oracle) recompute the exact-Jaccard verify
    stage on the same candidates."""
    from pyspark import StorageLevel

    from .linkage import minhash_band_keys

    id_type = df.schema[id_col].dataType.simpleString()
    band_keys = minhash_band_keys(
        df.select(F.col(id_col).cast("string").alias("url"), F.col(text_col)),
        text_col=text_col,
        n_hashes=n_hashes,
        bands=bands,
        ngram=ngram,
        seed=seed,
    ).select(
        F.col("url").cast(id_type).alias("id"),
        F.col("block_key").alias("bucket"),
    )
    # eager persist: the bucket table feeds a size agg + both sides of the
    # self-join — lazy, the sketch UDF would run in every branch
    band_keys = band_keys.persist(StorageLevel.MEMORY_AND_DISK)
    band_keys.count()
    sizes = band_keys.groupBy("bucket").agg(F.count("*").alias("bs"))
    bk = band_keys.join(sizes, "bucket").where(
        (F.col("bs") >= 2) & (F.col("bs") <= max_block_size)
    )
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(b, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if candidates_out is not None:
        cand.write.mode("overwrite").parquet(candidates_out)
        cand = df.sparkSession.read.parquet(candidates_out)
    return ngram_jaccard_verify(
        cand, df, id_col=id_col, text_col=text_col, ngram=ngram
    ).where(F.col("jaccard") >= jaccard_threshold)


def ngram_jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
) -> DataFrame:
    """Exact character-n-gram Jaccard for candidate pairs — pure Catalyst
    (array_distinct + array_intersect sizes), no Python.

    Gram arrays are built only for documents that actually appear in a
    candidate pair (semi-join first): candidates are typically <<1% of the
    corpus, and the gram explosion is ~100x the text size. Grams are
    64-bit-hashed before the set ops: intersecting long arrays costs a
    fraction of intersecting ~n-char strings (equality + hashing per
    element), and the Jaccard value is identical up to 2^-64 collisions
    (~1e-12 per doc pair at 5k grams). The gram table is persisted once —
    it feeds BOTH sides of the pair join."""
    from pyspark import StorageLevel

    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    g = docs.join(
        ids, docs[id_col] == ids["id"], "left_semi"
    ).select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                char_ngrams(normalize(F.col(text_col)), ngram),
                lambda s: F.xxhash64(s),
            )
        ).alias("grams"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out = (
        pairs.join(g.select(F.col("id").alias("id_a"), F.col("grams").alias("ga")), "id_a")
        .join(g.select(F.col("id").alias("id_b"), F.col("grams").alias("gb")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            (
                F.col("inter")
                / F.greatest(
                    F.size("ga") + F.size("gb") - F.col("inter"), F.lit(1)
                )
            ).cast("double"),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ----------------------------------------------------------------- simhash


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 42,
    candidates_out: str | None = None,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash within Hamming distance d, using
    the standard banding trick: split the fingerprint into (d+1) chunks —
    any pair within distance d agrees exactly on >= 1 chunk (pigeonhole),
    so candidates come from equi-joins on chunk values, then an exact
    popcount verify. Output: (id_a, id_b, hamming).

    ``candidates_out``: optional parquet path receiving the chunk-join
    candidates (id_a, id_b, fp_a, fp_b) BEFORE the popcount verify, so an
    external engine can recompute the Hamming verify on the same set."""
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    sh = make_simhash_udf(seed=seed)
    fp = df.select(F.col(id_col).alias("id"), sh(F.col(text_col)).alias("fp"))
    # shiftrightunsigned needs a literal shift — build the chunk-key array
    # with a Python loop over the (statically known) chunk count
    chunk_cols = [
        F.concat(
            F.lit(f"{c}:"),
            F.shiftrightunsigned(F.col("fp"), c * bits)
            .bitwiseAND(F.lit((1 << bits) - 1))
            .cast("string"),
        )
        for c in range(n_chunks)
    ]
    chunks = fp.select(
        "id", "fp", F.explode(F.array(*chunk_cols)).alias("bucket")
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if candidates_out is not None:
        cand.write.mode("overwrite").parquet(candidates_out)
        cand = df.sparkSession.read.parquet(candidates_out)
    return (
        cand.select(
            "id_a",
            "id_b",
            hamming64(F.col("fp_a"), F.col("fp_b")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------------- fingerprint


def fingerprint_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    window: int = 16,
    min_shared: int = 3,
    index_out: str | None = None,
) -> DataFrame:
    """Winnowing-fingerprint containment: pairs sharing >= min_shared
    selected hashes (catches partial-copy / quote-level duplication that
    whole-document sketches miss).

    ``index_out``: optional parquet path receiving the exploded
    (id, hash) inverted index, so an external engine can recompute the
    overlap join + threshold on the same fingerprints."""
    fpu = make_fingerprint_udf(ngram=ngram, window=window)
    fps = df.select(F.col(id_col).alias("id"), fpu(F.col(text_col)).alias("fp"))
    inv = fps.select("id", F.explode("fp").alias("h"))
    if index_out is not None:
        inv.write.mode("overwrite").parquet(index_out)
        inv = df.sparkSession.read.parquet(index_out)
    sizes = inv.groupBy("h").agg(F.count("*").alias("df_"))
    inv2 = inv.join(sizes, "h").where(F.col("df_") <= 64)  # stop-hash cap
    a, b = inv2.alias("a"), inv2.alias("b")
    return (
        a.join(b, "h")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared_hashes"))
        .where(F.col("shared_hashes") >= min_shared)
    )


# -------------------------------------------------------- embedding cosine


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    candidates_out: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicates: random-hyperplane LSH buckets ->
    exact cosine verify inside buckets. Cosine is computed JVM-side with
    F.aggregate/zip_with (no Python).

    ``candidates_out``: optional parquet path receiving the bucket-join
    candidate pairs BEFORE the cosine verify (external verify handoff)."""
    from pyspark import StorageLevel

    from .similarity import cosine_expr, hyperplane_bucket

    # persisted: the bucket table feeds both self-join sides AND the
    # vector join-back — unpersisted, the bucketing scan would run 3x
    bkt = hyperplane_bucket(emb, vec_col, n_planes=n_planes, seed=seed).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col("bucket")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = bkt.alias("a"), bkt.alias("b")
    cand = (
        a.join(b, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if candidates_out is not None:
        cand.write.mode("overwrite").parquet(candidates_out)
        cand = emb.sparkSession.read.parquet(candidates_out)
    vecs = bkt.select("id", "v").dropDuplicates(["id"])
    return (
        cand.join(
            vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")),
            "id_a",
        )
        .join(
            vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            cosine_expr(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
