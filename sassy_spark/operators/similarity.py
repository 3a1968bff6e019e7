"""Similarity search over embedding columns (array<float>).

Two paths, mirroring the engine-wide cheap-gate/exact-verify design:
  * brute-force cosine top-k — exact baseline, a broadcast join of the
    (small) query set against the corpus with the dot product computed
    JVM-side via zip_with/aggregate (no Python in the scan);
  * LSH-bucketed (random hyperplane signs) — the scale path: corpus and
    queries hash to sign-pattern buckets; candidates only within bucket
    (+ optional multi-probe), exact cosine re-rank after.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_expr(a: Column, b: Column) -> Column:
    """JVM-side cosine similarity of two float arrays (zip_with dot product
    + aggregate norms; stays in codegen, no UDF)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return (dot / F.greatest(na * nb, F.lit(1e-12))).cast("double")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the query set, window top-k per
    query. One corpus scan, no shuffle of the corpus (only of the
    (n_queries x k)-sized result)."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv")
    )
    scored = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cv")
    ).crossJoin(F.broadcast(q)).select(
        query_id,
        id_col,
        cosine_expr(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def hyperplane_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Append a random-hyperplane sign bucket (int) for cosine LSH.

    Two physical strategies with identical output:
      * small plane matrices (n_planes * dim <= ~4k literals) inline as
        Catalyst literal arrays — sign pattern computed JVM-side with
        zip_with/aggregate, no Python worker in the scan;
      * larger ones (e.g. dim=768 x 16 planes = 12k floats) would bloat
        the Catalyst expression tree and its codegen, so the matrix ships
        once inside an Arrow pandas UDF closure (Spark broadcasts the
        serialized UDF to executors) and the signs come from one numpy
        matmul per batch.
    """
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    planes = _planes(dim, n_planes, seed)
    if n_planes * dim <= 4096:
        bucket = F.lit(0).cast("long")
        for i in range(n_planes):
            arr = F.array(*[F.lit(float(x)) for x in planes[i]])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), arr, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bucket = bucket + F.when(
                dot > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return df.withColumn("bucket", bucket)

    pt = planes.T.astype(np.float64)  # (dim, n_planes)
    # integer bit packing: a float dot product with 2^i weights loses
    # low-order bits past 53 planes (float64 mantissa)
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    @F.pandas_udf(T.LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (B, dim)
        signs = (mat @ pt > 0).astype(np.uint64)  # (B, n_planes)
        return pd.Series((signs * weights[None, :]).sum(axis=1).astype(np.int64))

    return df.withColumn("bucket", bucket_udf(F.col(vec_col)))


def _train_centroids(
    mat: np.ndarray, n_centroids: int, seed: int, iters: int = 12
) -> np.ndarray:
    """Spherical k-means on a driver-side SAMPLE (the standard IVF coarse-
    quantizer recipe: the quantizer trains on a bounded sample, then the
    full corpus is assigned distributively). Rows and centroids are
    L2-normalized so nearest-centroid-by-dot-product ranks by cosine."""
    rng = np.random.default_rng(seed)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n = len(mat)
    k = min(n_centroids, n)
    cent = mat[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(k):
            sel = mat[assign == c]
            if len(sel):
                v = sel.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def _rerank_pairs(
    pairs: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id: str,
) -> DataFrame:
    """Exact-cosine re-rank of gated (query_id, id) candidate pairs:
    join the embedding payloads back in (only for survivors), score
    JVM-side, window top-k per query. Shared by the LSH and IVF paths."""
    cand = (
        pairs.join(
            corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), id_col
        )
        .join(
            queries.select(F.col(query_id), F.col(vec_col).alias("_qv")),
            query_id,
        )
        .select(
            query_id,
            id_col,
            cosine_expr(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    seed: int = 42,
    train_sample: int = 20000,
    candidates_out: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path: a spherical k-means quantizer (trained on a bounded driver-side
    sample) partitions the corpus into cells; each query probes only its
    ``n_probe`` nearest cells and re-ranks by exact cosine there.

    At 100 TB: the corpus scan assigns cells in one broadcast-matmul UDF
    pass (no shuffle), the candidate join is an equi-join on cell id
    (queries explode to n_probe rows — tiny side), and the exact re-rank
    touches ~n_probe/n_centroids of the corpus per query instead of all
    of it. Partition/bucket the assigned table by cell for repeated
    query workloads.

    The quantizer trains on a uniform ``df.sample`` of the corpus, NOT
    ``limit()`` — limit takes whichever partitions answer first (in
    practice the head of the corpus), so on data sorted/clustered by
    region the centroids would see one region and recall silently
    degrades. The sample fraction costs one extra count scan, paid once
    per quantizer build.

    ``candidates_out``: optional parquet handoff of the gated
    (query_id, id) candidate set before the exact re-rank (q39's oracle
    recomputes the re-rank on the same set).
    """
    n_corpus = corpus.count()
    frac = min(1.0, (train_sample * 1.2) / max(n_corpus, 1))
    sample = (
        corpus.select(vec_col)
        .sample(fraction=frac, seed=seed)
        .limit(train_sample)
        .toPandas()
    )
    mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    cent = _train_centroids(mat, n_centroids, seed)
    cent_t = cent.T  # (dim, k)

    @F.pandas_udf(T.IntegerType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cent_t).argmax(axis=1).astype(np.int32))

    np_ = min(n_probe, len(cent))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([])
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cent_t
        top = np.argpartition(-sims, np_ - 1, axis=1)[:, :np_]
        return pd.Series([row.astype(np.int32) for row in top])

    c = corpus.select(
        F.col(id_col), cell_of(F.col(vec_col)).alias("cell")
    )
    q = queries.select(
        F.col(query_id),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    # candidate join carries IDS ONLY (a query probing n_probe cells can
    # reach the same doc once per cell -> dropDuplicates); the embedding
    # payload joins in afterwards, so the cell shuffle stays narrow — at
    # 100 TB this is the difference between shuffling ids and shuffling
    # the vector column n_probe times
    pairs = (
        c.join(q, "cell")
        .select(query_id, id_col)
        .dropDuplicates([query_id, id_col])
    )
    if candidates_out is not None:
        from .staging import stage_parquet

        pairs = stage_parquet(pairs, candidates_out, "ivf_ann_cand")
    return _rerank_pairs(pairs, corpus, queries, k, id_col, vec_col, query_id)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
    candidates_out: str | None = None,
) -> DataFrame:
    """Approximate top-k: equi-join on hyperplane bucket (+ multiprobe:
    also probe every bucket within Hamming distance ``multiprobe`` of the
    query's bucket — all bit-flip combinations, not just single flips),
    exact cosine re-rank within candidates. At 100 TB the bucket join
    replaces the full cross product with a hash shuffle on bucket — and
    the shuffle carries IDS ONLY (the vector payload joins back in for
    the surviving candidates), so multiprobe fan-out never replicates
    embeddings.

    ``candidates_out``: optional parquet path receiving the gated
    (query_id, id) candidate set BEFORE the exact re-rank — the audit
    handoff that lets an external engine recompute the re-rank stage on
    the same candidates (q38's oracle)."""
    from itertools import combinations

    dim = int(corpus.select(F.size(vec_col).alias("d")).first()["d"])
    c = hyperplane_bucket(corpus, vec_col, n_planes, seed, dim).select(
        F.col(id_col), "bucket"
    )
    qb = hyperplane_bucket(queries, vec_col, n_planes, seed, dim)
    probes = [F.col("bucket")]
    for d in range(1, min(multiprobe, n_planes) + 1):
        for flips in combinations(range(n_planes), d):
            m = 0
            for i in flips:
                m |= 1 << i
            probes.append(F.col("bucket").bitwiseXOR(F.lit(m)))
    q = qb.select(
        F.col(query_id),
        F.explode(F.array(*probes)).alias("bucket"),
    )
    pairs = (
        c.join(q, "bucket")
        .select(query_id, id_col)
        .dropDuplicates([query_id, id_col])
    )
    if candidates_out is not None:
        from .staging import stage_parquet

        pairs = stage_parquet(pairs, candidates_out, "lsh_ann_cand")
    return _rerank_pairs(pairs, corpus, queries, k, id_col, vec_col, query_id)
