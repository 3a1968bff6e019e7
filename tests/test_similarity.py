"""ANN operators: brute-force exact vs numpy oracle; LSH recall vs exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sassy_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def emb(spark):
    """Clustered vectors: 40 centers x 5 jittered points — realistic for
    ANN (true neighbors have high cosine, so LSH has signal to find)."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((40, 24))
    vecs = np.vstack(
        [c + 0.15 * rng.standard_normal((5, 24)) for c in centers]
    ).astype(np.float64)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    df.count()
    return df, vecs


def _numpy_topk(vecs, qids, k):
    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    out = {}
    for q in qids:
        cos = norms @ norms[q]
        order = np.lexsort((np.arange(len(cos)), -cos))
        out[q] = [int(i) for i in order[:k]]
    return out

def test_brute_force_matches_numpy(emb):
    df, vecs = emb
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(df, queries, k=5).collect()
    oracle = _numpy_topk(vecs, [0, 1, 2], 5)
    for q in (0, 1, 2):
        mine = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == q]
        assert mine == oracle[q], q


def test_lsh_recall(emb):
    df, vecs = emb
    queries = df.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(df, queries, k=5)
    approx = lsh_topk(df, queries, k=5, n_planes=10, multiprobe=1)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, recall  # clustered data: LSH must find same-cluster


def test_lsh_self_always_found(emb):
    df, _ = emb
    queries = df.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = lsh_topk(df, queries, k=3)
    top1 = {r.query_id: r.vec_id for r in got.collect() if r.rank == 1}
    assert top1 == {q: q for q in range(5)}  # self is its own bucket + cos 1.0
