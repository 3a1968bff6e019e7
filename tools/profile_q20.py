"""Stage-level wall-clock breakdown of q20 (minhash_lsh_pairs) at sf0.1.

Materializes each stage of the gate->verify pipeline separately so the
dominant cost is named, not guessed (round-3 VERDICT next-round #1).
Run: python tools/profile_q20.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def main() -> None:
    from sassy_spark import build_spark
    from sassy_spark.operators.dedup import (
        minhash_signatures,
        ngram_jaccard_verify,
    )
    from sassy_spark.operators.staging import stage_parquet

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_spark(app_name="profile_q20", cores=32)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    d.count()  # warm scan

    n_hashes, bands, ngram, thr, margin, max_block = 128, 16, 5, 0.4, 0.2, 512
    rows_per_band = n_hashes // bands
    t = {}

    # warmup pass (python workers, codegen)
    minhash_signatures(d, n_hashes=n_hashes, ngram=ngram).count()

    t0 = time.time()
    sigs = minhash_signatures(d, n_hashes=n_hashes, ngram=ngram)
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    n_sigs = sigs.count()
    t["1_signatures"] = time.time() - t0

    t0 = time.time()
    band_cols = [
        F.xxhash64(F.lit(bi), F.slice("sig", bi * rows_per_band + 1, rows_per_band))
        for bi in range(bands)
    ]
    band_keys = sigs.select("id", F.explode(F.array(*band_cols)).alias("bucket"))
    sizes = band_keys.groupBy("bucket").agg(F.count("*").alias("bs"))
    bk = band_keys.join(sizes, "bucket").where(
        (F.col("bs") >= 2) & (F.col("bs") <= max_block)
    )
    a, b = bk.alias("a"), bk.alias("b")
    cand0 = (
        a.join(b, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand0 = cand0.persist(StorageLevel.MEMORY_AND_DISK)
    n_cand0 = cand0.count()
    t["2_band_join"] = time.time() - t0

    t0 = time.time()
    agree = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    cand1 = (
        cand0.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
        .where(agree / F.lit(float(n_hashes)) >= F.lit(thr - margin))
        .select("id_a", "id_b")
    )
    cand1 = cand1.persist(StorageLevel.MEMORY_AND_DISK)
    n_cand1 = cand1.count()
    t["3_est_filter"] = time.time() - t0

    t0 = time.time()
    staged = stage_parquet(cand1, None, "profile_cand")
    t["4_stage_write"] = time.time() - t0

    t0 = time.time()
    ver = ngram_jaccard_verify(staged, d, ngram=ngram)
    n_ver = ver.count()
    t["5_verify"] = time.time() - t0

    t0 = time.time()
    n_final = ver.where(F.col("jaccard") >= thr).count()
    t["6_threshold"] = time.time() - t0

    print(f"docs={n_sigs} cand_raw={n_cand0} cand_est={n_cand1} "
          f"verified={n_ver} final={n_final}")
    for k, v in t.items():
        print(f"{k:16s} {v:7.3f}s")
    print(f"{'TOTAL':16s} {sum(t.values()):7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
