"""Bucketed-table support: shuffle-free co-located joins.

At 100 TB the dominant recurring cost of the ER pipeline is re-shuffling
the same corpus on the same key (url / doc_id) in every session — the
scan itself is unavoidable, the exchange is not. Spark's bucketed tables
amortize that: ``bucketBy(n, key)`` at write time pre-hash-partitions
the files, and any later equi-join or aggregation on the bucket key
between tables with compatible bucket counts runs WITHOUT an Exchange on
either side (pinned by ``assert_no_exchange_join`` below and
tests/test_plans.py). This is the parquet-catalog analog of the
reference pipeline's "profile once, search many" reuse
(/root/reference/src/search.rs:129-140: the encoded profile outlives one
query), and the config-only stand-in for Iceberg's bucket partition
transform on a real cluster (COVERAGE.md §Iceberg waiver).

Local-mode note: bucketed writes require the session catalog
(``saveAsTable``), already configured in session.py (warehouse dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans import physical_plan


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 64,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed on ``bucket_cols``.

    ``n_buckets`` is a layout commitment: joins between two tables
    bucketed on the same key avoid the exchange when the counts are
    equal (or one divides the other with bucket coalescing enabled —
    spark.sql.bucketing.coalesceBucketsInJoin.enabled). Sorting within
    buckets (``sort_cols``) additionally removes the sort below a
    sort-merge join. At 10^12 docs pick n_buckets so one bucket ≈ one
    task's worth of data (e.g. 2^15 buckets for ~100 TB → ~3 GB/bucket
    before column pruning).
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # In-memory-catalog resilience: a managed table written by a DEAD
        # session leaves its warehouse directory behind while the fresh
        # catalog has no entry for it — saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS even in overwrite mode. Drop any catalog
        # entry AND clear the orphaned location (Hadoop FS API, so the
        # same code is HDFS/S3-safe under a persistent metastore).
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        jvm = spark._jvm
        jsc = spark._jsc
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = jvm.org.apache.hadoop.fs.Path(wh, table.split(".")[-1])
        fs = loc.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        w = w.sortBy(*sc)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (bucket metadata rides along; any
    equi-join/groupBy on the bucket key skips its exchange)."""
    return spark.read.table(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key bucketed tables; with matching layouts the plan
    has no Exchange on either input (verify with
    ``assert_no_exchange_join``)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )


def assert_no_exchange_join(df: DataFrame) -> None:
    """Pin the co-location promise: the physical plan contains a join and
    ZERO shuffle exchanges. (Broadcast exchanges are also absent — the
    point of bucketing is neither side moves.)"""
    plan = physical_plan(df)
    assert "Join" in plan, "no join in plan:\n" + plan[:2000]
    assert "Exchange" not in plan, (
        "bucketed join still shuffles:\n" + plan[:2000]
    )
