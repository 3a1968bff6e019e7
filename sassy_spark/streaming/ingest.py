"""Structured-Streaming ingest: incremental crawl snapshots.

The reference is batch-only (files in, TSV out); the engine's streaming
extension covers the pipeline's ingest face: new page snapshots arrive as
parquet files in a directory (the sandbox stand-in for an Iceberg
incremental read / Kafka topic), are quality-filtered, fingerprinted, and
appended to a bronze table — with exactly-once file-sink semantics from
checkpointing. Windowed event aggregation demonstrates watermark + window
state for the events table shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_pages(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_chars: int = 32,
):
    """File-source stream: filter + derive blocking-side columns + append
    to parquet with a checkpoint (restart-safe, each input file processed
    exactly once)."""
    from ..functions.text import url_host

    src = (
        spark.readStream.schema(PAGES_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )
    enriched = (
        src.where(F.length("text") >= min_chars)
        .withColumn("host", url_host(F.col("url")))
        .withColumn("content_hash", F.xxhash64("text"))
    )
    return (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """Watermarked sliding-window aggregation over the events shape —
    late rows beyond 10 minutes dropped deterministically."""
    # event-time columns must be TIMESTAMP (ltz); parquet NTZ is cast
    events_stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


def streaming_candidate_pairs(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    bands: int = 8,
    n_hashes: int = 64,
    ngram: int = 5,
    seed: int = 42,
    max_block_size: int = 64,
):
    """Incremental ER blocking — a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``): as page snapshots stream in, each LSH
    band key keeps the set of members seen so far as group state; every
    new member emits candidate pairs against the existing members (and
    the other arrivals of its batch), so downstream scoring sees each
    candidate pair exactly once across restarts (state lives in the
    streaming checkpoint).

    Skew safety carries over from the batch design: a band's state is
    capped at ``max_block_size`` members — a hot boilerplate band stops
    yielding pairs instead of exploding quadratically. Cross-band
    duplicate pairs are left to the downstream batch dedup (same as the
    batch pipeline's dropDuplicates).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.linkage import minhash_band_keys

    src = (
        spark.readStream.schema(PAGES_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        # snapshots arrive as one directory per crawl batch
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    keys = minhash_band_keys(
        src, text_col="text", n_hashes=n_hashes, bands=bands, ngram=ngram,
        seed=seed,
    )

    def emit(key, pdfs, state: GroupState):
        seen = list(state.get[0]) if state.exists else []
        seen_set = set(seen)
        new: list[str] = []
        for pdf in pdfs:
            new.extend(pdf["url"].tolist())
        rows = []
        for u in new:
            if u in seen_set:
                continue  # re-crawled page: already paired, keep state flat
            if len(seen) >= max_block_size:
                break
            for v in seen:
                a, b = (u, v) if u < v else (v, u)
                rows.append((a, b, key[0]))
            seen.append(u)
            seen_set.add(u)
        state.update((seen[:max_block_size],))
        yield pd.DataFrame(rows, columns=["url_a", "url_b", "block_key"])

    pairs = keys.groupBy("block_key").applyInPandasWithState(
        emit,
        outputStructType="url_a string, url_b string, block_key string",
        stateStructType="urls array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_exact_dedup(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming exact dedup: drop re-crawled pages whose content hash was
    already seen (state kept by dropDuplicates within the watermark)."""
    src = (
        spark.readStream.schema(PAGES_STREAM_SCHEMA)
        # snapshots arrive as one directory per crawl batch
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
        .withColumn("content_hash", F.xxhash64("text"))
        .withWatermark("warc_ts", "1 day")
        .dropDuplicates(["content_hash"])
    )
    return (
        src.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
