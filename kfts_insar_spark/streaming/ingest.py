"""Structured-Streaming ingest → watermarked tier rollup.

The reference's update mode is micro-batch with state (SURVEY.md §2.9 T1-T3:
restart from States.h5, drop data older than the state start, append only
new epochs). The batch TierPipeline covers that contract via snapshots; this
module is the continuous form: readStream over the sequences table →
watermark on ingest_ts → tumbling-window aggregates → append sink.

Late data: rows older than `late_threshold` past the max seen event time are
dropped by the watermark — exactly the reference's truncate-before-state
behavior (kfts.py:272-276, whose own `truncatetime` call is a latent crash;
we implement the *intended* semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import RAW_SECONDS


def stream_raw_tier(
    stream: DataFrame,
    late_threshold: str = "10 minutes",
    window: str = f"{RAW_SECONDS} seconds",
) -> DataFrame:
    """streaming sequences(doc_id, n_tok, source, ingest_ts) → raw-tier
    aggregates in append mode (finalized on watermark passage)."""
    return (
        stream.withWatermark("ingest_ts", late_threshold)
        .groupBy(F.window("ingest_ts", window).alias("w"), F.col("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.min("n_tok").cast("int").alias("min_tok"),
            F.max("n_tok").cast("int").alias("max_tok"),
        )
        .select(
            "source",
            F.unix_timestamp(F.col("w.start")).alias("bucket_es"),
            "n_docs",
            "sum_tok",
            "min_tok",
            "max_tok",
        )
    )


def run_file_stream_once(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    schema,
    late_threshold: str = "10 minutes",
) -> DataFrame:
    """Drive a file-source stream to completion synchronously (test/dev
    harness): parquet files appearing in `input_dir` are the micro-batches.
    Returns the materialized result as a batch DataFrame."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch,
        # ordered by modification time → deterministic watermark progression
        .parquet(input_dir)
    )
    agg = stream_raw_tier(stream, late_threshold)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("raw_tier_stream")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql("SELECT * FROM raw_tier_stream")
