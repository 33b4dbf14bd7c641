"""Compressed retention tiers: pack each (source, coarse bucket) series into
Gorilla binary columns, and unpack for verification / time-travel reads.

groupBy(source, chunk).applyInPandas — one codec call per bucket, Arrow
batched; zero per-row Python. Chunk width defaults to 1 day of raw points
(288 × 300 s), the same granularity the retention policy expires at, so
dropping an expired chunk is a partition delete, never a rewrite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codec import (
    decode_timestamps,
    decode_values,
    encode_timestamps_vec as encode_timestamps,
    encode_values_vec as encode_values,
)
from ..schema import COMPRESSED_TIER

CHUNK_SECONDS = 86400


def compress_tier(
    tier: DataFrame,
    value_col: str = "sum_tok",
    chunk_seconds: int = CHUNK_SECONDS,
) -> DataFrame:
    """tier(source, bucket_es, <value_col>, …) → COMPRESSED_TIER rows."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (src, chunk), g in pdf.groupby(["source", "_chunk"], sort=False):
            g = g.sort_values("bucket_es")
            ts = g["bucket_es"].to_numpy(np.int64)
            vals = g["_v"].to_numpy(np.float64)
            out.append(
                (
                    src,
                    int(chunk),
                    len(ts),
                    encode_timestamps(ts),
                    encode_values(vals),
                )
            )
        return pd.DataFrame(
            out, columns=["source", "bucket_es", "n_points", "ts_codec", "val_codec"]
        )

    chunked = tier.select(
        "source",
        "bucket_es",
        F.col(value_col).cast("double").alias("_v"),
        (F.floor(F.col("bucket_es") / F.lit(chunk_seconds)) * F.lit(chunk_seconds))
        .cast("long")
        .alias("_chunk"),
    )
    return chunked.groupBy("source", "_chunk").applyInPandas(
        pack, schema=COMPRESSED_TIER
    )


def decompress_tier(comp: DataFrame, value_name: str = "value") -> DataFrame:
    """Inverse of :func:`compress_tier` (verification path)."""
    schema = f"source string, bucket_es long, {value_name} double"

    def unpack(it):
        for pdf in it:
            frames = []
            for r in pdf.itertuples(index=False):
                ts = decode_timestamps(bytes(r.ts_codec), r.n_points)
                vs = decode_values(bytes(r.val_codec), r.n_points)
                frames.append(
                    pd.DataFrame(
                        {"source": r.source, "bucket_es": ts, value_name: vs}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return comp.mapInPandas(unpack, schema=schema)
