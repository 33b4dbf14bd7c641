"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as `binary`
columns with typed metadata and runs decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs. The image/audio codecs are NOT in this
container, so the decode step is STUBBED (deterministic fake by default,
`NotImplementedError` in strict mode) — but everything Spark-side is real
and tested: schema, partitioning, mapInPandas batch shape, UDF signatures.

Layout convention:
    payload: binary           -- opaque encoded bytes
    media_type: string        -- 'image/png', 'audio/wav', …
    meta: struct<width:int, height:int, n_channels:int, duration_ms:int>
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, media_type string, "
    "meta struct<width:int, height:int, n_channels:int, duration_ms:int>"
)

STRICT_DECODE = False  # True → decode raises NotImplementedError (no codecs here)


def synth_media(docs: DataFrame, media_type: str = "image/png") -> DataFrame:
    """Attach a deterministic opaque payload + metadata to each doc —
    payload = repeated md5 bytes of the text (stands in for encoded pixels),
    metadata derived from n_chars. Pure Catalyst expressions."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 16).cast("int").alias("height"),
            F.lit(3).cast("int").alias("n_channels"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_stub(
    payload: bytes, width: int, height: int, channels: int, strict: bool | None = None
) -> np.ndarray:
    """STUB for the real image decode (no PIL/libjpeg in this container).

    Deterministic fake: tiles the payload bytes into the declared (h, w, c)
    shape — preserving the real decode's contract (shape, dtype, per-row
    determinism) so downstream feature extraction is fully testable.
    """
    if STRICT_DECODE if strict is None else strict:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg — not available in this "
            "container; deterministic fake used in tests instead"
        )
    n = height * width * channels
    reps = -(-n // len(payload))
    flat = np.frombuffer(payload * reps, dtype=np.uint8)[:n]
    return flat.reshape(height, width, channels)


def decode_features(
    media: DataFrame, batch_docs: int = 1024, strict: bool | None = None
) -> DataFrame:
    """decode → feature-extract as a mapInPandas operator.

    Emits per-doc features: mean/std per channel + a 16-bin intensity
    histogram fingerprint. The decode itself is the stub above; the Spark
    plumbing (Arrow batches of binary columns, struct metadata access,
    vectorized per-batch numpy) is the real, scale-relevant part.
    """
    schema = (
        "doc_id long, mean_c0 double, mean_c1 double, mean_c2 double, "
        "std_all double, hist_fp long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            metas = pdf["meta"]
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], metas
            ):
                img = _decode_stub(
                    bytes(payload),
                    meta["width"],
                    meta["height"],
                    meta["n_channels"],
                    strict,
                )
                means = img.mean(axis=(0, 1))
                hist, _ = np.histogram(img, bins=16, range=(0, 256))
                fp = int(
                    hashlib.md5(struct.pack("<16q", *hist.tolist())).hexdigest()[:15],
                    16,
                )
                out.append(
                    (
                        doc_id,
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        float(img.std()),
                        fp,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "mean_c0", "mean_c1", "mean_c2", "std_all", "hist_fp",
                ],
            )

    return media.mapInPandas(run, schema=schema)


def resize_stub(media: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Resize = decode → subsample → re-encode; with the codec stubbed this
    keeps the byte plumbing honest: output payload is a deterministic
    subsample of the fake-decoded array."""
    schema = "doc_id long, payload binary, media_type string, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        th, tw = target
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"], pdf["meta"]
            ):
                img = _decode_stub(
                    bytes(payload), meta["width"], meta["height"], meta["n_channels"]
                )
                ys = np.linspace(0, img.shape[0] - 1, th).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, tw).astype(int)
                small = img[np.ix_(ys, xs)]
                rows.append((doc_id, small.tobytes(), mtype, tw, th))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "media_type", "width", "height"]
            )

    return media.mapInPandas(run, schema=schema)
