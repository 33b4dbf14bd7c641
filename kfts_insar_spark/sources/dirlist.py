"""Directory-listing source (SURVEY.md §2.1 S6): discover observation pairs
from `YYYYMMDD_YYYYMMDD` path components and per-date metadata from text
files — the reference's ingest discovery (``getPairs``/``getBaselines``,
/root/reference/prepare_input.py:136-217) recast as a Spark scan:
`input_file_name()` + regexp extraction, no driver-side listing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAIR_RX = r"(\d{8})_(\d{8})"


def discover_pairs(spark: SparkSession, root: str, glob: str = "*") -> DataFrame:
    """Scan files under `root` whose path embeds `YYYYMMDD_YYYYMMDD`;
    return (path, date_minus, date_plus, t_minus_ord, t_plus_ord)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(root)
        .select(F.col("path"), F.col("length"))
    )
    dm = F.regexp_extract("path", PAIR_RX, 1)
    dp = F.regexp_extract("path", PAIR_RX, 2)
    return (
        files.filter(dm != "")
        .select(
            "path",
            "length",
            F.to_date(dm, "yyyyMMdd").alias("date_minus"),
            F.to_date(dp, "yyyyMMdd").alias("date_plus"),
        )
        .withColumn("t_minus_ord", F.unix_date("date_minus"))
        .withColumn("t_plus_ord", F.unix_date("date_plus"))
    )


def read_flat_raster(
    spark: SparkSession,
    root: str,
    nx: int,
    ny: int,
    interleave: str = "BSQ",
    nchannels: int = 1,
    channel: int = 1,
    dtype: str = "float32",
    big_endian: bool = False,
    glob: str = "*",
) -> DataFrame:
    """Flat-binary raster scan with BIL/BSQ/BIP interleave decode
    (SURVEY.md §2.1 S3/S4 — the reference's ``load_mmap``,
    /root/reference/kf/utils/tsio.py:18-98, which memory-maps and
    stride-views one local file).

    Spark recast: the ``binaryFile`` source scans many rasters in parallel;
    a mapInPandas stage decodes each file's bytes with the same reshape
    semantics the reference's strides express —
      BIL (band-interleaved-by-line):  (ny, nchannels, nx) → [:, ch, :]
      BSQ (band-sequential):           (nchannels, ny, nx) → [ch]
      BIP (band-interleaved-by-pixel): (ny, nx, nchannels) → [:, :, ch]
    Output is one row per raster LINE: (path, y, values array<double>) —
    the wide layout that keeps the Python boundary vectorized.
    """
    import numpy as np
    import pandas as pd

    fmt = interleave.upper()
    if fmt not in ("BIL", "BSQ", "BIP"):
        raise ValueError(f"interleave must be BIL/BSQ/BIP, got {interleave!r}")
    dt = np.dtype(dtype)
    if big_endian:
        dt = dt.newbyteorder(">")
    ch = channel - 1

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(root)
        .select("path", "content")
    )

    def decode(batches):
        for pdf in batches:
            frames = []
            for path, content in zip(pdf["path"], pdf["content"]):
                buf = np.frombuffer(bytes(content), dtype=dt)
                need = nx * ny * nchannels
                if len(buf) < need:
                    raise ValueError(
                        f"{path}: {len(buf)} items < {fmt} {ny}x{nx}x{nchannels}"
                    )
                buf = buf[:need]
                if fmt == "BIL":
                    img = buf.reshape(ny, nchannels, nx)[:, ch, :]
                elif fmt == "BSQ":
                    img = buf.reshape(nchannels, ny, nx)[ch]
                else:  # BIP
                    img = buf.reshape(ny, nx, nchannels)[:, :, ch]
                frames.append(
                    pd.DataFrame(
                        {
                            "path": path,
                            "y": np.arange(ny, dtype=np.int32),
                            "values": list(img.astype(np.float64)),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return files.mapInPandas(
        decode, schema="path string, y int, values array<double>"
    )


def baselines_from_text(spark: SparkSession, path: str) -> DataFrame:
    """Per-date scalar metadata from whitespace text files
    (reference getBaselines): lines 'YYYYMMDD <value>'."""
    txt = spark.read.text(path)
    date = F.regexp_extract("value", r"^(\d{8})\s", 1)
    val = F.regexp_extract("value", r"\s(-?\d+(?:\.\d+)?)\s*$", 1)
    return (
        txt.filter(date != "")
        .select(
            F.to_date(date, "yyyyMMdd").alias("date"),
            val.cast("double").alias("baseline"),
        )
    )
