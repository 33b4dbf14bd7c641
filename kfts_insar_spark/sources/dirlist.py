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
