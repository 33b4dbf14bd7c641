"""Shared helpers for the oracle-checked query surface.

Cross-engine exactness rules (verified empirically in this sandbox):
- epoch micros: Spark ``timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01
  00:00:00', ts)`` == DuckDB ``epoch_us(ts)`` — TZ-independent for the
  TIMESTAMP_NTZ columns the driver's parquet produces. (DuckDB
  ``epoch()::BIGINT`` ROUNDS while Spark ``unix_timestamp`` truncates — never
  use those for comparison.)
- double aggregation order differs between engines → sums/avgs go through
  DECIMAL(38,6) (exact, order-free) then cast back to double.
- per-row double arithmetic (lag deltas, products) is IEEE-identical and
  safe to compare raw.
- integer arithmetic (the MINSTD synth chain, rolling hashes with explicit
  BIGINT casts in DuckDB) is bit-exact.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_PER_SF = 2_000_000  # n_docs = DOCS_PER_SF * sf  (sf0.01 → 20,000)
# The generator-backed oracles (seq_*/tok_*/kf_*) bake this into their SQL
# at import: the driver's gate runs at sf0.01, but the sf1 value gate
# (tools/check_queries.py with CHECK_SF_DIR) overrides it so the kernel
# family is value-pinned at 100× driver scale too — set BEFORE importing
# any plans module.
ORACLE_SF = float(os.environ.get("SPARK_GRAFT_ORACLE_SF", "0.01"))


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else ORACLE_SF


def n_docs_of(sf_dir: str) -> int:
    return max(100, int(round(DOCS_PER_SF * sf_of(sf_dir))))


ORACLE_N_DOCS = max(100, int(round(DOCS_PER_SF * ORACLE_SF)))


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def epoch_us(col: str = "ts"):
    """Epoch microseconds from a TIMESTAMP_NTZ column, TZ-independent."""
    return F.expr(
        f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {col})"
    )


# exact order-independent aggregates over doubles
def dsum(col: str):
    return F.sum(F.col(col).cast("decimal(38,6)")).cast("double")


def davg(col: str):
    return (
        F.sum(F.col(col).cast("decimal(38,6)")).cast("double") / F.count(col)
    )


DSUM_SQL = "CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)"
DAVG_SQL = "CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({c})"
