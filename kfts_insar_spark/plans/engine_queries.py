"""Engine-core oracle-checked queries: the synthetic sequences table, the
retention tiers, the codec, and self-checking invariants (SURVEY.md §2.4 A9,
§2.10; BASELINE.json input_hint per-row token-array equality).

Every Spark query here is replayed bit-exactly by DuckDB SQL because the
synthetic table derives from pure integer arithmetic (synth.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.compress import compress_tier, decompress_tier
from ..operators.kalman import KFConfig, kalman_gapfill
from ..operators.rollup import (
    DAY_SECONDS,
    HOUR_SECONDS,
    RAW_SECONDS,
    rollup_cascade,
    rollup_raw,
    tier_sql,
)
from ..synth import sequences, sequences_sql
from .common import ORACLE_N_DOCS, n_docs_of

P_HASH = 1_000_000_007


def _seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequences(spark, n_docs_of(sf_dir))


def q_seq_rollup_raw(spark, sf_dir):
    return rollup_raw(_seq(spark, sf_dir))


def q_seq_rollup_raw_salted(spark, sf_dir):
    return rollup_raw(_seq(spark, sf_dir), salt_buckets=16)


def q_seq_rollup_1h(spark, sf_dir):
    return rollup_cascade(rollup_raw(_seq(spark, sf_dir)), HOUR_SECONDS)


def q_seq_rollup_1d(spark, sf_dir):
    return rollup_cascade(
        rollup_cascade(rollup_raw(_seq(spark, sf_dir)), HOUR_SECONDS), DAY_SECONDS
    )


def q_seq_gorilla_roundtrip(spark, sf_dir):
    """Gorilla encode∘decode over the raw tier — value-hash equality against
    the *uncompressed* oracle proves losslessness end-to-end in Spark."""
    raw = rollup_raw(_seq(spark, sf_dir))
    return decompress_tier(compress_tier(raw)).select(
        "source", "bucket_es", F.col("value").alias("sum_tok_d")
    )


def q_seq_token_fingerprint(spark, sf_dir):
    """Per-row token-array fingerprint (sum, first, last, rolling hash) —
    the strong form of the token-array-equality invariant, computed entirely
    with Catalyst array expressions (no Python)."""
    seq = _seq(spark, sf_dir)
    return seq.select(
        "doc_id",
        "n_tok",
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "tok_sum"
        ),
        F.element_at("tokens", 1).cast("int").alias("tok_first"),
        F.element_at("tokens", -1).cast("int").alias("tok_last"),
        F.aggregate(
            "tokens",
            F.lit(0).cast("long"),
            lambda a, x: (a * F.lit(31) + x) % F.lit(P_HASH),
        ).alias("tok_hash"),
    )


def q_seq_invariant_violations(spark, sf_dir):
    """Self-checking invariant: count of rows violating n_tok == size(tokens).
    Oracle is the constant 0 — a mismatch fails the value hash."""
    seq = _seq(spark, sf_dir)
    return seq.agg(
        F.sum(
            F.when(F.col("n_tok") != F.size("tokens"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("violations")
    )


def q_kf_gapfill_phases(spark, sf_dir):
    """Gap-fill the per-(source) raw-tier token series with the Kalman kernel
    (non-SQL-expressible: ordered stateful scan with matrix state →
    rows-only check; golden correctness lives in tests/test_kalman.py)."""
    raw = rollup_raw(_seq(spark, sf_dir))
    lo = raw.agg(F.min("bucket_es")).first()[0]
    hi = raw.agg(F.max("bucket_es")).first()[0]
    m = int((hi - lo) // RAW_SECONDS) + 1
    t = np.arange(m) * (RAW_SECONDS / DAY_SECONDS)
    ser = raw.select(
        F.col("source").alias("doc_id"),
        ((F.col("bucket_es") - F.lit(lo)) / RAW_SECONDS).cast("int").alias("step"),
        (
            ((F.col("bucket_es") - F.lit(lo)) / RAW_SECONDS).cast("int")
            * F.lit(RAW_SECONDS / DAY_SECONDS)
        ).alias("t"),
        F.col("sum_tok").cast("double").alias("value"),
    )
    cfg = KFConfig(model=[("POLY", 1)], sig_y=5e4, sig_i=1e4, sig_a=1e7, t_sep=4)
    return kalman_gapfill(ser, t, cfg, num_buckets=8)


def q_kf_innovation_stats(spark, sf_dir):
    """Innovation whiteness maps (A5, reference checkinnov.py:94-107):
    mean / median / std / last of the innovation sequence per series, plus
    gap counts — the engine's own post-hoc QA query over the KF output.
    Non-SQL-expressible upstream (stateful kernel) → rows-only check."""
    out = q_kf_gapfill_phases(spark, sf_dir)
    return out.groupBy("doc_id").agg(
        F.avg("innov").alias("mean_innov"),
        F.expr("percentile(innov, 0.5)").alias("med_innov"),
        F.stddev("innov").alias("std_innov"),
        F.count("innov").cast("long").alias("n_obs"),
        F.sum(F.col("gap_filled").cast("long")).cast("long").alias("n_gaps"),
    )


def q_kf_resume_consistency(spark, sf_dir):
    """Self-checking: |oneshot − (run+resume)| summed over every (doc, step)
    must be exactly 0 (reference update-mode test, split_data_4test.py).
    Oracle: the constant row (0 mismatches)."""
    from ..operators.kalman import kalman_resume

    raw = rollup_raw(_seq(spark, sf_dir))
    lo, hi = raw.agg(F.min("bucket_es"), F.max("bucket_es")).first()
    m = int((hi - lo) // RAW_SECONDS) + 1
    t = np.arange(m) * (RAW_SECONDS / DAY_SECONDS)
    ser = raw.select(
        F.col("source").alias("doc_id"),
        ((F.col("bucket_es") - F.lit(lo)) / RAW_SECONDS).cast("int").alias("step"),
        (
            ((F.col("bucket_es") - F.lit(lo)) / RAW_SECONDS).cast("int")
            * F.lit(RAW_SECONDS / DAY_SECONDS)
        ).alias("t"),
        F.col("sum_tok").cast("double").alias("value"),
    )
    cfg = KFConfig(model=[("POLY", 1)], sig_y=5e4, sig_i=1e4, sig_a=1e7, t_sep=4)
    one = kalman_gapfill(ser, t, cfg, num_buckets=4)
    k_split = max(cfg.t_sep + 2, m // 2)
    st = kalman_gapfill(
        ser.filter(F.col("step") < k_split), t[:k_split], cfg, num_buckets=4,
        emit_state=True,
    )
    upd = kalman_resume(
        ser.filter(F.col("step") >= k_split), st, t, cfg, num_buckets=4
    )
    j = one.alias("a").join(
        upd.alias("b"), ["doc_id", "step"], "inner"
    )
    return j.agg(
        F.sum(
            F.when(
                (F.abs(F.col("a.phase") - F.col("b.phase")) > 0)
                | (F.abs(F.col("a.std") - F.col("b.std")) > 0),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_mismatch")
    )


def _oracle_seq(with_tokens: bool = False) -> str:
    return sequences_sql(ORACLE_N_DOCS, with_tokens=with_tokens)


QUERIES = {
    "seq_rollup_raw": q_seq_rollup_raw,
    "seq_rollup_raw_salted": q_seq_rollup_raw_salted,
    "seq_rollup_1h": q_seq_rollup_1h,
    "seq_rollup_1d": q_seq_rollup_1d,
    "seq_gorilla_roundtrip": q_seq_gorilla_roundtrip,
    "seq_token_fingerprint": q_seq_token_fingerprint,
    "seq_invariant_violations": q_seq_invariant_violations,
    "kf_gapfill_phases": q_kf_gapfill_phases,  # rows-only
    "kf_innovation_stats": q_kf_innovation_stats,  # rows-only
    "kf_resume_consistency": q_kf_resume_consistency,
}

ORACLE_SQL = {
    "seq_rollup_raw": tier_sql(_oracle_seq(), RAW_SECONDS),
    "seq_rollup_raw_salted": tier_sql(_oracle_seq(), RAW_SECONDS),
    "seq_rollup_1h": tier_sql(_oracle_seq(), HOUR_SECONDS),
    "seq_rollup_1d": tier_sql(_oracle_seq(), DAY_SECONDS),
    "seq_gorilla_roundtrip": f"""
WITH seq AS ({_oracle_seq()})
SELECT source,
       CAST((ingest_es // {RAW_SECONDS}) * {RAW_SECONDS} AS BIGINT) AS bucket_es,
       CAST(sum(n_tok) AS DOUBLE) AS sum_tok_d
FROM seq GROUP BY 1, 2
""",
    "seq_token_fingerprint": f"""
WITH seq AS ({sequences_sql(ORACLE_N_DOCS, with_tokens=True)})
SELECT doc_id, n_tok,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(tokens, x -> CAST(x AS BIGINT))),
            (a, x) -> a + x) AS BIGINT)                          AS tok_sum,
       CAST(tokens[1] AS INT)                                    AS tok_first,
       CAST(tokens[-1] AS INT)                                   AS tok_last,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(tokens, x -> CAST(x AS BIGINT))),
            (a, x) -> (a * 31 + x) % {P_HASH}) AS BIGINT)        AS tok_hash
FROM seq
""",
    "seq_invariant_violations": """
SELECT CAST(0 AS BIGINT) AS violations
""",
    "kf_resume_consistency": """
SELECT CAST(0 AS BIGINT) AS n_mismatch
""",
}
