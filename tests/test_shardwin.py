"""Shard-keyed window decomposition (operators/shardwin.py): the halo
exchange must make per-(source, shard) windows EXACT vs the global
per-source form, and the decomposed plans must actually gain parallelism
(the whole point — the 5-value `source` key capped every read-path window
at 5 tasks)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from kfts_insar_spark.operators.rollup import RAW_SECONDS, rollup_raw
from kfts_insar_spark.operators.shardwin import SHARD_STEPS, halo, with_shard
from kfts_insar_spark.plans import timeseries_queries as tq
from kfts_insar_spark.synth import sequences

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def raw(spark):
    return rollup_raw(sequences(spark, 20000)).persist()


def _global_lag(pdf: pd.DataFrame, k: int) -> pd.Series:
    return pdf.groupby("source")["sum_tok"].shift(k)


def test_halo_lag_exact_vs_global(spark, raw):
    """lag(1..7) per (source, shard) with halo depth 7 == global per-source
    lag, on the real tier (gappy lattice included)."""
    sharded = halo(
        with_shard(
            raw.withColumn(
                "step", (F.col("bucket_es") / RAW_SECONDS).cast("long")
            ),
            "step",
        ),
        ["source"],
        "shard",
        "bucket_es",
        rows_before=7,
    )
    w = Window.partitionBy("source", "shard").orderBy("bucket_es")
    got = (
        sharded.select(
            "source",
            "bucket_es",
            "_halo",
            *[F.lag("sum_tok", k).over(w).alias(f"l{k}") for k in (1, 4, 7)],
        )
        .filter(~F.col("_halo"))
        .toPandas()
        .sort_values(["source", "bucket_es"])
        .reset_index(drop=True)
    )
    pdf = (
        raw.toPandas().sort_values(["source", "bucket_es"]).reset_index(drop=True)
    )
    for k in (1, 4, 7):
        want = _global_lag(pdf, k)
        assert got[f"l{k}"].equals(want.rename(f"l{k}")), f"lag {k} diverges"


def test_halo_preserves_row_set(spark, raw):
    """Dropping _halo returns exactly the input row set (no dup, no loss)."""
    sharded = halo(
        with_shard(
            raw.withColumn(
                "step", (F.col("bucket_es") / RAW_SECONDS).cast("long")
            ),
            "step",
        ),
        ["source"],
        "shard",
        "bucket_es",
        rows_before=6,
        rows_after=6,
    )
    n_in = raw.count()
    surv = sharded.filter(~F.col("_halo"))
    assert surv.count() == n_in
    assert surv.select("source", "bucket_es").distinct().count() == n_in


def test_sharded_queries_gain_parallelism(spark, raw):
    """The window stage key cardinality must exceed the source count by the
    shard factor — ≥ 8 shards per source even on the 2-day test window
    (at production history lengths it is O(10^4) per source)."""
    keys = (
        with_shard(
            raw.withColumn(
                "step", (F.col("bucket_es") / RAW_SECONDS).cast("long")
            ),
            "step",
        )
        .select("source", "shard")
        .distinct()
        .count()
    )
    n_src = raw.select("source").distinct().count()
    assert keys >= 6 * n_src, f"only {keys} (source, shard) keys for {n_src} sources"


def test_halo_sparse_and_empty_shards(spark):
    """ADVICE r3 (high): ROWS frames count OBSERVED rows, not time — a
    shard holding fewer rows than the halo depth (or none: a gap spanning
    a whole shard) must still see its K global predecessors. Build a
    series where shard 1 has a single row, shard 2 is EMPTY, and shard 3
    resumes: lag(3) per (source, shard) with halo depth 3 must equal the
    global per-source lag at every surviving row."""
    steps = (
        list(range(0, 10))                      # shard 0: dense
        + [SHARD_STEPS + 5]                     # shard 1: one row
        # shard 2: empty (gap spanning the whole shard)
        + [3 * SHARD_STEPS + 1, 3 * SHARD_STEPS + 2]  # shard 3: two rows
        + list(range(4 * SHARD_STEPS, 4 * SHARD_STEPS + 6))  # shard 4
    )
    pdf = pd.DataFrame(
        {
            "source": ["a"] * len(steps) + ["b"] * 3,
            "step": steps + [0, SHARD_STEPS, 2 * SHARD_STEPS],
            "sum_tok": list(range(100, 100 + len(steps))) + [7, 8, 9],
        }
    )
    pdf["bucket_es"] = pdf["step"] * RAW_SECONDS
    df = with_shard(spark.createDataFrame(pdf), "step")
    for kw in ({"rows_before": 3}, {"rows_before": 3, "rows_after": 3}):
        sharded = halo(df, ["source"], "shard", "bucket_es", **kw)
        w = Window.partitionBy("source", "shard").orderBy("bucket_es")
        got = (
            sharded.select(
                "source", "bucket_es", "_halo",
                F.lag("sum_tok", 3).over(w).alias("l3"),
                F.lead("sum_tok", 2).over(w).alias("f2") if "rows_after" in kw
                else F.lit(None).alias("f2"),
            )
            .filter(~F.col("_halo"))
            .toPandas()
            .sort_values(["source", "bucket_es"])
            .reset_index(drop=True)
        )
        ref = pdf.sort_values(["source", "bucket_es"]).reset_index(drop=True)
        want_l3 = ref.groupby("source")["sum_tok"].shift(3)
        assert got["l3"].equals(want_l3.rename("l3")), f"lag(3) diverges ({kw})"
        assert len(got) == len(ref)
        if "rows_after" in kw:
            want_f2 = ref.groupby("source")["sum_tok"].shift(-2)
            assert got["f2"].equals(want_f2.rename("f2")), "lead(2) diverges"


def test_halo_no_duplicate_halo_rows(spark):
    """Each (row, dst shard) halo pair must appear exactly once even when
    one row serves several sparse downstream shards."""
    steps = [0, SHARD_STEPS + 1, 2 * SHARD_STEPS + 1, 3 * SHARD_STEPS + 1]
    pdf = pd.DataFrame(
        {"source": ["a"] * 4, "step": steps, "sum_tok": [1, 2, 3, 4]}
    )
    pdf["bucket_es"] = pdf["step"] * RAW_SECONDS
    df = with_shard(spark.createDataFrame(pdf), "step")
    sharded = halo(df, ["source"], "shard", "bucket_es", rows_before=3)
    dup = (
        sharded.groupBy("source", "shard", "bucket_es", "_halo")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    # row at step 0 must reach shards 1, 2 AND 3 (each needs 3 predecessors)
    fan = sharded.filter(
        (F.col("bucket_es") == 0) & F.col("_halo")
    ).select("shard").toPandas()["shard"].tolist()
    assert sorted(fan) == [1, 2, 3]


def test_sharded_ewma_crosses_boundaries(spark):
    """A series spanning several shards with a linear ramp: the sharded
    EWMA at shard-interior AND shard-boundary rows equals the direct
    single-partition computation."""
    n = SHARD_STEPS * 3 + 5
    ser = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["x"] * n,
                "bucket_es": [i * RAW_SECONDS for i in range(n)],
                "sum_tok": [3 * i + 1 for i in range(n)],
                "n_docs": [1] * n,
                "min_tok": [1] * n,
                "max_tok": [1] * n,
            }
        )
    )
    orig = tq._raw
    tq._raw = lambda *_a: ser
    try:
        got = (
            tq.q_seq_ewma(spark, SF_DIR)
            .toPandas()
            .sort_values("bucket_es")
            .reset_index(drop=True)
        )
    finally:
        tq._raw = orig
    # direct reference: K-term weighted mean with alpha = 1/2
    vals = [3 * i + 1 for i in range(n)]
    for idx in list(range(8)) + [SHARD_STEPS - 1, SHARD_STEPS, SHARD_STEPS + 1,
                                 2 * SHARD_STEPS, n - 1]:
        num = den = 0.0
        w = 1.0
        for j in range(8):
            if idx - j >= 0:
                num += vals[idx - j] * w
                den += w
            w *= 0.5
        assert got.loc[idx, "ewma"] == num / den, f"row {idx}"


def test_halo_null_keyed_series_exact(spark):
    """ADVICE r4 (low): a NULL-keyed series is still one series. The halo
    fan-out routes rows via a key equi-join; with plain `==` the null key
    never matches and the null series silently loses cross-shard halo
    rows. eqNullSafe must keep it exact vs the global window."""
    rows = []
    for src in ("a", None):
        for k in range(40):
            # stride 20 steps → ~3 rows per 64-step shard: lag(3) always
            # crosses a shard boundary
            rows.append(
                (src, (k * 20) * RAW_SECONDS, float(k * 3 + (src is None)))
            )
    df = spark.createDataFrame(rows, "source string, bucket_es long, sum_tok double")
    sharded = halo(
        with_shard(
            df.withColumn("step", (F.col("bucket_es") / RAW_SECONDS).cast("long")),
            "step",
        ),
        ["source"],
        "shard",
        "bucket_es",
        rows_before=3,
    )
    w = Window.partitionBy("source", "shard").orderBy("bucket_es")
    got = (
        sharded.select(
            "source", "bucket_es", "_halo", F.lag("sum_tok", 3).over(w).alias("l3")
        )
        .filter(~F.col("_halo"))
        .toPandas()
        .sort_values(["source", "bucket_es"])
        .reset_index(drop=True)
    )
    pdf = df.toPandas().sort_values(["source", "bucket_es"]).reset_index(drop=True)
    want = pdf.groupby("source", dropna=False)["sum_tok"].shift(3)
    assert got["l3"].equals(want.reset_index(drop=True).rename("l3"))
