"""Stateful streaming KF: two micro-batches through
applyInPandasWithState must equal the one-shot batch kernel — the streaming
form of the update-mode consistency test."""

import time

import numpy as np
import pandas as pd

from kfts_insar_spark.operators.kalman import KFConfig, kalman_direct_batch
from kfts_insar_spark.streaming.stateful import stream_kalman
from tests.test_kalman import CFG, M, T, make_series


def test_streaming_kf_matches_batch(spark, tmp_path):
    _, y, _, _ = make_series(6)
    B = y.shape[0]
    k_split = 50

    def write_batch(steps, sub):
        rows = []
        for b in range(B):
            for k in steps:
                v = y[b, k]
                rows.append(
                    (f"d{b:03d}", int(k), float(T[k]),
                     None if np.isnan(v) else float(v))
                )
        pdf = pd.DataFrame(rows, columns=["doc_id", "step", "t", "value"])
        sdf = spark.createDataFrame(pdf).selectExpr(
            "doc_id", "cast(step as int) step", "t", "value"
        )
        sdf.coalesce(1).write.parquet(str(tmp_path / "in" / sub))

    write_batch(range(k_split), "b0")
    time.sleep(1.1)  # mtime ordering
    write_batch(range(k_split, M), "b1")

    stream = (
        spark.readStream.schema("doc_id string, step int, t double, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = stream_kalman(stream, T, CFG)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("kf_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT * FROM kf_stream").toPandas()
    # update mode re-emits refined steps: keep the LAST emission per key
    got = got.drop_duplicates(["doc_id", "step"], keep="last").sort_values(
        ["doc_id", "step"]
    )
    one = kalman_direct_batch(y, T, CFG)
    gp = got.pivot(index="doc_id", columns="step", values="phase").to_numpy()
    np.testing.assert_allclose(gp, one["phase"], rtol=1e-9, atol=1e-9)
    gs = got.pivot(index="doc_id", columns="step", values="std").to_numpy()
    np.testing.assert_allclose(gs, one["std"], rtol=1e-9, atol=1e-9)
