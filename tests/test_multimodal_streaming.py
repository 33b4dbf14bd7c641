"""Multimodal binary plumbing + structured-streaming rollup tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kfts_insar_spark.operators.multimodal import (
    decode_features,
    resize_stub,
    synth_media,
)
from kfts_insar_spark.operators.rollup import rollup_raw
from kfts_insar_spark.synth import sequences


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synth_media(docs).cache()


def test_media_schema_and_determinism(spark, media):
    row = media.orderBy("doc_id").first()
    assert len(bytes(row.payload)) == 16  # md5 digest bytes
    assert row.meta.n_channels == 3 and row.meta.width >= 16
    # deterministic: same doc → same payload on recompute
    again = synth_media(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ).orderBy("doc_id").first()
    assert bytes(row.payload) == bytes(again.payload)


def test_decode_features_batch_shape(spark, media):
    feats = decode_features(media).toPandas()
    assert len(feats) == media.count()
    assert set(feats.columns) == {
        "doc_id", "mean_c0", "mean_c1", "mean_c2", "std_all", "hist_fp",
    }
    assert feats["mean_c0"].between(0, 255).all()
    # deterministic fingerprint
    again = decode_features(media).toPandas().set_index("doc_id")["hist_fp"]
    assert (feats.set_index("doc_id")["hist_fp"] == again).all()


def test_decode_strict_mode_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_features(media.limit(2), strict=True).collect()


def test_resize_stub_shapes(spark, media):
    out = resize_stub(media.limit(5), target=(8, 8)).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    assert all(len(bytes(p)) == 8 * 8 * 3 for p in out["payload"])


def test_streaming_rollup_equals_batch(spark, tmp_path):
    """Windowed streaming aggregation == batch raw rollup on the same rows
    (the continuous-aggregate contract, SURVEY.md §2.9 T5)."""
    from kfts_insar_spark.streaming.ingest import run_file_stream_once

    seq = sequences(spark, 1500).select(
        "doc_id", "n_tok", "source", "ingest_ts", "ingest_es"
    )
    inp = str(tmp_path / "in")
    data = seq.drop("ingest_es")
    data.coalesce(1).write.parquet(inp + "/b0")
    import time

    time.sleep(1.1)  # distinct mtimes → deterministic file order
    # sentinel row far in the future: pushes the watermark past every real
    # window so append mode finalizes them (standard stream-closing trick)
    hi = seq.agg(F.max("ingest_es")).first()[0]
    sentinel_es = (hi // 86400 + 30) * 86400
    spark.createDataFrame(
        [("___sentinel", 1, "___s", None)], data.schema
    ).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(sentinel_es))
    ).write.parquet(inp + "/b1")
    streamed = run_file_stream_once(
        spark,
        inp + "/*",
        str(tmp_path / "ckpt"),
        schema=data.schema,
    )
    got = sorted(
        tuple(r) for r in streamed.filter(F.col("source") != "___s").collect()
    )
    want = sorted(
        tuple(r)
        for r in rollup_raw(sequences(spark, 1500))
        .select("source", "bucket_es", "n_docs", "sum_tok", "min_tok", "max_tok")
        .collect()
    )
    assert got == want


def test_decode_features_matches_rowwise_reference(spark, media):
    """The batch-vectorized feature path (reduceat sums, bincount
    histograms, polynomial fingerprint) must equal a straightforward
    per-image numpy reference."""
    from kfts_insar_spark.operators.multimodal import (
        _FP_MOD,
        _FP_POWS,
        _decode_stub,
    )

    sample = media.orderBy("doc_id").limit(50).collect()
    got = (
        decode_features(media.orderBy("doc_id").limit(50))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for r in sample:
        img = _decode_stub(
            bytes(r.payload), r.meta.width, r.meta.height, r.meta.n_channels
        )
        means = img.mean(axis=(0, 1))
        hist, _ = np.histogram(img, bins=16, range=(0, 256))
        fp = int((hist.astype(np.int64) * _FP_POWS).sum() % _FP_MOD)
        g = got.loc[r.doc_id]
        np.testing.assert_allclose(
            [g.mean_c0, g.mean_c1, g.mean_c2], means, rtol=1e-12
        )
        np.testing.assert_allclose(g.std_all, img.std(), rtol=1e-9)
        assert int(g.hist_fp) == fp


def test_frame_sample_stride_and_determinism(spark, media):
    from kfts_insar_spark.operators.multimodal import frame_sample

    frames = frame_sample(media, every_ms=1000, max_frames=4).toPandas()
    meta = media.select(
        "doc_id", F.col("meta.duration_ms").alias("dur"),
        F.col("meta.width").alias("w"), F.col("meta.height").alias("h"),
        F.col("meta.n_channels").alias("c"),
    ).toPandas().set_index("doc_id")
    # frame count = min(max_frames, duration//stride, >=1) per doc
    per_doc = frames.groupby("doc_id").size()
    for doc_id, n in per_doc.items():
        assert n == min(4, max(1, int(meta.loc[doc_id, "dur"]) // 1000))
    # timestamps follow the stride; payload bytes match the declared shape
    g0 = frames[frames["doc_id"] == frames["doc_id"].iloc[0]].sort_values("frame_idx")
    assert g0["ts_ms"].tolist() == [i * 1000 for i in range(len(g0))]
    r = g0.iloc[0]
    assert len(bytes(r["payload"])) == int(
        meta.loc[r["doc_id"], "w"] * meta.loc[r["doc_id"], "h"] * meta.loc[r["doc_id"], "c"]
    )
    # deterministic across recomputation
    again = frame_sample(media, every_ms=1000, max_frames=4).toPandas()
    key = ["doc_id", "frame_idx"]
    a = frames.sort_values(key).reset_index(drop=True)
    b = again.sort_values(key).reset_index(drop=True)
    assert (a["mean_intensity"] == b["mean_intensity"]).all()
    # distinct frames of one doc differ (rotation stub varies by index)
    if len(g0) > 1:
        assert bytes(g0.iloc[0]["payload"]) != bytes(g0.iloc[1]["payload"])


def test_audio_features_against_numpy(spark, media):
    from kfts_insar_spark.operators.multimodal import audio_features

    out = audio_features(media).toPandas().set_index("doc_id")
    src = media.select(
        "doc_id", "payload", F.col("meta.duration_ms").alias("dur")
    ).toPandas()
    for _, r in src.head(20).iterrows():
        n = max(8, (int(r["dur"]) // 1000) * 8)
        reps = -(-n // len(r["payload"]))
        w = np.frombuffer(bytes(r["payload"]) * reps, dtype=np.uint8)[:n].astype(
            np.int64
        ) - 128
        got = out.loc[r["doc_id"]]
        assert got["n_samples"] == n
        assert abs(got["rms"] - float(np.sqrt((w * w).mean()))) < 1e-9
        assert got["zero_crossings"] == int(
            np.abs(np.diff((w >= 0).astype(np.int16))).sum()
        )
        assert got["peak"] == int(np.abs(w).max())
