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
