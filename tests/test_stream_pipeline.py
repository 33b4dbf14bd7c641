"""Streaming → tier pipeline, end-to-end: a checkpointed Structured
Streaming query lands the base table through the exactly-once snapshot
sink, the FULL pipeline (raw→1h→1d→compressed cascade + the stateful KF
gap-fill) runs over the streamed table, the stream restarts mid-way from
its checkpoint, the pipeline resumes — and every tier plus the KF state
must equal a one-shot batch pipeline on the same input, bit-exact.

This closes the round-2 gap: SnapshotBatchSink and TierPipeline were each
tested alone, but nothing drove a stream INTO the pipeline across a
restart. (Reference analogue: the update-mode restart consistency test,
/root/reference/kf/utils/split_data_4test.py:25-50 — here the 'restart'
is a real streaming-checkpoint recovery.)"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kfts_insar_spark.pipeline import TierPipeline
from kfts_insar_spark.sources.snapshot import SnapshotTable
from kfts_insar_spark.streaming.sink import SnapshotBatchSink
from kfts_insar_spark.synth import sequences

N = 3000


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_pipe_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _tier_rows(spark, pipe, tier):
    df = pipe.read_tier(spark, tier)
    if df is None:
        return []
    cols = [c for c in df.columns if c != "pday"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_streamed_pipeline_equals_batch_across_restart(spark, tmpdir):
    seq = sequences(spark, N).drop("tokens").cache()
    split_es = int(seq.approxQuantile("ingest_es", [0.5], 0)[0])
    src = tmpdir + "/src"
    ckpt = tmpdir + "/ckpt"
    landing = SnapshotTable(tmpdir + "/landing")
    sink = SnapshotBatchSink(landing)
    schema = seq.schema

    def stream_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    pipe = TierPipeline(tmpdir + "/tiers", kf_shards=4)

    # ---- segment 1: first half of the ingest slots lands, pipeline runs
    seq.filter(F.col("ingest_es") <= split_es).coalesce(2).write.mode(
        "overwrite"
    ).parquet(src)
    stream_once()
    landed1 = landing.read(spark)
    assert landed1.count() == seq.filter(F.col("ingest_es") <= split_es).count()
    r1 = pipe.run(spark, landed1)
    assert r1["status"] == "ok"

    # ---- mid-stream restart: second half appended, stream recovers from
    # its checkpoint (already-processed files are not re-delivered), the
    # pipeline resumes from its snapshot watermark
    seq.filter(F.col("ingest_es") > split_es).coalesce(2).write.mode(
        "append"
    ).parquet(src)
    stream_once()
    landed2 = landing.read(spark)
    assert landed2.count() == N  # exactly-once: no dup, no loss
    assert landed2.select("doc_id").distinct().count() == N
    r2 = pipe.run(spark, landed2)
    assert r2["status"] == "ok"
    assert r2["watermark_es"] > r1["watermark_es"]

    # ---- equality: every tier + the KF state vs a one-shot batch pipeline
    batch = TierPipeline(tmpdir + "/batch", kf_shards=4)
    batch.run(spark, seq)
    for tier in ("raw", "1h", "1d", "series", "gapfilled", "compressed"):
        assert _tier_rows(spark, pipe, tier) == _tier_rows(
            spark, batch, tier
        ), tier
    st_s = {
        r.doc_id: (r.k_done, r.idx0, tuple(r.m), tuple(r.P))
        for r in pipe.read_tier(spark, "state").collect()
    }
    st_b = {
        r.doc_id: (r.k_done, r.idx0, tuple(r.m), tuple(r.P))
        for r in batch.read_tier(spark, "state").collect()
    }
    assert st_s == st_b

    # replays of both layers are no-ops
    stream_once()
    assert landing.read(spark).count() == N
    assert pipe.run(spark, landing.read(spark))["status"] == "noop"
