"""Exactly-once foreachBatch commits into SnapshotTable."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kfts_insar_spark.sources.snapshot import SnapshotTable
from kfts_insar_spark.streaming.sink import SnapshotBatchSink


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sink_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("k")
    )


def test_replayed_batch_is_noop(tmpdir, spark):
    tbl = SnapshotTable(tmpdir + "/t")
    sink = SnapshotBatchSink(tbl)
    sink(_batch(spark, 0, 10), 0)
    sink(_batch(spark, 10, 30), 1)
    n1 = tbl.read(spark).count()
    sid1 = tbl.current_snapshot_id()
    # at-least-once redelivery of batch 1 (crash between sink and
    # checkpoint advance) must not double-append
    sink(_batch(spark, 10, 30), 1)
    sink(_batch(spark, 0, 10), 0)
    assert tbl.read(spark).count() == n1 == 30
    assert tbl.current_snapshot_id() == sid1
    # the next genuine batch still commits
    sink(_batch(spark, 30, 35), 2)
    assert tbl.read(spark).count() == 35
    assert sink.committed_batch_id() == 2


def test_real_stream_through_foreachbatch(tmpdir, spark):
    """Drive an actual Structured Streaming query through the sink, then
    restart the stream from the same checkpoint with extra input — rows
    already committed must not duplicate."""
    src = tmpdir + "/src"
    ckpt = tmpdir + "/ckpt"
    tbl = SnapshotTable(tmpdir + "/t")
    sink = SnapshotBatchSink(tbl)

    _batch(spark, 0, 20).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run():
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

    run()
    n_first = tbl.read(spark).count()
    assert n_first == 20
    # restart from the same checkpoint with one more file of input
    _batch(spark, 20, 25).write.mode("append").parquet(src)
    run()
    got = tbl.read(spark)
    assert got.count() == 25
    assert got.select("id").distinct().count() == 25
