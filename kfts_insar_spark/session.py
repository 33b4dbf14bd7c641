"""SparkSession factory.

Local-mode testing stands in for a multi-executor cluster; every knob here is
chosen so the *same plan* is the one we'd want on 1000 executors:
AQE on (runtime coalesce + skew-join splitting), shuffle partitions sized to
parallelism (not the 200 default), Arrow enabled for every pandas-UDF exchange,
UTC session time so results are reproducible against the DuckDB oracle.

Reference analogue: the MPI rank split in /root/reference/kf/readinput.py:166-212
(`dividepxls`) hand-rolls what `repartition` + AQE give us for free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "kfts_insar_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → ``local[*]``. On a real cluster this builder is bypassed
    by ``spark-submit`` conf; everything here is also safe to set cluster-side.
    """
    # Pin BLAS/OMP to one thread per Python worker: Spark already gives one
    # worker per core, so library-level threading multiplies to cores² and
    # thrashes (the reference pins OMP_NUM_THREADS for its MPI ranks the same
    # way, run_KFTS.slurm:13). Must happen before numpy loads in workers —
    # workers fork from a daemon that inherits this env.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cores}]" if env_cores else "local[*]"
        n = int(env_cores) if env_cores else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores

    sp = shuffle_partitions or max(DEFAULT_SHUFFLE_PARTITIONS, n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # deterministic float semantics; ANSI off so overflow/div0 match the
        # legacy semantics the oracle arithmetic assumes (we never rely on
        # either, but a hard error mid-benchmark is worse than a null)
        .config("spark.sql.ansi.enabled", "false")
        # v2 file-output commit: task-side renames instead of a driver-side
        # sequential pass over every partition dir — the snapshot layer's
        # manifest (not _SUCCESS markers) is the source of truth, so the
        # weaker job-level atomicity of v2 is irrelevant here, and
        # partitioned tier writes (one dir per pday) commit O(files/tasks)
        # instead of O(files) on the driver
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # local file:// goes through Hadoop's ChecksumFileSystem by default,
        # which writes (and renames) a .crc sidecar per output file — for
        # tier commits fanning ~1600 one-file-per-day partitions that is
        # ~1600 extra creates+renames per write (measured 25-30% of the
        # partitioned-write wall). Parquet's own footer/magic validation
        # covers integrity; cluster schemes (hdfs://, s3a://) are unaffected
        # by this file://-only mapping.
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package to Python workers (same artifact spark-submit
    # --py-files would ship on a real cluster) so UDF closures unpickle
    # regardless of the driver's cwd
    from .packaging import attach_package

    attach_package(spark)
    return spark
