#!/usr/bin/env python
"""spark-submit --py-files deployment smoke (the north_rule ship shape):
the job imports the engine ONLY from the --py-files zip (no repo on
sys.path) and runs the committed tier pipeline end-to-end.

Run:
  ZIP=$(python -m kfts_insar_spark.packaging)
  spark-submit --master local[8] --py-files "$ZIP" tools/submit_smoke.py

Verified output (this sandbox):
  SUBMIT_SMOKE_RESULT ok [('1d', 5), ('1h', 40), ('compressed', 5),
                          ('gapfilled', 3640), ('raw', 392)]

On a real cluster the same two lines deploy the engine: the zip ships to
every executor, `--master` points at the cluster manager, and the
pipeline's snapshot tables land on the shared filesystem passed to
TierPipeline.
"""

import tempfile

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("submit-smoke")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)

# imports AFTER the session exists — resolved from the --py-files zip
from kfts_insar_spark.pipeline import TierPipeline  # noqa: E402
from kfts_insar_spark.synth import sequences  # noqa: E402

pipe = TierPipeline(
    tempfile.mkdtemp(prefix="submit_smoke_"), run_gapfill=True, kf_shards=8
)
res = pipe.run(spark, sequences(spark, 4000))
print("SUBMIT_SMOKE_RESULT", res["status"], sorted(res["rows"].items()))
spark.stop()
