"""spark-submit entry point.

On a real cluster::

    python -m kfts_insar_spark.packaging          # builds the zip artifact
    spark-submit --py-files kfts_insar_spark_*.zip \\
        --master yarn --num-executors 250 \\
        -- $(python -c 'import kfts_insar_spark.cli as c; print(c.__file__)') \\
        pipeline --input s3://…/sequences --base s3://…/tiers

Locally (this sandbox)::

    python -m kfts_insar_spark.cli pipeline --n-docs 20000 --base /tmp/tiers
    python -m kfts_insar_spark.cli kalman --n-docs 5000
    python -m kfts_insar_spark.cli retention --base /tmp/tiers --days 1

The job reads the sequences table (parquet path or synthetic), runs the
watermark-resumable tier pipeline, and prints the per-stage metrics — the
operational surface of the engine (reference analogue: `python kfts.py -c
config.ini`, /root/reference/kfts.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kfts_insar_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline", help="run the raw→1h→1d tier pipeline")
    pp.add_argument("--input", help="parquet path of the sequences table")
    pp.add_argument("--n-docs", type=int, default=20000, help="synthetic size")
    pp.add_argument("--base", required=True, help="tier tables base dir")
    pp.add_argument("--salt", type=int, default=16)

    kp = sub.add_parser("kalman", help="run the gap-fill kernel on a series")
    kp.add_argument("--input", help="parquet path of wide series")
    kp.add_argument("--n-docs", type=int, default=5000)
    kp.add_argument("--out", help="output parquet path")

    rp = sub.add_parser("retention", help="expire raw partitions older than N days")
    rp.add_argument("--base", required=True)
    rp.add_argument("--days", type=int, required=True)

    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark(app_name=f"kfts-{args.cmd}")

    if args.cmd == "pipeline":
        from .pipeline import TierPipeline
        from .synth import sequences

        seq = (
            spark.read.parquet(args.input) if args.input else sequences(spark, args.n_docs)
        )
        pipe = TierPipeline(args.base, salt_buckets=args.salt)
        res = pipe.run(spark, seq)
        print(json.dumps(res))
    elif args.cmd == "kalman":
        import numpy as np

        from .operators.kalman import KFConfig, kalman_gapfill_wide
        from .synth import series_wide

        ser = (
            spark.read.parquet(args.input)
            if args.input
            else series_wide(spark, args.n_docs)
        )
        t_grid = np.arange(92) * 12.0 / 365.25
        out = kalman_gapfill_wide(ser, t_grid, KFConfig())
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out}))
        else:
            print(json.dumps({"rows": out.count()}))
    elif args.cmd == "retention":
        from .pipeline import TierPipeline

        pipe = TierPipeline(args.base)
        wm = int(pipe.raw.property("watermark_es", 0))
        sid = pipe.expire_raw_before(wm - args.days * 86400)
        print(json.dumps({"snapshot_id": sid}))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
