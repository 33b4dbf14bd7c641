#!/usr/bin/env python
"""Hardware controls for the BENCH_SCALING protocol: what does an 8→32
worker scale-up yield on THIS host for (a) pure compute and (b) pure memory
bandwidth, with no JVM, no Arrow bridge, no shuffle — the ceilings any
single-host measurement is bounded by.

- cpu:   cache-resident numpy math per task (compute-bound). Its efficiency
         is the best any CPU-bound engine stage can measure here.
- membw: large-array copies per task (DRAM-bandwidth-bound). Stages that
         stream decoded columns (parquet decode, shuffle spill, codec
         bit-matrix packing) are bounded by THIS number on one host —
         on a real cluster each executor brings its own memory bus.

Usage: python tools/scaling_controls.py   # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def alu_task(_i: int) -> int:
    # pure-Python integer ALU loop: ~zero memory traffic — the hardware
    # thread-scaling ceiling (anything bounded below this is memory/uncore)
    s = 7
    for i in range(1_500_000):
        s = (s * 48271 + i) % 2147483647
    return s


def numpy_task(_i: int) -> float:
    # vectorized numpy with temporaries (~1.6 MB operands): the shape of
    # every vectorized engine stage — temporaries stream through the SHARED
    # L3/DRAM, so this is the realistic ceiling for numpy-vectorized code
    x = np.arange(200_000, dtype=np.float64)
    s = 0.0
    for _ in range(400):
        s += float(np.sum(np.sqrt(x * 1.0001 + 1.0)))
    return s


def mem_task(_i: int) -> float:
    # streams ~9.6 GB through DRAM per task (32 MB buffers × 150 copies × 2)
    a = np.empty(4 * 1024 * 1024, dtype=np.float64)  # 32 MB
    b = np.arange(len(a), dtype=np.float64)
    for _ in range(150):
        np.copyto(a, b)
    return float(a[-1])


def kf_task(_i: int) -> float:
    # the ENGINE'S OWN Kalman kernel on a cache-typical batch, with no
    # Spark, no Arrow, no shuffle: if this multiprocessing scale-up lands
    # at the same efficiency as the Spark kalman job, the shortfall vs the
    # 0.8 target is the host's shared memory system, not the engine
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from kfts_insar_spark.operators.kalman import KFConfig, kalman_direct_batch

    cfg = KFConfig(model=[("POLY", 1), ("SIN", 6.28), ("COS", 6.28)], t_sep=4)
    M = 92
    t = np.arange(M) * 12.0 / 365.25
    rng = np.random.default_rng(_i % 8)
    y = rng.normal(0.0, 1.0, (2000, M))
    y[rng.random(y.shape) < 0.2] = np.nan
    out = kalman_direct_batch(y, t, cfg)
    return float(out["phase"][0, -1])


def run(task, workers: int, ntasks: int) -> float:
    with mp.Pool(workers) as p:
        p.map(task, range(workers))  # warm the pool
        t0 = time.perf_counter()
        p.map(task, range(ntasks))
        return time.perf_counter() - t0


def main() -> None:
    out = {}
    for name, task, ntasks in (
        ("alu", alu_task, 128),
        ("numpy_stream", numpy_task, 128),
        ("membw", mem_task, 128),
        ("kf_kernel", kf_task, 128),
    ):
        t8 = run(task, 8, ntasks)
        t32 = run(task, 32, ntasks)
        out[name] = {
            "sec_8w": round(t8, 2),
            "sec_32w": round(t32, 2),
            "speedup": round(t8 / t32, 2),
            "efficiency": round((t8 / t32) / 4.0, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
