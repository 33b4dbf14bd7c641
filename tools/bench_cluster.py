#!/usr/bin/env python
"""Direct multi-executor scaling measurement on a LOCAL STANDALONE CLUSTER.

The north_rule's ≥0.8 N→4N scaling target talks about executors, not
threads. `tools/bench_scaling.py` approximates it with local[N] vs
local[4N] — one JVM heap, one GC, one Python-exchange bridge shared by all
threads, which is exactly the term the round-2 hardware controls identified
as the residual. This harness removes that term WITHOUT new hardware:

- a real Spark standalone master + 4 worker daemons on this host;
- each worker offers 8 cores → with spark.executor.cores=8 every executor
  is its own 8-core JVM with its own heap, GC, shuffle client and
  pyspark.daemon (Python worker pool);
- the SAME driver app runs at spark.cores.max=8 (→ exactly 1 executor)
  and spark.cores.max=32 (→ exactly 4 executors) over the SAME
  materialized parquet input (shared with bench_scaling.py);
- efficiency = (T_1exec / T_4exec) / 4.

This is the multi-executor shape of a real cluster in everything but the
physical memory bus: per-executor heaps, per-executor Python bridges,
network-stack (loopback) shuffle fetches, TorrentBroadcast to remote
executors, task serialization over RPC. The one remaining shared resource
is host DRAM bandwidth — which a real 4-node cluster would multiply, so
the number reported here is a LOWER bound on real-cluster efficiency.

Protocol details mirror bench_scaling.py: fresh driver JVM per level,
one untimed warm run (JIT + codegen + executor Python pools), min of
SCALE_TRIALS timed runs, A/B interleaved rounds with per-(job, level)
minima so one-sided hypervisor stalls cannot poison a level.

Usage:
  python tools/bench_cluster.py                 # full run → BENCH_CLUSTER.md
  python tools/bench_cluster.py --driver 8      # child mode (internal)
  python tools/bench_cluster.py --stop          # tear down master/workers
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import (  # noqa: E402
    INPUT_DIR,
    KF_DOCS,
    M,
    SPLIT_CONF,
    TRIALS,
    materialize,
)

MASTER_URL = "spark://127.0.0.1:7077"
CLUSTER_DIR = "/tmp/spark-cluster"
N_WORKERS = 4
WORKER_CORES = 8
WORKER_MEM = "20g"
EXECUTOR_MEM = os.environ.get("SCALE_EXECUTOR_MEM", "18g")


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _master_alive() -> bool:
    try:
        with socket.create_connection(("127.0.0.1", 7077), timeout=2):
            return True
    except OSError:
        return False


def start_cluster() -> None:
    """Idempotently start master + N_WORKERS worker daemons (separate JVMs)."""
    os.makedirs(f"{CLUSTER_DIR}/logs", exist_ok=True)
    sh = _spark_home()
    env = dict(os.environ, SPARK_HOME=sh)
    if not _master_alive():
        with open(f"{CLUSTER_DIR}/logs/master.log", "w") as log:
            subprocess.Popen(
                [
                    f"{sh}/bin/spark-class",
                    "org.apache.spark.deploy.master.Master",
                    "--host", "127.0.0.1", "--port", "7077",
                    "--webui-port", "8089",
                ],
                stdout=log, stderr=subprocess.STDOUT, env=env,
            )
        for _ in range(60):
            if _master_alive():
                break
            time.sleep(1)
        else:
            raise RuntimeError("standalone master did not come up")
    # workers: liveness by PROCESS state, never by log contents — a stale
    # "Successfully registered" line from a killed worker made start_cluster
    # a noop while the master had zero workers, and the driver then waited
    # forever on "requires more resource than any of Workers could have"
    alive = subprocess.run(
        ["pgrep", "-fc", "deploy.worker.Worker"],
        capture_output=True, text=True,
    )
    running = int(alive.stdout.strip() or 0)
    if running < N_WORKERS:
        subprocess.run(
            ["pkill", "-f", "deploy.worker.Worker"], check=False
        )
        time.sleep(2)
        for i in range(1, N_WORKERS + 1):
            lg = f"{CLUSTER_DIR}/logs/worker{i}.log"
            wenv = dict(env, SPARK_WORKER_DIR=f"{CLUSTER_DIR}/work{i}")
            with open(lg, "w") as log:
                subprocess.Popen(
                    [
                        f"{sh}/bin/spark-class",
                        "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                        "--cores", str(WORKER_CORES),
                        "--memory", WORKER_MEM,
                        "--webui-port", str(8090 + i),
                    ],
                    stdout=log, stderr=subprocess.STDOUT, env=wenv,
                )
        for _ in range(60):
            time.sleep(2)
            ok = sum(
                1 for i in range(1, N_WORKERS + 1)
                if "Successfully registered"
                in open(f"{CLUSTER_DIR}/logs/worker{i}.log").read()
            )
            if ok >= N_WORKERS:
                break
        else:
            raise RuntimeError("workers did not register with the master")


def stop_cluster() -> None:
    subprocess.run(
        ["pkill", "-f", "org.apache.spark.deploy.(master.Master|worker.Worker)"],
        check=False,
    )


def driver(cores_max: int, pkg_root: str | None = None) -> None:
    """Child: one driver app pinned to cores_max total cores → exactly
    cores_max/WORKER_CORES executors, each an isolated 8-core JVM.

    ``pkg_root`` (A/B mode) prepends a checkout of a PREVIOUS round's repo
    to sys.path, so the whole job — driver plans AND the executor-side
    package zip (packaging._PKG_DIR follows the import) — runs that
    round's engine code under the identical harness, cluster, and input.
    """
    if pkg_root:
        sys.path.insert(0, pkg_root)
        for m in [m for m in sys.modules if m.startswith("kfts_insar_spark")]:
            del sys.modules[m]
    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kfts_insar_spark.operators.compress import compress_tier
    from kfts_insar_spark.operators.kalman import KFConfig, kalman_gapfill_wide
    from kfts_insar_spark.operators.rollup import (
        HOUR_SECONDS,
        rollup_cascade,
        rollup_raw,
    )

    b = (
        SparkSession.builder.master(MASTER_URL)
        .appName(f"cluster-scale-{cores_max}")
        .config("spark.executor.cores", str(WORKER_CORES))
        .config("spark.executor.memory", EXECUTOR_MEM)
        .config("spark.cores.max", str(cores_max))
        .config("spark.driver.memory", "8g")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.sql.shuffle.partitions", str(cores_max))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        # all files are driver-host-local; don't wait for locality
        .config("spark.locality.wait", "0")
    )
    for k, v in SPLIT_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from kfts_insar_spark.packaging import attach_package

    attach_package(spark)

    cfg = KFConfig(
        model=[("POLY", 1), ("SIN", 6.283185307179586), ("COS", 6.283185307179586)],
        sig_y=1.0, sig_i=0.5, sig_a=30.0, t_sep=4,
    )
    t_grid = np.arange(M) * 12.0 / 365.25

    def job_kalman():
        kalman_gapfill_wide(
            spark.read.parquet(f"{INPUT_DIR}/serw"), t_grid, cfg
        ).count()

    def job_tiers():
        seq = spark.read.parquet(f"{INPUT_DIR}/seqmeta")
        # salt FIXED across levels: salting with cores_max would give the
        # 4N level 4x the partial-agg groups — a different job, not the
        # same job at higher parallelism
        rollup_cascade(
            rollup_raw(seq, salt_buckets=int(os.environ.get("SCALE_SALT", "32"))),
            HOUR_SECONDS,
        ).count()

    def job_compress():
        raw = spark.read.parquet(f"{INPUT_DIR}/raw")
        compress_tier(raw, chunk_seconds=21600).count()

    def job_fingerprint():
        seq = spark.read.parquet(f"{INPUT_DIR}/seq")
        seq.select(
            F.aggregate(
                "tokens",
                F.lit(0).cast("long"),
                lambda a, x: (a * 31 + x) % 1_000_000_007,
            ).alias("h")
        ).agg(F.sum("h")).collect()

    def job_scan_tiers():
        # scan-only control for the tiers job (r3 verdict item 6): the SAME
        # files, the SAME columns, but just a sum — no shuffle, no agg tree.
        # If this control scales like tiers (~0.75), the tiers ceiling is
        # the scan (file-parallelism / DRAM), not the rollup plan; if it
        # scales ≥0.8, the gap is in the aggregation path.
        seq = spark.read.parquet(f"{INPUT_DIR}/seqmeta")
        seq.agg(
            F.sum("ingest_es"), F.sum("n_tok"), F.count("source")
        ).collect()

    only = os.environ.get("SCALE_JOBS")  # comma list → targeted re-runs
    timings = {}
    for name, fn in (
        ("kalman", job_kalman),
        ("tiers", job_tiers),
        ("scan_tiers", job_scan_tiers),
        ("compress", job_compress),
        ("fingerprint", job_fingerprint),
    ):
        if only and name not in only.split(","):
            continue
        fn()  # warm: JIT + codegen + executor-side Python pools
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = best
    # record the executor topology the master actually granted (proof this
    # measured 1 vs 4 separate JVMs, not spread-out thread slices)
    status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
    timings["_executors"] = status.size() - 1  # minus driver
    spark.stop()
    print("RESULT " + json.dumps(timings))


def ab_main() -> None:
    """One-window interleaved HEAD-vs-previous-round A/B of the cluster
    kalman job (r4 verdict item 1): W5/W6 measured kalman 4-exec scaling at
    0.60 vs W2's 0.821 record with the 1-exec level pinned at W2's value —
    this separates "every post-W2 window had a worse memory bus" from "a
    post-W2 package change added 4-executor memory traffic", by running the
    r3-tag engine code and HEAD in the SAME window on the SAME cluster and
    input, interleaved per level, with the hardware ceilings sampled in the
    same window. The ref defaults to the commit that recorded
    BENCH_r03.json (the round-3 code that set the W2 record), overridable
    via SCALE_AB_REF.
    """
    import shutil as _sh
    import tempfile as _tmp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref = os.environ.get("SCALE_AB_REF")
    if not ref:
        ref = subprocess.run(
            ["git", "rev-list", "-1", "HEAD", "--", "BENCH_r03.json"],
            cwd=repo, capture_output=True, text=True,
        ).stdout.strip()
    if not ref:
        raise SystemExit("no A/B ref (BENCH_r03.json has no commit)")
    materialize()
    start_cluster()
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
        SCALE_JOBS="kalman",
    )
    wt = _tmp.mkdtemp(prefix="cluster_ab_wt_")
    wtd = os.path.join(wt, "prev")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wtd, ref],
        cwd=repo, check=True, capture_output=True,
    )

    def run_child(cores: int, pkg: str | None) -> float:
        cmd = [sys.executable, os.path.abspath(__file__), "--driver", str(cores)]
        if pkg:
            cmd += ["--pkg", pkg]
        out = subprocess.run(
            cmd, capture_output=True, text=True, check=True, env=env, cwd=repo,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
        got = json.loads(line[len("RESULT "):])
        return got["kalman"]

    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    if rounds < 1:
        raise SystemExit("SCALE_ROUNDS must be >= 1 for an A/B report")
    best: dict[tuple[str, int], float] = {}
    samples: dict[tuple[str, int], list] = {}
    try:
        for r in range(rounds):
            # adjacent per level: head-8, prev-8, head-32, prev-32 — any
            # bus-weather drift hits both sides of each comparison equally.
            # Order ALTERNATES per round: with a fixed order each side's
            # children always follow the same predecessor (JVM teardown /
            # page-cache state), a systematic the W7 run measured at ~11%
            # on byte-identical code; alternation cancels it in the min.
            for cores in (WORKER_CORES, N_WORKERS * WORKER_CORES):
                order = (("head", None), ("prev", wtd))
                if r % 2:
                    order = order[::-1]
                for side, pkg in order:
                    t = run_child(cores, pkg)
                    k = (side, cores)
                    best[k] = min(best.get(k, float("inf")), t)
                    samples.setdefault(k, []).append(round(t, 2))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wtd],
            cwd=repo, capture_output=True,
        )
        _sh.rmtree(wt, ignore_errors=True)
    ctrl = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "scaling_controls.py")],
        capture_output=True, text=True,
    ).stdout.strip().splitlines()
    controls = json.loads(ctrl[-1]) if ctrl else {}
    n, n4 = WORKER_CORES, N_WORKERS * WORKER_CORES
    rep = {"mode": "cluster-ab", "prev_ref": ref[:12], "rounds": rounds,
           "controls": controls, "sides": {}}
    for side in ("head", "prev"):
        t1, t4 = best[(side, n)], best[(side, n4)]
        rep["sides"][side] = {
            "sec_1exec": round(t1, 2),
            "sec_4exec": round(t4, 2),
            "efficiency": round((t1 / t4) / (n4 / n), 3),
            "samples_1exec": samples[(side, n)],
            "samples_4exec": samples[(side, n4)],
        }
    rep["ab_ratio_1exec"] = round(
        best[("head", n)] / best[("prev", n)], 3
    )
    rep["ab_ratio_4exec"] = round(
        best[("head", n4)] / best[("prev", n4)], 3
    )
    print(json.dumps(rep, indent=2))


def main() -> None:
    if "--driver" in sys.argv:
        pkg = (
            sys.argv[sys.argv.index("--pkg") + 1] if "--pkg" in sys.argv else None
        )
        driver(int(sys.argv[sys.argv.index("--driver") + 1]), pkg)
        return
    if "--ab" in sys.argv:
        ab_main()
        return
    if "--stop" in sys.argv:
        stop_cluster()
        return

    materialize()
    start_cluster()
    levels = (WORKER_CORES, N_WORKERS * WORKER_CORES)  # 8 → 1 exec, 32 → 4
    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    results: dict[int, dict] = {}
    execs: dict[int, int] = {}
    for _ in range(rounds):
        for cores in levels:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--driver", str(cores)],
                capture_output=True, text=True, check=True, env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = [
                l for l in out.stdout.splitlines() if l.startswith("RESULT ")
            ][-1]
            got = json.loads(line[len("RESULT "):])
            execs[cores] = int(got.pop("_executors"))
            if cores in results:
                results[cores] = {k: min(results[cores][k], got[k]) for k in got}
            else:
                results[cores] = got

    n, n4 = levels
    report = {
        "mode": "standalone-cluster",
        "executors_n": execs[n],
        "executors_4n": execs[n4],
        "executor_cores": WORKER_CORES,
        "executor_memory": EXECUTOR_MEM,
        "jobs": {},
    }
    for job in results[n]:
        tn, t4 = results[n][job], results[n4][job]
        eff = (tn / t4) / (n4 / n)
        report["jobs"][job] = {
            "sec_1exec": round(tn, 2),
            "sec_4exec": round(t4, 2),
            "speedup": round(tn / t4, 2),
            "efficiency": round(eff, 3),
        }
    have = set(results[n])
    if {"kalman", "tiers"} <= have:
        kt_n = results[n]["kalman"] + results[n]["tiers"]
        kt_4 = results[n4]["kalman"] + results[n4]["tiers"]
        report["kalman_tiers_efficiency"] = round((kt_n / kt_4) / (n4 / n), 3)
    core = [j for j in ("kalman", "tiers", "compress") if j in have]
    tot_n = sum(results[n][j] for j in core)
    tot_4 = sum(results[n4][j] for j in core)
    report["engine_efficiency"] = round((tot_n / tot_4) / (n4 / n), 3)
    print(json.dumps(report, indent=2))

    if os.environ.get("SCALE_JOBS"):
        return  # targeted re-run: report to stdout only
    kf4 = results[n4]["kalman"]
    # raw auto-report; BENCH_CLUSTER.md is the curated multi-window narrative
    with open("BENCH_CLUSTER_auto.md", "w") as f:
        f.write(
            "# Multi-executor scaling — standalone cluster, 1 vs 4 executor "
            "JVMs\n\n"
            "Direct measurement of the north_rule's N→4N criterion on a real "
            "Spark standalone cluster (master + 4 worker daemons on this "
            "host): `spark.executor.cores=8` makes every executor its own "
            "8-core JVM with its own heap, GC, shuffle client and Python "
            "worker pool; `spark.cores.max` 8 vs 32 grants exactly "
            f"{execs[n]} vs {execs[n4]} executors (verified from the "
            "master's grant each run). Same materialized parquet input, "
            "fresh driver JVM per level, warm run then min of "
            f"{TRIALS} timed runs × {rounds} interleaved rounds.\n\n"
            "| job | 1 executor (8c) sec | 4 executors (32c) sec | speedup "
            "| efficiency |\n|---|---|---|---|---|\n"
        )
        for job, r in report["jobs"].items():
            f.write(
                f"| {job} | {r['sec_1exec']} | {r['sec_4exec']} "
                f"| {r['speedup']} | {r['efficiency']} |\n"
            )
        f.write(
            f"\n**kalman+tiers composite efficiency (north-rule core): "
            f"{report['kalman_tiers_efficiency']}** (target ≥ 0.8). "
            f"Engine composite incl. compress: "
            f"{report['engine_efficiency']}.\n\n"
            f"Kalman gap-fill throughput at 4 executors: "
            f"{KF_DOCS * M / kf4 / 1e6:.1f} M rolled-up points/s "
            f"({KF_DOCS} docs × {M} steps).\n\n"
            "Executors are separate JVMs (per-executor heap "
            f"{EXECUTOR_MEM}, own GC, own pyspark.daemon), shuffle blocks "
            "move through the network stack, broadcasts use "
            "TorrentBroadcast — the multi-executor shape of a real "
            "cluster in everything except the physical memory bus, which "
            "all four executors still share on this single host. A real "
            "4-node cluster multiplies DRAM bandwidth with node count, so "
            "these efficiencies are a LOWER bound for bandwidth-bound "
            "stages (compress).\n"
        )


if __name__ == "__main__":
    main()
