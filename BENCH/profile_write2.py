"""Round-4 deep profile of the cell-partitioned silver write.

profile_write.py established: shuffle+sort scales 8->32 (5.0->2.6s) and
the FLAT parquet write scales (6.8->3.2s), but the partitionBy("cell_id")
write does not (9.7->8.9s). This script pins WHERE the non-scaling time
lives by running write variants inside one JVM per core level and, for
each write, splitting wall time into

  task_span    max(task finish) - min(task launch)  (parallel part)
  serial_tail  wall_end - max(task finish)          (driver commit part)

via the Spark event log (spark.eventLog.enabled).

Variants (all on the identical reshuffle() plan, 22.5M rows):
  part          production: partitionBy(cell_id), zstd, v2 commit
  part_v1       committer algorithm v1 (serial driver rename loop)
  part_snappy   snappy instead of zstd (zstd-close-cost hypothesis)
  part_c64      n_cells=64 (file-count-proportional-cost hypothesis)
  part_shufX    shuffle partitions = cores (fewer, bigger files)
  flat          no partitionBy (control)

Usage: python BENCH/profile_write2.py [reps]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _set_committer_version(spark, version: int) -> None:
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "mapreduce.fileoutputcommitter.algorithm.version", str(version)
    )


def _parse_event_log(log_dir: str, windows: dict) -> dict:
    """For each named wall-clock window, compute task_span and serial_tail
    from the event log's task launch/finish timestamps (epoch ms)."""
    out = {}
    events = []
    for path in glob.glob(f"{log_dir}/*"):
        if os.path.isdir(path):
            continue
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    info = ev.get("Task Info", {})
                    events.append(
                        (info.get("Launch Time", 0),
                         info.get("Finish Time", 0))
                    )
    for name, (t0, t1) in windows.items():
        t0ms, t1ms = t0 * 1000, t1 * 1000
        inside = [e for e in events if e[0] >= t0ms and e[1] <= t1ms + 500]
        if not inside:
            out[name] = {}
            continue
        first_launch = min(e[0] for e in inside)
        last_finish = max(e[1] for e in inside)
        out[name] = {
            "n_tasks": len(inside),
            "task_span": round((last_finish - first_launch) / 1000, 3),
            "serial_tail": round(t1ms / 1 - last_finish, 1) / 1000,
            "pre_roll": round((first_launch - t0ms) / 1000, 3),
        }
    return out


def job_main():
    sys.path.insert(0, REPO)
    from ecmwf_models_spark.operators.reshuffle import reshuffle
    from ecmwf_models_spark.session import get_spark
    from ecmwf_models_spark.synth import gen_transcripts

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    n_conv = int(os.environ.get("BENCH_N_CONV", "200000"))
    log_dir = os.environ["PROFILE_EVLOG"]
    spark = get_spark(
        f"pw2-{cpus}",
        cores=cpus,
        shuffle_partitions=max(cpus * 2, 32),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    bronze = gen_transcripts(
        spark, n_conv=n_conv, days=90, turns_per_conv=24
    ).localCheckpoint()
    bronze.count()

    # JIT warmup through both writer paths (excluded from timings)
    warm = gen_transcripts(
        spark, n_conv=max(n_conv // 50, 100), days=90, turns_per_conv=24
    ).localCheckpoint()
    warm.count()
    wtmp = tempfile.mkdtemp(prefix="pw2_warm_")
    reshuffle(warm, n_cells=256).write.mode("overwrite").parquet(f"{wtmp}/f")
    reshuffle(warm, n_cells=256).write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{wtmp}/p")
    shutil.rmtree(wtmp, ignore_errors=True)
    warm.unpersist()

    tmp = tempfile.mkdtemp(prefix="pw2_")
    windows, timings, fcounts = {}, {}, {}

    def run(name, fn, out_path):
        t0 = time.time()
        fn(out_path)
        t1 = time.time()
        timings[name] = round(t1 - t0, 3)
        windows[name] = (t0, t1)
        fcounts[name] = sum(
            len(fs) for _, _, fs in os.walk(out_path)
        )

    def plan(n_cells=256, shuf=None):
        if shuf is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuf))
        df = reshuffle(bronze, n_cells=n_cells)
        if shuf is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(max(cpus * 2, 32))
            )
        return df

    run("flat", lambda p: plan().write.mode("overwrite").parquet(p),
        f"{tmp}/flat")
    run("part", lambda p: plan().write.mode("overwrite")
        .partitionBy("cell_id").parquet(p), f"{tmp}/part")
    _set_committer_version(spark, 1)
    run("part_v1", lambda p: plan().write.mode("overwrite")
        .partitionBy("cell_id").parquet(p), f"{tmp}/part_v1")
    _set_committer_version(spark, 2)
    run("part_snappy", lambda p: plan().write.mode("overwrite")
        .option("compression", "snappy").partitionBy("cell_id").parquet(p),
        f"{tmp}/part_snappy")
    run("part_c64", lambda p: plan(n_cells=64).write.mode("overwrite")
        .partitionBy("cell_id").parquet(p), f"{tmp}/part_c64")
    run("part_shufX", lambda p: plan(shuf=cpus).write.mode("overwrite")
        .partitionBy("cell_id").parquet(p), f"{tmp}/part_shufX")

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    time.sleep(1.0)  # let the event log flush
    detail = _parse_event_log(log_dir, windows)
    print("PROFILE2 " + json.dumps(
        {"cpus": cpus, "wall": timings, "files": fcounts, "detail": detail}
    ))


def run_at(cpus: int) -> dict:
    shm = f"/dev/shm/pw2_{cpus}_{os.getpid()}"
    evlog = f"{shm}/evlog"
    os.makedirs(evlog, exist_ok=True)
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_FAST_COMMIT="1",
        SPARK_GRAFT_OFFHEAP_SIZE=f"{min(2 * cpus, 16)}g",
        SPARK_DRIVER_MEM=f"{min(2 * cpus, 16)}g",
        SPARK_LOCAL_DIRS=shm,
        TMPDIR=shm,
        PROFILE_CHILD="1",
        PROFILE_EVLOG=evlog,
    )
    pin = (
        ["taskset", "-c", f"0-{cpus - 1}"] if shutil.which("taskset") else []
    )
    try:
        r = subprocess.run(
            pin + [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env, timeout=2400,
        )
    finally:
        shutil.rmtree(shm, ignore_errors=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("PROFILE2 ")][-1]
    return json.loads(line[len("PROFILE2 "):])


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results = {8: [], 32: []}
    for i in range(reps):
        for c in (8, 32):
            r = run_at(c)
            results[c].append(r)
            print(f"rep{i} cpus={c}: wall={r['wall']}", flush=True)
            print(f"          detail={r['detail']}", flush=True)
    with open(f"{HERE}/profile_write2.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("WROTE profile_write2.json")


if __name__ == "__main__":
    if os.environ.get("PROFILE_CHILD"):
        job_main()
    else:
        main()
