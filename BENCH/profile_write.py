"""Diagnose the local[32]-vs-local[8] reshuffle_write regression.

Splits the flagship reshuffle+silver-write phase into its physical parts
so the non-scaling one is pinned:

  shuffle_sort   reshuffle() plan executed into the `noop` sink —
                 range exchange + both in-partition sorts + the
                 streaming SortAggregate dedup, ZERO write cost.
  parquet_flat   same plan written as plain parquet (no partitionBy):
                 adds columnar encode + zstd + file IO.
  parquet_part   the production write_silver path (partitionBy cell_id).

Runs one JVM per (cpus, variant) via the same executor-model harness as
run_scaling.py (taskset pin, per-core memory, tmpfs local dirs), reps
interleaved across levels so host drift hits both sides equally.

Usage: python BENCH/profile_write.py [reps] — prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def job_main():
    """Child mode: run the three variants once inside one JVM."""
    sys.path.insert(0, REPO)
    from ecmwf_models_spark.operators.reshuffle import reshuffle, write_silver
    from ecmwf_models_spark.session import get_spark
    from ecmwf_models_spark.synth import gen_transcripts

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    n_conv = int(os.environ.get("BENCH_N_CONV", "200000"))
    days = int(os.environ.get("BENCH_DAYS", "90"))
    turns = int(os.environ.get("BENCH_TURNS", "24"))
    n_cells = int(os.environ.get("BENCH_N_CELLS", "256"))
    shuf = os.environ.get("PROFILE_SHUFFLE_PARTS")
    spark = get_spark(
        f"profile-{cpus}",
        cores=cpus,
        shuffle_partitions=int(shuf) if shuf else max(cpus * 2, 32),
    )
    bronze = gen_transcripts(
        spark, n_conv=n_conv, days=days, turns_per_conv=turns
    ).localCheckpoint()
    bronze.count()

    # JIT warmup (excluded), small slice through all three sinks
    warm = gen_transcripts(
        spark, n_conv=max(n_conv // 50, 100), days=days, turns_per_conv=turns
    ).localCheckpoint()
    warm.count()
    wtmp = tempfile.mkdtemp(prefix="pw_warm_")
    reshuffle(warm, n_cells=n_cells).write.format("noop").mode(
        "overwrite"
    ).save()
    write_silver(reshuffle(warm, n_cells=n_cells), f"{wtmp}/s")
    shutil.rmtree(wtmp, ignore_errors=True)
    warm.unpersist()

    out = {}
    t0 = time.time()
    reshuffle(bronze, n_cells=n_cells).write.format("noop").mode(
        "overwrite"
    ).save()
    out["shuffle_sort"] = round(time.time() - t0, 3)

    tmp = tempfile.mkdtemp(prefix="pw_")
    t0 = time.time()
    reshuffle(bronze, n_cells=n_cells).write.mode("overwrite").parquet(
        f"{tmp}/flat"
    )
    out["parquet_flat"] = round(time.time() - t0, 3)

    t0 = time.time()
    write_silver(reshuffle(bronze, n_cells=n_cells), f"{tmp}/part")
    out["parquet_part"] = round(time.time() - t0, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print("PROFILE " + json.dumps({"cpus": cpus, **out}))
    spark.stop()


def run_at(cpus: int, env_extra: dict | None = None) -> dict:
    heap = min(2 * cpus, 16)
    offheap = min(2 * cpus, 16)
    shm = f"/dev/shm/pw_{cpus}_{os.getpid()}"
    os.makedirs(shm, exist_ok=True)
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_FAST_COMMIT"] = "1"
    env["SPARK_GRAFT_OFFHEAP_SIZE"] = f"{offheap}g"
    env["SPARK_DRIVER_MEM"] = f"{heap}g"
    env["SPARK_LOCAL_DIRS"] = shm
    env["TMPDIR"] = shm
    env["PROFILE_CHILD"] = "1"
    env.update(env_extra or {})
    pin = (
        ["taskset", "-c", f"0-{cpus - 1}"] if shutil.which("taskset") else []
    )
    cmd = pin + [sys.executable, os.path.abspath(__file__)]
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, env=env, timeout=1800
        )
    finally:
        shutil.rmtree(shm, ignore_errors=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("PROFILE ")][-1]
    return json.loads(line[len("PROFILE "):])


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    levels = [8, 32]
    results: dict[int, list[dict]] = {c: [] for c in levels}
    for i in range(reps):
        for c in levels:  # interleaved: drift hits both levels
            r = run_at(c)
            results[c].append(r)
            print(f"rep{i} cpus={c}: {r}", flush=True)
    best = {
        c: {
            k: min(r[k] for r in rs)
            for k in ("shuffle_sort", "parquet_flat", "parquet_part")
        }
        for c, rs in results.items()
    }
    print(json.dumps({"best_of": best, "reps": reps}))


if __name__ == "__main__":
    if os.environ.get("PROFILE_CHILD"):
        job_main()
    else:
        main()
