"""Pin the local[32]-vs-local[8] reshuffle_write regression to a resource.

Round-3 verdict: at BENCH_N_CONV=600000 (22.5M turns) the flagship
reshuffle+silver-write phase regresses 20.6s@8 -> 29.1s@32 under the
executor-model harness, even though at 200k convs the same phase scales.
Hypothesis set:

  mem16   heap16+offheap16 at both levels (the round-3 configuration):
          a 32-core run gets 1/4 the per-task execution memory of the
          8-core run -- the opposite of a real cluster, where 4x the
          executors bring 4x the aggregate memory.
  memScaled  heap+offheap scale at 2g/core past the old 16g cap
          (32 cores -> 32g+64g; host has 125 GiB): the faithful
          executor model.
  shuf128 mem16 but 128 shuffle partitions at 32 cores: smaller
          per-task sorts as the no-extra-memory alternative.

Each variant runs scaling_job.py (the exact measured pipeline) in its
own pinned JVM on tmpfs; reps interleave across variants so host drift
hits all of them equally. Prints per-variant phase timings.

Usage: python BENCH/profile_mem.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

VARIANTS = [
    # name, cpus, heap_gb, offheap_gb, shuffle_parts (None = default)
    # round-4 clean sweep: the regression config (c32_s64) vs data-sized
    # shuffle partitions (128 ~= 22.5M rows / 176k rows-per-partition) at
    # BOTH levels, plus memory-scaling stacked on top at 32.
    ("c8_s32", 8, 16, 16, None),
    ("c32_s64", 32, 16, 16, None),
    ("c8_s128", 8, 16, 16, 128),
    ("c32_s128", 32, 16, 16, 128),
    ("c32_s128_mem", 32, 32, 64, 128),
]


def run_variant(name, cpus, heap, offheap, shuf, n_conv):
    shm = f"/dev/shm/pmem_{name}"
    os.makedirs(shm, exist_ok=True)
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_OFFHEAP_SIZE=f"{offheap}g",
        SPARK_DRIVER_MEM=f"{heap}g",
        SPARK_LOCAL_DIRS=shm,
        TMPDIR=shm,
        BENCH_N_CONV=str(n_conv),
        SPARK_GRAFT_FAST_COMMIT="1",
    )
    if shuf:
        env["BENCH_SHUFFLE_PARTS"] = str(shuf)
    else:
        env.pop("BENCH_SHUFFLE_PARTS", None)
    pin = (
        ["taskset", "-c", f"0-{cpus - 1}"] if shutil.which("taskset") else []
    )
    try:
        r = subprocess.run(
            pin + [sys.executable, os.path.join(HERE, "scaling_job.py")],
            capture_output=True, text=True, env=env, timeout=3600,
        )
    finally:
        shutil.rmtree(shm, ignore_errors=True)
    if r.returncode != 0:
        raise RuntimeError(f"{name}: {r.stderr[-3000:]}")
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_conv = int(os.environ.get("BENCH_N_CONV", "600000"))
    results = {name: [] for name, *_ in VARIANTS}
    for i in range(reps):
        order = VARIANTS if i % 2 == 0 else list(reversed(VARIANTS))
        for name, cpus, heap, offheap, shuf in order:
            res = run_variant(name, cpus, heap, offheap, shuf, n_conv)
            results[name].append(res)
            print(
                f"rep{i} {name}: elapsed={res['elapsed_sec']} "
                f"phases={res['phases']}",
                flush=True,
            )
    best = {
        name: min(runs, key=lambda r: r["elapsed_sec"])
        for name, runs in results.items()
        if runs
    }
    print(json.dumps({"best_of": best, "reps": reps}))
    with open(os.path.join(HERE, "profile_mem.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
