"""Run the scaling job at N and 4N parallelism (local[8] vs local[32]) in
fresh JVMs, compute scaling efficiency, write BENCH/scaling.json and
BENCH/BASELINE.md.

efficiency = (throughput_4N / throughput_N) / 4
north rule target: >= 0.8
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_at(cpus: int, env_extra: dict) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling_job.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-4000:])
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    extra = {
        "BENCH_N_CONV": os.environ.get("BENCH_N_CONV", "6000"),
        "BENCH_DAYS": os.environ.get("BENCH_DAYS", "90"),
    }
    lo = run_at(8, extra)
    hi = run_at(32, extra)
    speedup = hi["turns_per_sec"] / lo["turns_per_sec"]
    eff = round(speedup / 4.0, 3)
    result = {
        "n_low": lo,
        "n_high": hi,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(HERE, "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)

    md = f"""# BENCH/BASELINE.md — scaling evidence (north rule)

Same job, same input, two parallelism levels (sandbox stand-in for N vs
4N executors). Job = reshuffle (dedup + transpose + cell-partitioned
write) -> hourly -> daily -> monthly rollup cascade (written) -> gap-fill.
Input: deterministic synthetic transcripts, {lo['n_turns']} turns.

| parallelism | elapsed (s) | throughput (turns/s) |
|---|---|---|
| local[8]  (N)  | {lo['elapsed_sec']} | {lo['turns_per_sec']} |
| local[32] (4N) | {hi['elapsed_sec']} | {hi['turns_per_sec']} |

Speedup 8->32: **{round(speedup, 2)}x** of ideal 4x
Scaling efficiency: **{eff}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Phase breakdown (seconds):

| phase | local[8] | local[32] |
|---|---|---|
| reshuffle + silver write | {lo['phases']['reshuffle_write']} | {hi['phases']['reshuffle_write']} |
| rollup cascade + write | {lo['phases']['rollup_cascade_write']} | {hi['phases']['rollup_cascade_write']} |
| gap-fill | {lo['phases']['gapfill']} | {hi['phases']['gapfill']} |
"""
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
