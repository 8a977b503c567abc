"""Quantify the v2 fast-commit claim (session.py): paired A/B of the
scaling job at local[32] with the v1 (serial driver rename loop at job
commit) vs v2 (task-parallel rename) FileOutputCommitter.

The v2 committer is the named Amdahl term behind SPARK_GRAFT_FAST_COMMIT
— this isolates its effect. Runs interleaved v1,v2,v1,v2 (reps in the
same minutes so host drift hits both arms) in pinned child JVMs, same
contract as BENCH/profile_cascade.py. The phase most sensitive to commit
serialization is reshuffle_write (256 cell dirs x several files each);
rollup_cascade_write writes one small parquet dir.

Usage: python BENCH/commit_ab.py [n_conv] [reps]  -> BENCH/commit_ab.json
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_child(n_conv: str, fast_commit: str, cpus: int = 32) -> dict:
    shm = f"/dev/shm/commit_ab_{fast_commit}"
    os.makedirs(shm, exist_ok=True)
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_OFFHEAP_SIZE="16g",
        SPARK_DRIVER_MEM="16g",
        SPARK_LOCAL_DIRS=shm,
        TMPDIR=shm,
        BENCH_N_CONV=n_conv,
        SPARK_GRAFT_FAST_COMMIT=fast_commit,
    )
    if fast_commit == "0":
        # session.py gates on the VALUE's truthiness and scaling_job
        # only setdefaults a MISSING key — an empty string both survives
        # the setdefault and disables the v2 committer
        env["SPARK_GRAFT_FAST_COMMIT"] = ""
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
        raise RuntimeError(r.stderr[-3000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_conv = sys.argv[1] if len(sys.argv) > 1 else "600000"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    runs = []
    for rep in range(reps):
        for committer, fc in (("v1", "0"), ("v2", "1")):
            res = run_child(n_conv, fc)
            res["committer"] = committer
            res["rep"] = rep
            runs.append(res)
            print(
                f"== rep{rep} {committer}: total {res['elapsed_sec']}s "
                f"phases {res['phases']}",
                file=sys.stderr,
            )
    best = {
        c: min(r["elapsed_sec"] for r in runs if r["committer"] == c)
        for c in ("v1", "v2")
    }
    by_phase = {
        c: {
            p: min(
                r["phases"][p] for r in runs if r["committer"] == c
            )
            for p in runs[0]["phases"]
        }
        for c in ("v1", "v2")
    }
    out = {
        "n_conv": int(n_conv),
        "cpus": 32,
        "reps": reps,
        "runs": runs,
        "best_total": best,
        "best_phases": by_phase,
        "v2_speedup_total": round(best["v1"] / best["v2"], 3),
    }
    with open(os.path.join(HERE, "commit_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["best_phases"], indent=1))


if __name__ == "__main__":
    main()
