"""Hot-conversation skew datapoint (VERDICT r3 next-round #7): prove the
order-preserving ts-segment salting flattens the straggler, not just that
its invariants hold (tests/test_salting.py).

Input: deterministic synthetic transcripts where ONE conversation holds
~10% of all turns (n_conv=200k, 12 turns each, conv 0 at 20000x = 240k of
~2.6M turns). The reshuffle range-partitions on (cell_id, conv_id[,seg]):
unsalted, a single range key cannot split, so one task carries the whole
hot conv — the straggler cliff; salted (salt_segment_hours=168, weekly
segments over 90 days), the hot conv splits into ~13 contiguous segments
while output order and dedup are preserved (test_salting.py invariants).

Each variant runs in a FRESH subprocess JVM with the Spark UI enabled;
task-time distribution comes from the UI REST API's per-stage
taskSummary (executorRunTime quantiles) of the straggler stage — the
stage with the largest max-task runtime among multi-task stages, which
is the post-shuffle silver-write stage in both variants. Shuffle
partitions fixed at 64 for BOTH variants (finer than the data-sized
default, to expose the straggler: more partitions can never split one
range key — only the salt can).

Writes BENCH/skew.json + BENCH/SKEW.md.
Run: python BENCH/skew_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N_CONV = 200_000
TURNS = 12
DAYS = 90
HOT_FACTOR = 20_000  # conv 0: 240k turns ~ 9% of the corpus
SALT_HOURS = 168
UI_PORT = 4049
SHUFFLE_PARTS = 64
QUANTILES = "0.05,0.5,0.95,1.0"


_UI_BASE = None  # set per-variant from spark.sparkContext.uiWebUrl —
# Spark binds UI_PORT+1.. when UI_PORT is busy, so never hardcode it


def _rest(app_path: str):
    base = _UI_BASE or f"http://localhost:{UI_PORT}"
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_path}", timeout=10
    ) as r:
        return json.loads(r.read())


def run_variant(salt: int | None) -> dict:
    """Executed in the child process: one reshuffle+write, then read the
    straggler stage's task-time quantiles off the UI REST API."""
    sys.path.insert(0, REPO)
    from ecmwf_models_spark.operators.reshuffle import reshuffle, write_silver
    from ecmwf_models_spark.session import get_spark
    from ecmwf_models_spark.synth import gen_transcripts

    os.environ.setdefault("SPARK_GRAFT_FAST_COMMIT", "1")
    spark = get_spark(
        f"skew-{'salted' if salt else 'unsalted'}",
        cores=8,
        shuffle_partitions=SHUFFLE_PARTS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    global _UI_BASE
    _UI_BASE = spark.sparkContext.uiWebUrl  # actual bound port
    bronze = gen_transcripts(
        spark,
        n_conv=N_CONV,
        days=DAYS,
        turns_per_conv=TURNS,
        hot_every=N_CONV,  # only conv 0 is hot
        hot_factor=HOT_FACTOR,
    ).localCheckpoint()
    n_turns = bronze.count()

    out = tempfile.mkdtemp(prefix="skew_")
    # JIT/codegen warmup on a small slice, same as scaling_job.py —
    # without it the first task wave carries ~2s of compilation that
    # dominates the max-task quantile in BOTH variants and masks the
    # data-skew signal this bench exists to show
    warm = gen_transcripts(
        spark, n_conv=N_CONV // 50, days=DAYS, turns_per_conv=TURNS
    )
    write_silver(
        reshuffle(warm, n_cells=256, salt_segment_hours=salt),
        f"{out}/warm",
    )
    warm_stages = {
        st["stageId"]
        for st in _rest(
            f"{spark.sparkContext.applicationId}/stages?status=COMPLETE"
        )
    }
    t0 = time.time()
    write_silver(
        reshuffle(bronze, n_cells=256, salt_segment_hours=salt),
        f"{out}/silver",
    )
    wall = round(time.time() - t0, 3)

    app_id = spark.sparkContext.applicationId
    stages = _rest(f"{app_id}/stages?status=COMPLETE")
    straggler, best = None, -1.0
    for st in stages:
        # the measured job's post-shuffle write stage is the only one
        # with the full shuffle-partition task count (generation /
        # checkpoint stages run at input parallelism); warmup stages
        # excluded by id
        if st["numTasks"] < SHUFFLE_PARTS or st["stageId"] in warm_stages:
            continue
        q = _rest(
            f"{app_id}/stages/{st['stageId']}/{st['attemptId']}/"
            f"taskSummary?quantiles={QUANTILES}"
        )
        mx = q["executorRunTime"][-1]
        if mx > best:
            best = mx
            straggler = {
                "stage_id": st["stageId"],
                "num_tasks": st["numTasks"],
                "run_time_ms_quantiles": dict(
                    zip(QUANTILES.split(","), q["executorRunTime"])
                ),
            }
    p50 = straggler["run_time_ms_quantiles"]["0.5"]
    p100 = straggler["run_time_ms_quantiles"]["1.0"]
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    return {
        "salt_segment_hours": salt,
        "n_turns": n_turns,
        "hot_conv_turns": TURNS * HOT_FACTOR,
        "shuffle_partitions": SHUFFLE_PARTS,
        "wall_sec": wall,
        "straggler_stage": straggler,
        "max_over_median_task": round(p100 / p50, 2) if p50 else None,
    }


def main():
    results = {}
    for name, salt in (("unsalted", None), ("salted", SALT_HOURS)):
        cmd = [
            sys.executable,
            "-c",
            (
                "import json, sys; sys.path.insert(0, %r); "
                "from BENCH.skew_bench import run_variant; "
                "print('SKEWRESULT ' + json.dumps(run_variant(%r)))"
            )
            % (REPO, salt),
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800
        )
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-3000:])
        line = [
            l for l in out.stdout.splitlines() if l.startswith("SKEWRESULT")
        ][-1]
        results[name] = json.loads(line[len("SKEWRESULT "):])
        print(json.dumps({name: results[name]}), file=sys.stderr)

    with open(os.path.join(HERE, "skew.json"), "w") as f:
        json.dump(results, f, indent=2)

    u, s = results["unsalted"], results["salted"]

    def row(name, r):
        q = r["straggler_stage"]["run_time_ms_quantiles"]
        return (
            f"| {name} | {r['wall_sec']} | {q['0.5']:.0f} | {q['0.95']:.0f} "
            f"| {q['1.0']:.0f} | {r['max_over_median_task']}x |"
        )

    md = f"""# BENCH/SKEW.md — hot-conversation skew: salting datapoint

One conversation holds {u['hot_conv_turns']:,} of {u['n_turns']:,} turns
(~{100 * u['hot_conv_turns'] / u['n_turns']:.0f}%). The reshuffle
range-partitions on (cell_id, conv_id): a single range key cannot split,
so unsalted, the whole hot conv lands in ONE task no matter how many
shuffle partitions ({u['shuffle_partitions']} here) — the straggler
cliff AQE cannot fix (skewedJoin/coalesce act on joins and reducer
sizes, not on a single range key of a repartitionByRange). With
`salt_segment_hours={SALT_HOURS}` the range keys become (cell_id,
conv_id, ts_segment): the hot conv splits into ~{DAYS * 24 // SALT_HOURS}
contiguous weekly segments, preserving output order and dedup
(tests/test_salting.py's four invariants).

Task runtime distribution of the straggler (silver-write) stage,
local[8], fresh JVM per variant (JIT warmup pass excluded), Spark UI
REST taskSummary:

| variant | wall (s) | p50 task (ms) | p95 | max | max/median |
|---|---|---|---|---|---|
{row('unsalted', u)}
{row(f'salted ({SALT_HOURS}h segments)', s)}

Measured: salted max/median **{s['max_over_median_task']}x** vs
unsalted **{u['max_over_median_task']}x**. The cleaner cliff signal is
max vs the stage's own p95: unsalted the max task is
{u['straggler_stage']['run_time_ms_quantiles']['1.0'] / u['straggler_stage']['run_time_ms_quantiles']['0.95']:.1f}x
its p95 (one task — the hot conv — far off the distribution), salted
{s['straggler_stage']['run_time_ms_quantiles']['1.0'] / s['straggler_stage']['run_time_ms_quantiles']['0.95']:.2f}x
(the max task IS the distribution tail; no outlier remains). At cluster
scale the unsalted cliff grows linearly with the hot entity's row share
while the salted ceiling stays bounded by the segment size, independent
of cluster size; at this input the hot conv is ~6 median tasks' worth
of rows, so the unsalted wall-clock cost is masked by local[8]'s other
56 tasks overlapping it — on a 1000-executor cluster the same cliff
IS the job's critical path.
"""
    with open(os.path.join(HERE, "SKEW.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
