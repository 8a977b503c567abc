"""sf1 headroom datapoint: the metric pipeline at 10x the scaling-run
input (~225M turns) on local[32], with bronze materialized to DISK
parquet (not tmpfs, not memory) so the input genuinely outgrows
executor memory (16g heap + 16g off-heap vs >20 GB deserialized rows).

What this evidences (the "plans hold when data outgrows memory" check):
  * the single-shuffle reshuffle spills and still completes,
  * AQE coalescing / skew handling behaves at 10x,
  * per-turn throughput stays within a small factor of the 22.5M-turn
    local[32] point (629k turns/s in BENCH/scaling.json n_extra) —
    super-linear degradation here would mean a plan that only worked
    because everything fit in RAM.

Shuffle partitions are sized WITH the data via the production rule
(`session.sized_shuffle_partitions`, ~200k rows/partition -> ~1127 at
225M turns vs 113 at 22.5M) — the one knob a real deployment scales
with input size; everything else is identical to scaling_job.py.
SF1_SHUFFLE_PARTS overrides for A/B (round 3 ran 256).

Writes BENCH/sf1.json. Run AFTER any scaling measurement (it owns the
whole box for ~20 min).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from ecmwf_models_spark.session import (  # noqa: E402
    get_spark,
    sized_shuffle_partitions,
)


def disk_probe(path: str, gib: int = 4) -> dict:
    """Sequential write+read bandwidth of the device behind `path` via dd
    with O_DIRECT (page cache bypassed) — the /dev/vda ceiling every
    disk-resident shuffle byte must pass through. The DRAM analogue is
    BENCH/bw_probe.py; this is the disk leg of the same attribution
    argument: on a real cluster, local-SSD bandwidth scales with executor
    count, this sandbox has ONE virtio disk shared by all 32 threads."""
    import subprocess

    f = os.path.join(path, "_dd_probe.bin")
    out = {}
    try:
        t0 = time.time()
        subprocess.run(
            ["dd", f"if=/dev/zero", f"of={f}", "bs=1M",
             f"count={gib * 1024}", "oflag=direct"],
            check=True, capture_output=True,
        )
        out["write_mb_s"] = round(gib * 1024 / (time.time() - t0), 1)
        t0 = time.time()
        subprocess.run(
            ["dd", f"if={f}", "of=/dev/null", "bs=1M", "iflag=direct"],
            check=True, capture_output=True,
        )
        out["read_mb_s"] = round(gib * 1024 / (time.time() - t0), 1)
    except (subprocess.CalledProcessError, OSError) as e:
        out["error"] = str(e)[:200]
    finally:
        try:
            os.remove(f)
        except OSError:
            pass
    return out


class PhaseMetrics:
    """Cumulative-stage-metric snapshots at phase boundaries -> per-phase
    deltas of the bytes that actually moved (shuffle write/read, spill,
    input, output). This is the evidence for WHERE the sf1 superlinearity
    lives: phase seconds vs phase bytes over the measured disk ceiling."""

    KEYS = {
        "shuffle_write_mb": "shuffleWriteBytes",
        "shuffle_read_mb": "shuffleReadBytes",
        "spill_disk_mb": "diskBytesSpilled",
        "spill_mem_mb": "memoryBytesSpilled",
        "input_mb": "inputBytes",
        "output_mb": "outputBytes",
    }

    def __init__(self, spark):
        import urllib.request

        self._url = (
            f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/stages"
        )
        self._open = urllib.request.urlopen
        self._last = self._totals()
        self.phases = {}

    def _totals(self) -> dict:
        with self._open(f"{self._url}?status=complete") as r:
            stages = json.loads(r.read())
        return {
            k: sum(s[v] for s in stages) for k, v in self.KEYS.items()
        }

    def __call__(self, phase: str) -> None:  # the pipeline phase_hook
        now = self._totals()
        self.phases[phase] = {
            k: round((now[k] - self._last[k]) / 1e6) for k in self.KEYS
        }
        self._last = now


def main():
    os.environ.setdefault("SPARK_GRAFT_FAST_COMMIT", "1")
    n_conv = int(os.environ.get("SF1_N_CONV", "6000000"))
    days = int(os.environ.get("BENCH_DAYS", "90"))
    turns = int(os.environ.get("BENCH_TURNS", "24"))
    n_cells = int(os.environ.get("BENCH_N_CELLS", "256"))
    shuffle_parts = os.environ.get("SF1_SHUFFLE_PARTS")

    spark = get_spark(
        "sf1-headroom",
        cores=32,
        shuffle_partitions=int(shuffle_parts) if shuffle_parts else None,
        extra_conf={"spark.ui.enabled": "true"},  # REST metrics source
    )
    from ecmwf_models_spark.synth import gen_transcripts
    from scaling_job import pipeline  # same measured job as the scaling runs

    work = tempfile.mkdtemp(prefix="sf1_", dir="/tmp")  # vda, NOT tmpfs
    try:
        t0 = time.time()
        gen_transcripts(
            spark, n_conv=n_conv, days=days, turns_per_conv=turns
        ).write.mode("overwrite").parquet(f"{work}/bronze")
        bronze = spark.read.parquet(f"{work}/bronze")
        n_turns = bronze.count()
        gen_sec = round(time.time() - t0, 3)
        if not shuffle_parts:
            # the production sizing rule at 10x: partitions follow the
            # DATA (~200k rows each), same rule as every scaling level
            shuffle_parts = sized_shuffle_partitions(n_turns, 32)
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_parts)
            )
        shuffle_parts = int(shuffle_parts)

        # JIT warmup on a 1% slice (same reason as scaling_job.py): the
        # first pipeline execution in a fresh JVM pays 10-20s of codegen
        # compilation, which would land entirely on whichever measured
        # run goes first and distort the ratio.
        warm = gen_transcripts(
            spark, n_conv=max(n_conv // 100, 1), days=days,
            turns_per_conv=turns,
        ).localCheckpoint()
        pipeline(spark, warm, f"{work}/warm", n_cells)

        disk = disk_probe(work)  # vda ceiling, measured before the job

        metrics_10x = PhaseMetrics(spark)
        t0 = time.time()
        phases = pipeline(spark, bronze, work, n_cells, metrics_10x)
        elapsed = round(time.time() - t0, 3)

        # PAIRED same-window 1x reference (22.5M turns, same session,
        # same disk, adjacent minutes): the flat-at-10x claim is a
        # throughput RATIO, and this shared host drifts 2-4x across
        # minutes — a ratio against another day's best-of measures the
        # weather, not the engine. Same principle as the scaling
        # harness's paired probes (drift across the ~8 min the two runs
        # span is the residual noise; both directions disclosed).
        ref_conv = max(n_conv // 10, 1)
        gen_transcripts(
            spark, n_conv=ref_conv, days=days, turns_per_conv=turns
        ).write.mode("overwrite").parquet(f"{work}/bronze_ref")
        ref_bronze = spark.read.parquet(f"{work}/bronze_ref")
        ref_turns = ref_bronze.count()
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(sized_shuffle_partitions(ref_turns, 32))
            if not os.environ.get("SF1_SHUFFLE_PARTS")
            else str(shuffle_parts),
        )
        metrics_1x = PhaseMetrics(spark)
        t0 = time.time()
        ref_phases = pipeline(
            spark, ref_bronze, f"{work}/ref", n_cells, metrics_1x
        )
        ref_elapsed = round(time.time() - t0, 3)
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))

        result = {
            "n_turns": n_turns,
            "n_conv": n_conv,
            "cpus": 32,
            "shuffle_partitions": shuffle_parts,
            "bronze_gen_write_sec": gen_sec,
            "elapsed_sec": elapsed,
            "turns_per_sec": round(n_turns / elapsed, 1),
            "phases": phases,
            "phase_bytes": metrics_10x.phases,
            "disk_probe": disk,
            "input_location": "disk parquet (vda), exceeds executor memory",
            # the PAIRED same-window 1x reference and the in-window ratio:
            # the honest form of "per-turn throughput flat at 10x"
            "ref_1x": {
                "n_turns": ref_turns,
                "elapsed_sec": ref_elapsed,
                "turns_per_sec": round(ref_turns / ref_elapsed, 1),
                "phases": ref_phases,
                "phase_bytes": metrics_1x.phases,
            },
            "throughput_ratio_paired": round(
                (n_turns / elapsed) / (ref_turns / ref_elapsed), 3
            ),
        }
        # comparison hook: the 22.5M-turn local[32] point from scaling.json
        try:
            prior = json.load(open(os.path.join(HERE, "scaling.json")))
            xtra = prior.get("n_extra")
            if xtra:
                result["vs_22M_local32"] = {
                    "throughput_22M": xtra["turns_per_sec"],
                    "throughput_ratio": round(
                        result["turns_per_sec"] / xtra["turns_per_sec"], 3
                    ),
                }
        except (OSError, KeyError, ValueError):
            pass
        with open(os.path.join(HERE, "sf1.json"), "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
