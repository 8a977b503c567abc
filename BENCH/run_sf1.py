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

Shuffle partitions are sized WITH the data (256 at 10x vs 32 at 1x) —
the one knob a real deployment scales with input size; everything else
is identical to scaling_job.py.

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

from ecmwf_models_spark.session import get_spark  # noqa: E402


def main():
    os.environ.setdefault("SPARK_GRAFT_FAST_COMMIT", "1")
    n_conv = int(os.environ.get("SF1_N_CONV", "6000000"))
    days = int(os.environ.get("BENCH_DAYS", "90"))
    turns = int(os.environ.get("BENCH_TURNS", "24"))
    n_cells = int(os.environ.get("BENCH_N_CELLS", "256"))
    shuffle_parts = int(os.environ.get("SF1_SHUFFLE_PARTS", "256"))

    spark = get_spark(
        "sf1-headroom", cores=32, shuffle_partitions=shuffle_parts
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

        t0 = time.time()
        phases = pipeline(spark, bronze, work, n_cells)
        elapsed = round(time.time() - t0, 3)

        result = {
            "n_turns": n_turns,
            "n_conv": n_conv,
            "cpus": 32,
            "shuffle_partitions": shuffle_parts,
            "bronze_gen_write_sec": gen_sec,
            "elapsed_sec": elapsed,
            "turns_per_sec": round(n_turns / elapsed, 1),
            "phases": phases,
            "input_location": "disk parquet (vda), exceeds executor memory",
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
