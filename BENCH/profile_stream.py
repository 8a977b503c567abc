"""A/B the monthly-tier rollup: hash cascade (rollup_tiers) vs the
sequential sorted-run path (rollup_stream.stream_rollup) at one core
count, on the scaling-job input. Prints one JSON line per variant.

Usage: SPARK_GRAFT_CPUS=8 python BENCH/profile_stream.py
Writes nothing persistent; silver goes to a temp dir.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ecmwf_models_spark.session import get_spark  # noqa: E402


def main():
    os.environ.setdefault("SPARK_GRAFT_FAST_COMMIT", "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_conv = int(os.environ.get("BENCH_N_CONV", "200000"))
    days = int(os.environ.get("BENCH_DAYS", "90"))
    turns = int(os.environ.get("BENCH_TURNS", "24"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    spark = get_spark(f"stream-ab-{cpus}", cores=cpus)
    from ecmwf_models_spark.operators.reshuffle import reshuffle, write_silver
    from ecmwf_models_spark.operators.rollup import finalize, rollup_tiers
    from ecmwf_models_spark.operators.rollup_stream import stream_rollup
    from ecmwf_models_spark.session import sized_shuffle_partitions
    from ecmwf_models_spark.synth import gen_transcripts

    bronze = gen_transcripts(
        spark, n_conv=n_conv, days=days, turns_per_conv=turns
    ).localCheckpoint()
    n_turns = bronze.count()
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(sized_shuffle_partitions(n_turns, cpus)),
    )
    tmp = tempfile.mkdtemp(prefix=f"stream_ab_{cpus}_")
    silver_path = f"{tmp}/silver"
    write_silver(reshuffle(bronze, n_cells=256), silver_path)
    silver = spark.read.parquet(silver_path)

    def run(variant):
        # clear the cache BEFORE timing: stream_rollup persists its
        # tagged states and Spark's CacheManager matches the identical
        # plan across reps (same silver source), so without this every
        # stream rep after the first silently reads the cached states
        # instead of re-running the sequential pass — a 10x flattering
        # artifact (the original round-5 A/B numbers suffered it)
        spark.catalog.clearCache()
        t0 = time.time()
        if variant == "hash":
            monthly = rollup_tiers(silver)["monthly"]
        else:
            monthly = stream_rollup(silver, "monthly")
        out = f"{tmp}/monthly_{variant}"
        finalize(monthly).write.mode("overwrite").parquet(out)
        return round(time.time() - t0, 3)

    # warmup both JIT paths on a slice, unmeasured
    for v in ("hash", "stream"):
        run(v)
    for rep in range(reps):
        for v in ("hash", "stream"):
            el = run(v)
            print(
                json.dumps(
                    {
                        "cpus": cpus,
                        "variant": v,
                        "rep": rep,
                        "n_turns": n_turns,
                        "monthly_write_sec": el,
                        "turns_per_sec": round(n_turns / el, 1),
                    }
                ),
                flush=True,
            )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
