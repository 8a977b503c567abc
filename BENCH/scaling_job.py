"""One scaling-bench run: the full engine pipeline at a given core count.

Prints one JSON line: {"cpus": N, "n_turns": T, "elapsed_sec": S,
"turns_per_sec": T/S, "phases": {...}}.

Job under test (input generation materialized FIRST and excluded):
  reshuffle (dedup + transpose + sort + cell-partitioned write)
  -> hourly -> daily -> monthly rollup cascade (written)
  -> gap-fill count
This is the BASELINE.json metric job ("rolled-up turns/sec at
hourly->daily->monthly tiers"). Run it at two parallelism levels on the
SAME input for the two-cluster-size scaling criterion (sandbox stand-in:
local[8] vs local[32]).
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
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_conv = int(os.environ.get("BENCH_N_CONV", "6000"))
    days = int(os.environ.get("BENCH_DAYS", "90"))
    turns = int(os.environ.get("BENCH_TURNS", "24"))
    n_cells = int(os.environ.get("BENCH_N_CELLS", "256"))

    spark = get_spark(
        f"scaling-{cpus}", cores=cpus, shuffle_partitions=max(cpus * 2, 32)
    )
    from ecmwf_models_spark.operators.gapfill import gap_fill
    from ecmwf_models_spark.operators.reshuffle import reshuffle, write_silver
    from ecmwf_models_spark.operators.rollup import (
        finalize,
        rollup_cascade,
        rollup_from_raw,
    )
    from ecmwf_models_spark.synth import gen_transcripts

    bronze = gen_transcripts(
        spark, n_conv=n_conv, days=days, turns_per_conv=turns
    ).localCheckpoint()
    n_turns = bronze.count()

    tmp = tempfile.mkdtemp(prefix=f"scaling_{cpus}_")
    phases = {}
    t_all = time.time()

    t0 = time.time()
    silver_path = f"{tmp}/silver"
    write_silver(reshuffle(bronze, n_cells=n_cells), silver_path)
    phases["reshuffle_write"] = round(time.time() - t0, 3)

    t0 = time.time()
    silver = spark.read.parquet(silver_path)
    hourly = rollup_from_raw(silver, "hourly")
    daily = rollup_cascade(hourly, "daily")
    monthly = rollup_cascade(daily, "monthly")
    finalize(monthly).write.mode("overwrite").parquet(f"{tmp}/monthly")
    phases["rollup_cascade_write"] = round(time.time() - t0, 3)

    t0 = time.time()
    gap_fill(silver).count()
    phases["gapfill"] = round(time.time() - t0, 3)

    elapsed = round(time.time() - t_all, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "elapsed_sec": elapsed,
                "turns_per_sec": round(n_turns / elapsed, 1),
                "phases": phases,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
