"""Incremental extend — the reference's `era5 update_ts` / extend_ts
(reference era5/reshuffle.py:254-308; CLI cli.py:428-473; golden test
tests/tests_era5/test_era5_reshuffle.py:81-105: appending the previous
day's 12:00 image merges into existing series in time order).

Semantics preserved here:
  * next start defaults to the stored end (+1 step) — derived from the
    silver table itself (agg max(ts)), the overview.yml role;
  * appended rows MERGE into existing per-conv series keeping the
    (conv_id, ts) ordering invariant (the CHANGELOG.rst:9-12 regression);
  * only AFFECTED cells/buckets are recomputed downstream — at 100 TB a
    daily extend touches a handful of bucket partitions, never the full
    table: we compute the affected (cell_id) set from the new batch and
    dynamically overwrite just those partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .grid import DEFAULT_N_CELLS
from .operators.dedup import latest_final_wins
from .operators.reshuffle import reshuffle


def stored_end(spark: SparkSession, silver_path: str):
    """Last stored timestamp — the `overview.yml` enddate analogue."""
    return spark.read.parquet(silver_path).agg(F.max("ts")).first()[0]


def extend_silver(
    spark: SparkSession,
    silver_path: str,
    new_bronze: DataFrame,
    n_cells: int | None = None,
) -> list[int]:
    """Merge a new bronze batch into the silver table.

    Re-reshuffles ONLY the cells touched by the batch: existing rows of
    those cells are unioned with the new rows, de-duplicated
    (latest-final-wins upsert on (conv_id, turn_idx) — the ERA5-T revision
    policy as upsert), re-sorted, and the cell partitions dynamically
    overwritten. Returns the affected cell ids.

    Run-kwargs contract (reference era5/reshuffle.py:280-295: extend_ts
    reads its parameters from overview.yml, explicit kwargs win): with
    n_cells=None the value persisted at reshuffle time
    (<silver>/_settings) is used, so callers cannot accidentally extend
    with a mismatched cell grid; passing n_cells explicitly overrides.
    """
    from .lineage import read_run_settings

    if n_cells is None:
        stored = read_run_settings(spark, f"{silver_path}/_settings")
        n_cells = int(stored.get("n_cells", DEFAULT_N_CELLS))
    new_silverish = reshuffle(new_bronze, n_cells=n_cells)
    affected = [
        r[0] for r in new_silverish.select("cell_id").distinct().collect()
    ]
    if not affected:
        return []

    existing = spark.read.parquet(silver_path).where(
        F.col("cell_id").isin(affected)
    )
    # rebuild bronze-shaped rows from existing silver (it retains all bronze
    # columns except prelim metadata, which dedup already resolved)
    merged = existing.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).withColumns(
        {"is_prelim": F.lit(False), "ingest_ts": F.col("ts")}
    ).unionByName(
        latest_final_wins(new_bronze).select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
            "is_prelim", "ingest_ts",
        )
    )
    resorted = reshuffle(merged, n_cells=n_cells)
    (
        resorted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell_id")
        .parquet(silver_path)
    )
    return affected


def affected_buckets(new_bronze: DataFrame, tier_trunc: str) -> DataFrame:
    """Distinct (conv_id, bucket) a batch touches at a given tier — the
    re-rollup scope."""
    return new_bronze.select(
        "conv_id", F.date_trunc(tier_trunc, "ts").alias("bucket_ts")
    ).distinct()
