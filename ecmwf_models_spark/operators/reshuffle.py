"""THE central operation: time-major -> location-major transpose.

Reference: Img2Ts buffers image reads, transposes [time, location] blocks
per 5-degree cell, and appends to per-cell OrthoMultiTs netCDF files
(call-site era5/reshuffle.py:233-249; sortedness asserted in
tests/tests_era5/test_era5_reshuffle.py:100-103,125-128,143-146).

Spark-first: the whole transpose is ONE wide shuffle —

    bronze --dedup--> metrics --cell_id-->
      repartitionByRange(cell_id, conv_id)
      .sortWithinPartitions(conv_id, ts, turn_idx)
      .write.partitionBy(cell_id)

Range partitioning on (cell_id, conv_id) keeps every cell contiguous
(partition pruning at read ≙ gpi2cell file routing) and every conversation
clustered inside its cell; the within-partition sort gives the reference's
on-disk ordering invariant for free in the parquet row groups. At 100 TB
this is a single full shuffle — unavoidable (it IS the transpose) — and the
only one in the pipeline; AQE handles skewed cells, and a salt column can
split a pathologically hot conv across tasks before the final per-cell
merge (see codec.pack which re-merges ordered runs).

Derived float metrics are computed here once, cast to float at the edge
(the reference's float32 storage contract, era5/reshuffle.py:240).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..grid import DEFAULT_N_CELLS, with_cell_id
from .bucket import with_ts_bucket
from .dedup import latest_final_wins

SILVER_COLS = [
    "cell_id",
    "conv_id",
    "turn_idx",
    "role",
    "text",
    "tool",
    "ts",
    "ts_bucket",
    "text_len",
    "tool_call",
]


def derive_metrics(df: DataFrame) -> DataFrame:
    """Numeric per-turn metrics for the rollup tiers. float32 contract:
    metrics are FloatType like the reference's ts_dtypes=float32."""
    return df.withColumn(
        "text_len", F.length("text").cast("float")
    ).withColumn(
        "tool_call", F.col("tool").isNotNull().cast("float")
    )


def reshuffle(
    bronze: DataFrame,
    n_cells: int = DEFAULT_N_CELLS,
    bucket_hours: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Logical plan for the transpose; caller writes it (write_silver)."""
    df = latest_final_wins(bronze)
    df = derive_metrics(df)
    df = with_ts_bucket(df, hours=bucket_hours)
    df = with_cell_id(df, n_cells)
    df = df.select(*[c for c in SILVER_COLS if c in df.columns])
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    # Sort leads with cell_id: FileFormatWriter requires output sorted by
    # the partitionBy column and would otherwise inject its own (unstable)
    # sort on cell_id alone, destroying the (conv_id, ts) order. Leading
    # with cell_id satisfies that requirement so our full ordering survives
    # to the parquet row groups.
    return df.repartitionByRange(
        int(parts), "cell_id", "conv_id"
    ).sortWithinPartitions("cell_id", "conv_id", "ts", "turn_idx")


def write_silver(silver: DataFrame, path: str) -> None:
    """Cell-partitioned write — one directory per cell ≙ one <cell>.nc file
    (reference tests/tests_era5/test_era5_reshuffle.py:99: '1431.nc')."""
    silver.write.mode("overwrite").partitionBy("cell_id").parquet(path)


def read_silver(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
