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
    """Logical plan for the transpose; caller writes it (write_silver).

    SINGLE-SHUFFLE design. A window dedup would hash-shuffle on
    (conv_id, turn_idx) and the transpose would range-shuffle again — two
    full passes over the data. Instead:

      1. repartitionByRange(cell_id, conv_id)  — THE transpose shuffle.
         Range (not hash-by-cell) so a hot cell/conv still splits across
         tasks by conv ranges and parallelism isn't capped at n_cells.
      2. dedup as groupBy(cell_id, conv_id, turn_idx).agg(max_by(payload,
         (not is_prelim, ingest_ts))) — its required ClusteredDistribution
         is satisfied by the range partitioning (every (cell, conv) is
         wholly inside one partition), so Catalyst inserts NO second
         exchange. max_by(struct) = final-over-preliminary, then latest
         ingest — identical semantics to operators.dedup.latest_final_wins.
      3. sortWithinPartitions leading with cell_id: FileFormatWriter
         requires output sorted by the partitionBy column and would
         otherwise inject its own (unstable) sort on cell_id alone,
         destroying the (conv_id, ts) order.

    Net: one wide exchange + one in-partition sort for dedup + transpose +
    ordering — the minimum the semantics allow.
    """
    df = with_cell_id(bronze, n_cells)
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = df.repartitionByRange(int(parts), "cell_id", "conv_id")

    payload = [c for c in bronze.columns if c not in
               ("conv_id", "turn_idx", "is_prelim", "ingest_ts")]
    pref = F.struct(
        (~F.coalesce(F.col("is_prelim"), F.lit(False))).cast("int").alias("f"),
        F.coalesce(F.col("ingest_ts"), F.col("ts")).alias("i"),
    )
    dd = ranged.groupBy("cell_id", "conv_id", "turn_idx").agg(
        F.max_by(F.struct(*payload), pref).alias("_r")
    )
    flat = dd.select(
        "cell_id", "conv_id", "turn_idx",
        *[F.col(f"_r.{c}").alias(c) for c in payload],
    )
    out = with_ts_bucket(derive_metrics(flat), hours=bucket_hours)
    out = out.select(*[c for c in SILVER_COLS if c in out.columns])
    return out.sortWithinPartitions("cell_id", "conv_id", "ts", "turn_idx")


def write_silver(silver: DataFrame, path: str) -> None:
    """Cell-partitioned write — one directory per cell ≙ one <cell>.nc file
    (reference tests/tests_era5/test_era5_reshuffle.py:99: '1431.nc')."""
    silver.write.mode("overwrite").partitionBy("cell_id").parquet(path)


def read_silver(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
