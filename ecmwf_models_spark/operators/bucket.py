"""Temporal bucketing to the regular sub-daily grid.

The reference's temporal resolution is a *generated* regular grid — exactly
h_steps hours per day, default (0, 6, 12, 18) (tstamps_for_daterange,
reference interface.py:361-386,647-672; default interface.py:268). Two
operators fall out:

  * with_ts_bucket  — assign each observed row to its grid bucket
                      (floor to the step; pure integer epoch arithmetic,
                      whole-stage-codegen'd, no UDF).
  * filter_h_steps  — keep only rows already on configured hours
                      (selection, not averaging — the reference never
                      averages over time).
  * timeline        — generate the expected bucket set for a range
                      (the generated-not-observed timestamp contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

STEP_HOURS = 6


def bucket_col(ts: Column | str, hours: int = STEP_HOURS) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    secs = hours * 3600
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(c) / secs).cast("long") * secs
    )


def with_ts_bucket(
    df: DataFrame, ts_col: str = "ts", hours: int = STEP_HOURS,
    out: str = "ts_bucket",
) -> DataFrame:
    return df.withColumn(out, bucket_col(ts_col, hours))


def filter_h_steps(
    df: DataFrame,
    h_steps: Sequence[int] = (0, 6, 12, 18),
    ts_col: str = "ts",
) -> DataFrame:
    """Keep rows whose hour is exactly in h_steps (and minute/second zero),
    mirroring the reference's sub-daily selection grid."""
    c = F.col(ts_col)
    return df.where(
        F.hour(c).isin(list(h_steps))
        & (F.minute(c) == 0)
        & (F.second(c) == 0)
    )


def timeline(
    spark: SparkSession,
    start: str,
    end: str,
    hours: int = STEP_HOURS,
) -> DataFrame:
    """DataFrame of every expected bucket in [start, end] — the generated
    timestamp set (reference interface.py:361-386). sequence() is evaluated
    JVM-side; explode distributes."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(start)),
                F.to_timestamp(F.lit(end)),
                F.expr(f"INTERVAL {hours} HOURS"),
            )
        ).alias("ts_bucket")
    )
