"""Gap-fill to the regular grid: generated timeline LEFT JOIN data.

Reference semantics: the expected timestamp set for a range is generated,
not observed (tstamps_for_daterange, reference interface.py:361-386); a
missing file yields an all-NaN column (interface.py:154-160), so the output
series is dense on the grid with NaN holes.

Spark-first and scale-aware: we do NOT cross-join a global timeline against
all conversations. Each conv's timeline spans only [its first bucket, its
last bucket] (or an explicit range), generated with sequence() per conv —
output rows are proportional to the real series lengths. The left join is
on (conv_id, ts_bucket); since the per-conv spans come from an aggregate of
the same table, Catalyst plans the whole thing with one shuffle on conv_id
(reused by the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bucket import STEP_HOURS


def gap_fill(
    silver: DataFrame,
    value_cols: tuple[str, ...] = ("text_len", "tool_call"),
    hours: int = STEP_HOURS,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Dense per-conv series on the regular grid; missing buckets -> NULL
    metrics and n_turns = 0.

    Returns one row per (conv_id, ts_bucket) with aggregated metrics
    (sum over the turns inside a bucket) — the bucket-grain series the
    rollup tiers consume.
    """
    per_bucket = silver.groupBy("conv_id", "ts_bucket").agg(
        F.count(F.lit(1)).alias("n_turns"),
        *[F.sum(c).cast("float").alias(c) for c in value_cols],
    )

    if start is not None and end is not None:
        spans = per_bucket.select("conv_id").distinct().select(
            "conv_id",
            F.to_timestamp(F.lit(start)).alias("_lo"),
            F.to_timestamp(F.lit(end)).alias("_hi"),
        )
    else:
        spans = per_bucket.groupBy("conv_id").agg(
            F.min("ts_bucket").alias("_lo"), F.max("ts_bucket").alias("_hi")
        )

    grid = spans.select(
        "conv_id",
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {hours} HOURS")
            )
        ).alias("ts_bucket"),
    )

    filled = grid.join(per_bucket, ["conv_id", "ts_bucket"], "left")
    return filled.withColumn(
        "n_turns", F.coalesce(F.col("n_turns"), F.lit(0)).cast("long")
    )
