"""Retention-tier rollups: hourly -> daily -> monthly continuous aggregates.

The reference's downsample is CDO regridding with reusable weights
(reference extract.py:150-160,204-213); the graft re-expresses it as
cascading temporal rollups (BASELINE.json metric). The design constraint is
EXACT re-aggregation: monthly-from-daily must equal monthly-from-raw. So
every tier carries the decomposable state

    (sum float64, count int64, min, max, first-by-ts, last-by-ts)

and derives avg = sum/count only at the edge, cast to float32 there (the
reference's float32 storage contract, era5/reshuffle.py:240; test tolerance
rtol=1e-5, tests/tests_era5/test_era5_reshuffle.py:75-77).

Sums are carried as decimal(38,18), NOT double: decimal addition is
associative, so tier outputs are bit-identical at any partitioning / task
order / AQE layout — double accumulation flips rounding-boundary values
between runs (the round-1 monthly hash failure). float32 inputs convert
exactly (a float's shortest decimal repr is <= 18 fractional digits within
our metric range), and the decimal state is the same 16 bytes an avg pair
would be, map-side combinable like any sum.

Spark-first: plain hash aggregation — partial (map-side) + final, fully
whole-stage-codegen'd, no UDFs. first/last use min_by/max_by on the bucket
timestamp, which re-aggregates exactly (min_by over min_by composes).
Each cascade step groups by a coarser bucket of the SAME key prefix
(conv_id, ...), so at 100 TB the daily->monthly shuffle moves only the
daily aggregate rows (~1/4-1/30 of the previous tier), not raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TIERS = ("hourly", "daily", "monthly")
_TRUNC = {"hourly": "hour", "daily": "day", "monthly": "month"}

METRICS = ("text_len", "tool_call")


def _agg_state(value_cols, n_turns_expr):
    aggs = [n_turns_expr.alias("n_turns")]
    for c in value_cols:
        aggs += [
            F.sum(F.col(c).cast("decimal(38,18)")).alias(f"{c}_sum"),
            F.count(c).alias(f"{c}_cnt"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.min_by(c, "ts").alias(f"{c}_first"),
            F.max_by(c, "ts").alias(f"{c}_last"),
        ]
    return aggs


def rollup_from_raw(
    silver: DataFrame,
    tier: str = "hourly",
    value_cols: tuple[str, ...] = METRICS,
    ts_col: str = "ts",
) -> DataFrame:
    """Tier-0 rollup straight from turn-grain rows."""
    b = F.date_trunc(_TRUNC[tier], F.col(ts_col)).alias("bucket_ts")
    return silver.groupBy("conv_id", b).agg(
        *_agg_state(value_cols, F.count(F.lit(1)))
    )


def rollup_cascade(
    lower: DataFrame,
    to_tier: str,
    value_cols: tuple[str, ...] = METRICS,
) -> DataFrame:
    """Tier k -> tier k+1 by re-aggregating carried state. Exact:
    sum(sum), sum(cnt), min(min), max(max), first = min_by(first, bucket),
    last = max_by(last, bucket)."""
    b = F.date_trunc(_TRUNC[to_tier], F.col("bucket_ts")).alias("bucket_ts")
    aggs = [F.sum("n_turns").alias("n_turns")]
    for c in value_cols:
        aggs += [
            F.sum(f"{c}_sum").alias(f"{c}_sum"),
            F.sum(f"{c}_cnt").alias(f"{c}_cnt"),
            F.min(f"{c}_min").alias(f"{c}_min"),
            F.max(f"{c}_max").alias(f"{c}_max"),
            F.min_by(f"{c}_first", "bucket_ts").alias(f"{c}_first"),
            F.max_by(f"{c}_last", "bucket_ts").alias(f"{c}_last"),
        ]
    return lower.groupBy("conv_id", b).agg(*aggs)


def finalize(df: DataFrame, value_cols: tuple[str, ...] = METRICS) -> DataFrame:
    """Derive means and apply the float32 edge cast."""
    out = df
    for c in value_cols:
        out = out.withColumn(
            f"{c}_avg",
            (F.col(f"{c}_sum").cast("double") / F.col(f"{c}_cnt")).cast(
                "float"
            ),
        )
        for suffix in ("min", "max", "first", "last"):
            out = out.withColumn(
                f"{c}_{suffix}", F.col(f"{c}_{suffix}").cast("float")
            )
    return out


def rollup_tiers(
    silver: DataFrame, value_cols: tuple[str, ...] = METRICS
) -> dict[str, DataFrame]:
    """The full cascade. Returns raw-state tier DataFrames (finalize() for
    serving)."""
    hourly = rollup_from_raw(silver, "hourly", value_cols)
    daily = rollup_cascade(hourly, "daily", value_cols)
    monthly = rollup_cascade(daily, "monthly", value_cols)
    return {"hourly": hourly, "daily": daily, "monthly": monthly}
