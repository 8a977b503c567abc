"""Retention-tier rollups: hourly -> daily -> monthly continuous aggregates.

The reference's downsample is CDO regridding with reusable weights
(reference extract.py:150-160,204-213); the graft re-expresses it as
cascading temporal rollups (BASELINE.json metric). The design constraint is
EXACT re-aggregation: monthly-from-daily must equal monthly-from-raw. So
every tier carries the decomposable state

    (sum int64-micro, count int64, min, max, first-by-ts, last-by-ts)

and derives avg = sum/count only at the edge, cast to float32 there (the
reference's float32 storage contract, era5/reshuffle.py:240; test tolerance
rtol=1e-5, tests/tests_era5/test_era5_reshuffle.py:75-77).

Sums are carried as FIXED-POINT int64 micro-units (value * 1e6, rounded
half-up), NOT double and NOT high-precision decimal:

  * integer addition is associative -> tier outputs are bit-identical at
    any partitioning / task order / AQE layout (double accumulation flips
    rounding-boundary values between runs — the round-1 monthly hash
    failure);
  * int64 is Spark's primitive fast path: the whole rollup state stays in
    HashAggregate's primitive mutable buffers inside whole-stage codegen.
    decimal(38,18) (the round-1 fix) was also associative but precision>18
    forces the BigDecimal slow path — measured ~2x slower with heavy GC on
    the 7.5M-row cascade;
  * quantization error is <=0.5e-6 per input row, far inside the
    reference's rtol=1e-5 float32 golden tolerance, and is applied
    identically on the DuckDB oracle side (floor(x*1e6 + 0.5)), so value
    hashes still match bit-for-bit.

Overflow bound: int64 holds |sum| < 9.2e18, i.e. ~9.2e12 in value units at
MICRO=1e6. Groups here are per (conv_id, bucket); even a 1e6-turn
conversation-month of 32k-char turns sums to ~3.2e16 micro — five orders
of magnitude of headroom. Raise/lower MICRO per metric if a deployment
needs a different range/precision trade.

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

# fixed-point scale for carried sums: 6 decimal digits
MICRO = 1_000_000


def to_micro(c):
    """double -> int64 micro-units, round-half-up. floor(x*1e6 + 0.5) is
    IEEE-deterministic and expressible identically in ANSI SQL, so the
    DuckDB oracle reproduces the exact same int64. NULL stays NULL; NaN is
    mapped to NULL explicitly — Spark's long cast turns NaN into 0, which
    would silently add 0 to the sum while still bumping the count (and the
    DuckDB oracle errors on CAST(NaN AS BIGINT)). Codec round-trips keep
    NaN bit-exact, so NaN-bearing unpacked data must be excluded from the
    sum like the reference's masked fill values."""
    col = F.col(c) if isinstance(c, str) else c
    col = col.cast("double")
    col = F.when(F.isnan(col), F.lit(None)).otherwise(col)
    return F.floor(col * MICRO + F.lit(0.5)).cast("long")


def _nan_to_null(c):
    """Shared NaN guard for EVERY carried statistic: Spark sorts NaN
    greater than any double, so an unguarded max/min_by/max_by would
    surface NaN even though the sum/cnt exclude it. One NaN-bearing row
    must be invisible to all six statistics (the reference's masked
    fill-value contract), not just to the mean."""
    col = F.col(c) if isinstance(c, str) else c
    col = col.cast("double")
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)


def _agg_state(value_cols, n_turns_expr, first_last=True, order_cols=("ts",)):
    # first/last ordering. With the default single-column ("ts",) order,
    # exact-ts ties inside one bucket leave the winner to Spark's
    # min_by/max_by tie rule (LAST row encountered — i.e. encounter
    # order, deterministic only for sorted single-partition groups).
    # Passing order_cols=("ts", "turn_idx") makes the winner fully
    # order-defined (the BASELINE input_hint's "stable (conv_id,
    # turn_idx) ordering" contract) and is what rollup_stream's
    # sequential path reproduces bit-for-bit.
    if len(order_cols) == 1:
        ordering = F.col(order_cols[0])
    else:
        ordering = F.struct(*[F.col(o) for o in order_cols])
    aggs = [n_turns_expr.alias("n_turns")]
    for c in value_cols:
        v = _nan_to_null(c)
        aggs += [
            F.sum(to_micro(c)).alias(f"{c}_sum"),
            # count the same NaN-nulled expression the sum uses, so
            # avg = sum/cnt stays consistent when NaN rows are present
            F.count(to_micro(c)).alias(f"{c}_cnt"),
            F.min(v).alias(f"{c}_min"),
            F.max(v).alias(f"{c}_max"),
        ]
        if first_last:
            # min_by/max_by skip NULL-valued rows, so a NaN row on the
            # bucket's ts boundary no longer becomes first/last. NOTE:
            # in Spark 4 min_by/max_by are DeclarativeAggregates
            # (valueWithExtremumOrdering primitive buffers) — the rollup
            # stays a codegen'd HashAggregate either way; first_last=False
            # is a narrower-state variant for consumers that only need
            # sum/cnt/min/max (BENCH/profile_cascade.py uses it to
            # isolate state-width effects at 32 threads).
            aggs += [
                F.min_by(v, F.when(v.isNotNull(), ordering)).alias(
                    f"{c}_first"
                ),
                F.max_by(v, F.when(v.isNotNull(), ordering)).alias(
                    f"{c}_last"
                ),
            ]
    return aggs


def rollup_from_raw(
    silver: DataFrame,
    tier: str = "hourly",
    value_cols: tuple[str, ...] = METRICS,
    ts_col: str = "ts",
    first_last: bool = True,
    order_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Tier-0 rollup straight from turn-grain rows."""
    b = F.date_trunc(_TRUNC[tier], F.col(ts_col)).alias("bucket_ts")
    return silver.groupBy("conv_id", b).agg(
        *_agg_state(
            value_cols,
            F.count(F.lit(1)),
            first_last,
            order_cols or (ts_col,),
        )
    )


def rollup_cascade(
    lower: DataFrame,
    to_tier: str,
    value_cols: tuple[str, ...] = METRICS,
    first_last: bool = True,
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
        ]
        if first_last:
            # Mirror the tier-0 NaN guard: an all-NaN lower bucket carries
            # NULL first/last, and bucket_ts is never NULL, so an unguarded
            # min_by/max_by could pick that NULL over a sibling bucket's
            # real value. Ordering by a ts nulled-out alongside the value
            # keeps NaN rows invisible at every tier.
            aggs += [
                F.min_by(
                    f"{c}_first",
                    F.when(
                        F.col(f"{c}_first").isNotNull(), F.col("bucket_ts")
                    ),
                ).alias(f"{c}_first"),
                F.max_by(
                    f"{c}_last",
                    F.when(
                        F.col(f"{c}_last").isNotNull(), F.col("bucket_ts")
                    ),
                ).alias(f"{c}_last"),
            ]
    return lower.groupBy("conv_id", b).agg(*aggs)


def finalize(df: DataFrame, value_cols: tuple[str, ...] = METRICS) -> DataFrame:
    """Derive means, convert micro sums back to value units, and apply the
    float32 edge cast."""
    out = df
    for c in value_cols:
        out = out.withColumn(
            f"{c}_avg",
            (
                F.col(f"{c}_sum").cast("double")
                / MICRO
                / F.col(f"{c}_cnt")
            ).cast("float"),
        ).withColumn(
            f"{c}_sum", F.col(f"{c}_sum").cast("double") / MICRO
        )
        for suffix in ("min", "max", "first", "last"):
            if f"{c}_{suffix}" in df.columns:  # first_last=False tiers
                out = out.withColumn(
                    f"{c}_{suffix}", F.col(f"{c}_{suffix}").cast("float")
                )
    return out


def rollup_tiers(
    silver: DataFrame,
    value_cols: tuple[str, ...] = METRICS,
    ts_col: str = "ts",
    first_last: bool = True,
    one_shuffle: bool = True,
) -> dict[str, DataFrame]:
    """The full cascade. Returns raw-state tier DataFrames (finalize() for
    serving).

    one_shuffle=True (default) plans the whole cascade behind a SINGLE
    exchange. The naive chain shuffles three times, and at transcript
    grain the hourly tier barely reduces (a conversation emits ~one turn
    per hour bucket), so tier-1's exchange moves 15-field aggregate STATE
    rows — wider than the raw input. Instead: project the narrow raw
    columns (conv_id, ts, metrics) and hash-repartition by conv_id once.
    HashPartitioning(conv_id) satisfies ClusteredDistribution(conv_id,
    date_trunc(tier, ts)) — rows that agree on (conv_id, bucket) agree on
    conv_id — so EnsureRequirements inserts no further exchange for ANY
    tier: hourly, daily and monthly aggregate pipelined in one stage
    (plan-asserted in tests/test_plans.py). Results are bit-identical to
    the chained path (int64 sums, min/max/min_by are order-independent).

    Cluster note: partitioning by conversation holds at any executor
    count and any tier — this is the 100 TB plan shape (one narrow-row
    shuffle total instead of three wide-state ones). A pathological
    mega-conversation concentrates its groups in one task; group count
    per task stays bounded by the same keys-per-task argument as the
    shuffle-partition sizing rule (session.py).
    """
    base = silver
    if one_shuffle:
        base = silver.select("conv_id", ts_col, *value_cols).repartition(
            "conv_id"
        )
    hourly = rollup_from_raw(base, "hourly", value_cols, ts_col, first_last)
    daily = rollup_cascade(hourly, "daily", value_cols, first_last)
    monthly = rollup_cascade(daily, "monthly", value_cols, first_last)
    return {"hourly": hourly, "daily": daily, "monthly": monthly}
