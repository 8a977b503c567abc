"""Masking / projection / schema-reconciliation operators (SURVEY 2.2).

P3 sea-point masking  -> role/tool-conditional NULLing
   (reference interface.py:128-135,172-178: values NULLed where lsm < 1,
    lsm column dropped afterwards unless requested)
P4 subgrid gather     -> broadcast left-semi join on the key
   (reference interface.py:145-149,182-183)
P8 expver coalesce    -> final-over-preliminary column coalesce
   (reference interface.py:163-168)
P9 missing-variable fill -> all-NULL column + schema reconciliation
   (reference interface.py:154-160)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def mask_by_flag(
    df: DataFrame,
    value_cols: Sequence[str],
    flag_col: str,
    keep_flag: bool = False,
) -> DataFrame:
    """NULL value_cols where flag < 1 (sea-point masking analogue). The
    flag column is dropped unless requested, like lsm."""
    out = df
    for c in value_cols:
        out = out.withColumn(
            c, F.when(F.col(flag_col) >= 1, F.col(c))
        )
    return out if keep_flag else out.drop(flag_col)


def mask_roles(
    df: DataFrame, value_cols: Sequence[str], roles: Sequence[str]
) -> DataFrame:
    """Graft flavor: NULL metrics for turns whose role is not in `roles`."""
    out = df
    for c in value_cols:
        out = out.withColumn(
            c, F.when(F.col("role").isin(list(roles)), F.col(c))
        )
    return out


def subgrid_gather(df: DataFrame, dim: DataFrame, key: str = "conv_id") -> DataFrame:
    """Keep only rows whose key exists in the (small) dimension — broadcast
    left-semi join; the land-points filter cut 76% of points before the
    shuffle in the reference (grid.py:86-142, tests/test_grid.py:42,49)."""
    return df.join(F.broadcast(dim.select(key)), key, "left_semi")


def coalesce_versions(
    df: DataFrame, final_col: str, prelim_col: str, out: str
) -> DataFrame:
    """expver coalesce: prefer the final version's value, fall back to
    preliminary (reference interface.py:163-168)."""
    return df.withColumn(out, F.coalesce(F.col(final_col), F.col(prelim_col)))


def ensure_columns(
    df: DataFrame, required: dict[str, str], warn: bool = True
) -> DataFrame:
    """Requested variable absent -> all-NULL column of the right type
    (reference interface.py:154-160 emits all-NaN + warning)."""
    import warnings

    out = df
    for name, dtype in required.items():
        if name not in out.columns:
            if warn:
                warnings.warn(f"column {name} missing; filling with NULL")
            out = out.withColumn(name, F.lit(None).cast(dtype))
    return out
