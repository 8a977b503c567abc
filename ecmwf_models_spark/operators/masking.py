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


def _ref_agg(df: DataFrame, value_col: str):
    """Order-independent mean: sum carried as decimal(38,18) (associative),
    divided by count at the edge."""
    return F.sum(F.col(value_col).cast("decimal(38,18)")).cast(
        "double"
    ) / F.count(value_col)


def derive_entity_mask(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 0.5,
    exclude_zone=None,
) -> DataFrame:
    """A3/P5 landmask DERIVATION: build the active-entity mask dimension
    from a reference metric in the data itself — the graft of
    make_era5_land_definition_file (reference utils.py:179-256): per grid
    point, land = 1.0 where ref_var >= threshold else 0.0, and the
    Antarctica band (lat < -60) forced to NaN.

    Here the grid point is an entity key (user/conv/cell), the reference
    variable is the key's mean metric (the lsm land fraction analogue),
    and exclude_zone is an arbitrary boolean Column marking the cut-off
    band -> NULL mask. One hash aggregate, map-side combinable; the
    resulting dimension is tiny (one row per entity) and feeds
    subgrid_gather / mask_by_flag as the broadcast side.

    The mean is computed as sum(decimal)/count, not avg(double): decimal
    addition is associative, so a key whose mean sits exactly on the
    threshold cannot flip between 1.0 and 0.0 with partitioning (the
    mask must be a DETERMINISTIC artifact — the reference writes it to a
    definition file once and every later run depends on it)."""
    agg = df.groupBy(key_col).agg(_ref_agg(df, value_col).alias("_ref"))
    mask = F.when(F.col("_ref") >= threshold, 1.0).otherwise(0.0)
    if exclude_zone is not None:
        mask = F.when(exclude_zone, F.lit(None).cast("double")).otherwise(
            mask
        )
    return agg.select(key_col, mask.alias("land"))


def active_keys(mask: DataFrame, key_col: str) -> DataFrame:
    """P5 land-grid construction: the subgrid of active entities (the
    reference builds its land grid from mask==1 cells,
    utils.py:179-256 + grid.py land_points)."""
    return mask.where(F.col("land") == 1.0).select(key_col)


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
