"""Grid / cell partitioning — the spatial dimension of the reference
(ERA_RegularImgGrid, reference grid.py:145-193) re-expressed as DataFrame
column expressions plus the graft's conv_id -> cell_id rule.

The reference chunks a global 0.25-degree grid into 5x5-degree cells
(<=2566 cells, reference docs/img2ts.rst:13-16) so each point read touches
exactly one cell file. Here the unit of locality is a conversation; the
cell is a stable hash bucket of conv_id, so point reads prune to one
partition the same way gpi2cell does (reference tests/test_grid.py:44,53).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

DEFAULT_N_CELLS = 64
SCALE = 1_000_000  # integer microdegrees for float-exact axes (safe_arange,
                   # reference grid.py:32-56)


def cell_of(conv_id: Column | str, n_cells: int = DEFAULT_N_CELLS) -> Column:
    """cell_id = pmod(xxhash64(conv_id), n_cells) — deterministic, uniform,
    computable at read time for partition pruning (gpi2cell analogue)."""
    c = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    return F.pmod(F.xxhash64(c), F.lit(n_cells)).cast("int")


def with_cell_id(df: DataFrame, n_cells: int = DEFAULT_N_CELLS) -> DataFrame:
    return df.withColumn("cell_id", cell_of("conv_id", n_cells))


def trafo_lon(lon: Column) -> Column:
    """Longitude 0..360 -> -180..180 (reference grid.py:13-29)."""
    return F.when(lon > 180.0, lon - 360.0).otherwise(lon)


def regular_grid(
    spark: SparkSession,
    resolution: float = 0.25,
    bbox: tuple[float, float, float, float] | None = None,
    cellsize: float = 5.0,
) -> DataFrame:
    """Regular global lat/lon grid as a dimension DataFrame
    (gpi, lon, lat, cell) — the reference's ERA_RegularImgGrid
    (grid.py:145-193): gpi row-major from lon=-180.., lat=90 downward.

    Axes are generated with integer arithmetic (microdegrees) so spacing is
    float-exact (safe_arange, reference grid.py:32-56). bbox cut preserves
    global gpi numbering (reference grid.py:182-191).
    """
    step = int(round(resolution * SCALE))
    n_lon = int(round(360 / resolution))
    n_lat = int(round(180 / resolution)) + 1

    lons = spark.range(n_lon).select(
        F.col("id").alias("lon_i"),
        ((F.col("id") * step - 180 * SCALE) / SCALE).alias("lon"),
    )
    lats = spark.range(n_lat).select(
        F.col("id").alias("lat_i"),
        ((90 * SCALE - F.col("id") * step) / SCALE).alias("lat"),
    )
    g = lats.crossJoin(lons).select(
        (F.col("lat_i") * n_lon + F.col("lon_i")).alias("gpi"),
        "lon",
        "lat",
    )
    n_cell_lon = int(round(360 / cellsize))
    g = g.withColumn(
        "cell",
        (
            F.floor((F.col("lon") + 180.0) / cellsize) * int(round(180 / cellsize))
            + F.floor((F.col("lat") + 90.0) / cellsize)
        ).cast("int"),
    )
    _ = n_cell_lon
    if bbox is not None:
        min_lon, min_lat, max_lon, max_lat = bbox
        g = g.where(
            F.col("lon").between(min_lon, max_lon)
            & F.col("lat").between(min_lat, max_lat)
        )
    return g


def grid_resolution_check(grid_df: DataFrame, axis: str = "lon") -> float:
    """Assert uniform spacing, else raise — the reference's
    get_grid_resolution 'Grid not regular' guard (grid.py:59-83)."""
    from pyspark.sql import Window

    w = Window.orderBy(axis)
    diffs = (
        grid_df.select(axis)
        .distinct()
        .withColumn("_d", F.round(F.col(axis) - F.lag(axis).over(w), 9))
        .where(F.col("_d").isNotNull())
        .agg(
            F.countDistinct("_d").alias("n"),
            F.first("_d").alias("res"),
        )
        .collect()[0]
    )
    if diffs["n"] != 1:
        raise ValueError("Grid not regular")
    return abs(float(diffs["res"]))
