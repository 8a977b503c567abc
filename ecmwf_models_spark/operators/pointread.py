"""Point reads: one conversation's series as a pandas DataFrame.

Reference: ERATs.read(lon, lat) -> nearest gpi -> gpi2cell -> open one
<cell>.nc -> one location's row across the time axis as pandas
(reference interface.py:675-720, README.rst:66-81, docs/ts_read.rst:15-34).
read_bulk caches the whole cell file (interface.py:705-711).

Spark-first: cell_id is recomputable from conv_id, so the filter
(cell_id == c AND conv_id == k) prunes to ONE partition directory of the
cell-partitioned silver table before any IO — partition pruning plays
gpi2cell. `offsets`/`scale_factors` (interface.py:694-714) map to an affine
select. O(cell), never O(world).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..grid import DEFAULT_N_CELLS


def cell_id_for(spark: SparkSession, conv_id: str, n_cells: int) -> int:
    """Driver-side cell routing (gpi2cell). One-row JVM eval so the hash is
    bit-identical to the write path's xxhash64."""
    return (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(n_cells)).cast("int"))
        .first()[0]
    )


class TsReader:
    """ERATs analogue over the cell-partitioned silver table."""

    def __init__(
        self,
        spark: SparkSession,
        silver_path: str,
        n_cells: int = DEFAULT_N_CELLS,
        read_bulk: bool = False,
        parameters: list[str] | None = None,
        offsets: dict[str, float] | None = None,
        scale_factors: dict[str, float] | None = None,
    ):
        from ..lineage import read_table_attrs

        self.spark = spark
        self.silver = spark.read.parquet(silver_path)
        # per-variable attrs written by write_silver / the tier writer —
        # the reference reads these back onto the returned dataset
        # (interface.py:185; GriddedNcOrthoMultiTs variable attrs)
        self.attrs = read_table_attrs(spark, f"{silver_path}/_meta")
        self.n_cells = n_cells
        self.read_bulk = read_bulk
        self.parameters = parameters
        self.offsets = offsets or {}
        self.scale_factors = scale_factors or {}
        self._cell_cache: dict[int, DataFrame] = {}

    def _cell_df(self, cell: int) -> DataFrame:
        if self.read_bulk:
            if cell not in self._cell_cache:
                self._cell_cache[cell] = self.silver.where(
                    F.col("cell_id") == cell
                ).cache()
            return self._cell_cache[cell]
        return self.silver.where(F.col("cell_id") == cell)

    def read(self, conv_id: str) -> pd.DataFrame:
        cell = cell_id_for(self.spark, conv_id, self.n_cells)
        df = (
            self._cell_df(cell)
            .where(F.col("conv_id") == conv_id)
            .orderBy("ts", "turn_idx")
        )
        cols = self.parameters
        if cols:
            df = df.select("ts", *cols)
        for c, sf in self.scale_factors.items():
            df = df.withColumn(c, F.col(c) * F.lit(sf))
        for c, off in self.offsets.items():
            df = df.withColumn(c, F.col(c) + F.lit(off))
        pdf = df.toPandas()
        pdf = pdf.set_index("ts") if "ts" in pdf.columns else pdf
        # pandas-native attrs carry: units/long_name per variable
        pdf.attrs["var_attrs"] = {
            c: self.attrs[c] for c in pdf.columns if c in self.attrs
        }
        return pdf

    def close(self):
        for df in self._cell_cache.values():
            df.unpersist()
        self._cell_cache.clear()
