"""spark-ts-engine: PySpark-native time-series rollup/downsample/retention
engine with the capabilities of TUW-GEO/ecmwf_models (reference at
/root/reference, snapshot 2025-12-05), rebuilt Spark-first over tables of
multi-turn conversation transcripts (conv_id, turn_idx, role, text, tool, ts).

Capability map (reference -> here):
  Img2Ts reshuffle (era5/reshuffle.py:233-249)  -> operators.reshuffle
  OrthoMultiTs cell files (interface.py:675-720)-> cell-partitioned silver table
  regular h_steps grid (interface.py:361-386)   -> operators.bucket + gapfill
  ERA5-T dedup (interface.py:289-296)           -> operators.dedup
  grid/cells (grid.py:145-193)                  -> grid module
  overview.yml (utils.py:365-409)               -> lineage module
  extend_ts (era5/reshuffle.py:254-308)         -> incremental module
  CDO remap/downsample (extract.py:150-160)     -> operators.rollup tiers
  ERATs.read point query (README.rst:66-81)     -> operators.pointread
"""

__version__ = "0.1.0"
