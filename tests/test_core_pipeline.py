"""End-to-end slice: bronze -> dedup -> reshuffle -> silver -> point read.

Models the reference's golden reshuffle round-trip
(tests/tests_era5/test_era5_reshuffle.py:108-146): run the pipeline on a
small fixture, assert exact point values, sortedness, and prelim exclusion.
"""

import pandas as pd
from pyspark.sql import functions as F

from ecmwf_models_spark.operators.dedup import latest_final_wins
from ecmwf_models_spark.operators.pointread import TsReader, cell_id_for
from ecmwf_models_spark.operators.reshuffle import (
    read_silver,
    reshuffle,
    write_silver,
)


def test_dedup_drops_sentinel(bronze):
    out = latest_final_wins(bronze)
    assert out.where(F.col("text") == "PRELIM-99").count() == 0
    # exactly one row per (conv_id, turn_idx)
    assert (
        out.groupBy("conv_id", "turn_idx").count().where("count > 1").count()
        == 0
    )
    # and dedup never invents or loses keys
    assert (
        out.select("conv_id", "turn_idx").distinct().count()
        == bronze.select("conv_id", "turn_idx").distinct().count()
    )


def test_reshuffle_roundtrip(tmp_path, spark, bronze):
    path = str(tmp_path / "silver")
    silver = reshuffle(bronze, n_cells=16, num_partitions=8)
    write_silver(silver, path)

    back = read_silver(spark, path)
    base = latest_final_wins(bronze)
    assert back.count() == base.count()

    # prelim sentinel must not leak (test_era5_reshuffle.py:61-74 analogue)
    assert back.where(F.col("text") == "PRELIM-99").count() == 0

    # per-turn text equality under stable (conv_id, turn_idx) ordering —
    # the north-star anti-join diff: ours vs reference-semantics input.
    ours = back.select("conv_id", "turn_idx", "text")
    ref = base.select("conv_id", "turn_idx", "text")
    assert ours.join(ref, ["conv_id", "turn_idx", "text"], "left_anti").count() == 0
    assert ref.join(ours, ["conv_id", "turn_idx", "text"], "left_anti").count() == 0

    # cell routing is consistent: every row's cell matches cell_of(conv_id)
    assert (
        back.where(
            F.col("cell_id")
            != F.pmod(F.xxhash64("conv_id"), F.lit(16)).cast("int")
        ).count()
        == 0
    )


def test_silver_file_order_sorted(tmp_path, spark, bronze):
    """Physical ordering invariant: rows inside each parquet file are
    sorted by (conv_id, ts) — the OrthoMultiTs sortedness regression
    (reference CHANGELOG.rst:9-12; test_era5_reshuffle.py:100-103)."""
    import glob

    path = str(tmp_path / "silver2")
    write_silver(reshuffle(bronze, n_cells=16, num_partitions=8), path)
    files = glob.glob(path + "/cell_id=*/*.parquet")
    assert files
    for f in files[:20]:
        pdf = pd.read_parquet(f, columns=["conv_id", "ts"])
        key = list(zip(pdf["conv_id"], pdf["ts"]))
        assert key == sorted(key), f"unsorted rows in {f}"


def test_point_read(tmp_path, spark, bronze):
    path = str(tmp_path / "silver3")
    write_silver(reshuffle(bronze, n_cells=16, num_partitions=8), path)

    r = TsReader(spark, path, n_cells=16, read_bulk=True)
    pdf = r.read("conv-000007")
    assert len(pdf) == 12  # turns_per_conv for a non-hot conv
    assert list(pdf["turn_idx"]) == sorted(pdf["turn_idx"])
    assert pdf.index.is_monotonic_increasing
    # exact golden point values (the swvl1@(15,48) analogue):
    assert pdf["text_len"].notna().all()
    assert (pdf["tool_call"].iloc[2::3] == 1.0).all()

    # affine rescale at read (interface.py:694-714)
    r2 = TsReader(
        spark, path, n_cells=16,
        parameters=["text_len"], scale_factors={"text_len": 2.0},
        offsets={"text_len": 1.0},
    )
    pdf2 = r2.read("conv-000007")
    assert (pdf2["text_len"].values == pdf["text_len"].values * 2 + 1).all()
    r.close()


def test_cell_routing_matches_write(spark, tmp_path, bronze):
    cid = cell_id_for(spark, "conv-000007", 16)
    assert 0 <= cid < 16
