"""Resumable tier writes: kill mid-tier, rerun, byte-identical result —
the graft's generalization of overview.yml-driven idempotent extension
(reference era5/reshuffle.py:251,254-308)."""

import pytest
from pyspark.sql import functions as F

from ecmwf_models_spark.grid import with_cell_id
from ecmwf_models_spark.lineage import ResumableTierWriter, read_lineage
from ecmwf_models_spark.operators.reshuffle import reshuffle
from ecmwf_models_spark.operators.rollup import finalize, rollup_from_raw


@pytest.fixture(scope="module")
def daily_with_cells(bronze):
    silver = reshuffle(bronze, n_cells=16, num_partitions=8)
    daily = finalize(rollup_from_raw(silver, "daily"))
    df = with_cell_id(daily, 16)
    df.cache().count()
    return df


def _content(spark, path, cols):
    return (
        spark.read.parquet(path)
        .select(*cols)
        .toPandas()
        .sort_values(["cell_id", "conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_crash_and_resume_identical(tmp_path, spark, daily_with_cells):
    df = daily_with_cells
    cols = df.columns

    # straight-through run = golden
    w_ref = ResumableTierWriter(
        spark, str(tmp_path / "ref"), str(tmp_path / "ref_lin"), tier="daily"
    )
    n_ref = w_ref.run(df)
    assert n_ref == 16
    golden = _content(spark, str(tmp_path / "ref"), cols)

    # crashed run: commits 5 cells then dies
    out, lin = str(tmp_path / "out"), str(tmp_path / "lin")
    w1 = ResumableTierWriter(spark, out, lin, tier="daily")
    with pytest.raises(RuntimeError, match="simulated crash"):
        w1.run(df, fail_after_cells=5)
    committed = read_lineage(spark, lin).where("status='committed'").count()
    assert committed == 5

    # resume with a NEW job: only the remaining 11 cells are processed
    w2 = ResumableTierWriter(spark, out, lin, tier="daily")
    n2 = w2.run(df)
    assert n2 == 16 - 5

    resumed = _content(spark, out, cols)
    assert golden.equals(resumed)

    # third run is a no-op (idempotent)
    w3 = ResumableTierWriter(spark, out, lin, tier="daily")
    assert w3.run(df) == 0

    # write-audit: stored stats match lineage rows
    assert w2.verify(df)


def test_lineage_rows_complete(tmp_path, spark, daily_with_cells):
    out, lin = str(tmp_path / "o2"), str(tmp_path / "l2")
    w = ResumableTierWriter(
        spark, out, lin, tier="daily", snapshot_id="snap-001"
    )
    w.run(daily_with_cells)
    lrows = read_lineage(spark, lin)
    assert lrows.count() == 16
    assert lrows.where(F.col("snapshot_id") != "snap-001").count() == 0
    assert lrows.where(F.col("row_count") <= 0).count() == 0
    total = lrows.agg(F.sum("row_count")).first()[0]
    assert total == daily_with_cells.count()


def test_attrs_propagate_reshuffle_rollup_read(tmp_path, spark, bronze):
    """Per-variable attrs (units/long_name from the LUT) must survive
    reshuffle -> tier write -> point read — the reference's attribute
    propagation contract (interface.py:185,496-502,
    era5/reshuffle.py:206-207)."""
    from ecmwf_models_spark.lineage import read_table_attrs
    from ecmwf_models_spark.operators.pointread import TsReader
    from ecmwf_models_spark.operators.reshuffle import write_silver

    silver_path = str(tmp_path / "silver")
    silver = reshuffle(bronze, n_cells=16, num_partitions=8)
    write_silver(silver, silver_path)

    # silver sidecar carries LUT attrs for every LUT-known column
    sa = read_table_attrs(spark, f"{silver_path}/_meta")
    assert sa["text_len"]["units"] == "chars"
    assert sa["text_len"]["long_name"] == "Turn text length"
    assert sa["tool_call"]["units"] == "flag"

    # tier write propagates attrs for tier columns
    daily = with_cell_id(finalize(rollup_from_raw(silver, "daily")), 16)
    w = ResumableTierWriter(
        spark, str(tmp_path / "daily"), str(tmp_path / "lin"), tier="daily"
    )
    w.run(daily)
    ta = read_table_attrs(spark, str(tmp_path / "daily") + "/_meta")
    assert ta["text_len_sum"]["units"] == "chars"
    assert ta["n_turns"]["long_name"] == "Turns per bucket"

    # TsReader surfaces them on the returned frame
    r = TsReader(spark, silver_path, n_cells=16)
    conv = silver.select("conv_id").first()[0]
    pdf = r.read(conv)
    assert pdf.attrs["var_attrs"]["text_len"]["units"] == "chars"
    # tier table readable by spark despite the _meta sidecar
    assert spark.read.parquet(str(tmp_path / "daily")).count() > 0
