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
