"""Hot-conv salting (north-rule skew handling): ts-segment salt splits a
hot conversation across range partitions without changing ANY output —
same rows, same dedup winners, same per-partition ordering invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecmwf_models_spark.operators.reshuffle import reshuffle
from ecmwf_models_spark.synth import gen_transcripts


def _hot_bronze(spark):
    # every 5th conv is hot with 40x turns -> guaranteed skew
    return gen_transcripts(
        spark, n_conv=20, days=30, turns_per_conv=12,
        hot_every=5, hot_factor=40,
    ).cache()


def test_salted_output_identical(spark):
    bronze = _hot_bronze(spark)
    plain = reshuffle(bronze, n_cells=8).drop("cell_id")
    salted = reshuffle(
        bronze, n_cells=8, salt_segment_hours=24
    ).drop("cell_id")
    assert plain.count() == salted.count()
    # full anti-join diff both ways on every column
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_splits_hot_conv_across_partitions(spark):
    bronze = _hot_bronze(spark)
    hot = "conv-000000"  # conv_i % 5 == 0 -> hot
    salted = reshuffle(
        bronze, n_cells=8, num_partitions=16, salt_segment_hours=6
    )
    spread = (
        salted.withColumn("_pid", F.spark_partition_id())
        .where(F.col("conv_id") == hot)
        .select("_pid")
        .distinct()
        .count()
    )
    assert spread >= 2, f"hot conv stayed in {spread} partition(s)"


def test_salted_partitions_preserve_global_order(spark):
    """Range partitioning on (cell, conv, seg): partition ids must be
    monotone in (cell_id, conv_id, ts-segment) — concatenating part files
    in task order yields a globally sorted cell series (O1)."""
    bronze = _hot_bronze(spark)
    salted = reshuffle(
        bronze, n_cells=8, num_partitions=16, salt_segment_hours=6
    )
    rows = (
        salted.withColumn("_pid", F.spark_partition_id())
        .groupBy("cell_id", "conv_id", "_pid")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .orderBy("cell_id", "conv_id", "_pid")
        .collect()
    )
    prev = None
    for r in rows:
        key = (r["cell_id"], r["conv_id"])
        if prev is not None and prev[0] == key:
            assert prev[1] <= r["lo"], f"overlapping segments for {key}"
        prev = (key, r["hi"])


def test_salted_dedup_still_drops_sentinel(spark):
    bronze = _hot_bronze(spark)
    salted = reshuffle(bronze, n_cells=8, salt_segment_hours=6)
    assert salted.where(F.col("text") == "PRELIM-99").count() == 0
