"""Generator determinism + fixture contracts (FIXTURES.md F1/F3)."""

from pyspark.sql import functions as F

from ecmwf_models_spark.synth import gen_transcripts


def test_schema(bronze):
    assert dict(bronze.dtypes) == {
        "conv_id": "string",
        "turn_idx": "int",
        "role": "string",
        "text": "string",
        "tool": "string",
        "ts": "timestamp",
        "is_prelim": "boolean",
        "ingest_ts": "timestamp",
    }


def test_deterministic_across_parallelism(spark, bronze):
    # same args -> identical content regardless of partitioning
    again = gen_transcripts(spark, n_conv=50, days=4, turns_per_conv=12)
    again = again.repartition(3)
    assert bronze.exceptAll(again).count() == 0
    assert again.exceptAll(bronze).count() == 0


def test_contiguous_turns_and_roles(bronze):
    base = bronze.where(~F.col("is_prelim"))
    per_conv = base.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.max("turn_idx").alias("mx"),
        F.min("turn_idx").alias("mn"),
    )
    bad = per_conv.where(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
    ).count()
    assert bad == 0
    # tool column set exactly on tool turns
    assert (
        base.where(
            (F.col("role") == "tool") != F.col("tool").isNotNull()
        ).count()
        == 0
    )


def test_prelim_rows_exist_with_sentinel(bronze):
    prelim = bronze.where(F.col("is_prelim"))
    assert prelim.count() > 0
    assert prelim.where(F.col("text") != "PRELIM-99").count() == 0


def test_skew_knob(bronze):
    counts = (
        bronze.where(~F.col("is_prelim"))
        .groupBy("conv_id")
        .count()
        .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
        .first()
    )
    assert counts["mx"] >= 50 * counts["mn"] / 2  # hot conv factor visible
