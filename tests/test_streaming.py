"""Structured Streaming ingest: availableNow incremental passes match the
batch rollup, and the checkpoint makes rerun process only the delta."""

import glob
import os

from pyspark.sql import functions as F

from ecmwf_models_spark.streaming.ingest import run_available_now
from ecmwf_models_spark.synth import gen_transcripts


def _write_batch(df, path):
    df.write.mode("append").parquet(path)


def test_available_now_incremental(tmp_path, spark):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    full = gen_transcripts(spark, n_conv=30, days=2, turns_per_conv=8)
    batch1 = full.where(F.col("turn_idx") < 4)
    batch2 = full.where(F.col("turn_idx") >= 4)

    # batch 1 arrives -> first availableNow pass
    _write_batch(batch1, src)
    run_available_now(spark, src, out, ckpt, watermark="0 seconds")
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    files_after_1 = set(glob.glob(out + "/*.parquet"))

    # batch 2 arrives -> second pass processes only the delta
    _write_batch(batch2, src)
    run_available_now(spark, src, out, ckpt, watermark="0 seconds")
    result = spark.read.parquet(out)

    # every (conv, hour) window that is complete matches the batch rollup
    batch_truth = (
        full.where(~F.col("is_prelim"))
        .withColumn("text_len", F.length("text").cast("float"))
        .groupBy(
            F.date_trunc("hour", "ts").alias("bucket_ts"), "conv_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("text_len").cast("double")).alias("text_len_sum"),
        )
    )
    # append-mode emits each window at most once per pass; aggregate across
    # passes (a window may get contributions from both batches)
    streamed = result.groupBy("bucket_ts", "conv_id").agg(
        F.sum("n_turns").alias("n_turns"),
        F.sum("text_len_sum").alias("text_len_sum"),
    )
    diff = (
        streamed.join(batch_truth, ["bucket_ts", "conv_id"], "full")
        .where(
            (streamed["n_turns"] != batch_truth["n_turns"])
            | streamed["n_turns"].isNull()
            | batch_truth["n_turns"].isNull()
        )
        .count()
    )
    assert diff == 0
    assert os.path.isdir(ckpt)
    assert len(set(glob.glob(out + "/*.parquet")) - files_after_1) > 0
