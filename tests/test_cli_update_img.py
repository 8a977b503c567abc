"""CLI round-trip for the streaming ingest subcommand: the
test_streaming availableNow flow driven through `update-img`
(reference cli.py:271-310 exposes update_images as a first-class
command)."""

import subprocess
import sys

from pyspark.sql import functions as F

from ecmwf_models_spark.synth import gen_transcripts

CUTOFF = "2010-01-02 00:00:00"


def _run(args):
    out = subprocess.run(
        [sys.executable, "-m", "ecmwf_models_spark.cli", "--cpus", "4",
         "update-img", *args],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_update_img_incremental(tmp_path, spark):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")

    full = gen_transcripts(spark, n_conv=20, days=2, turns_per_conv=6)
    full.where(F.col("ts") < CUTOFF).write.mode("append").parquet(src)
    stdout1 = _run(["--bronze", src, "--out", out, "--watermark", "0 seconds"])
    assert "update-img" in stdout1

    # second pass: only the delta is processed, output grows
    full.where(F.col("ts") >= CUTOFF).write.mode("append").parquet(src)
    sentinel = (
        full.limit(1)
        .withColumn("conv_id", F.lit("__sentinel__"))
        .withColumn("ts", F.to_timestamp(F.lit("2010-02-01 00:00:00")))
    )
    sentinel.write.mode("append").parquet(src)
    _run(["--bronze", src, "--out", out, "--watermark", "0 seconds"])

    streamed = spark.read.parquet(out).where(F.col("conv_id") != "__sentinel__")
    # every emitted window exactly once across BOTH cli invocations
    assert (
        streamed.groupBy("bucket_ts", "conv_id").count()
        .where("count > 1").count() == 0
    )
    assert streamed.count() > 0
