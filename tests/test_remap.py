"""Weighted conservative remap (A1 variant) — models the reference's
weight-reuse regrid (extract.py:150-160,204-213): weights conserve mass,
remap totals equal source totals, and the weights join broadcasts."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from ecmwf_models_spark.operators.remap import (
    conservative_weights_1d,
    remap_weighted,
)


def test_weights_conserve_per_src(spark):
    w = conservative_weights_1d(spark, 64, 24).toPandas()
    sums = w.groupby("src_cell")["w"].sum()
    assert len(sums) == 64
    assert (abs(sums - 1.0) < 1e-12).all()
    # uneven grids genuinely split: some src cells hit two dst cells
    assert (w.groupby("src_cell").size() > 1).any()


def test_remap_conserves_mass(spark):
    fact = spark.createDataFrame(
        [(i % 64, float(i)) for i in range(1000)], ["cell_id", "value"]
    )
    w = conservative_weights_1d(spark, 64, 24)
    out = remap_weighted(fact, w, ("value",))
    total_src = fact.agg(F.sum("value")).first()[0]
    total_dst = out.agg(F.sum("value_remap")).first()[0]
    assert abs(total_src - total_dst) < 1e-6
    assert out.count() == 24


def test_identity_remap_when_grids_divide(spark):
    """64 -> 16 divides evenly: every src maps to exactly one dst with
    weight 1 (pure coarsening)."""
    w = conservative_weights_1d(spark, 64, 16).toPandas()
    assert len(w) == 64
    assert (w["w"] == 1.0).all()
    assert (w["dst_cell"] == w["src_cell"] // 4).all()


def test_weights_join_broadcasts(spark):
    fact = spark.createDataFrame(
        [(i % 64, float(i)) for i in range(100)], ["cell_id", "value"]
    )
    w = conservative_weights_1d(spark, 64, 24)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        remap_weighted(fact, w, ("value",)).explain("simple")
    assert "BroadcastHashJoin" in buf.getvalue()
