"""Codec round-trip properties (encode . decode == identity, bit-exact) +
compression-ratio sanity + Spark pack/unpack round trip."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from ecmwf_models_spark import codec


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**52),
        min_size=0,
        max_size=400,
    )
)
@settings(max_examples=60, deadline=None)
def test_ts_roundtrip_property(vals):
    ts = np.sort(np.array(vals, dtype=np.int64))
    out = codec.decode_timestamps(codec.encode_timestamps(ts))
    np.testing.assert_array_equal(out, ts)


@given(
    st.lists(
        st.floats(width=32, allow_nan=False),
        min_size=0,
        max_size=400,
    )
)
@settings(max_examples=60, deadline=None)
def test_values_roundtrip_property(vals):
    v = np.array(vals, dtype=np.float32)
    out = codec.decode_values_f32(codec.encode_values_f32(v))
    np.testing.assert_array_equal(out.view(np.uint32), v.view(np.uint32))


def test_nan_roundtrip():
    v = np.array([1.5, np.nan, np.nan, 2.5, np.inf, -np.inf, 0.0, -0.0],
                 dtype=np.float32)
    out = codec.decode_values_f32(codec.encode_values_f32(v))
    np.testing.assert_array_equal(out.view(np.uint32), v.view(np.uint32))


def test_regular_grid_compresses_hard():
    # 6-hourly regular grid: dod == 0 -> ~0 bits/point
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 6 * 3600 * 1_000_000
    blob = codec.encode_timestamps(ts)
    assert len(blob) < n * 8 / 50, len(blob)  # >50x vs raw int64
    # constant series -> all-zero XOR blocks
    v = np.full(n, 3.25, dtype=np.float32)
    vb = codec.encode_values_f32(v)
    assert len(vb) < n * 4 / 50, len(vb)


def test_slow_moving_values_compress():
    n = 10_000
    v = (np.sin(np.arange(n) / 100) * 10 + 100).astype(np.float32)
    vb = codec.encode_values_f32(v)
    assert len(vb) < n * 4 / 1.3  # beats raw float32
    np.testing.assert_array_equal(codec.decode_values_f32(vb), v)


@pytest.mark.usefixtures("spark")
def test_spark_pack_unpack_roundtrip(spark, bronze):
    from ecmwf_models_spark.operators.reshuffle import reshuffle

    silver = reshuffle(bronze, n_cells=16, num_partitions=8)
    packed = codec.pack_cells(silver)
    back = codec.unpack_cells(packed)

    a = (
        silver.select("cell_id", "conv_id", "ts", "text_len", "tool_call")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    b = back.toPandas().sort_values(["conv_id", "ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_series_equal(
        a["conv_id"], b["conv_id"], check_index=False
    )
    np.testing.assert_array_equal(
        a["ts"].astype("datetime64[us]").values,
        b["ts"].astype("datetime64[us]").values,
    )
    np.testing.assert_array_equal(a["text_len"].values, b["text_len"].values)
    np.testing.assert_array_equal(
        a["tool_call"].values, b["tool_call"].values
    )


@pytest.mark.usefixtures("spark")
def test_stream_pack_matches_group_pack(spark, bronze):
    """pack_cells_stream (mapInPandas run-walk, zero shuffle) must emit
    byte-identical blobs to pack_cells (applyInPandas baseline), including
    runs that span Arrow batch boundaries (forced tiny batch size)."""
    from ecmwf_models_spark.operators.reshuffle import reshuffle

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        silver = reshuffle(bronze, n_cells=16, num_partitions=8)
        a = {
            (r["cell_id"], r["conv_id"]): r
            for r in codec.pack_cells(silver).collect()
        }
        b = {
            (r["cell_id"], r["conv_id"]): r
            for r in codec.pack_cells_stream(silver).collect()
        }
        assert set(a) == set(b)
        for k in a:
            assert a[k]["n"] == b[k]["n"], k
            assert a[k]["ts_blob"] == b[k]["ts_blob"], k
            assert a[k]["text_len_blob"] == b[k]["text_len_blob"], k
            assert a[k]["tool_call_blob"] == b[k]["tool_call_blob"], k
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_batch_encoders_bit_identical_fuzz():
    """encode_*_batch must be BIT-identical to the scalar encoders for
    any run layout (empty, singleton, block-boundary, multi-block runs,
    NaNs, constants)."""
    import numpy as np

    from ecmwf_models_spark import codec

    rng = np.random.RandomState(42)
    for _ in range(60):
        nrun = rng.randint(1, 16)
        lens = rng.choice(
            [0, 1, 2, 3, 24, 127, 128, 129, 257, 300], size=nrun
        )
        bounds = np.concatenate([[0], np.cumsum(lens)])
        n = int(bounds[-1])
        ts = np.cumsum(rng.randint(0, 10**9, size=n).astype(np.int64))
        vals = rng.randn(n).astype(np.float32)
        if n:
            vals[rng.rand(n) < 0.1] = np.nan
            vals[rng.rand(n) < 0.3] = 2.5
        bt = codec.encode_timestamps_batch(ts, bounds)
        bv = codec.encode_values_f32_batch(vals, bounds)
        for r in range(nrun):
            lo, hi = bounds[r], bounds[r + 1]
            assert bt[r] == codec.encode_timestamps(ts[lo:hi])
            assert bv[r] == codec.encode_values_f32(vals[lo:hi])
            # and they decode back
            np.testing.assert_array_equal(
                codec.decode_timestamps(bt[r]), ts[lo:hi]
            )
            np.testing.assert_array_equal(
                codec.decode_values_f32(bv[r]).view(np.uint32),
                vals[lo:hi].view(np.uint32),
            )
