"""Pure-stdlib WAV codec: lossless round-trips through every supported
sample format, RIFF chunk-skipping, malformed-input guards, and the
audio_features window math against a plain-numpy reference."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ecmwf_models_spark.functions.png import DecodeError
from ecmwf_models_spark.functions.wav import decode_wav, encode_wav


def _sig(n=1600, mid=4):
    return ((mid * 37 + 11 * np.arange(n)) % 201 - 100).astype(np.float64)


@pytest.mark.parametrize("fmt", ["pcm16", "float32"])
def test_roundtrip_mono(fmt):
    s = _sig()
    out, rate = decode_wav(encode_wav(s, 16000, fmt=fmt))
    assert rate == 16000
    assert out.shape == (1600, 1)
    assert np.array_equal(out[:, 0], s)


def test_roundtrip_pcm8():
    # u8 storage carries the top byte: values must be multiples of 256
    s = (np.arange(-128, 128) * 256).astype(np.float64)
    out, rate = decode_wav(encode_wav(s, 8000, fmt="pcm8"))
    assert rate == 8000
    assert np.array_equal(out[:, 0], s)


@pytest.mark.parametrize("fmt", ["pcm16", "float32"])
def test_roundtrip_stereo(fmt):
    s = np.stack([_sig(500, 1), _sig(500, 2)], axis=1)
    out, rate = decode_wav(encode_wav(s, 44100, fmt=fmt))
    assert rate == 44100
    assert out.shape == (500, 2)
    assert np.array_equal(out, s)


def test_unknown_chunks_skipped():
    """LIST/fact chunks (what real recorders emit) are skipped, including
    the odd-size word-alignment pad byte."""
    s = _sig(100)
    b = encode_wav(s, 16000)
    # splice a 5-byte (odd) LIST chunk + pad between fmt and data
    di = b.index(b"data")
    spliced = (
        b[:di] + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00" + b[di:]
    )
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    out, rate = decode_wav(spliced)
    assert np.array_equal(out[:, 0], s)


def test_guards_fail_loud():
    with pytest.raises(DecodeError, match="RIFF"):
        decode_wav(b"not audio")
    s = _sig(64)
    b = encode_wav(s, 16000)
    with pytest.raises(DecodeError):
        decode_wav(b[: len(b) // 2])  # truncated data chunk
    # compressed format tag (2 = ADPCM) fails loud, not garbage samples
    fi = b.index(b"fmt ") + 8
    bad = bytearray(b)
    bad[fi : fi + 2] = struct.pack("<H", 2)
    with pytest.raises(DecodeError, match="unsupported WAV format"):
        decode_wav(bytes(bad))


def test_audio_features_matches_numpy(spark):
    from ecmwf_models_spark.functions import multimodal as M

    media = M.gen_media(spark, n=30)
    pdf = M.audio_features(media, win_ms=25).toPandas()
    # audio ids ≡ 1 (mod 3); windows = 3/4/5 per clip by (id // 3) % 3
    for mid in (1, 4, 7):
        n = M._wav_n_samples(mid)
        s = M._wav_sample_expr(mid, np.arange(n)).astype(np.float64)
        win = s.reshape(-1, 400)
        got = (
            pdf[pdf["media_id"] == mid]
            .sort_values("win_idx")
            .reset_index(drop=True)
        )
        assert len(got) == n // 400
        assert np.array_equal(got["mean_amp"].values, win.mean(axis=1))
        assert np.array_equal(got["energy"].values, (win * win).mean(axis=1))
        zc = ((win[:, :-1] * win[:, 1:]) < 0).sum(axis=1)
        assert np.array_equal(got["zero_cross"].values, zc)


def test_audio_features_rate_contract(spark):
    """A payload whose embedded rate disagrees with the metadata column
    fails loud (same contract as image width/height)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ecmwf_models_spark.functions import multimodal as M

    media = M.gen_media(spark, n=6).withColumn(
        "sample_rate", F.lit(8000)  # lie: payloads are 16 kHz
    )
    with pytest.raises(Exception, match="16000 Hz"):
        M.audio_features(media).collect()
