"""Pure-stdlib GIF codec: LZW round-trips across palette sizes and
dictionary resets, animation compositing (transparency, sub-rects),
malformed-input guards, and the video_frame_features math against a
plain-numpy reference."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ecmwf_models_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from ecmwf_models_spark.functions.png import DecodeError


def _pal(n=16, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (n, 3), dtype=np.uint8
    )


def test_lzw_roundtrip_exact():
    rs = np.random.RandomState(1)
    for min_code in (2, 4, 8):
        for n in (1, 7, 300, 5000):
            data = rs.randint(0, 1 << min_code, n).astype(np.uint8)
            blocks = _lzw_encode(data, min_code)
            # strip sub-block framing the way the decoder's caller does
            raw = bytearray()
            i = 1  # skip the min-code byte
            while blocks[i]:
                raw += blocks[i + 1 : i + 1 + blocks[i]]
                i += 1 + blocks[i]
            out = _lzw_decode(bytes(raw), min_code, n)
            assert np.array_equal(out, data), (min_code, n)


def test_multiframe_roundtrip():
    rs = np.random.RandomState(2)
    pal = _pal()
    frames = rs.randint(0, 16, (5, 12, 16), dtype=np.uint8)
    out, delays = decode_gif(encode_gif(frames, pal, delay_cs=7))
    assert out.shape == (5, 12, 16, 3)
    assert delays == [7] * 5
    for i in range(5):
        assert np.array_equal(out[i], pal[frames[i]])


def test_dict_reset_256_colors():
    """64x64 random 256-color frames push the LZW dictionary past 4096
    entries — the encoder must CLEAR and the decoder must follow."""
    rs = np.random.RandomState(3)
    pal = _pal(256)
    frames = rs.randint(0, 256, (2, 64, 64), dtype=np.uint8)
    out, _ = decode_gif(encode_gif(frames, pal))
    for i in range(2):
        assert np.array_equal(out[i], pal[frames[i]])


def test_transparency_composites_on_prior_canvas():
    pal = _pal()
    frames = np.zeros((3, 8, 8), dtype=np.uint8)
    frames[0] = 1
    frames[1] = 2
    frames[1, :4] = 0  # transparent in frames 1+
    frames[2] = 3
    frames[2, :, :4] = 0
    out, _ = decode_gif(encode_gif(frames, pal, transparent=0))
    assert np.array_equal(out[0], pal[np.full((8, 8), 1)])
    exp1 = pal[np.where(frames[1] == 0, 1, frames[1])]
    assert np.array_equal(out[1], exp1)
    exp2 = pal[
        np.where(
            frames[2] == 0, np.where(frames[1] == 0, 1, frames[1]),
            frames[2],
        )
    ]
    assert np.array_equal(out[2], exp2)


def test_guards_fail_loud():
    with pytest.raises(DecodeError, match="GIF"):
        decode_gif(b"not a gif")
    pal = _pal()
    frames = np.zeros((2, 4, 4), dtype=np.uint8)
    b = bytearray(encode_gif(frames, pal))
    # disposal method 2 (restore background) is out of scope, loud
    i = bytes(b).find(b"\x21\xf9")
    b[i + 3] |= 0x08
    with pytest.raises(DecodeError, match="disposal"):
        decode_gif(bytes(b))
    # interlace flag on a frame descriptor
    b = bytearray(encode_gif(frames, pal))
    i = bytes(b).find(b"\x2c")
    b[i + 9] |= 0x40
    with pytest.raises(DecodeError, match="interlaced"):
        decode_gif(bytes(b))
    # truncated mid-frame
    b = encode_gif(frames, pal)
    with pytest.raises((DecodeError, IndexError)):
        decode_gif(b[: len(b) * 2 // 3])


def test_video_frame_features_matches_numpy(spark):
    from ecmwf_models_spark.functions import multimodal as M

    media = M.gen_media(spark, n=30)
    pdf = M.video_frame_features(media, every_k=2).toPandas()
    # video ids ≡ 2 (mod 3); n_frames = (id % 8) + 1
    for mid in (2, 5, 8, 11):
        n = (mid % 8) + 1
        sel = np.arange(0, n, 2)
        got = (
            pdf[pdf["media_id"] == mid]
            .sort_values("frame_idx")
            .reset_index(drop=True)
        )
        assert list(got["frame_idx"]) == list(sel)
        j = M._gif_frame_index(mid, sel)
        exp = M._GIF_PALETTE[j].astype(np.float64)
        assert np.array_equal(got[["mean_r", "mean_g", "mean_b"]].values, exp)


def test_video_frame_count_contract(spark):
    """A payload whose frame count disagrees with the n_frames metadata
    column fails loud (same contract as image width/height)."""
    from pyspark.sql import functions as F

    from ecmwf_models_spark.functions import multimodal as M

    media = M.gen_media(spark, n=9).withColumn(
        "n_frames", F.col("n_frames") + 1
    )
    with pytest.raises(Exception, match="frames but payload"):
        M.video_frame_features(media).collect()
