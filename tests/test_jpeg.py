"""Pure-stdlib baseline JPEG codec: bit-exact round-trips on the
quantization-transparent patterns, bounded error on general content,
every stream-shape variant (subsampling, restart intervals, 16-bit DQT,
odd dimensions, non-interleaved grayscale), and the loud-failure guards
for unsupported JPEG modes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ecmwf_models_spark.functions.jpeg import (
    _AC_CHR_VALS,
    _AC_LUM_VALS,
    ZIGZAG,
    _dct_basis,
    decode_jpeg,
    encode_jpeg,
)
from ecmwf_models_spark.functions.multimodal import decode_image
from ecmwf_models_spark.functions.png import DecodeError


def _block_gray(h=12, w=16, mid=5):
    y, x = np.ogrid[0:h, 0:w]
    return ((mid * 31 + (y // 8) * 7 + (x // 8) * 13) % 256).astype(
        np.uint8
    )


def test_tables_well_formed():
    # Annex K table sizes and the zigzag permutation
    assert len(_AC_LUM_VALS) == 162
    assert len(_AC_CHR_VALS) == 162
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    a = _dct_basis()
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)  # orthonormal


def test_gray_block_constant_bit_exact():
    img = _block_gray()
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (12, 16, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_gray_general_content_bounded_error():
    rs = np.random.RandomState(3)
    img = rs.randint(0, 256, (17, 23), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1))
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    # unit quantization: per-coefficient rounding error <= 0.5
    assert err.max() <= 3


@pytest.mark.parametrize("subsample", [(1, 1), (2, 1), (2, 2)])
def test_color_gray_valued_bit_exact(subsample):
    # R=G=B gives Cb=Cr=128 exactly, so every chroma subsampling is
    # transparent and the full color pipeline round-trips bit-exactly
    img = _block_gray(mid=9)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    out = decode_jpeg(encode_jpeg(rgb, subsample=subsample))
    assert out.shape == (12, 16, 3)
    assert np.array_equal(out, rgb)


def test_color_444_general_bounded_error():
    rs = np.random.RandomState(4)
    rgb = rs.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quant=1, subsample=(1, 1)))
    err = np.abs(out.astype(int) - rgb.astype(int))
    # quant rounding + YCbCr float round-trip only (no subsampling loss)
    assert err.max() <= 3


def test_restart_intervals_match_unrestarted():
    img = _block_gray(mid=2)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    a = decode_jpeg(encode_jpeg(rgb, subsample=(2, 2)))
    b = decode_jpeg(encode_jpeg(rgb, subsample=(2, 2), restart_interval=1))
    assert np.array_equal(a, b)


def test_16bit_quant_tables():
    img = _block_gray(mid=7)
    out = decode_jpeg(encode_jpeg(img, quant_precision=1))
    assert np.array_equal(out[:, :, 0], img)
    # a 16-bit-only quant entry (>255) actually flows through
    q = np.ones(64, dtype=np.int64)
    q[63] = 300
    out = decode_jpeg(encode_jpeg(img, quant=q, quant_precision=1))
    assert np.array_equal(out[:, :, 0], img)  # constant blocks: AC all 0


def test_odd_dimensions_cropped():
    y, x = np.ogrid[0:9, 0:13]
    img = (((y // 8) * 7 + (x // 8) * 13) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (9, 13, 1)
    assert np.array_equal(out[:, :, 0], img)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    out = decode_jpeg(encode_jpeg(rgb, subsample=(2, 2)))
    assert out.shape == (9, 13, 3)
    assert np.array_equal(out, rgb)


def test_nonzero_ac_roundtrip_exact_when_unquantized():
    # a field whose DCT coefficients are integers: one cosine basis
    # bump per block scaled to integer coefficients survives quant=1
    img = _block_gray(mid=1).astype(np.int64)
    img[0, :8] += 8  # breaks constancy -> nonzero ACs in block (0,0)
    img = np.clip(img, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1))
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 1


def test_progressive_rejected_loud():
    img = _block_gray()
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(DecodeError, match="SOF2"):
        decode_jpeg(bytes(b))


def test_truncated_rejected_loud():
    img = _block_gray()
    b = encode_jpeg(img)
    with pytest.raises(DecodeError):
        decode_jpeg(b[: len(b) // 2])
    with pytest.raises(DecodeError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_decode_image_routes_jpeg():
    # gray payload broadcasts to 3 channels through decode_image
    img = _block_gray(mid=4)
    arr = decode_image(encode_jpeg(img), 16, 12)
    assert arr.shape == (12, 16, 3)
    assert np.array_equal(arr[:, :, 0], img)
    assert np.array_equal(arr[:, :, 1], img)
    # metadata contract still enforced
    with pytest.raises(ValueError, match="metadata"):
        decode_image(encode_jpeg(img), 8, 8)


def test_dqt_dht_multi_table_segments():
    """Decoder handles several tables packed into one DQT/DHT segment
    (what real encoders emit): splice the color stream's table segments
    together and re-decode."""
    img = _block_gray(mid=6)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    b = encode_jpeg(rgb)
    # collect and merge all DHT payloads into a single segment
    out = bytearray()
    i = 0
    dht_payloads = []
    parts = []
    while i < len(b) - 1:
        if b[i] == 0xFF and b[i + 1] == 0xC4:
            ln = struct.unpack(">H", b[i + 2 : i + 4])[0]
            dht_payloads.append(b[i + 4 : i + 2 + ln])
            i += 2 + ln
        elif b[i] == 0xFF and b[i + 1] == 0xDA:
            break
        else:
            parts.append(b[i])
            i += 1
    merged = b"".join(dht_payloads)
    out += bytes(parts)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(merged)) + merged
    out += b[i:]
    dec = decode_jpeg(bytes(out))
    assert np.array_equal(dec, rgb)
