"""Pure-stdlib PNG codec: roundtrip through every scanline filter type,
every supported color type, and the malformed-input guards."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ecmwf_models_spark.functions.png import (
    DecodeError,
    decode_png,
    encode_png,
)
from ecmwf_models_spark.functions.multimodal import (
    DecoderUnavailable,
    _synth_pixels,
    decode_image,
)


def _img(h=12, w=16, c=3, seed=7):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters_rgb(filter_type):
    img = _img()
    out = decode_png(encode_png(img, filter_type))
    assert out.shape == img.shape
    assert (out == img).all()


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_color_types(channels):
    img = _img(c=channels)
    out = decode_png(encode_png(img, filter_type=4))
    assert out.shape == img.shape
    assert (out == img).all()


def test_roundtrip_gradient_and_flat():
    # flat + smooth images are where Sub/Up/Average actually compress
    grad = np.tile(np.arange(32, dtype=np.uint8), (8, 1))[:, :, None]
    grad = np.repeat(grad, 3, axis=2)
    for ft in range(5):
        assert (decode_png(encode_png(grad, ft)) == grad).all()
    flat = np.full((5, 9, 3), 200, dtype=np.uint8)
    assert (decode_png(encode_png(flat, 2)) == flat).all()


def test_single_pixel_and_single_row():
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert (decode_png(encode_png(one, 4)) == one).all()
    row = _img(h=1, w=33)
    assert (decode_png(encode_png(row, 1)) == row).all()


def test_decode_rejects_garbage():
    with pytest.raises(DecodeError):
        decode_png(b"not a png at all")
    with pytest.raises(DecodeError):
        decode_png(b"")


def test_decode_rejects_truncated_idat():
    data = bytearray(encode_png(_img()))
    # corrupt the IDAT payload so inflate yields the wrong size
    idx = bytes(data).index(b"IDAT")
    (length,) = struct.unpack_from(">I", data, idx - 4)
    short = zlib.compress(b"\x00" * 10)
    data[idx - 4 : idx] = struct.pack(">I", len(short))
    data[idx + 4 : idx + 4 + length] = short
    with pytest.raises(DecodeError):
        decode_png(bytes(data))


def test_decode_rejects_bad_headers():
    img = _img()
    data = bytearray(encode_png(img))
    ihdr = bytes(data).index(b"IHDR") + 4
    # a LYING bit-depth byte (16 on 8-bit data) now fails on the size
    # check rather than an unsupported-depth guard
    data16 = bytearray(data)
    data16[ihdr + 8] = 16  # bit depth byte
    with pytest.raises(DecodeError):
        decode_png(bytes(data16))
    # a LYING interlace byte (Adam7 on sequentially-written data) fails
    # on the per-pass size accounting
    datai = bytearray(data)
    datai[ihdr + 12] = 1  # interlace byte
    with pytest.raises(DecodeError):
        decode_png(bytes(datai))
    # an ILLEGAL palette depth (3 is not a PNG depth) fails loud
    pal_img = encode_png(
        np.zeros((4, 4), np.uint8),
        palette=np.zeros((2, 3), np.uint8),
    )
    data3 = bytearray(pal_img)
    data3[bytes(data3).index(b"IHDR") + 4 + 8] = 3
    with pytest.raises(DecodeError, match="palette bit depth"):
        decode_png(bytes(data3))
    # sub-byte GRAYSCALE stays out of scope and fails loud
    gray = bytearray(encode_png(_img(c=1)))
    gray[bytes(gray).index(b"IHDR") + 4 + 8] = 4
    with pytest.raises(DecodeError, match="unsupported bit depth"):
        decode_png(bytes(gray))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_16bit(filter_type, channels):
    """16-bit samples (big-endian u16): filters operate on BYTES with a
    2c-byte left offset, so every filter branch is re-exercised at the
    wider pixel stride. Values span the full u16 range."""
    rs = np.random.RandomState(11)
    img = rs.randint(0, 65536, size=(9, 13, channels), dtype=np.uint16)
    out = decode_png(encode_png(img, filter_type))
    assert out.dtype == np.uint16
    assert out.shape == img.shape
    assert (out == img).all()


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_palette(filter_type):
    """Color type 3: indexes filter/unfilter as 1-byte pixels, PLTE
    lookup expands to RGB on decode."""
    rs = np.random.RandomState(3)
    pal = rs.randint(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rs.randint(0, 17, size=(10, 14), dtype=np.uint8)
    out = decode_png(encode_png(idx, filter_type, palette=pal))
    assert out.shape == (10, 14, 3)
    assert (out == pal[idx]).all()


def test_palette_guards():
    pal = np.zeros((4, 3), np.uint8)
    # encoder: out-of-range index
    with pytest.raises(ValueError, match="index out of range"):
        encode_png(np.full((2, 2), 9, np.uint8), palette=pal)
    # decoder: palette image with its PLTE chunk stripped
    good = bytearray(encode_png(np.zeros((2, 2), np.uint8), palette=pal))
    i = bytes(good).index(b"PLTE") - 4
    (length,) = struct.unpack_from(">I", good, i)
    del good[i : i + 12 + length]
    with pytest.raises(DecodeError, match="missing PLTE"):
        decode_png(bytes(good))


def test_decode_image_dispatch():
    img = _img()
    assert (decode_image(encode_png(img, 3), 16, 12) == img).all()
    # metadata contract: size mismatch fails loud
    with pytest.raises(ValueError, match="metadata"):
        decode_image(encode_png(img, 0), 8, 8)
    # JPEG magic routes to the REAL baseline decoder (functions/jpeg.py);
    # a truncated stream fails loud there, never the hash-expansion fake
    with pytest.raises(DecodeError):
        decode_image(b"\xff\xd8\xff\xe0JFIF", 4, 4)
    # grayscale broadcasts, alpha drops
    gray = _img(c=1)
    got = decode_image(encode_png(gray, 2), 16, 12)
    assert got.shape == (12, 16, 3)
    assert (got[:, :, 0] == gray[:, :, 0]).all()
    rgba = _img(c=4)
    got = decode_image(encode_png(rgba, 4), 16, 12)
    assert (got == rgba[:, :, :3]).all()


def test_synth_pixels_roundtrip_through_png():
    # the exact payloads gen_media ships: closed-form pixels, every filter
    for mid in range(5):
        px = _synth_pixels(mid, 16, 12)
        assert (decode_png(encode_png(px, mid % 5)) == px).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_subbyte_palette(depth, filter_type):
    """1/2/4-bit palette indexes: MSB-first sample packing, byte-padded
    rows, filter offset floored to one byte."""
    rs = np.random.RandomState(depth * 10 + filter_type)
    pal = rs.randint(0, 256, (1 << depth, 3), dtype=np.uint8)
    idx = rs.randint(0, 1 << depth, (11, 13), dtype=np.uint8)
    out = decode_png(
        encode_png(idx, filter_type, palette=pal, bit_depth=depth)
    )
    assert np.array_equal(out, pal[idx])


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_adam7(channels, filter_type):
    """Adam7: seven independently filtered passes merged on their pixel
    lattices — every color type and filter."""
    img = _img(c=channels, seed=channels + filter_type)
    out = decode_png(encode_png(img, filter_type, interlace=True))
    assert np.array_equal(out, img)


def test_adam7_16bit_palette_and_tiny():
    rs = np.random.RandomState(42)
    img16 = rs.randint(0, 65536, (9, 11, 3), dtype=np.uint16)
    assert np.array_equal(
        decode_png(encode_png(img16, 2, interlace=True)), img16
    )
    for depth in (1, 2, 4, 8):
        pal = rs.randint(0, 256, (1 << depth, 3), dtype=np.uint8)
        idx = rs.randint(0, 1 << depth, (13, 17), dtype=np.uint8)
        out = decode_png(
            encode_png(idx, 4, palette=pal, bit_depth=depth, interlace=True)
        )
        assert np.array_equal(out, pal[idx])
    # images small enough that several Adam7 passes are EMPTY
    for h, w in [(1, 1), (2, 3), (5, 1), (1, 9), (8, 8)]:
        img = rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(img, 1, interlace=True)), img
        ), (h, w)
