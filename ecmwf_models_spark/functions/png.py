"""Pure-stdlib PNG codec (zlib + struct + numpy): real image decode with
zero native media libraries, so the multimodal pipeline's decode step is
genuinely executed — not stubbed — inside the Arrow-batched UDFs.

Scope: 8-bit grayscale (color type 0), RGB (2) and RGBA (6), non
interlaced — the standard output of every screenshot/thumbnail pipeline.
Palette (3), 16-bit and Adam7 interlacing raise DecodeError; a cluster
image pipeline would swap in libjpeg/PIL for those, and nothing outside
this module changes (same ndarray contract).

Decode path: signature check -> IHDR parse -> IDAT concat -> zlib
inflate -> per-scanline unfilter (all five PNG filter types: None, Sub,
Up, Average, Paeth). Unfiltering is numpy-vectorized across each row;
Sub/Average/Paeth carry a left-pixel dependency so those rows walk
pixels, but rows with filter None/Up (what encoders emit for flat
regions) stay fully vectorized.

PNG spec is public: RFC 2083 / W3C PNG (ISO/IEC 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, rgb, rgba


class DecodeError(ValueError):
    pass


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for uint8 (h, w), (h, w, 1), (h, w, 3) or
    (h, w, 4) arrays. filter_type applies one PNG filter to every
    scanline (0..4) — used by tests to exercise every decoder branch."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    bpp = c  # bytes per pixel at bit depth 8

    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        row = a[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, c), np.uint8), row[:-1]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            left = np.vstack([np.zeros((1, c), np.uint8), row[:-1]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (row.astype(np.int16) - avg).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            left = np.vstack([np.zeros((1, c), np.uint8), row[:-1]])
            ul = np.vstack([np.zeros((1, c), np.uint8), prev[:-1]])
            pred = _paeth(
                left.astype(np.int16),
                prev.astype(np.int16),
                ul.astype(np.int16),
            )
            filt = (row.astype(np.int16) - pred).astype(np.uint8)
        else:
            raise ValueError(f"filter_type {filter_type}")
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    del bpp

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(raw), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """Paeth predictor, elementwise over int16 arrays (PNG spec §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 ndarray."""
    if data is None or len(data) < 8 or bytes(data[:8]) != _SIGNATURE:
        raise DecodeError("not a PNG (bad signature)")
    data = bytes(data)
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise DecodeError("truncated chunk")
        if tag == b"IHDR":
            (
                width,
                height,
                bit_depth,
                color_type,
                _comp,
                _filt,
                interlace,
            ) = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + payload + crc
    if width is None:
        raise DecodeError("missing IHDR")
    if bit_depth != 8:
        raise DecodeError(f"unsupported bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise DecodeError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise DecodeError("Adam7 interlacing unsupported")
    if not idat:
        raise DecodeError("missing IDAT")

    c = _CHANNELS[color_type]
    stride = width * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise DecodeError(
            f"inflated size {len(raw)} != expected {height * (stride + 1)}"
        )
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:]

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = filters[y]
        row = rows[y].astype(np.int32)
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up — vectorized
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):
            cur = np.empty(stride, dtype=np.int32)
            # left-pixel dependency: walk pixel groups, vectorized over
            # the c channels of each pixel
            for x in range(0, stride, c):
                left = cur[x - c : x] if x else np.zeros(c, np.int32)
                up = prev[x : x + c]
                ul = prev[x - c : x] if x else np.zeros(c, np.int32)
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[x : x + c] = (row[x : x + c] + pred) & 0xFF
        else:
            raise DecodeError(f"bad filter byte {f} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = out[y].astype(np.int32)
    return out.reshape(height, width, c)
