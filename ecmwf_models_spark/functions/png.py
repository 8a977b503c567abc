"""Pure-stdlib PNG codec (zlib + struct + numpy): real image decode with
zero native media libraries, so the multimodal pipeline's decode step is
genuinely executed — not stubbed — inside the Arrow-batched UDFs.

Scope: 8-bit grayscale (color type 0), RGB (2), RGBA (6), 8-bit palette
(3, PLTE lookup -> RGB), and 16-bit grayscale/RGB/RGBA (big-endian u16,
returned as uint16), non-interlaced — the standard outputs of
screenshot/thumbnail/scientific-image pipelines. Sub-byte palette
depths (1/2/4) and Adam7 interlacing raise DecodeError; a cluster image
pipeline would swap in libjpeg/PIL for those, and nothing outside this
module changes (same ndarray contract).

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


def encode_png(
    arr: np.ndarray,
    filter_type: int = 0,
    palette: np.ndarray | None = None,
) -> bytes:
    """Minimal PNG writer: uint8 (h, w), (h, w, 1), (h, w, 3), (h, w, 4)
    arrays; uint16 arrays of the same shapes (bit depth 16, big-endian);
    or, with palette=(n, 3) uint8, a (h, w) uint8 INDEX array written as
    color type 3 with a PLTE chunk. filter_type applies one PNG filter
    to every scanline (0..4) — used by tests to exercise every decoder
    branch. Filtering is byte-wise with a bpp-byte left offset (PNG spec
    §6.2), computed from the ORIGINAL neighbor bytes, so every filter is
    fully numpy-vectorized per row."""
    if palette is not None:
        a = np.asarray(arr, dtype=np.uint8)
        if a.ndim != 2:
            raise ValueError("palette image must be a (h, w) index array")
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3:
            raise ValueError("palette must be (n, 3) uint8")
        if a.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        h, w = a.shape
        color_type, bit_depth, bpp = 3, 8, 1
        rows8 = a  # (h, stride) bytes
    else:
        a = np.asarray(arr)
        if a.dtype not in (np.uint8, np.uint16):
            raise ValueError(f"unsupported dtype {a.dtype}")
        if a.ndim == 2:
            a = a[:, :, None]
        h, w, c = a.shape
        color_type = {1: 0, 3: 2, 4: 6}[c]
        if a.dtype == np.uint16:
            bit_depth, bpp = 16, 2 * c
            rows8 = (
                a.astype(">u2").view(np.uint8).reshape(h, w * c * 2)
            )
        else:
            bit_depth, bpp = 8, c
            rows8 = a.reshape(h, w * c)

    stride = rows8.shape[1]
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)

    def shifted_left(row16):
        out = np.zeros(stride, dtype=np.int16)
        out[bpp:] = row16[:-bpp]
        return out

    for y in range(h):
        row = rows8[y].astype(np.int16)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            filt = row - shifted_left(row)
        elif filter_type == 2:  # Up
            filt = row - prev
        elif filter_type == 3:  # Average
            filt = row - (shifted_left(row) + prev) // 2
        elif filter_type == 4:  # Paeth
            filt = row - _paeth(
                shifted_left(row), prev, shifted_left(prev)
            )
        else:
            raise ValueError(f"filter_type {filter_type}")
        raw.append(filter_type)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = row

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(raw), 6)
    chunks = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if palette is not None:
        chunks += _chunk(b"PLTE", pal.tobytes())
    return chunks + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


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
    """PNG bytes -> (h, w, channels) ndarray: uint8 for bit depth 8
    (palette images come back as RGB after PLTE lookup), uint16 for bit
    depth 16."""
    if data is None or len(data) < 8 or bytes(data[:8]) != _SIGNATURE:
        raise DecodeError("not a PNG (bad signature)")
    data = bytes(data)
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    plte = None
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
        elif tag == b"PLTE":
            if length % 3:
                raise DecodeError("PLTE length not a multiple of 3")
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + payload + crc
    if width is None:
        raise DecodeError("missing IHDR")
    if color_type == 3:
        if bit_depth != 8:
            raise DecodeError(
                f"palette bit depth {bit_depth} unsupported (only 8)"
            )
        if plte is None:
            raise DecodeError("palette image missing PLTE")
        c, sample_bytes = 1, 1
    elif color_type in _CHANNELS:
        if bit_depth not in (8, 16):
            raise DecodeError(f"unsupported bit depth {bit_depth}")
        c, sample_bytes = _CHANNELS[color_type], bit_depth // 8
    else:
        raise DecodeError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise DecodeError("Adam7 interlacing unsupported")
    if not idat:
        raise DecodeError("missing IDAT")

    bpp = c * sample_bytes  # filter offset, in BYTES (PNG spec §6.2)
    stride = width * bpp
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
            # the bpp bytes of each pixel
            for x in range(0, stride, bpp):
                left = cur[x - bpp : x] if x else np.zeros(bpp, np.int32)
                up = prev[x : x + bpp]
                ul = prev[x - bpp : x] if x else np.zeros(bpp, np.int32)
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[x : x + bpp] = (row[x : x + bpp] + pred) & 0xFF
        else:
            raise DecodeError(f"bad filter byte {f} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = out[y].astype(np.int32)

    if color_type == 3:
        idx = out.reshape(height, width)
        if idx.max(initial=0) >= len(plte):
            raise DecodeError("palette index out of range")
        return plte[idx]  # (h, w, 3) uint8
    if sample_bytes == 2:
        u16 = (
            out.reshape(height, width * c, 2).astype(np.uint16)
        )
        return ((u16[:, :, 0] << 8) | u16[:, :, 1]).reshape(
            height, width, c
        )
    return out.reshape(height, width, c)
