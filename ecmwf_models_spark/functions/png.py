"""Pure-stdlib PNG codec (zlib + struct + numpy): real image decode with
zero native media libraries, so the multimodal pipeline's decode step is
genuinely executed — not stubbed — inside the Arrow-batched UDFs.

Scope: 8-bit grayscale (color type 0), RGB (2), RGBA (6), palette
(3, PLTE lookup -> RGB) at ALL legal palette depths (1/2/4/8 bits),
16-bit grayscale/RGB/RGBA (big-endian u16, returned as uint16), and
BOTH interlace methods (none and Adam7 — each of the seven passes is an
independently filtered sub-image merged back on its pixel lattice).
Sub-byte GRAYSCALE depths raise DecodeError (rare outside fax-style
scans); a cluster image pipeline would swap in libjpeg/PIL for those,
and nothing outside this module changes (same ndarray contract).

Decode path: signature check -> IHDR parse -> IDAT concat -> zlib
inflate -> per-scanline unfilter (all five PNG filter types: None, Sub,
Up, Average, Paeth) per pass -> sample unpack (bit depths 1/2/4 are
MSB-first packed) -> PLTE lookup / u16 assembly. Unfiltering is
numpy-vectorized across each row; Sub/Average/Paeth carry a left-pixel
dependency so those rows walk pixels, but rows with filter None/Up
(what encoders emit for flat regions) stay fully vectorized.

PNG spec is public: RFC 2083 / W3C PNG (ISO/IEC 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, rgb, rgba

# Adam7 pass lattices: (x0, y0, dx, dy), PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


class DecodeError(ValueError):
    pass


def _pass_dims(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """(x0, y0, dx, dy, pass_w, pass_h) for each non-empty Adam7 pass."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        out.append((x0, y0, dx, dy, pw, ph))
    return out


def _filter_rows(rows8: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Apply one PNG filter to every scanline of a (h, stride) uint8
    array. Filtering is byte-wise with a bpp-byte left offset (PNG spec
    §6.2), computed from the ORIGINAL neighbor bytes, so every filter is
    fully numpy-vectorized per row."""
    h, stride = rows8.shape
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
    return bytes(raw)


def _pack_rows(idx: np.ndarray, bit_depth: int) -> np.ndarray:
    """(h, w) palette indexes -> (h, stride) bytes at the given depth
    (MSB-first sample packing, rows padded to a byte boundary)."""
    if bit_depth == 8:
        return idx
    h, w = idx.shape
    bits = (
        (idx[:, :, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
    ).reshape(h, w * bit_depth)
    return np.packbits(bits.astype(np.uint8), axis=1)


def encode_png(
    arr: np.ndarray,
    filter_type: int = 0,
    palette: np.ndarray | None = None,
    bit_depth: int | None = None,
    interlace: bool = False,
) -> bytes:
    """Minimal PNG writer: uint8 (h, w), (h, w, 1), (h, w, 3), (h, w, 4)
    arrays; uint16 arrays of the same shapes (bit depth 16, big-endian);
    or, with palette=(n, 3) uint8, a (h, w) uint8 INDEX array written as
    color type 3 with a PLTE chunk (bit_depth selects 1/2/4/8-bit packed
    indexes; default 8). filter_type applies one PNG filter to every
    scanline (0..4) — used by tests to exercise every decoder branch.
    interlace=True writes Adam7 (each pass filtered independently)."""
    if palette is not None:
        a = np.asarray(arr, dtype=np.uint8)
        if a.ndim != 2:
            raise ValueError("palette image must be a (h, w) index array")
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3:
            raise ValueError("palette must be (n, 3) uint8")
        depth = 8 if bit_depth is None else bit_depth
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"palette bit depth {depth}")
        if a.max(initial=0) >= min(len(pal), 1 << depth):
            raise ValueError("palette index out of range")
        h, w = a.shape
        color_type, bd, bpp, c = 3, depth, 1, 1
        pixels = a[:, :, None]  # (h, w, 1) index samples
    else:
        a = np.asarray(arr)
        if a.dtype not in (np.uint8, np.uint16):
            raise ValueError(f"unsupported dtype {a.dtype}")
        if a.ndim == 2:
            a = a[:, :, None]
        h, w, c = a.shape
        color_type = {1: 0, 3: 2, 4: 6}[c]
        if a.dtype == np.uint16:
            bd, bpp = 16, 2 * c
        else:
            bd, bpp = 8, c
        pixels = a

    def rows_for(px: np.ndarray) -> np.ndarray:
        """(ph, pw, c) pixel slab -> (ph, stride) filter-ready bytes."""
        ph, pw = px.shape[:2]
        if palette is not None:
            return _pack_rows(px[:, :, 0], bd)
        if px.dtype == np.uint16:
            return px.astype(">u2").view(np.uint8).reshape(ph, pw * c * 2)
        return px.reshape(ph, pw * c)

    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
            if pw == 0 or ph == 0:
                continue
            raw += _filter_rows(
                rows_for(pixels[y0::dy, x0::dx]), bpp, filter_type
            )
    else:
        raw += _filter_rows(rows_for(pixels), bpp, filter_type)

    ihdr = struct.pack(
        ">IIBBBBB", w, h, bd, color_type, 0, 0, 1 if interlace else 0
    )
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
    """Paeth predictor, elementwise over int arrays (PNG spec §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _unfilter(raw: np.ndarray, bpp: int) -> np.ndarray:
    """(h, stride+1) filtered scanlines -> (h, stride) reconstructed
    bytes. Vectorized per row; Sub/Average/Paeth walk bpp-byte pixel
    groups (inherent left dependency)."""
    height, stridep1 = raw.shape
    stride = stridep1 - 1
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
    return out


def _unpack_pixels(
    out: np.ndarray, w: int, c: int, bit_depth: int
) -> np.ndarray:
    """(h, stride) reconstructed bytes -> (h, w, c) samples: uint8 at
    depths 1/2/4 (palette indexes) and 8, uint16 at depth 16."""
    h = out.shape[0]
    if bit_depth == 16:
        u16 = out.reshape(h, w * c, 2).astype(np.uint16)
        return ((u16[:, :, 0] << 8) | u16[:, :, 1]).reshape(h, w, c)
    if bit_depth == 8:
        return out.reshape(h, w, c)
    # sub-byte palette indexes, MSB-first packed, rows byte-padded
    bits = np.unpackbits(out, axis=1)[:, : w * bit_depth]
    weights = 1 << np.arange(bit_depth - 1, -1, -1)
    idx = (
        bits.reshape(h, w, bit_depth).astype(np.uint8) * weights
    ).sum(axis=2)
    return idx.astype(np.uint8)[:, :, None]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) ndarray: uint8 for bit depth <= 8
    (palette images come back as RGB after PLTE lookup), uint16 for bit
    depth 16. Handles both interlace methods (none, Adam7)."""
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
        if bit_depth not in (1, 2, 4, 8):
            raise DecodeError(f"palette bit depth {bit_depth} unsupported")
        if plte is None:
            raise DecodeError("palette image missing PLTE")
        c = 1
    elif color_type in _CHANNELS:
        if bit_depth not in (8, 16):
            raise DecodeError(f"unsupported bit depth {bit_depth}")
        c = _CHANNELS[color_type]
    else:
        raise DecodeError(f"unsupported color type {color_type}")
    if interlace not in (0, 1):
        raise DecodeError(f"unknown interlace method {interlace}")
    if not idat:
        raise DecodeError("missing IDAT")

    bits_pp = bit_depth * c
    # filter offset, in BYTES, floor 1 for sub-byte depths (PNG §6.2)
    bpp = max(1, bits_pp // 8)
    raw = zlib.decompress(bytes(idat))

    def stride_of(pw: int) -> int:
        return -(-pw * bits_pp // 8)

    if interlace == 0:
        stride = stride_of(width)
        if len(raw) != height * (stride + 1):
            raise DecodeError(
                f"inflated size {len(raw)} != expected "
                f"{height * (stride + 1)}"
            )
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(
            height, stride + 1
        )
        samples = _unpack_pixels(_unfilter(arr, bpp), width, c, bit_depth)
    else:  # Adam7: seven independently filtered sub-images
        dt = np.uint16 if bit_depth == 16 else np.uint8
        samples = np.zeros((height, width, c), dtype=dt)
        off = 0
        for x0, y0, dx, dy, pw, ph in _pass_dims(width, height):
            if pw == 0 or ph == 0:
                continue
            pstride = stride_of(pw)
            n = ph * (pstride + 1)
            if off + n > len(raw):
                raise DecodeError("inflated data short of Adam7 passes")
            arr = np.frombuffer(
                raw[off : off + n], dtype=np.uint8
            ).reshape(ph, pstride + 1)
            off += n
            samples[y0::dy, x0::dx] = _unpack_pixels(
                _unfilter(arr, bpp), pw, c, bit_depth
            )
        if off != len(raw):
            raise DecodeError(
                f"inflated size {len(raw)} != Adam7 expected {off}"
            )

    if color_type == 3:
        idx = samples[:, :, 0]
        if idx.max(initial=0) >= len(plte):
            raise DecodeError("palette index out of range")
        return plte[idx]  # (h, w, 3) uint8
    return samples
