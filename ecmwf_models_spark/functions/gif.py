"""Pure-stdlib animated-GIF codec (struct + numpy): real VIDEO frame
decode with zero native media libraries, completing the multimodal
triple (functions/png.py + jpeg.py images, wav.py audio, this) — the
"video" rows' frame sampling now runs on genuinely decoded frames, not
index arithmetic alone.

Scope — decoder: GIF87a/GIF89a, global and local color tables, full LZW
decompression (variable code width 3..12 bits, CLEAR/EOI, deferred
clear), multiple frames with sub-rectangle image descriptors, Graphic
Control Extension transparency (transparent pixels leave the canvas
unchanged) and disposal methods 0/1 (none / leave in place) — the
animation compositing model used by virtually all generated GIFs.
Disposal 2/3 (restore background / restore previous) and interlaced
frames raise DecodeError loudly; the cluster swap-in point is
PIL/ffmpeg, and nothing outside this module changes.

Scope — encoder: mints real test payloads (like encode_png /
encode_jpeg / encode_wav): true LZW compression (greedy longest-match,
dictionary reset at 4096), one global color table, per-frame GCE with
delay, full-frame or sub-rect frames.

Everything bulk is numpy (palette lookup, canvas compositing); the LZW
code loop is per-symbol Python — inherently sequential, same split as
the JPEG Huffman walk, and it runs inside Arrow-batched mapInPandas.

GIF is a public spec: GIF89a (CompuServe 1990), W3C mirror.
Reference parity note: the reference pipeline never decodes video
(beyond-reference LLM-pipeline op, SURVEY.md §2 multimodal row).
"""

from __future__ import annotations

import struct

import numpy as np

from .png import DecodeError

_HEADERS = (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------------ LZW


def _lzw_encode(indexes: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: greedy longest-match, dictionary reset at 4096
    entries, variable code width starting min_code_size+1, LSB-first bit
    packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return (
            {(i,): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    emit(clear, width)
    seq: tuple[int, ...] = ()
    for px in indexes.ravel().tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table, next_code, width = fresh()
        seq = (px,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    # wrap in <=255-byte sub-blocks
    blocks = bytearray([min_code_size])
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return bytes(blocks)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of _lzw_encode (and of any spec-conforming encoder):
    returns exactly n_expected palette indexes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0
    out: list[int] = []

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > len(bits):
            raise DecodeError("truncated LZW stream")
        v = 0
        for i in range(width):
            v |= int(bits[pos + i]) << i
        pos += width
        return v

    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None

    def reset():
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_expected:
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or code >= clear:
                raise DecodeError("invalid first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise DecodeError("LZW code out of range")
        out.extend(entry)
        prev = entry
        # width grows when the NEXT code to assign needs more bits
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_expected:
        raise DecodeError(
            f"LZW stream ended at {len(out)}/{n_expected} pixels"
        )
    return np.array(out[:n_expected], dtype=np.uint8)


# ---------------------------------------------------------------- encoder


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    delay_cs: int = 4,
    transparent: int | None = None,
) -> bytes:
    """(n_frames, h, w) palette-index frames + (n, 3) uint8 palette ->
    animated GIF89a bytes (global color table, one GCE + full-frame
    image per frame, true LZW). transparent marks that index transparent
    in every frame after the first (decoder coverage for the
    leave-in-place compositing path)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError("frames must be (n_frames, h, w) indexes")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette must be (n, 3) uint8")
    n, h, w = f.shape
    if f.max(initial=0) >= len(pal):
        raise ValueError("palette index out of range")
    # global color table size: power of two >= len(pal), min 2
    gct_bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    gct = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    gct[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0
    )  # LSD: GCT present, 2^gct_bits entries
    out += gct.tobytes()
    # Netscape looping extension — standard in the wild, exercises the
    # application-extension skip path in foreign decoders
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, gct_bits)
    for i in range(n):
        flags = 0x04 | (0x01 if (transparent is not None and i > 0) else 0)
        tidx = transparent if (transparent is not None and i > 0) else 0
        out += b"\x21\xf9" + struct.pack(
            "<BBHBB", 4, flags, delay_cs, tidx, 0
        )
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += _lzw_encode(f[i], min_code)
    out += b"\x3b"  # trailer
    return bytes(out)


# ---------------------------------------------------------------- decoder


def decode_gif(data: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes -> ((n_frames, h, w, 3) uint8 composited RGB frames,
    per-frame delays in centiseconds). Raises DecodeError on interlaced
    frames, disposal 2/3, and malformed input."""
    b = bytes(data)
    if b[:6] not in _HEADERS:
        raise DecodeError("not a GIF (bad header)")
    if len(b) < 13:
        raise DecodeError("truncated logical screen descriptor")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise DecodeError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    delay = 0
    disposal = 0

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(b):
                raise DecodeError("truncated sub-blocks")
            size = b[p]
            p += 1
            if size == 0:
                return p
            p += size

    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = b[pos]
                gflags, delay, tidx = struct.unpack_from(
                    "<BHB", b, pos + 1
                )
                pos = skip_subblocks(pos)
                disposal = (gflags >> 2) & 0x07
                if disposal > 1:
                    raise DecodeError(
                        f"GIF disposal method {disposal} unsupported "
                        "(only none/leave — swap in PIL)"
                    )
                transparent = tidx if (gflags & 0x01) else None
                _ = size
            else:  # comment / application / plain-text: skip
                pos = skip_subblocks(pos)
        elif block == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", b, pos)
            pos += 9
            if iflags & 0x40:
                raise DecodeError("interlaced GIF frames unsupported")
            ct = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(
                    b[pos : pos + 3 * n], dtype=np.uint8
                )
                if len(ct) != 3 * n:
                    raise DecodeError("truncated local color table")
                ct = ct.reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise DecodeError("frame without any color table")
            if ix + iw > w or iy + ih > h:
                raise DecodeError("frame rectangle outside canvas")
            min_code = b[pos]
            pos += 1
            # concatenate LZW sub-blocks
            lzw = bytearray()
            while True:
                size = b[pos]
                pos += 1
                if size == 0:
                    break
                lzw += b[pos : pos + size]
                pos += size
            idx = _lzw_decode(bytes(lzw), min_code, iw * ih).reshape(
                ih, iw
            )
            if idx.max(initial=0) >= len(ct):
                raise DecodeError("GIF pixel index outside color table")
            region = canvas[iy : iy + ih, ix : ix + iw]
            rgb = ct[idx]
            if transparent is not None:
                mask = (idx == transparent)[:, :, None]
                rgb = np.where(mask, region, rgb)
            canvas[iy : iy + ih, ix : ix + iw] = rgb
            frames.append(canvas.copy())
            delays.append(int(delay))
        else:
            raise DecodeError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise DecodeError("GIF contains no image frames")
    return np.stack(frames), delays
