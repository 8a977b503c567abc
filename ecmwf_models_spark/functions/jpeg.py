"""Pure-stdlib baseline JPEG codec (struct + numpy): real JFIF decode with
zero native media libraries, closing the last decode gap in the multimodal
pipeline (functions/png.py covers PNG; this module covers baseline JPEG —
what a real multimodal corpus is mostly made of).

Scope — decoder: baseline sequential DCT (SOF0, and SOF1 extended
sequential with 8-bit samples), grayscale and 3-component YCbCr, any
sampling factors (4:4:4 / 4:2:2 / 4:2:0 chroma upsampled by pixel
replication), 8- and 16-bit quantization tables, restart intervals
(DRI + RST0-7), multiple DQT/DHT tables per segment, APPn/COM skip.
Progressive (SOF2), arithmetic coding, 12-bit precision and hierarchical
modes raise DecodeError loudly — a cluster pipeline swaps in libjpeg/PIL
for those and nothing outside this module changes (same ndarray
contract as decode_png).

Scope — encoder: exists to mint REAL test payloads (exactly like
encode_png): baseline grayscale or YCbCr color with optional 4:2:0/4:2:2
chroma subsampling, the spec's example Huffman tables (ITU-T T.81
Annex K — the tables virtually every real encoder ships), uniform or
custom quantization, optional restart intervals. With a unit quant
table, block-constant grayscale (and gray-valued color: Cb=Cr=128
exactly) round-trips BIT-EXACTLY — a constant 8x8 block carries only its
DC coefficient, 8*(v-128), which unit quantization preserves — which is
what lets gen_media's JPEG payloads sit under a value-exact SQL oracle
(entry `image_decode_features_jpeg`) instead of a tolerance check.

Entropy decode walks the bitstream symbol-by-symbol (a Huffman stream is
inherently sequential), but everything after it — dequantize, de-zigzag,
IDCT over all blocks at once (one einsum against the orthonormal 8x8 DCT
basis), plane assembly, chroma upsample, color conversion — is
numpy-vectorized across the whole image, mirroring png.py's
per-scanline-walk / vectorized-everything-else split.

JPEG spec is public: ITU-T T.81 / ISO-IEC 10918-1; JFIF is ECMA TR/98.
Reference parity note: the reference pipeline never decodes images
(beyond-reference LLM-pipeline op, SURVEY.md §2 multimodal row).
"""

from __future__ import annotations

import struct

import numpy as np

from .png import DecodeError

# ---------------------------------------------------------------- tables

# zigzag index -> natural (row-major) index, ITU-T T.81 Figure 5
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.3 example Huffman tables: (bits[1..16], values).
# DC tables code category symbols 0..11; AC tables code (run<<4 | size).
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: A[u, x] = c(u) cos((2x+1)u pi / 16),
    c(0)=sqrt(1/8), c(u>0)=1/2. Forward F = A f A^T, inverse f = A^T F A.
    Orthonormality is what makes the constant-block DC path float-exact
    (see module docstring)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    a = np.cos((2 * x + 1) * u * np.pi / 16)
    a[0] *= np.sqrt(1.0 / 8.0)
    a[1:] *= 0.5
    return a


_A = _dct_basis()


# ------------------------------------------------------- canonical Huffman


class _HuffTable:
    """Canonical Huffman table from a JPEG (bits[16], values) spec, with
    the T.81 F.16 mincode/maxcode/valptr decode arrays (O(code length)
    per symbol) and the inverse symbol->(code, length) map for encoding."""

    def __init__(self, bits: list[int], values: list[int]):
        if len(bits) != 16 or sum(bits) != len(values):
            raise DecodeError("malformed Huffman table spec")
        self.bits = list(bits)
        self.values = list(values)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        self.enc: dict[int, tuple[int, int]] = {}
        for ln in range(1, 17):
            self.valptr[ln] = k
            self.mincode[ln] = code
            for _ in range(bits[ln - 1]):
                self.enc[values[k]] = (code, ln)
                code += 1
                k += 1
            self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (byte stuffing
    already removed). unpackbits once, then every read is an index."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise DecodeError("truncated entropy-coded segment")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise DecodeError("truncated entropy-coded segment")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if table.bits[ln - 1] and code <= table.maxcode[ln]:
                return table.values[table.valptr[ln] + code - table.mincode[ln]]
        raise DecodeError("invalid Huffman code in scan data")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map a SIZE-bit magnitude to its signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            # pad the final byte with 1-bits (T.81 B.2.5 convention)
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        return bytes(self.out)


# ---------------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG/JFIF bytes -> (h, w, c) uint8 ndarray, c = 1
    (grayscale) or 3 (RGB via BT.601 YCbCr). Raises DecodeError on
    progressive/arithmetic/12-bit streams and malformed input."""
    b = bytes(data)
    if b[:2] != b"\xff\xd8":
        raise DecodeError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos < len(b):
        if b[pos] != 0xFF:
            raise DecodeError(f"expected marker at offset {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(b):
            raise DecodeError("truncated segment header")
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT, possibly several tables
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                elif pq == 1:
                    tbl = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    raise DecodeError(f"bad DQT precision {pq}")
                qtables[tq] = tbl  # zigzag order, as stored
        elif marker == 0xC4:  # DHT, possibly several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise DecodeError(f"unsupported sample precision {prec}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise DecodeError(
                f"unsupported JPEG mode SOF{marker - 0xC0} (only baseline "
                "sequential is implemented — swap in libjpeg/PIL)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise DecodeError("SOS before SOF")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cs, tdta = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            segments, _end = _split_entropy(b, pos + seglen)
            return _decode_scan(
                frame, scan, qtables, htables, segments, restart_interval
            )
        # APPn / COM / anything else: skip
        pos += seglen
    raise DecodeError("no scan data found (missing SOS)")


def _split_entropy(b: bytes, start: int) -> tuple[list[bytes], int]:
    """Collect entropy-coded bytes from `start`, removing 0xFF00 stuffing
    and splitting at RST markers (each split decodes with fresh DC
    predictors). Returns (segments, offset of terminating marker)."""
    segments: list[bytearray] = [bytearray()]
    i = start
    n = len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            segments[-1].append(c)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = b[i + 1]
        if m == 0x00:
            segments[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytearray())
            i += 2
        else:  # a real marker terminates the scan
            break
    return [bytes(s) for s in segments], i


def _decode_scan(frame, scan, qtables, htables, segments, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    interleaved = len(scan) > 1
    if interleaved:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        per_mcu = [(c, dc, ac, c["h"], c["v"]) for (c, dc, ac) in scan]
    else:
        # non-interleaved scan (T.81 A.2.2): the MCU is ONE block and the
        # traversal covers the component's OWN block grid, unpadded to
        # any MCU multiple
        c, dc, ac = scan[0]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        mcus_x = -(-cw // 8)
        mcus_y = -(-ch // 8)
        per_mcu = [(c, dc, ac, 1, 1)]

    # coefficient planes per scan component, in block units
    coefs = {}
    for (c, dc, ac, bh, bv) in per_mcu:
        coefs[c["id"]] = np.zeros(
            (mcus_y * bv, mcus_x * bh, 64), dtype=np.int64
        )

    mcu_index = 0
    total_mcus = mcus_x * mcus_y
    for seg_i, seg in enumerate(segments):
        if mcu_index >= total_mcus:
            break
        rd = _BitReader(seg)
        preds = {c["id"]: 0 for (c, *_rest) in per_mcu}
        end = total_mcus
        if restart_interval:
            end = min(total_mcus, mcu_index + restart_interval)
        while mcu_index < end:
            my, mx = divmod(mcu_index, mcus_x)
            for (c, dc_id, ac_id, bh, bv) in per_mcu:
                dc_t = htables.get((0, dc_id))
                ac_t = htables.get((1, ac_id))
                if dc_t is None or ac_t is None:
                    raise DecodeError("scan references undefined DHT table")
                for by in range(bv):
                    for bx in range(bh):
                        blk = _decode_block(rd, dc_t, ac_t, preds, c["id"])
                        coefs[c["id"]][my * bv + by, mx * bh + bx] = blk
            mcu_index += 1

    if mcu_index < total_mcus:
        raise DecodeError(
            f"scan ended after {mcu_index}/{total_mcus} MCUs"
        )

    # vectorized reconstruction per component
    planes = []
    for (c, *_rest) in per_mcu:
        q = qtables.get(c["tq"])
        if q is None:
            raise DecodeError("frame references undefined DQT table")
        zz = coefs[c["id"]].astype(np.float64) * q  # dequant in zigzag
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz  # de-zigzag
        rows, cols = nat.shape[:2]
        blocks = nat.reshape(rows, cols, 8, 8)
        # f = A^T F A over every block at once
        pix = np.einsum("ux,rcuv,vy->rcxy", _A, blocks, _A) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        if interleaved:
            cw = -(-w * c["h"] // hmax)
            ch = -(-h * c["v"] // vmax)
        else:
            ch, cw = plane.shape  # sole component, own grid
        plane = plane[:ch, :cw]
        # chroma upsample by replication, then crop to the frame
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    if len(planes) != 3:
        raise DecodeError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_block(rd, dc_t, ac_t, preds, cid) -> np.ndarray:
    blk = np.zeros(64, dtype=np.int64)
    size = rd.decode_huff(dc_t)
    diff = _extend(rd.read_bits(size), size)
    preds[cid] += diff
    blk[0] = preds[cid]
    k = 1
    while k < 64:
        rs = rd.decode_huff(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise DecodeError("AC run past end of block")
        blk[k] = _extend(rd.read_bits(s), s)
        k += 1
    return blk


# ---------------------------------------------------------------- encoder


def _to_blocks(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Edge-pad a (h, w) float plane to (rows*8, cols*8) and return
    (rows, cols, 8, 8) blocks."""
    h, w = plane.shape
    padded = np.pad(
        plane, ((0, rows * 8 - h), (0, cols * 8 - w)), mode="edge"
    )
    return (
        padded.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)
    )


def _quantize(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + zigzag + quantize: (rows, cols, 8, 8) float blocks
    (already level-shifted) -> (rows, cols, 64) int coefficients."""
    f = np.einsum("ux,rcxy,vy->rcuv", _A, blocks, _A)
    # stream order: zz[..., i] is the coefficient at natural index ZIGZAG[i]
    zz = f.reshape(*f.shape[:2], 64)[:, :, ZIGZAG]
    return np.rint(zz / q).astype(np.int64)


def _encode_block(wr, blk, pred, dc_t, ac_t) -> int:
    diff = int(blk[0]) - pred
    size = int(diff).bit_length() if diff else 0
    code, ln = dc_t.enc[size]
    wr.write(code, ln)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        wr.write(v, size)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t.enc[0xF0]  # ZRL
            wr.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_t.enc[(run << 4) | size]
        wr.write(code, ln)
        m = v if v > 0 else v + (1 << size) - 1
        wr.write(m, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_t.enc[0x00]  # EOB
        wr.write(code, ln)
    return int(blk[0])


def encode_jpeg(
    arr: np.ndarray,
    quant: int | np.ndarray = 1,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    quant_precision: int = 0,
) -> bytes:
    """Minimal baseline JFIF writer for test payloads. arr: uint8 (h, w)
    or (h, w, 1) -> single-component grayscale; (h, w, 3) -> YCbCr color
    with chroma subsampled by `subsample` = (horizontal, vertical) factor
    ((1,1)=4:4:4, (2,1)=4:2:2, (2,2)=4:2:0). quant: scalar or 64-entry
    zigzag-order table, applied to all components. quant_precision=1
    writes 16-bit DQT entries (decoder coverage). restart_interval>0
    emits DRI + RST markers every that many MCUs."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 input")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if np.isscalar(quant):
        q = np.full(64, int(quant), dtype=np.int64)
    else:
        q = np.asarray(quant, dtype=np.int64).reshape(64)
    if quant_precision == 0 and q.max() > 255:
        raise ValueError("8-bit DQT cannot hold entries > 255")

    sh, sv = subsample
    if nch == 1:
        comp_planes = [a[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
    else:
        rf = a[:, :, 0].astype(np.float64)
        gf = a[:, :, 1].astype(np.float64)
        bf = a[:, :, 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
        cr = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf
        if (sh, sv) != (1, 1):
            cb = _box_down(cb, sh, sv)
            cr = _box_down(cr, sh, sv)
        comp_planes = [y, cb, cr]
        samp = [(sh, sv), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized coefficient planes per component, MCU-padded block grids
    comp_coefs = []
    for plane, (ch_, cv_) in zip(comp_planes, samp):
        rows, cols = mcus_y * cv_, mcus_x * ch_
        blocks = _to_blocks(plane - 128.0, rows, cols)
        comp_coefs.append(_quantize(blocks, q))

    dc_lum = _HuffTable(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _HuffTable(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _HuffTable(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _HuffTable(_AC_CHR_BITS, _AC_CHR_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF header
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    # DQT (table 0, shared by all components)
    if quant_precision == 0:
        out += b"\xff\xdb" + struct.pack(">HB", 3 + 64, 0x00)
        out += bytes(int(v) for v in q)
    else:
        out += b"\xff\xdb" + struct.pack(">HB", 3 + 128, 0x10)
        out += b"".join(struct.pack(">H", int(v)) for v in q)
    # SOF0
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * len(comp_planes), 8, h, w, len(comp_planes)
    )
    for ci, (ch_, cv_) in enumerate(samp):
        out += struct.pack("BBB", ci + 1, (ch_ << 4) | cv_, 0)
    # DHT — luminance tables always; chrominance tables for color
    for tc, th, tbl in (
        [(0, 0, dc_lum), (1, 0, ac_lum)]
        + ([(0, 1, dc_chr), (1, 1, ac_chr)] if nch == 3 else [])
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(tbl.values), (tc << 4) | th
        )
        out += bytes(tbl.bits) + bytes(tbl.values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_planes),
                                     len(comp_planes))
    for ci in range(len(comp_planes)):
        t = 0x00 if ci == 0 else 0x11
        out += struct.pack("BB", ci + 1, t)
    out += struct.pack("BBB", 0, 63, 0)

    tables = [
        (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
        for ci in range(len(comp_planes))
    ]
    wr = _BitWriter()
    preds = [0] * len(comp_planes)
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                out += wr.flush()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                wr = _BitWriter()
                preds = [0] * len(comp_planes)
            for ci, ((ch_, cv_), coef) in enumerate(zip(samp, comp_coefs)):
                dt, at = tables[ci]
                for by in range(cv_):
                    for bx in range(ch_):
                        preds[ci] = _encode_block(
                            wr,
                            coef[my * cv_ + by, mx * ch_ + bx],
                            preds[ci],
                            dt,
                            at,
                        )
            mcu_index += 1
    out += wr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _box_down(plane: np.ndarray, sh: int, sv: int) -> np.ndarray:
    """Box-filter chroma downsample by (sh, sv), edge-padding odd sizes."""
    h, w = plane.shape
    ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
