"""Pure-stdlib WAV/RIFF codec (struct + numpy): real audio decode with
zero native media libraries, so the multimodal pipeline's audio step is
genuinely executed — not stubbed — inside the Arrow-batched UDFs
(completing the set: functions/png.py, functions/jpeg.py, this).

Scope — decoder: RIFF/WAVE with PCM 8-bit unsigned, PCM 16-bit
little-endian, and IEEE float32 sample formats, any channel count,
unknown chunks (LIST, fact, cue, ...) skipped per the RIFF rules
(chunks are word-aligned: odd-sized payloads carry a pad byte).
Compressed formats (ADPCM, mu-law, MP3-in-RIFF) raise DecodeError
loudly — the cluster swap-in point is soundfile/librosa, and nothing
outside this module changes (same ndarray contract).

Decoded samples come back as float64 in the SIGNED 16-BIT VALUE SCALE
regardless of storage format (u8 is offset-and-scaled by 256, float32
is scaled by 32768) so downstream feature math is format-independent —
and integer-valued samples round-trip EXACTLY through every format
(u8: values divisible by 256; float32: |v| < 2^24, scaling by a power
of two is lossless), which is what lets gen_media's WAV payloads sit
under a value-exact SQL oracle (entry `audio_decode_features`).

Encoder exists to mint real test payloads, exactly like encode_png /
encode_jpeg.

WAV/RIFF is a public spec (Microsoft/IBM RIFF 1991, IETF draft-ema-vpim).
Reference parity note: the reference pipeline never decodes audio
(beyond-reference LLM-pipeline op, SURVEY.md §2 multimodal row).
"""

from __future__ import annotations

import struct

import numpy as np

from .png import DecodeError

_FMT_PCM = 1
_FMT_FLOAT = 3


def encode_wav(
    samples: np.ndarray,
    sample_rate: int = 16000,
    fmt: str = "pcm16",
) -> bytes:
    """(n,) or (n, ch) samples in the signed 16-bit value scale ->
    RIFF/WAVE bytes. fmt: "pcm16" (int16 LE), "pcm8" (unsigned 8-bit —
    values must be multiples of 256 to round-trip exactly), "float32"
    (IEEE float, stored as value/32768)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if fmt == "pcm16":
        tag, bits = _FMT_PCM, 16
        payload = a.astype("<i2").tobytes()
    elif fmt == "pcm8":
        tag, bits = _FMT_PCM, 8
        payload = ((a.astype(np.int64) // 256) + 128).astype(
            np.uint8
        ).tobytes()
    elif fmt == "float32":
        tag, bits = _FMT_FLOAT, 32
        payload = (a.astype(np.float64) / 32768.0).astype(
            "<f4"
        ).tobytes()
    else:
        raise ValueError(f"fmt {fmt}")
    block = ch * bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH", tag, ch, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((n, ch) float64 samples in the signed 16-bit
    value scale, sample_rate). Raises DecodeError on non-PCM/float
    formats and malformed input."""
    b = bytes(data)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise DecodeError("not a WAV (missing RIFF/WAVE header)")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise DecodeError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise DecodeError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            payload = body
        # any other chunk (LIST, fact, cue, ...) is skipped
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise DecodeError("missing fmt or data chunk")
    tag, ch, rate, _byterate, _block, bits = fmt
    if ch < 1:
        raise DecodeError("zero channels")
    if tag == _FMT_PCM and bits == 16:
        a = np.frombuffer(payload, dtype="<i2").astype(np.float64)
    elif tag == _FMT_PCM and bits == 8:
        a = (
            np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            - 128.0
        ) * 256.0
    elif tag == _FMT_FLOAT and bits == 32:
        a = np.frombuffer(payload, dtype="<f4").astype(np.float64) * 32768.0
    else:
        raise DecodeError(
            f"unsupported WAV format tag={tag} bits={bits} (only PCM "
            "8/16 and IEEE float32 — swap in soundfile/librosa)"
        )
    if len(a) % ch:
        raise DecodeError("data chunk not a whole number of frames")
    return a.reshape(-1, ch), int(rate)
