"""Compressed time-series tier: Gorilla-style XOR (values) + delta-of-delta
(timestamps), block-wise bit-packed, vectorized numpy end to end.

The reference stores cell files as float32 + zlib with time-chunk 1000
(reference era5/reshuffle.py:240-243). Here the analogous packed tier is a
per-(cell_id, conv_id) binary blob produced inside Arrow pandas UDFs (no
per-row Python, per BASELINE.json input_hint).

Codec design (a vectorizable variant of Facebook's Gorilla paper,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015):

  timestamps  epoch-us int64 -> delta -> delta-of-delta -> zigzag ->
              blocks of 128 packed at the block's max bit-width
              (DELTA_BINARY_PACKED-style; regular 6-hourly series pack to
              ~1 bit/point since dod == 0)
  values      float32 bits -> XOR with previous -> blocks of 128 packed at
              width (32 - min leading zeros - min trailing zeros) of the
              block's OR; all-zero XOR blocks cost 2 bytes total
              (constant/slow-moving series pack to ~0 bits/point)

Each block is byte-aligned so encode AND decode are pure numpy
(packbits/unpackbits + bitwise_xor.accumulate / cumsum) — no bit-cursor
loops over rows. NaNs round-trip bit-exactly (NaN payload preserved).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"GTS1"
BLOCK = 128


def _nbits(v: int) -> int:
    return int(v).bit_length()


def _pack_bits(vals: np.ndarray, w: int) -> bytes:
    """Pack uint64 values at fixed width w (MSB-first), byte-aligned."""
    if w == 0 or len(vals) == 0:
        return b""
    shifts = np.arange(w - 1, -1, -1, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_bits(buf: memoryview, n: int, w: int) -> np.ndarray:
    if w == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, np.uint8, count=(n * w + 7) // 8), count=n * w
    ).reshape(n, w).astype(np.uint64)
    shifts = np.arange(w - 1, -1, -1, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).view(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return ((u >> np.uint64(1)).view(np.int64)) ^ -(
        (u & np.uint64(1)).view(np.int64)
    )


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """int64 epoch-microseconds -> bytes."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = len(ts)
    out = bytearray(struct.pack("<I", n))
    if n == 0:
        return bytes(out)
    out += struct.pack("<q", int(ts[0]))
    if n == 1:
        return bytes(out)
    d = np.diff(ts)
    out += struct.pack("<q", int(d[0]))
    dod = _zigzag(np.diff(d))
    for i in range(0, len(dod), BLOCK):
        blk = dod[i : i + BLOCK]
        w = _nbits(int(blk.max())) if len(blk) else 0
        out += struct.pack("<B", w)
        out += _pack_bits(blk, w)
    return bytes(out)


def decode_timestamps(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    (n,) = struct.unpack_from("<I", mv, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    (t0,) = struct.unpack_from("<q", mv, 4)
    if n == 1:
        return np.array([t0], dtype=np.int64)
    (d0,) = struct.unpack_from("<q", mv, 12)
    pos = 20
    m = n - 2
    dod = np.empty(m, dtype=np.uint64)
    got = 0
    while got < m:
        cnt = min(BLOCK, m - got)
        w = mv[pos]
        pos += 1
        nbytes = (cnt * w + 7) // 8
        dod[got : got + cnt] = _unpack_bits(mv[pos : pos + nbytes], cnt, w)
        pos += nbytes
        got += cnt
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = d0
    if m:
        deltas[1:] = d0 + np.cumsum(_unzigzag(dod))
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1:] = t0 + np.cumsum(deltas)
    return out


def encode_values_f32(vals: np.ndarray) -> bytes:
    """float32 array (NaN ok) -> bytes via XOR-with-previous."""
    v = np.ascontiguousarray(vals, dtype=np.float32).view(np.uint32)
    n = len(v)
    out = bytearray(struct.pack("<I", n))
    if n == 0:
        return bytes(out)
    out += struct.pack("<I", int(v[0]))
    if n == 1:
        return bytes(out)
    xors = (v[1:] ^ v[:-1]).astype(np.uint64)
    for i in range(0, len(xors), BLOCK):
        blk = xors[i : i + BLOCK]
        orv = int(np.bitwise_or.reduce(blk))
        if orv == 0:
            out += struct.pack("<BB", 32, 0)  # lz=32 => all-identical block
            continue
        lz = 32 - _nbits(orv)
        tz = (orv & -orv).bit_length() - 1
        w = 32 - lz - tz
        out += struct.pack("<BB", lz, w)
        out += _pack_bits(blk >> np.uint64(tz), w)
    return bytes(out)


def decode_values_f32(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    (n,) = struct.unpack_from("<I", mv, 0)
    if n == 0:
        return np.empty(0, dtype=np.float32)
    (v0,) = struct.unpack_from("<I", mv, 4)
    if n == 1:
        return np.array([v0], dtype=np.uint32).view(np.float32)
    pos = 8
    m = n - 1
    xors = np.empty(m, dtype=np.uint64)
    got = 0
    while got < m:
        cnt = min(BLOCK, m - got)
        lz, w = mv[pos], mv[pos + 1]
        pos += 2
        if lz == 32:
            xors[got : got + cnt] = 0
        else:
            tz = 32 - lz - w
            nbytes = (cnt * w + 7) // 8
            xors[got : got + cnt] = (
                _unpack_bits(mv[pos : pos + nbytes], cnt, w) << np.uint64(tz)
            )
            pos += nbytes
        got += cnt
    bits = np.empty(n, dtype=np.uint32)
    bits[0] = v0
    bits[1:] = xors.astype(np.uint32)
    return np.bitwise_xor.accumulate(bits).view(np.float32)


# ---------------------------------------------------------------- Spark side

PACKED_SCHEMA_FMT = (
    "cell_id int, conv_id string, n long, start_ts timestamp, "
    "end_ts timestamp, ts_blob binary, {blobs}"
)


def packed_schema(value_cols: tuple[str, ...]):
    return PACKED_SCHEMA_FMT.format(
        blobs=", ".join(f"{c}_blob binary" for c in value_cols)
    )


def pack_cells(silver, value_cols: tuple[str, ...] = ("text_len", "tool_call")):
    """groupBy(cell_id, conv_id).applyInPandas pack — the OrthoMultiTs write
    analogue (one packed series per location per cell,
    reference docs/img2ts.rst:10-12). Rows arrive unsorted per group; we
    sort inside the UDF (cheap: one series) which also re-merges salted
    segments of a hot conv if the caller split them upstream."""
    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "turn_idx"] if "turn_idx" in pdf else ["ts"])
        ts_us = pdf["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        row = {
            "cell_id": pdf["cell_id"].iloc[0],
            "conv_id": pdf["conv_id"].iloc[0],
            "n": len(pdf),
            "start_ts": pdf["ts"].iloc[0],
            "end_ts": pdf["ts"].iloc[-1],
            "ts_blob": encode_timestamps(ts_us),
        }
        for c in value_cols:
            row[f"{c}_blob"] = encode_values_f32(
                pdf[c].to_numpy(dtype=np.float32)
            )
        return pd.DataFrame([row])

    return silver.groupBy("cell_id", "conv_id").applyInPandas(
        _pack, schema=packed_schema(value_cols)
    )


def pack_cells_stream(
    silver, value_cols: tuple[str, ...] = ("text_len", "tool_call")
):
    """Streaming pack over the reshuffle's OWN layout: silver is already
    range-partitioned by (cell_id, conv_id) and sorted by (cell_id,
    conv_id, ts, turn_idx), so the per-conv series are contiguous runs
    inside each partition. mapInPandas walks the Arrow batches, finds run
    boundaries with one numpy change-point scan, and encodes each run by
    array slicing — no shuffle, no sort, no per-group pandas frame. A run
    crossing a batch boundary is carried into the next batch; a run can
    NEVER cross a partition boundary (range partitioning on exactly these
    keys; the salted path re-clusters through pack_cells instead).

    Same output as pack_cells; exists because applyInPandas costs ~4ms of
    group overhead per (cell, conv) — ruinous at 1e9 conversations, while
    this path is bounded by encode throughput alone.
    """
    import pandas as pd

    schema = packed_schema(value_cols)

    def _runs(pdf: pd.DataFrame):
        cell = pdf["cell_id"].to_numpy()
        conv = pdf["conv_id"].to_numpy()
        change = np.flatnonzero((cell[1:] != cell[:-1]) | (conv[1:] != conv[:-1]))
        return np.concatenate(([0], change + 1, [len(pdf)]))

    def _encode_runs(pdf: pd.DataFrame, bounds, n_runs):
        # columns -> numpy ONCE per batch; runs are pure array slices
        ts_us = pdf["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        vals = {c: pdf[c].to_numpy(dtype=np.float32) for c in value_cols}
        cell = pdf["cell_id"].to_numpy()
        conv = pdf["conv_id"].to_numpy()
        ts = pdf["ts"]
        rows = []
        for i in range(n_runs):
            lo, hi = bounds[i], bounds[i + 1]
            row = {
                "cell_id": cell[lo],
                "conv_id": conv[lo],
                "n": hi - lo,
                "start_ts": ts.iat[lo],
                "end_ts": ts.iat[hi - 1],
                "ts_blob": encode_timestamps(ts_us[lo:hi]),
            }
            for c in value_cols:
                row[f"{c}_blob"] = encode_values_f32(vals[c][lo:hi])
            rows.append(row)
        return rows

    def _pack_stream(batches):
        carry = None
        last_key = None  # (cell_id, conv_id) of the last COMPLETED run
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            bounds = _runs(pdf)
            # Layout precondition guard: runs must arrive clustered —
            # each (cell_id, conv_id) exactly once per partition. A key
            # regression means the caller broke the contract (e.g. passed
            # a re-read/re-partitioned silver instead of the in-plan
            # reshuffle) and rows of one conv would silently fragment
            # into duplicate packed rows. Strictly-increasing keys catch
            # both regressions and repeats (ASCII keys: pandas/Java
            # string order agree).
            for i in range(len(bounds) - 2):
                key = (pdf["cell_id"].iat[bounds[i]], pdf["conv_id"].iat[bounds[i]])
                if last_key is not None and key <= last_key:
                    raise ValueError(
                        "pack_cells_stream: (cell_id, conv_id) run order "
                        f"regressed ({last_key} -> {key}); input must be "
                        "the reshuffle's own clustered+sorted output — "
                        "use pack_cells() for arbitrary layouts"
                    )
                last_key = key
            # last run may continue in the next batch -> carry it
            carry = pdf.iloc[bounds[-2]:].reset_index(drop=True)
            rows = _encode_runs(pdf, bounds, len(bounds) - 2)
            if rows:
                yield pd.DataFrame(rows)
        if carry is not None and len(carry):
            key = (carry["cell_id"].iat[0], carry["conv_id"].iat[0])
            if last_key is not None and key <= last_key:
                raise ValueError(
                    "pack_cells_stream: (cell_id, conv_id) run order "
                    f"regressed ({last_key} -> {key})"
                )
            yield pd.DataFrame(
                _encode_runs(carry, [0, len(carry)], 1)
            )

    return silver.mapInPandas(_pack_stream, schema=schema)


def unpack_cells(packed, value_cols: tuple[str, ...] = ("text_len", "tool_call")):
    """mapInPandas unpack: packed rows -> (cell_id, conv_id, ts, metrics...).
    UDTF-shaped (one row in, n rows out)."""
    import pandas as pd

    schema = "cell_id int, conv_id string, ts timestamp, " + ", ".join(
        f"{c} float" for c in value_cols
    )

    def _unpack(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # columns -> numpy ONCE per batch (no iterrows: each packed
            # row is a whole conversation, so per-row pandas overhead
            # would scale with conv count, not data size)
            cells = pdf["cell_id"].to_numpy()
            convs = pdf["conv_id"].to_numpy()
            ts_blobs = pdf["ts_blob"].to_numpy()
            val_blobs = {c: pdf[f"{c}_blob"].to_numpy() for c in value_cols}
            ts_parts = [decode_timestamps(b) for b in ts_blobs]
            lens = np.array([len(t) for t in ts_parts])
            d = {
                "cell_id": np.repeat(cells, lens).astype(np.int32),
                "conv_id": np.repeat(convs, lens),
                "ts": np.concatenate(ts_parts).astype("datetime64[us]")
                if ts_parts
                else np.empty(0, "datetime64[us]"),
            }
            for c in value_cols:
                d[c] = np.concatenate(
                    [decode_values_f32(b) for b in val_blobs[c]]
                )
            yield pd.DataFrame(d)

    return packed.mapInPandas(_unpack, schema=schema)
