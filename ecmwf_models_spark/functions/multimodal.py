"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata. The Spark-side schema, partitioning, UDF signatures
and Arrow batch shapes are real and tested; the actual media decoding is
STUBBED (no image/audio libs in this container) behind
`DecoderUnavailable` with a deterministic fake for tests.

Pattern: mapInPandas over batches of (id, kind, data:binary, meta:map) —
Arrow moves the binary payloads zero-copy; per-batch vectorized numpy does
the feature math. On a real cluster you swap `_decode_image_stub` for a
PIL/torchvision call; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


class DecoderUnavailable(NotImplementedError):
    pass


def _decode_image_stub(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: bytes -> (h, w, 3) uint8 derived from a
    hash expansion. REAL decode requires PIL/libjpeg — not in container."""
    if data is None:
        raise DecoderUnavailable("no payload")
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "little")
    rs = np.random.RandomState(seed % (2**32))
    return rs.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def gen_media(spark, n: int = 64, width: int = 16, height: int = 12) -> DataFrame:
    """Deterministic synthetic media table (binary payload = hash bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("data"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.col("id"), F.lit(8)) + 1).cast("int").alias("n_frames"),
    )


def image_features(media: DataFrame, resize_to: tuple[int, int] = (4, 4)) -> DataFrame:
    """Decode -> resize -> mean-pool features for image rows. Batch-shaped:
    one Arrow batch in, one out. Decode is necessarily per-image (a real
    libjpeg call is too), but ALL the feature math — nearest-neighbour
    resize, channel pooling, luminance — runs once per (width, height)
    group as a single stacked-ndarray operation, not per image."""
    rh, rw = resize_to
    out_schema = (
        "media_id long, feat array<float>, mean_lum float, "
        "out_h int, out_w int"
    )
    cols = ["media_id", "feat", "mean_lum", "out_h", "out_w"]

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            # pandas groupby silently drops NaN keys — a NULL width or
            # height would make the row vanish with no signal; fail loud
            # like the old per-row int() cast did
            bad = pdf["width"].isna() | pdf["height"].isna()
            if bad.any():
                raise ValueError(
                    "image_features: NULL width/height for media_id(s) "
                    f"{pdf.loc[bad, 'media_id'].tolist()[:5]}"
                )
            for (w, h), grp in pdf.groupby(["width", "height"], sort=False):
                w, h = int(w), int(h)
                imgs = np.stack(
                    [_decode_image_stub(bytes(d), w, h) for d in grp["data"]]
                )  # (n, h, w, 3) — one ndarray for the whole size-group
                yi = np.arange(rh) * h // rh
                xi = np.arange(rw) * w // rw
                small = imgs[:, yi[:, None], xi[None, :], :]  # (n,rh,rw,3)
                feats = (
                    small.mean(axis=3)
                    .reshape(len(grp), rh * rw)
                    .astype(np.float32)
                )
                yield pd.DataFrame(
                    {
                        "media_id": grp["media_id"].to_numpy(),
                        "feat": list(feats),
                        "mean_lum": imgs.mean(axis=(1, 2, 3)).astype(
                            np.float32
                        ),
                        "out_h": rh,
                        "out_w": rw,
                    },
                    columns=cols,
                )

    return media.mapInPandas(_proc, schema=out_schema)


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index.
    Pure built-ins (sequence + explode); the frame DECODE would plug into
    image_features."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_k)
                )
            ).alias("frame_idx"),
        )
    )


def audio_window_plumbing(media: DataFrame, win_ms: int = 25) -> DataFrame:
    """Audio windowing metadata (window count per clip from sample_rate) —
    the decode itself is stubbed."""
    return media.where(F.col("kind") == "audio").select(
        "media_id",
        "sample_rate",
        F.floor(
            F.col("sample_rate") * F.lit(win_ms) / F.lit(1000.0)
        ).cast("int").alias("samples_per_window"),
    )
