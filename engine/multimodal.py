"""Multimodal binary-column plumbing (task brief "multimodal columns"):
image / audio / video as opaque `binary` columns with typed metadata,
processed by Arrow-batched mapInPandas — schema, partitioning, UDF
signature and batch shape are real and tested; external codecs
(jpeg/mp3/h264) are STUBBED behind NotImplementedError since no media
libraries exist in this container (SURVEY.md §0b).

Self-contained deterministic formats (fully implemented):
- image  : engine.image.codec formats (rgb8 / png / jq)
- audio  : ``pcm16`` — header b"PCM1" + u32 sample_rate + i16 samples
- video  : ``rawvid`` — header b"RV01" + u16 w,h + u16 n_frames + rgb8
           frames back-to-back

Ops: decode->feature-extract (per-channel stats / RMS energy frames),
image resize (nearest-neighbor), video frame-sampling (explodes frames to
image rows).  Pixels/samples never leave the Python worker unless the op
*is* extraction (frame sampling re-encodes to rgb8 bytes).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from engine.image.codec import decode as decode_image
from engine.image.codec import encode_rgb8

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), False),   # image | audio | video
    StructField("fmt", StringType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("w", IntegerType(), True),
    StructField("h", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
])

SUPPORTED = {"image": {"rgb8", "png", "jq"}, "audio": {"pcm16"}, "video": {"rawvid"}}


# ------------------------------------------------------------- codecs

def encode_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    return b"PCM1" + struct.pack(">I", sample_rate) + samples.astype(">i2").tobytes()


def decode_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"PCM1":
        raise ValueError("not a PCM1 stream")
    (rate,) = struct.unpack(">I", data[4:8])
    return np.frombuffer(data[8:], ">i2").astype(np.int16), rate


def encode_rawvid(frames: np.ndarray) -> bytes:
    nf, h, w, _ = frames.shape
    return (b"RV01" + struct.pack(">HHH", w, h, nf)
            + frames.astype(np.uint8).tobytes())


def decode_rawvid(data: bytes) -> np.ndarray:
    if data[:4] != b"RV01":
        raise ValueError("not a RV01 stream")
    w, h, nf = struct.unpack(">HHH", data[4:10])
    return np.frombuffer(data[10:], np.uint8).reshape(nf, h, w, 3)


def _check_fmt(media_type: str, fmt: str) -> None:
    if fmt not in SUPPORTED.get(media_type, set()):
        raise NotImplementedError(
            f"codec for {media_type}/{fmt} requires an external library "
            f"not present in this environment; supported: {SUPPORTED}"
        )


# ------------------------------------------------------- feature extract

FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), False),
    StructField("feature", StringType(), False),
    StructField("values", ArrayType(DoubleType()), False),
])


def extract_features(media: DataFrame, rms_frame: int = 256) -> DataFrame:
    """Decode + per-type features: image -> channel means; audio -> per
    frame RMS energy; video -> per-frame mean intensity."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "media_type", "feature", "values")}
            for row in pdf.itertuples(index=False):
                _check_fmt(row.media_type, row.fmt)
                if row.media_type == "image":
                    pix = decode_image(row.bytes, int(row.w), int(row.h), row.fmt)
                    feat, vals = "channel_means", [
                        float(pix[:, :, c].mean()) for c in range(3)
                    ]
                elif row.media_type == "audio":
                    samples, _rate = decode_pcm16(row.bytes)
                    n = (len(samples) // rms_frame) * rms_frame
                    fr = samples[:n].astype(np.float64).reshape(-1, rms_frame)
                    feat, vals = "rms_energy", np.sqrt(
                        (fr ** 2).mean(axis=1)).tolist()
                else:
                    frames = decode_rawvid(row.bytes)
                    feat, vals = "frame_mean", frames.reshape(
                        frames.shape[0], -1).mean(axis=1).tolist()
                out["media_id"].append(row.media_id)
                out["media_type"].append(row.media_type)
                out["feature"].append(feat)
                out["values"].append(vals)
            yield pd.DataFrame(out)

    return media.mapInPandas(_go, schema=FEATURES_SCHEMA)


# ------------------------------------------------------------ transforms

RESIZED_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
    StructField("fmt", StringType(), False),
])


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize; output is rgb8 (deterministic)."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "bytes", "w", "h", "fmt")}
            for row in pdf.itertuples(index=False):
                pix = decode_image(row.bytes, int(row.w), int(row.h), row.fmt)
                ys = (np.arange(out_h) * pix.shape[0] // out_h)
                xs = (np.arange(out_w) * pix.shape[1] // out_w)
                res = pix[np.ix_(ys, xs)]
                out["media_id"].append(row.media_id if "media_id" in pdf.columns
                                       else row.image_id)
                out["bytes"].append(encode_rgb8(res))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append("rgb8")
            yield pd.DataFrame(out)

    src = images
    if "media_id" not in src.columns and "image_id" in src.columns:
        src = src.withColumnRenamed("image_id", "media_id")
    return src.select("media_id", "bytes", "w", "h", "fmt") \
        .mapInPandas(_go, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
    StructField("fmt", StringType(), False),
])


def sample_frames(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Explode every n-th video frame into an rgb8 image row."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "bytes", "w", "h", "fmt")}
            for row in pdf.itertuples(index=False):
                frames = decode_rawvid(row.bytes)
                for i in range(0, frames.shape[0], every_n):
                    out["media_id"].append(row.media_id)
                    out["frame_idx"].append(i)
                    out["bytes"].append(encode_rgb8(frames[i]))
                    out["w"].append(frames.shape[2])
                    out["h"].append(frames.shape[1])
                    out["fmt"].append("rgb8")
            yield pd.DataFrame(out)

    return videos.select("media_id", "bytes").mapInPandas(_go, schema=FRAME_SCHEMA)


# --------------------------------------------------------------- fixture

def gen_media_local(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic mixed-modality fixture table."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng([seed, i])
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            h, w = 16, 24
            pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows.append((f"m{i:06d}", kind, "rgb8", encode_rgb8(pix),
                         w, h, None, None))
        elif kind == "audio":
            samples = (rng.normal(0, 3000, 2048)).astype(np.int16)
            rows.append((f"m{i:06d}", kind, "pcm16",
                         encode_pcm16(samples, 16000), None, None, 16000, None))
        else:
            frames = rng.integers(0, 256, (6, 8, 8, 3), dtype=np.uint8)
            rows.append((f"m{i:06d}", kind, "rawvid", encode_rawvid(frames),
                         8, 8, None, 6))
    df = pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])
    # mixed int/None columns silently become float64 in pandas; Spark's
    # non-Arrow createDataFrame verifier then rejects 24.0 for an
    # IntegerType field (only surfaces under a session WITHOUT the
    # engine's Arrow conf — e.g. the driver's). Keep python ints + None.
    for c in ("w", "h", "sample_rate", "n_frames"):
        df[c] = pd.Series(
            [None if pd.isna(v) else int(v) for v in df[c]], dtype=object)
    return df
