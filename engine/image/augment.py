"""Deterministic image augmentation (training-data op over the image
payload axis): geometric transforms — horizontal/vertical flip, 90°
rotation, center crop — applied to decoded pixels, with per-output
phash + exact pixel checksum so the transform itself is hash-checkable.

All transforms are pure array permutations / slices (no resampling, no
float arithmetic): bit-exact across platforms, and with the algebraic
invariants pytest asserts — hflip∘hflip = id, rot90⁴ = id, pixel sums
invariant under any permutation op (flips/rotation), crop dims exactly
(h//2, w//2).

Scale shape: ONE Arrow-batched `mapInPandas` stage; pixel payloads are
decoded, transformed and (optionally) re-encoded entirely on the
workers — the default output is metadata-only (image_id, op, w, h,
phash, pix_sum), so the shuffle-facing rows are skinny.  Augmenting k
ops per image multiplies rows k× inside the same task, never through a
shuffle.  `with_bytes=True` additionally returns rgb8 bytes for sink
stages that materialize the augmented corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from engine.image.codec import decode, encode_rgb8
from engine.image.phash import phash64

OPS = ("hflip", "vflip", "rot90", "crop_center")


def apply_op(pix: np.ndarray, op: str) -> np.ndarray:
    """Pure array transform; `pix` is (h, w, 3) uint8."""
    if op == "hflip":
        return pix[:, ::-1]
    if op == "vflip":
        return pix[::-1]
    if op == "rot90":                      # counter-clockwise
        return np.rot90(pix, axes=(0, 1))
    if op == "crop_center":
        h, w = pix.shape[:2]
        ch, cw = max(h // 2, 1), max(w // 2, 1)
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        return pix[y0:y0 + ch, x0:x0 + cw]
    raise ValueError(f"unknown augmentation op: {op!r}")


def _schema(with_bytes: bool) -> StructType:
    fields = [
        StructField("image_id", StringType(), False),
        StructField("op", StringType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("phash", LongType(), False),
        StructField("pix_sum", LongType(), False),
    ]
    if with_bytes:
        fields.append(StructField("bytes", BinaryType(), False))
    return StructType(fields)


def augment_images(images: DataFrame, ops: tuple[str, ...] = OPS,
                   with_bytes: bool = False) -> DataFrame:
    """images (image_id, bytes, w, h, fmt) -> one row per (image, op)
    with the transformed dims, phash, and exact uint8 pixel checksum."""
    for op in ops:
        apply_op(np.zeros((2, 2, 3), np.uint8), op)  # fail fast on typos

    cols = ["image_id", "op", "w", "h", "phash", "pix_sum"] + (
        ["bytes"] if with_bytes else [])

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for row in pdf.itertuples(index=False):
                pix = decode(row.bytes, int(row.w), int(row.h), row.fmt)
                for op in ops:
                    aug = np.ascontiguousarray(apply_op(pix, op))
                    out["image_id"].append(row.image_id)
                    out["op"].append(op)
                    out["h"].append(aug.shape[0])
                    out["w"].append(aug.shape[1])
                    out["phash"].append(phash64(aug))
                    out["pix_sum"].append(int(aug.astype(np.uint64).sum()))
                    if with_bytes:
                        out["bytes"].append(encode_rgb8(aug))
            yield pd.DataFrame(out, columns=cols)

    return images.select("image_id", "bytes", "w", "h", "fmt") \
                 .mapInPandas(_go, schema=_schema(with_bytes))
