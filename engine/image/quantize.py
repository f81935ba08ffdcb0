"""Per-image color quantization (r4 cont.) — the color-distribution
descriptor beside luminance histograms (C11): each pixel mapped to the
fixed 64-color RGB cube (4 levels per channel, level = c DIV 64,
color_idx = 16*r4 + 4*g4 + b4), reduced per image to long-form palette
counts plus a deterministic dominant-color flag (rank 1 by
(n_pixels DESC, color_idx ASC) — explicit tie rule, cross-engine
stable).

A FIXED palette is deliberate: adaptive palettes (median-cut, k-means)
depend on float centroid iteration order; the fixed cube keeps every
output an exact integer — the host/partitioning-independent class all
image keys live in — while still giving the dedup/search-adjacent
color fingerprint (palette-count vectors compare with L1/cosine
downstream).

Scale shape: ONE mapInPandas pass (<= 64 skinny rows per image exit
the worker; pixels never do) + one tiny per-image window for the
dominant flag.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.image.codec import decode

N_LEVELS = 4
LEVEL_W = 256 // N_LEVELS


def quantize_np(pix: np.ndarray) -> dict:
    """Reference kernel: (h, w, 3) uint8 -> {color_idx: n_pixels}."""
    q = pix.astype(np.int64) // LEVEL_W
    idx = q[..., 0] * N_LEVELS * N_LEVELS + q[..., 1] * N_LEVELS + q[..., 2]
    vals, cnts = np.unique(idx.ravel(), return_counts=True)
    return {int(v): int(c) for v, c in zip(vals, cnts)}


def image_palette(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> (image_id, color_idx,
    n_pixels, is_dominant), one row per OCCUPIED palette color."""

    def _pal(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, cnts = [], [], []
            for r in pdf.itertuples(index=False):
                for v, c in quantize_np(
                        decode(r.bytes, int(r.w), int(r.h), r.fmt)).items():
                    ids.append(r.image_id)
                    idxs.append(v)
                    cnts.append(c)
            yield pd.DataFrame({"image_id": ids, "color_idx": idxs,
                                "n_pixels": cnts})

    counts = images.mapInPandas(
        _pal, schema="image_id string, color_idx int, n_pixels long")
    w = Window.partitionBy("image_id").orderBy(
        F.desc("n_pixels"), F.asc("color_idx"))
    return (counts
            .withColumn("is_dominant",
                        (F.row_number().over(w) == 1).cast("int")))
