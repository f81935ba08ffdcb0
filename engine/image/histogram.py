"""Per-image luminance histogram (r4 cont.) — the photometric profile
descriptor beside moments (geometry) and phash (perceptual identity):
a 16-bin histogram of the integer luminance I = r+g+b in [0, 765]
(bin = min(I // 48, 15): 48-wide bins, the last absorbing 720..765),
plus the exact integer min/max luminance.  All-integer outputs keep the
key in the host/partitioning-independent class like img_moments.

Long-form output (one row per occupied bin) rather than 16 wide
columns: relational consumers (per-bin joins, histogram distance via
groupBy) compose better, and empty bins carry no rows at any scale.

Scale shape: ONE mapInPandas pass — pixels are decoded and reduced to
<= 16 skinny rows per image on the worker and never leave it (the same
bytes-stay-on-worker contract as codec.decode_stats / moments /
patches).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

N_BINS = 16
BIN_W = 48  # 766 luminance values / 16 bins, last bin 720..765


def histogram_np(pix: np.ndarray) -> np.ndarray:
    """Reference kernel: (h, w, 3) uint8 -> int64[16] bin counts."""
    lum = pix.astype(np.int64).sum(axis=2)
    bins = np.minimum(lum // BIN_W, N_BINS - 1)
    return np.bincount(bins.ravel(), minlength=N_BINS).astype(np.int64)


def image_histograms(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> (image_id, bin,
    n_pixels, lum_min, lum_max), one row per OCCUPIED bin.  Single
    Arrow-batched pass, no shuffle."""
    from engine.image.codec import decode

    def _hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bin": [], "n_pixels": [],
                   "lum_min": [], "lum_max": []}
            for r in pdf.itertuples(index=False):
                pix = decode(r.bytes, int(r.w), int(r.h), r.fmt)
                lum = pix.astype(np.int64).sum(axis=2)
                counts = histogram_np(pix)
                lo, hi = int(lum.min()), int(lum.max())
                for b in np.flatnonzero(counts):
                    out["image_id"].append(r.image_id)
                    out["bin"].append(int(b))
                    out["n_pixels"].append(int(counts[b]))
                    out["lum_min"].append(lo)
                    out["lum_max"].append(hi)
            yield pd.DataFrame(out)

    schema = ("image_id string, bin int, n_pixels long, "
              "lum_min int, lum_max int")
    return images.mapInPandas(_hist, schema=schema)


def percentiles_np(pix: np.ndarray, ps=(25, 50, 90)) -> list[int]:
    """Reference kernel: exact order statistics of the luminance
    multiset — value at 1-based rank ceil(p*n/100) of the sorted
    pixel luminances (the DISCRETE percentile, never interpolated)."""
    lum = np.sort(pix.astype(np.int64).sum(axis=2).ravel())
    n = lum.size
    return [int(lum[max(0, -(-p * n // 100) - 1)]) for p in ps]


def image_percentiles(images: DataFrame, ps=(25, 50, 90)) -> DataFrame:
    """Per-image EXACT luminance percentiles (C-ip, r5 post-window) ->
    (image_id, n_pixels, p25, p50, p90): the value at 1-based rank
    ceil(p*n/100) of the sorted luminance multiset — the discrete
    order statistic, an integer in [0, 765], never an interpolation
    (np.percentile's linear blend would be float and engine-version
    fragile; the rank definition is the contract).  The robust
    exposure descriptors beside the 16-bin histogram's shape profile.

    Scale shape: ONE mapInPandas pass, <= 1 skinny row per image,
    pixels never leave the worker (the codec family contract)."""
    from engine.image.codec import decode

    cols = [f"p{p}" for p in ps]

    def _pct(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "n_pixels": []}
            for c in cols:
                out[c] = []
            for r in pdf.itertuples(index=False):
                pix = decode(r.bytes, int(r.w), int(r.h), r.fmt)
                vals = percentiles_np(pix, ps)
                out["image_id"].append(r.image_id)
                out["n_pixels"].append(int(pix.shape[0] * pix.shape[1]))
                for c, v in zip(cols, vals):
                    out[c].append(v)
            yield pd.DataFrame(out)

    schema = ("image_id string, n_pixels long, "
              + ", ".join(f"{c} long" for c in cols))
    return images.mapInPandas(_pct, schema=schema)
