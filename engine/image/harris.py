"""Per-image Harris corner response statistics (r5) — the corner /
interest-point descriptor beside sobel (edges), moments (geometry),
histogram (photometry) and phash (identity), computed EXACTLY in the
integer domain.

Classical Harris with two deliberate integer-exact choices:

- the structure tensor is accumulated over a 3x3 BOX window instead of
  a Gaussian (a float Gaussian would land the outputs in the
  cross-libm tie class; the box keeps every value int64), and
- the response R = det(M) - k * trace(M)^2 uses k = 1/16 carried
  16x-scaled:  r16 = 16 * (Sxx*Syy - Sxy^2) - (Sxx + Syy)^2
  (k = 0.0625, inside the usual 0.04-0.08 band; no division happens).

Gradients are the same separable 3x3 Sobel as engine/image/sobel.py
over integer luminance I = r+g+b, on interior pixels; the box window
shrinks the valid region once more, so responses live on the
(h-4) x (w-4) core.  Per image:

    n_window    = (h-4) * (w-4)
    max_r16     = max response          (corner peak strength)
    n_corner    = #{ r16 >= thresh }    (default 2^42 — ~4% of the
                                         windows on the synthetic
                                         corpus, measured)
    n_edge_like = #{ r16 < 0 }          (negative response = edge)

Overflow audit: |gx| <= 4*765 = 3060, gx^2 <= 9.4e6, box sum <= 8.5e7,
16*Sxx*Syy <= 1.2e17, trace^2 <= 2.9e16 — headroom >50x under int64.

Scale shape: ONE mapInPandas pass — pixels decode and reduce to four
int64s on the worker and never leave it (the bytes-stay-on-worker
contract shared with codec.decode_stats / moments / sobel).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from engine.image.codec import decode

DEFAULT_THRESH = 1 << 42


def harris_np(pix: np.ndarray, thresh: int = DEFAULT_THRESH) -> dict:
    """Reference kernel: (h, w, 3) uint8 -> the integer Harris stats.
    Images smaller than 5x5 have no valid window: all-zero stats."""
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < 5 or w < 5:
        return {"n_window": 0, "max_r16": 0, "n_corner": 0,
                "n_edge_like": 0}
    smooth_v = gray[:-2, :] + 2 * gray[1:-1, :] + gray[2:, :]
    gx = smooth_v[:, 2:] - smooth_v[:, :-2]
    smooth_h = gray[:, :-2] + 2 * gray[:, 1:-1] + gray[:, 2:]
    gy = smooth_h[2:, :] - smooth_h[:-2, :]

    def box(a: np.ndarray) -> np.ndarray:
        s = a[:-2, :] + a[1:-1, :] + a[2:, :]
        return s[:, :-2] + s[:, 1:-1] + s[:, 2:]

    sxx = box(gx * gx)
    syy = box(gy * gy)
    sxy = box(gx * gy)
    r16 = 16 * (sxx * syy - sxy * sxy) - (sxx + syy) * (sxx + syy)
    return {"n_window": (h - 4) * (w - 4), "max_r16": int(r16.max()),
            "n_corner": int((r16 >= thresh).sum()),
            "n_edge_like": int((r16 < 0).sum())}


def image_harris(images: DataFrame,
                 thresh: int = DEFAULT_THRESH) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> one row of integer
    Harris corner stats per image.  Single Arrow-batched pass, no
    shuffle."""

    def _har(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [], "n_window": [],
                   "max_r16": [], "n_corner": [], "n_edge_like": []}
            for r in pdf.itertuples(index=False):
                s = harris_np(decode(r.bytes, int(r.w), int(r.h), r.fmt),
                              thresh)
                out["image_id"].append(r.image_id)
                out["w"].append(int(r.w))
                out["h"].append(int(r.h))
                for c in ("n_window", "max_r16", "n_corner",
                          "n_edge_like"):
                    out[c].append(s[c])
            yield pd.DataFrame(out)

    schema = ("image_id string, w int, h int, n_window long, "
              "max_r16 long, n_corner long, n_edge_like long")
    return images.mapInPandas(_har, schema=schema)
