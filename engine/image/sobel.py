"""Per-image Sobel gradient statistics (r4 cont.) — the edge/texture
descriptor beside moments (geometry), histogram (photometry) and phash
(identity): the classical 3x3 Sobel kernels over integer luminance
I = r+g+b,

    Gx = [[-1,0,1],[-2,0,2],[-1,0,1]],   Gy = Gx^T

evaluated on INTERIOR pixels only (no padding convention to disagree
about), reduced per image to

    edge_energy = Σ (|gx| + |gy|)   (exact int64 — the L1 gradient sum)
    max_grad    = max (|gx| + |gy|)
    n_edge      = #{ |gx| + |gy| >= thresh }   (default 512)
    n_interior  = (w-2) * (h-2)

All-integer, so the outputs sit in the host/partitioning-independent
class (a float Gaussian-smoothed Sobel would land in the cross-libm
tie class).  Overflow audit: |gx| <= 4*765, per-pixel sum <= 6120,
energy <= 6120 * 62^2 ≈ 2.4e7 per image — trivially int64.

Scale shape: ONE mapInPandas pass — pixels decode and reduce to four
int64s on the worker and never leave it (the bytes-stay-on-worker
contract shared with codec.decode_stats / moments / histogram).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from engine.image.codec import decode

DEFAULT_THRESH = 512


def sobel_np(pix: np.ndarray, thresh: int = DEFAULT_THRESH) -> dict:
    """Reference kernel: (h, w, 3) uint8 -> the integer sobel stats.
    Images smaller than 3x3 have no interior: all-zero stats."""
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < 3 or w < 3:
        return {"edge_energy": 0, "max_grad": 0, "n_edge": 0,
                "n_interior": 0}
    # separable Sobel: Gx = [1,2,1]^T (rows) x [-1,0,1] (cols)
    smooth_v = gray[:-2, :] + 2 * gray[1:-1, :] + gray[2:, :]
    gx = smooth_v[:, 2:] - smooth_v[:, :-2]
    smooth_h = gray[:, :-2] + 2 * gray[:, 1:-1] + gray[:, 2:]
    gy = smooth_h[2:, :] - smooth_h[:-2, :]
    g = np.abs(gx) + np.abs(gy)
    return {"edge_energy": int(g.sum()), "max_grad": int(g.max()),
            "n_edge": int((g >= thresh).sum()),
            "n_interior": (h - 2) * (w - 2)}


def image_sobel(images: DataFrame,
                thresh: int = DEFAULT_THRESH) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> one row of integer
    Sobel stats per image.  Single Arrow-batched pass, no shuffle."""

    def _sob(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [], "edge_energy": [],
                   "max_grad": [], "n_edge": [], "n_interior": []}
            for r in pdf.itertuples(index=False):
                s = sobel_np(decode(r.bytes, int(r.w), int(r.h), r.fmt),
                             thresh)
                out["image_id"].append(r.image_id)
                out["w"].append(int(r.w))
                out["h"].append(int(r.h))
                for c in ("edge_energy", "max_grad", "n_edge",
                          "n_interior"):
                    out[c].append(s[c])
            yield pd.DataFrame(out)

    schema = ("image_id string, w int, h int, edge_energy long, "
              "max_grad long, n_edge long, n_interior long")
    return images.mapInPandas(_sob, schema=schema)
