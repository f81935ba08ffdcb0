"""Per-image gradient-orientation histogram (r5 cont.) — HOG-lite: the
descriptor HOG/SIFT pipelines build first, reduced to its exact-integer
core.  Sobel gradients (gx, gy) on interior pixels bin into 8 OCTANTS
of 45°, with the bin function a pure integer decision procedure (no
atan2, no floats — float angle binning is ULP-fragile exactly at the
octant boundaries |gx| == |gy|):

    octant k covers angle in [k*45°, (k+1)*45°), angle = atan2(gy, gx)
    measured CCW from +x.  The two exact horizontal-axis cases go
    first (gy == 0: bin 0 for gx > 0, bin 4 for gx < 0 — the case a
    naive rotation chain misclassifies at exactly 180°); otherwise two
    conditional exact rotations:
      gy < 0          -> rotate 180° (gx, gy) = (-gx, -gy), k += 4
      then gx <= 0    -> rotate -90° (gx, gy) = (gy, -gx), k += 2
      then k += 1 if gy >= gx   (the 45° boundary joins the UPPER bin)

Zero-gradient pixels (gx == gy == 0) are uncounted (n_zero reports
them).  Emits (image_id, w, h, n_zero, o0..o7) — all int64, the
golden-oracle class.

Scale shape: ONE mapInPandas pass, pixels never leave the worker (the
image-family contract).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from engine.image.codec import decode


def orient_hist_np(pix: np.ndarray) -> dict:
    """Reference kernel: (h, w, 3) uint8 -> octant histogram of Sobel
    gradients over interior pixels."""
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    out = {f"o{k}": 0 for k in range(8)}
    out["n_zero"] = 0
    if h < 3 or w < 3:
        return out
    sv = gray[:-2, :] + 2 * gray[1:-1, :] + gray[2:, :]
    gx = sv[:, 2:] - sv[:, :-2]
    sh = gray[:, :-2] + 2 * gray[:, 1:-1] + gray[:, 2:]
    gy = sh[2:, :] - sh[:-2, :]
    zero = (gx == 0) & (gy == 0)
    out["n_zero"] = int(zero.sum())
    k = np.zeros_like(gx)
    ax, ay = gx.copy(), gy.copy()
    neg = ay < 0
    ax = np.where(neg, -ax, ax)
    ay = np.where(neg, -ay, ay)
    k += np.where(neg, 4, 0)
    lft = ax <= 0
    ax2 = np.where(lft, ay, ax)
    ay2 = np.where(lft, -ax, ay)
    k += np.where(lft, 2, 0)
    k += (ay2 >= ax2).astype(np.int64)
    # exact horizontal axis: gy == 0 is bin 0 / bin 4 by sign of gx
    k = np.where((gy == 0) & (gx > 0), 0, k)
    k = np.where((gy == 0) & (gx < 0), 4, k)
    k = k[~zero]
    for b in range(8):
        out[f"o{b}"] = int((k == b).sum())
    return out


def image_orient_hist(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> one octant-histogram
    row per image.  Single Arrow-batched pass, no shuffle."""

    cols = ["n_zero"] + [f"o{b}" for b in range(8)]

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [],
                   **{c: [] for c in cols}}
            for r in pdf.itertuples(index=False):
                s = orient_hist_np(decode(r.bytes, int(r.w), int(r.h),
                                          r.fmt))
                out["image_id"].append(r.image_id)
                out["w"].append(int(r.w))
                out["h"].append(int(r.h))
                for c in cols:
                    out[c].append(s[c])
            yield pd.DataFrame(out)

    schema = ("image_id string, w int, h int, n_zero long, "
              + ", ".join(f"o{b} long" for b in range(8)))
    return images.mapInPandas(_go, schema=schema)
