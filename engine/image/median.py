"""Per-image 3x3 median-filter statistics (r5 cont.) — the NON-LINEAR
smoothing classic (salt-and-pepper denoising) beside the linear Sobel/
Harris kernels: for every interior pixel the exact lower median (5th of
the 9 sorted neighborhood values — an ELEMENT of the neighborhood,
never an interpolated float) of integer luminance I = r+g+b, reduced
per image to

    sum_med    = Σ med          (exact int64)
    n_changed  = #{ med != center }
    max_absdiff= max |med - center|
    n_interior = (w-2) * (h-2)

Interior-only, the no-padding convention shared with sobel/harris.
All-integer -> host/partitioning-independent (the golden-oracle
class).  Overflow audit: med <= 765, sum <= 765 * 62^2 ≈ 2.9e6 per
image — trivially int64.

Scale shape: ONE mapInPandas pass — pixels decode, filter, and reduce
to four int64s on the worker and never ride a shuffle (the
bytes-stay-on-worker contract of the image family).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from engine.image.codec import decode


def median3_np(pix: np.ndarray) -> dict:
    """Reference kernel: (h, w, 3) uint8 -> exact 3x3-median stats.
    Images smaller than 3x3 have no interior: all-zero stats."""
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < 3 or w < 3:
        return {"sum_med": 0, "n_changed": 0, "max_absdiff": 0,
                "n_interior": 0}
    stack = np.stack([gray[dy:h - 2 + dy, dx:w - 2 + dx]
                      for dy in range(3) for dx in range(3)], axis=-1)
    med = np.sort(stack, axis=-1)[..., 4]
    center = gray[1:-1, 1:-1]
    diff = np.abs(med - center)
    return {"sum_med": int(med.sum()), "n_changed": int((diff > 0).sum()),
            "max_absdiff": int(diff.max()),
            "n_interior": (h - 2) * (w - 2)}


def image_median3(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> one row of integer
    median-filter stats per image.  Single Arrow-batched pass, no
    shuffle."""

    def _med(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [], "sum_med": [],
                   "n_changed": [], "max_absdiff": [], "n_interior": []}
            for r in pdf.itertuples(index=False):
                s = median3_np(decode(r.bytes, int(r.w), int(r.h), r.fmt))
                out["image_id"].append(r.image_id)
                out["w"].append(int(r.w))
                out["h"].append(int(r.h))
                for c in ("sum_med", "n_changed", "max_absdiff",
                          "n_interior"):
                    out[c].append(s[c])
            yield pd.DataFrame(out)

    schema = ("image_id string, w int, h int, sum_med long, "
              "n_changed long, max_absdiff long, n_interior long")
    return images.mapInPandas(_med, schema=schema)
