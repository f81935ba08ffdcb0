"""Per-image template matching by integer SSD (r5) — the
texture/periodicity descriptor beside harris (corners) and rle
(structure): the 8x8 luminance patch anchored at the image CENTER is
searched at every valid offset, exactly, in the integer domain.

Self-template matching is the degenerate-free form (the template is
always present, so min SSD == 0 by construction — asserted, not
assumed): what the operator measures is WHERE the first exact match
lands and HOW MANY exact matches exist.

    first_u, first_v : lexicographically first zero-SSD offset —
                       (cv, cu) iff the center patch is globally
                       unique-before-center; an earlier hit means the
                       patch recurs (periodic texture, tiling)
    n_exact          : #{ offsets with SSD == 0 } (>= 1; the
                       periodicity count)
    second_ssd       : min SSD over offsets that do NOT overlap the
                       center anchor (Chebyshev offset distance >= T)
                       — the SIFT-style distinctiveness margin, 0 iff
                       the patch recurs disjointly

SSD is on integer luminance I = r+g+b: ssd(u,v) = sum over the T x T
window of (I[v+i, u+j] - tmpl[i, j])^2.  Overflow audit: per-cell
diff^2 <= 765^2, T^2 = 64 cells -> ssd <= 3.75e7; int64 throughout.

Scale shape: ONE mapInPandas pass — decode, the 64-shift vectorized
SSD accumulation (numpy adds over the T^2 template cells, never a
Python loop over positions), and the argmin reduce all stay on the
worker; five int64s per image exit.  Images smaller than T x T yield
the all-zero row with n_exact = 0.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from engine.image.codec import decode

T = 8


def template_ssd_np(pix: np.ndarray) -> dict:
    """Reference kernel: (h, w, 3) uint8 -> the integer match stats."""
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < T or w < T:
        return {"first_u": -1, "first_v": -1, "n_exact": 0,
                "second_ssd": -1}
    cv, cu = (h - T) // 2, (w - T) // 2
    tmpl = gray[cv:cv + T, cu:cu + T]
    nh, nw = h - T + 1, w - T + 1
    ssd = np.zeros((nh, nw), dtype=np.int64)
    for i in range(T):
        for j in range(T):
            d = gray[i:i + nh, j:j + nw] - tmpl[i, j]
            ssd += d * d
    zv, zu = np.nonzero(ssd == 0)
    first_v, first_u = int(zv[0]), int(zu[0])
    dv = np.abs(np.arange(nh) - cv)[:, None]
    du = np.abs(np.arange(nw) - cu)[None, :]
    far = np.maximum(dv, du) >= T
    second = int(ssd[far].min()) if far.any() else -1
    return {"first_u": first_u, "first_v": first_v,
            "n_exact": int(len(zv)), "second_ssd": second}


def image_template_ssd(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> one row of integer
    self-template match stats per image.  Single Arrow-batched pass,
    no shuffle."""

    def _tpl(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [], "first_u": [],
                   "first_v": [], "n_exact": [], "second_ssd": []}
            for r in pdf.itertuples(index=False):
                s = template_ssd_np(
                    decode(r.bytes, int(r.w), int(r.h), r.fmt))
                out["image_id"].append(r.image_id)
                out["w"].append(int(r.w))
                out["h"].append(int(r.h))
                for c in ("first_u", "first_v", "n_exact", "second_ssd"):
                    out[c].append(s[c])
            yield pd.DataFrame(out)

    schema = ("image_id string, w int, h int, first_u long, "
              "first_v long, n_exact long, second_ssd long")
    return images.mapInPandas(_tpl, schema=schema)
