"""Per-image Otsu threshold (r4 cont.) — the classical automatic
binarization beside histogram (photometry) and cc-labels (topology):
the luminance threshold t* maximizing the between-class variance

    sigma_B^2(t) = w0(t) * w1(t) * (mu0(t) - mu1(t))^2

over the EXACT 766-value luminance histogram (I = r+g+b in [0, 765];
class 0 = pixels with I <= t).  The argmax is evaluated with EXACT
integer arithmetic: sigma_B^2(t) is proportional to

    (s0*w1 - s1*w0)^2 / (w0*w1)

(s = class luminance sums, w = class counts), and candidate thresholds
are compared by cross-multiplied Python big-ints — no float enters the
decision, so the winner (ties to the SMALLEST t) is bit-stable across
hosts/partitionings, keeping the key in the golden-pinnable class.

Degenerate convention: a constant image has no valid split (one class
always empty); it emits t = its single luminance with the whole image
in class 0 (n_fg = 0).

Scale shape: ONE mapInPandas pass — pixels are decoded and reduced to
one skinny stats row per image on the worker and never leave it (the
bytes-stay-on-worker contract shared by codec/moments/histogram).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def otsu_np(pix: np.ndarray) -> tuple[int, int, int, int, int]:
    """Reference kernel: (h, w, 3) uint8 ->
    (otsu_t, n_bg, n_fg, sum_bg, sum_fg), all exact ints."""
    lum = pix.astype(np.int64).sum(axis=2).ravel()
    counts = np.bincount(lum, minlength=766).astype(np.int64)
    n = int(lum.size)
    s = int(lum.sum())
    # prefix counts/sums at each candidate t: class0 = I <= t
    cw = np.cumsum(counts)
    cs = np.cumsum(counts * np.arange(766, dtype=np.int64))
    best_t, best_num, best_den = None, -1, 1
    for t in range(766):
        w0, s0 = int(cw[t]), int(cs[t])
        w1, s1 = n - w0, s - s0
        if w0 == 0 or w1 == 0:
            continue
        num = (s0 * w1 - s1 * w0) ** 2  # Python big-int: exact
        den = w0 * w1
        # maximize num/den; tie -> smallest t (strict > keeps first)
        if num * best_den > best_num * den:
            best_t, best_num, best_den = t, num, den
    if best_t is None:  # constant image: no valid split
        t0 = int(lum[0]) if n else 0
        return t0, n, 0, s, 0
    w0 = int(cw[best_t])
    s0 = int(cs[best_t])
    return best_t, w0, n - w0, s0, s - s0


def image_otsu(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) ->
    (image_id, otsu_t, n_bg, n_fg, sum_bg, sum_fg).  Single
    Arrow-batched pass, no shuffle."""
    from engine.image.codec import decode

    def _otsu(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "otsu_t": [], "n_bg": [], "n_fg": [],
                   "sum_bg": [], "sum_fg": []}
            for r in pdf.itertuples(index=False):
                pix = decode(r.bytes, int(r.w), int(r.h), r.fmt)
                t, n_bg, n_fg, s_bg, s_fg = otsu_np(pix)
                out["image_id"].append(r.image_id)
                out["otsu_t"].append(t)
                out["n_bg"].append(n_bg)
                out["n_fg"].append(n_fg)
                out["sum_bg"].append(s_bg)
                out["sum_fg"].append(s_fg)
            yield pd.DataFrame(out)

    schema = ("image_id string, otsu_t int, n_bg long, n_fg long, "
              "sum_bg long, sum_fg long")
    return images.mapInPandas(_otsu, schema=schema)
