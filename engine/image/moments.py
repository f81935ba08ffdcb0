"""Per-image raw + central moments (late r4) — the classical shape
descriptors (centroid, orientation, spread) in EXACT integer
arithmetic: intensity I = r+g+b (integer gray, no /3 rounding),
m_pq = Σ_y Σ_x x^p y^q I(x,y) with x = column, y = row, and the
central second moments kept as the integer numerators

    mu20n = m00*m20 - m10^2        ( = μ20 · m00² )
    mu02n = m00*m02 - m01^2
    mu11n = m00*m11 - m10*m01

so translation invariance is exact (tests prove it as a theorem, not
approximately).  Overflow audit: I ≤ 765, dims ≤ 64 (engine/synth.py
SIZES) ⇒ m00 ≤ 3.2e6, m20 ≤ 1.3e10, m00·m20 ≤ 4e16 < 2^63.

Scale shape: one mapInPandas pass — pixels are decoded and reduced to
nine int64s on the worker and never leave it (the same
bytes-stay-on-worker contract as codec.decode_stats / patches).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from engine.image.codec import decode

MOMENT_COLS = ("m00", "m10", "m01", "m11", "m20", "m02",
               "mu20n", "mu02n", "mu11n")


def moments_np(pix: np.ndarray) -> dict:
    """Reference kernel: (h, w, 3) uint8 -> the nine integer moments."""
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    col = gray.sum(axis=0)          # Σ_y I(x, y) per x
    row = gray.sum(axis=1)          # Σ_x I(x, y) per y
    m00 = int(gray.sum())
    m10 = int((col * xs).sum())
    m01 = int((row * ys).sum())
    m20 = int((col * xs * xs).sum())
    m02 = int((row * ys * ys).sum())
    m11 = int(ys @ gray @ xs)
    return {
        "m00": m00, "m10": m10, "m01": m01, "m11": m11,
        "m20": m20, "m02": m02,
        "mu20n": m00 * m20 - m10 * m10,
        "mu02n": m00 * m02 - m01 * m01,
        "mu11n": m00 * m11 - m10 * m01,
    }


def image_moments(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> one row of integer
    moments per image.  Single Arrow-batched pass, no shuffle."""

    def _mom(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [],
                   **{c: [] for c in MOMENT_COLS}}
            for r in pdf.itertuples(index=False):
                m = moments_np(decode(r.bytes, int(r.w), int(r.h), r.fmt))
                out["image_id"].append(r.image_id)
                out["w"].append(int(r.w))
                out["h"].append(int(r.h))
                for c in MOMENT_COLS:
                    out[c].append(m[c])
            yield pd.DataFrame(out)

    schema = ("image_id string, w int, h int, "
              + ", ".join(f"{c} long" for c in MOMENT_COLS))
    return images.mapInPandas(_mom, schema=schema)
