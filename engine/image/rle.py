"""Per-image run-length statistics (r4 cont.) — the compressibility
profile beside histogram (photometry) and sobel (texture): row-major
run-length encoding of the integer luminance I = r+g+b, reduced to the
exact counts a curation pipeline filters on.  Screenshots, renders and
flat synthetic images collapse to few long runs; natural images don't —
n_runs / n_pixels is the standard cheap "is this a photo" signal, and
it is EXACT integers (the float-entropy alternative is the cross-libm
tie class).

Emitted per image: n_runs (row-major, runs do NOT wrap across rows),
max_run, n_distinct_lum, rle_bytes = 2 * n_runs (the canonical
(value, length) pair cost at byte granularity, documented convention)
and n_pixels for the ratio.  All host/partitioning independent.

Scale shape: ONE mapInPandas pass — pixels decode and reduce to one
skinny stats row per image on the worker and never leave it (the
bytes-stay-on-worker contract shared by codec/moments/histogram/otsu).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def rle_np(pix: np.ndarray) -> tuple[int, int, int, int]:
    """Reference kernel: (h, w, 3) uint8 ->
    (n_pixels, n_runs, max_run, n_distinct_lum); row-major runs that
    do not wrap across row boundaries."""
    lum = pix.astype(np.int64).sum(axis=2)
    h, w = lum.shape
    n_pixels = h * w
    if n_pixels == 0:
        return 0, 0, 0, 0
    # run starts: first column of each row, or value change within row
    change = np.ones((h, w), dtype=bool)
    change[:, 1:] = lum[:, 1:] != lum[:, :-1]
    n_runs = int(change.sum())
    # run lengths via indices of starts over the row-major flattening
    # (rows are independent because each row starts a new run)
    starts = np.flatnonzero(change.ravel())
    ends = np.append(starts[1:], h * w)
    max_run = int((ends - starts).max())
    n_distinct = int(np.unique(lum).size)
    return n_pixels, n_runs, max_run, n_distinct


def image_rle(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> (image_id,
    n_pixels, n_runs, max_run, n_distinct_lum, rle_bytes).  Single
    Arrow-batched pass, no shuffle."""
    from engine.image.codec import decode

    def _rle(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "n_pixels": [], "n_runs": [],
                   "max_run": [], "n_distinct_lum": [], "rle_bytes": []}
            for r in pdf.itertuples(index=False):
                pix = decode(r.bytes, int(r.w), int(r.h), r.fmt)
                n_px, n_runs, max_run, n_dist = rle_np(pix)
                out["image_id"].append(r.image_id)
                out["n_pixels"].append(n_px)
                out["n_runs"].append(n_runs)
                out["max_run"].append(max_run)
                out["n_distinct_lum"].append(n_dist)
                out["rle_bytes"].append(2 * n_runs)
            yield pd.DataFrame(out)

    schema = ("image_id string, n_pixels long, n_runs long, "
              "max_run long, n_distinct_lum long, rle_bytes long")
    return images.mapInPandas(_rle, schema=schema)
