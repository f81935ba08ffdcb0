"""C-family (r4 cont.) — per-image connected-component (blob)
labeling: threshold the luminance plane, label the 4-connected
foreground components, report per-image blob statistics.  The raster
complement of the tile-level polygonize (engine/geo/polygonize.py):
same union-find machinery, applied inside one image instead of across
a tile grid.

Kernel: classic two-pass scanline union-find on run-lengths (runs of
consecutive foreground pixels per row union with overlapping runs of
the previous row) — O(pixels) with a tiny root table, no recursion.

Scale shape: one Arrow-batched mapInPandas over the image table —
pixels never leave the worker, no shuffle, rows out == rows in.  The
per-image output is exact integers, so the distributed pass is
bit-comparable to the brute flood-fill reference (pytest) and
golden-pinnable for the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_THRESH = 384  # luminance r+g+b in [0, 765]; ~mid-grey


def label_stats(pix: np.ndarray, thresh: int = DEFAULT_THRESH
                ) -> tuple[int, int, int]:
    """(n_blobs, max_blob, fg_pixels) of the 4-connected foreground
    (luminance >= thresh) — scanline union-find over row runs."""
    lum = pix.astype(np.int64).sum(axis=2)
    mask = lum >= thresh
    h, w = mask.shape
    parent: list[int] = []
    size: list[int] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]

    prev_runs: list[tuple[int, int, int]] = []  # (x0, x1, label)
    for y in range(h):
        row = mask[y]
        runs: list[tuple[int, int, int]] = []
        x = 0
        while x < w:
            if row[x]:
                x0 = x
                while x < w and row[x]:
                    x += 1
                lab = len(parent)
                parent.append(lab)
                size.append(x - x0)
                for (px0, px1, plab) in prev_runs:
                    if px0 < x and x0 < px1:  # 4-connected overlap
                        union(lab, plab)
                runs.append((x0, x, lab))
            else:
                x += 1
        prev_runs = runs

    # union-by-size folds run sizes into roots as it goes, so each
    # root's size[] entry is its component's total pixel count
    roots = {lab for lab in range(len(parent)) if find(lab) == lab}
    sizes = {r: size[r] for r in roots}
    n_fg = int(mask.sum())
    if not sizes:
        return 0, 0, 0
    return len(sizes), max(sizes.values()), n_fg


def label_stats_brute(pix: np.ndarray, thresh: int = DEFAULT_THRESH
                      ) -> tuple[int, int, int]:
    """Independent reference: BFS flood fill, pixel at a time."""
    lum = pix.astype(np.int64).sum(axis=2)
    mask = lum >= thresh
    h, w = mask.shape
    seen = np.zeros_like(mask)
    blobs = []
    for y in range(h):
        for x in range(w):
            if mask[y, x] and not seen[y, x]:
                stack, n = [(y, x)], 0
                seen[y, x] = True
                while stack:
                    cy, cx = stack.pop()
                    n += 1
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < h and 0 <= nx < w
                                and mask[ny, nx] and not seen[ny, nx]):
                            seen[ny, nx] = True
                            stack.append((ny, nx))
                blobs.append(n)
    return len(blobs), max(blobs, default=0), int(mask.sum())


def image_components(images: DataFrame,
                     thresh: int = DEFAULT_THRESH) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, ...) -> (image_id, n_blobs,
    max_blob, fg_pixels).  Single Arrow-batched pass, no shuffle."""
    from engine.image.codec import decode

    def _cc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pix = decode(r.bytes, int(r.w), int(r.h), r.fmt)
                nb, mx, fg = label_stats(pix, thresh)
                rows.append((r.image_id, nb, mx, fg))
            yield pd.DataFrame(
                rows, columns=["image_id", "n_blobs", "max_blob",
                               "fg_pixels"])

    return images.mapInPandas(
        _cc, "image_id string, n_blobs int, max_blob int, fg_pixels int")
