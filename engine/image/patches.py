"""Image patch extraction (SURVEY.md §2.C9, late r4) — the
vision-training primitive: split each decoded image into a G x G grid
of patches (ViT-style tokenization at the data-pipeline level), each
emitted as raw rgb8 bytes + integer pixel statistics.

Patch boundaries are integer quantiles of the image dims
(rows [gy*h//G, (gy+1)*h//G)), so patches tile the image EXACTLY —
Σ patch pixel sums = the image's pixel sum and patch dims sum back to
(h, w), both asserted in tests/test_codec.py.

Scale shape: ONE mapInPandas pass — decode, slice, and re-encode stay
inside the worker (pixels never ride a shuffle; only the bounded patch
bytes + int stats exit, G² rows per image).  All emitted values are
integers/bytes — deterministic across hosts (no float statistics), so
the driver key can be golden-pinned and hash-checked anywhere.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from engine.image.codec import decode, encode_rgb8

PATCH_SCHEMA = ("image_id string, gy int, gx int, ph int, pw int, "
                "pix_sum long, pix_min int, pix_max int, patch binary")


def extract_patches(images: DataFrame, grid: int = 4) -> DataFrame:
    """(image_id, bytes, w, h, fmt) -> G*G patch rows per image."""

    def _patches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "gy", "gx", "ph", "pw",
                                   "pix_sum", "pix_min", "pix_max", "patch")}
            for row in pdf.itertuples(index=False):
                pix = decode(row.bytes, int(row.w), int(row.h), row.fmt)
                h, w = pix.shape[0], pix.shape[1]
                for gy in range(grid):
                    y0, y1 = gy * h // grid, (gy + 1) * h // grid
                    for gx in range(grid):
                        x0, x1 = gx * w // grid, (gx + 1) * w // grid
                        p = pix[y0:y1, x0:x1]
                        out["image_id"].append(row.image_id)
                        out["gy"].append(gy)
                        out["gx"].append(gx)
                        out["ph"].append(y1 - y0)
                        out["pw"].append(x1 - x0)
                        out["pix_sum"].append(int(p.sum(dtype="int64")))
                        out["pix_min"].append(int(p.min()))
                        out["pix_max"].append(int(p.max()))
                        out["patch"].append(encode_rgb8(p))
            yield pd.DataFrame(out)

    return images.mapInPandas(_patches, schema=PATCH_SCHEMA)
