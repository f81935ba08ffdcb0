"""C6/B4 — 64-bit DCT perceptual hash + Hamming prefilter
(SURVEY.md §2.C6/B4; BASELINE.json:15 `phash:int64`).

Classic pHash recipe, deterministic and batched:
  gray = luma(pixels) -> nearest-neighbor sample to 32x32 -> 2D DCT-II
  -> top-left 8x8 coefficient block -> bit i = coeff_i > median(coeffs)
  -> 64 bits packed MSB-first into a signed int64.

The candidate near-duplicate prefilter is *native* Spark
(`bit_count(phash XOR q) <= t`) — no UDF, stays in codegen, and the
xor/popcount pushes into a scan filter at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .codec import _dct_matrix

_D32 = _dct_matrix(32)
_LUMA = np.array([0.299, 0.587, 0.114])


def _gray32(pix: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (32, 32) float64 gray via NN sampling."""
    h, w, _ = pix.shape
    ys = (np.arange(32) * h // 32).astype(np.int64)
    xs = (np.arange(32) * w // 32).astype(np.int64)
    return pix[np.ix_(ys, xs)].astype(np.float64) @ _LUMA


def phash64(pix: np.ndarray) -> int:
    """Single-image hash (oracle form; batch via phash64_batch)."""
    return int(phash64_batch(_gray32(pix)[None, :, :])[0])


def phash64_batch(gray32: np.ndarray) -> np.ndarray:
    """(N, 32, 32) gray -> (N,) int64 hashes, fully vectorized."""
    dct = np.einsum("ij,njk,lk->nil", _D32, gray32, _D32)
    low = dct[:, :8, :8].reshape(-1, 64)
    med = np.median(low, axis=1, keepdims=True)
    bits = (low > med).astype(np.uint64)
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return (bits * weights[None, :]).sum(axis=1).astype(np.int64)


def phash_images(pix_list: list[np.ndarray]) -> np.ndarray:
    """Hash a batch of (possibly differently-sized) decoded images."""
    if not pix_list:
        return np.empty(0, np.int64)
    g = np.stack([_gray32(p) for p in pix_list])
    return phash64_batch(g)


def hamming_col(phash_col: Column | str, query_hash: int) -> Column:
    c = F.col(phash_col) if isinstance(phash_col, str) else phash_col
    return F.bit_count(c.bitwiseXOR(F.lit(int(query_hash))))


def phash_prefilter(df: DataFrame, query_hash: int, max_dist: int,
                    phash_col: str = "phash") -> DataFrame:
    """B4 — keep rows within Hamming distance `max_dist` of `query_hash`."""
    return df.filter(hamming_col(phash_col, query_hash) <= max_dist)


def phash_near_dups(df: DataFrame, *, id_col: str = "image_id",
                    phash_col: str = "phash", max_dist: int = 3,
                    bands: int = 4,
                    max_bucket: int | None = 4096) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: band the 64-bit
    phash into `bands` equal bit slices, bucket-join on any equal band,
    verify candidates with exact native bit_count(xor) <= `max_dist`.
    Output (id_a, id_b, dist), id_a < id_b.

    Recall is a pigeonhole THEOREM, not a probability (same argument as
    dedup_simhash): two hashes within Hamming distance d <= bands - 1
    differ in fewer bits than there are bands, so at least one
    64/bands-bit band is untouched and they collide in that band's
    bucket.  Default 4 bands of 16 bits guarantees every pair at
    dist <= 3.

    Scale shape: all-native (the hash already exists as a column — zero
    Python stages, unlike the text LSH which must first compute
    signatures); candidates come from a (band, bucket) hash equi-join,
    never an all-pairs comparison, and oversized buckets (mass-duplicated
    images: one phash value repeated m times would otherwise emit m^2
    rows from a single bucket) degrade to signature-cluster pairing via
    the same `_bucketed_pairs` guard the text dedups use — exact dups
    stay recoverable through their representative by transitivity.

    Banding uses arithmetic shiftright + 0xFFFF mask, so the sign bits
    of the int64 never leak between bands.
    """
    from engine.text.dedup import _bucketed_pairs

    assert 64 % bands == 0
    width = 64 // bands
    assert max_dist <= bands - 1, "pigeonhole guarantee needs dist < bands"
    mask = (1 << width) - 1
    banded = df.select(
        F.col(id_col), F.col(phash_col).alias("_ph"),
        F.explode(F.expr(
            f"transform(sequence(0, {bands - 1}), "
            f"b -> struct(b as band, shiftright({phash_col}, b * {width}) "
            f"& {mask}L as bucket))")).alias("bb"),
    ).select(id_col, "_ph", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    pairs = _bucketed_pairs(banded, id_col, "_ph", max_bucket,
                            extra_cols=("_ph",))
    return (pairs
            .withColumn("dist", F.bit_count(
                F.col("_ph_a").bitwiseXOR(F.col("_ph_b"))))
            .filter(F.col("dist") <= max_dist)
            .select("id_a", "id_b", "dist"))


def phash_rot_canonical(images: "DataFrame") -> "DataFrame":
    """C21 (r5 cont.) — rotation-canonical perceptual hash: the four
    rot90 orientations' 64-bit pHashes per image plus the CANONICAL
    hash (their minimum as unsigned 64-bit — a pure function of the
    orientation ORBIT, so an image and its rotations share one
    canonical value by construction).  The dedup front door for
    corpora where scans/photos arrive in mixed orientations — plain
    phash_near_dups misses a rotated duplicate (DCT signs move with
    the axes), the canonical hash catches it exactly.

    Note pHash is computed on the 32×32 resample of each ORIENTATION,
    and np.rot90 of the original commutes with the resample (both are
    axis-aligned), so hashing rotated decodes equals rotating first —
    the property pinned by test against engine/image/augment.py.

    Scale shape: ONE mapInPandas pass — decode once, four cheap
    orientation views of the same buffer, pixels never leave the
    worker (the image-family contract)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import DataFrame as _DF  # noqa: F401

    from engine.image.codec import decode

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "ph0": [], "ph90": [], "ph180": [],
                   "ph270": [], "ph_canonical": []}
            for r in pdf.itertuples(index=False):
                pix = decode(r.bytes, int(r.w), int(r.h), r.fmt)
                hs = []
                p = pix
                for _ in range(4):
                    hs.append(int(phash64(p)))
                    p = np.rot90(p, axes=(0, 1))
                canon = min(h & 0xFFFFFFFFFFFFFFFF for h in hs)
                out["image_id"].append(r.image_id)
                for k, h in zip(("ph0", "ph90", "ph180", "ph270"), hs):
                    # store as signed int64 (the phash column convention)
                    out[k].append(h - (1 << 64) if h >= (1 << 63) else h)
                out["ph_canonical"].append(
                    canon - (1 << 64) if canon >= (1 << 63) else canon)
            yield pd.DataFrame(out)

    schema = ("image_id string, ph0 long, ph90 long, ph180 long, "
              "ph270 long, ph_canonical long")
    return images.mapInPandas(_go, schema=schema)
