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
