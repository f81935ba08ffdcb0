"""Hierarchical S2-style cell index: vectorized Morton cells on the
Web-Mercator grid (SURVEY.md §2 C1/C2/C4; spec FIXTURES.md §3).

BASELINE.json:6 — rows are "encoded to H3/S2 cells via vectorized
pandas/Arrow UDFs (batched cell encode, no per-row Python)".  The encode
is a scalar pandas UDF over whole Arrow batches (numpy bit ops); parent /
prefix extraction is a *native* column expression (shiftright) so it stays
inside whole-stage codegen and never crosses the Python boundary.

Scale note: the cell id is a single int64 — prefix joins, range pruning
and partitioning all work on a primitive column, which is the cheapest
possible shuffle key at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from oracle.geo import LEVEL, MAX_LAT

_U = np.uint64  # numpy promotes uint64 op python-int to float64; pin dtype


# ------------------------------------------------------------ numpy kernel

def merc_xy_np(lon: np.ndarray, lat: np.ndarray, level: int = LEVEL):
    """Vectorized FIXTURES.md §3 grid coords. Returns (xi, yi) int64 arrays."""
    n = float(1 << level)
    lat = np.clip(lat, -MAX_LAT, MAX_LAT)
    mx = (lon + 180.0) / 360.0
    my = (1.0 - np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) / np.pi) / 2.0
    xi = np.floor(mx * n).astype(np.int64)
    yi = np.floor(my * n).astype(np.int64)
    hi = np.int64((1 << level) - 1)
    return np.clip(xi, 0, hi), np.clip(yi, 0, hi)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread 32-bit values so bits land in even positions (uint64)."""
    v = v.astype(_U)
    v = (v | (v << _U(16))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v << _U(8))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _U(2))) & _U(0x3333333333333333)
    v = (v | (v << _U(1))) & _U(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather even-position bits back together."""
    v = v.astype(_U) & _U(0x5555555555555555)
    v = (v | (v >> _U(1))) & _U(0x3333333333333333)
    v = (v | (v >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> _U(4))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v >> _U(8))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v >> _U(16))) & _U(0x00000000FFFFFFFF)
    return v


def morton_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave (x even bits, y odd bits) -> int64 Morton ids."""
    return (_part1by1(x) | (_part1by1(y) << _U(1))).astype(np.int64)


def demorton_np(cell: np.ndarray):
    """Morton ids -> (x, y) int64 arrays."""
    c = cell.astype(_U)
    return (
        _compact1by1(c).astype(np.int64),
        _compact1by1(c >> _U(1)).astype(np.int64),
    )


def cell_encode_np(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    xi, yi = merc_xy_np(lon, lat, LEVEL)
    return morton_np(xi, yi)


# --------------------------------------------------------- spark operators

@F.pandas_udf(LongType())
def cell_encode_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
    """C1 — batched level-30 cell encode (Arrow in, Arrow out)."""
    return pd.Series(cell_encode_np(lon.to_numpy(np.float64), lat.to_numpy(np.float64)))


def with_cell(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
              out: str = "cell") -> DataFrame:
    """Attach the level-30 cell id column."""
    return df.withColumn(out, cell_encode_udf(F.col(lat_col), F.col(lon_col)))


def cell_parent_col(cell: Column | str, level: int) -> Column:
    """C2 — native prefix extraction; no UDF, stays in codegen."""
    c = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftright(c, 2 * (LEVEL - level))


def with_cell_prefix(df: DataFrame, level: int, cell_col: str = "cell",
                     out: str | None = None) -> DataFrame:
    return df.withColumn(out or f"cell_p{level}", cell_parent_col(cell_col, level))


def ring_cells_np(x: int, y: int, z: int, k: int) -> np.ndarray:
    """Vectorized ring k (exact Chebyshev distance) around (x, y) at level z."""
    n = 1 << z
    if k == 0:
        if 0 <= y < n:
            return morton_np(np.array([x], np.int64), np.array([y], np.int64))
        return np.empty(0, np.int64)
    d = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    mask = np.maximum(np.abs(dx), np.abs(dy)) == k
    nx = (x + dx[mask]) % n
    ny = y + dy[mask]
    keep = (ny >= 0) & (ny < n)
    return np.unique(morton_np(nx[keep], ny[keep]))


def disk_cells_np(x: int, y: int, z: int, k: int) -> np.ndarray:
    """Union of rings 0..k (kNN candidate block)."""
    n = 1 << z
    d = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    nx = (x + dx.ravel()) % n
    ny = y + dy.ravel()
    keep = (ny >= 0) & (ny < n)
    return np.unique(morton_np(nx[keep], ny[keep]))


def make_disk_udf(level: int, k: int):
    """C4 — pandas UDF: level-`level` cell id -> array of disk-k neighbor
    cell ids (explode downstream to build kNN candidates)."""

    @F.pandas_udf(ArrayType(LongType()))
    def disk_udf(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy(np.int64)
        x, y = demorton_np(c)
        return pd.Series(
            [disk_cells_np(int(xv), int(yv), level, k) for xv, yv in zip(x, y)]
        )

    return disk_udf
