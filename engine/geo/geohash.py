"""Geohash cell index (C7b) — the second hierarchical index system
alongside the Morton/S2-style cells (cells.py): standard geohash base32
strings, whose defining property is that the PREFIX hierarchy is plain
string truncation (`substring(gh, 1, p)`), so prefix joins, range scans
and partition pruning work on an ordinary string column.

Encoding is pure integer arithmetic end to end — an equirectangular
(linear, trig-free) lat/lon quantization followed by the same
magic-mask bit interleave as the Morton kernel, then a base32 table
lookup — so the Spark-native expression, the numpy reference kernel,
and the DuckDB twin agree bit-for-bit (floor of correctly-rounded IEEE
linear maps; no ln/tan anywhere, unlike the Web-Mercator grid).

Geohash bit layout (even precision p): 5p bits, alternating lon (MSB)
then lat — i.e. morton(x=lat_idx, y=lon_idx) with lon in the odd (high)
positions.  The whole encode is ONE native column expression: no
Python, stays inside whole-stage codegen, and the per-char base32
lookup unrolls to p `substring` calls on a constant alphabet.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.geo.cells import _SPREAD_MASKS, _part1by1

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _checked_precision(precision: int) -> int:
    if precision % 2 or not (2 <= precision <= 12):
        # odd precisions put 1 extra bit on lon; keeping p even keeps
        # the interleave a plain Morton pair (and 2..12 covers the
        # practical range: p=12 is 60 bits, the int64 budget)
        raise ValueError("precision must be even, in [2, 12]")
    return 5 * precision // 2


# ------------------------------------------------------------ numpy kernel

def geohash_int_np(lon: np.ndarray, lat: np.ndarray,
                   precision: int = 8) -> np.ndarray:
    """Reference kernel: the 5p-bit geohash integer (int64)."""
    bits = _checked_precision(precision)
    n = float(1 << bits)
    hi = np.int64((1 << bits) - 1)
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, hi)
    gy = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, hi)
    u = np.uint64
    return (_part1by1(gy.astype(u)) | (_part1by1(gx.astype(u)) << u(1))) \
        .astype(np.int64)


def geohash_np(lon: np.ndarray, lat: np.ndarray,
               precision: int = 8) -> list[str]:
    """Reference kernel: base32 geohash strings."""
    g = geohash_int_np(lon, lat, precision).astype(np.uint64)
    out = []
    for v in g:
        s = ""
        for i in range(precision):
            s += ALPHABET[int(v >> np.uint64(5 * (precision - 1 - i))) & 31]
        out.append(s)
    return out


def geohash_bbox(gh: str) -> tuple[float, float, float, float]:
    """Decode a geohash string to its (minlon, minlat, maxlon, maxlat)
    cell bounds (test/inspection helper)."""
    lon0, lon1, lat0, lat1 = -180.0, 180.0, -90.0, 90.0
    even = True
    for ch in gh:
        v = ALPHABET.index(ch)
        for b in (16, 8, 4, 2, 1):
            if even:
                mid = (lon0 + lon1) / 2
                lon0, lon1 = (mid, lon1) if v & b else (lon0, mid)
            else:
                mid = (lat0 + lat1) / 2
                lat0, lat1 = (mid, lat1) if v & b else (lat0, mid)
            even = not even
    return lon0, lat0, lon1, lat1


# ------------------------------------------------------------- shared SQL

def _spread_sql(e: str) -> str:
    """Dialect-NEUTRAL _part1by1 twin: bare integer literals (no Spark
    `L` suffix — both Spark and DuckDB type >int32 literals as BIGINT),
    so the one text runs in both engines."""
    for s, m in _SPREAD_MASKS:
        e = f"((({e}) | (({e}) << {s})) & {m})"
    return e


def geohash_int_sql(lon_col: str, lat_col: str, precision: int = 8) -> str:
    """SQL text for the 5p-bit geohash integer — runs unchanged in Spark
    SQL and DuckDB (integer shifts/masks + floor of linear maps)."""
    bits = _checked_precision(precision)
    n = float(1 << bits)
    hi = 1 << bits
    gx = (f"greatest(least(CAST(floor((({lon_col}) + 180.0)/360.0 * {n!r}) "
          f"AS BIGINT), {hi - 1}), 0)")
    gy = (f"greatest(least(CAST(floor((({lat_col}) + 90.0)/180.0 * {n!r}) "
          f"AS BIGINT), {hi - 1}), 0)")
    return f"({_spread_sql(gy)} | ({_spread_sql(gx)} << 1))"


def geohash_sql(lon_col: str, lat_col: str, precision: int = 8,
                int_expr: str | None = None) -> str:
    """SQL text for the base32 string: p unrolled constant-alphabet
    substring lookups over the geohash integer."""
    g = int_expr if int_expr is not None \
        else geohash_int_sql(lon_col, lat_col, precision)
    parts = [
        f"substring('{ALPHABET}', "
        f"CAST(((({g}) >> {5 * (precision - 1 - i)}) & 31) AS INT) + 1, 1)"
        for i in range(precision)]
    return "concat(" + ", ".join(parts) + ")"


# --------------------------------------------------------- spark operators

def geohash_col(lon_col: str = "lon", lat_col: str = "lat",
                precision: int = 8) -> Column:
    """Native geohash column — one codegen expression, zero Python."""
    return F.expr(geohash_sql(lon_col, lat_col, precision))


def with_geohash(df: DataFrame, precision: int = 8, lon_col: str = "lon",
                 lat_col: str = "lat", out: str = "gh") -> DataFrame:
    return df.withColumn(out, geohash_col(lon_col, lat_col, precision))


def geohash_prefix_col(gh_col: str, precision: int) -> Column:
    """Parent cell at a coarser precision = string truncation (the
    geohash analogue of cells.cell_parent_col's shiftright)."""
    return F.substring(F.col(gh_col), 1, precision)
