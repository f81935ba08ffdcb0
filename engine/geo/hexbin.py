"""Hexagonal binning index (C7c, r4) — the third index family beside
the Morton/S2-style quadtree (cells.py) and geohash (geohash.py),
completing the "H3/S2" reading of the north star with a genuinely
HEXAGONAL tessellation: every cell has six neighbors at (near-)equal
center distance — the property hex systems are chosen for (uniform
neighborhoods for density aggregation and smoothing), which no
quadtree/geohash rectangle gives.

Construction (exact, no trig, no external lib): hex centers are the
CENTERED-RECTANGULAR lattice — grid A at (2w·i, 2h·j), grid B offset by
(w, h) — over the same integer equirectangular quantization geohash
uses.  The planar Voronoi diagram of that lattice is a hexagonal
tessellation for any aspect (degenerating to rectangles only at h/w ->
0 or inf); with h/w = 1732/1000 ~ sqrt(3) the hexagons are regular to
within 0.05 %.  A point's cell is its nearest center, computed exactly:
the nearest candidate in each sub-grid is coordinate-wise rounding, and
the winner is the smaller INTEGER squared distance (ties -> grid A,
deterministic).  This is how hexbin aggregation is actually computed
(two offset grids + nearest-center test) — not an approximation of it.

Parity: the Spark operator, the DuckDB twin, and the numpy reference
all evaluate the SAME expression text / operations — integer adds,
one float64 division + floor per axis (IEEE-identical everywhere),
integer squared distances.  The cell id IS its center (hx, hy) in grid
units: neighbor lookups are the six fixed center offsets
(+-2w, 0), (+-w, +-h); parent/coarsening is re-binning at 2x the size
(hex lattices do not nest exactly — the same reason H3's aperture-7
hierarchy is approximate; re-binning is the exact form of that
operation).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# h/w ~ sqrt(3): regular hexagons to 0.05 %.  `size` scales both.
W_UNITS = 1000
H_UNITS = 1732
GRID_BITS = 20  # per-axis equirectangular quantization (geohash's trick)


def _quant_sql(lon_col: str, lat_col: str) -> tuple[str, str]:
    n = float(1 << GRID_BITS)
    hi = (1 << GRID_BITS) - 1
    gx = (f"greatest(least(CAST(floor((({lon_col}) + 180.0)/360.0 * {n!r}) "
          f"AS BIGINT), {hi}), 0)")
    gy = (f"greatest(least(CAST(floor((({lat_col}) + 90.0)/180.0 * {n!r}) "
          f"AS BIGINT), {hi}), 0)")
    return gx, gy


def hexbin_sql(lon_col: str, lat_col: str, size: int = 4) -> tuple[str, str]:
    """Dialect-neutral SQL text for the hex center (hx, hy) — runs
    unchanged in Spark SQL and DuckDB (same floor-div + integer-argmin
    everywhere).  `size` multiplies the base (W_UNITS, H_UNITS) pitch."""
    gx, gy = _quant_sql(lon_col, lat_col)
    return nearest_center_sql(gx, gy, size)


def nearest_center_sql(gx: str, gy: str, size: int) -> tuple[str, str]:
    """The integer argmin over the two offset lattices, on ALREADY-
    QUANTIZED grid coordinates (>= 0) — the piece hex ROLLUP reuses:
    re-binning fine hex centers at a coarser pitch is this same
    expression applied to (hx, hy) instead of to point coords."""
    w, h = W_UNITS * size, H_UNITS * size
    # nearest center in grid A (coordinate-wise rounding; operands >= 0)
    ax = f"(CAST(floor((({gx}) + {w}) / {2.0 * w!r}) AS BIGINT) * {2 * w})"
    ay = f"(CAST(floor((({gy}) + {h}) / {2.0 * h!r}) AS BIGINT) * {2 * h})"
    # nearest center in grid B (offset by (w, h))
    bx = f"(CAST(floor(({gx}) / {2.0 * w!r}) AS BIGINT) * {2 * w} + {w})"
    by = f"(CAST(floor(({gy}) / {2.0 * h!r}) AS BIGINT) * {2 * h} + {h})"
    da = (f"((({gx}) - {ax}) * (({gx}) - {ax}) "
          f"+ (({gy}) - {ay}) * (({gy}) - {ay}))")
    db = (f"((({gx}) - {bx}) * (({gx}) - {bx}) "
          f"+ (({gy}) - {by}) * (({gy}) - {by}))")
    hx = f"(CASE WHEN {da} <= {db} THEN {ax} ELSE {bx} END)"
    hy = f"(CASE WHEN {da} <= {db} THEN {ay} ELSE {by} END)"
    return hx, hy


# ------------------------------------------------------------ numpy kernel

def hexbin_np(lon: np.ndarray, lat: np.ndarray,
              size: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Reference kernel — float64 division + floor, identical to the
    SQL text operation-for-operation."""
    w, h = W_UNITS * size, H_UNITS * size
    n = float(1 << GRID_BITS)
    hi = np.int64((1 << GRID_BITS) - 1)
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, hi)
    gy = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, hi)
    ax = np.floor((gx + w) / float(2 * w)).astype(np.int64) * (2 * w)
    ay = np.floor((gy + h) / float(2 * h)).astype(np.int64) * (2 * h)
    bx = np.floor(gx / float(2 * w)).astype(np.int64) * (2 * w) + w
    by = np.floor(gy / float(2 * h)).astype(np.int64) * (2 * h) + h
    da = (gx - ax) ** 2 + (gy - ay) ** 2
    db = (gx - bx) ** 2 + (gy - by) ** 2
    a_wins = da <= db
    return np.where(a_wins, ax, bx), np.where(a_wins, ay, by)


# --------------------------------------------------------- spark operators

def hexbin_cols(lon_col: str = "lon", lat_col: str = "lat",
                size: int = 4) -> tuple[Column, Column]:
    """Native (hx, hy) columns — codegen integer argmin, zero Python."""
    hx, hy = hexbin_sql(lon_col, lat_col, size)
    return F.expr(hx), F.expr(hy)


def with_hexbin(df: DataFrame, size: int = 4, lon_col: str = "lon",
                lat_col: str = "lat") -> DataFrame:
    hx, hy = hexbin_cols(lon_col, lat_col, size)
    return df.withColumn("hx", hx).withColumn("hy", hy)


def hexbin_counts(df: DataFrame, size: int = 4, lon_col: str = "lon",
                  lat_col: str = "lat") -> DataFrame:
    """Per-hex point counts — ONE map-side-combined integer-key shuffle
    (the hex id is computed in the scan stage's codegen, so at 10^12
    rows this is the same shape as tile_assign: narrow columns in, one
    partial-agg exchange, skew bounded by the densest hex which salting
    or AQE handles like any hot tile)."""
    return (with_hexbin(df, size, lon_col, lat_col)
            .groupBy("hx", "hy").agg(F.count("*").alias("n")))


def hex_neighbors(size: int = 4) -> list[tuple[int, int]]:
    """The six fixed center offsets of the tessellation (ring-1)."""
    w, h = W_UNITS * size, H_UNITS * size
    return [(2 * w, 0), (-2 * w, 0), (w, h), (w, -h), (-w, h), (-w, -h)]


def hexbin_rollup(df: DataFrame, size: int = 8, coarse: int = 24,
                  lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Hex PYRAMID rollup (C7e) — the aperture-style coarsening
    H3 exposes as cellToParent: each fine hex (pitch `size`) is assigned
    to the coarse hex (pitch `coarse`) whose center is nearest to ITS
    center, then per-coarse-hex totals roll up from the already-
    aggregated fine rows.  Hex lattices do not nest exactly (the same
    reason H3's aperture-7 parent is approximate); nearest-center
    re-binning is the exact, deterministic form of that operation, and
    because it runs on the fine hexes' INTEGER centers it stays in the
    exact domain end to end.

    Scale shape: identical to tile_pyramid — the full table is touched
    once by the fine-hex hash agg (map-side combined); the rollup
    re-shuffles only fine-hex rows (bounded by the lattice, not the
    data).  Output: (HX, HY, n_fine, n_points) per coarse hex."""
    fine = hexbin_counts(df, size, lon_col, lat_col)
    cx, cy = nearest_center_sql("hx", "hy", coarse)
    return (fine.withColumn("HX", F.expr(cx)).withColumn("HY", F.expr(cy))
            .groupBy("HX", "HY")
            .agg(F.count("*").alias("n_fine"),
                 F.sum("n").alias("n_points")))
