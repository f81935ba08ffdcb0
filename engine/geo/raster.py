"""Raster <-> vector bridge (north_star: "raster<->vector tiling assigns
each decoded image to slippy-map/H3 tiles"): per-tile occupancy rasters.

Vector points -> tile + in-tile pixel assignment stays NATIVE (bit
arithmetic on the level-30 mercator grid ints — codegen, no Python);
only the raster construction itself is a grouped-map (K4): each tile
group's points become a (grid x grid) uint32 count raster via one
vectorized `np.add.at`, and the emitted row carries the raster's scalar
signature (n_points / nnz / max / index-weighted sums) so a DuckDB twin
can hash-check it without shipping the array.

Scale shape: one shuffle on the tile key (map-side pre-aggregation of
(tile, pixel) counts happens for free when `pre_agg=True` — the
grouped-map then rasters counted pixels, not raw points, so a hot tile
costs at most grid^2 rows in the shuffle instead of its point count —
the same skew bound the salted join gives the containment path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.geo.cells import LEVEL, merc_xy_sql

RASTER_SCHEMA = ("tile_z int, tile_x long, tile_y long, n_points long, "
                 "nnz int, max_count long, wsum long, sqsum long")


def with_tile_pixel(df: DataFrame, z: int, grid_bits: int = 4,
                    lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Native tile + in-tile pixel columns: tile = top z bits of the
    level-30 grid ints, pixel = the next `grid_bits` bits."""
    assert z + grid_bits <= LEVEL
    xi, yi = merc_xy_sql(lon, lat)
    shift_t = LEVEL - z
    shift_p = LEVEL - z - grid_bits
    mask = (1 << grid_bits) - 1
    return (
        df.withColumn("_xi", F.expr(xi)).withColumn("_yi", F.expr(yi))
        .withColumn("tile_x", F.expr(f"_xi >> {shift_t}"))
        .withColumn("tile_y", F.expr(f"_yi >> {shift_t}"))
        .withColumn("px", F.expr(f"(_xi >> {shift_p}) & {mask}").cast("int"))
        .withColumn("py", F.expr(f"(_yi >> {shift_p}) & {mask}").cast("int"))
        .drop("_xi", "_yi")
    )


def rasterize_tiles(df: DataFrame, z: int = 6, grid_bits: int = 4,
                    lat: str = "lat", lon: str = "lon",
                    pre_agg: bool = True) -> DataFrame:
    """Per-tile occupancy raster stats (see module docstring).

    pre_agg=True (default, the at-scale shape) counts (tile, px, py)
    natively BEFORE the grouped-map, so the shuffle carries at most
    grid^2 rows per tile regardless of skew; pre_agg=False rasters raw
    points (exercises the same kernel on unaggregated groups)."""
    grid = 1 << grid_bits
    tp = with_tile_pixel(df, z, grid_bits, lat, lon)
    if pre_agg:
        src = tp.groupBy("tile_x", "tile_y", "px", "py") \
            .agg(F.count("*").alias("w"))
    else:
        src = tp.select("tile_x", "tile_y", "px", "py", F.lit(1).alias("w"))

    def _raster(pdf: pd.DataFrame) -> pd.DataFrame:
        r = np.zeros((grid, grid), np.int64)
        np.add.at(r, (pdf["py"].to_numpy(), pdf["px"].to_numpy()),
                  pdf["w"].to_numpy())
        flat = r.ravel()
        idx = np.arange(flat.size, dtype=np.int64)
        return pd.DataFrame({
            "tile_z": [z],
            "tile_x": [int(pdf["tile_x"].iloc[0])],
            "tile_y": [int(pdf["tile_y"].iloc[0])],
            "n_points": [int(flat.sum())],
            "nnz": [int((flat > 0).sum())],
            "max_count": [int(flat.max())],
            "wsum": [int((flat * (idx + 1)).sum())],
            "sqsum": [int((flat * flat).sum())],
        })

    return src.groupBy("tile_x", "tile_y").applyInPandas(_raster, RASTER_SCHEMA)
