"""C3 — tile assignment + quadkey vs oracle (SURVEY.md §5.2/5.5)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from engine.geo import cells as ec
from engine.geo import tiles as et
from oracle import geo as og


def test_tile_xy_matches_oracle():
    r = np.random.default_rng(5)
    lon = r.uniform(-180, 180, 400)
    lat = r.uniform(-85.05, 85.05, 400)
    c = ec.cell_encode_np(lon, lat)
    for z in (0, 1, 5, 12, 18):
        tx, ty = et.tile_xy_from_cell_np(c, z)
        for i in range(len(lon)):
            wz, wx, wy = og.tile(lon[i], lat[i], z)
            assert (tx[i], ty[i]) == (wx, wy), (lon[i], lat[i], z)


def test_quadkey_matches_oracle():
    r = np.random.default_rng(6)
    for z in (1, 7, 12):
        x = r.integers(0, 1 << z, 100).astype(np.int64)
        y = r.integers(0, 1 << z, 100).astype(np.int64)
        got = et.quadkey_np(x, y, z)
        for i in range(len(x)):
            assert got[i] == og.quadkey(z, int(x[i]), int(y[i]))
            assert len(got[i]) == z


def test_tile_key_equals_cell_parent():
    # tile Morton id == cell parent at z — the native no-UDF grouping key
    r = np.random.default_rng(8)
    lon = r.uniform(-180, 180, 200)
    lat = r.uniform(-85, 85, 200)
    c = ec.cell_encode_np(lon, lat)
    for z in (4, 9, 14):
        tx, ty = et.tile_xy_from_cell_np(c, z)
        want = ec.morton_np(tx, ty)
        got = c >> np.int64(2 * (30 - z))
        np.testing.assert_array_equal(got, want)


def test_with_tile_spark(spark):
    pdf = pd.DataFrame(
        {"lon": [-180.0, 0.0, 179.99, 13.4], "lat": [-85.0, 0.0, 85.0, 52.5]}
    )
    df = ec.with_cell(spark.createDataFrame(pdf))
    out = et.with_tile(df, z=12, quadkey_col=True)
    for r in out.collect():
        wz, wx, wy = og.tile(r.lon, r.lat, 12)
        assert (r.tile_z, r.tile_x, r.tile_y) == (wz, wx, wy)
        assert r.quadkey == og.quadkey(12, wx, wy)


def test_tile_pyramid_invariants(spark):
    """Pyramid rollup: every level conserves the total point count, each
    parent's n equals the sum of its four children, and every level
    equals a direct groupBy at that zoom (the rollup is just a cheaper
    plan for the same result)."""
    from pyspark.sql import functions as F

    from engine.geo.cells import with_cell
    from engine.synth import gen_points

    pts = with_cell(gen_points(spark, 4000, seed=7))
    pyr = et.tile_pyramid(pts, z_max=8, z_min=4).collect()
    levels: dict[int, dict[tuple[int, int], int]] = {}
    for r in pyr:
        levels.setdefault(r.tile_z, {})[(r.tile_x, r.tile_y)] = r.n
    for z in range(4, 9):
        assert sum(levels[z].values()) == 4000, f"level {z} lost points"
        direct = {(r.tile_x, r.tile_y): r.n
                  for r in et.with_tile(pts, z=z)
                  .groupBy("tile_x", "tile_y").agg(F.count("*").alias("n"))
                  .collect()}
        assert levels[z] == direct, f"level {z} != direct groupBy"
    for z in range(5, 9):
        for (x, y), n in levels[z - 1].items():
            kids = sum(levels[z].get((x * 2 + dx, y * 2 + dy), 0)
                       for dx in (0, 1) for dy in (0, 1))
            assert kids == n, f"parent {(z-1, x, y)} != sum of children"
