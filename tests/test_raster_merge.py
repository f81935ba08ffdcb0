"""tile_raster + snapshot_merge unit coverage (driver twins live in
__spark_entry__.oracle_sql; these tests pin the kernels independently)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.geo.raster import rasterize_tiles, with_tile_pixel
from engine.relops import merge_upsert


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "id": np.arange(3000, dtype=np.int64),
        "lon": rng.uniform(-179, 179, 3000),
        "lat": rng.uniform(-80, 80, 3000),
    })
    return spark.createDataFrame(pdf)


def _stats(df):
    cols = ("tile_z", "tile_x", "tile_y", "n_points", "nnz", "max_count",
            "wsum", "sqsum")
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_raster_grids_consistent_with_stats(spark, pts):
    from engine.geo.raster import rasterize_tile_grids
    stats = {(r.tile_x, r.tile_y): (r.n_points, r.nnz, r.max_count, r.wsum,
                                    r.sqsum)
             for r in rasterize_tiles(pts, z=5, grid_bits=4).collect()}
    grids = {(r.tile_x, r.tile_y): np.asarray(r.grid, np.int64)
             for r in rasterize_tile_grids(pts, z=5, grid_bits=4).collect()}
    assert grids.keys() == stats.keys()
    for k, g in grids.items():
        idx = np.arange(g.size)
        assert stats[k] == (int(g.sum()), int((g > 0).sum()), int(g.max()),
                            int((g * (idx + 1)).sum()), int((g * g).sum()))


def test_raster_stats_match_numpy(spark, pts):
    tp = with_tile_pixel(pts, z=5, grid_bits=4).select(
        "tile_x", "tile_y", "px", "py").toPandas()
    want = {}
    for (tx, ty), g in tp.groupby(["tile_x", "tile_y"]):
        r = np.zeros((16, 16), np.int64)
        np.add.at(r, (g["py"].to_numpy(), g["px"].to_numpy()), 1)
        flat = r.ravel()
        idx = np.arange(flat.size)
        want[(tx, ty)] = (int(flat.sum()), int((flat > 0).sum()),
                          int(flat.max()), int((flat * (idx + 1)).sum()),
                          int((flat * flat).sum()))
    got = {(r.tile_x, r.tile_y): (r.n_points, r.nnz, r.max_count, r.wsum,
                                  r.sqsum)
           for r in rasterize_tiles(pts, z=5, grid_bits=4).collect()}
    assert got == want


def test_raster_conserves_points(spark, pts):
    out = rasterize_tiles(pts, z=5, grid_bits=4)
    assert out.agg(F.sum("n_points")).first()[0] == pts.count()


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, p double")
    delta = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, p double")
    got = {r.k: (r.v, r.p) for r in merge_upsert(base, delta, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}
