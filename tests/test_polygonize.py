"""Raster->vector polygonize: per-tile 4-connected regions vs a pure-
Python BFS oracle, the global cross-tile stitch vs a whole-plane oracle,
and the antimeridian wrap."""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.geo.polygonize import (
    REGION_SCHEMA, _label_tile, polygonize, polygonize_global,
)

GRID_BITS = 4
GRID = 1 << GRID_BITS


def _bfs_components(cells: set[tuple[int, int]]):
    """Oracle: 4-connected components over (x, y) cells -> list of sets."""
    seen, comps = set(), []
    for start in cells:
        if start in seen:
            continue
        comp, dq = set(), deque([start])
        seen.add(start)
        while dq:
            x, y = dq.popleft()
            comp.add((x, y))
            for nx, ny in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if (nx, ny) in cells and (nx, ny) not in seen:
                    seen.add((nx, ny))
                    dq.append((nx, ny))
        comps.append(comp)
    return comps


def _random_pixels(rng, n_tiles=6, density=0.35):
    rows = []
    for t in range(n_tiles):
        occ = rng.random((GRID, GRID)) < density
        for py, px in zip(*np.nonzero(occ)):
            rows.append((t % 3, t // 3, int(py) * GRID + int(px),
                         int(rng.integers(1, 5))))
    return pd.DataFrame(rows, columns=["tile_x", "tile_y", "pix", "w"])


def test_label_tile_matches_bfs(rng):
    for _ in range(20):
        occ = rng.random((GRID, GRID)) < 0.4
        pix = [int(y) * GRID + int(x) for y, x in zip(*np.nonzero(occ))]
        got = _label_tile(pix, GRID)
        cells = {(p % GRID, p // GRID) for p in pix}
        for comp in _bfs_components(cells):
            ids = {x + y * GRID for x, y in comp}
            want = min(ids)
            assert {got[i] for i in ids} == {want}


def test_polygonize_matches_python_oracle(spark, rng):
    pdf = _random_pixels(rng)
    df = spark.createDataFrame(pdf)
    out = {((r.tile_x, r.tile_y, r.region_id)):
           (r.n_pixels, r.w_sum, r.min_px, r.min_py, r.max_px, r.max_py)
           for r in polygonize(df, GRID_BITS).collect()}
    # python oracle per tile
    want = {}
    for (tx, ty), g in pdf.groupby(["tile_x", "tile_y"]):
        cells = {(int(p) % GRID, int(p) // GRID) for p in g["pix"]}
        wmap = {int(p): int(w) for p, w in zip(g["pix"], g["w"])}
        for comp in _bfs_components(cells):
            ids = sorted(x + y * GRID for x, y in comp)
            xs = [x for x, _ in comp]; ys = [y for _, y in comp]
            want[(tx, ty, min(ids))] = (
                len(ids), sum(wmap[i] for i in ids),
                min(xs), min(ys), max(xs), max(ys))
    assert out == want


def test_polygonize_schema(spark, rng):
    df = spark.createDataFrame(_random_pixels(rng, n_tiles=2))
    assert polygonize(df, GRID_BITS).schema == REGION_SCHEMA


def test_global_merge_matches_whole_plane_oracle(spark, rng):
    pdf = _random_pixels(rng, n_tiles=6, density=0.45)
    df = spark.createDataFrame(pdf)
    rows = polygonize_global(df, GRID_BITS).collect()
    # whole-plane oracle: global coords X = tile_x*GRID+px
    cells = {(int(r.tile_x) * GRID + int(r.pix) % GRID,
              int(r.tile_y) * GRID + int(r.pix) // GRID)
             for r in df.collect()}
    comps = _bfs_components(cells)
    plane_comp_of = {}
    for i, comp in enumerate(comps):
        for c in comp:
            plane_comp_of[c] = i
    # every output region maps into exactly one plane component; global
    # ids agree iff plane components agree
    gid_to_plane = {}
    for r in rows:
        x = int(r.tile_x) * GRID + int(r.region_id) % GRID
        y = int(r.tile_y) * GRID + int(r.region_id) // GRID
        pc = plane_comp_of[(x, y)]
        assert gid_to_plane.setdefault(r.global_id, pc) == pc
    assert len(gid_to_plane) == len(comps)
    # pixel counts per global id match plane component sizes
    sizes = {}
    for r in rows:
        sizes[r.global_id] = sizes.get(r.global_id, 0) + r.n_pixels
    assert sorted(sizes.values()) == sorted(len(c) for c in comps)


def test_global_merge_antimeridian_wrap(spark):
    # two tiles at z=2 (tiles 0..3): a horizontal strip crossing the
    # antimeridian — right edge of tile 3 touches left edge of tile 0
    rows = [(3, 1, 2 * GRID + GRID - 1, 1),   # right-edge pixel, row 2
            (0, 1, 2 * GRID + 0, 1)]          # left-edge pixel, row 2
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile_x", "tile_y", "pix", "w"]))
    out = polygonize_global(df, GRID_BITS, z=2).collect()
    assert len(out) == 2
    assert len({r.global_id for r in out}) == 1  # wrapped into one region
    unwrapped = polygonize_global(df, GRID_BITS).collect()
    assert len({r.global_id for r in unwrapped}) == 2


def test_polygonize_single_region_weights(spark):
    # an L-shape in one tile with known weights
    rows = [(0, 0, 0, 10), (0, 0, 1, 20), (0, 0, GRID, 30),
            (0, 0, 3, 5)]  # (0,0),(1,0),(0,1) connected; (3,0) separate
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile_x", "tile_y", "pix", "w"]))
    out = {r.region_id: r for r in polygonize(df, GRID_BITS).collect()}
    assert set(out) == {0, 3}
    assert out[0].n_pixels == 3 and out[0].w_sum == 60
    assert (out[0].min_px, out[0].min_py, out[0].max_px, out[0].max_py) == (0, 0, 1, 1)
    assert out[3].n_pixels == 1 and out[3].w_sum == 5
