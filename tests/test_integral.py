"""integral_image (late r4) — brute-force dominance-sum oracle, the
O(1) box-query identity (the operator's reason to exist), and the
zero-Python plan assertion."""

from __future__ import annotations

import numpy as np

from engine.geo.cells import merc_xy_np
from engine.geo.raster import integral_image

Z, GB = 4, 4
GRID = 1 << GB


def _pts(n, seed=2):
    r = np.random.default_rng(seed)
    lon = r.uniform(-170, 170, n)
    lat = r.uniform(-80, 80, n)
    return lon, lat


def _brute(lon, lat):
    """tile -> dense grid of pixel counts, from raw coords."""
    xi, yi = merc_xy_np(lon, lat)
    st, sp = 30 - Z, 30 - Z - GB
    tiles = {}
    for a, b in zip(xi, yi):
        key = (int(a) >> st, int(b) >> st)
        g = tiles.setdefault(key, np.zeros((GRID, GRID), np.int64))
        g[(int(b) >> sp) & (GRID - 1), (int(a) >> sp) & (GRID - 1)] += 1
    return tiles


def test_integral_matches_brute_and_box_identity(spark):
    lon, lat = _pts(800)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)],
        "lon double, lat double")
    rows = integral_image(df, z=Z, grid_bits=GB).collect()
    tiles = _brute(lon, lat)
    sats = {k: np.cumsum(np.cumsum(g, axis=0), axis=1)
            for k, g in tiles.items()}
    seen = set()
    for r in rows:
        k = (r.tile_x, r.tile_y)
        assert r.w == tiles[k][r.py, r.px]
        assert r.sat == sats[k][r.py, r.px]
        seen.add((k, r.px, r.py))
    # output domain == occupied pixels exactly
    want = {((k), x, y) for k, g in tiles.items()
            for y, x in zip(*np.nonzero(g))}
    assert seen == want
    # the point of a SAT: box-count by inclusion-exclusion on any tile
    k, g = max(tiles.items(), key=lambda kv: kv[1].sum())
    s = sats[k]
    x1, y1, x2, y2 = 3, 2, 12, 13

    def at(x, y):
        return int(s[y, x]) if x >= 0 and y >= 0 else 0

    box = at(x2, y2) - at(x1 - 1, y2) - at(x2, y1 - 1) + at(x1 - 1, y1 - 1)
    assert box == int(g[y1:y2 + 1, x1:x2 + 1].sum())
    # corner SAT equals the tile total
    assert int(s[-1, -1]) == int(g.sum())


def test_integral_plan_is_native(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "lon double, lat double")
    plan = integral_image(df, z=Z, grid_bits=GB) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------- adaptive threshold

def test_adaptive_threshold_matches_brute(spark):
    import numpy as np
    import pandas as pd
    from engine.geo.raster import adaptive_threshold
    from oracle.geo import lonlat_to_xy
    z, gb, r = 5, 3, 1
    grid = 1 << gb
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"lon": rng.uniform(-179, 179, 3000),
                        "lat": rng.uniform(-80, 80, 3000)})
    pts = spark.createDataFrame(pdf)
    cells = {}
    for lo, la in zip(pdf["lon"], pdf["lat"]):
        xi, yi = lonlat_to_xy(lo, la, level=z + gb)
        tx, ty, px, py = xi >> gb, yi >> gb, xi & (grid - 1), yi & (grid - 1)
        cells[(tx, ty, px, py)] = cells.get((tx, ty, px, py), 0) + 1
    got = {(q.tile_x, q.tile_y, q.px, q.py):
           (q.w, q.box_sum, q.n_box, q.above)
           for q in adaptive_threshold(pts, z=z, grid_bits=gb,
                                       radius=r).collect()}
    assert len(got) == len(cells)
    for (tx, ty, px, py), w in cells.items():
        bs = sum(v for (tx2, ty2, px2, py2), v in cells.items()
                 if tx2 == tx and ty2 == ty
                 and abs(px2 - px) <= r and abs(py2 - py) <= r)
        nb = ((min(px + r, grid - 1) - max(px - r, 0) + 1)
              * (min(py + r, grid - 1) - max(py - r, 0) + 1))
        assert got[(tx, ty, px, py)] == (w, bs, nb, int(w * nb > bs))


def test_adaptive_threshold_lone_pixel_is_above(spark):
    from engine.geo.raster import adaptive_threshold
    # a single hot pixel: box_sum == w, n_box > 1 => w*n_box > box_sum
    df = spark.createDataFrame([(10.0, 10.0)] * 9, "lon double, lat double") \
        .selectExpr("lat", "lon")
    rows = adaptive_threshold(df, z=6, grid_bits=4, radius=2).collect()
    assert len(rows) == 1 and rows[0].above == 1
    assert rows[0].box_sum == rows[0].w == 9
