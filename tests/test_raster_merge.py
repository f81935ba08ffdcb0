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


def test_tile_raster_matches_golden_at_pinned_sf(spark):
    """The driver oracle for tile_raster is a GOLDEN pin at sf0.01 (the
    driver's fixed correctness scale): the r2 trig-SQL twin recomputed
    Web-Mercator ln/tan in DuckDB and a CPU-dispatched-libm last-ULP
    disagreement flipped one pixel on the driver host.  This asserts the
    engine output still equals the committed golden."""
    import os

    import pandas as pd

    import __spark_entry__ as entry_mod
    golden = os.path.join(os.path.dirname(entry_mod.__file__),
                          "oracle", "golden", "tile_raster.parquet")
    want = pd.read_parquet(golden)
    got = entry_mod.queries()["tile_raster"](
        spark, "/root/testdata/sf0.01").toPandas()
    key = ["tile_x", "tile_y"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[want.columns],
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False)


def test_tile_raster_trig_twin_near_exact(spark):
    """Keeps the retired r2 DuckDB trig twin alive as an INDEPENDENT
    cross-engine check with an explicit ULP tolerance: total point count
    must be conserved exactly, and at most a handful of rows may differ
    (each legitimate difference is one point sitting within libm-ULP of
    a 1-of-2^30 mercator pixel boundary)."""
    import duckdb

    from __spark_entry__ import PTS_SQL, XY_SQL, queries
    sql = (
        f"WITH {PTS_SQL}, {XY_SQL}, "
        "px AS (SELECT id, xi >> 24 AS tx, yi >> 24 AS ty, "
        "((yi >> 20) & 15) * 16 + ((xi >> 20) & 15) AS pix FROM xy), "
        "c AS (SELECT tx, ty, pix, COUNT(*) AS w FROM px GROUP BY 1, 2, 3) "
        "SELECT CAST(6 AS INTEGER) AS tile_z, tx AS tile_x, ty AS tile_y, "
        "SUM(w) AS n_points, CAST(COUNT(*) AS INTEGER) AS nnz, "
        "MAX(w) AS max_count, SUM(w * (pix + 1)) AS wsum, "
        "SUM(w * w) AS sqsum FROM c GROUP BY 2, 3")
    con = duckdb.connect()
    con.execute("CREATE VIEW customer AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.01/customer.parquet')")
    duck = {(r[1], r[2]): tuple(r) for r in con.execute(sql).fetchall()}
    got = queries()["tile_raster"](spark, "/root/testdata/sf0.01").collect()
    spk = {(r.tile_x, r.tile_y): (r.tile_z, r.tile_x, r.tile_y, r.n_points,
                                  r.nnz, r.max_count, r.wsum, r.sqsum)
           for r in got}
    assert sum(v[3] for v in spk.values()) == sum(v[3] for v in duck.values())
    diff = {k for k in (spk.keys() | duck.keys())
            if spk.get(k) != duck.get(k)}
    assert len(diff) <= 4, f"trig twin drifted beyond ULP tolerance: {sorted(diff)[:8]}"


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, p double")
    delta = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, p double")
    got = {r.k: (r.v, r.p) for r in merge_upsert(base, delta, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


# ----------------------------------------------------------- focal sum

def _focal_numpy(pts_pdf, z, radius):
    """Dense-numpy reference for focal_sum: rasterize counts on the full
    2^z x 2^z grid, sum the (2r+1)^2 window with cyclic x / clipped y."""
    from oracle.geo import lonlat_to_xy
    n = 1 << z
    xy = [lonlat_to_xy(lo, la, level=z)
          for lo, la in zip(pts_pdf["lon"], pts_pdf["lat"])]
    tx = np.array([p[0] for p in xy], np.int64)
    ty = np.array([p[1] for p in xy], np.int64)
    grid = np.zeros((n, n), np.int64)
    np.add.at(grid, (tx, ty), 1)
    focal = np.zeros_like(grid)
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            shifted = np.roll(grid, dx, axis=0)  # cyclic x
            if dy > 0:
                shifted = np.concatenate(
                    [np.zeros((n, dy), np.int64), shifted[:, :-dy]], axis=1)
            elif dy < 0:
                shifted = np.concatenate(
                    [shifted[:, -dy:], np.zeros((n, -dy), np.int64)], axis=1)
            focal += shifted
    return {(int(x), int(y)): (int(grid[x, y]), int(focal[x, y]))
            for x, y in zip(tx, ty)}


def test_focal_sum_matches_dense_numpy(spark, pts):
    from engine.geo.raster import focal_sum
    pdf = pts.toPandas()
    want = _focal_numpy(pdf, z=5, radius=1)
    got = {(r.tile_x, r.tile_y): (r.n, r.focal_n)
           for r in focal_sum(pts, z=5, radius=1).collect()}
    assert got == want and len(got) > 100


def test_focal_sum_wraps_x_and_clips_y(spark):
    from engine.geo.raster import focal_sum
    # two points in x-adjacent tiles ACROSS the antimeridian at z=2
    # (tile x 0 and 3), same y band near the top edge (clipped, no y wrap)
    df = spark.createDataFrame(
        [(0, -170.0, 80.0), (1, 170.0, 80.0)], "id long, lon double, lat double")
    rows = {(r.tile_x, r.tile_y): (r.n, r.focal_n)
            for r in focal_sum(df, z=2, radius=1).collect()}
    assert len(rows) == 2
    for (x, y), (n, fn) in rows.items():
        assert n == 1 and fn == 2  # each sees the other through the wrap
        assert y == 0  # top row: the y-1 neighbors fell off the raster


# ------------------------------------------------------- edge extraction

def test_edge_tiles_match_dense_numpy(spark, pts):
    from engine.geo.raster import edge_tiles
    from oracle.geo import lonlat_to_xy
    pdf = pts.toPandas()
    z, n = 5, 1 << 5
    xy = [lonlat_to_xy(lo, la, level=z)
          for lo, la in zip(pdf["lon"], pdf["lat"])]
    grid = np.zeros((n, n), np.int64)
    np.add.at(grid, ([p[0] for p in xy], [p[1] for p in xy]), 1)
    occ = grid > 0
    want = {}
    for x, y in zip(*np.nonzero(occ)):
        nbr = int(occ[(x - 1) % n, y]) + int(occ[(x + 1) % n, y])
        if y > 0:
            nbr += int(occ[x, y - 1])
        if y < n - 1:
            nbr += int(occ[x, y + 1])
        want[(int(x), int(y))] = (int(grid[x, y]), nbr, int(nbr < 4))
    got = {(r.tile_x, r.tile_y): (r.n, r.occ_nbrs, r.is_edge)
           for r in edge_tiles(pts, z=z).collect()}
    assert got == want and len(got) > 100
    assert any(v[2] for v in got.values())      # some edges exist
    assert any(not v[2] for v in got.values())  # ...and some interior


def test_edge_tiles_isolated_tile_is_edge(spark):
    from engine.geo.raster import edge_tiles
    # one lonely point: its tile has zero occupied neighbors (LEFT join
    # path) and must still appear, maximally edge
    df = spark.createDataFrame([(1, 10.0, 20.0)], "id long, lon double, lat double")
    rows = edge_tiles(df, z=6).collect()
    assert len(rows) == 1
    assert rows[0].occ_nbrs == 0 and rows[0].is_edge == 1


# ------------------------------------------------------- morphology

def test_morph_tiles_match_dense_numpy(spark, pts):
    """Dilation domain + erosion flags vs a dense-grid reference with
    cyclic x / clipped y (off-raster = unoccupied)."""
    from engine.geo.raster import morph_tiles
    from oracle.geo import lonlat_to_xy
    pdf = pts.toPandas()
    z, n, radius = 5, 1 << 5, 1
    xy = [lonlat_to_xy(lo, la, level=z)
          for lo, la in zip(pdf["lon"], pdf["lat"])]
    grid = np.zeros((n, n), np.int64)
    np.add.at(grid, ([p[0] for p in xy], [p[1] for p in xy]), 1)
    occ = grid > 0
    win = np.zeros((n, n), np.int64)
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            shifted = np.roll(occ.astype(np.int64), dx, axis=0)
            if dy > 0:
                shifted = np.concatenate(
                    [np.zeros((n, dy), np.int64), shifted[:, :-dy]], axis=1)
            elif dy < 0:
                shifted = np.concatenate(
                    [shifted[:, -dy:], np.zeros((n, -dy), np.int64)], axis=1)
            win += shifted
    full = (2 * radius + 1) ** 2
    want = {}
    for x in range(n):
        for y in range(n):
            if win[x, y] > 0:  # dilated domain
                want[(x, y)] = (int(occ[x, y]), int(grid[x, y]),
                                int(win[x, y]),
                                int(occ[x, y] and win[x, y] == full))
    got = {(r.tile_x, r.tile_y): (r.occupied, r.n, r.occ_window, r.is_eroded)
           for r in morph_tiles(pts, z=z, radius=radius).collect()}
    assert got == want
    assert any(v[3] for v in got.values())       # some tile erodes
    assert any(v[0] == 0 for v in got.values())  # dilation adds tiles


def test_morph_tiles_pole_row_never_erodes(spark):
    """A fully-occupied 3-wide band on the top row: the y-1 window rows
    are off-raster (unoccupied), so nothing on row 0 erodes."""
    from engine.geo.raster import morph_tiles
    rows = [(i * 10 + j, -180.0 + (i + 0.5) * 90.0, 84.0 + j * 0.4)
            for i in range(4) for j in range(3)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    out = morph_tiles(df, z=2, radius=1).collect()
    top = [r for r in out if r.tile_y == 0 and r.occupied == 1]
    assert top and all(r.is_eroded == 0 for r in top)


# -------------------------------------------------------- focal median

def _focal_median_numpy(pts_pdf, z):
    """Dense reference for focal_median: rasterize, then per occupied
    cell the exact median of the 9-window (cyclic x, zeros past the
    poles)."""
    from oracle.geo import lonlat_to_xy
    n = 1 << z
    xy = [lonlat_to_xy(lo, la, level=z)
          for lo, la in zip(pts_pdf["lon"], pts_pdf["lat"])]
    tx = np.array([p[0] for p in xy], np.int64)
    ty = np.array([p[1] for p in xy], np.int64)
    grid = np.zeros((n, n), np.int64)
    np.add.at(grid, (tx, ty), 1)
    out = {}
    for x, y in zip(tx, ty):
        vals, pres = [], 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = (x + dx) % n, y + dy
                if 0 <= ny < n:
                    v = int(grid[nx, ny])
                    vals.append(v)
                    pres += 1 if v > 0 else 0
                else:
                    vals.append(0)
        vals.sort()
        out[(int(x), int(y))] = (int(grid[x, y]), pres, vals[4])
    return out


def test_focal_median_matches_dense_numpy(spark, pts):
    from engine.geo.raster import focal_median
    pdf = pts.toPandas()
    want = _focal_median_numpy(pdf, z=5)
    got = {(r.tile_x, r.tile_y): (r.n, r.n_present, r.median_n)
           for r in focal_median(pts, z=5).collect()}
    assert got == want and len(got) > 100


def test_focal_median_lone_hot_tile_denoises_to_zero(spark):
    from engine.geo.raster import focal_median
    # many points in ONE tile, nothing around it: n_present=1 of 9,
    # median 0 — the salt-and-pepper property.
    df = spark.createDataFrame([(10.0 + i * 1e-6, 10.0) for i in range(50)],
                               "lon double, lat double") \
        .selectExpr("lat", "lon")
    rows = focal_median(df, z=6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n, r.n_present, r.median_n) == (50, 1, 0)


# -------------------------------------------------- mode pyramid

def _mode_pyr_ref(cells, levels):
    out = {}
    cur = dict(cells)  # {(gx,gy): v}
    for (x, y), v in cur.items():
        out[(0, x, y)] = (v, 1, 1)
    for lvl in range(1, levels + 1):
        blocks = {}
        for (x, y), v in cur.items():
            blocks.setdefault((x // 2, y // 2), []).append(v)
        nxt = {}
        for b, vs in blocks.items():
            cc = {}
            for v in vs:
                cc[v] = cc.get(v, 0) + 1
            m = min(cc, key=lambda v: (-cc[v], v))
            out[(lvl, b[0], b[1])] = (m, cc[m], len(vs))
            nxt[b] = m
        cur = nxt
    return out


def test_mode_pyramid_matches_reference(spark):
    import random
    from engine.geo.raster import mode_pyramid
    rng = random.Random(3)
    cells = {(rng.randrange(16), rng.randrange(16)): rng.randrange(1, 5)
             for _ in range(120)}
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in sorted(cells.items())],
        "gx long, gy long, w long")
    got = {(r.level, r.gx, r.gy): (r.mode_v, r.mode_n, r.n_children)
           for r in mode_pyramid(df, levels=3).collect()}
    assert got == _mode_pyr_ref(cells, 3)


def test_mode_of_modes_is_not_the_mode(spark):
    # the non-associativity witness that forces level-by-level rollup:
    # three occupied level-1 blocks whose modes are {7, 9, 8} (tie in
    # the first block breaks to 7), so the level-2 mode-of-modes is 7 —
    # while the mode of the 10 RAW values is 8 (count 5).  A one-shot
    # explode-ancestors "pyramid" would emit 8 at the root; the
    # level-by-level engine must emit 7.
    from engine.geo.raster import mode_pyramid
    cells = {(0, 0): 7, (0, 1): 7, (1, 0): 8, (1, 1): 8,   # block (0,0)
             (2, 0): 8, (2, 1): 9, (3, 0): 9,              # block (1,0)
             (0, 2): 8, (1, 2): 8, (0, 3): 9}              # block (0,1)
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in sorted(cells.items())],
        "gx long, gy long, w long")
    got = {(r.level, r.gx, r.gy): r.mode_v
           for r in mode_pyramid(df, levels=2).collect()}
    # level-2 root from level-1 modes {7, 9, 8} -> 7
    assert got[(2, 0, 0)] == 7
    # raw mode of the 10 values is 8 (x5) - proving mode-of-modes != mode
    from collections import Counter
    raw_mode = min(Counter(cells.values()).items(),
                   key=lambda kv: (-kv[1], kv[0]))[0]
    assert raw_mode == 8 != got[(2, 0, 0)]
