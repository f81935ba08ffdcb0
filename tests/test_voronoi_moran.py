"""Voronoi assignment + Moran's I (r4 continuation): pure-Python kernel
parity, exact-arithmetic theorems (tie-break, constant-field degeneracy,
shift invariance), and the real mercator-pixel path vs the reference
numpy kernel (the driver twin uses a trig-free integer fixture by
design — the tile_raster r2 lesson — so the trig path is proven here)."""

from __future__ import annotations

from collections import Counter

import numpy as np

from engine.geo.raster import moran_scaled
from engine.geo.voronoi import voronoi_assign, voronoi_assign_py

SITES = tuple((i, (i * 97 + 5) % 512, (i * 131 + 11) % 512) for i in range(8))


def test_voronoi_matches_py_kernel(spark):
    rows = [(k, (k * 2654435761) % 512, (k * 40503 + 7) % 512)
            for k in range(1, 400)]
    df = spark.createDataFrame(rows, "id long, xi long, yi long")
    out = voronoi_assign(df, SITES).orderBy("id").collect()
    assert len(out) == 399
    for r in out:
        s, d1, m = voronoi_assign_py(r.xi, r.yi, SITES)
        assert (r.site_id, r.d2, r.margin) == (s, d1, m), r.id


def test_voronoi_exact_tie_breaks_to_smaller_sid(spark):
    # point (2,0) is exactly equidistant (d2=4) from sites 3 and 1
    sites = ((3, 0, 0), (1, 4, 0))
    r = voronoi_assign(
        spark.createDataFrame([(1, 2, 0)], "id long, xi long, yi long"),
        sites).collect()[0]
    assert (r.site_id, r.d2, r.margin) == (1, 4, 0)


def test_voronoi_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, xi long, yi long")
    plan = voronoi_assign(df, SITES)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "voronoi_assign must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def _moran_brute(cells: dict[tuple[int, int], int]):
    n, s = len(cells), sum(cells.values())
    c = {k: n * w - s for k, w in cells.items()}
    num = edges = 0
    for (x, y), ci in c.items():
        for dx, dy in ((1, 0), (0, 1)):
            if (x + dx, y + dy) in c:
                num += ci * c[(x + dx, y + dy)]
                edges += 1
    den = sum(v * v for v in c.values())
    return n, s, 2 * edges, 2 * num, den


def _run_moran(spark, cells):
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in sorted(cells.items())],
        "gx long, gy long, w long")
    return moran_scaled(df).collect()[0]


def test_moran_matches_brute(spark):
    cnt = Counter(((k * 7) % 13, (k * 11) % 13) for k in range(60))
    r = _run_moran(spark, cnt)
    assert (r.n, r.s_w, r.w_directed, r.num_scaled, r.den_scaled) == \
        _moran_brute(cnt)


def test_moran_constant_field_degenerates_to_zero(spark):
    cells = {(x, y): 7 for x in range(4) for y in range(4)}
    r = _run_moran(spark, cells)
    # 4x4 grid: 24 undirected rook edges -> W=48; constant field centers
    # to zero exactly (num = den = 0)
    assert (r.w_directed, r.num_scaled, r.den_scaled) == (48, 0, 0)


def test_moran_shift_invariance(spark):
    base = {(x, y): (x * 3 + y * 5) % 7 + 1
            for x in range(5) for y in range(5) if (x + y) % 3}
    r1 = _run_moran(spark, base)
    r2 = _run_moran(spark, {k: w + 100 for k, w in base.items()})
    assert (r1.num_scaled, r1.den_scaled, r1.w_directed) == \
        (r2.num_scaled, r2.den_scaled, r2.w_directed)


def test_moran_real_mercator_pixels(spark, sf_dir):
    """The real geo path: moran over level-10 mercator pixel counts of
    the deterministic point fixture, vs the brute oracle computed from
    the reference numpy kernel (bit-identical grids by the C1 parity
    suite)."""
    import __spark_entry__ as entry_mod
    from engine.geo.cells import merc_xy_np

    pts = entry_mod._points(spark, sf_dir)
    from pyspark.sql import functions as F
    xi, yi = __import__("engine.geo.cells", fromlist=["merc_xy_sql"]) \
        .merc_xy_sql("lon", "lat")
    pix = (pts.select(F.expr(xi).alias("x30"), F.expr(yi).alias("y30"))
           .select(F.expr("x30 >> 20").alias("gx"),
                   F.expr("y30 >> 20").alias("gy"))
           .groupBy("gx", "gy").agg(F.count("*").alias("w")))
    got = moran_scaled(pix).collect()[0]

    pdf = pts.select("lon", "lat").toPandas()
    x30, y30 = merc_xy_np(pdf["lon"].to_numpy(np.float64),
                          pdf["lat"].to_numpy(np.float64))
    cnt = Counter(zip((np.asarray(x30) >> 20).tolist(),
                      (np.asarray(y30) >> 20).tolist()))
    assert (got.n, got.s_w, got.w_directed, got.num_scaled,
            got.den_scaled) == _moran_brute(cnt)


# ------------------------------------------------------------- Geary's C

from engine.geo.raster import geary_scaled


def _geary_brute(cells: dict[tuple[int, int], int]):
    n, s = len(cells), sum(cells.values())
    num = edges = 0
    for (x, y), v in cells.items():
        for dx, dy in ((1, 0), (0, 1)):
            if (x + dx, y + dy) in cells:
                d = v - cells[(x + dx, y + dy)]
                num += d * d
                edges += 1
    den = sum((n * v - s) ** 2 for v in cells.values())
    return n, s, 2 * edges, 2 * num, den


def _run_geary(spark, cells):
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in sorted(cells.items())],
        "gx long, gy long, w long")
    return geary_scaled(df).collect()[0]


def test_geary_matches_brute(spark):
    cnt = Counter(((k * 7) % 13, (k * 11) % 13) for k in range(60))
    r = _run_geary(spark, cnt)
    assert (r.n, r.s_w, r.w_directed, r.num_diff, r.den_scaled) == \
        _geary_brute(cnt)


def test_geary_constant_field_degenerates(spark):
    cells = {(x, y): 7 for x in range(4) for y in range(4)}
    r = _run_geary(spark, cells)
    assert (r.w_directed, r.num_diff, r.den_scaled) == (48, 0, 0)


def test_geary_shift_invariance(spark):
    base = {(x, y): (x * 3 + y * 5) % 7 + 1
            for x in range(5) for y in range(5) if (x + y) % 3}
    r1 = _run_geary(spark, base)
    r2 = _run_geary(spark, {k: w + 100 for k, w in base.items()})
    assert (r1.num_diff, r1.den_scaled, r1.w_directed) == \
        (r2.num_diff, r2.den_scaled, r2.w_directed)


def test_geary_vs_float_reference(spark):
    """The assembled C ratio matches the textbook float formula."""
    import random
    rng = random.Random(9)
    cells = {(rng.randrange(12), rng.randrange(12)): 1 + rng.randrange(9)
             for _ in range(70)}
    r = _run_geary(spark, cells)
    n, W = r.n, r.w_directed
    c_engine = (n - 1) * n * n * r.num_diff / (2 * W * r.den_scaled)
    xbar = sum(cells.values()) / n
    num = sum((cells[(x, y)] - cells[(x + dx, y + dy)]) ** 2
              for (x, y) in cells for dx, dy in ((1, 0), (0, 1), (-1, 0),
                                                 (0, -1))
              if (x + dx, y + dy) in cells)
    den = sum((v - xbar) ** 2 for v in cells.values())
    c_ref = (n - 1) * num / (2 * W * den)
    assert abs(c_engine - c_ref) < 1e-12 * max(1.0, abs(c_ref))


# ------------------------------------------------------------- Gi* hotspots

import math

from engine.geo.raster import gi_star_scaled


def _gi_brute(cells):
    """cells: {(x, y): w} -> per-cell reference via float Gi* formula."""
    n = len(cells)
    s = sum(cells.values())
    ss = sum(v * v for v in cells.values())
    xbar, s2 = s / n, ss / n - (s / n) ** 2
    out = {}
    for (cx, cy), v in cells.items():
        nb = [(cx + dx, cy + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        k = sum(1 for p in nb if p in cells)
        focal = sum(cells.get(p, 0) for p in nb)
        num = focal - k * s / n
        den = math.sqrt(s2) * math.sqrt((n * k - k * k) / (n - 1))
        out[(cx, cy)] = (k, focal, num / den if den else 0.0)
    return out


def test_gi_star_matches_float_reference(spark):
    import random
    rng = random.Random(3)
    cells = {}
    # a dense hot cluster + scattered noise
    for dx in range(3):
        for dy in range(3):
            cells[(10 + dx, 10 + dy)] = 30 + rng.randrange(5)
    for _ in range(60):
        cells[(rng.randrange(40), rng.randrange(40))] = 1 + rng.randrange(3)
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    rows = {(r["gx"], r["gy"]): r for r in gi_star_scaled(df).collect()}
    ref = _gi_brute(cells)
    n = len(cells)
    assert set(rows) == set(ref)
    for key, (k, focal, z) in ref.items():
        r = rows[key]
        assert (r["k"], r["focal"]) == (k, focal)
        # scaled integer z^2 identity: z^2 == a_num^2 (n-1) / b_den
        if r["b_den"]:
            z2 = r["a_num"] ** 2 * (n - 1) / r["b_den"]
            assert abs(z2 - z * z) < 1e-6 * max(1.0, z * z)
        # classification matches the float reference at |z| = 2
        want_hot = 1 if z > 2 else (-1 if z < -2 else 0)
        assert r["hot"] == want_hot
    # the planted cluster center is hot
    assert rows[(11, 11)]["hot"] == 1


# ----------------------------------------------------------- proximity

from engine.geo.raster import raster_proximity


def test_raster_proximity_brute(spark):
    import random
    rng = random.Random(17)
    cells = {(rng.randrange(30), rng.randrange(30)) for _ in range(60)}
    cells |= {(0, 0)}                       # guaranteed isolated corner?
    df = spark.createDataFrame([(x, y) for (x, y) in cells],
                               "gx long, gy long")
    R = 3
    got = {(r["gx"], r["gy"]): r["nn_l1"]
           for r in raster_proximity(df, radius=R).collect()}
    want = {}
    for (x, y) in cells:
        ds = [abs(x - a) + abs(y - b) for (a, b) in cells
              if (a, b) != (x, y)
              and abs(x - a) <= R and abs(y - b) <= R]
        want[(x, y)] = min(ds) if ds else 2 * R + 1
    assert got == want


# ------------------------------------------------------------ D8 flow dir

from engine.geo.raster import flow_dir_d8

_D8 = [(0, 1, 0), (1, 1, 1), (2, 0, 1), (3, -1, 1),
       (4, -1, 0), (5, -1, -1), (6, 0, -1), (7, 1, -1)]


def _flowdir_brute(cells):
    out = {}
    for (x, y), w in cells.items():
        best = (-1, 0)
        for d, dx, dy in _D8:
            nb = cells.get((x + dx, y + dy))
            if nb is None or nb >= w:
                continue
            m = 2 if dx == 0 or dy == 0 else 1
            score = (w - nb) ** 2 * m
            if best[0] == -1 or score > best[1] \
                    or (score == best[1] and d < best[0]):
                best = (d, score)
        out[(x, y)] = best
    return out


def test_flowdir_matches_brute(spark):
    import random
    rng = random.Random(31)
    cells = {(rng.randrange(15), rng.randrange(15)): rng.randrange(1, 30)
             for _ in range(120)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    got = {(r.gx, r.gy): (r.dir, r.score) for r in flow_dir_d8(df).collect()}
    assert got == _flowdir_brute(cells)


def test_flowdir_theorems(spark):
    # a strict pyramid: the peak flows to a cardinal neighbor only when
    # diagonals are relatively steeper is false here — every interior
    # cell flows downhill, the 4 lowest corner cells are local sinks
    cells = {(x, y): 20 - max(abs(x - 2), abs(y - 2))
             for x in range(5) for y in range(5)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    rows = {(r.gx, r.gy): (r.dir, r.score) for r in flow_dir_d8(df).collect()}
    ref = _flowdir_brute(cells)
    assert rows == ref
    # peak: all 8 neighbors drop by 1 -> cardinal wins on distance
    # (score 2 vs 1), tie among cardinals breaks to the lowest code 0=E
    assert rows[(2, 2)] == (0, 2)
    # corners are the minima of their neighborhoods -> sinks
    for c in ((0, 0), (4, 0), (0, 4), (4, 4)):
        assert rows[c][0] == -1 and rows[c][1] == 0


def test_flowdir_uniform_field_is_all_sinks(spark):
    df = spark.createDataFrame(
        [(x, y, 5) for x in range(4) for y in range(4)],
        "gx long, gy long, w long")
    rows = flow_dir_d8(df).collect()
    assert all(r.dir == -1 and r.score == 0 for r in rows)


# ------------------------------------------------------- flow accumulation

from engine.geo.raster import flow_accumulation


def _flowacc_brute(cells):
    fd = _flowdir_brute(cells)
    acc = {k: 0 for k in cells}
    for start in cells:
        cur = start
        while True:
            acc[cur] += 1
            d = fd[cur][0]
            if d == -1:
                break
            dx, dy = _D8[d][1], _D8[d][2]
            cur = (cur[0] + dx, cur[1] + dy)
    return acc


def test_flowacc_matches_brute(spark):
    import random
    rng = random.Random(13)
    cells = {(rng.randrange(12), rng.randrange(12)): rng.randrange(1, 20)
             for _ in range(90)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    got = {(r.gx, r.gy): r.acc for r in flow_accumulation(df).collect()}
    assert got == _flowacc_brute(cells)


def test_flowacc_conservation_and_sink_drainage(spark):
    # a monotone staircase drains everything into the single minimum:
    # the sink's acc equals n, every cell has acc >= 1, and the sum of
    # accs equals the total number of (origin, cell-on-path) pairs
    cells = {(x, 0): x + 1 for x in range(8)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    got = {(r.gx, r.gy): r.acc for r in flow_accumulation(df).collect()}
    assert got[(0, 0)] == 8                       # the global sink
    assert got == {(x, 0): 8 - x for x in range(8)}


def test_flowacc_max_rounds_raises_loudly(spark):
    import pytest as _pytest
    cells = {(x, 0): x + 1 for x in range(8)}     # 7-hop path
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    with _pytest.raises(RuntimeError, match="max_rounds"):
        flow_accumulation(df, max_rounds=3)


# ------------------------------------------------------- watershed basins

from engine.geo.raster import basin_labels


def _basins_brute(cells):
    fd = _flowdir_brute(cells)
    out = {}
    for start in cells:
        cur = start
        while fd[cur][0] != -1:
            d = fd[cur][0]
            cur = (cur[0] + _D8[d][1], cur[1] + _D8[d][2])
        out[start] = cur
    return out


def test_basins_match_brute(spark):
    import random
    rng = random.Random(47)
    cells = {(rng.randrange(14), rng.randrange(14)): rng.randrange(1, 25)
             for _ in range(110)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    got = {(r.gx, r.gy): (r.bx, r.by) for r in basin_labels(df).collect()}
    assert got == _basins_brute(cells)


def test_basins_long_chain_needs_doubling(spark):
    # a 40-cell monotone staircase: hop-by-hop would need 39 rounds,
    # pointer doubling converges in ceil(log2(39)) + 1 = 7
    cells = {(x, 0): x + 1 for x in range(40)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    got = {(r.gx, r.gy): (r.bx, r.by)
           for r in basin_labels(df, max_rounds=7).collect()}
    assert got == {(x, 0): (0, 0) for x in range(40)}


def test_basins_labels_are_sinks_and_cover(spark):
    import random
    rng = random.Random(7)
    cells = {(rng.randrange(10), rng.randrange(10)): rng.randrange(1, 15)
             for _ in range(60)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    rows = basin_labels(df).collect()
    fd = _flowdir_brute(cells)
    assert len(rows) == len(cells)                 # exactly one label each
    for r in rows:
        assert fd[(r.bx, r.by)][0] == -1           # every label is a sink
    sinks = {k for k, v in fd.items() if v[0] == -1}
    assert {(r.bx, r.by) for r in rows} == sinks   # every sink drains itself


def test_basins_uniform_field_all_self(spark):
    df = spark.createDataFrame(
        [(x, y, 5) for x in range(4) for y in range(4)],
        "gx long, gy long, w long")
    rows = basin_labels(df).collect()
    assert all((r.bx, r.by) == (r.gx, r.gy) for r in rows)


def test_basins_max_rounds_raises_loudly(spark):
    import pytest as _pytest
    cells = {(x, 0): x + 1 for x in range(40)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in cells.items()], "gx long, gy long, w long")
    with _pytest.raises(RuntimeError, match="basin_labels"):
        basin_labels(df, max_rounds=3)


# ---------------------------------------------- Strahler order (C3t)

def test_strahler_closed_forms(spark):
    from engine.geo.raster import strahler_orders
    # chain 3 cells flowing east: every cell has <=1 child -> all order 1
    chain = [(0, 0, 30), (1, 0, 20), (2, 0, 10)]
    df = spark.createDataFrame(chain, "gx long, gy long, w long")
    got = {(r.gx, r.gy): r.strahler
           for r in strahler_orders(df).collect()}
    assert got == {(0, 0): 1, (1, 0): 1, (2, 0): 1}
    # two order-1 streams joining -> confluence bumps to 2
    conf = [(0, 0, 30), (0, 2, 30), (0, 1, 10), (1, 1, 5)]
    # (0,0) flows S to (0,1)?  dirs: (0,0)->(0,1) is dy=+1?  grid: let
    # both outer cells drain into (0,1), which drains into (1,1)
    df2 = spark.createDataFrame(conf, "gx long, gy long, w long")
    got2 = {(r.gx, r.gy): r.strahler
            for r in strahler_orders(df2).collect()}
    assert got2[(0, 0)] == 1 and got2[(0, 2)] == 1
    assert got2[(0, 1)] == 2          # two children both at order 1
    assert got2[(1, 1)] == 2          # single child at 2 -> stays 2


def test_strahler_matches_sequential_reference(spark):
    import numpy as np

    from engine.geo.raster import flow_dir_d8, strahler_orders, strahler_py
    rng = np.random.RandomState(9)
    cells = {(int(x), int(y)): int(w) for x, y, w in zip(
        rng.randint(0, 20, 300), rng.randint(0, 20, 300),
        rng.randint(1, 100, 300))}
    rows = [(x, y, w) for (x, y), w in cells.items()]
    df = spark.createDataFrame(rows, "gx long, gy long, w long")
    dirs = {(r.gx, r.gy): r.dir for r in flow_dir_d8(df).collect()}
    want = strahler_py(set(cells), dirs, max_rounds=24)
    got = {(r.gx, r.gy): r.strahler
           for r in strahler_orders(df, max_rounds=24).collect()}
    assert got == want
    assert max(got.values()) >= 2     # the fixture exercises confluences


def test_strahler_hop_bound_marks_unresolved(spark):
    from engine.geo.raster import strahler_orders
    # a depth-4 chain with max_rounds=2: the deepest cells stay 0
    chain = [(i, 0, 50 - i) for i in range(5)]
    df = spark.createDataFrame(chain, "gx long, gy long, w long")
    got = {(r.gx, r.gy): r.strahler
           for r in strahler_orders(df, max_rounds=2).collect()}
    # leaf resolves round 1; its parent round 2; beyond stays 0
    assert got[(0, 0)] == 1 and got[(1, 0)] == 1
    assert 0 in got.values()
