"""C-ls — per-row line-of-sight visibility
(engine/geo/raster.py::line_of_sight): Fraction-exact sequential
oracle parity on random sparse rasters, the floor-scaling
order-preservation theorem the driver twin's cross-multiplied
NOT-EXISTS relies on, grazing-ray (tie) semantics, and closed-form
rows (monotone ridge all-visible, flat row first-only).
"""
from __future__ import annotations

from fractions import Fraction

import numpy as np

from engine.geo.raster import line_of_sight


def _los_py(cells):
    """Sequential Fraction-exact oracle: cells = [(gx, gy, w)] ->
    {(gx, gy): vis}.  Observer at x=-1 height 0 per row; visible iff
    the exact angle w/(gx+1) strictly exceeds every earlier cell's."""
    rows = {}
    for gx, gy, w in cells:
        rows.setdefault(gy, []).append((gx, w))
    out = {}
    for gy, r in rows.items():
        best = Fraction(-1)
        for gx, w in sorted(r):
            a = Fraction(w, gx + 1)
            out[(gx, gy)] = 1 if a > best else 0
            if a > best:
                best = a
    return out


def _run(spark, cells, scale=1 << 20):
    df = spark.createDataFrame(cells, "gx long, gy long, w long")
    return {(r.gx, r.gy): (r.vis, r.ang)
            for r in line_of_sight(df, scale=scale).collect()}


def test_los_matches_fraction_oracle_randomized(spark):
    rng = np.random.default_rng(29)
    for seed in range(4):
        n = 300 + seed * 100
        gx = rng.integers(0, 128, n)
        gy = rng.integers(0, 16, n)
        w = rng.integers(1, 1000, n)
        seen, cells = set(), []
        for a, b, c in zip(gx, gy, w):
            if (int(a), int(b)) not in seen:
                seen.add((int(a), int(b)))
                cells.append((int(a), int(b), int(c)))
        got = _run(spark, cells)
        exp = _los_py(cells)
        assert {k: v[0] for k, v in got.items()} == exp, seed


def test_los_grazing_tie_is_blocked(spark):
    # w=2 at x=1 (angle 1) then w=3 at x=2 (angle 1): exact tie ->
    # blocked; w=4 at x=2 (angle 4/3) -> visible.
    got = _run(spark, [(1, 0, 2), (2, 0, 3), (1, 1, 2), (2, 1, 4)])
    assert got[(1, 0)][0] == 1 and got[(2, 0)][0] == 0
    assert got[(1, 1)][0] == 1 and got[(2, 1)][0] == 1


def test_los_closed_forms(spark):
    # Strict ridge w = 4^gx: 4^i/(i+1) > 4^(i-1)/i for all i >= 1
    # (note 2^gx would TIE at i=1: 2/2 == 1/1), so every angle beats
    # every predecessor.
    ridge = [(i, 0, 1 << (2 * i)) for i in range(20)]
    # Flat row: equal heights, angle strictly decreasing -> first only.
    flat = [(i, 1, 7) for i in range(20)]
    # Sparse row: absent cells never occlude (true zeros).
    sparse = [(0, 2, 5), (100, 2, 6)]
    got = _run(spark, ridge + flat + sparse)
    assert all(got[(i, 0)][0] == 1 for i in range(20))
    assert got[(0, 1)][0] == 1
    assert all(got[(i, 1)][0] == 0 for i in range(1, 20))
    assert got[(0, 2)][0] == 1
    # 6/101 < 5/1 -> blocked
    assert got[(100, 2)][0] == 0


def test_floor_scaling_preserves_exact_order():
    """The theorem the driver twin rides: for x in [0, 128) and any
    positive integer heights, floor(w * 2^20 / (x+1)) compares exactly
    like Fraction(w, x+1) — distinct rationals with denominators <= 128
    differ by >= 1/128^2, and 2^20 >= 128^2."""
    rng = np.random.default_rng(31)
    scale = 1 << 20
    for _ in range(20000):
        x1, x2 = rng.integers(0, 128, 2)
        w1, w2 = rng.integers(1, 10**6, 2)
        a1 = (int(w1) * scale) // (int(x1) + 1)
        a2 = (int(w2) * scale) // (int(x2) + 1)
        f1 = Fraction(int(w1), int(x1) + 1)
        f2 = Fraction(int(w2), int(x2) + 1)
        assert (a1 > a2) == (f1 > f2) and (a1 == a2) == (f1 == f2)


def test_los_partition_invariant(spark):
    rng = np.random.default_rng(37)
    cells = [(int(x), int(y), int(w)) for x, y, w in
             zip(rng.permutation(64), rng.integers(0, 4, 64),
                 rng.integers(1, 50, 64))]
    seen, uniq = set(), []
    for c in cells:
        if (c[0], c[1]) not in seen:
            seen.add((c[0], c[1]))
            uniq.append(c)
    df = spark.createDataFrame(uniq, "gx long, gy long, w long")
    a = {(r.gx, r.gy, r.vis) for r in line_of_sight(df).collect()}
    b = {(r.gx, r.gy, r.vis)
         for r in line_of_sight(df.repartition(13)).collect()}
    assert a == b


# ------------------------------------------------- 2-D viewshed

def _vs_ref(cells, grid):
    """Sequential Fraction-exact reference for viewshed."""
    from fractions import Fraction
    from math import gcd
    out = {}
    rays = {}
    for (x, y), w in cells.items():
        vx, vy = x + 1, y + 1
        g = gcd(vx, vy)
        rays.setdefault((vx // g, vy // g), []).append((x, y, w))
    for ray, cs in rays.items():
        cs.sort(key=lambda c: (c[0] + 1) ** 2 + (c[1] + 1) ** 2)
        best = Fraction(-1)
        for x, y, w in cs:
            d2 = (x + 1) ** 2 + (y + 1) ** 2
            ang = Fraction(w * w, d2)
            out[(x, y)] = int(w > 0 and ang > best)
            best = max(best, ang)
    return out


def test_viewshed_matches_fraction_reference(spark):
    import random
    from engine.geo.raster import viewshed
    rng = random.Random(19)
    cells = {(rng.randrange(20), rng.randrange(20)): rng.randrange(0, 9)
             for _ in range(160)}
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in sorted(cells.items())],
        "gx long, gy long, w long")
    got = {(r.gx, r.gy): r.vis for r in viewshed(df, grid=20).collect()}
    assert got == _vs_ref(cells, 20)


def test_viewshed_diagonal_ray_occlusion(spark):
    from engine.geo.raster import viewshed
    # cells (0,0), (1,1), (3,3) share the diagonal ray.  Heights 2/4/8:
    # angles 2/sqrt(2) > 4/sqrt(8)? 4/8 = 2, 16/8 = 2 — EQUAL squared
    # angles (grazing): (1,1) is blocked; (3,3) with 64/32 = 2 also
    # grazes and is blocked.  Raising (3,3) to 9 -> 81/32 > 2: visible.
    cells = [(0, 0, 2), (1, 1, 4), (3, 3, 8)]
    df = spark.createDataFrame(cells, "gx long, gy long, w long")
    got = {(r.gx, r.gy): r.vis for r in viewshed(df, grid=8).collect()}
    assert got == {(0, 0): 1, (1, 1): 0, (3, 3): 0}
    df2 = spark.createDataFrame([(0, 0, 2), (1, 1, 4), (3, 3, 9)],
                                "gx long, gy long, w long")
    got2 = {(r.gx, r.gy): r.vis for r in viewshed(df2, grid=8).collect()}
    assert got2[(3, 3)] == 1


def test_viewshed_rays_are_independent(spark):
    from engine.geo.raster import viewshed
    # a huge tower on one ray must not occlude a different ray
    cells = [(1, 0, 100), (0, 1, 1)]
    df = spark.createDataFrame(cells, "gx long, gy long, w long")
    got = {(r.gx, r.gy): r.vis for r in viewshed(df, grid=4).collect()}
    assert got == {(1, 0): 1, (0, 1): 1}
