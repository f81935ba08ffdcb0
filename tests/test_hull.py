"""hull_per_group (late r4) — randomized brute-force oracles for the
chain kernel, the Akl-Toussaint prune (must not change the hull), and
the distributed operator end to end."""

from __future__ import annotations

import numpy as np
import pytest

from engine.geo.hull import (_cross, chain_hull_py, diameter_py,
                             hull_diameter, hull_per_group)


def _brute_hull_checks(pts, hull):
    """Invariants any strict hull must satisfy vs its input set."""
    ptset = set(map(tuple, pts))
    assert set(hull) <= ptset
    assert len(set(hull)) == len(hull)
    if len(hull) >= 3:
        n = len(hull)
        for i in range(n):
            a, b = hull[i], hull[(i + 1) % n]
            # every input point strictly left or on the edge; none right
            assert all(_cross(a, b, p) >= 0 for p in ptset)
            # strict hull: consecutive triples never collinear
            assert _cross(a, b, hull[(i + 2) % n]) > 0
    # canonical start: lexicographic min of the hull vertex set
    assert hull[0] == min(hull)
    # every extreme point is a vertex
    for kx, ky in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1)):
        m = max(kx * p[0] + ky * p[1] for p in ptset)
        arg = [p for p in ptset if kx * p[0] + ky * p[1] == m]
        if len(arg) == 1:
            assert arg[0] in hull


@pytest.mark.parametrize("seed", range(12))
def test_chain_hull_randomized(seed):
    r = np.random.default_rng(seed)
    n = int(r.integers(1, 60))
    lo, hi = (0, 8) if seed % 3 == 0 else (0, 10 ** 9)  # dense dup / sparse
    pts = [tuple(map(int, p)) for p in r.integers(lo, hi, (n, 2))]
    _brute_hull_checks(pts, chain_hull_py(pts))


def test_chain_hull_degenerate():
    assert chain_hull_py([(5, 5)] * 4) == [(5, 5)]
    assert chain_hull_py([(1, 1), (9, 9), (5, 5), (3, 3)]) == [(1, 1), (9, 9)]
    assert chain_hull_py([(0, 0), (4, 0), (2, 0), (1, 0)]) == [(0, 0), (4, 0)]
    # square + interior + collinear edge midpoints -> strict 4-vertex hull
    sq = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 0), (10, 5), (5, 5)]
    assert chain_hull_py(sq) == [(0, 0), (10, 0), (10, 10), (0, 10)]


def test_hull_per_group_matches_unpruned_chain(spark):
    """The distributed op (prune + grouped-map) must equal the pure
    chain over each FULL group — proving the octagon prune is lossless."""
    r = np.random.default_rng(7)
    rows = []
    for gid in range(6):
        n = int(r.integers(1, 300))
        lo, hi = (0, 6) if gid % 3 == 0 else (0, 2 ** 30)
        for p in r.integers(lo, hi, (n, 2)):
            rows.append((gid, int(p[0]), int(p[1])))
    df = spark.createDataFrame(rows, "gid long, xi long, yi long")
    got = {}
    for row in hull_per_group(df, ["gid"], "xi", "yi").collect():
        got.setdefault(row.gid, {})[row.hull_idx] = (
            row.hx, row.hy, row.hull_size)
    by_gid = {}
    for gid, x, y in rows:
        by_gid.setdefault(gid, []).append((x, y))
    for gid, pts in by_gid.items():
        want = chain_hull_py(pts)
        assert len(got[gid]) == len(want)
        for i, p in enumerate(want):
            assert got[gid][i][:2] == p
            assert got[gid][i][2] == len(want)


def _brute_diameter(pts):
    """All-pairs reference (ordered canonical pair, self-pair for n=1)."""
    best = None
    ps = sorted(set(map(tuple, pts)))
    for i in range(len(ps)):
        for j in range(i, len(ps)):
            a, b = ps[i], ps[j]
            d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            cand = (-d2, a, b)
            if best is None or cand < best:
                best = cand
    return -best[0], best[1], best[2]


@pytest.mark.parametrize("seed", range(10))
def test_diameter_py_randomized(seed):
    """diameter over hull vertices == all-pairs brute force, incl. the
    canonical tie-broken pair (dense grids force distance ties)."""
    r = np.random.default_rng(100 + seed)
    n = int(r.integers(1, 80))
    lo, hi = (0, 5) if seed % 2 == 0 else (0, 10 ** 9)
    pts = [tuple(map(int, p)) for p in r.integers(lo, hi, (n, 2))]
    assert diameter_py(pts) == _brute_diameter(pts)


def test_hull_diameter_matches_brute(spark):
    r = np.random.default_rng(11)
    rows = []
    for gid in range(5):
        n = int(r.integers(1, 200))
        lo, hi = (0, 6) if gid % 2 == 0 else (0, 2 ** 30)
        for p in r.integers(lo, hi, (n, 2)):
            rows.append((gid, int(p[0]), int(p[1])))
    rows.append((9, 7, 7))  # single-point group -> self-pair, d2 = 0
    df = spark.createDataFrame(rows, "gid long, xi long, yi long")
    got = {row.gid: (row.d2, (row.ax, row.ay), (row.bx, row.by))
           for row in hull_diameter(df, ["gid"], "xi", "yi").collect()}
    by_gid = {}
    for gid, x, y in rows:
        by_gid.setdefault(gid, []).append((x, y))
    assert set(got) == set(by_gid)
    for gid, pts in by_gid.items():
        assert got[gid] == _brute_diameter(pts)


def test_hull_per_group_plan_broadcasts_octagon(spark):
    df = spark.createDataFrame([(0, 1, 2)], "gid long, xi long, yi long")
    plan = hull_per_group(df, ["gid"])._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------- min-area rectangle

def _brute_mrr(pts):
    """Independent O(h^2) recompute straight from min_rect_py's
    docstring theorem, but via Fractions for the comparison so the
    winning edge is chosen EXACTLY (guards the engine's double-min
    against a wrong-edge pick, not just against drift)."""
    from fractions import Fraction

    from engine.geo.hull import chain_hull_py
    hull = chain_hull_py(pts)
    if len(hull) < 2:
        return Fraction(0)
    best = None
    for i in range(len(hull)):
        ux, uy = hull[i]
        vx, vy = hull[(i + 1) % len(hull)]
        dx, dy = vx - ux, vy - uy
        ss = [dx * (px - ux) + dy * (py - uy) for px, py in hull]
        ts = [dx * (py - uy) - dy * (px - ux) for px, py in hull]
        a = Fraction((max(ss) - min(ss)) * (max(ts) - min(ts)),
                     dx * dx + dy * dy)
        if best is None or a < best:
            best = a
    return best


def test_min_rect_matches_python(spark):
    import numpy as np

    from engine.geo.hull import min_rect_per_group, min_rect_py
    r = np.random.default_rng(11)
    rows = []
    for gid in range(8):
        n = int(r.integers(1, 60))
        for p in r.integers(0, 2 ** 30, (n, 2)):
            rows.append((gid, int(p[0]), int(p[1])))
    rows.append((8, 5, 5))                    # single point
    rows += [(9, i * 3, i * 7) for i in range(6)]   # collinear
    df = spark.createDataFrame(rows, "gid long, xi long, yi long")
    got = {row.gid: (row.n_hull, row.bbox_area, row.mrr_area)
           for row in min_rect_per_group(df, ["gid"], "xi", "yi").collect()}
    by_gid = {}
    for gid, x, y in rows:
        by_gid.setdefault(gid, []).append((x, y))
    assert set(got) == set(by_gid)
    for gid, pts in by_gid.items():
        n_hull, bbox, mrr = min_rect_py(pts)
        assert got[gid][0] == n_hull and got[gid][1] == bbox, gid
        # engine double == reference double (same IEEE op order)
        assert got[gid][2] == mrr, gid
        # and the double pick agrees with the exact-Fraction minimum
        # to float precision (wrong-edge picks would differ wildly)
        exact = float(_brute_mrr(pts))
        assert abs(got[gid][2] - exact) <= 1e-9 * max(exact, 1.0), gid
        # bounding-rectangle theorem: oriented min <= axis-aligned box
        assert got[gid][2] <= float(bbox) * (1 + 1e-12), gid
    assert got[8] == (1, 0, 0.0)
    assert got[9][0] == 2 and got[9][2] == 0.0


def test_min_rect_square_closed_form(spark):
    """An axis-aligned a x a square of points has mrr_area == a^2
    (the rectangle snaps to the square itself)."""
    from engine.geo.hull import min_rect_per_group
    a = 1000
    rows = [(0, x, y) for x in (0, a) for y in (0, a)]
    rows += [(0, 417, 293), (0, 500, 999)]  # interior noise
    df = spark.createDataFrame(rows, "gid long, xi long, yi long")
    row = min_rect_per_group(df, ["gid"], "xi", "yi").collect()[0]
    assert (row.n_hull, row.bbox_area, row.mrr_area) == (4, a * a,
                                                         float(a * a))


def test_min_rect_rotation_beats_bbox(spark):
    """A thin diagonal strip: the oriented rectangle is far smaller
    than the axis-aligned bbox (the operator's reason to exist)."""
    from engine.geo.hull import min_rect_per_group
    rows = [(0, i * 100, i * 100 + (i % 2)) for i in range(50)]
    df = spark.createDataFrame(rows, "gid long, xi long, yi long")
    row = min_rect_per_group(df, ["gid"], "xi", "yi").collect()[0]
    assert row.mrr_area < 0.01 * row.bbox_area


# --------------------------- minimum enclosing circle (B13, r5 cont.)

def _welzl(pts):
    """Independent exact MEC: Welzl's algorithm with Fraction
    arithmetic (recursive, deterministic order — a different algorithm
    family from the engine's candidate enumeration)."""
    import sys
    from fractions import Fraction

    sys.setrecursionlimit(10000)

    def circle2(a, b):
        cx = Fraction(a[0] + b[0], 2)
        cy = Fraction(a[1] + b[1], 2)
        r2 = (cx - a[0]) ** 2 + (cy - a[1]) ** 2
        return cx, cy, r2

    def circle3(a, b, c):
        d = 2 * ((b[0] - a[0]) * (c[1] - a[1])
                 - (b[1] - a[1]) * (c[0] - a[0]))
        if d == 0:
            return None
        a2 = a[0] ** 2 + a[1] ** 2
        b2 = b[0] ** 2 + b[1] ** 2
        c2 = c[0] ** 2 + c[1] ** 2
        ux = Fraction(a2 * (b[1] - c[1]) + b2 * (c[1] - a[1])
                      + c2 * (a[1] - b[1]), d)
        uy = Fraction(a2 * (c[0] - b[0]) + b2 * (a[0] - c[0])
                      + c2 * (b[0] - a[0]), d)
        return ux, uy, (ux - a[0]) ** 2 + (uy - a[1]) ** 2

    def inside(c, p):
        cx, cy, r2 = c
        return (cx - p[0]) ** 2 + (cy - p[1]) ** 2 <= r2

    def mec(ps, boundary):
        if not ps or len(boundary) == 3:
            if len(boundary) == 0:
                return Fraction(0), Fraction(0), Fraction(-1)
            if len(boundary) == 1:
                return (Fraction(boundary[0][0]),
                        Fraction(boundary[0][1]), Fraction(0))
            if len(boundary) == 2:
                return circle2(*boundary)
            return circle3(*boundary)
        p = ps[-1]
        c = mec(ps[:-1], boundary)
        if c[2] >= 0 and inside(c, p):
            return c
        return mec(ps[:-1], boundary + [p])

    return mec(sorted(set(pts)), [])


def test_min_circle_matches_welzl_random():
    import random

    from engine.geo.hull import min_circle_py
    rng = random.Random(31)
    for trial in range(20):
        pts = [(rng.randrange(1000), rng.randrange(1000))
               for _ in range(rng.randrange(2, 40))]
        n_pts, n_hull, r2, cx, cy = min_circle_py(pts)
        wx, wy, wr2 = _welzl(pts)
        assert r2 == pytest.approx(float(wr2), rel=1e-12)
        assert cx == pytest.approx(float(wx), abs=1e-9)
        assert cy == pytest.approx(float(wy), abs=1e-9)


def test_min_circle_exact_laws_and_degenerates():
    from fractions import Fraction

    from engine.geo.hull import chain_hull_py, min_circle_py
    # all points inside (exact, via the welzl rational circle) and
    # >=2 support points exactly on the boundary
    pts = [(0, 0), (10, 0), (5, 9), (5, 3), (2, 2), (8, 1)]
    wx, wy, wr2 = _welzl(pts)
    on = sum(1 for p in set(pts)
             if (wx - p[0]) ** 2 + (wy - p[1]) ** 2 == wr2)
    assert on >= 2
    assert all((wx - p[0]) ** 2 + (wy - p[1]) ** 2 <= wr2 for p in pts)
    # engine agrees
    _, _, r2, cx, cy = min_circle_py(pts)
    assert r2 == pytest.approx(float(wr2), rel=1e-12)
    # collinear points: diametral circle of the extremes
    col = [(i, 2 * i) for i in range(7)]
    _, n_hull, r2c, cxc, cyc = min_circle_py(col)
    assert (cxc, cyc) == (3.0, 6.0)
    assert r2c == pytest.approx((3 ** 2 + 6 ** 2), rel=1e-12)
    # single + duplicated point
    assert min_circle_py([(5, 7), (5, 7)])[1:] == (1, 0.0, 5.0, 7.0)
    # two points: center is the midpoint
    _, _, r2b, cxb, cyb = min_circle_py([(0, 0), (4, 0)])
    assert (r2b, cxb, cyb) == (4.0, 2.0, 0.0)


def test_min_circle_per_group_matches_kernel(spark):
    import random

    from engine.geo.hull import min_circle_per_group, min_circle_py
    rng = random.Random(5)
    rows = [(i % 3, rng.randrange(500), rng.randrange(500))
            for i in range(90)]
    df = spark.createDataFrame(rows, "g int, xi long, yi long")
    got = {r.g: (r.n_hull, r.r2, r.cx, r.cy)
           for r in min_circle_per_group(df, ["g"]).collect()}
    for g in range(3):
        pts = [(x, y) for gg, x, y in rows if gg == g]
        _, h, r2, cx, cy = min_circle_py(pts)
        assert got[g] == (h, r2, cx, cy)
