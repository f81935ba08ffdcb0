"""Zevenbergen-Thorne curvature (engine/geo/raster.py::zt_curvature)
and Riley terrain ruggedness (tri_index): brute-force dense-grid parity
(absent cells are TRUE ZEROS on a count raster), the quadratic-surface
recovery theorem (d2/e2/f4 read the surface's second-order coefficients
exactly on interior cells), the plane-has-zero-curvature and
paraboloid closed-form theorems, isolated/uniform cases, repartition
invariance.  DuckDB value-hash parity for the driver keys runs in
test_entry_contract's sweep."""

from __future__ import annotations

import numpy as np

from engine.geo.raster import tri_index, zt_curvature

ROWS = [
    (0, 0, 5),
    (1, 0, 3), (2, 0, 1), (2, 1, 4), (1, 1, 9), (0, 1, 2),
    (0, 2, 7), (1, 2, 7), (2, 2, 7),
    (10, 10, 6),             # isolated
    (5, 0, 2), (6, 0, 2), (7, 0, 2),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "gx long, gy long, w long")


def _curv_brute(rows):
    occ = {(x, y): w for x, y, w in rows}

    def z(x, y):
        return occ.get((x, y), 0)

    out = {}
    for (x, y), w in occ.items():
        d2 = z(x - 1, y) + z(x + 1, y) - 2 * w
        e2 = z(x, y - 1) + z(x, y + 1) - 2 * w
        f4 = (-z(x - 1, y + 1) + z(x + 1, y + 1)
              + z(x - 1, y - 1) - z(x + 1, y - 1))
        g2 = z(x + 1, y) - z(x - 1, y)
        h2 = z(x, y + 1) - z(x, y - 1)
        plan = 2 * d2 * h2 * h2 + 2 * e2 * g2 * g2 - f4 * g2 * h2
        prof = -(2 * d2 * g2 * g2 + 2 * e2 * h2 * h2 + f4 * g2 * h2)
        den = 2 * (g2 * g2 + h2 * h2)
        out[(x, y)] = (w, d2, e2, f4, g2, h2, d2 + e2, plan, prof, den)
    return out


def _got_curv(spark, rows):
    return {(r.gx, r.gy): (r.w, r.d2, r.e2, r.f4, r.g2, r.h2,
                           r.laplace2, r.plan_num, r.prof_num, r.curv_den)
            for r in zt_curvature(_df(spark, rows)).collect()}


def test_curvature_brute_parity(spark):
    assert _got_curv(spark, ROWS) == _curv_brute(ROWS)


def test_curvature_random_vs_brute(spark):
    rng = np.random.default_rng(7)
    pts = {(int(x), int(y)) for x, y in
           zip(rng.integers(0, 12, 150), rng.integers(0, 12, 150))}
    rows = [(x, y, int(1 + (x * 7 + y * 13) % 9)) for x, y in pts]
    assert _got_curv(spark, rows) == _curv_brute(rows)


def test_curvature_quadratic_recovery(spark):
    # z = A x^2 + B y^2 + C xy + D x + E y + K on a dense grid: every
    # INTERIOR cell must read d2 = 2A, e2 = 2B, f4 = 4C exactly.
    A, B, C, D, E, K = 3, -2, 5, 7, -4, 100
    n = 8
    rows = [(x, y, A * x * x + B * y * y + C * x * y + D * x + E * y + K)
            for x in range(n) for y in range(n)]
    got = _got_curv(spark, rows)
    for x in range(1, n - 1):
        for y in range(1, n - 1):
            w, d2, e2, f4, g2, h2, lap, _, _, _ = got[(x, y)]
            assert (d2, e2, f4) == (2 * A, 2 * B, 4 * C)
            assert lap == 2 * A + 2 * B
            # first-order reads: g2 = 2 z_x = 4Ax + 2Cy + 2D
            assert g2 == 4 * A * x + 2 * C * y + 2 * D
            assert h2 == 4 * B * y + 2 * C * x + 2 * E


def test_plane_has_zero_curvature(spark):
    # linear surface: both curvature numerators vanish on interior
    # cells while the gradient (curv_den) does not.
    rows = [(x, y, 3 * x + 5 * y + 20)
            for x in range(6) for y in range(6)]
    got = _got_curv(spark, rows)
    for x in range(1, 5):
        for y in range(1, 5):
            _, d2, e2, f4, g2, h2, lap, plan, prof, den = got[(x, y)]
            assert (d2, e2, f4, lap, plan, prof) == (0, 0, 0, 0, 0, 0)
            assert den == 2 * (6 * 6 + 10 * 10)


def test_paraboloid_closed_form(spark):
    # z = A(x^2 + y^2): plan_num/curv_den = 2A, prof_num/curv_den = -2A
    # on every interior non-flat cell (exact rational, so exact here).
    A, n = 2, 8
    rows = [(x, y, A * (x * x + y * y)) for x in range(n) for y in range(n)]
    got = _got_curv(spark, rows)
    for x in range(1, n - 1):
        for y in range(1, n - 1):
            _, _, _, _, _, _, _, plan, prof, den = got[(x, y)]
            assert den > 0
            assert plan == 2 * A * den
            assert prof == -2 * A * den


def test_curvature_isolated_and_repartition(spark):
    got = _got_curv(spark, ROWS)
    # isolated cell: all neighbors zero -> d2 = e2 = -2w, no tilt terms
    assert got[(10, 10)] == (6, -12, -12, 0, 0, 0, -24, 0, 0, 0)
    a = zt_curvature(_df(spark, ROWS))
    b = zt_curvature(_df(spark, ROWS).repartition(7))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --------------------------------------------------------------- TRI

def _tri_brute(rows):
    occ = {(x, y): w for x, y, w in rows}
    out = {}
    for (x, y), w in occ.items():
        ds = [w - occ.get((x + rx, y + ry), 0)
              for rx in (-1, 0, 1) for ry in (-1, 0, 1)
              if not (rx == 0 and ry == 0)]
        out[(x, y)] = (w, sum(abs(d) for d in ds),
                       sum(d * d for d in ds))
    return out


def _got_tri(spark, rows):
    return {(r.gx, r.gy): (r.w, r.tri, r.tri2)
            for r in tri_index(_df(spark, rows)).collect()}


def test_tri_brute_parity(spark):
    assert _got_tri(spark, ROWS) == _tri_brute(ROWS)


def test_tri_isolated_and_uniform(spark):
    got = _got_tri(spark, ROWS)
    # isolated: every neighbor is a true zero -> maximal relief
    assert got[(10, 10)] == (6, 8 * 6, 8 * 36)
    # uniform block center: zero ruggedness
    flat = [(x, y, 3) for x in range(5) for y in range(5)]
    assert _got_tri(spark, flat)[(2, 2)] == (3, 0, 0)


def test_tri_random_vs_brute_and_repartition(spark):
    rng = np.random.default_rng(19)
    pts = {(int(x), int(y)) for x, y in
           zip(rng.integers(0, 12, 140), rng.integers(0, 12, 140))}
    rows = [(x, y, int(1 + (x * 5 + y * 11) % 7)) for x, y in pts]
    assert _got_tri(spark, rows) == _tri_brute(rows)
    a = tri_index(_df(spark, rows))
    b = tri_index(_df(spark, rows).repartition(5))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
