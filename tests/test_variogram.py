"""Empirical semivariogram (engine/geo/raster.py::variogram):
brute-force DENSE-grid pair-sum parity (the sparse
S_a + S_b - 2*S_12 decomposition vs literally enumerating every
in-bounds pair with absent cells as TRUE ZEROS), closed forms
(empty raster, uniform full grid -> gamma2_num = 0 with
n_both = n_pairs, isolated cell -> v^2 per in-bounds direction),
the n_pairs closed form, custom lag lists, repartition invariance.
DuckDB value-hash parity for the driver key runs in
test_entry_contract's sweep."""

from __future__ import annotations

import random

from engine.geo.raster import variogram

DEFAULT_LAGS = [(dx, dy) for dy in range(0, 4) for dx in range(-3, 4)
                if (dy > 0) or (dy == 0 and dx > 0)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "gx long, gy long, w long")


def _brute(rows, W, H, lags):
    occ = {(x, y): w for x, y, w in rows}
    out = {}
    for dx, dy in lags:
        n_pairs = n_both = g2 = 0
        for x in range(W):
            for y in range(H):
                tx, ty = x + dx, y + dy
                if not (0 <= tx < W and 0 <= ty < H):
                    continue
                n_pairs += 1
                a, b = occ.get((x, y)), occ.get((tx, ty))
                if a is not None and b is not None:
                    n_both += 1
                z1, z2 = (a or 0), (b or 0)
                g2 += (z1 - z2) * (z1 - z2)
        out[(dx, dy)] = (n_pairs, n_both, g2)
    return out


def _got(spark, rows, W, H, lags=None):
    df = variogram(_df(spark, rows), W, H, lags=lags)
    return {(r.dx, r.dy): (r.n_pairs, r.n_both, r.gamma2_num)
            for r in df.collect()}


ROWS = [
    (0, 0, 5), (1, 0, 3), (2, 1, 4), (1, 1, 9),
    (7, 7, 6),                       # isolated
    (3, 0, 2), (4, 0, 2), (5, 0, 2),
    (0, 9, 1), (9, 0, 8), (9, 9, 3),  # corners
]


def test_variogram_brute_parity(spark):
    assert _got(spark, ROWS, 10, 10) == _brute(ROWS, 10, 10, DEFAULT_LAGS)


def test_variogram_random_vs_brute(spark):
    rng = random.Random(20260820)
    rows = [(x, y, rng.randint(1, 9))
            for x in range(12) for y in range(8) if rng.random() < 0.35]
    assert _got(spark, rows, 12, 8) == _brute(rows, 12, 8, DEFAULT_LAGS)


def test_variogram_npairs_closed_form(spark):
    got = _got(spark, ROWS, 10, 10)
    for (dx, dy), (n_pairs, _, _) in got.items():
        assert n_pairs == (10 - abs(dx)) * (10 - abs(dy))


def test_variogram_uniform_full_grid(spark):
    rows = [(x, y, 4) for x in range(6) for y in range(6)]
    got = _got(spark, rows, 6, 6)
    for (dx, dy), (n_pairs, n_both, g2) in got.items():
        assert g2 == 0 and n_both == n_pairs


def test_variogram_isolated_cell(spark):
    # one occupied cell in the interior: each lag direction in bounds
    # contributes v^2 once as the forward endpoint and once as the
    # backward endpoint when both shifts stay inside the grid.
    v = 7
    got = _got(spark, [(5, 5, v)], 11, 11)
    for (dx, dy), (_, n_both, g2) in got.items():
        n_dirs = int(0 <= 5 + dx < 11 and 0 <= 5 + dy < 11) \
            + int(0 <= 5 - dx < 11 and 0 <= 5 - dy < 11)
        assert n_both == 0 and g2 == v * v * n_dirs


def test_variogram_empty(spark):
    got = _got(spark, [], 8, 8)
    assert got == {}  # sides agg over an empty frame yields no lag rows


def test_variogram_custom_lags(spark):
    lags = [(1, 0), (0, 1), (5, 2)]
    assert _got(spark, ROWS, 10, 10, lags) == _brute(ROWS, 10, 10, lags)


def test_variogram_repartition_invariance(spark):
    df = _df(spark, ROWS).repartition(7)
    got = {(r.dx, r.dy): (r.n_pairs, r.n_both, r.gamma2_num)
           for r in variogram(df, 10, 10).collect()}
    assert got == _brute(ROWS, 10, 10, DEFAULT_LAGS)
