"""Horn slope/aspect (engine/geo/raster.py::horn_slope): brute-force
dense-grid parity (absent cells are TRUE ZEROS on a count raster),
octant boundary semantics of the shared OCTANT_CASE text, isolated-cell
flatness, repartition invariance.  DuckDB value-hash parity for the
driver key runs in test_entry_contract's sweep."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from engine.geo.raster import OCTANT_CASE, horn_slope

ROWS = [
    # a 3x3 plateau with a peak, an isolated cell, and a ridge touching
    # the raster edge (zero padding exercised on every side)
    (0, 0, 5),
    (1, 0, 3), (2, 0, 1), (2, 1, 4), (1, 1, 9), (0, 1, 2),
    (0, 2, 7), (1, 2, 7), (2, 2, 7),
    (10, 10, 6),             # isolated: no neighbor within the stencil
    (5, 0, 2), (6, 0, 2), (7, 0, 2),
]


def _brute(rows):
    occ = {(x, y): w for x, y, w in rows}

    def z(x, y):
        return occ.get((x, y), 0)

    out = {}
    for (x, y), w in occ.items():
        gx8 = (z(x + 1, y + 1) + 2 * z(x + 1, y) + z(x + 1, y - 1)) \
            - (z(x - 1, y + 1) + 2 * z(x - 1, y) + z(x - 1, y - 1))
        gy8 = (z(x + 1, y + 1) + 2 * z(x, y + 1) + z(x - 1, y + 1)) \
            - (z(x + 1, y - 1) + 2 * z(x, y - 1) + z(x - 1, y - 1))
        out[(x, y)] = (w, gx8, gy8, gx8 * gx8 + gy8 * gy8,
                       _octant(gx8, gy8))
    return out


def _octant(gx8, gy8):
    if gx8 == 0 and gy8 == 0:
        return -1
    if gx8 > 0 and gy8 >= 0 and gx8 > gy8:
        return 0
    if gx8 > 0 and gy8 > 0:
        return 1
    if gx8 <= 0 and gy8 > 0 and -gx8 < gy8:
        return 2
    if gx8 < 0 and gy8 > 0:
        return 3
    if gx8 < 0 and gy8 <= 0 and -gx8 > -gy8:
        return 4
    if gx8 < 0 and gy8 < 0:
        return 5
    if gx8 >= 0 and gy8 < 0 and gx8 < -gy8:
        return 6
    return 7


def _df(spark, rows):
    return spark.createDataFrame(rows, "gx long, gy long, w long")


def test_brute_force_parity(spark):
    got = {(r.gx, r.gy): (r.w, r.gx8, r.gy8, r.slope2, r.octant)
           for r in horn_slope(_df(spark, ROWS)).collect()}
    assert got == _brute(ROWS)


def test_isolated_cell_is_flat(spark):
    got = {(r.gx, r.gy): r for r in
           horn_slope(_df(spark, ROWS)).collect()}
    iso = got[(10, 10)]
    assert (iso.gx8, iso.gy8, iso.slope2, iso.octant) == (0, 0, 0, -1)


def test_octant_boundaries(spark):
    # the 8 sector interiors, the 8 half-open 45-degree boundaries
    # (committed CCW: angle k*45 belongs to sector k), and flat
    vectors = [
        (0, 0, -1),
        (2, 0, 0), (2, 1, 0),    # [0,45) interior
        (2, 2, 1), (1, 2, 1),    # 45 boundary -> 1, interior
        (0, 2, 2), (-1, 2, 2),   # 90 boundary -> 2, interior
        (-2, 2, 3), (-2, 1, 3),  # 135 boundary -> 3, interior
        (-2, 0, 4), (-2, -1, 4),  # 180 boundary -> 4, interior
        (-2, -2, 5), (-1, -2, 5),  # 225 boundary -> 5, interior
        (0, -2, 6), (1, -2, 6),  # 270 boundary -> 6, interior
        (2, -2, 7), (2, -1, 7),  # 315 boundary -> 7, interior
    ]
    df = spark.createDataFrame(
        [(gx, gy) for gx, gy, _ in vectors], "gx8 long, gy8 long")
    got = [r.o for r in
           df.select(F.expr(OCTANT_CASE).alias("o")).collect()]
    assert got == [exp for _, _, exp in vectors]
    # and the python replica used by _brute agrees with the SQL text
    assert got == [_octant(gx, gy) for gx, gy, _ in vectors]


def test_repartition_invariance(spark):
    a = horn_slope(_df(spark, ROWS))
    b = horn_slope(_df(spark, ROWS).repartition(7))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_random_raster_vs_brute(spark):
    rng = np.random.default_rng(42)
    pts = {(int(x), int(y)) for x, y in
           zip(rng.integers(0, 12, 150), rng.integers(0, 12, 150))}
    rows = [(x, y, int(1 + (x * 7 + y * 13) % 9)) for x, y in pts]
    got = {(r.gx, r.gy): (r.w, r.gx8, r.gy8, r.slope2, r.octant)
           for r in horn_slope(_df(spark, rows)).collect()}
    assert got == _brute(rows)


# --------------------------------------------------------------- TPI

from engine.geo.raster import tpi_index


def _tpi_brute(rows):
    occ = {(x, y): w for x, y, w in rows}
    out = {}
    for (x, y), w in occ.items():
        s = sum(occ.get((x + rx, y + ry), 0)
                for rx in (-1, 0, 1) for ry in (-1, 0, 1)
                if not (rx == 0 and ry == 0))
        t = 8 * w - s
        out[(x, y)] = (w, s, t, (t > 0) - (t < 0))
    return out


def test_tpi_brute_force_parity(spark):
    got = {(r.gx, r.gy): (r.w, r.nbr_sum, r.tpi8, r.cls)
           for r in tpi_index(_df(spark, ROWS)).collect()}
    assert got == _tpi_brute(ROWS)


def test_tpi_isolated_and_uniform(spark):
    got = {(r.gx, r.gy): r for r in tpi_index(_df(spark, ROWS)).collect()}
    iso = got[(10, 10)]
    # isolated cell: all 8 neighbors are zero -> maximally ridge-like
    assert (iso.nbr_sum, iso.tpi8, iso.cls) == (0, 48, 1)
    # a flat 5x5 block's center cell is neutral
    flat = [(x, y, 3) for x in range(5) for y in range(5)]
    center = {(r.gx, r.gy): r for r in
              tpi_index(_df(spark, flat)).collect()}[(2, 2)]
    assert (center.nbr_sum, center.tpi8, center.cls) == (24, 0, 0)


def test_tpi_random_vs_brute_and_repartition(spark):
    rng = np.random.default_rng(11)
    pts = {(int(x), int(y)) for x, y in
           zip(rng.integers(0, 12, 140), rng.integers(0, 12, 140))}
    rows = [(x, y, int(1 + (x * 5 + y * 11) % 7)) for x, y in pts]
    a = tpi_index(_df(spark, rows))
    b = tpi_index(_df(spark, rows).repartition(5))
    got = {(r.gx, r.gy): (r.w, r.nbr_sum, r.tpi8, r.cls)
           for r in a.collect()}
    assert got == _tpi_brute(rows)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
