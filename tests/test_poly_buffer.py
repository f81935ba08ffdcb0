"""C-bf — covering-domain polygon buffering
(engine/geo/cells.py::dilate_cells vs oracle/geo.py::dilate_cells_py):
exact dilation parity on the real layer and randomized grids, ring
semantics at the grid edges (x wraps, y drops), k=0 identity, and the
compose-with-compaction leaf identity the driver key rides.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from engine.geo.cells import compact_cells, dilate_cells, erode_cells
from engine.geo.layer import PolygonLayer
from oracle.geo import dilate_cells_py, erode_cells_py


def _cov_df(spark, level=8):
    return PolygonLayer.from_json().build_df(spark, level).select(
        "poly_id", F.col("cell_p").alias("cell"))


def _by_poly(level=8):
    out = {}
    for cell, pid, _ in PolygonLayer.from_json().covering(level):
        out.setdefault(pid, []).append(cell)
    return out


def test_dilate_matches_python_oracle_on_layer(spark):
    got = {}
    for r in dilate_cells(_cov_df(spark), level=8, k=2).collect():
        got.setdefault(r.poly_id, []).append(r.cell)
    exp = {pid: dilate_cells_py(cells, 8, 2)
           for pid, cells in _by_poly().items()}
    assert set(got) == set(exp)
    for pid in exp:
        assert sorted(got[pid]) == exp[pid], pid


def test_dilate_k0_is_identity(spark):
    got = {(r.poly_id, r.cell)
           for r in dilate_cells(_cov_df(spark), level=8, k=0).collect()}
    exp = {(pid, c) for pid, cells in _by_poly().items() for c in cells}
    assert got == exp


def test_dilate_randomized_vs_oracle(spark):
    rng = np.random.default_rng(13)
    for seed, k in ((0, 1), (1, 2), (2, 3)):
        cells = sorted(rng.choice(1024, size=120 + seed * 40,
                                  replace=False).tolist())
        df = spark.createDataFrame([("p", int(c)) for c in cells],
                                   "poly_id string, cell long")
        got = sorted(r.cell for r in
                     dilate_cells(df, level=5, k=k).collect())
        assert got == dilate_cells_py(cells, 5, k), (seed, k)


def test_dilate_edge_semantics_wrap_x_drop_y(spark):
    # level 3 grid (8x8): corner cell (0, 0) -> morton 0.  k=1 must
    # wrap x to 7 and drop the y=-1 row: 6 cells, not 9.
    df = spark.createDataFrame([("p", 0)], "poly_id string, cell long")
    got = sorted(r.cell for r in dilate_cells(df, level=3, k=1).collect())
    assert got == dilate_cells_py([0], 3, 1)
    assert len(got) == 6
    xs, ys = set(), set()
    for c in got:
        x = ((c & 1) | ((c >> 1) & 2) | ((c >> 2) & 4))
        y = (((c >> 1) & 1) | ((c >> 2) & 2) | ((c >> 3) & 4))
        xs.add(x), ys.add(y)
    assert xs == {0, 1, 7} and ys == {0, 1}


def _leafset(pairs, level):
    out = set()
    for lv, c in pairs:
        d = level - lv
        base = c << (2 * d)
        out.update(range(base, base + (1 << (2 * d))))
    return out


def test_buffer_compact_leaf_identity(spark):
    """The driver key's composition: compact(dilate(cov)) expanded back
    to level-8 leaves == the oracle dilation set, per polygon."""
    buf = dilate_cells(_cov_df(spark), level=8, k=2)
    rows = compact_cells(buf, level=8, min_level=4).collect()
    got = {}
    for r in rows:
        got.setdefault(r.poly_id, []).append((r.level, r.cell))
    for pid, cells in _by_poly().items():
        assert _leafset(got[pid], 8) == set(dilate_cells_py(cells, 8, 2)), pid


def test_erode_matches_python_oracle_on_layer(spark):
    got = {}
    for r in erode_cells(_cov_df(spark), level=8, k=1).collect():
        got.setdefault(r.poly_id, []).append(r.cell)
    exp = {pid: erode_cells_py(cells, 8, 1)
           for pid, cells in _by_poly().items()}
    # polygons fully eroded away drop out of the Spark result
    exp = {pid: cells for pid, cells in exp.items() if cells}
    assert set(got) == set(exp)
    for pid in exp:
        assert sorted(got[pid]) == exp[pid], pid


def test_erode_k0_is_identity(spark):
    got = {(r.poly_id, r.cell)
           for r in erode_cells(_cov_df(spark), level=8, k=0).collect()}
    exp = {(pid, c) for pid, cells in _by_poly().items() for c in cells}
    assert got == exp


def test_erode_randomized_and_duality(spark):
    """Random level-4 coverings: erosion matches the sequential oracle,
    and equals the complement of the dilation of the complement (the
    morphological duality, with out-of-grid rows read as outside)."""
    rng = np.random.default_rng(41)
    n = 16
    for seed in range(3):
        cells = sorted(rng.choice(n * n, size=100 + 30 * seed,
                                  replace=False).tolist())
        df = spark.createDataFrame([("p", int(c)) for c in cells],
                                   "poly_id string, cell long")
        got = sorted(r.cell for r in
                     erode_cells(df, level=4, k=1).collect())
        exp = erode_cells_py(cells, 4, 1)
        assert got == exp, seed
        comp = sorted(set(range(n * n)) - set(cells))
        dil_comp = set(dilate_cells_py(comp, 4, 1))
        # duality: erode(X) == X \ dilate(complement X), EXCEPT that
        # cells whose disk pokes past the y range erode regardless
        # (outside rows are absent but not representable in comp)
        dual = []
        for c in cells:
            y = (((c >> 1) & 1) | ((c >> 2) & 2) | ((c >> 3) & 4)
                 | ((c >> 4) & 8))
            if c in dil_comp or y == 0 or y == n - 1:
                continue
            dual.append(c)
        assert got == sorted(dual), seed


def test_open_close_sandwich_theorems(spark):
    """dilate(erode(X)) ⊆ X ⊆ erode(dilate(X)) — opening shrinks,
    closing grows, on every polygon of the real layer."""
    cov = _cov_df(spark)
    orig = {pid: set(cells) for pid, cells in _by_poly().items()}
    opened = {}
    for r in dilate_cells(erode_cells(cov, level=8, k=1),
                          level=8, k=1).collect():
        opened.setdefault(r.poly_id, set()).add(r.cell)
    closed = {}
    for r in erode_cells(dilate_cells(cov, level=8, k=1),
                         level=8, k=1).collect():
        closed.setdefault(r.poly_id, set()).add(r.cell)
    for pid, cells in orig.items():
        assert opened.get(pid, set()) <= cells, pid
        assert cells <= closed[pid], pid


def test_buffer_contains_original_and_is_bounded(spark):
    """Every original cell survives the buffer; every buffered leaf is
    within Chebyshev distance k of some original cell (x wrap-aware)."""
    k = 2
    got = {}
    for r in dilate_cells(_cov_df(spark), level=8, k=k).collect():
        got.setdefault(r.poly_id, set()).add(r.cell)
    for pid, cells in _by_poly().items():
        assert set(cells) <= got[pid]
        orig_xy = set()
        for c in cells:
            x = y = 0
            for i in range(8):
                x |= ((c >> (2 * i)) & 1) << i
                y |= ((c >> (2 * i + 1)) & 1) << i
            orig_xy.add((x, y))
        for c in got[pid]:
            x = y = 0
            for i in range(8):
                x |= ((c >> (2 * i)) & 1) << i
                y |= ((c >> (2 * i + 1)) & 1) << i
            assert any(
                min(abs(x - ox), 256 - abs(x - ox)) <= k
                and abs(y - oy) <= k
                for ox, oy in orig_xy), (pid, c)
