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


# ----------------------------------------------------------- ring tracing

def _bfs_holes(cells: set[tuple[int, int]]) -> int:
    """Oracle hole count: bounded 8-CONNECTED components of the
    complement inside a 1-cell frame around the bbox.  8-connectivity is
    the Jordan-duality convention for 4-connected foreground (the one
    the leftmost-turn tracer implements): two holes touching diagonally
    are one hole; a pocket leaking diagonally to the outside is no hole
    at all (the outer ring wraps it as a slit)."""
    if not cells:
        return 0
    xs = [x for x, _ in cells]; ys = [y for _, y in cells]
    x0, x1, y0, y1 = min(xs) - 1, max(xs) + 1, min(ys) - 1, max(ys) + 1
    comp_cells = {(x, y) for x in range(x0, x1 + 1)
                  for y in range(y0, y1 + 1)} - cells
    seen, comps = set(), []
    for start in comp_cells:
        if start in seen:
            continue
        comp, dq = set(), deque([start])
        seen.add(start)
        while dq:
            x, y = dq.popleft()
            comp.add((x, y))
            for nx in (x - 1, x, x + 1):
                for ny in (y - 1, y, y + 1):
                    if (nx, ny) in comp_cells and (nx, ny) not in seen:
                        seen.add((nx, ny))
                        dq.append((nx, ny))
        comps.append(comp)
    border = lambda c: any(x in (x0, x1) or y in (y0, y1) for x, y in c)
    return sum(1 for c in comps if not border(c))


def _evenodd_fill(rings) -> set[tuple[int, int]]:
    """Oracle reconstruction: pixel (x, y) is inside iff the point
    (x+.5, y+.5) has odd crossing parity against ALL ring segments
    (rectilinear: only vertical segments can cross a +x ray)."""
    segs = []
    for verts, _, _ in rings:
        n = len(verts)
        for i in range(n):
            a, b = verts[i], verts[(i + 1) % n]
            if a[0] == b[0]:
                segs.append((a[0], min(a[1], b[1]), max(a[1], b[1])))
    if not segs:
        return set()
    xs = [s[0] for s in segs]
    ys = [y for s in segs for y in s[1:]]
    out = set()
    for x in range(min(xs) - 1, max(xs) + 1):
        for y in range(min(ys) - 1, max(ys) + 1):
            hits = sum(1 for sx, sy0, sy1 in segs
                       if sx > x + 0.5 and sy0 < y + 0.5 < sy1)
            if hits % 2:
                out.add((x, y))
    return out


def _corner_count(cells: set[tuple[int, int]]) -> int:
    """Oracle corner count by 2x2 neighborhood pattern at every lattice
    point: popcount 1 or 3 -> 1 corner, a diagonal pair -> 2 (pinch)."""
    masks: dict[tuple[int, int], int] = {}
    for (x, y) in cells:
        for dx in (0, 1):
            for dy in (0, 1):
                c = (x + dx, y + dy)
                # pixel's quadrant relative to corner c (bit 0..3)
                masks[c] = masks.get(c, 0) | (1 << ((1 - dx) + 2 * (1 - dy)))
    n = 0
    for m in masks.values():
        bits = bin(m).count("1")
        if bits in (1, 3):
            n += 1
        elif m in (0b1001, 0b0110):
            n += 2
    return n


def _adjacent_pairs(cells: set[tuple[int, int]]) -> int:
    return sum(1 for (x, y) in cells
               for q in ((x + 1, y), (x, y + 1)) if q in cells)


def test_trace_rings_structured_cases():
    from engine.geo.polygonize import _trace_rings
    # single pixel
    rings = _trace_rings({(0, 0)})
    assert len(rings) == 1
    verts, n_edges, area = rings[0]
    assert n_edges == 4 and area == 1 and len(verts) == 4
    assert verts[0] == (0, 0)
    # 3x3 donut: outer ring encloses 9, hole ring -1
    donut = {(x, y) for x in range(3) for y in range(3)} - {(1, 1)}
    rings = _trace_rings(donut)
    assert [r[2] for r in rings] == [9, -1]
    assert sum(r[2] for r in rings) == len(donut)
    assert rings[0][0][0] == (0, 0) and len(rings[0][0]) == 4
    assert len(rings[1][0]) == 4
    # diagonal pinch: {(0,0),(1,1)} traced as two separate single-pixel
    # regions' worth of boundary only if same set is passed — here the
    # set is ONE call, two loops, no shared edges cancelled
    rings = _trace_rings({(0, 0), (1, 1)})
    assert sorted(r[2] for r in rings) == [1, 1]


def test_trace_rings_invariants_random(rng):
    from engine.geo.polygonize import _trace_rings
    for trial in range(40):
        occ = rng.random((GRID, GRID)) < rng.uniform(0.2, 0.75)
        cells = {(int(x), int(y)) for y, x in zip(*np.nonzero(occ))}
        if not cells:
            continue
        for comp in _bfs_components(cells):
            rings = _trace_rings(comp)
            P, A = len(comp), _adjacent_pairs(comp)
            # 1) even-odd reconstruction is exact
            assert _evenodd_fill(rings) == comp
            # 2) signed areas sum to the pixel count
            assert sum(r[2] for r in rings) == P
            # 3) unit steps = boundary edges = 4P - 2A
            assert sum(r[1] for r in rings) == 4 * P - 2 * A
            # 4) collapsed vertices = 2x2-pattern corner count
            assert sum(len(r[0]) for r in rings) == _corner_count(comp)
            # 5) ring count = 1 outer + BFS hole count
            outers = [r for r in rings if r[2] > 0]
            holes = [r for r in rings if r[2] < 0]
            assert len(outers) == 1
            assert len(holes) == _bfs_holes(comp)
            # 6) determinism
            assert _trace_rings(set(comp)) == rings


def test_polygonize_rings_spark_matches_kernel(spark, rng):
    from engine.geo.polygonize import _trace_rings, polygonize_rings
    pdf = _random_pixels(rng, n_tiles=6, density=0.45)
    df = spark.createDataFrame(pdf)
    got = {}
    for r in polygonize_rings(df, GRID_BITS).collect():
        got[(r.tile_x, r.tile_y, r.region_id, r.ring_id)] = (
            r.kind, r.n_edges, r.n_vertices, r.area,
            [(v.x, v.y) for v in r.ring_xy])
    want = {}
    for (tx, ty), g in pdf.groupby(["tile_x", "tile_y"]):
        cells = {(int(p) % GRID, int(p) // GRID) for p in g["pix"]}
        for comp in _bfs_components(cells):
            rid = min(x + y * GRID for x, y in comp)
            for i, (verts, n_edges, area) in enumerate(_trace_rings(comp)):
                want[(tx, ty, rid, i)] = (
                    "outer" if area > 0 else "hole", n_edges, len(verts),
                    area, [(tx * GRID + x, ty * GRID + y) for x, y in verts])
    assert got == want


def test_rings_feed_measure_and_simplify(spark, rng):
    """End-to-end raster -> vector -> measure: traced rings flow through
    rings_as_layer into area_centroid (shoelace area matches the ring's
    integer area exactly) and simplify_rings (rectilinear rings with a
    sub-unit tolerance are already minimal: vertex counts unchanged)."""
    from engine.geo.measure import area_centroid
    from engine.geo.polygonize import polygonize_rings, rings_as_layer
    from engine.geo.simplify import simplify_rings
    pdf = _random_pixels(rng, n_tiles=4, density=0.4)
    rings = polygonize_rings(spark.createDataFrame(pdf), GRID_BITS)
    layer = rings_as_layer(rings, scale=1.0)
    areas = {(r.poly_id, r.ring_id): r
             for r in area_centroid(layer).collect()}
    for r in rings.collect():
        key = (f"{r.tile_x}/{r.tile_y}/{r.region_id}", str(r.ring_id))
        # area_centroid emits FLOOR-q6 integer shoelace (2*area*1e12);
        # integer pixel coords at scale 1.0 make it exact
        assert abs(areas[key].area2_q6) == 2 * abs(r.area) * 10**12
    simp = simplify_rings(layer, tol_deg=0.25).collect()
    for s in simp:
        assert s.n_vertices_out == s.n_vertices_in


def test_global_rejects_out_of_domain_tiles(spark):
    """r4: key-packing domain guards fail LOUDLY — grid_bits/z at entry,
    unbounded tile coords in-plan via assert_true (zero cost until
    violated) — instead of silently colliding packed region keys."""
    from py4j.protocol import Py4JJavaError
    ok = [(0, 0, 5, 1)]
    df_bad = spark.createDataFrame(
        pd.DataFrame([(1 << 21, 0, 5, 1)],
                     columns=["tile_x", "tile_y", "pix", "w"]))
    with pytest.raises((Py4JJavaError, Exception)):
        polygonize_global(df_bad, GRID_BITS).collect()
    with pytest.raises(ValueError):
        polygonize_global(
            spark.createDataFrame(
                pd.DataFrame(ok, columns=["tile_x", "tile_y", "pix", "w"])),
            grid_bits=11)
    with pytest.raises(ValueError):
        polygonize_global(
            spark.createDataFrame(
                pd.DataFrame(ok, columns=["tile_x", "tile_y", "pix", "w"])),
            GRID_BITS, z=21)


# ------------------------------------------------------------ contours

def test_contour_rings_nesting_and_levels(spark, rng):
    """Iso-levels: level-t rings trace exactly the super-level set
    {w >= t} (even-odd reconstruction per level), and super-level sets
    nest, so every level-5 pixel region is contained in a level-2
    region of the same tile."""
    from engine.geo.polygonize import contour_rings
    rows = []
    for tx, ty in [(0, 0), (1, 2), (3, 1)]:
        for p in rng.choice(256, size=150, replace=False):
            rows.append((int(tx), int(ty), int(p), int(rng.integers(1, 8))))
    pixels = spark.createDataFrame(
        rows, "tile_x long, tile_y long, pix long, w long")
    out = contour_rings(pixels, grid_bits=4, thresholds=(2, 5)).collect()
    assert {r.level for r in out} == {2, 5}
    by_level = {}
    for r in out:
        key = (r.level, r.tile_x, r.tile_y)
        by_level.setdefault(key, []).append(
            ([((v.x - r.tile_x * 16), (v.y - r.tile_y * 16))
               for v in r.ring_xy], None, None))
    want = {}
    for tx, ty, p, w in rows:
        for t in (2, 5):
            if w >= t:
                want.setdefault((t, tx, ty), set()).add((p % 16, p // 16))
    for key, rings in by_level.items():
        assert _evenodd_fill(rings) == want[key], key
    # nesting: each level-5 set is a subset of the level-2 set
    for (t, tx, ty), cells in want.items():
        if t == 5:
            assert cells <= want[(2, tx, ty)]


def test_contour_rings_empty_level_emits_nothing(spark):
    from engine.geo.polygonize import contour_rings
    pixels = spark.createDataFrame(
        [(0, 0, 5, 1), (0, 0, 6, 1)],
        "tile_x long, tile_y long, pix long, w long")
    out = contour_rings(pixels, grid_bits=4, thresholds=(1, 3)).collect()
    assert {r.level for r in out} == {1}
