"""D3/A5 — PIP refinement + covering vs oracle (SURVEY.md §5.2/5.5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.geo import cells as ec
from engine.geo import pip as ep
from engine.geo.layer import PolygonLayer, cover_part, inv_mercy
from oracle import geo as og


@pytest.fixture(scope="module")
def layer():
    return PolygonLayer.from_json()


def _rand_pts(seed, n=2000):
    r = np.random.default_rng(seed)
    lon = r.uniform(-180, 180, n)
    lat = r.uniform(-85, 85, n)
    return lon, lat


def test_pip_mask_matches_oracle_all_polys(layer):
    lon, lat = _rand_pts(1)
    for poly in layer.polygons:
        parts = poly.split_antimeridian()
        got = ep.pip_parts_np(lon, lat, parts)
        for i in range(len(lon)):
            want = any(
                og.point_in_polygon(lon[i], lat[i], ring.tolist(),
                                    [h.tolist() for h in holes])
                for ring, holes in parts
            )
            assert got[i] == want, (poly.poly_id, lon[i], lat[i])


def test_pip_dense_near_polygon(layer):
    # dense grid around the concave notch + the holed square: edge behavior
    for pid in ("P09", "P07"):
        poly = next(p for p in layer.polygons if p.poly_id == pid)
        parts = poly.split_antimeridian()
        xs = np.linspace(parts[0][0][:, 0].min() - 1, parts[0][0][:, 0].max() + 1, 60)
        ys = np.linspace(parts[0][0][:, 1].min() - 1, parts[0][0][:, 1].max() + 1, 60)
        gx, gy = np.meshgrid(xs, ys)
        got = ep.pip_parts_np(gx.ravel(), gy.ravel(), parts)
        for i, (x, y) in enumerate(zip(gx.ravel(), gy.ravel())):
            want = og.point_in_polygon(
                x, y, poly.ring, poly.holes
            )
            assert got[i] == want


def test_pip_edge_convention():
    # unit square: classic crossing rule -> left/bottom in, right/top out
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    pts = {
        (0.5, 0.5): True,   # interior
        (0.0, 0.5): True,   # left edge
        (1.0, 0.5): False,  # right edge
        (0.5, 0.0): True,   # bottom edge
        (0.5, 1.0): False,  # top edge
        (2.0, 0.5): False,
    }
    for (x, y), want in pts.items():
        got = ep.pip_mask_np(np.array([x]), np.array([y]), ring)[0]
        assert got == want == og.point_in_ring(x, y, ring.tolist()), (x, y)


def test_antimeridian_split(layer):
    p10 = next(p for p in layer.polygons if p.poly_id == "P10")
    parts = p10.split_antimeridian()
    assert len(parts) == 2
    for ring, _ in parts:
        assert ring[:, 0].max() <= 180.0 and ring[:, 0].min() >= -180.0
    # a point just east of the antimeridian is inside
    assert ep.pip_parts_np(np.array([-179.5]), np.array([0.0]), parts)[0]
    assert ep.pip_parts_np(np.array([179.0]), np.array([0.0]), parts)[0]
    assert not ep.pip_parts_np(np.array([-176.0]), np.array([0.0]), parts)[0]


def test_cover_part_exact(layer):
    """Covering invariant: every point's containment verdict is identical
    whether decided by (cell in covering, full flag, exact PIP) or by the
    oracle PIP directly."""
    level = 7
    for poly in layer.polygons:
        parts = poly.split_antimeridian()
        cover = {}
        for ring, holes in parts:
            for cell, full in cover_part(ring, holes, level):
                cover[cell] = cover.get(cell, False) or full
        lon, lat = _rand_pts(hash(poly.poly_id) % 1000, 3000)
        for i in range(len(lon)):
            want = any(
                og.point_in_polygon(lon[i], lat[i], r.tolist(),
                                    [h.tolist() for h in hs])
                for r, hs in parts
            )
            cell = og.cell_parent(og.cell_encode(lon[i], lat[i]), level)
            if cell not in cover:
                assert not want, (poly.poly_id, lon[i], lat[i], "missed by covering")
            elif cover[cell]:
                assert want, (poly.poly_id, lon[i], lat[i], "full cell not inside")
            # partial cells are decided by exact PIP — already tested above


def test_inv_mercy_roundtrip():
    for lat in (-85.0, -42.3, 0.0, 13.37, 61.7, 85.0):
        assert abs(inv_mercy(og.mercy(lat)) - lat) < 1e-9


def test_refine_spark(spark, layer):
    lon, lat = _rand_pts(99, 1500)
    pdf = pd.DataFrame({"image_id": [f"i{i}" for i in range(len(lon))],
                        "lon": lon, "lat": lat})
    level = 8
    pts = ec.with_cell(spark.createDataFrame(pdf))
    pts = pts.withColumn("cell_p", ec.cell_parent_col("cell", level))
    build = layer.build_df(spark, level)
    cands = pts.join(F.broadcast(build), "cell_p", "inner")
    refined = ep.refine(cands, layer.parts())
    got = {(r.image_id, r.poly_id) for r in refined.collect()}
    want = set()
    parts_by_poly = layer.parts()
    for i in range(len(lon)):
        for pid, parts in parts_by_poly.items():
            if any(og.point_in_polygon(lon[i], lat[i], r.tolist(),
                                       [h.tolist() for h in hs])
                   for r, hs in parts):
                want.add((f"i{i}", pid))
    assert got == want
