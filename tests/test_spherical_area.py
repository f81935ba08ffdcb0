"""Spherical-excess polygon area (r5; engine/geo/measure.py::
spherical_area) — the geodesic twin of the planar shoelace.

The per-edge tan-half-angle excess formula is verified against:
* closed forms (octant = pi/2 * R², near-hemisphere cap),
* an INDEPENDENT l'Huilier fan-triangulation oracle (random polygons),
* the planar limit (tiny polygons -> planar shoelace * cos(lat)),
* antisymmetry under ring reversal and invariance under vertex
  rotation and antimeridian splitting (meridians are great circles).
"""
from __future__ import annotations

import math

import numpy as np
import pytest

from engine.geo.measure import EARTH_RADIUS_M, rings_df, spherical_area
from engine.geo.layer import Polygon, PolygonLayer

R2 = EARTH_RADIUS_M * EARTH_RADIUS_M


# ------------------------------------------------- sequential oracles

def excess_edges_py(ring) -> float:
    """The engine's formula, sequentially (sign: CCW positive)."""
    E = 0.0
    n = len(ring)
    for i in range(n):
        l1, p1 = map(math.radians, ring[i])
        l2, p2 = map(math.radians, ring[(i + 1) % n])
        t1, t2 = math.tan(p1 / 2), math.tan(p2 / 2)
        E += 2 * math.atan2(math.tan((l2 - l1) / 2) * (t1 + t2),
                            1 + t1 * t2)
    return -E


def lhuilier_py(ring) -> float:
    """Independent oracle: signed fan triangulation from vertex 0,
    each triangle's excess via l'Huilier, sign via the triple
    product."""
    def unit(lonlat):
        lon, lat = map(math.radians, lonlat)
        return np.array([math.cos(lat) * math.cos(lon),
                         math.cos(lat) * math.sin(lon),
                         math.sin(lat)])

    def angle(a, b):
        return math.atan2(np.linalg.norm(np.cross(a, b)), float(a @ b))

    def tri(a, b, c):
        A, B, C = angle(b, c), angle(a, c), angle(a, b)
        s = (A + B + C) / 2
        t = (math.tan(s / 2) * math.tan((s - A) / 2)
             * math.tan((s - B) / 2) * math.tan((s - C) / 2))
        E = 4 * math.atan(math.sqrt(max(t, 0.0)))
        return E if np.linalg.det(np.array([a, b, c])) > 0 else -E

    v = [unit(p) for p in ring]
    return sum(tri(v[0], v[i], v[i + 1]) for i in range(1, len(v) - 1))


def test_octant_closed_form():
    ring = [(0.0, 0.0), (90.0, 0.0), (0.0, 90.0)]
    assert excess_edges_py(ring) == pytest.approx(math.pi / 2, abs=1e-12)


def test_matches_lhuilier_on_random_polygons():
    rng = np.random.default_rng(11)
    for _ in range(20):
        lon0 = rng.uniform(-150, 150)
        lat0 = rng.uniform(-55, 55)
        k = rng.integers(4, 9)
        ang = np.sort(rng.uniform(0, 2 * math.pi, k))
        rad = rng.uniform(2, 20, k)
        ring = [(lon0 + r * math.cos(a), lat0 + r * math.sin(a))
                for a, r in zip(ang, rad)]
        assert excess_edges_py(ring) == pytest.approx(
            lhuilier_py(ring), rel=1e-10, abs=1e-12)
        # antisymmetric under reversal
        assert excess_edges_py(ring[::-1]) == pytest.approx(
            -excess_edges_py(ring), abs=1e-12)
        # invariant under vertex rotation
        assert excess_edges_py(ring[3:] + ring[:3]) == pytest.approx(
            excess_edges_py(ring), rel=1e-12, abs=1e-15)


def test_planar_limit():
    """A 0.01-degree square at lat 40: spherical area -> planar
    shoelace on the cos-latitude-scaled tangent plane (0.01% here)."""
    d = 0.01
    ring = [(10.0, 40.0), (10.0 + d, 40.0), (10.0 + d, 40.0 + d),
            (10.0, 40.0 + d)]
    sph = excess_edges_py(ring) * R2
    rad = math.radians(d)
    planar = rad * rad * math.cos(math.radians(40.0 + d / 2)) * R2
    assert sph == pytest.approx(planar, rel=1e-4)


def test_antimeridian_split_seam_lens():
    """The Sutherland-Hodgman split inserts seam vertices by LINEAR
    lon/lat interpolation, so part areas sum to the area of the
    polygon WITH those vertices — off the unsplit great-circle polygon
    by the small seam lens (the measure-convention note in
    engine/geo/measure.py).  Quantified: sub-percent here, and EXACTLY
    zero when the crossing edge follows a great circle (the equator),
    where the interpolated seam vertex lies ON the geodesic."""
    p = Polygon(poly_id="am", name="am",
                ring=[[172.0, -10.0], [188.0, -10.0],
                      [188.0, 8.0], [172.0, 8.0]])
    whole = excess_edges_py([tuple(v) for v in p.ring])
    parts = p.split_antimeridian()
    assert len(parts) == 2
    split_sum = sum(excess_edges_py([tuple(v) for v in outer.tolist()])
                    for outer, _ in parts)
    assert split_sum == pytest.approx(whole, rel=1e-2)
    assert split_sum != pytest.approx(whole, rel=1e-8)  # the lens is real

    # crossing edges ON the equator: a thin symmetric band whose two
    # crossing edges are equator segments -> seam vertices lie on the
    # geodesic -> split is area-exact
    eq = Polygon(poly_id="eq", name="eq",
                 ring=[[172.0, 0.0], [179.0, 0.0], [181.0, 0.0],
                       [188.0, 0.0], [188.0, 6.0], [181.0, 0.000001],
                       [179.0, 0.000001], [172.0, 6.0]])
    whole_eq = excess_edges_py([tuple(v) for v in eq.ring])
    split_eq = sum(excess_edges_py([tuple(v) for v in outer.tolist()])
                   for outer, _ in eq.split_antimeridian())
    assert split_eq == pytest.approx(whole_eq, rel=1e-6)


def test_spark_matches_sequential_on_layer(spark):
    """The native HOF fold reproduces the sequential formula per ring
    of the real (antimeridian-split) layer, to the rounding grain."""
    layer = PolygonLayer.from_json()
    out = {r.ring_id: r.area_m2
           for r in spherical_area(rings_df(layer, spark)).collect()}
    n = 0
    for p in layer.polygons:
        for pi, (outer, holes) in enumerate(p.split_antimeridian()):
            rid = f"{p.poly_id}:{pi}"
            exp = round(excess_edges_py(
                [tuple(v) for v in outer.tolist()]) * R2, -3)
            assert out[f"{rid}:outer"] == pytest.approx(exp, abs=1500.0)
            n += 1
            for hi, h in enumerate(holes):
                exp_h = round(excess_edges_py(
                    [tuple(v) for v in h.tolist()]) * R2, -3)
                assert out[f"{rid}:hole{hi}"] == pytest.approx(
                    exp_h, abs=1500.0)
                n += 1
    assert len(out) == n


def test_spherical_vs_planar_magnitudes(spark):
    """Sanity anchor: a 10x10-degree rect near the equator is about
    1.23e12 m² on the sphere; planar q6 shoelace agrees after the
    degree->metre conversion to a few percent (curvature)."""
    lay = PolygonLayer([Polygon(poly_id="eq", name="eq",
                                ring=[[0.0, -5.0], [10.0, -5.0],
                                      [10.0, 5.0], [0.0, 5.0]])])
    row = spherical_area(rings_df(lay, spark)).collect()[0]
    deg_m = math.radians(1.0) * EARTH_RADIUS_M
    assert row.area_m2 == pytest.approx(100 * deg_m * deg_m, rel=0.01)
    assert row.area_m2 > 0  # CCW ring -> positive
