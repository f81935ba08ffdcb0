"""C8d — Andoyer-Lambert WGS84 ellipsoidal distance
(engine/geo/dist.py::andoyer_np / andoyer_sql): closed-form anchors
(equator arc exact, quarter meridian vs the known 10 001 965.729 m),
symmetry, degenerate/antipodal safety, haversine bound, and the
numpy <-> DuckDB shared-expression-text parity the driver key rides.
"""
from __future__ import annotations

import duckdb
import numpy as np
import pytest

from engine.geo.dist import (
    WGS84_A, WGS84_F, andoyer_np, andoyer_sql, haversine_np,
)

QUARTER_MERIDIAN_M = 10_001_965.729  # closed-form elliptic integral


def test_equator_arc_exact():
    """On the equator beta1 = beta2 = 0 -> P = Q = 0 -> X = Y = 0, so
    d = a * dlon exactly (a IS the equatorial radius)."""
    d = float(andoyer_np(0.0, 0.0, 90.0, 0.0))
    assert d == pytest.approx(WGS84_A * np.pi / 2.0, abs=1e-6)
    d = float(andoyer_np(10.0, 0.0, 11.0, 0.0))
    assert d == pytest.approx(WGS84_A * np.pi / 180.0, abs=1e-6)


def test_quarter_meridian():
    """Pole-to-equator along a meridian: first-order-in-f error bound
    is O(f^2 * a) ~ 72 m; Andoyer lands within ~50 m of the exact
    elliptic-integral value."""
    d = float(andoyer_np(0.0, 0.0, 0.0, 90.0))
    assert abs(d - QUARTER_MERIDIAN_M) < 100.0
    # and is meaningfully CLOSER than the spherical answer (~2.2 km off)
    sph = float(haversine_np(0.0, 0.0, 0.0, 90.0))
    assert abs(d - QUARTER_MERIDIAN_M) < abs(sph - QUARTER_MERIDIAN_M) / 20


def test_symmetry_exact():
    rng = np.random.default_rng(7)
    lon1, lat1 = rng.uniform(-180, 180, 50), rng.uniform(-89, 89, 50)
    lon2, lat2 = rng.uniform(-180, 180, 50), rng.uniform(-89, 89, 50)
    a = andoyer_np(lon1, lat1, lon2, lat2)
    b = andoyer_np(lon2, lat2, lon1, lat1)
    # Q flips sign under swap but appears only squared -> bit-identical
    assert np.array_equal(a, b)


def test_degenerate_and_antipodal():
    assert float(andoyer_np(12.5, 47.25, 12.5, 47.25)) == 0.0
    d = andoyer_np(np.array([0.0, 2.3]), np.array([0.0, 48.85]),
                   np.array([180.0, -177.7]), np.array([0.0, -48.85]))
    assert np.all(np.isfinite(d))
    assert np.all((d > 1.9e7) & (d < 2.1e7))  # near half-circumference
    # poles are finite (tan(radians(90)) is huge but not inf)
    assert np.isfinite(andoyer_np(0.0, 90.0, 0.0, -90.0))


def test_within_flattening_of_haversine():
    """The ellipsoidal correction is bounded by ~f (0.34%) relative."""
    rng = np.random.default_rng(11)
    lon1, lat1 = rng.uniform(-180, 180, 500), rng.uniform(-89, 89, 500)
    lon2, lat2 = rng.uniform(-180, 180, 500), rng.uniform(-89, 89, 500)
    e = andoyer_np(lon1, lat1, lon2, lat2)
    s = haversine_np(lon1, lat1, lon2, lat2)
    keep = s > 1000.0
    rel = np.abs(e[keep] - s[keep]) / s[keep]
    assert float(rel.max()) < 2.5 * WGS84_F


def test_duckdb_text_parity():
    """The driver-key contract: DuckDB running andoyer_sql on the same
    doubles agrees with numpy to well below the 0.1 m rounding grain."""
    rng = np.random.default_rng(3)
    pts = [(float(lo), float(la)) for lo, la in
           zip(rng.uniform(-180, 180, 64), rng.uniform(-85, 85, 64))]
    pts += [(2.3, 48.85), (0.0, 0.0), (180.0, 0.0), (-180.0, 45.0)]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    expr = andoyer_sql("lon", "lat", "2.3", "48.85")
    got = np.array([r[0] for r in con.execute(
        f"SELECT {expr} FROM p").fetchall()])
    want = andoyer_np(np.array([p[0] for p in pts]),
                      np.array([p[1] for p in pts]), 2.3, 48.85)
    assert np.max(np.abs(got - want)) < 1e-6


# -------------------------------------------- ellipsoidal perimeter

def _parts_df(spark, rings):
    rows = [(f"P{j}", f"p{j}", 0, ring, [])
            for j, ring in enumerate(rings)]
    return spark.createDataFrame(
        rows, "poly_id string, name string, part_idx int, "
              "ring_xy array<array<double>>, "
              "holes_xy array<array<array<double>>>")


def test_perimeter_sums_floor_mm_edges(spark):
    import math
    from engine.geo.dist import andoyer_np
    from engine.geo.measure import perimeter_ellipsoid
    ring = [[10.0, 40.0], [10.5, 40.0], [10.5, 40.4], [10.0, 40.4]]
    r = perimeter_ellipsoid(_parts_df(spark, [ring])).collect()[0]
    edges = list(zip(ring, ring[1:] + ring[:1]))
    want = sum(int(math.floor(float(andoyer_np(a[0], a[1], b[0], b[1]))
                              * 1000.0)) for a, b in edges)
    assert (r.n_edges, r.perimeter_mm) == (4, want)
    # sanity: a ~42 km x ~44 km quadrilateral, perimeter ~ 174 km
    assert 150_000_000 < r.perimeter_mm < 200_000_000


def test_perimeter_rotation_invariance(spark):
    from engine.geo.measure import perimeter_ellipsoid
    ring = [[0.0, 0.0], [1.0, 0.2], [1.3, 1.1], [0.4, 1.4], [-0.2, 0.7]]
    rot = ring[2:] + ring[:2]
    a = perimeter_ellipsoid(_parts_df(spark, [ring])).collect()[0]
    b = perimeter_ellipsoid(_parts_df(spark, [rot])).collect()[0]
    assert a.perimeter_mm == b.perimeter_mm and a.n_edges == 5
