"""C8e — spherical destination (direct geodesic problem,
engine/geo/dist.py::destination_np / destination_sql): closed-form
anchors (due-north arc, equator eastward, zero distance), the
exact-reduction theorem the driver key rides (moving d toward a target
shortens the great-circle distance by exactly d), antimeridian fold,
inverse-of-bearing consistency, and the numpy <-> DuckDB
shared-expression-text parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from engine.geo.dist import (
    bearing_np, destination_np, destination_sql, haversine_np,
)
from oracle.geo import EARTH_RADIUS_M


def test_due_north_and_equator_closed_forms():
    # due north from the equator: lat2 = degrees(d/R), lon unchanged
    d = 111_000.0
    lat2, lon2 = destination_np(10.0, 0.0, 0.0, d)
    assert float(lat2) == pytest.approx(np.degrees(d / EARTH_RADIUS_M),
                                        abs=1e-9)
    assert float(lon2) == pytest.approx(10.0, abs=1e-9)
    # due east along the equator: lon2 = lon1 + degrees(d/R), lat 0
    lat2, lon2 = destination_np(10.0, 0.0, np.pi / 2.0, d)
    assert float(lat2) == pytest.approx(0.0, abs=1e-9)
    assert float(lon2) == pytest.approx(
        10.0 + np.degrees(d / EARTH_RADIUS_M), abs=1e-9)


def test_zero_distance_is_identity():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 50)
    lat = rng.uniform(-85, 85, 50)
    brg = rng.uniform(-np.pi, np.pi, 50)
    lat2, lon2 = destination_np(lon, lat, brg, 0.0)
    assert np.allclose(lat2, lat, atol=1e-12)
    assert np.allclose(lon2, lon, atol=1e-12)


def test_exact_reduction_toward_target():
    """The sphere theorem the driver key rides: moving d along the
    bearing toward B shortens the distance to B by exactly d (for
    points farther than d from B)."""
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-85, 85, 300)
    d0 = haversine_np(lon, lat, 2.3, 48.85)
    keep = d0 > 150_000.0
    lon, lat, d0 = lon[keep], lat[keep], d0[keep]
    brg = bearing_np(lon, lat, 2.3, 48.85)
    lat2, lon2 = destination_np(lon, lat, brg, 100_000.0)
    d1 = haversine_np(lon2, lat2, 2.3, 48.85)
    assert np.max(np.abs((d0 - d1) - 100_000.0)) < 1e-4


def test_antimeridian_fold():
    lat2, lon2 = destination_np(179.9, 0.0, np.pi / 2.0, 100_000.0)
    assert float(lon2) < -179.0  # wrapped into [-180, 180]
    assert float(lat2) == pytest.approx(0.0, abs=1e-9)
    lat2, lon2 = destination_np(-179.9, 0.0, -np.pi / 2.0, 100_000.0)
    assert float(lon2) > 179.0


def test_inverse_consistency_with_bearing():
    """Destination then re-derived bearing/distance reproduce the
    inputs (direct o indirect = id) away from the poles."""
    rng = np.random.default_rng(11)
    lon = rng.uniform(-170, 170, 100)
    lat = rng.uniform(-70, 70, 100)
    brg = rng.uniform(-np.pi, np.pi, 100)
    d = 250_000.0
    lat2, lon2 = destination_np(lon, lat, brg, d)
    back = haversine_np(lon, lat, lon2, lat2)
    assert np.max(np.abs(back - d)) < 1e-4
    b2 = bearing_np(lon, lat, lon2, lat2)
    db = np.abs(np.angle(np.exp(1j * (b2 - brg))))
    assert float(db.max()) < 1e-9


def test_duckdb_text_parity():
    """The driver-key contract: DuckDB running destination_sql on the
    same doubles agrees with numpy far below the 1e-7-deg grain."""
    rng = np.random.default_rng(3)
    pts = [(float(lo), float(la)) for lo, la in
           zip(rng.uniform(-180, 180, 64), rng.uniform(-85, 85, 64))]
    pts += [(0.0, 0.0), (180.0, 10.0), (-179.95, -10.0), (2.3, 48.0)]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    e_lat, e_lon = destination_sql("lon", "lat", "2.3", "48.85",
                                   100_000.0)
    got = con.execute(f"SELECT {e_lat}, {e_lon} FROM p").fetchall()
    lo = np.array([p[0] for p in pts])
    la = np.array([p[1] for p in pts])
    brg = bearing_np(lo, la, 2.3, 48.85)
    lat2, lon2 = destination_np(lo, la, brg, 100_000.0)
    assert np.max(np.abs(np.array([g[0] for g in got]) - lat2)) < 1e-10
    assert np.max(np.abs(np.array([g[1] for g in got]) - lon2)) < 1e-10


# ------------------------------------------------ EPSG:3857 projection

def test_project_3857_known_values_and_roundtrip(spark):
    import math
    import __spark_entry__ as m
    rows = m.queries()["geo_project_3857"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    R = 6378137.0
    for r in rows[:200]:
        # forward formulas against independent python math
        assert abs(r.x_m - round(R * math.radians(r.lon), 3)) <= 0.001
        y = R * math.log(math.tan(math.pi / 4 + math.radians(r.lat) / 2))
        assert abs(r.y_m - round(y, 3)) <= 0.001
        # round trip: inverse of the mm-rounded metres recovers the
        # coordinate to well under 1e-6 deg (~0.1 m)
        assert abs(r.lon_rt - r.lon) < 1e-6
        assert abs(r.lat_rt - r.lat) < 1e-6


def test_project_3857_equator_and_origin_closed_forms():
    import math
    R = 6378137.0
    # lon=180 -> x = R*pi (the projection's half-width constant)
    assert abs(R * math.radians(180.0) - 20037508.342789244) < 1e-6
    # lat=0 -> y ~ 0 (tan(pi/4) is one ULP off 1.0 in floats; the mm
    # rounding in the operator makes the emitted value exactly 0.0)
    assert abs(R * math.log(math.tan(math.pi / 4))) < 1e-8
    assert round(R * math.log(math.tan(math.pi / 4)), 3) == 0.0


# -------------------------------------------- rhumb line (C8g, r5 cont.)

def _rhumb_ref(lon1, lat1, lon2, lat2):
    """Independent python-math rhumb reference (written from the
    textbook forms, not from rhumb_sql's text)."""
    import math
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = p2 - p1
    dpsi = (math.log(math.tan(math.pi / 4 + p2 / 2))
            - math.log(math.tan(math.pi / 4 + p1 / 2)))
    dlam = math.radians(lon2) - math.radians(lon1)
    if dlam > math.pi:
        dlam -= 2 * math.pi
    elif dlam < -math.pi:
        dlam += 2 * math.pi
    q = dphi / dpsi if abs(dpsi) > 1e-12 else math.cos(p1)
    dist = 6371000.0 * math.hypot(dphi, q * dlam)
    brg = math.degrees(math.atan2(dlam, dpsi)) % 360.0
    return dist, brg


def test_rhumb_sql_matches_python_reference():
    from engine.geo.dist import rhumb_sql
    d_e, b_e = rhumb_sql("lon1", "lat1", "lon2", "lat2")
    cases = [(10.0, 20.0, 2.3, 48.85), (-150.0, -60.0, 170.0, -62.0),
             (0.0, 0.0, 90.0, 0.0), (5.0, 10.0, 5.0, -30.0),
             (179.5, 10.0, -179.5, 12.0)]
    con = duckdb.connect()
    for lon1, lat1, lon2, lat2 in cases:
        got = con.execute(
            f"SELECT {d_e}, {b_e} FROM (SELECT {lon1} AS lon1, "
            f"{lat1} AS lat1, {lon2} AS lon2, {lat2} AS lat2)").fetchone()
        want = _rhumb_ref(lon1, lat1, lon2, lat2)
        assert got[0] == pytest.approx(want[0], rel=1e-12)
        assert got[1] == pytest.approx(want[1], abs=1e-9)


def test_rhumb_closed_forms_and_geodesic_law():
    from engine.geo.dist import rhumb_sql
    con = duckdb.connect()
    d_e, b_e = rhumb_sql("lon1", "lat1", "lon2", "lat2")

    def rh(lon1, lat1, lon2, lat2):
        return con.execute(
            f"SELECT {d_e}, {b_e} FROM (SELECT CAST({lon1} AS DOUBLE) "
            f"AS lon1, CAST({lat1} AS DOUBLE) AS lat1, "
            f"CAST({lon2} AS DOUBLE) AS lon2, "
            f"CAST({lat2} AS DOUBLE) AS lat2)").fetchone()

    # along the equator: dist = R * dlam, bearing 90
    d, b = rh(10.0, 0.0, 20.0, 0.0)
    assert d == pytest.approx(6371000.0 * np.radians(10.0), rel=1e-12)
    assert b == pytest.approx(90.0, abs=1e-9)
    # along a meridian: dist = R * dphi, bearing 0 / 180
    d, b = rh(7.0, -10.0, 7.0, 25.0)
    assert d == pytest.approx(6371000.0 * np.radians(35.0), rel=1e-12)
    assert b == pytest.approx(0.0, abs=1e-9)
    d, b = rh(7.0, 25.0, 7.0, -10.0)
    assert b == pytest.approx(180.0, abs=1e-9)
    # westward wrap across the antimeridian stays short
    d_wrap, b_wrap = rh(179.0, 5.0, -179.0, 5.0)
    assert d_wrap == pytest.approx(
        6371000.0 * np.radians(2.0) * np.cos(np.radians(5.0)), rel=1e-9)
    assert b_wrap == pytest.approx(90.0, abs=1e-6)
    # rhumb >= great circle, everywhere off-course
    for lon1, lat1, lon2, lat2 in [(10, 50, 100, 60), (-70, -30, 20, 40),
                                   (0, 70, 180, 70)]:
        d_rh, _ = rh(lon1, lat1, lon2, lat2)
        d_gc = float(haversine_np(
            np.array([float(lon1)]), np.array([float(lat1)]),
            float(lon2), float(lat2))[0])
        assert d_rh >= d_gc - 1e-6
