"""D33 — great-circle track densification (engine/geo/traj.py::
densify_tracks, slerp kernel engine/geo/dist.py::slerp_np / slerp_sql):
sphere theorems the driver key rides — endpoint limits, fractional
distance additivity (the point at f is f*d from P1 and (1-f)*d from
P2), on-circle residual (zero cross-track distance to the endpoint
great circle), symmetry (slerp(P1,P2,f) == slerp(P2,P1,1-f)) — plus
the exact-integer piece-count contract and the numpy <-> DuckDB
shared-expression-text parity of the SQL twin."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from engine.geo.dist import crosstrack_np, haversine_np, slerp_np, slerp_sql
from oracle.geo import EARTH_RADIUS_M

RNG = np.random.default_rng(33)


def _pairs(n):
    lon1 = RNG.uniform(-180, 180, n)
    lat1 = RNG.uniform(-85, 85, n)
    lon2 = RNG.uniform(-180, 180, n)
    lat2 = RNG.uniform(-85, 85, n)
    # keep pairs well-separated and non-antipodal (the operator only
    # ever slerps steps LONGER than the threshold)
    d = haversine_np(lon1, lat1, lon2, lat2)
    keep = (d > 100_000.0) & (d < 0.95 * np.pi * EARTH_RADIUS_M)
    return lon1[keep], lat1[keep], lon2[keep], lat2[keep], d[keep]


def test_endpoint_limits():
    lon1, lat1, lon2, lat2, _ = _pairs(200)
    la0, lo0 = slerp_np(lon1, lat1, lon2, lat2, np.zeros_like(lon1))
    la1, lo1 = slerp_np(lon1, lat1, lon2, lat2, np.ones_like(lon1))
    assert np.allclose(la0, lat1, atol=1e-8)
    # longitude may fold at +-180; compare as unit-circle angle
    assert np.allclose(np.cos(np.radians(lo0 - lon1)), 1.0, atol=1e-12)
    assert np.allclose(la1, lat2, atol=1e-8)
    assert np.allclose(np.cos(np.radians(lo1 - lon2)), 1.0, atol=1e-12)


def test_fractional_distance_additivity():
    """The point at fraction f lies f*d from P1 and (1-f)*d from P2
    along the SAME circle — the defining property of slerp."""
    lon1, lat1, lon2, lat2, d = _pairs(300)
    for f in (0.25, 0.5, 0.75):
        la, lo = slerp_np(lon1, lat1, lon2, lat2, np.full_like(lon1, f))
        d1 = haversine_np(lon1, lat1, lo, la)
        d2 = haversine_np(lo, la, lon2, lat2)
        assert np.max(np.abs(d1 - f * d)) < 1e-3          # metres
        assert np.max(np.abs(d2 - (1.0 - f) * d)) < 1e-3
        assert np.max(np.abs((d1 + d2) - d)) < 1e-3


def test_on_circle_residual():
    """Interpolated points sit ON the great circle through the
    endpoints: cross-track distance is numerically zero (< 1 mm)."""
    lon1, lat1, lon2, lat2, _ = _pairs(300)
    for f in (0.2, 0.5, 0.8):
        la, lo = slerp_np(lon1, lat1, lon2, lat2, np.full_like(lon1, f))
        xt = crosstrack_np(lo, la, lon1, lat1, lon2, lat2)
        assert np.max(np.abs(xt)) < 1e-3


def test_symmetry():
    lon1, lat1, lon2, lat2, _ = _pairs(200)
    f = RNG.uniform(0.05, 0.95, lon1.shape[0])
    la_a, lo_a = slerp_np(lon1, lat1, lon2, lat2, f)
    la_b, lo_b = slerp_np(lon2, lat2, lon1, lat1, 1.0 - f)
    assert np.max(np.abs(la_a - la_b)) < 1e-9
    assert np.allclose(np.cos(np.radians(lo_a - lo_b)), 1.0, atol=1e-12)


def test_sql_twin_text_parity():
    """slerp_sql evaluated by DuckDB == slerp_np bit-for-bit at the
    1e-7 rounding the key emits (the haversine shared-text strategy)."""
    from __spark_entry__ import HAVERSINE_SQL_TMPL
    lon1, lat1, lon2, lat2, _ = _pairs(150)
    f = RNG.uniform(0.05, 0.95, lon1.shape[0])
    la, lo = slerp_np(lon1, lat1, lon2, lat2, f)
    lat_e, lon_e = slerp_sql("plon", "plat", "lon", "lat", "f",
                             HAVERSINE_SQL_TMPL)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(plon DOUBLE, plat DOUBLE, lon DOUBLE, "
                "lat DOUBLE, f DOUBLE, i INTEGER)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)",
                    [(a, b, c, d, e, i) for i, (a, b, c, d, e)
                     in enumerate(zip(lon1, lat1, lon2, lat2, f))])
    rows = con.execute(
        f"SELECT round({lat_e}, 7), round({lon_e}, 7) "
        "FROM t ORDER BY i").fetchall()
    got_la = np.array([r[0] for r in rows])
    got_lo = np.array([r[1] for r in rows])
    assert np.array_equal(got_la, np.round(la, 7))
    assert np.array_equal(got_lo, np.round(lo, 7))


def test_operator_piece_count_and_cap(spark):
    """densify_tracks end-to-end on a planted track: short steps emit
    nothing, a long step emits exactly n-1 interior rows with the
    exact-integer n, and a teleport saturates at max_pieces."""
    import pandas as pd

    from engine.geo.cells import merc_xy_np
    from engine.geo.traj import densify_tracks

    rows = [
        # user 1: three near-coincident points -> no densified rows
        (1, "2024-01-01 00:00:00", 1, 10.0, 10.0),
        (1, "2024-01-01 00:01:00", 2, 10.001, 10.001),
        (1, "2024-01-01 00:02:00", 3, 10.002, 10.002),
        # user 2: one long hop (Paris -> New York-ish)
        (2, "2024-01-01 00:00:00", 4, 2.3, 48.85),
        (2, "2024-01-01 01:00:00", 5, -74.0, 40.7),
        # user 3: antipodal-scale teleport -> cap
        (3, "2024-01-01 00:00:00", 6, -179.0, -80.0),
        (3, "2024-01-01 01:00:00", 7, 179.0, 80.0),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                      "lon", "lat"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)
    out = densify_tracks(df, thresh_l1=1 << 24, max_pieces=8)
    got = [(r.user_id, r.event_id, r.k, r.n_pieces)
           for r in out.collect()]
    assert not any(u == 1 for u, _, _, _ in got)

    def expected_n(a, b, thresh, cap):
        x1, y1 = merc_xy_np(np.array([a[0]]), np.array([a[1]]))
        x2, y2 = merc_xy_np(np.array([b[0]]), np.array([b[1]]))
        dx = abs(int(x2[0]) - int(x1[0]))
        step = min(dx, (1 << 30) - dx) + abs(int(y2[0]) - int(y1[0]))
        return min(cap, 1 + step // thresh)

    n2 = expected_n((2.3, 48.85), (-74.0, 40.7), 1 << 24, 8)
    n3 = expected_n((-179.0, -80.0), (179.0, 80.0), 1 << 24, 8)
    assert n2 >= 2
    assert n3 == 8  # the teleport saturates the cap
    ks2 = sorted(k for u, _, k, _ in got if u == 2)
    assert ks2 == list(range(1, n2))
    assert all(n == n2 for u, _, _, n in got if u == 2)
    ks3 = sorted(k for u, _, k, _ in got if u == 3)
    assert ks3 == list(range(1, 8))

    # interior points of user 2 lie on the Paris->NY great circle
    # (emitted coords are rounded to 1e-7 deg ~ 1.1 cm, so the
    # residual bound is cm-scale here; the unrounded-kernel bound is
    # test_on_circle_residual's 1 mm)
    pts = sorted(((r.k, r.lon_k, r.lat_k) for r in out.collect()
                  if r.user_id == 2))
    for _, lo, la in pts:
        assert abs(float(crosstrack_np(
            np.array([lo]), np.array([la]),
            np.array([2.3]), np.array([48.85]),
            np.array([-74.0]), np.array([40.7]))[0])) < 0.05
