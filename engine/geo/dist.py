"""C8 — haversine great-circle distance (SURVEY.md §2.C8; kNN ranking,
BASELINE.json:6).

Two forms:
- `haversine_expr`: native column expression (JVM trig, whole-stage
  codegen) — the hot path inside kNN at scale.
- `haversine_udf`: Arrow-batched numpy form — bitwise-identical to the
  pure-Python oracle and to DuckDB (all three use C libm), used where the
  driver's DuckDB value-hash comparison demands exact doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from oracle.geo import EARTH_RADIUS_M


def haversine_expr(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = p2 - p1
    dl = F.radians(lon2) - F.radians(lon1)
    a = F.pow(F.sin(dp / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2)
    return 2 * F.lit(EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def haversine_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))


@F.pandas_udf(DoubleType())
def haversine_udf(lon1: pd.Series, lat1: pd.Series,
                  lon2: pd.Series, lat2: pd.Series) -> pd.Series:
    return pd.Series(
        haversine_np(
            lon1.to_numpy(np.float64), lat1.to_numpy(np.float64),
            lon2.to_numpy(np.float64), lat2.to_numpy(np.float64),
        )
    )


# --- C8b (r4 cont.): cross-track distance ----------------------------
# Signed distance from a point to the great circle through A->B — the
# navigation primitive behind route-corridor filters ("all images
# within d of this flight path / road") and map-matching.  Standard
# spherical formula: dxt = asin(sin(d13/R) * sin(brg13 - brg12)) * R
# with d13 the A->P haversine distance and brg the initial bearings.
# Same parity strategy as haversine (r1 driver-green): numpy libm on
# the Spark side, the identical expression text in the DuckDB twin,
# output rounded to 0.1 m to absorb last-ULP libm drift.

def bearing_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Initial great-circle bearing A->B in radians (atan2 form)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2) - np.radians(lon1)
    return np.arctan2(np.sin(dl) * np.cos(p2),
                      np.cos(p1) * np.sin(p2)
                      - np.sin(p1) * np.cos(p2) * np.cos(dl))


def crosstrack_np(lon, lat, lon_a, lat_a, lon_b, lat_b) -> np.ndarray:
    d13 = haversine_np(lon_a, lat_a, lon, lat) / EARTH_RADIUS_M
    b13 = bearing_np(lon_a, lat_a, lon, lat)
    b12 = bearing_np(lon_a, lat_a, lon_b, lat_b)
    return np.arcsin(np.sin(d13) * np.sin(b13 - b12)) * EARTH_RADIUS_M


def make_crosstrack_udf(lon_a: float, lat_a: float,
                        lon_b: float, lat_b: float):
    """Arrow-batched cross-track distance to the fixed segment A->B."""

    @F.pandas_udf(DoubleType())
    def crosstrack_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(crosstrack_np(
            lon.to_numpy(np.float64), lat.to_numpy(np.float64),
            lon_a, lat_a, lon_b, lat_b))

    return crosstrack_udf


BEARING_SQL_TMPL = (
    "atan2(sin(radians({lon2}) - radians({lon1})) * cos(radians({lat2})), "
    "cos(radians({lat1})) * sin(radians({lat2})) "
    "- sin(radians({lat1})) * cos(radians({lat2})) "
    "* cos(radians({lon2}) - radians({lon1})))")


def crosstrack_sql(lon: str, lat: str, lon_a: str, lat_a: str,
                   lon_b: str, lat_b: str, hav_tmpl: str) -> str:
    """Dialect-neutral SQL text of crosstrack_np, operation-for-
    operation (`hav_tmpl` is the engine's HAVERSINE_SQL_TMPL so the
    d13 sub-expression is the exact text the green haversine key uses).
    """
    d13 = "(" + hav_tmpl.format(lat1=lat_a, lon1=lon_a,
                                lat2=lat, lon2=lon) + f") / {EARTH_RADIUS_M!r}"
    b13 = BEARING_SQL_TMPL.format(lat1=lat_a, lon1=lon_a, lat2=lat, lon2=lon)
    b12 = BEARING_SQL_TMPL.format(lat1=lat_a, lon1=lon_a,
                                  lat2=lat_b, lon2=lon_b)
    return (f"asin(sin({d13}) * sin(({b13}) - ({b12}))) "
            f"* {EARTH_RADIUS_M!r}")


# --- C8d (r5): Andoyer-Lambert ellipsoidal distance -------------------
# WGS84 geodesic distance to first order in the flattening f (classical
# Andoyer 1932 / Lambert 1942 formula): reduced latitudes beta =
# atan((1-f) tan(phi)), spherical central angle sigma between the
# reduced points (stable haversine form), then the two first-order
# correction folds
#   X = (sig - sin sig) * (sinP cosQ)^2 / cos^2(sig/2)
#   Y = (sig + sin sig) * (cosP sinQ)^2 / sin^2(sig/2)
#   d = a * (sig - f/2 * (X + Y)),   P = (b1+b2)/2, Q = (b2-b1)/2.
# Error is O(f^2 * a) ~ tens of metres on antipodal-scale arcs —
# closed-form (no Vincenty iteration, so no antipodal convergence
# failure), exact on the equator (d = a * dlon) by construction, and
# verified against the quarter-meridian closed form in
# tests/test_ellipsoid.py.  Same parity strategy as haversine
# (r1 driver-green): numpy libm on the Spark side, the IDENTICAL
# dialect-neutral expression text in the DuckDB twin
# (operation-for-operation, so both engines run the same float ops),
# output rounded to 0.1 m.

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_ONE_MINUS_F = 1.0 - WGS84_F
_HALF_F = WGS84_F / 2.0


def andoyer_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    b1 = np.arctan(_ONE_MINUS_F * np.tan(np.radians(lat1)))
    b2 = np.arctan(_ONE_MINUS_F * np.tan(np.radians(lat2)))
    dl = np.radians(lon2) - np.radians(lon1)
    sq = np.sin((b2 - b1) / 2.0)
    cq = np.cos((b2 - b1) / 2.0)
    sp = np.sin((b1 + b2) / 2.0)
    cp = np.cos((b1 + b2) / 2.0)
    h = sq * sq + np.cos(b1) * np.cos(b2) \
        * np.sin(dl / 2.0) * np.sin(dl / 2.0)
    sig = 2.0 * np.arcsin(np.minimum(1.0, np.sqrt(h)))
    spq = sp * cq
    cps = cp * sq
    with np.errstate(invalid="ignore", divide="ignore"):
        x = (sig - np.sin(sig)) * (spq * spq) \
            / (np.cos(sig / 2.0) * np.cos(sig / 2.0))
        y = (sig + np.sin(sig)) * (cps * cps) \
            / (np.sin(sig / 2.0) * np.sin(sig / 2.0))
        d = WGS84_A * (sig - _HALF_F * (x + y))
    return np.where(sig == 0.0, 0.0, d)


def make_andoyer_udf(lon_b: float, lat_b: float):
    """Arrow-batched WGS84 ellipsoidal distance to the fixed anchor B."""

    @F.pandas_udf(DoubleType())
    def andoyer_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(andoyer_np(
            lon.to_numpy(np.float64), lat.to_numpy(np.float64),
            lon_b, lat_b))

    return andoyer_udf


def andoyer_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Dialect-neutral SQL text of andoyer_np, operation-for-operation
    (sub-expressions are re-inlined — float recomputation is
    deterministic, so the value is bit-identical to a reused one)."""
    b1 = f"atan({_ONE_MINUS_F!r} * tan(radians({lat1})))"
    b2 = f"atan({_ONE_MINUS_F!r} * tan(radians({lat2})))"
    dl = f"radians({lon2}) - radians({lon1})"
    sq = f"sin((({b2}) - ({b1})) / 2.0)"
    cq = f"cos((({b2}) - ({b1})) / 2.0)"
    sp = f"sin((({b1}) + ({b2})) / 2.0)"
    cp = f"cos((({b1}) + ({b2})) / 2.0)"
    h = (f"{sq} * {sq} + cos({b1}) * cos({b2}) "
         f"* sin(({dl}) / 2.0) * sin(({dl}) / 2.0)")
    sig = f"2.0 * asin(least(1.0, sqrt({h})))"
    spq = f"({sp} * {cq})"
    cps = f"({cp} * {sq})"
    x = (f"(({sig}) - sin({sig})) * ({spq} * {spq}) "
         f"/ (cos(({sig}) / 2.0) * cos(({sig}) / 2.0))")
    y = (f"(({sig}) + sin({sig})) * ({cps} * {cps}) "
         f"/ (sin(({sig}) / 2.0) * sin(({sig}) / 2.0))")
    return (f"CASE WHEN ({sig}) = 0.0 THEN 0.0 "
            f"ELSE {WGS84_A!r} * (({sig}) - {_HALF_F!r} * (({x}) + ({y})))"
            " END")


# --- C8e (r5): spherical destination (the DIRECT geodesic problem) ---
# Given a start point, an initial bearing and a distance, the point
# reached along the great circle — the inverse of haversine/bearing
# (which solve the indirect problem).  Standard spherical forms:
#   sin p2 = sin p1 cos d + cos p1 sin d cos B        (d = dist/R)
#   l2     = l1 + atan2(sin B sin d cos p1, cos d - sin p1 sin p2)
# Longitude folds once into [-180, 180] via a CASE (l2 - l1 lies in
# (-pi, pi], so one fold suffices; no dialect-divergent fmod).  Same
# parity strategy as haversine/andoyer: numpy libm on the Spark side,
# the IDENTICAL dialect-neutral expression text in the DuckDB twin
# (d/R is folded to a Python float literal so no division text rides
# along), outputs rounded to 1e-7 degrees (~1 cm).

def destination_np(lon1, lat1, brg, dist_m):
    """Destination (lat2_deg, lon2_deg) after dist_m metres along the
    initial bearing brg (radians) on the sphere."""
    d = dist_m / EARTH_RADIUS_M
    p1 = np.radians(lat1)
    sp2 = np.sin(p1) * np.cos(d) + np.cos(p1) * np.sin(d) * np.cos(brg)
    lat2 = np.degrees(np.arcsin(np.maximum(-1.0, np.minimum(1.0, sp2))))
    l2 = np.radians(lon1) + np.arctan2(
        np.sin(brg) * np.sin(d) * np.cos(p1),
        np.cos(d) - np.sin(p1) * sp2)
    lon2 = np.degrees(l2)
    lon2 = np.where(lon2 > 180.0, lon2 - 360.0,
                    np.where(lon2 < -180.0, lon2 + 360.0, lon2))
    return lat2, lon2


def make_destination_udf(lon_b: float, lat_b: float, dist_m: float):
    """Arrow-batched destination after moving dist_m metres from each
    point along its initial bearing TOWARD the fixed anchor B."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType([StructField("lat2", DoubleType()),
                         StructField("lon2", DoubleType())])

    @F.pandas_udf(schema)
    def destination_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        lo = lon.to_numpy(np.float64)
        la = lat.to_numpy(np.float64)
        brg = bearing_np(lo, la, lon_b, lat_b)
        lat2, lon2 = destination_np(lo, la, brg, dist_m)
        return pd.DataFrame({"lat2": lat2, "lon2": lon2})

    return destination_udf


def destination_sql(lon: str, lat: str, lon_b: str, lat_b: str,
                    dist_m: float) -> tuple[str, str]:
    """Dialect-neutral SQL text of destination_np with the bearing
    toward the fixed anchor inlined (BEARING_SQL_TMPL — the text the
    crosstrack twin already rides), operation-for-operation;
    sub-expressions re-inline (float recomputation is deterministic).
    Returns (lat2_expr, lon2_expr)."""
    d = dist_m / EARTH_RADIUS_M
    b = BEARING_SQL_TMPL.format(lat1=lat, lon1=lon,
                                lat2=lat_b, lon2=lon_b)
    sp2 = (f"sin(radians({lat})) * cos({d!r}) "
           f"+ cos(radians({lat})) * sin({d!r}) * cos({b})")
    lat2 = f"degrees(asin(greatest(least({sp2}, 1.0), -1.0)))"
    l2 = (f"radians({lon}) + atan2(sin({b}) * sin({d!r}) "
          f"* cos(radians({lat})), "
          f"cos({d!r}) - sin(radians({lat})) * ({sp2}))")
    raw = f"degrees({l2})"
    lon2 = (f"CASE WHEN ({raw}) > 180.0 THEN ({raw}) - 360.0 "
            f"WHEN ({raw}) < -180.0 THEN ({raw}) + 360.0 "
            f"ELSE ({raw}) END")
    return lat2, lon2


# --- C8f (r5): great-circle interpolation (slerp) --------------------
# The fractional point at f in [0, 1] along the great circle P1 -> P2:
# standard spherical linear interpolation on unit vectors,
#   A = sin((1-f)d)/sin d,  B = sin(f d)/sin d,   d = central angle
#   (x,y,z) = A*P1 + B*P2;  lat = atan2(z, hypot(x,y)); lon = atan2(y,x)
# Parity strategy: numpy libm Spark-side, IDENTICAL operation order in
# the DuckDB twin (slerp_sql), outputs rounded to 1e-7 deg.  d is
# derived as haversine_np metres / R so the twin can reuse the green
# HAVERSINE_SQL_TMPL text for the same two roundings.

def slerp_np(lon1, lat1, lon2, lat2, f):
    """(lat_deg, lon_deg) at fraction f along the great circle; caller
    guarantees d > 0 (f only ever comes from segments split because
    they were LONGER than a positive step)."""
    dlt = haversine_np(lon1, lat1, lon2, lat2) / EARTH_RADIUS_M
    sd = np.sin(dlt)
    a = np.sin((1.0 - f) * dlt) / sd
    b = np.sin(f * dlt) / sd
    p1, p2 = np.radians(lat1), np.radians(lat2)
    l1, l2 = np.radians(lon1), np.radians(lon2)
    x = a * np.cos(p1) * np.cos(l1) + b * np.cos(p2) * np.cos(l2)
    y = a * np.cos(p1) * np.sin(l1) + b * np.cos(p2) * np.sin(l2)
    z = a * np.sin(p1) + b * np.sin(p2)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def slerp_sql(lon1: str, lat1: str, lon2: str, lat2: str, f: str,
              hav_tmpl: str) -> tuple[str, str]:
    """Dialect-neutral SQL of slerp_np, operation-for-operation
    (hav_tmpl = the engine's HAVERSINE_SQL_TMPL so the central angle
    rides the exact text the r1-green haversine key proved identical).
    Returns (lat_expr, lon_expr)."""
    dlt = ("(" + hav_tmpl.format(lat1=lat1, lon1=lon1,
                                 lat2=lat2, lon2=lon2)
           + f") / {EARTH_RADIUS_M!r}")
    sd = f"sin({dlt})"
    a = f"(sin((1.0 - {f}) * ({dlt})) / {sd})"
    b = f"(sin(({f}) * ({dlt})) / {sd})"
    x = (f"({a} * cos(radians({lat1})) * cos(radians({lon1})) "
         f"+ {b} * cos(radians({lat2})) * cos(radians({lon2})))")
    y = (f"({a} * cos(radians({lat1})) * sin(radians({lon1})) "
         f"+ {b} * cos(radians({lat2})) * sin(radians({lon2})))")
    z = f"({a} * sin(radians({lat1})) + {b} * sin(radians({lat2})))"
    lat = f"degrees(atan2({z}, sqrt({x} * {x} + {y} * {y})))"
    lon = f"degrees(atan2({y}, {x}))"
    return lat, lon


def make_slerp_udf():
    """Arrow-batched slerp_np over five columns (lon1, lat1, lon2,
    lat2, f) -> struct(lat2, lon2) — the interpolation kernel behind
    traj_densify."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType([StructField("lat2", DoubleType()),
                         StructField("lon2", DoubleType())])

    @F.pandas_udf(schema)
    def slerp_udf(lon1: pd.Series, lat1: pd.Series, lon2: pd.Series,
                  lat2: pd.Series, f: pd.Series) -> pd.DataFrame:
        la, lo = slerp_np(
            lon1.to_numpy(np.float64), lat1.to_numpy(np.float64),
            lon2.to_numpy(np.float64), lat2.to_numpy(np.float64),
            f.to_numpy(np.float64))
        return pd.DataFrame({"lat2": la, "lon2": lo})

    return slerp_udf


def make_bearing_udf(lon_a: float, lat_a: float):
    """Arrow-batched initial bearing (radians) from fixed anchor A to
    each point — C8c, the third navigation kernel beside haversine and
    cross-track; same numpy-libm/identical-SQL-text parity strategy."""

    @F.pandas_udf(DoubleType())
    def bearing_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(bearing_np(
            lon_a, lat_a,
            lon.to_numpy(np.float64), lat.to_numpy(np.float64)))

    return bearing_udf


def make_andoyer_pair_udf():
    """Arrow-batched pairwise WGS84 ellipsoidal distance over four
    columns (lon1, lat1, lon2, lat2) — the edge-length kernel behind
    geo_perimeter_ellipsoid; same numpy-libm / identical-SQL-text
    parity strategy as the anchored form."""

    @F.pandas_udf(DoubleType())
    def andoyer_pair_udf(lon1: pd.Series, lat1: pd.Series,
                         lon2: pd.Series, lat2: pd.Series) -> pd.Series:
        return pd.Series(andoyer_np(
            lon1.to_numpy(np.float64), lat1.to_numpy(np.float64),
            lon2.to_numpy(np.float64), lat2.to_numpy(np.float64)))

    return andoyer_pair_udf


_R_3857 = 6378137.0  # WGS84 semi-major axis — the Web Mercator sphere


def mercator_3857_sql(lon: str, lat: str) -> tuple[str, str]:
    """EPSG:3857 (Web Mercator) forward projection as dialect-neutral
    SQL text (the haversine parity class: the engine compiles the
    SAME characters Spark-side, so floats are bit-identical):
    x = R*radians(lon), y = R*ln(tan(pi/4 + radians(lat)/2))."""
    x = f"({_R_3857!r} * radians({lon}))"
    y = (f"({_R_3857!r} * ln(tan(pi() / 4.0 + radians({lat}) / 2.0)))")
    return x, y


def inv_mercator_3857_sql(x: str, y: str) -> tuple[str, str]:
    """EPSG:3857 inverse: lon = degrees(x/R),
    lat = degrees(2*atan(exp(y/R)) - pi/2)."""
    lon = f"degrees(({x}) / {_R_3857!r})"
    lat = (f"degrees(2.0 * atan(exp(({y}) / {_R_3857!r})) "
           "- pi() / 2.0)")
    return lon, lat


# --- C8g (r5 cont.): rhumb line (loxodrome) -------------------------
# The constant-bearing course navigators actually steer: distance and
# initial (= constant) bearing between two points along the line that
# crosses every meridian at the same angle.  Standard spherical forms
# over the mercator latitude psi = ln(tan(pi/4 + phi/2)):
#   dpsi = psi2 - psi1,  q = dphi/dpsi  (q -> cos(phi1) as dpsi -> 0)
#   dist = R * sqrt(dphi^2 + q^2 * dlam^2)   (dlam wrapped to [-pi,pi])
#   brg  = atan2(dlam, dpsi) normalized to [0, 360)


def rhumb_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> tuple[str, str]:
    """Rhumb distance (metres) + constant bearing (degrees) as
    dialect-neutral SQL text — the haversine parity class: Spark
    compiles the SAME characters, so floats are bit-identical up to
    libm ULP (outputs are rounded by callers).  The east-west
    degenerate case (dpsi ~ 0) takes q = cos(phi1) on both engines
    through an identical-text CASE."""
    dphi = f"(radians({lat2}) - radians({lat1}))"
    dpsi = (f"(ln(tan(pi() / 4.0 + radians({lat2}) / 2.0)) "
            f"- ln(tan(pi() / 4.0 + radians({lat1}) / 2.0)))")
    dl0 = f"(radians({lon2}) - radians({lon1}))"
    dlam = (f"(CASE WHEN ({dl0}) > pi() THEN ({dl0}) - 2.0 * pi() "
            f"WHEN ({dl0}) < -(pi()) THEN ({dl0}) + 2.0 * pi() "
            f"ELSE ({dl0}) END)")
    q = (f"(CASE WHEN abs({dpsi}) > 1e-12 THEN ({dphi}) / ({dpsi}) "
         f"ELSE cos(radians({lat1})) END)")
    dist = (f"(6371000.0 * sqrt(({dphi}) * ({dphi}) "
            f"+ ({q}) * ({q}) * ({dlam}) * ({dlam})))")
    raw = f"degrees(atan2({dlam}, {dpsi}))"
    brg = (f"(CASE WHEN ({raw}) < 0.0 THEN ({raw}) + 360.0 "
           f"ELSE ({raw}) END)")
    return dist, brg
