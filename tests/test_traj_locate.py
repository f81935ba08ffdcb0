"""D41 — point at fraction p/q along each track
(engine/geo/traj.py::locate_tracks) vs a sequential reference for the
integer control flow and slerp_np for the coordinates."""

from __future__ import annotations

import math
import random

from engine.geo.dist import slerp_np
from engine.geo.traj import locate_tracks

_N = 1 << 30


def _xy(lon, lat):
    xi = min(int(math.floor(((lon + 180.0) / 360.0) * _N)), _N - 1)
    yi = min(int(math.floor(
        ((1.0 - math.log(math.tan(math.pi / 4.0
                                  + math.radians(lat) / 2.0))
          / math.pi) / 2.0) * _N)), _N - 1)
    return xi, yi


def _ref(track, p, q):
    """track: ordered [(seq, lon, lat)].  -> (total, step_seq, f_num,
    f_den, plon, plat, lon, lat) or first-point fallback."""
    steps = []
    for (s0, lo0, la0), (s1, lo1, la1) in zip(track, track[1:]):
        x0, y0 = _xy(lo0, la0)
        x1, y1 = _xy(lo1, la1)
        dx = abs(x1 - x0)
        step = min(dx, _N - dx) + abs(y1 - y0)
        steps.append((s1, step, lo0, la0, lo1, la1))
    total = sum(s[1] for s in steps)
    cum = 0
    for s1, step, lo0, la0, lo1, la1 in steps:
        prev = cum
        cum += step
        if prev * q <= p * total < cum * q:
            return (total, s1, p * total - prev * q, step * q,
                    lo0, la0, lo1, la1)
    s0, lo, la = track[0]
    return (0, s0, 0, 1, None, None, lo, la)


def _df(spark, tracks):
    rows = [(k, i, i, lo, la) for k, t in tracks.items()
            for i, (_, lo, la) in enumerate(t)]
    return spark.createDataFrame(
        [(k, s, s, lo, la) for k, s, s2, lo, la in rows],
        "user_id long, ts long, event_id long, lon double, lat double")


def test_locate_matches_reference_random(spark):
    rng = random.Random(7)
    tracks = {}
    for k in range(12):
        n = rng.randrange(1, 8)
        tracks[k] = [(i, rng.uniform(-179, 179), rng.uniform(-80, 80))
                     for i in range(n)]
    out = {r.key: r for r in locate_tracks(
        _df(spark, tracks), ts_col="ts", p=1, q=2).collect()}
    for k, t in tracks.items():
        total, sseq, fn, fd, plo, pla, lo, la = _ref(t, 1, 2)
        r = out[k]
        assert (r.total_l1, r.step_seq, r.f_num, r.f_den) \
            == (total, sseq, fn, fd)
        if plo is None:
            assert (r.lat_i, r.lon_i) == (round(la, 7), round(lo, 7))
        else:
            la_i, lo_i = slerp_np(plo, pla, lo, la, fn / fd)
            assert (r.lat_i, r.lon_i) == (round(float(la_i), 7),
                                          round(float(lo_i), 7))


def test_locate_degenerate_tracks_fall_back(spark):
    tracks = {0: [(0, 10.0, 10.0)],                      # single point
              1: [(0, 20.0, 20.0), (1, 20.0, 20.0)]}    # zero length
    out = {r.key: r for r in locate_tracks(
        _df(spark, tracks), ts_col="ts").collect()}
    for k, (lo, la) in ((0, (10.0, 10.0)), (1, (20.0, 20.0))):
        r = out[k]
        assert (r.total_l1, r.f_num, r.f_den) == (0, 0, 1)
        assert (r.lat_i, r.lon_i) == (la, lo)
        assert r.step_seq == 0  # the first point's seq


def test_locate_boundary_goes_to_following_step(spark):
    # two steps along the EQUATOR between exact grid multiples (x is
    # linear in lon; 0 -> 45 -> 90 deg are exact 2^30-grid values, so
    # both steps are exactly 2^27 L1 units): the p=1/2 target lands
    # exactly on the first step's end -> the SECOND step is picked
    # with f = 0, and the interpolated point is the shared vertex.
    tracks = {0: [(0, 0.0, 0.0), (1, 45.0, 0.0), (2, 90.0, 0.0)]}
    r = locate_tracks(_df(spark, tracks), ts_col="ts",
                      p=1, q=2).collect()[0]
    assert r.step_seq == 2 and r.f_num == 0
    assert abs(r.lat_i - 0.0) < 1e-6 and abs(r.lon_i - 45.0) < 1e-6
