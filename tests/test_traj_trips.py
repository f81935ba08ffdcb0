"""D33 — gap-based trip segmentation (engine/geo/traj.py::
segment_trips) vs a pure-Python sequential oracle: trip boundaries at
time gaps > gap_us, the gap step belongs to NO trip, per-trip
exact-grid-L1 path/net/max and exact-microsecond start/duration,
single-point trips, wrap-aware x steps, repartition invariance.
DuckDB value-hash parity for the driver key runs in
test_entry_contract's sweep."""

from __future__ import annotations

import datetime as dt

import numpy as np

from engine.geo.traj import segment_trips
from oracle.geo import lonlat_to_xy

N30 = 1 << 30
US = dt.timedelta(microseconds=1)


def _oracle(rows, gap_us):
    per = {}
    for k, ts, seq, lon, lat in rows:
        per.setdefault(k, []).append((ts, seq, lon, lat))
    out = {}
    for k, evs in per.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        trips, cur = [], []
        for e in evs:
            if cur and int((e[0] - cur[-1][0]) / US) > gap_us:
                trips.append(cur)
                cur = []
            cur.append(e)
        trips.append(cur)
        for tid, trip in enumerate(trips, start=1):
            xy = [lonlat_to_xy(lo, la) for _, _, lo, la in trip]
            steps = []
            for (x0, y0), (x1, y1) in zip(xy, xy[1:]):
                dx = abs(x1 - x0)
                steps.append(min(dx, N30 - dx) + abs(y1 - y0))
            dxn = abs(xy[-1][0] - xy[0][0])
            net = min(dxn, N30 - dxn) + abs(xy[-1][1] - xy[0][1])
            epoch = dt.datetime(1970, 1, 1)
            start_us = int((trip[0][0] - epoch) / US)
            dur = int((trip[-1][0] - trip[0][0]) / US)
            out[(k, tid)] = (len(trip), start_us, dur, sum(steps),
                             max(steps) if steps else 0, net)
    return out


def _collect(df):
    return {(r.user_id, r.trip_id): (r.n_points, r.start_us, r.duration_us,
                                     r.path_l1, r.max_step_l1, r.net_l1)
            for r in df.collect()}


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "lon double, lat double")


GAP = 3_600_000_000  # 1 hour


def _rand_rows(seed, n, n_keys):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    return [(int(rng.integers(0, n_keys)),
             base + dt.timedelta(
                 seconds=float(rng.uniform(0, 10 * 86400))),
             int(i),
             float(rng.uniform(-180, 180)), float(rng.uniform(-84, 84)))
            for i in range(n)]


def test_trips_match_sequential_oracle(spark):
    rows = _rand_rows(20260820, 2000, 30)
    got = _collect(segment_trips(_df(spark, rows), gap_us=GAP))
    assert got == _oracle(rows, GAP)


def test_trips_gap_step_excluded(spark):
    # Two points 2h apart at different places: two 1-point trips, and
    # NO trip carries the inter-point distance.
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 1, 10.0, 10.0),
            (1, base + dt.timedelta(hours=2), 2, 60.0, -30.0)]
    got = _collect(segment_trips(_df(spark, rows), gap_us=GAP))
    assert set(got) == {(1, 1), (1, 2)}
    for v in got.values():
        assert v[0] == 1 and v[3] == 0 and v[4] == 0 and v[5] == 0


def test_trips_boundary_is_strict(spark):
    # A gap of EXACTLY gap_us does not split (strict > semantics).
    base = dt.datetime(2024, 1, 1)
    rows = [(7, base, 1, 0.0, 0.0),
            (7, base + dt.timedelta(microseconds=GAP), 2, 0.1, 0.1),
            (7, base + dt.timedelta(microseconds=2 * GAP + 1), 3, 0.2, 0.2)]
    got = _collect(segment_trips(_df(spark, rows), gap_us=GAP))
    assert {k: v[0] for k, v in got.items()} == {(7, 1): 2, (7, 2): 1}


def test_trips_single_trip_matches_traj_stats_totals(spark):
    # With an infinite gap, every key is one trip whose path equals the
    # whole-track sum.
    rows = _rand_rows(7, 400, 5)
    got = _collect(segment_trips(_df(spark, rows), gap_us=10**18))
    want = _oracle(rows, 10**18)
    assert got == want
    assert all(k[1] == 1 for k in got)


def test_trips_repartition_invariance(spark):
    rows = _rand_rows(99, 1000, 12)
    df = _df(spark, rows).repartition(13)
    got = _collect(segment_trips(df, gap_us=GAP))
    assert got == _oracle(rows, GAP)
