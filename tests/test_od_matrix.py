"""D37 — origin-destination flow matrix (engine/geo/traj.py::
od_matrix) vs a pure-Python sequential oracle: trip segmentation
shared with segment_trips, first/last-point tiles by bit shift,
n_trips / exact distinct-key counts, stationary (o == d) flows from
single-point trips, zoom sweep, repartition invariance.  DuckDB
value-hash parity for the driver key runs in test_entry_contract's
sweep."""

from __future__ import annotations

import datetime as dt

import numpy as np

from engine.geo.traj import od_matrix
from oracle.geo import lonlat_to_xy

US = dt.timedelta(microseconds=1)
GAP = 3_600_000_000  # 1 hour


def _oracle(rows, zoom, gap_us=GAP):
    shift = 30 - zoom
    per = {}
    for k, ts, seq, lon, lat in rows:
        per.setdefault(k, []).append((ts, seq, lon, lat))
    flows = {}
    for k, evs in per.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        trips, cur = [], []
        for e in evs:
            if cur and int((e[0] - cur[-1][0]) / US) > gap_us:
                trips.append(cur)
                cur = []
            cur.append(e)
        trips.append(cur)
        for trip in trips:
            ox, oy = lonlat_to_xy(trip[0][2], trip[0][3])
            dx, dy = lonlat_to_xy(trip[-1][2], trip[-1][3])
            od = (ox >> shift, oy >> shift, dx >> shift, dy >> shift)
            n, users = flows.get(od, (0, set()))
            users.add(k)
            flows[od] = (n + 1, users)
    return {od: (n, len(users)) for od, (n, users) in flows.items()}


def _collect(df):
    return {(r.o_tx, r.o_ty, r.d_tx, r.d_ty): (r.n_trips, r.n_keys)
            for r in df.collect()}


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "lon double, lat double")


def _rand_rows(seed, n, n_keys):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    return [(int(rng.integers(0, n_keys)),
             base + dt.timedelta(
                 seconds=float(rng.uniform(0, 5 * 86400))),
             int(i),
             float(rng.uniform(-180, 180)), float(rng.uniform(-84, 84)))
            for i in range(n)]


def test_od_matches_sequential_oracle(spark):
    rows = _rand_rows(20260820, 1500, 25)
    got = _collect(od_matrix(_df(spark, rows), zoom=2, gap_us=GAP))
    assert got == _oracle(rows, 2)


def test_od_zoom_sweep(spark):
    rows = _rand_rows(5, 600, 10)
    for zoom in (1, 3, 5):
        got = _collect(od_matrix(_df(spark, rows), zoom=zoom, gap_us=GAP))
        assert got == _oracle(rows, zoom)


def test_od_conservation(spark):
    # total n_trips equals the oracle's trip count; n_keys <= n_trips.
    rows = _rand_rows(11, 900, 15)
    got = _collect(od_matrix(_df(spark, rows), zoom=2, gap_us=GAP))
    want = _oracle(rows, 2)
    assert sum(v[0] for v in got.values()) == sum(v[0] for v in want.values())
    assert all(v[1] <= v[0] for v in got.values())


def test_od_single_point_trips_are_stationary(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 1, 10.0, 10.0),
            (1, base + dt.timedelta(hours=5), 2, 10.0, 10.0)]
    got = _collect(od_matrix(_df(spark, rows), zoom=2, gap_us=GAP))
    (od, (n, k)), = got.items()
    assert od[0] == od[2] and od[1] == od[3] and n == 2 and k == 1


def test_od_repartition_invariance(spark):
    rows = _rand_rows(77, 1200, 20)
    df = _df(spark, rows).repartition(11)
    assert _collect(od_matrix(df, zoom=2, gap_us=GAP)) == _oracle(rows, 2)
