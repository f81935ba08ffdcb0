"""D38 — co-movement companion detection (engine/geo/traj.py::
companions) vs a pure-Python sequential oracle: distinct-bucket
co-presence counts (per-bucket presence deduplicated first), min_co
threshold, the max_keys_per_bucket degenerate-bucket guard, planted
companion pairs, repartition invariance.  DuckDB value-hash parity for
the driver key runs in test_entry_contract's sweep."""

from __future__ import annotations

import datetime as dt
import itertools

import numpy as np

from engine.geo.traj import companions
from oracle.geo import lonlat_to_xy

US = dt.timedelta(microseconds=1)
EPOCH = dt.datetime(1970, 1, 1)
BUCKET = 3_600_000_000  # 1 hour


def _oracle(rows, zoom, bucket_us, min_co, cap=None):
    shift = 30 - zoom
    buckets = {}
    for k, ts, lon, lat in rows:
        x, y = lonlat_to_xy(lon, lat)
        tb = int((ts - EPOCH) / US) // bucket_us
        buckets.setdefault((x >> shift, y >> shift, tb), set()).add(k)
    pairs = {}
    for keys in buckets.values():
        if cap is not None and len(keys) > cap:
            continue
        for a, b in itertools.combinations(sorted(keys), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return {p: n for p, n in pairs.items() if n >= min_co}


def _collect(df):
    return {(r.key_a, r.key_b): r.n_cobuckets for r in df.collect()}


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, ts, lon, lat) for k, ts, lon, lat in rows],
        "user_id long, ts timestamp, lon double, lat double")


def _rand_rows(seed, n, n_keys, n_hours=48, spread=30.0):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    return [(int(rng.integers(0, n_keys)),
             base + dt.timedelta(
                 seconds=float(rng.uniform(0, n_hours * 3600))),
             float(rng.uniform(-spread, spread)),
             float(rng.uniform(-spread, spread)))
            for _ in range(n)]


def test_companions_match_oracle(spark):
    rows = _rand_rows(20260820, 1500, 20)
    got = _collect(companions(_df(spark, rows), zoom=4,
                              bucket_us=BUCKET, min_co=2))
    assert got == _oracle(rows, 4, BUCKET, 2)


def test_companions_dedup_within_bucket(spark):
    # 50 pings of each key in ONE bucket still count as 1 co-bucket.
    base = dt.datetime(2024, 1, 1, 12)
    rows = [(k, base + dt.timedelta(seconds=s), 10.0, 10.0)
            for k in (1, 2) for s in range(0, 500, 10)]
    got = _collect(companions(_df(spark, rows), zoom=4,
                              bucket_us=BUCKET, min_co=1))
    assert got == {(1, 2): 1}


def test_companions_planted_pair(spark):
    # keys 100/101 travel together hourly for 6 hours; background noise
    # elsewhere never reaches min_co=4.
    base = dt.datetime(2024, 2, 1)
    rows = []
    for h in range(6):
        ts = base + dt.timedelta(hours=h)
        lon, lat = -50.0 + h, 20.0 + h
        rows += [(100, ts, lon, lat), (101, ts + dt.timedelta(minutes=5),
                                       lon + 0.001, lat + 0.001)]
    rows += _rand_rows(3, 300, 10)
    got = _collect(companions(_df(spark, rows), zoom=8,
                              bucket_us=BUCKET, min_co=4))
    want = _oracle(rows, 8, BUCKET, 4)
    assert (100, 101) in got and got == want


def test_companions_bucket_cap_guard(spark):
    # A crowded bucket (10 keys, same place+hour) is excluded by the
    # cap; the quiet planted pair survives.
    base = dt.datetime(2024, 2, 1)
    rows = [(k, base, 0.0, 0.0) for k in range(10)]          # crowd
    rows += [(20, base + dt.timedelta(hours=2 + h), 90.0, 45.0)
             for h in range(3)]
    rows += [(21, base + dt.timedelta(hours=2 + h, minutes=1), 90.0, 45.0)
             for h in range(3)]
    got = _collect(companions(_df(spark, rows), zoom=4, bucket_us=BUCKET,
                              min_co=1, max_keys_per_bucket=5))
    assert got == _oracle(rows, 4, BUCKET, 1, cap=5)
    assert (20, 21) in got
    assert not any(a < 10 and b < 10 for a, b in got)


def test_companions_repartition_invariance(spark):
    rows = _rand_rows(9, 1000, 15)
    df = _df(spark, rows).repartition(9)
    got = _collect(companions(df, zoom=4, bucket_us=BUCKET, min_co=2))
    assert got == _oracle(rows, 4, BUCKET, 2)
