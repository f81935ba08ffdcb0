"""D14 — trajectory statistics vs a pure-Python sequential oracle."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from engine.geo.traj import traj_stats
from oracle.geo import lonlat_to_xy

N30 = 1 << 30


def _oracle(rows):
    """rows: (key, ts, seq, lon, lat) -> {key: stats tuple} sequentially."""
    per = {}
    for k, ts, seq, lon, lat in rows:
        per.setdefault(k, []).append((ts, seq, lon, lat))
    out = {}
    for k, evs in per.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        xy = [lonlat_to_xy(lo, la) for _, _, lo, la in evs]
        steps = []
        for (x0, y0), (x1, y1) in zip(xy, xy[1:]):
            dx = abs(x1 - x0)
            steps.append(min(dx, N30 - dx) + abs(y1 - y0))
        dxn = abs(xy[-1][0] - xy[0][0])
        net = min(dxn, N30 - dxn) + abs(xy[-1][1] - xy[0][1])
        dur = int((evs[-1][0] - evs[0][0]) / dt.timedelta(microseconds=1))
        out[k] = (len(evs), len(steps), sum(steps),
                  max(steps) if steps else 0, net, dur)
    return out


def _collect(df):
    return {r.user_id: (r.n_points, r.n_steps, r.path_l1, r.max_step_l1,
                        r.net_l1, r.duration_us) for r in df.collect()}


def test_traj_stats_matches_sequential_oracle(spark):
    rng = np.random.default_rng(23)
    n = 2000
    base = dt.datetime(2024, 3, 1)
    rows = [(int(rng.integers(0, 40)),
             base + dt.timedelta(seconds=float(rng.uniform(0, 86400))),
             int(i),
             float(rng.uniform(-180, 180)), float(rng.uniform(-84, 84)))
            for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "lon", "lat"])
    df = spark.createDataFrame(pdf).repartition(13)  # order-independence
    assert _collect(traj_stats(df)) == _oracle(rows)


def test_traj_stats_antimeridian_shorter_way(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 0, 179.9, 0.0),
            (1, base + dt.timedelta(minutes=1), 1, -179.9, 0.0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "lon", "lat"]))
    got = _collect(traj_stats(df))
    assert got == _oracle(rows)
    # the wrap must measure ~0.2 deg of longitude, not ~359.8
    assert got[1][2] < N30 * 0.2 / 360.0 * 1.5


def test_traj_stats_ts_tie_breaks_by_seq(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 2, 10.0, 10.0), (1, base, 1, -10.0, -10.0),
            (1, base + dt.timedelta(seconds=5), 3, 0.0, 0.0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "lon", "lat"]))
    assert _collect(traj_stats(df)) == _oracle(rows)


def test_traj_stats_single_point_track(spark):
    rows = [(7, dt.datetime(2024, 1, 1), 0, 1.0, 2.0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "lon", "lat"]))
    got = _collect(traj_stats(df))
    assert got[7] == (1, 0, 0, 0, 0, 0)


def test_traj_stats_single_shuffle(spark, sf_dir):
    """The window's hash partitioning is reused by the per-key agg:
    exactly ONE Exchange in the plan, zero Python stages."""
    from pyspark.sql import functions as F
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id",
        (F.col("event_id") % 360 - 180.0).cast("double").alias("lon"),
        (F.col("event_id") % 170 - 85.0).cast("double").alias("lat"))
    plan = traj_stats(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
