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


def test_headings_match_sequential_oracle(spark):
    """D24 — heading classes vs a pure-Python step classifier."""
    import datetime as dt
    import random

    from engine.geo.traj import traj_headings

    rng = random.Random(37)
    rows = []
    seq = 0
    for u in range(8):
        for _ in range(rng.randrange(2, 25)):
            rows.append((f"u{u}", dt.datetime(2024, 1, 1)
                         + dt.timedelta(seconds=seq), seq,
                         rng.uniform(-179, 179), rng.uniform(-80, 80)))
            seq += 1
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, "
              "lon double, lat double")

    def classify(dx, dy):
        if abs(dx) > abs(dy):
            return "E" if dx > 0 else "W"
        if abs(dy) > abs(dx):
            return "N" if dy > 0 else "S"
        if dx > 0:
            return "NE" if dy > 0 else "SE"
        return "NW" if dy > 0 else "SW"

    per = {}
    for u, ts, sq, lo, la in rows:
        per.setdefault(u, []).append((ts, sq, lo, la))
    exp = {}
    for u, evs in per.items():
        evs.sort()
        xy = [lonlat_to_xy(lo, la) for _, _, lo, la in evs]
        for (x0, y0), (x1, y1) in zip(xy, xy[1:]):
            dxr = x1 - x0
            dx = dxr - N30 if dxr > N30 // 2 else (
                dxr + N30 if dxr < -(N30 // 2) else dxr)
            dy = y0 - y1  # grid y grows south
            if dx == 0 and dy == 0:
                continue
            k = (u, classify(dx, dy))
            exp[k] = exp.get(k, 0) + 1

    for parts in (1, 7):
        got = {(r.user_id, r.heading): r.n_steps
               for r in traj_headings(df.repartition(parts)).collect()}
        assert got == exp


def test_headings_exact_diagonals_and_axes(spark):
    """Cardinal axis steps and exact 45-degree diagonals classify into
    their own classes (pure integer comparisons, no trig)."""
    from engine.geo.traj import _heading_expr
    from pyspark.sql import functions as F

    cases = [(5, 0, "E"), (-3, 0, "W"), (0, 9, "N"), (0, -2, "S"),
             (4, 4, "NE"), (4, -4, "SE"), (-4, 4, "NW"), (-4, -4, "SW"),
             (5, 3, "E"), (3, 5, "N"), (-2, -7, "S")]
    df = spark.createDataFrame([(dx, dy) for dx, dy, _ in cases],
                               "dx long, dy long")
    got = [r.h for r in df.select(
        _heading_expr(F.col("dx"), F.col("dy")).alias("h")).collect()]
    assert got == [h for _, _, h in cases]


# ----------------------------------------------------------- staypoints

import datetime as _dt

from engine.geo.traj import traj_staypoints


def test_staypoints_brute(spark):
    """Runs of >=3 same-cell consecutive points, vs a sequential scan."""
    epoch = _dt.datetime(1970, 1, 1)
    # track: cell A x4 (with in-cell jitter), cell B x2, back to A x3
    pts = [
        (1, 10, 0, 12.1, 7.2), (1, 20, 1, 12.9, 7.8),
        (1, 30, 2, 12.5, 7.1), (1, 40, 3, 12.2, 7.9),
        (1, 50, 4, 22.0, 7.0), (1, 60, 5, 22.4, 7.4),
        (1, 70, 6, 12.0, 7.0), (1, 80, 7, 12.8, 7.6),
        (1, 90, 8, 12.3, 7.3),
        # user 2: never 3 in a row
        (2, 10, 9, 0.0, 0.0), (2, 20, 10, 30.0, 0.0),
        (2, 30, 11, 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        [(u, epoch + _dt.timedelta(seconds=s), e, la, lo)
         for (u, s, e, lo, la) in pts],
        "user_id long, ts timestamp, event_id long, lat double, lon double")
    rows = sorted(
        traj_staypoints(df, min_points=3, cell_deg=5.0).collect(),
        key=lambda r: r["start_us"])
    assert [(r["user_id"], r["cell_x"], r["cell_y"], r["n_points"],
             r["start_us"] // 1_000_000, r["end_us"] // 1_000_000)
            for r in rows] == [
        (1, 2, 1, 4, 10, 40),     # first stay in cell (12/5=2, 7/5=1)
        (1, 2, 1, 3, 70, 90),     # the return visit is a SEPARATE stay
    ]
    for r in rows:
        assert r["dwell_us"] == r["end_us"] - r["start_us"]


# ------------------------------------------------------------- resample

from engine.geo.traj import traj_resample


def test_resample_brute(spark):
    """Grid-tick lerp vs a sequential reference, negative deltas
    included."""
    # track 1: x decreasing (negative dx), y increasing
    pts = [
        (1, 0, 1000, 0, 0), (1, 10_000_000, 400, 600, 1),
        (1, 25_000_000, 100, 900, 2),
        # track 2: single point -> tick only if it lands on the grid
        (2, 8_000_000, 7, 7, 3),
        # track 3: coincident tick and point
        (3, 4_000_000, 50, 60, 4), (3, 12_000_000, 90, 20, 5),
    ]
    df = spark.createDataFrame(pts, "user_id long, us long, x long, "
                               "y long, seq long")
    G = 4_000_000
    got = {(r["user_id"], r["tick_us"]): (r["x"], r["y"])
           for r in traj_resample(df, grid_us=G).collect()}

    def lerp(c0, c1, t, t0, t1):
        if t1 == t0:
            return c0
        num = (c1 - c0) * (t // 1000 - t0 // 1000)
        den = t1 // 1000 - t0 // 1000
        return c0 + (num - ((num % den) + den) % den) // den

    want = {}
    by_k = {}
    for (k, t, x, y, s) in pts:
        by_k.setdefault(k, []).append((t, x, y))
    for k, ps in by_k.items():
        ps.sort()
        t0, t1 = ps[0][0], ps[-1][0]
        tick = ((t0 + G - 1) // G) * G
        while tick <= t1:
            lo = max(p for p in ps if p[0] <= tick)
            hi = min(p for p in ps if p[0] >= tick)
            want[(k, tick)] = (lerp(lo[1], hi[1], tick, lo[0], hi[0]),
                               lerp(lo[2], hi[2], tick, lo[0], hi[0]))
            tick += G
    assert got == want
    # endpoints: coincident grid tick reproduces the exact point
    assert got[(3, 4_000_000)] == (50, 60)
    assert got[(3, 12_000_000)] == (90, 20)


# ---------------------------------------------------------- Hausdorff

from engine.geo.traj import hausdorff_pairs


def _haus_brute(a, b):
    h_ab = max(min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in b)
               for ax, ay in a)
    h_ba = max(min((ax - bx) ** 2 + (ay - by) ** 2 for ax, ay in a)
               for bx, by in b)
    return h_ab, h_ba, max(h_ab, h_ba)


def _run_haus(spark, tracks, pairs):
    rows = [(k, i, x, y) for k, pts in tracks.items()
            for i, (x, y) in enumerate(pts)]
    p = spark.createDataFrame(rows, "key long, pid long, xi long, yi long")
    pr = spark.createDataFrame(pairs, "key_a long, key_b long")
    return {(r.key_a, r.key_b): (r.h2_ab, r.h2_ba, r.h2)
            for r in hausdorff_pairs(p, pr).collect()}


def test_hausdorff_matches_brute(spark):
    import random
    rng = random.Random(77)
    tracks = {k: [(rng.randrange(100), rng.randrange(100))
                  for _ in range(rng.randrange(3, 25))] for k in range(6)}
    pairs = [(a, b) for a in range(6) for b in range(6) if a < b]
    got = _run_haus(spark, tracks, pairs)
    for a, b in pairs:
        assert got[(a, b)] == _haus_brute(tracks[a], tracks[b]), (a, b)


def test_hausdorff_theorems(spark):
    # identity: h(A, A) = 0; containment: A subset of B => h_ab = 0
    # while h_ba measures the extra points; translation changes h by
    # the exact squared offset when tracks are single points
    a = [(0, 0), (10, 0), (10, 10)]
    b = a + [(50, 50)]
    got = _run_haus(spark, {0: a, 1: b, 2: [(3, 4)], 3: [(0, 0)]},
                    [(0, 0), (0, 1), (2, 3)])
    assert got[(0, 0)] == (0, 0, 0)
    assert got[(0, 1)] == (0, (50 - 10) ** 2 + (50 - 10) ** 2, 3200)
    assert got[(2, 3)] == (25, 25, 25)


# ---------------------------------------------- geofencing (D45)

def test_geofence_transitions_reference(spark):
    """Brute per-track replay over the sf0.001 corpus: zone by the
    ordered rect CASE (lowest id wins in overlaps), transitions where
    the zone changes after the first point."""
    import pandas as pd

    import __spark_entry__ as m
    got = {(r.user_id, r.event_id): (r.from_zone, r.to_zone, r.kind)
           for r in m.queries()["traj_geofence"](
               spark, "/root/testdata/sf0.001").collect()}
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["lon"] = (ev["event_id"] * 2654435761) % 360000000 / 1e6 - 180.0
    ev["lat"] = (ev["event_id"] * 40503 + 7) % 170000000 / 1e6 - 85.0
    ev["us"] = ev["ts"].astype("int64")

    def zone(lon, lat):
        for pid, a, b, c, d in m.RECTS:
            if a <= lon < c and b <= lat < d:
                return pid
        return None

    want = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        prev = None
        for i, (_, row) in enumerate(g.iterrows()):
            z = zone(row["lon"], row["lat"])
            if i > 0 and z != prev:
                kind = ("enter" if prev is None
                        else "exit" if z is None else "switch")
                want[(uid, row["event_id"])] = (prev, z, kind)
            prev = z
    assert got == want
    assert {k for *_, k in got.values()} == {"enter", "exit", "switch"}


def test_geofence_overlap_resolves_to_lowest_id(spark):
    """A point inside both R1 and R3 must report R1 (ordered CASE) —
    the determinism witness for overlapping zones."""
    import __spark_entry__ as m
    # R1 = (-30, 0, 60, 60), R3 = (0, 40, 30, 70): overlap region
    lon, lat = 10.0, 50.0
    assert (m.RECTS[1][1] <= lon < m.RECTS[1][3]
            and m.RECTS[1][2] <= lat < m.RECTS[1][4])
    assert (m.RECTS[3][1] <= lon < m.RECTS[3][3]
            and m.RECTS[3][2] <= lat < m.RECTS[3][4])
    zone_case = "CASE " + " ".join(
        f"WHEN lon >= {a} AND lon < {c} AND lat >= {b} AND lat < {d} "
        f"THEN '{pid}'" for pid, a, b, c, d in m.RECTS) + " END"
    [r] = spark.createDataFrame([(lon, lat)], "lon double, lat double") \
        .selectExpr(f"{zone_case} AS z").collect()
    assert r.z == "R1"
