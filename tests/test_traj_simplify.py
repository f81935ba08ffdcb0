"""C-ts — open-polyline Douglas-Peucker on GPS tracks
(engine/geo/simplify.py::_dp_keep_open / simplify_tracks): parity with
a recursive reference DP, endpoint/degenerate handling, collinear
collapse, the idempotence property, and the Spark operator's
sorted-collect correctness under shuffled input order."""

from __future__ import annotations

import numpy as np

from engine.geo.simplify import Q, _dp_keep_open, simplify_tracks


def _ref_dp(xs, ys, tol_q6):
    """Recursive reference (textbook form) with the same exact-integer
    predicate and lowest-index tie break."""
    n = len(xs)
    if n <= 2:
        return list(range(n))
    tol2 = tol_q6 * tol_q6

    def rec(i, j, keep):
        if j - i < 2:
            return
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        best, best_m = -1, -1
        for k in range(i + 1, j):
            if len2 == 0:
                m = (xs[k] - ax) ** 2 + (ys[k] - ay) ** 2
            else:
                c = dx * (ys[k] - ay) - dy * (xs[k] - ax)
                m = c * c
            if m > best_m:
                best, best_m = k, m
        thr = tol2 if len2 == 0 else tol2 * len2
        if best >= 0 and best_m > thr:
            keep.add(best)
            rec(i, best, keep)
            rec(best, j, keep)

    keep = {0, n - 1}
    rec(0, n - 1, keep)
    return sorted(keep)


def test_matches_reference_randomized():
    rng = np.random.default_rng(43)
    for seed in range(6):
        n = 30 + seed * 40
        xs = [int(v) for v in rng.integers(-10**8, 10**8, n)]
        ys = [int(v) for v in rng.integers(-8 * 10**7, 8 * 10**7, n)]
        for tol in (0, 10**5, 10**7):
            assert _dp_keep_open(xs, ys, tol) == _ref_dp(xs, ys, tol), \
                (seed, tol)


def test_endpoints_and_degenerates():
    assert _dp_keep_open([5], [7], 100) == [0]
    assert _dp_keep_open([5, 9], [7, 2], 100) == [0, 1]
    # coincident endpoints with a far middle vertex (len2 == 0 arm)
    got = _dp_keep_open([0, 10**7, 0], [0, 0, 0], 10**5)
    assert got == [0, 1, 2]
    # coincident endpoints, middle within tol -> dropped
    got = _dp_keep_open([0, 50, 0], [0, 50, 0], 10**5)
    assert got == [0, 2]


def test_collinear_collapses_to_endpoints():
    xs = [i * 10**6 for i in range(50)]
    ys = [i * 2 * 10**6 for i in range(50)]
    assert _dp_keep_open(xs, ys, 1) == [0, 49]


def test_idempotence():
    """Simplifying the kept polyline again keeps every vertex (every
    interior kept vertex was farther than tol from its final chord)."""
    rng = np.random.default_rng(47)
    xs = [int(v) for v in rng.integers(-10**8, 10**8, 200)]
    ys = [int(v) for v in rng.integers(-8 * 10**7, 8 * 10**7, 200)]
    tol = 5 * 10**6
    keep = _dp_keep_open(xs, ys, tol)
    x2 = [xs[i] for i in keep]
    y2 = [ys[i] for i in keep]
    assert _dp_keep_open(x2, y2, tol) == list(range(len(keep)))


def test_spark_operator_sorted_collect(spark):
    """Multi-track frame fed in SHUFFLED row order: the JVM-side
    sorted collect must reproduce the sequential per-track DP on the
    (ts, seq)-ordered coordinates exactly."""
    rng = np.random.default_rng(53)
    rows, exp = [], {}
    for u in range(6):
        n = 20 + 11 * u
        lon = rng.uniform(-179, 179, n)
        lat = rng.uniform(-84, 84, n)
        xs = [int(np.floor(v * Q)) for v in lon]
        ys = [int(np.floor(v * Q)) for v in lat]
        keep = _dp_keep_open(xs, ys, int(round(10.0 * Q)))
        exp[u] = (n, len(keep), sum(xs[i] for i in keep),
                  sum(ys[i] for i in keep))
        for i in range(n):
            rows.append((u, f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}",
                         i, float(lon[i]), float(lat[i])))
    rng.shuffle(rows)
    df = spark.createDataFrame(
        [(u, t, s, lo, la) for u, t, s, lo, la in rows],
        "user_id long, ts string, event_id long, lon double, lat double"
    ).withColumn("ts", _c("ts"))
    got = {r.user_id: (r.n_in, r.n_out, r.sx_q6, r.sy_q6)
           for r in simplify_tracks(df, tol_deg=10.0).collect()}
    assert got == exp


def _c(col):
    from pyspark.sql import functions as F
    return F.col(col).cast("timestamp")
