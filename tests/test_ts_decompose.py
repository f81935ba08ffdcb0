"""F12 — exact-rational seasonal-trend decomposition
(engine/relops.py::ts_decompose) vs a sequential reference, the exact
reconstruction identity, and closed forms for linear and gapped
series."""

from __future__ import annotations

import random

from engine.relops import ts_decompose

BUCKET_US = 1_000_000  # 1 s buckets in the tests
W = 5                  # half=2


def _df(spark, rows):
    # rows: (key, us, cents)
    return spark.createDataFrame(rows, "key string, us long, cents long")


def _run(spark, rows, period=4, half=2):
    return ts_decompose(_df(spark, rows), "key", "us", "cents",
                        bucket_us=BUCKET_US, period=period,
                        half=half).collect()


def _ref(rows, period=4, half=2):
    w_full = 2 * half + 1
    agg = {}
    for k, us, c in rows:
        b = us // BUCKET_US
        agg[(k, b)] = agg.get((k, b), 0) + c
    trend, sdev = {}, {}
    for (k, b), v in agg.items():
        win = [agg[(k, bb)] for bb in range(b - half, b + half + 1)
               if (k, bb) in agg]
        if len(win) == w_full:
            trend[(k, b)] = sum(win)
            sdev[(k, b)] = v * w_full - sum(win)
    seas = {}
    for (k, b), d in sdev.items():
        key = (k, b % period)
        n, s = seas.get(key, (0, 0))
        seas[key] = (n + 1, s + d)
    out = {}
    for (k, b), v in agg.items():
        slot = b % period
        ts = trend.get((k, b))
        sd = sdev.get((k, b))
        if (k, slot) in seas:
            n, s = seas[(k, slot)]
            sn, sden = s, n * w_full
        else:
            sn = sden = None
        rn = (sd * sden - sn * w_full
              if sd is not None and sn is not None else None)
        out[(k, b)] = (slot, v, ts, sd, sn, sden, rn)
    return out


def test_decompose_matches_reference_with_gaps(spark):
    rng = random.Random(7)
    rows = []
    for k in ("a", "b"):
        for b in range(40):
            if rng.random() < 0.15:
                continue  # gaps: full-window gate must drop neighbors
            for _ in range(rng.randrange(1, 4)):
                rows.append((k, b * BUCKET_US + rng.randrange(BUCKET_US),
                             rng.randrange(-50, 200)))
    got = {(r.key, r.bucket): (r.slot, r.v_cents, r.trend_sum,
                               r.sdev_num, r.seas_num, r.seas_den,
                               r.resid_num)
           for r in _run(spark, rows)}
    assert got == _ref(rows)


def test_decompose_reconstruction_identity(spark):
    # v*W*seas_den == trend_sum*seas_den + seas_num*W + resid_num
    # wherever the trend is defined — the exact additive identity.
    rng = random.Random(11)
    rows = [("k", b * BUCKET_US, rng.randrange(1000))
            for b in range(30)]
    for r in _run(spark, rows):
        if r.trend_sum is not None and r.seas_den is not None:
            assert (r.v_cents * W * r.seas_den
                    == r.trend_sum * r.seas_den
                    + r.seas_num * W + r.resid_num)


def test_decompose_linear_series_has_zero_seasonal_and_residual(spark):
    # v = 7*bucket: the centered moving average reproduces the line
    # exactly, so every deviation, seasonal, and residual is 0.
    rows = [("k", b * BUCKET_US, 7 * b) for b in range(20)]
    for r in _run(spark, rows):
        if r.trend_sum is not None:
            assert r.sdev_num == 0 and r.seas_num == 0 \
                and r.resid_num == 0
            assert r.trend_sum == W * r.v_cents


def test_decompose_edges_are_null(spark):
    rows = [("k", b * BUCKET_US, 10) for b in range(10)]
    got = {r.bucket: r.trend_sum for r in _run(spark, rows)}
    for b in (0, 1, 8, 9):
        assert got[b] is None
    for b in range(2, 8):
        assert got[b] == 50


# ------------------------------------------------- CUSUM changepoint

def test_changepoint_matches_reference_and_finds_planted_shift(spark):
    import random
    from engine.relops import cusum_changepoint
    rng = random.Random(5)
    # planted mean shift at index 30 of 50: 10 +/- 2 then 100 +/- 2
    vals = [10 + rng.randrange(-2, 3) for _ in range(30)] \
        + [100 + rng.randrange(-2, 3) for _ in range(20)]
    rows = [("k", i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows,
                               "key string, us long, seq long, v long")
    r = cusum_changepoint(df, "key", "us", "seq", "v").collect()[0]
    n, s = len(vals), sum(vals)
    pre, best = 0, None
    for k in range(1, n):
        pre += vals[k - 1]
        g = abs(n * pre - k * s)
        if best is None or g > best[1]:
            best = (k, g, pre)
    assert (r.cp_idx, r.g_max, r.prefix_at_cp) == best
    assert r.cp_idx == 30  # the planted shift is found exactly


def test_changepoint_singleton_reports_zero(spark):
    from engine.relops import cusum_changepoint
    df = spark.createDataFrame([("a", 0, 7, 42)],
                               "key string, us long, seq long, v long")
    r = cusum_changepoint(df, "key", "us", "seq", "v").collect()[0]
    assert (r.n, r.total, r.cp_idx, r.cp_seq, r.g_max) \
        == (1, 42, 0, 7, 0)


def test_changepoint_constant_series_ties_to_lowest_k(spark):
    from engine.relops import cusum_changepoint
    rows = [("k", i, i, 5) for i in range(10)]
    df = spark.createDataFrame(rows,
                               "key string, us long, seq long, v long")
    r = cusum_changepoint(df, "key", "us", "seq", "v").collect()[0]
    # every G_k = |10*5k - k*50| = 0: tie -> k = 1
    assert (r.cp_idx, r.g_max) == (1, 0)


# --------------------------------------------- autocorrelation

def test_autocorr_matches_reference(spark):
    import random
    from engine.relops import autocorr_components
    rng = random.Random(13)
    series = {"a": [rng.randrange(-20, 80) for _ in range(40)],
              "b": [rng.randrange(0, 10) for _ in range(3)]}
    rows = [(k, i, i, v) for k, vs in series.items()
            for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows,
                               "key string, us long, seq long, v long")
    got = {(r.key, r.lag): (r.n, r.sum_c, r.sumsq_c, r.n_pairs,
                            r.lag_dot)
           for r in autocorr_components(df, "key", "us", "seq", "v",
                                        max_lag=3).collect()}
    for k, vs in series.items():
        n = len(vs)
        for lag in (1, 2, 3):
            pairs = list(zip(vs, vs[lag:]))
            assert got[(k, lag)] == (
                n, sum(vs), sum(v * v for v in vs), len(pairs),
                sum(a * b for a, b in pairs))


def test_autocorr_perfect_period_two(spark):
    # alternating +1/-1: lag-1 dot = -(n-1), lag-2 dot = +(n-2) —
    # the textbook oscillation signature, exact.
    from engine.relops import autocorr_components
    vs = [1 if i % 2 == 0 else -1 for i in range(10)]
    df = spark.createDataFrame([("k", i, i, v) for i, v in enumerate(vs)],
                               "key string, us long, seq long, v long")
    got = {r.lag: r.lag_dot
           for r in autocorr_components(df, "key", "us", "seq",
                                        "v").collect()}
    assert got[1] == -9 and got[2] == 8 and got[3] == -7
