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
