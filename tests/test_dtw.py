"""D39 — dynamic-time-warping track similarity (engine/geo/traj.py::
dtw_pairs) vs an independent memoized recursive reference, plus the
structural theorems that tie it to the rest of the similarity triple."""

from __future__ import annotations

import random
import sys
from functools import lru_cache

from engine.geo.traj import dtw_pairs, dtw_py, frechet_py


def _dtw_ref(a, b):
    """Independent reference: top-down memoized recursion (the rolling
    row in dtw_py is bottom-up — different traversal, same recurrence)."""
    sys.setrecursionlimit(100000)

    @lru_cache(maxsize=None)
    def c(i, j):
        d = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
        if i == 0 and j == 0:
            return d
        if i == 0:
            return c(0, j - 1) + d
        if j == 0:
            return c(i - 1, 0) + d
        return min(c(i - 1, j), c(i, j - 1), c(i - 1, j - 1)) + d

    return c(len(a) - 1, len(b) - 1)


def _tracks(rng, n_keys, lo=4, hi=12):
    return {k: [(rng.randrange(1 << 10), rng.randrange(1 << 10))
                for _ in range(rng.randrange(lo, hi))]
            for k in range(n_keys)}


def _pts_df(spark, tracks):
    rows = [(k, i, x, y) for k, t in tracks.items()
            for i, (x, y) in enumerate(t)]
    return spark.createDataFrame(rows, "key long, pid long, xi long, yi long")


def _pairs_df(spark, tracks):
    ks = sorted(tracks)
    rows = [(a, b) for i, a in enumerate(ks) for b in ks[i + 1:]]
    return spark.createDataFrame(rows, "key_a long, key_b long")


def test_dtw_py_matches_memoized_reference():
    rng = random.Random(31)
    for _ in range(30):
        a = [(rng.randrange(100), rng.randrange(100))
             for _ in range(rng.randrange(1, 15))]
        b = [(rng.randrange(100), rng.randrange(100))
             for _ in range(rng.randrange(1, 15))]
        assert dtw_py(a, b) == _dtw_ref(tuple(a), tuple(b))


def test_dtw_pairs_matches_reference(spark):
    rng = random.Random(7)
    tracks = _tracks(rng, 8)
    got = {(r.key_a, r.key_b): (r.n_a, r.n_b, r.dtw2)
           for r in dtw_pairs(_pts_df(spark, tracks),
                              _pairs_df(spark, tracks)).collect()}
    ks = sorted(tracks)
    want = {(a, b): (len(tracks[a]), len(tracks[b]),
                     _dtw_ref(tuple(tracks[a]), tuple(tracks[b])))
            for i, a in enumerate(ks) for b in ks[i + 1:]}
    assert got == want


def test_dtw_identical_tracks_zero_and_symmetry():
    rng = random.Random(3)
    a = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(9)]
    b = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(6)]
    assert dtw_py(a, a) == 0  # diagonal coupling is all-zero cost
    assert dtw_py(a, b) == dtw_py(b, a)


def test_dtw_dominates_frechet_and_endpoints():
    # (a) the DTW-optimal path is itself a monotone coupling, so its
    #     max step cost >= the Frechet min-max => dtw2 >= f2;
    # (b) both endpoint pairs are always matched => dtw2 >= d2(first)
    #     + d2(last) whenever the DP has >= 2 cells.
    rng = random.Random(11)
    for _ in range(25):
        a = [(rng.randrange(200), rng.randrange(200))
             for _ in range(rng.randrange(2, 12))]
        b = [(rng.randrange(200), rng.randrange(200))
             for _ in range(rng.randrange(2, 12))]
        d = dtw_py(a, b)
        assert d >= frechet_py(a, b)
        d_first = (a[0][0] - b[0][0]) ** 2 + (a[0][1] - b[0][1]) ** 2
        d_last = (a[-1][0] - b[-1][0]) ** 2 + (a[-1][1] - b[-1][1]) ** 2
        assert d >= d_first + d_last


def test_dtw_time_warp_invariance():
    # Repeating a point along a track adds at most 0 extra cost against
    # the same track (the duplicate aligns to the same partner): DTW of
    # a track vs its duplicated-point version is 0 — the elastic
    # property that distinguishes DTW from lockstep L2.
    rng = random.Random(19)
    a = [(rng.randrange(500), rng.randrange(500)) for _ in range(7)]
    dup = [p for q in a for p in (q, q)]  # every point duplicated once
    assert dtw_py(a, dup) == 0
