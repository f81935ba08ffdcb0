"""Discrete Frechet (engine/geo/traj.py::frechet_pairs) vs an
INDEPENDENT memoized recursive reference, plus the f2 >= h2 domination
theorem against the driver-green Hausdorff operator and closed-form
cases.  The traj_frechet driver key is sf0.01-pinned golden (the DP is
not SQL-expressible); this file is its independent verification."""

from __future__ import annotations

import random
from functools import lru_cache

from pyspark.sql import functions as F

from engine.geo.traj import frechet_pairs, frechet_py, hausdorff_pairs


def _frechet_rec(a, b):
    """Independent formulation: the textbook memoized recursion."""
    @lru_cache(maxsize=None)
    def c(i, j):
        d = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
        if i == 0 and j == 0:
            return d
        if i == 0:
            return max(c(0, j - 1), d)
        if j == 0:
            return max(c(i - 1, 0), d)
        return max(min(c(i - 1, j), c(i, j - 1), c(i - 1, j - 1)), d)
    return c(len(a) - 1, len(b) - 1)


def _h2_py(a, b):
    ab = max(min((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 for q in b)
             for p in a)
    ba = max(min((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 for p in a)
             for q in b)
    return max(ab, ba)


def test_frechet_matches_recursive_reference():
    rng = random.Random(11)
    for _ in range(25):
        a = [(rng.randrange(0, 40), rng.randrange(0, 40))
             for _ in range(rng.randrange(1, 12))]
        b = [(rng.randrange(0, 40), rng.randrange(0, 40))
             for _ in range(rng.randrange(1, 12))]
        assert frechet_py(a, b) == _frechet_rec(a, b)


def test_frechet_dominates_hausdorff_and_symmetry():
    rng = random.Random(13)
    for _ in range(20):
        a = [(rng.randrange(0, 30), rng.randrange(0, 30))
             for _ in range(rng.randrange(1, 10))]
        b = [(rng.randrange(0, 30), rng.randrange(0, 30))
             for _ in range(rng.randrange(1, 10))]
        f2 = frechet_py(a, b)
        assert f2 >= _h2_py(a, b)
        assert f2 == frechet_py(b, a)


def test_frechet_closed_forms():
    # identical tracks -> 0
    t = [(0, 0), (3, 4), (6, 0)]
    assert frechet_py(t, t) == 0
    # single points -> plain squared distance
    assert frechet_py([(0, 0)], [(3, 4)]) == 25
    # parallel straight tracks offset by 5 -> 25 (constant leash)
    a = [(i, 0) for i in range(5)]
    b = [(i, 5) for i in range(5)]
    assert frechet_py(a, b) == 25
    # reversal is NOT free for Frechet (unlike Hausdorff): the leash
    # must stretch across the whole track when one side runs backwards
    assert frechet_py(a, a[::-1]) == 16  # (4-0)^2 forced at an end


def test_frechet_pairs_distributed_matches_local(spark):
    rng = random.Random(17)
    rows = []
    for k in range(6):
        for i in range(rng.randrange(2, 9)):
            rows.append((k, i, rng.randrange(0, 100),
                         rng.randrange(0, 100)))
    pts = spark.createDataFrame(
        rows, "key long, pid long, xi long, yi long")
    keys = pts.select(F.col("key").alias("key_a")).distinct()
    pairs = keys.join(keys.select(F.col("key_a").alias("key_b")),
                      F.col("key_a") < F.col("key_b"))
    got = {(r["key_a"], r["key_b"]): (r["n_a"], r["n_b"], r["f2"])
           for r in frechet_pairs(pts, pairs).collect()}
    trk = {}
    for k, i, xx, yy in sorted(rows, key=lambda r: (r[0], r[1])):
        trk.setdefault(k, []).append((xx, yy))
    for ka in trk:
        for kb in trk:
            if ka < kb:
                assert got[(ka, kb)] == (len(trk[ka]), len(trk[kb]),
                                         frechet_py(trk[ka], trk[kb]))
    # domination vs the distributed Hausdorff on the same fixture
    h = {(r["key_a"], r["key_b"]): r["h2"]
         for r in hausdorff_pairs(pts, pairs).collect()}
    assert all(got[p][2] >= h[p] for p in h)
