"""M36 — deterministic floored-Lloyd k-means (engine/ml/kmeans.py) vs
the sequential reference, plus the structural properties the integer
contract guarantees."""

from __future__ import annotations

import random

from engine.ml.kmeans import kmeans_int, kmeans_py


def _pts_df(spark, pts):
    return spark.createDataFrame(pts, "id long, x long, y long")


def test_kmeans_matches_reference_random(spark):
    rng = random.Random(13)
    pts = [(i, rng.randrange(1 << 10), rng.randrange(1 << 10))
           for i in range(300)]
    got = {r.id: r.cluster
           for r in kmeans_int(_pts_df(spark, pts), k=6,
                               rounds=3).collect()}
    assert got == kmeans_py(pts, k=6, rounds=3)


def test_kmeans_separated_blobs(spark):
    # four tight blobs far apart.  Deterministic lexicographic seeding
    # puts all k seeds in the lowest-x blob, so exact blob recovery is
    # NOT guaranteed in bounded rounds (k-means is seeding-sensitive —
    # that sensitivity is part of what the determinism contract pins);
    # what IS guaranteed: exact parity with the sequential recurrence,
    # and each blob maps into few clusters (blob diameter << blob
    # separation keeps assignments locally consistent).
    rng = random.Random(5)
    blobs = [(100, 100), (100, 900), (900, 100), (900, 900)]
    pts = []
    for b, (bx, by) in enumerate(blobs):
        for j in range(40):
            pts.append((b * 40 + j, bx + rng.randrange(-20, 21),
                        by + rng.randrange(-20, 21)))
    got = {r.id: r.cluster
           for r in kmeans_int(_pts_df(spark, pts), k=4,
                               rounds=2).collect()}
    want = kmeans_py(pts, k=4, rounds=2)
    assert got == want
    for b in range(4):
        labels = {got[b * 40 + j] for j in range(40)}
        assert len(labels) <= 2


def test_kmeans_partitioning_invariance(spark):
    rng = random.Random(23)
    pts = [(i, rng.randrange(512), rng.randrange(512))
           for i in range(200)]
    a = sorted(map(tuple, kmeans_int(_pts_df(spark, pts),
                                     k=5, rounds=3).collect()))
    b = sorted(map(tuple, kmeans_int(_pts_df(spark, pts).repartition(7),
                                     k=5, rounds=3).collect()))
    assert a == b


def test_kmeans_fewer_points_than_k(spark):
    # n < k: the first n seeds are the points themselves; every point
    # is its own cluster, the surplus centroids stay empty.
    pts = [(0, 10, 10), (1, 20, 20), (2, 30, 30)]
    got = {r.id: r.cluster
           for r in kmeans_int(_pts_df(spark, pts), k=8,
                               rounds=2).collect()}
    assert got == kmeans_py(pts, k=8, rounds=2)
    assert len(set(got.values())) == 3


# ------------------------------------------------ batch perceptron

def test_perceptron_matches_reference_random(spark):
    import random
    from engine.ml.perceptron import perceptron_py, perceptron_train
    rng = random.Random(3)
    rows = [(i, rng.randrange(-50, 51), rng.randrange(-50, 51))
            for i in range(300)]
    rows = [(i, a, b, 1 if 3 * a - 2 * b + 7 > 0 else 0)
            for i, a, b in rows]
    df = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    got = {r.id: (r.score, r.pred)
           for r in perceptron_train(df, rounds=5).collect()}
    want, _ = perceptron_py(rows, rounds=5)
    assert got == want


def test_perceptron_learns_separable_labels(spark):
    from engine.ml.perceptron import perceptron_train
    # a clean margin: y = [x1 > 0] over x1 in {-60..-20, 20..60}
    rows = [(i, v, 0, 1 if v > 0 else 0)
            for i, v in enumerate(list(range(-60, -19, 5))
                                  + list(range(20, 61, 5)))]
    df = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    out = perceptron_train(df, rounds=8, lr_num=1, lr_den=1).collect()
    acc = sum(1 for r in out if r.pred == r.y) / len(out)
    assert acc == 1.0  # the batch perceptron separates a clean margin


def test_perceptron_truncating_division_contract():
    from engine.ml.perceptron import _tdiv
    assert _tdiv(-7, 4) == -1 and _tdiv(7, 4) == 1
    assert _tdiv(-8, 4) == -2 and _tdiv(8, -4) == -2


def test_kmeans_negative_coords_division_semantics(spark):
    # negative centroid sums: the truncating-division contract (Spark
    # DIV / DuckDB //) must hold against the reference, which shares
    # the same _tdiv helper — a floored update would diverge here.
    import random
    rng = random.Random(31)
    pts = [(i, rng.randrange(-1000, 1000), rng.randrange(-1000, 1000))
           for i in range(200)]
    got = {r.id: r.cluster
           for r in kmeans_int(_pts_df(spark, pts), k=5,
                               rounds=3).collect()}
    assert got == kmeans_py(pts, k=5, rounds=3)


# ---------------------------------------------- decision stump (M42)

def test_stump_matches_brute_random(spark):
    import random

    from engine.ml.stump import stump_py, stump_train
    rng = random.Random(17)
    rows = [(rng.randrange(-50, 50), rng.randrange(2)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y int")
    [r] = stump_train(df, "x", "y").collect()
    assert (r.threshold, r.polarity, r.n_errors, r.n) == stump_py(rows)


def test_stump_separable_and_constant_closed_forms(spark):
    from engine.ml.stump import stump_train
    # perfectly separable at x > 10: zero errors, threshold = largest
    # x of the low class (ties to lowest t among zero-error splits)
    rows = [(x, 0) for x in range(0, 11)] + [(x, 1) for x in range(11, 20)]
    df = spark.createDataFrame(rows, "x long, y int")
    [r] = stump_train(df).collect()
    assert (r.threshold, r.polarity, r.n_errors) == (10, "gt", 0)
    # all-one labels: the all-1 classifier ('le' at max x) is exact
    df1 = spark.createDataFrame([(x, 1) for x in range(5)], "x long, y int")
    [r1] = stump_train(df1).collect()
    assert (r1.n_errors, r1.polarity, r1.threshold) == (0, "le", 4)
    # noisy labels: brute equality again on a correlated pattern
    rows2 = [(x, int(x % 7 != 0) if x > 25 else int(x % 5 == 0))
             for x in range(60)]
    from engine.ml.stump import stump_py
    df2 = spark.createDataFrame(rows2, "x long, y int")
    [r2] = stump_train(df2).collect()
    assert (r2.threshold, r2.polarity, r2.n_errors, r2.n) == stump_py(rows2)
