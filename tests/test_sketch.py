"""E14 — count-min sketch: overestimate theorem, exactness regimes,
merge property, sequential parity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from engine.sketch import FOLD, P, ROWS, cms_build, cms_estimate


def _cells(x, width=1024):
    folded = (x * FOLD) % P
    return [((folded * a + b) % P) % width for a, b in ROWS]


def _ref(keys, probes, width=1024):
    mat = [{} for _ in ROWS]
    for x in keys:
        for i, c in enumerate(_cells(x, width)):
            mat[i][c] = mat[i].get(c, 0) + 1
    return {p: min(m.get(c, 0) for m, c in zip(mat, _cells(p, width)))
            for p in probes}


def _run(spark, keys, probes, width=1024):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    pr = spark.createDataFrame([(p,) for p in probes], "k long")
    cms = cms_build(df, "k", width=width)
    return {r.k: r.cms_est
            for r in cms_estimate(cms, pr, "k", width=width).collect()}


def test_matches_sequential_reference(spark):
    rng = random.Random(47)
    keys = [rng.randrange(100000) for _ in range(3000)]
    probes = list({rng.choice(keys) for _ in range(20)}) + [999999999]
    got = _run(spark, keys, probes)
    assert got == _ref(keys, probes)


def test_overestimate_theorem(spark):
    """CMS never underestimates."""
    rng = random.Random(53)
    keys = [rng.randrange(500) for _ in range(5000)]
    truth = {}
    for k in keys:
        truth[k] = truth.get(k, 0) + 1
    probes = sorted(truth)[:30]
    got = _run(spark, keys, probes, width=64)  # narrow -> collisions
    assert all(got[p] >= truth[p] for p in probes)
    assert any(got[p] > truth[p] for p in probes)  # width 64 must collide


def test_exact_when_no_collisions(spark):
    keys = [1, 1, 1, 2, 2, 3]
    got = _run(spark, keys, [1, 2, 3, 4])
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}


def test_merge_is_cellwise_addition(spark):
    """Sketch(A ++ B) == cellwise sum of Sketch(A) and Sketch(B)."""
    rng = random.Random(59)
    a = [rng.randrange(1000) for _ in range(800)]
    b = [rng.randrange(1000) for _ in range(700)]
    da = spark.createDataFrame([(k,) for k in a], "k long")
    db = spark.createDataFrame([(k,) for k in b], "k long")
    dab = spark.createDataFrame([(k,) for k in a + b], "k long")
    merged = (cms_build(da, "k").unionByName(cms_build(db, "k"))
              .groupBy("row", "cell").agg(F.sum("n").alias("n")))
    whole = cms_build(dab, "k")
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, whole.collect()))
