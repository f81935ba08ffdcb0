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


# ------------------------------------------------------------- HyperLogLog

import math

import numpy as np

from engine.sketch import (HLL_M, HLL_RMAX, HLL_W, hll_build, hll_estimate)
from engine.text.dedup import _mix64


def _hll_ref(keys):
    """Sequential register reference: dict bucket -> max rho."""
    h = _mix64(np.asarray(sorted(set(keys)), dtype=np.int64)
               .view(np.uint64).copy())
    bucket = (h & np.uint64(HLL_M - 1)).astype(int)
    v = ((h >> np.uint64(9)) & np.uint64((1 << HLL_W) - 1)).astype(np.int64)
    rho = np.where(v > 0,
                   HLL_W - np.floor(np.log2(np.maximum(v, 1))).astype(int),
                   HLL_RMAX)
    regs: dict = {}
    for b, r in zip(bucket, rho):
        regs[int(b)] = max(regs.get(int(b), 0), int(r))
    return regs


def _regs(df):
    return {r["bucket"]: r["rho"] for r in df.collect()}


def test_hll_registers_match_sequential(spark):
    keys = [k * 17 + 3 for k in range(4000)] + [5, 5, 5]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    assert _regs(hll_build(df, "k")) == _hll_ref(keys)


def test_hll_merge_law(spark):
    """regs(A ++ B) == cellwise max of regs(A), regs(B) — the property
    stream_hll's icelite read-time MAX-merge leans on."""
    a = [k for k in range(2000)]
    b = [k * 31 + 7 for k in range(1500)]
    da = spark.createDataFrame([(k,) for k in a], "k long")
    db = spark.createDataFrame([(k,) for k in b], "k long")
    ra, rb = _regs(hll_build(da, "k")), _regs(hll_build(db, "k"))
    merged = {bk: max(ra.get(bk, 0), rb.get(bk, 0))
              for bk in set(ra) | set(rb)}
    dab = spark.createDataFrame([(k,) for k in a + b], "k long")
    assert _regs(hll_build(dab, "k")) == merged


def test_hll_accuracy_and_duplicate_blindness(spark):
    """Raw estimate within 3 stderr (~14%% at m=512) of truth in the
    large-range regime, and invariant under duplication."""
    n = 30000
    df = spark.createDataFrame([(k * 13 + 1,) for k in range(n)], "k long")
    row = hll_estimate(hll_build(df, "k")).collect()[0]
    assert abs(row["hll_est"] - n) / n < 3 * 1.04 / math.sqrt(HLL_M)
    dup = df.union(df).union(df)
    row2 = hll_estimate(hll_build(dup, "k")).collect()[0]
    assert (row2["m"], row2["used_buckets"], row2["s_scaled"],
            row2["hll_est"]) == \
           (row["m"], row["used_buckets"], row["s_scaled"], row["hll_est"])


def test_hll_small_range_linear_counting(spark):
    """The committed (m, used) surface supports the consumer-side
    linear-counting correction: LC = m * ln(m / (m - used)) lands
    within 5%% when n << m, where the raw estimate legitimately
    overshoots (documented small-range regime)."""
    n = 150
    df = spark.createDataFrame([(k * 7919,) for k in range(n)], "k long")
    row = hll_estimate(hll_build(df, "k")).collect()[0]
    lc = HLL_M * math.log(HLL_M / (HLL_M - row["used_buckets"]))
    assert abs(lc - n) / n < 0.05


# ------------------------------------------------------------ Bloom filter

from engine.sketch import BLOOM_SEEDS, bloom_build, bloom_probe


def _bloom_ref_pos(x, m=512):
    a = np.asarray([x], dtype=np.int64).view(np.uint64)
    return {int(_mix64((a + np.uint64(s)).copy())[0] % np.uint64(m))
            for s in BLOOM_SEEDS}


def test_bloom_no_false_negatives_and_exact_fp_set(spark):
    build_keys = [k * 13 + 5 for k in range(80)]
    probe_keys = list(range(3000))
    bd = spark.createDataFrame([(k,) for k in build_keys], "k long")
    pd_ = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    bits = bloom_build(bd, "k")
    got = {r["k"] for r in bloom_probe(pd_, "k", bits).collect()}
    # sequential reference
    setpos = set()
    for k in build_keys:
        setpos |= _bloom_ref_pos(k)
    want = {k for k in probe_keys if _bloom_ref_pos(k) <= setpos}
    assert got == want                      # exact, FPs included
    assert set(build_keys) <= got           # no false negatives ever
    fps = got - set(build_keys)
    n, m, k = len(set(build_keys)), 512, 3
    import math as _m
    expected_fp = (1 - _m.exp(-k * n / m)) ** k
    # generous 3x envelope on the classic FP-rate estimate
    assert len(fps) / len(probe_keys) < 3 * expected_fp + 0.01


def test_bloom_probe_plan_has_no_probe_shuffle(spark):
    """The probe side must be filtered in place: no Exchange above the
    probe scan (broadcast of the one-row bit array only)."""
    bd = spark.createDataFrame([(k,) for k in range(50)], "k long")
    pr = spark.range(0, 10000).selectExpr("id AS k")
    plan = (bloom_probe(pr, "k", bloom_build(bd, "k"))
            ._jdf.queryExecution().executedPlan().toString())
    import re
    # shuffle exchanges may appear only under the broadcast build of
    # the bit array (keyed on `pos`); the probe side must have none
    for line in plan.splitlines():
        m = re.search(r"Exchange (hash|range)partitioning\(([^,)]+)", line)
        assert m is None or m.group(2).startswith("pos#"), line
