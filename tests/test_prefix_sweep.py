"""G3 — distributed prefix sum and sweep-line concurrency."""

from __future__ import annotations

import io
import random
from contextlib import redirect_stdout

from engine.relops import global_prefix_sum, interval_concurrency


def test_prefix_sum_matches_sequential(spark):
    rng = random.Random(19)
    rows = [(i, rng.randrange(-50, 51)) for i in range(500)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long")
    for parts in (1, 4, 32):
        got = {r.k: r.running
               for r in global_prefix_sum(df.repartition(parts), ["k"],
                                          "v").collect()}
        run, exp = 0, {}
        for k, v in sorted(rows):
            run += v
            exp[k] = run
        assert got == exp


def test_prefix_sum_exclusive(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    got = {r.k: r.running
           for r in global_prefix_sum(df, ["k"], "v",
                                      inclusive=False).collect()}
    assert got == {1: 0, 2: 10, 3: 30}


def test_concurrency_matches_brute(spark):
    rng = random.Random(29)
    iv = [(rng.randrange(100), 0) for _ in range(300)]
    iv = [(s, s + 1 + rng.randrange(30)) for s, _ in iv]
    df = spark.createDataFrame(iv, "s long, e long")
    got = {r.boundary: r.active
           for r in interval_concurrency(df, "s", "e").collect()}
    bounds = sorted({b for s, e in iv for b in (s, e)})
    for b in bounds:
        assert got[b] == sum(1 for s, e in iv if s <= b < e), b


def test_concurrency_closes_to_zero(spark):
    iv = [(0, 5), (2, 8), (8, 9)]
    df = spark.createDataFrame(iv, "s long, e long")
    rows = sorted((r.boundary, r.active)
                  for r in interval_concurrency(df, "s", "e").collect())
    assert rows[-1] == (9, 0)  # after the last end nothing is active
    assert rows[0] == (0, 1)


def test_no_single_partition_window_on_big_frame(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    out = global_prefix_sum(df, ["k"], "v")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "rangepartitioning" in plan.lower(), plan
    assert plan.count("SinglePartition") <= 1, plan
