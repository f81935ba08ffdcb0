"""G2 — 2-D skyline vs the brute-force dominance oracle."""

from __future__ import annotations

import io
import random
from contextlib import redirect_stdout

from engine.relops import skyline_2d


def _brute(points):
    """points: [(x, y)] -> {(x, y): n_dup} of non-dominated pairs."""
    from collections import Counter
    cnt = Counter(points)
    keys = list(cnt)
    out = {}
    for p in keys:
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in keys)
        if not dominated:
            out[p] = cnt[p]
    return out


def _mk(rng, n, lo=0, hi=40):
    return [(rng.randrange(lo, hi), rng.randrange(lo, hi))
            for _ in range(n)]


def test_global_matches_brute(spark):
    rng = random.Random(3)
    pts = _mk(rng, 500) + _mk(rng, 20, 0, 5)  # extra density at the corner
    df = spark.createDataFrame(pts, "x long, y long")
    for parts in (1, 7, 32):
        got = {(r.x, r.y): r.n_dup
               for r in skyline_2d(df.repartition(parts), "x", "y").collect()}
        assert got == _brute(pts)


def test_duplicate_frontier_points_survive(spark):
    pts = [(1, 9), (1, 9), (9, 1), (5, 5), (5, 5), (6, 6)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.x, r.y): r.n_dup for r in skyline_2d(df, "x", "y").collect()}
    assert got == {(1, 9): 2, (9, 1): 1, (5, 5): 2}


def test_grouped_matches_brute_per_group(spark):
    rng = random.Random(9)
    rows = [(f"g{g}", x, y) for g in range(5) for x, y in _mk(rng, 80)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {}
    for r in skyline_2d(df, "x", "y", group_col="g").collect():
        got.setdefault(r.g, {})[(r.x, r.y)] = r.n_dup
    for g in range(5):
        pts = [(x, y) for gg, x, y in rows if gg == f"g{g}"]
        assert got[f"g{g}"] == _brute(pts), g


def test_degenerate_shapes(spark):
    # single point; a pure chain (everything on the frontier);
    # a single dominator.
    df1 = spark.createDataFrame([(3, 4)], "x long, y long")
    assert [(r.x, r.y, r.n_dup)
            for r in skyline_2d(df1, "x", "y").collect()] == [(3, 4, 1)]
    chain = [(i, 10 - i) for i in range(10)]
    df2 = spark.createDataFrame(chain, "x long, y long")
    assert len(skyline_2d(df2, "x", "y").collect()) == 10
    dom = [(0, 0)] + [(i + 1, j + 1) for i in range(5) for j in range(5)]
    df3 = spark.createDataFrame(dom, "x long, y long")
    assert [(r.x, r.y) for r in skyline_2d(df3, "x", "y").collect()] \
        == [(0, 0)]


def test_no_big_frame_single_partition_window(spark):
    """The distinct frame's prefix min must run range-partitioned; the
    only SinglePartition exchange allowed is the tiny per-partition-min
    frame (n_parts rows)."""
    df = spark.createDataFrame([(i % 13, i % 7) for i in range(100)],
                               "x long, y long")
    out = skyline_2d(df, "x", "y")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "rangepartitioning" in plan.lower(), plan
    assert plan.count("SinglePartition") <= 1, plan
