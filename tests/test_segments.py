"""segment_join (late r4) — the orientation predicate is cross-checked
against an INDEPENDENT exact-rational parametric solver (fractions),
the named cases are pinned, and the distributed blocked join is
compared to brute-force all-pairs."""

from __future__ import annotations

import itertools

import duckdb
import numpy as np
import pytest

from engine.geo.segments import (seg_intersect_py, seg_intersect_sql,
                                 segment_join)

CASES = [
    # (A, B, C, D, expect)
    (((0, 0), (10, 10), (0, 10), (10, 0)), True),    # proper X crossing
    (((0, 0), (10, 0), (5, 0), (5, 10)), True),      # T-touch midpoint
    (((0, 0), (10, 0), (10, 0), (20, 5)), True),     # shared endpoint
    (((0, 0), (10, 0), (4, 0), (6, 0)), True),       # collinear contained
    (((0, 0), (10, 0), (10, 0), (20, 0)), True),     # collinear endpoint
    (((0, 0), (10, 0), (11, 0), (20, 0)), False),    # collinear disjoint
    (((0, 0), (10, 0), (0, 1), (10, 1)), False),     # parallel
    (((0, 0), (10, 10), (6, 5), (20, 5)), False),    # near miss
    (((0, 0), (10, 0), (5, 1), (5, 10)), False),     # T stops short
]


@pytest.mark.parametrize("segs,expect", CASES)
def test_named_cases(segs, expect):
    assert seg_intersect_py(*segs) is expect


def _sql_eval(pairs):
    """Evaluate the shared predicate text in DuckDB over pair rows."""
    con = duckdb.connect()
    vals = ",".join(
        "(%d,%d,%d,%d,%d,%d,%d,%d)" % (a + b + c + d)
        for (a, b, c, d) in pairs)
    pred = seg_intersect_sql("s1", "s2").replace("s1.", "a").replace(
        "s2.", "b")  # s1.ax -> aax etc., matching the VALUES columns
    rows = con.execute(
        f"SELECT {pred} FROM (VALUES {vals}) "
        "t(aax, aay, abx, aby, bax, bay, bbx, bby)").fetchall()
    return [bool(r[0]) for r in rows]


def test_predicate_text_matches_rational_solver():
    """Shared SQL text == exact-rational parametric solver on an
    exhaustive small-grid sample (forces every degeneracy class)."""
    r = np.random.default_rng(4)
    pairs = []
    for _ in range(600):
        pts = [tuple(map(int, p)) for p in r.integers(0, 7, (4, 2))]
        pairs.append(tuple(pts))
    got = _sql_eval(pairs)
    want = [seg_intersect_py(*p) for p in pairs]
    assert got == want
    assert sum(want) > 50  # the sample genuinely exercises both classes


def test_distributed_join_matches_brute(spark):
    r = np.random.default_rng(8)
    n = 120
    segs = []
    for i in range(n):
        ax, ay = (int(v) for v in r.integers(0, 1 << 22, 2))
        dx, dy = (int(v) - (1 << 17) for v in r.integers(0, 1 << 18, 2))
        bx = min(max(ax + dx, 0), (1 << 22) - 1)
        by = min(max(ay + dy, 0), (1 << 22) - 1)
        segs.append((i, ax, ay, bx, by))
    df = spark.createDataFrame(
        segs, "seg_id long, ax long, ay long, bx long, by long")
    got = {(row.a_id, row.b_id)
           for row in segment_join(df, z=5, level=22).collect()}
    want = set()
    for (i, *s), (j, *t) in itertools.combinations(segs, 2):
        a, b = (s[0], s[1]), (s[2], s[3])
        c, d = (t[0], t[1]), (t[2], t[3])
        if seg_intersect_py(a, b, c, d):
            want.add((i, j))
    assert got == want
    assert len(want) > 0


def test_join_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(0, 1, 1, 2, 2)], "seg_id long, ax long, ay long, bx long, by long")
    plan = segment_join(df, z=5, level=22) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rasterize_properties(spark):
    """rasterize_segments: the DDA pixel-set theorems — endpoints
    exact, 8-connectivity, strictly monotone major axis, row count =
    major extent + 1, half-pixel error bound (exact integers), and
    direction invariance."""
    from engine.geo.segments import rasterize_segments

    r = np.random.default_rng(12)
    segs, flipped = [], []
    for i in range(60):
        ax, ay, bx, by = (int(v) for v in r.integers(0, 1 << 22, 4))
        segs.append((i, ax, ay, bx, by))
        flipped.append((i, bx, by, ax, ay))
    df = spark.createDataFrame(
        segs, "seg_id long, ax long, ay long, bx long, by long")
    rows = rasterize_segments(df, level=22, z=8).collect()
    by_id = {}
    for row in rows:
        by_id.setdefault(row.seg_id, {})[row.step] = (row.px, row.py)
    sh = 22 - 8
    for i, ax, ay, bx, by in segs:
        g = [(ax >> sh, ay >> sh), (bx >> sh, by >> sh)]
        walk = [p for _, p in sorted(by_id[i].items())]
        dm = max(abs(g[1][0] - g[0][0]), abs(g[1][1] - g[0][1]))
        assert len(walk) == dm + 1
        assert walk[0] in g and walk[-1] in g           # endpoints exact
        xs = [p[0] for p in walk]
        ys = [p[1] for p in walk]
        for (x1_, y1_), (x2_, y2_) in zip(walk, walk[1:]):
            assert max(abs(x2_ - x1_), abs(y2_ - y1_)) == 1  # 8-adjacent
        xmajor = abs(g[1][0] - g[0][0]) >= abs(g[1][1] - g[0][1])
        major = xs if xmajor else ys
        assert sorted(major) in (major, major[::-1]) and len(set(major)) \
            == len(major)                                # strict monotone
        # half-pixel bound: |2*dm*(minor-n0) - 2*step*dn_signed| <= dm
        lo = min(g, key=lambda p: p[0] if xmajor else p[1])
        hi = max(g, key=lambda p: p[0] if xmajor else p[1])
        n0 = lo[1] if xmajor else lo[0]
        dn_s = (hi[1] - lo[1]) if xmajor else (hi[0] - lo[0])
        if dm:
            for step, p in enumerate(walk if walk[0] == lo else walk[::-1]):
                minor = p[1] if xmajor else p[0]
                assert abs(2 * dm * (minor - n0) - 2 * step * dn_s) <= dm
    # direction invariance
    df2 = spark.createDataFrame(
        flipped, "seg_id long, ax long, ay long, bx long, by long")
    rows2 = rasterize_segments(df2, level=22, z=8).collect()
    pix = {}
    for row in rows2:
        pix.setdefault(row.seg_id, set()).add((row.px, row.py))
    for i in by_id:
        assert set(by_id[i].values()) == pix[i]


def test_rasterize_plan_no_python_no_shuffle(spark):
    from engine.geo.segments import rasterize_segments
    df = spark.createDataFrame(
        [(0, 1, 1, 900, 400)], "seg_id long, ax long, ay long, bx long, by long")
    plan = rasterize_segments(df, level=22, z=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
