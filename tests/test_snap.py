"""D23 — map matching vs the exact all-pairs Python oracle."""

from __future__ import annotations

import random

from engine.geo.snap import Q_SCALE, snap_points, snap_py


def _run(spark, points, segs, radius, parts=None):
    pdf = spark.createDataFrame(points, "pid long, px long, py long")
    sdf = spark.createDataFrame(segs,
                                "sid long, ax long, ay long, bx long, by long")
    if parts:
        pdf, sdf = pdf.repartition(parts), sdf.repartition(parts)
    return {r.pid: {"px": r.px, "py": r.py, "sid": r.sid,
                    "d2_q25": r.d2_q25, "d2_num": r.d2_num,
                    "d2_den": r.d2_den}
            for r in snap_points(pdf, sdf, radius).collect()}


def _mk(rng, n_pts, n_segs, max_len=120):
    pts = [(i, rng.randrange(4096), rng.randrange(4096))
           for i in range(n_pts)]
    segs = []
    for i in range(n_segs):
        ax, ay = rng.randrange(4096), rng.randrange(4096)
        bx = min(max(ax + rng.randrange(-max_len, max_len + 1), 0), 4095)
        by = min(max(ay + rng.randrange(-max_len, max_len + 1), 0), 4095)
        segs.append((i, ax, ay, bx, by))
    return pts, segs


def test_random_matches_exact_oracle(spark):
    rng = random.Random(17)
    pts, segs = _mk(rng, 300, 40)
    exp = snap_py(pts, segs, 64)
    for parts in (1, 9):
        assert _run(spark, pts, segs, 64, parts) == exp


def test_endpoint_interior_and_degenerate_cases(spark):
    segs = [(1, 100, 100, 200, 100),   # horizontal
            (2, 500, 500, 500, 500)]   # degenerate (point)
    pts = [(1, 150, 110),   # interior: d2 = 100/1
           (2, 90, 100),    # endpoint a: d2 = 100
           (3, 210, 105),   # endpoint b: d2 = 125
           (4, 505, 512),   # degenerate seg: d2 = 25 + 144
           (5, 3000, 3000)]  # out of corridor: no row
    got = _run(spark, pts, segs, 20)
    # interior: ap2=2600, len2=10000, dot=5000 ->
    # n = 2600*10000 - 5000^2 = 1_000_000, d = 10000 (true d2 = 100)
    assert got[1] == {"px": 150, "py": 110, "sid": 1,
                      "d2_q25": 100 * Q_SCALE, "d2_num": 1_000_000,
                      "d2_den": 10_000}
    assert got[2]["d2_num"] == 100 and got[2]["d2_den"] == 1
    assert got[3]["d2_num"] == 125 and got[3]["sid"] == 1
    assert got[4]["sid"] == 2 and got[4]["d2_num"] == 169
    assert 5 not in got
    assert got == snap_py(pts, segs, 20)


def test_tie_breaks_to_lowest_sid(spark):
    # two mirror-image segments equidistant from the point
    segs = [(7, 100, 90, 200, 90), (3, 100, 110, 200, 110)]
    pts = [(1, 150, 100)]
    got = _run(spark, pts, segs, 15)
    assert got[1]["sid"] == 3
    assert got == snap_py(pts, segs, 15)


def test_radius_boundary_inclusive(spark):
    segs = [(1, 100, 100, 200, 100)]
    pts = [(1, 150, 110), (2, 150, 111)]  # d = 10 (= r), d = 11 (> r)
    got = _run(spark, pts, segs, 10)
    assert 1 in got and 2 not in got


def test_cross_tile_candidates_not_lost(spark):
    """Point and its nearest segment in different 256-tiles: the
    r-expanded bbox explode must still produce the pair."""
    segs = [(1, 250, 250, 254, 250)]   # tile (0, 0)
    pts = [(1, 260, 260)]              # tile (1, 1)
    got = _run(spark, pts, segs, 30)
    assert got[1]["sid"] == 1
    assert got == snap_py(pts, segs, 30)


def test_domain_guards():
    import pytest
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    pdf = spark.createDataFrame([(1, 0, 0)], "pid long, px long, py long")
    sdf = spark.createDataFrame([(1, 0, 0, 1, 1)],
                                "sid long, ax long, ay long, bx long, by long")
    with pytest.raises(ValueError):
        snap_points(pdf, sdf, radius=300)
    with pytest.raises(ValueError):
        snap_points(pdf, sdf, radius=16, grid_bits=16)
