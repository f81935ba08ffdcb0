"""D1/D2/D4/D7 + E6 — spatial join modes, salting, range join (SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.geo import cells as ec
from engine.geo.join import bbox_range_join, spatial_join
from engine.geo.layer import PolygonLayer
from engine.geo.skew import heavy_hitters, salted_equijoin
from engine.planner import choose_join_level, plan_spatial_join
from oracle import geo as og

HOT_LON, HOT_LAT = 2.2945, 48.8584  # inside P11


@pytest.fixture(scope="module")
def layer():
    return PolygonLayer.from_json()


def _points_df(spark, seed=21, n=3000, hot_frac=0.1):
    r = np.random.default_rng(seed)
    lon = r.uniform(-180, 180, n)
    lat = r.uniform(-85, 85, n)
    nh = int(n * hot_frac)
    lon[:nh] = HOT_LON + r.uniform(-0.01, 0.01, nh)
    lat[:nh] = HOT_LAT + r.uniform(-0.01, 0.01, nh)
    pdf = pd.DataFrame({"image_id": [f"i{i:06d}" for i in range(n)],
                        "lon": lon, "lat": lat})
    return spark.createDataFrame(pdf), lon, lat


def _oracle_pairs(layer, lon, lat):
    want = set()
    for pid, parts in layer.parts().items():
        for i in range(len(lon)):
            if any(og.point_in_polygon(lon[i], lat[i], r.tolist(),
                                       [h.tolist() for h in hs])
                   for r, hs in parts):
                want.add((f"i{i:06d}", pid))
    return want


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_spatial_join_modes_match_oracle(spark, layer, mode):
    df, lon, lat = _points_df(spark)
    level = choose_join_level(layer)
    out = spatial_join(df, layer, level=level, mode=mode)
    got = {(r.image_id, r.poly_id) for r in out.select("image_id", "poly_id").collect()}
    assert got == _oracle_pairs(layer, lon, lat)


def test_spatial_join_salted_matches_unsalted(spark, layer):
    df, lon, lat = _points_df(spark)
    level = choose_join_level(layer)
    probe = ec.with_cell(df)
    probe = probe.withColumn("cell_p", ec.cell_parent_col("cell", level))
    hot = heavy_hitters(probe, "cell_p", top=4)
    assert hot, "hot cells should exist (10% of rows in one cell)"
    out = spatial_join(df, layer, level=level, mode="shuffle",
                       hot_keys=hot, salt=4)
    got = {(r.image_id, r.poly_id) for r in out.select("image_id", "poly_id").collect()}
    assert got == _oracle_pairs(layer, lon, lat)


def test_salted_equijoin_no_duplicates(spark):
    probe = spark.createDataFrame(
        [(i, 100 if i % 2 == 0 else i) for i in range(200)], "image_id int, k int"
    )
    build = spark.createDataFrame(
        [(100, "hot"), (3, "a"), (5, "b")], "k int, tag string"
    )
    out = salted_equijoin(probe, build, key="k", hot_keys=[100], salt=8,
                          probe_id_col="image_id")
    rows = out.groupBy("image_id", "k", "tag").count().filter("count > 1").count()
    assert rows == 0
    assert out.count() == 100 + 2  # 100 hot matches + image_id 3 and 5


def test_heavy_hitters_finds_hot_cell(spark, layer):
    df, _, _ = _points_df(spark)
    probe = ec.with_cell(df)
    probe = probe.withColumn("cell_p", ec.cell_parent_col("cell", 8))
    hot_cell = og.cell_parent(og.cell_encode(HOT_LON, HOT_LAT), 8)
    hh = heavy_hitters(probe, "cell_p", top=1)
    assert hh == [hot_cell]


def test_planner_level_and_mode(layer):
    plan = plan_spatial_join(layer)
    assert 4 <= plan.level <= 16
    assert plan.mode == "broadcast"
    assert layer.covering_size(plan.level) <= 4096
    assert layer.covering_size(plan.level + 1) > 4096


def test_bbox_range_join(spark):
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 5.0, 5.0), (3, -0.5, 0.5)], "id int, lon double, lat double"
    )
    rects = spark.createDataFrame(
        [("r1", 0.0, 0.0, 1.0, 1.0), ("r2", -1.0, 0.0, 1.0, 2.0)],
        "rect_id string, minlon double, minlat double, maxlon double, maxlat double",
    )
    got = {(r.id, r.rect_id) for r in bbox_range_join(pts, rects).collect()}
    assert got == {(1, "r1"), (1, "r2"), (3, "r2")}


# ------------------------------------------- covering overlap join (D11)

def test_covering_overlap_self_join_rect_brute_force(spark):
    """Candidates are a superset of truly-intersecting pairs; after the
    exact bbox refine the driver key equals brute force — here we check
    the candidate stage itself against brute force on the 4-rect layer
    (R1/R3 overlap; every true pair must be among the candidates)."""
    from engine.geo.join import covering_overlap_join
    from engine.geo.layer import PolygonLayer, rect_polygon
    rects = [("R0", -150.0, -60.0, -30.0, 10.0),
             ("R1", -30.0, 0.0, 60.0, 60.0),
             ("R2", 60.0, -45.0, 175.0, 70.0),
             ("R3", 0.0, 40.0, 30.0, 70.0)]
    layer = PolygonLayer([rect_polygon(*r) for r in rects])
    cands = {(r.poly_a, r.poly_b)
             for r in covering_overlap_join(layer, None, spark, 5).collect()}
    true_pairs = set()
    for i, (pa, a0, b0, a1, b1) in enumerate(rects):
        for pb, c0, d0, c1, d1 in rects[i + 1:]:
            if a0 < c1 and c0 < a1 and b0 < d1 and d0 < b1:
                true_pairs.add((pa, pb))
    assert true_pairs == {("R1", "R3")}
    assert true_pairs <= cands
    assert all(a < b for a, b in cands)  # unordered pairs, emitted once


def test_covering_overlap_two_layers(spark):
    from engine.geo.join import covering_overlap_join
    from engine.geo.layer import PolygonLayer, rect_polygon
    la = PolygonLayer([rect_polygon("A", -10.0, -10.0, 10.0, 10.0)])
    lb = PolygonLayer([rect_polygon("B", 0.0, 0.0, 20.0, 20.0),
                       rect_polygon("C", 100.0, 0.0, 120.0, 20.0)])
    cands = {(r.poly_a, r.poly_b)
             for r in covering_overlap_join(la, lb, spark, 6).collect()}
    assert ("A", "B") in cands and ("A", "C") not in cands


# ------------------------------------------------------- zonal stats

def test_zonal_stats_matches_brute_force(spark):
    from engine.geo.join import zonal_stats
    from engine.geo.layer import PolygonLayer, rect_polygon
    rects = [("Z0", -60.0, -30.0, 20.0, 30.0),
             ("Z1", 0.0, 0.0, 90.0, 60.0)]     # overlap: multi-zone points
    layer = PolygonLayer([rect_polygon(*r) for r in rects])
    pts = spark.createDataFrame(
        [(i, float((i * 37) % 240 - 120), float((i * 53) % 120 - 60), i * 10)
         for i in range(400)],
        "id long, lon double, lat double, v long")
    got = {r.poly_id: (r.n, r.sum_v, r.min_v, r.max_v)
           for r in zonal_stats(pts, layer, level=6, value_col="v").collect()}
    exp = {}
    for i in range(400):
        lon, lat, v = (i * 37) % 240 - 120, (i * 53) % 120 - 60, i * 10
        for pid, x0, y0, x1, y1 in rects:
            if x0 <= lon < x1 and y0 <= lat < y1:   # half-open convention
                n, s, lo, hi = exp.get(pid, (0, 0, None, None))
                exp[pid] = (n + 1, s + v,
                            v if lo is None else min(lo, v),
                            v if hi is None else max(hi, v))
    assert got == exp and len(exp) == 2


# --------------------------------------------------------- nearest poly

def test_nearest_polygon_brute(spark):
    """Bounded nearest-covering-cell assignment vs a sequential scan,
    incl. tie-break and sentinel."""
    from engine.geo.join import nearest_polygon
    cov = [("PA", 10, 10), ("PB", 12, 10), ("PA", 11, 10), ("PZ", 50, 50)]
    cdf = spark.createDataFrame(cov, "poly_id string, cx long, cy long")
    # points at known grid positions: lon/lat chosen so the level-8
    # merc coords land exactly (x = floor((lon+180)/360*256))
    import math

    def lonlat_for(x, y):
        lon = (x + 0.5) / 256.0 * 360.0 - 180.0
        # invert y = floor((1 - ln(tan(pi/4 + rad/2))/pi)/2 * 256)
        t = (1.0 - 2.0 * (y + 0.5) / 256.0) * math.pi
        lat = math.degrees(2.0 * math.atan(math.exp(t)) - math.pi / 2.0)
        return lon, lat

    pts = []
    for i, (x, y) in enumerate([(10, 10),   # on PA
                                (13, 10),   # d1 to PB
                                (11, 12),   # d2 tie PA(11,10)/PB? ->
                                (30, 30),   # beyond radius 2
                                (12, 12)]):  # d2, tie PA(11,10)x? PB(12,10) d2 -> PA vs PB
        lon, lat = lonlat_for(x, y)
        pts.append((i, lon, lat))
    pdf = spark.createDataFrame(pts, "id long, lon double, lat double")
    got = {r["id"]: (r["poly_id"], r["d_l1"])
           for r in nearest_polygon(pdf, cdf, radius=2).collect()}
    want = {}
    for i, (x, y) in enumerate([(10, 10), (13, 10), (11, 12),
                                (30, 30), (12, 12)]):
        cands = [(abs(x - cx) + abs(y - cy), p) for (p, cx, cy) in cov
                 if abs(x - cx) <= 2 and abs(y - cy) <= 2]
        want[i] = (min(cands)[1], min(cands)[0]) if cands else (None, 5)
    assert got == want
    assert got[3] == (None, 5)          # sentinel beyond the bound


# ---------------------------------------------------- zonal majority

def test_zonal_majority_matches_brute_force(spark):
    from engine.geo.join import zonal_majority
    from engine.geo.layer import PolygonLayer, rect_polygon
    rects = [("Z0", -60.0, -30.0, 20.0, 30.0),
             ("Z1", 0.0, 0.0, 90.0, 60.0)]
    layer = PolygonLayer([rect_polygon(*r) for r in rects])
    pts = spark.createDataFrame(
        [(i, float((i * 37) % 240 - 120), float((i * 53) % 120 - 60), i % 5)
         for i in range(400)],
        "id long, lon double, lat double, cls long")
    got = {r.poly_id: (r.maj_class, r.maj_n, r.n_classes, r.n)
           for r in zonal_majority(pts, layer, level=6,
                                   class_col="cls").collect()}
    counts = {}
    for i in range(400):
        lon, lat, c = (i * 37) % 240 - 120, (i * 53) % 120 - 60, i % 5
        for pid, x0, y0, x1, y1 in rects:
            if x0 <= lon < x1 and y0 <= lat < y1:
                counts.setdefault(pid, {})
                counts[pid][c] = counts[pid].get(c, 0) + 1
    exp = {}
    for pid, cc in counts.items():
        # tie-break: max count, then LOWEST class
        maj = min(cc, key=lambda c: (-cc[c], c))
        exp[pid] = (maj, cc[maj], len(cc), sum(cc.values()))
    assert got == exp and len(exp) == 2


def test_zonal_majority_tie_breaks_to_lowest_class(spark):
    from engine.geo.join import zonal_majority
    from engine.geo.layer import PolygonLayer, rect_polygon
    layer = PolygonLayer([rect_polygon("Z", -10.0, -10.0, 10.0, 10.0)])
    # classes 3 and 1 tie at 2 points each: majority must be 1
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0, 3), (1, 2.0, 2.0, 3),
         (2, 3.0, 3.0, 1), (3, 4.0, 4.0, 1)],
        "id long, lon double, lat double, cls long")
    r = zonal_majority(pts, layer, level=6, class_col="cls").collect()[0]
    assert (r.poly_id, r.maj_class, r.maj_n, r.n_classes, r.n) \
        == ("Z", 1, 2, 2, 4)


# -------------------------------------------- overlay intersection area

def test_poly_intersect_area_matches_brute(spark):
    import __spark_entry__ as m
    got = {(r.poly_a, r.poly_b): (r.inter_area, r.area_a, r.area_b)
           for r in m.queries()["poly_intersect_area"](
               spark, "/root/testdata/sf0.001").collect()}
    rects = {pid: (int(a), int(b), int(c), int(d))
             for pid, a, b, c, d in m._grid_rects()}
    exp = {}
    ids = sorted(rects)
    for i, pa in enumerate(ids):
        for pb in ids[i + 1:]:
            ax0, ay0, ax1, ay1 = rects[pa]
            bx0, by0, bx1, by1 = rects[pb]
            iw = min(ax1, bx1) - max(ax0, bx0)
            ih = min(ay1, by1) - max(ay0, by0)
            if iw > 0 and ih > 0:
                exp[(pa, pb)] = (iw * ih,
                                 (ax1 - ax0) * (ay1 - ay0),
                                 (bx1 - bx0) * (by1 - by0))
    assert got == exp and len(exp) > 30
    # IoU sanity: 0 < inter <= min(areas) for every pair
    for (pa, pb), (i_, a_, b_) in got.items():
        assert 0 < i_ <= min(a_, b_)
