"""Ear-clipping triangulation: the directed-edge-cancellation theorem
(a set of n-2 CCW triangles is a triangulation of a simple ring IFF
internal directed edges cancel pairwise and the residue is exactly the
boundary cycle), area-sum exactness, degenerate handling, and
distributed==sequential parity."""

from __future__ import annotations

import collections
import math
import random

import pytest

from engine.geo.triangulate import (_cross, _dedup_open_ring, _shoelace2,
                                    earclip_py, triangulate_rings)


def _assert_is_triangulation(pts, tris):
    """pts: open deduped ring; tris: coordinate triples."""
    n = len(pts)
    assert len(tris) == n - 2
    area = abs(_shoelace2(pts))
    assert sum(_cross(a, b, c) for a, b, c in tris) == area
    assert all(_cross(a, b, c) >= 0 for a, b, c in tris)
    edges = collections.Counter()
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            if edges[(v, u)] > 0:
                edges[(v, u)] -= 1
            else:
                edges[(u, v)] += 1
    residue = {e for e, k in edges.items() if k}
    ccw = pts if _shoelace2(pts) >= 0 else pts[::-1]
    boundary = {(ccw[i], ccw[(i + 1) % n]) for i in range(n)}
    assert residue == boundary


def _star_polygon(rng, n, r=1000):
    """Angle-sorted random points around a center: always simple."""
    angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
    pts = []
    for t in angs:
        rad = rng.randrange(r // 4, r)
        p = (round(rad * math.cos(t)), round(rad * math.sin(t)))
        if not pts or pts[-1] != p:
            pts.append(p)
    return pts if len(pts) >= 3 and abs(_shoelace2(pts)) > 0 else None


def test_square_splits_into_two_ccw_triangles():
    pts = [(0, 0), (4, 0), (4, 4), (0, 4)]
    tris = earclip_py(pts)
    _assert_is_triangulation(pts, tris)
    assert len(tris) == 2 and all(_cross(a, b, c) == 16 for a, b, c in tris)


def test_cw_input_is_normalized():
    pts = [(0, 0), (0, 4), (4, 4), (4, 0)]       # clockwise square
    _assert_is_triangulation(pts[::-1], earclip_py(pts))


def test_random_star_polygons():
    rng = random.Random(4242)
    done = 0
    while done < 25:
        pts = _star_polygon(rng, rng.randrange(5, 60))
        if pts is None:
            continue
        _assert_is_triangulation(pts, earclip_py(pts))
        done += 1


def test_reflex_comb_polygon():
    # a comb with deep reflex notches — the ear test must reject
    # triangles containing the teeth
    pts = [(0, 0), (10, 0), (10, 10), (8, 10), (8, 2), (6, 2), (6, 10),
           (4, 10), (4, 2), (2, 2), (2, 10), (0, 10)]
    _assert_is_triangulation(pts, earclip_py(pts))


def test_collinear_chain_fallback_zero_area_ears():
    # collinear run along the bottom edge: fallback clips emit
    # zero-area triangles but n-2 and the area sum still hold
    pts = [(0, 0), (2, 0), (4, 0), (6, 0), (6, 6), (0, 6)]
    tris = earclip_py(pts)
    _assert_is_triangulation(pts, tris)


def test_nonsimple_bowtie_raises():
    with pytest.raises(RuntimeError):
        earclip_py([(0, 0), (4, 4), (4, 0), (0, 4)])


def test_dedup_open_ring_handles_closed_and_runs():
    assert _dedup_open_ring([0, 0, 4, 4, 0], [0, 0, 0, 4, 0]) == \
        [(0, 0), (4, 0), (4, 4)]


def test_spark_matches_sequential_and_partitioning(spark):
    rng = random.Random(99)
    rows, want = [], {}
    made = 0
    while made < 8:
        pts = _star_polygon(rng, rng.randrange(6, 40))
        if pts is None:
            continue
        rid = f"p{made}:0:outer"
        verts = [(x / 1e6, y / 1e6) for x, y in pts]
        # expected coords go through the SAME double floor(v*1e6) path
        # the operator quantizes with (x/1e6*1e6 is not exact in binary)
        qpts = _dedup_open_ring(
            [math.floor(vx * 1e6) for vx, _ in verts],
            [math.floor(vy * 1e6) for _, vy in verts])
        try:
            want[rid] = earclip_py(qpts)
        except RuntimeError:
            continue                 # quantization broke simplicity
        rows.append((f"p{made}", rid, "outer", verts))
        made += 1
    from engine.geo.measure import RING_SCHEMA
    for parts in (1, 7):
        df = spark.createDataFrame(rows, schema=RING_SCHEMA) \
            .repartition(parts)
        got = collections.defaultdict(list)
        for r in triangulate_rings(df).orderBy("ring_id", "tri_idx") \
                .collect():
            got[r.ring_id].append(((r.ax, r.ay), (r.bx, r.by),
                                   (r.cx, r.cy)))
        assert dict(got) == want, parts


def test_fixture_outer_rings_all_triangulate(spark):
    from engine.geo.layer import PolygonLayer
    from engine.geo.measure import rings_df
    rings = rings_df(PolygonLayer.from_json(), spark) \
        .filter("kind = 'outer'")
    raw = {r.ring_id: r.verts for r in rings.collect()}
    tri = triangulate_rings(rings)
    per = collections.defaultdict(list)
    for r in tri.orderBy("ring_id", "tri_idx").collect():
        per[r.ring_id].append(((r.ax, r.ay), (r.bx, r.by), (r.cx, r.cy)))
    assert set(per) == set(raw)
    for rid, tris in per.items():
        pts = _dedup_open_ring(
            [math.floor(v.lon * 1e6) for v in raw[rid]],
            [math.floor(v.lat * 1e6) for v in raw[rid]])
        _assert_is_triangulation(pts, tris)


# --------------------------------------------------------------- sampling

from engine.geo.triangulate import sample_polygons


def _pip_scaled(px_num, py_num, q, pts):
    """Exact PIP of the rational point (px_num/q, py_num/q) against the
    integer ring: scale the ring by q and ray-cast in exact ints.
    Boundary counts as inside (samples may land on chord edges)."""
    n = len(pts)
    sp = [(x * q, y * q) for x, y in pts]
    inside = False
    for i in range(n):
        (x1, y1), (x2, y2) = sp[i], sp[(i + 1) % n]
        # on-segment check, exact
        if (x2 - x1) * (py_num - y1) == (y2 - y1) * (px_num - x1):
            if min(x1, x2) <= px_num <= max(x1, x2) \
                    and min(y1, y2) <= py_num <= max(y1, y2):
                return True
        if (y1 > py_num) != (y2 > py_num):
            # px < x1 + (py-y1)(x2-x1)/(y2-y1), exact cross-multiplied
            lhs = (px_num - x1) * (y2 - y1)
            rhs = (py_num - y1) * (x2 - x1)
            if (lhs < rhs) if (y2 > y1) else (lhs > rhs):
                inside = not inside
    return inside


def test_samples_inside_polygon_and_stratified(spark):
    from engine.geo.layer import PolygonLayer
    from engine.geo.measure import rings_df
    rings = rings_df(PolygonLayer.from_json(), spark) \
        .filter("kind = 'outer'")
    raw = {r.ring_id: r.verts for r in rings.collect()}
    k = 8
    out = sample_polygons(rings, k=k).collect()
    assert len(out) == k * len(raw)
    per_tri = collections.Counter()
    for r in out:
        pts = _dedup_open_ring(
            [math.floor(v.lon * 1e6) for v in raw[r.ring_id]],
            [math.floor(v.lat * 1e6) for v in raw[r.ring_id]])
        assert _pip_scaled(r.px_num, r.py_num, r.q, pts), \
            (r.ring_id, r.j)
        per_tri[(r.ring_id, r.tri_idx)] += 1
    # stratification theorem: each triangle receives within 1 of its
    # proportional share
    for rid, verts in raw.items():
        pts = _dedup_open_ring([math.floor(v.lon * 1e6) for v in verts],
                               [math.floor(v.lat * 1e6) for v in verts])
        tris = earclip_py(pts)
        total = sum(_cross(a, b, c) for a, b, c in tris)
        for i, (a, b, c) in enumerate(tris):
            share = k * _cross(a, b, c) / total
            assert abs(per_tri[(rid, i)] - share) < 1, (rid, i)


def test_sampling_partitioning_and_seed(spark):
    from engine.geo.layer import PolygonLayer
    from engine.geo.measure import rings_df
    rings = rings_df(PolygonLayer.from_json(), spark) \
        .filter("kind = 'outer'")
    a = sorted(map(tuple, sample_polygons(rings, k=4).collect()))
    b = sorted(map(tuple,
                   sample_polygons(rings.repartition(5), k=4).collect()))
    c = sorted(map(tuple,
                   sample_polygons(rings, k=4, seed=2).collect()))
    assert a == b
    assert a != c                     # the seed actually moves points
    # same slots/triangles either way (the seed only moves barycentrics)
    assert [r[:4] for r in a] == [r[:4] for r in c]


# ------------------------------------------- point on surface

def _strictly_inside(px, py, ring):
    """Exact integer strict-interior test of (px, py) vs the CLOSED
    integer ring (scaled so all operands are ints): boundary hits
    return False; interior decided by ray crossing."""
    n = len(ring)
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        if cross == 0 and min(ax, bx) <= px <= max(ax, bx) \
                and min(ay, by) <= py <= max(ay, by):
            return False  # on the boundary
    inside = False
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        if (ay > py) != (by > py):
            # exact crossing comparison: px < ax + (py-ay)*(bx-ax)/(by-ay)
            lhs = (px - ax) * (by - ay)
            rhs = (py - ay) * (bx - ax)
            if (by - ay) > 0:
                if lhs < rhs:
                    inside = not inside
            else:
                if lhs > rhs:
                    inside = not inside
    return inside


def test_point_on_surface_is_strictly_interior_every_fixture_ring(spark):
    import math
    from engine.geo.layer import PolygonLayer
    from engine.geo.measure import rings_df
    from engine.geo.triangulate import point_on_surface
    rings = rings_df(PolygonLayer.from_json(), spark) \
        .filter("kind = 'outer'")
    verts = {r.ring_id: [(int(math.floor(v.lon * 1e6)),
                          int(math.floor(v.lat * 1e6)))
                         for v in r.verts]
             for r in rings.collect()}
    out = point_on_surface(rings).collect()
    assert len(out) == len(verts)
    for r in out:
        ring3 = [(3 * x, 3 * y) for x, y in verts[r.ring_id]]
        # the rational point (pos_x3/3, pos_y3/3) scaled by 3 is exact
        assert _strictly_inside(r.pos_x3, r.pos_y3, ring3), r.ring_id
        assert r.area2 > 0


def test_point_on_surface_concave_centroid_would_fail(spark):
    # an L-shape whose PLAIN centroid falls outside the polygon: the
    # operator's point must still be strictly interior.
    import math
    rows = [("L", "L:0:outer", "outer",
             [{"lon": 0.0, "lat": 0.0}, {"lon": 4.0, "lat": 0.0},
              {"lon": 4.0, "lat": 1.0}, {"lon": 1.0, "lat": 1.0},
              {"lon": 1.0, "lat": 4.0}, {"lon": 0.0, "lat": 4.0}])]
    from engine.geo.triangulate import point_on_surface
    rings = spark.createDataFrame(
        rows, "poly_id string, ring_id string, kind string, "
              "verts array<struct<lon double, lat double>>")
    r = point_on_surface(rings).collect()[0]
    ring3 = [(3 * int(math.floor(v["lon"] * 1e6)),
              3 * int(math.floor(v["lat"] * 1e6)))
             for v in rows[0][3]]
    assert _strictly_inside(r.pos_x3, r.pos_y3, ring3)
