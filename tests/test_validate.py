"""Ring validity (engine/geo/validate.py) vs an INDEPENDENT
Fraction-arithmetic segment-intersection oracle (parametric 2x2 solve,
not orientation predicates), plus hand-derived closed forms for the
four committed invalid fixtures and star-polygon properties.  DuckDB
value-hash parity for the poly_validate driver key runs in
test_entry_contract's sweep."""

from __future__ import annotations

import math
import random
from fractions import Fraction

from engine.geo.validate import validate_ring_py, validate_rings


def _frac_segs_intersect(p1, p2, q1, q2) -> bool:
    """Independent closed-segment intersection: solve
    p1 + t*(p2-p1) == q1 + s*(q2-q1) with exact Fractions."""
    dpx, dpy = p2[0] - p1[0], p2[1] - p1[1]
    dqx, dqy = q2[0] - q1[0], q2[1] - q1[1]
    det = dpx * (-dqy) - dpy * (-dqx)
    rx, ry = q1[0] - p1[0], q1[1] - p1[1]
    if det != 0:
        t = Fraction(rx * (-dqy) - ry * (-dqx), det)
        s = Fraction(dpx * ry - dpy * rx, det)
        return 0 <= t <= 1 and 0 <= s <= 1
    # parallel: intersect only if collinear AND 1-D overlap
    if dpx * ry - dpy * rx != 0:
        return False
    # project onto the dominant axis of p
    axis = 0 if abs(dpx) >= abs(dpy) else 1
    lo_p, hi_p = sorted((p1[axis], p2[axis]))
    lo_q, hi_q = sorted((q1[axis], q2[axis]))
    return max(lo_p, lo_q) <= min(hi_p, hi_q)


def _brute(verts):
    n = len(verts)
    dup, area2, segs = 0, 0, []
    for i in range(n):
        a, b = verts[i], verts[(i + 1) % n]
        area2 += a[0] * b[1] - b[0] * a[1]
        if a == b:
            dup += 1
        else:
            segs.append((i, a, b))
    n_x = 0
    for s in range(len(segs)):
        i, p1, p2 = segs[s]
        for t in range(s + 1, len(segs)):
            j, q1, q2 = segs[t]
            if (j - i) % n == 1 or (i - j) % n == 1:
                continue
            if _frac_segs_intersect(p1, p2, q1, q2):
                n_x += 1
    return (n, dup, area2, 1 if area2 > 0 else 0, n_x,
            1 if (dup == 0 and n_x == 0) else 0)


def test_invalid_fixture_closed_forms():
    from __spark_entry__ import INVALID_RINGS
    q6 = {r: [(int(x * 1_000_000), int(y * 1_000_000)) for x, y in vs]
          for _, r, _, vs in INVALID_RINGS}
    # bowtie: one proper crossing, cancelling signed area
    n, dup, area2, ccw, nx, simple = validate_ring_py(q6["X0:bowtie"])
    assert (n, dup, area2, ccw, nx, simple) == (4, 0, 0, 0, 1, 0)
    # duplicate vertex: 1 dup edge; its flanking edges touch (1 pair)
    n, dup, _, ccw, nx, simple = validate_ring_py(q6["X1:dup"])
    assert (n, dup, ccw, nx, simple) == (5, 1, 1, 1, 0)
    # clockwise square: simple, mis-oriented
    n, dup, area2, ccw, nx, simple = validate_ring_py(q6["X2:cw"])
    assert (n, dup, ccw, nx, simple) == (4, 0, 0, 0, 1)
    assert area2 < 0
    # vertex-on-edge touch: one improper intersection
    n, dup, _, _, nx, simple = validate_ring_py(q6["X3:touch"])
    assert (n, dup, nx, simple) == (4, 0, 1, 0)


def test_randomized_matches_fraction_oracle():
    rng = random.Random(31)
    for _ in range(40):
        n = rng.randrange(4, 9)
        verts = [(rng.randrange(0, 7), rng.randrange(0, 7))
                 for _ in range(n)]
        assert validate_ring_py(verts) == _brute(verts), verts


def test_star_polygon_is_simple_ccw():
    rng = random.Random(7)
    pts = {(rng.randrange(-50, 50), rng.randrange(-50, 50))
           for _ in range(12)}
    pts = [p for p in pts if p != (0, 0)]
    verts = sorted(pts, key=lambda p: math.atan2(p[1], p[0]))
    n, dup, area2, ccw, nx, simple = validate_ring_py(verts)
    assert (dup, nx, simple, ccw) == (0, 0, 1, 1)
    assert area2 > 0


def test_distributed_matches_local(spark):
    from engine.geo.layer import PolygonLayer
    from engine.geo.measure import rings_df
    rings = rings_df(PolygonLayer.from_json(), spark)
    got = {r["ring_id"]: (r["n_vertices"], r["n_dup_edges"],
                          r["area2_q6"], r["is_ccw"], r["n_self_x"],
                          r["is_simple"])
           for r in validate_rings(rings).collect()}
    for row in rings.collect():
        q6 = [(math.floor(v["lon"] * 1_000_000),
               math.floor(v["lat"] * 1_000_000)) for v in row["verts"]]
        assert got[row["ring_id"]] == validate_ring_py(q6)
    # the committed layer is clean: every ring simple, outers CCW
    assert all(v[5] == 1 for v in got.values())
