"""Douglas-Peucker simplification (engine/geo/simplify.py): the DP
tolerance guarantee, idempotence, collinear collapse, anchors, and the
distributed/local parity — the independent verification backing the
simplify_rings golden pin."""

from __future__ import annotations

import math

from engine.geo.measure import RING_SCHEMA
from engine.geo.simplify import (
    Q, _dp_keep, dense_zigzag_rings, simplify_rings,
)

TOL_DEG = 0.02
TOL_Q6 = int(round(TOL_DEG * Q))


def _q6(verts):
    xs = [math.floor(x * Q) for x, _ in verts]
    ys = [math.floor(y * Q) for _, y in verts]
    return xs, ys


def _seg_dist(px, py, ax, ay, bx, by):
    """Euclidean point-to-segment distance (float, test-side only)."""
    dx, dy = bx - ax, by - ay
    if dx == 0 and dy == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def test_tolerance_guarantee_every_dropped_vertex_near_kept_chain():
    # DP invariant: a dropped vertex lies within tol of the kept segment
    # it was discarded against, hence within tol of the kept closed chain
    for ring in dense_zigzag_rings(4):
        xs, ys = _q6(ring[3])
        keep = _dp_keep(xs, ys, TOL_Q6)
        kept_pts = [(xs[i], ys[i]) for i in keep] + [(xs[keep[0]], ys[keep[0]])]
        for k in range(len(xs)):
            if k in keep:
                continue
            d = min(_seg_dist(xs[k], ys[k], *kept_pts[s], *kept_pts[s + 1])
                    for s in range(len(kept_pts) - 1))
            # 1.01: float slack in the TEST metric only (DP itself is exact)
            assert d <= TOL_Q6 * 1.01, (ring[0], k, d)


def test_spikes_survive_simplification():
    # every 0.5-degree spike sticks out 25x the tolerance: all spike
    # vertices must be kept
    for ring in dense_zigzag_rings(2):
        xs, ys = _q6(ring[3])
        keep = set(_dp_keep(xs, ys, TOL_Q6))
        n = len(xs)
        spikes = [i for i in range(n) if i % 23 == 0]
        missing = [i for i in spikes if i not in keep]
        assert not missing, (ring[0], missing)


def test_idempotent_and_anchors_kept():
    ring = dense_zigzag_rings(1)[0]
    xs, ys = _q6(ring[3])
    keep = _dp_keep(xs, ys, TOL_Q6)
    assert 0 in keep
    xs2 = [xs[i] for i in keep]
    ys2 = [ys[i] for i in keep]
    keep2 = _dp_keep(xs2, ys2, TOL_Q6)
    assert keep2 == list(range(len(xs2)))      # re-simplify: no-op


def test_collinear_chain_collapses():
    # horizontal run with sub-tolerance wiggles collapses to the anchors
    xs = [i * 10_000 for i in range(50)]
    ys = [(i % 2) * (TOL_Q6 // 4) for i in range(50)]
    keep = _dp_keep(xs, ys, TOL_Q6)
    assert keep == [0, 49]
    assert _dp_keep(xs[:3], ys[:3], TOL_Q6) == [0, 1, 2]   # <=3 passthrough


def test_distributed_matches_local(spark):
    rows = dense_zigzag_rings(3)
    out = {r.ring_id: r for r in
           simplify_rings(spark.createDataFrame(rows, schema=RING_SCHEMA),
                          tol_deg=TOL_DEG).collect()}
    for ring in rows:
        xs, ys = _q6(ring[3])
        keep = _dp_keep(xs, ys, TOL_Q6)
        r = out[ring[1]]
        assert r.n_vertices_out == len(keep)
        assert r.sx_q6 == sum(xs[i] for i in keep)
        assert r.sy_q6 == sum(ys[i] for i in keep)
        assert len(r.verts_simplified) == len(keep)
