"""Ring validity report (r4 cont.) — the OGC is-simple/orientation
audit OSM-class pipelines run before trusting third-party geometry:
per ring, exact-integer counts of consecutive-duplicate vertices and
non-adjacent segment self-intersections, the signed shoelace area
(orientation), and the derived is_simple flag.

Exactness contract (the shoelace/simplify rule): coordinates quantize
once with FLOOR(coord * 10^6) into int64; every predicate is then pure
integer arithmetic — orientation signs are compared as signs (never
d1*d2, whose magnitude would exceed int64), collinear touches use
bbox containment, and Python big-ints make every comparison exact, so
the report is bit-identical on any host (golden-pinnable class, but
the driver key carries a full SQL twin since the input rings are
VALUES-inlinable).

Definition (shared verbatim by the SQL twin):
- segments are the n closed-ring edges by ORIGINAL index; zero-length
  edges (consecutive duplicates) are COUNTED in n_dup_edges and then
  EXCLUDED from the intersection scan (a degenerate segment has no
  well-defined intersection test);
- two segments are "adjacent" when their original indices are
  consecutive mod n; adjacent pairs legitimately share an endpoint and
  are excluded;
- n_self_x counts unordered non-adjacent pairs that intersect
  properly (strict sign crossing on both) OR touch (an endpoint of
  one lies on the other, collinear overlap included via the bbox
  test);
- is_simple = (n_dup_edges == 0 AND n_self_x == 0).

Scale shape: geometry-local — one Arrow-batched pass, zero shuffle,
embarrassingly parallel over 10^12 rings; the O(n_i^2) pair scan is
bounded per ring (rings are 10s-1000s of vertices), never over the
corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

Q = 1_000_000


def _sign(v: int) -> int:
    return (v > 0) - (v < 0)


def _cross(ox: int, oy: int, ax: int, ay: int, bx: int, by: int) -> int:
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _on_bbox(px, py, ax, ay, bx, by) -> bool:
    return (min(ax, bx) <= px <= max(ax, bx)
            and min(ay, by) <= py <= max(ay, by))


def _segs_intersect(p1, p2, q1, q2) -> bool:
    """Exact closed-segment intersection (proper or touching)."""
    d1 = _cross(q1[0], q1[1], q2[0], q2[1], p1[0], p1[1])
    d2 = _cross(q1[0], q1[1], q2[0], q2[1], p2[0], p2[1])
    d3 = _cross(p1[0], p1[1], p2[0], p2[1], q1[0], q1[1])
    d4 = _cross(p1[0], p1[1], p2[0], p2[1], q2[0], q2[1])
    if _sign(d1) * _sign(d2) < 0 and _sign(d3) * _sign(d4) < 0:
        return True
    if d1 == 0 and _on_bbox(p1[0], p1[1], q1[0], q1[1], q2[0], q2[1]):
        return True
    if d2 == 0 and _on_bbox(p2[0], p2[1], q1[0], q1[1], q2[0], q2[1]):
        return True
    if d3 == 0 and _on_bbox(q1[0], q1[1], p1[0], p1[1], p2[0], p2[1]):
        return True
    if d4 == 0 and _on_bbox(q2[0], q2[1], p1[0], p1[1], p2[0], p2[1]):
        return True
    return False


def validate_ring_py(verts_q6: list[tuple[int, int]]):
    """Reference kernel over one open ring of q6 integer coords ->
    (n_vertices, n_dup_edges, area2_q6, is_ccw, n_self_x, is_simple)."""
    n = len(verts_q6)
    area2 = 0
    dup = 0
    segs = []  # (orig_index, a, b), zero-length excluded
    for i in range(n):
        a = verts_q6[i]
        b = verts_q6[(i + 1) % n]
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
                continue  # adjacent by original index
            if _segs_intersect(p1, p2, q1, q2):
                n_x += 1
    is_ccw = 1 if area2 > 0 else 0
    is_simple = 1 if (dup == 0 and n_x == 0) else 0
    return n, dup, area2, is_ccw, n_x, is_simple


def validate_rings(rings: DataFrame) -> DataFrame:
    """rings (poly_id, ring_id, kind, verts array<struct<lon,lat>>) ->
    per-ring validity report.  Single Arrow-batched pass, no shuffle."""
    import math

    def _validate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"poly_id": [], "ring_id": [], "kind": [],
                   "n_vertices": [], "n_dup_edges": [], "area2_q6": [],
                   "is_ccw": [], "n_self_x": [], "is_simple": []}
            for r in pdf.itertuples(index=False):
                q6 = [(int(math.floor(v["lon"] * Q)),
                       int(math.floor(v["lat"] * Q))) for v in r.verts]
                n, dup, area2, ccw, n_x, simple = validate_ring_py(q6)
                out["poly_id"].append(r.poly_id)
                out["ring_id"].append(r.ring_id)
                out["kind"].append(r.kind)
                out["n_vertices"].append(n)
                out["n_dup_edges"].append(dup)
                out["area2_q6"].append(area2)
                out["is_ccw"].append(ccw)
                out["n_self_x"].append(n_x)
                out["is_simple"].append(simple)
            yield pd.DataFrame(out)

    schema = ("poly_id string, ring_id string, kind string, "
              "n_vertices int, n_dup_edges long, area2_q6 long, "
              "is_ccw int, n_self_x long, is_simple int")
    return rings.mapInPandas(_validate, schema=schema)
