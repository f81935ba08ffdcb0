"""Per-group convex hull in the exact level-30 integer grid domain
(late r4) — the footprint/coverage-geometry primitive: each group's
point cloud reduced to its strict convex hull (no collinear vertices),
vertices emitted in canonical order (lexicographic-min first, CCW in
the (x, y) integer plane).  All arithmetic is int64 cross products
(|coords| < 2^30 so cross < 2^62 — never overflows, never float), so
the output is bit-identical across hosts/partitionings.

Scale shape (the part that matters at 100 TB):
1. One map-side-combined agg computes each group's 8 directional
   argmax points (the Akl-Toussaint octagon) — native max(struct)
   codegen, one skinny row per group.
2. The octagon is broadcast back and every point STRICTLY inside it is
   pruned natively (forall-HOF over the octagon edges, whole-stage
   codegen).  For dense groups this discards the overwhelming interior
   before any Python runs — survivors are O(hull-neighborhood), not
   O(group).
3. One applyInPandas over survivors runs Andrew's monotone chain per
   group (numpy-sorted, O(s log s) on s survivors).

The DuckDB twin is an INDEPENDENT formulation (no shared code shape):
hull edges by the O(n^2) all-points-left characterization + a
recursive-CTE successor walk — see __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# CCW direction order; their argmax points form a convex CCW polygon.
_DIRS = ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1),
         (1, -1))


def _cross(o, a, b) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def chain_hull_py(pts: Sequence[tuple[int, int]]) -> list[tuple[int, int]]:
    """Strict hull of distinct int points, lexicographic-min first, CCW.
    Pure-Python reference + the grouped-map kernel (groups are already
    pruned to hull neighborhoods, so plain lists beat numpy here)."""
    pts = sorted(set(map(tuple, pts)))
    if len(pts) <= 2:
        return pts

    def half(seq):
        h: list = []
        for p in seq:
            while len(h) >= 2 and _cross(h[-2], h[-1], p) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]


def diameter_py(pts: Sequence[tuple[int, int]]
                ) -> tuple[int, tuple[int, int], tuple[int, int]]:
    """Exact farthest pair: (d2, a, b) with d2 the max squared L2
    distance and (a, b) the lexicographically smallest achieving pair
    under a <= b.  diameter(set) == diameter(hull vertices), so brute
    force runs over the (small) hull only — O(h^2); rotating calipers
    would be O(h) but h is tiny post-hull and exactness wins."""
    hull = chain_hull_py(pts)
    best = None
    for i in range(len(hull)):
        for j in range(i, len(hull)):
            a, b = sorted((hull[i], hull[j]))
            d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            cand = (-d2, a, b)
            if best is None or cand < best:
                best = cand
    return -best[0], best[1], best[2]


def _octagon_survivors(pts: DataFrame, g: list, x: str, y: str) -> DataFrame:
    """Stages 1+2 of the module docstring: distinct points -> per-group
    Akl-Toussaint octagon (one map-side-combined max(struct) agg per
    direction) -> broadcast-back native filter keeping only points NOT
    strictly inside the octagon.  Survivors of every group are a
    superset of its hull vertices (an interior point of the octagon is
    interior to the hull), so any hull-derived statistic is preserved."""
    d = pts.select(*g, F.col(x).cast("long").alias("_x"),
                   F.col(y).cast("long").alias("_y")).distinct()

    aggs = [F.max(F.struct((dx * F.col("_x") + dy * F.col("_y"))
                           .alias("dot"), F.col("_x").alias("x"),
                           F.col("_y").alias("y"))).alias(f"_e{i}")
            for i, (dx, dy) in enumerate(_DIRS)]
    arr = ("array(" + ", ".join(
        f"struct(_e{i}.x AS x, _e{i}.y AS y)" for i in range(len(_DIRS)))
        + ")")
    # order-preserving dedupe; zero-length octagon edges would disable
    # the strictly-inside test below, so duplicates must go.
    oct_expr = (f"aggregate({arr}, "
                "CAST(array() AS ARRAY<STRUCT<x: BIGINT, y: BIGINT>>), "
                "(acc, p) -> IF(array_contains(acc, p), acc, "
                "concat(acc, array(p))))")
    octs = d.groupBy(*g).agg(*aggs).select(*g, F.expr(oct_expr).alias("_oct"))

    # survivor iff NOT strictly inside the (CCW) octagon: some edge has
    # cross(e_i, e_{i+1}, p) <= 0.  Degenerate octagons (< 3 distinct
    # extremes) prune nothing.
    edge_cross = ("(_oct[CAST((i + 1) % size(_oct) AS INT)].x - _oct[i].x) "
                  "* (_y - _oct[i].y) - "
                  "(_oct[CAST((i + 1) % size(_oct) AS INT)].y - _oct[i].y) "
                  "* (_x - _oct[i].x)")
    keep = (f"size(_oct) < 3 OR exists(sequence(0, size(_oct) - 1), "
            f"i -> {edge_cross} <= 0)")
    return (d.join(F.broadcast(octs), g)
            .where(F.expr(keep)).drop("_oct"))


def hull_per_group(pts: DataFrame, group_cols: Sequence[str],
                   x: str = "xi", y: str = "yi") -> DataFrame:
    """(group_cols..., x, y ints) -> (group_cols..., hull_idx, hx, hy,
    hull_size).  See module docstring for the three-stage shape."""
    g = list(group_cols)
    surv = _octagon_survivors(pts, g, x, y)

    out_schema = ", ".join(
        [f"{c} {t}" for c, t in
         zip(g, (surv.schema[c].dataType.simpleString() for c in g))]
        + ["hull_idx int", "hx long", "hy long", "hull_size int"])

    def _hull(key, pdf):
        hull = chain_hull_py(list(zip(pdf["_x"], pdf["_y"])))
        n = len(hull)
        return pd.DataFrame(
            {**{c: [k] * n for c, k in zip(g, key)},
             "hull_idx": range(n),
             "hx": [p[0] for p in hull],
             "hy": [p[1] for p in hull],
             "hull_size": [n] * n})

    return surv.groupBy(*g).applyInPandas(_hull, schema=out_schema)


def min_rect_py(pts: Sequence[tuple[int, int]]) -> tuple[int, int, float]:
    """Pure-Python reference for min_rect_per_group: (n_hull,
    bbox_area, mrr_area).  Rotating-calipers theorem: the min-area
    bounding rectangle has a side collinear with some hull edge, so
    enumerate hull edges, take exact-int projection spreads, and pick
    the min W*H/L ratio IN DOUBLE with the same operation order the
    engine uses (convert, multiply, divide, min)."""
    hull = chain_hull_py(pts)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    bbox = (max(xs) - min(xs)) * (max(ys) - min(ys))
    n = len(hull)
    if n < 2:
        return n, bbox, 0.0
    best = None
    for i in range(n):
        ux, uy = hull[i]
        vx, vy = hull[(i + 1) % n]
        dx, dy = vx - ux, vy - uy
        ss = [dx * (px - ux) + dy * (py - uy) for px, py in hull]
        ts = [dx * (py - uy) - dy * (px - ux) for px, py in hull]
        area = (float(max(ss) - min(ss)) * float(max(ts) - min(ts))
                / float(dx * dx + dy * dy))
        if best is None or area < best:
            best = area
    return n, bbox, best


def min_rect_per_group(pts: DataFrame, group_cols: Sequence[str],
                       x: str = "xi", y: str = "yi") -> DataFrame:
    """Per-group minimum-area ORIENTED bounding rectangle (r5) via the
    rotating-calipers edge theorem, plus the axis-aligned bbox area:
    (group_cols..., n_hull int, bbox_area long, mrr_area double).

    Exactness contract: every projection is int64 (|coords| < 2^30 =>
    |spread| < 2^62, |edge length^2| < 2^61 — no overflow); the ONLY
    float step is the final W*H/L per edge and the min across edges,
    both IEEE-determined from identical integers, so the double is
    bit-identical across hosts and engines (no rounding grain needed —
    the DuckDB twin performs the same convert/multiply/divide/min from
    an independently derived hull edge set).

    Plan: hull_per_group (octagon prune -> grouped-map chain) -> ONE
    map-side-combined sorted collect per group -> a single native HOF
    expression enumerating the O(h) cyclic edges x O(h) vertices —
    h is hull size (tiny), all in whole-stage codegen, zero extra
    Python.  bbox_area rides the same aggregate.  Degenerate groups:
    1 point -> 0.0; collinear (hull size 2) -> both cyclic edges give
    zero perpendicular spread -> 0.0."""
    g = list(group_cols)
    h = hull_per_group(pts, g, x=x, y=y)
    grouped = (h.groupBy(*g).agg(
        F.sort_array(F.collect_list(F.struct("hull_idx", "hx", "hy")))
        .alias("h"),
        F.max("hull_size").cast("int").alias("n_hull"),
        ((F.max("hx") - F.min("hx")) * (F.max("hy") - F.min("hy")))
        .alias("hull_bbox")))
    # NOTE hull bbox == point-set bbox (hull contains the extremes), so
    # bbox_area is computable from hull vertices alone.
    u = "h[CAST(i AS INT)]"
    v = "h[CAST((i + 1) % size(h) AS INT)]"
    dx, dy = f"({v}.hx - {u}.hx)", f"({v}.hy - {u}.hy)"
    s = f"transform(h, p -> {dx} * (p.hx - {u}.hx) + {dy} * (p.hy - {u}.hy))"
    t = f"transform(h, p -> {dx} * (p.hy - {u}.hy) - {dy} * (p.hx - {u}.hx))"
    area = (f"CAST(array_max({s}) - array_min({s}) AS DOUBLE) "
            f"* CAST(array_max({t}) - array_min({t}) AS DOUBLE) "
            f"/ CAST({dx} * {dx} + {dy} * {dy} AS DOUBLE)")
    mrr = ("CASE WHEN size(h) < 2 THEN CAST(0.0 AS DOUBLE) ELSE "
           f"array_min(transform(sequence(0, size(h) - 1), i -> {area})) "
           "END")
    return grouped.select(
        *g, "n_hull", F.col("hull_bbox").alias("bbox_area"),
        F.expr(mrr).alias("mrr_area"))


def hull_diameter(pts: DataFrame, group_cols: Sequence[str],
                  x: str = "xi", y: str = "yi") -> DataFrame:
    """Per-group farthest pair (set diameter) in the exact integer
    domain: (group_cols..., d2, ax, ay, bx, by) with d2 the max squared
    L2 distance and (ax,ay) <= (bx,by) the lexicographically smallest
    achieving pair (single-point groups emit the self-pair, d2 = 0).
    Same prune-then-grouped-map shape as hull_per_group; correctness
    rests on diameter(set) == diameter(hull) and the prune keeping all
    hull vertices.  |coords| < 2^30 keeps d2 < 2^63 — int64-exact."""
    g = list(group_cols)
    surv = _octagon_survivors(pts, g, x, y)

    out_schema = ", ".join(
        [f"{c} {t}" for c, t in
         zip(g, (surv.schema[c].dataType.simpleString() for c in g))]
        + ["d2 long", "ax long", "ay long", "bx long", "by long"])

    def _diam(key, pdf):
        d2, a, b = diameter_py(list(zip(pdf["_x"], pdf["_y"])))
        return pd.DataFrame(
            {**{c: [k] for c, k in zip(g, key)},
             "d2": [d2], "ax": [a[0]], "ay": [a[1]],
             "bx": [b[0]], "by": [b[1]]})

    return surv.groupBy(*g).applyInPandas(_diam, schema=out_schema)


# ------------------------------- minimum enclosing circle (B13, r5 cont.)

def min_circle_py(pts: Sequence[tuple[int, int]]) -> tuple:
    """Exact minimum enclosing circle of integer points by candidate
    enumeration over the HULL vertices: the MEC's support set is 2 or
    3 hull points, so the candidate set {diametral circle of each
    hull pair} ∪ {circumcircle of each non-collinear hull triple} is
    complete.  Every candidate is the unified exact-rational form
    (ux, uy, d, n): center = (ux/d, uy/d), r² = n/d² — pairs are
    (xa+xb, ya+yb, 2, |a−b|²), triples the circumcenter determinant
    with d = 2·cross.  VALIDITY (all hull points inside) is exact
    integer arithmetic: (px·d − ux)² + (py·d − uy)² <= n.  Selection
    among valid candidates is the float key (n/d², ux/d, uy/d) —
    the MEC is unique, so distinct circles float-tying in all three
    keys cannot arise from 16-bit inputs, and the float ops are the
    IDENTICAL IEEE steps the DuckDB twin runs on the same integers
    (the min_rect doctrine).  -> (n_pts, n_hull, r2, cx, cy)."""
    uniq = sorted(set(pts))
    hull = chain_hull_py(uniq)
    h = len(hull)
    if h == 1:
        (x, y), = hull
        return len(uniq), 1, 0.0, float(x), float(y)
    best = None
    cands = []
    for i in range(h):
        xa, ya = hull[i]
        for j in range(i + 1, h):
            xb, yb = hull[j]
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            cands.append((xa + xb, ya + yb, 2, d2))
            for k in range(j + 1, h):
                xc, yc = hull[k]
                cr = (xb - xa) * (yc - ya) - (yb - ya) * (xc - xa)
                if cr == 0:
                    continue
                d = 2 * cr
                a2 = xa * xa + ya * ya
                b2 = xb * xb + yb * yb
                c2 = xc * xc + yc * yc
                ux = a2 * (yb - yc) + b2 * (yc - ya) + c2 * (ya - yb)
                uy = a2 * (xc - xb) + b2 * (xa - xc) + c2 * (xb - xa)
                n = (xa * d - ux) ** 2 + (ya * d - uy) ** 2
                cands.append((ux, uy, d, n))
    for ux, uy, d, n in cands:
        if all((px * d - ux) ** 2 + (py * d - uy) ** 2 <= n
               for px, py in hull):
            key = (float(n) / (float(d) * float(d)),
                   float(ux) / float(d), float(uy) / float(d))
            if best is None or key < best:
                best = key
    r2, cx, cy = best
    return len(uniq), h, r2, cx, cy


def min_circle_per_group(pts: DataFrame, group_cols: Sequence[str],
                         x: str = "xi", y: str = "yi") -> DataFrame:
    """Per-group exact minimum enclosing circle — the smallest-disk
    coverage primitive (facility placement, antenna range).  Same
    three-stage shape as hull/min-rect: octagon prune -> per-group
    Arrow batch (hull + O(h³) candidate enumeration + O(h⁴) exact
    validity, h bounded by hull growth ~ log n) -> one row per group.
    Callers feed SMALL integer coordinates (the 16-bit group-local
    grid in the driver key) so the twin's HUGEINT arithmetic has
    headroom (n <= 2^105 < 2^127)."""
    g = list(group_cols)
    surv = _octagon_survivors(pts, g, x, y)
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in
         zip(g, (surv.schema[c].dataType.simpleString() for c in g))]
        + ["n_hull int", "r2 double", "cx double", "cy double"])

    def _mec(key, pdf):
        # note: the octagon prune drops interior points, so a raw-point
        # count here would undercount — hull-derived outputs only
        _, h, r2, cx, cy = min_circle_py(
            list(zip(pdf["_x"], pdf["_y"])))
        return pd.DataFrame(
            {**{c: [k] for c, k in zip(g, key)},
             "n_hull": [h], "r2": [r2], "cx": [cx], "cy": [cy]})

    return surv.groupBy(*g).applyInPandas(_mec, schema=out_schema)
