"""Segment-intersection join (late r4) — the line-geometry member of
the conflation family (poly_overlap = area x area, dwithin/knn = point
x point, zonal = point x area; this is line x line): all pairs of
integer-endpoint segments that intersect (touching endpoints and
collinear overlap INCLUDED).

Exactness: the classical orientation predicate (CLRS 33.1) on int64
cross products — coords < 2^30 so every cross < 2^61, overflow-free —
with the collinear cases resolved by on-segment bbox tests.  The
predicate is built ONCE as dialect-neutral SQL text (the geohash/hexbin
trick), so Spark's refine filter and the DuckDB brute-force twin run
the IDENTICAL expression: the join STRATEGY (tile blocking) is what the
all-pairs oracle verifies, and the predicate itself is verified in
pytest against an independent exact-rational (fractions.Fraction)
line-intersection solver.

Scale shape:
1. Each segment explodes to the z-level tiles its bbox covers (native
   sequence-explode; short segments -> O(1) tiles).  Two intersecting
   segments have overlapping bboxes, and overlapping bboxes share at
   least one tile cell -> the blocked candidate set is a PROVABLE
   SUPERSET of intersecting pairs.
2. One hash equi-join on the tile cell, id_a < id_b dedupe, DISTINCT
   (a pair sharing k tiles appears once).
3. Native bbox prefilter + the exact orientation predicate — all
   whole-stage codegen, zero Python anywhere.
A viral tile degrades to in-tile quadratic work like any blocked
spatial join — pick z so tile extent ~ segment length (the same
density guidance as the covering joins; salting composes if needed).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _orient(ax, ay, bx, by, cx, cy) -> str:
    """sign of cross(B-A, C-A) as SQL text — {-1, 0, 1} BIGINT."""
    return (f"CAST(sign(({bx} - {ax}) * ({cy} - {ay}) - "
            f"({by} - {ay}) * ({cx} - {ax})) AS BIGINT)")


def _onseg(px, py, qx, qy, rx, ry) -> str:
    """Given R collinear with PQ: is R within PQ's bbox? (SQL text)"""
    return (f"({rx} BETWEEN least({px}, {qx}) AND greatest({px}, {qx}) "
            f"AND {ry} BETWEEN least({py}, {qy}) AND greatest({py}, {qy}))")


def seg_intersect_sql(a: str = "a", b: str = "b") -> str:
    """The full inclusive intersection predicate over two relations
    aliased `a`/`b`, each exposing ax, ay, bx, by (segment endpoints).
    Dialect-neutral: runs unchanged on Spark SQL and DuckDB."""
    A = (f"{a}.ax", f"{a}.ay")
    B = (f"{a}.bx", f"{a}.by")
    C = (f"{b}.ax", f"{b}.ay")
    D = (f"{b}.bx", f"{b}.by")
    o1 = _orient(*A, *B, *C)
    o2 = _orient(*A, *B, *D)
    o3 = _orient(*C, *D, *A)
    o4 = _orient(*C, *D, *B)
    return (f"(({o1}) * ({o2}) < 0 AND ({o3}) * ({o4}) < 0) "
            f"OR (({o1}) = 0 AND {_onseg(*A, *B, *C)}) "
            f"OR (({o2}) = 0 AND {_onseg(*A, *B, *D)}) "
            f"OR (({o3}) = 0 AND {_onseg(*C, *D, *A)}) "
            f"OR (({o4}) = 0 AND {_onseg(*C, *D, *B)})")


def seg_intersect_py(a, b, c, d) -> bool:
    """Independent reference: solve the two segments' parametric linear
    system in EXACT rationals.  Segments P(t) = a + t(b-a), Q(u) =
    c + u(d-c) intersect iff the system has a solution with t, u in
    [0, 1] — degenerate (parallel/collinear/point) cases by exhaustive
    rational checks.  Shares no code shape with the orientation form."""
    (ax, ay), (bx, by), (cx, cy), (dx, dy) = a, b, c, d
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    den = rx * sy - ry * sx
    qpx, qpy = cx - ax, cy - ay

    def on_point_seg(p, q, r):
        """r on segment pq (all collinear checks in exact ints)."""
        if (q[0] - p[0]) * (r[1] - p[1]) != (q[1] - p[1]) * (r[0] - p[0]):
            return False
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

    if den == 0:
        # parallel: intersect iff collinear AND 1-D overlap
        if qpx * ry != qpy * rx:
            return False
        # collinear (or degenerate point segments): endpoint membership
        return (on_point_seg(a, b, c) or on_point_seg(a, b, d)
                or on_point_seg(c, d, a) or on_point_seg(c, d, b))
    t = Fraction(qpx * sy - qpy * sx, den)
    u = Fraction(qpx * ry - qpy * rx, den)
    return 0 <= t <= 1 and 0 <= u <= 1


def segment_join(segs: DataFrame, z: int = 6, level: int = 30,
                 id_col: str = "seg_id") -> DataFrame:
    """segs (id_col, ax, ay, bx, by ints in [0, 2^level)) ->
    (a_id, b_id) intersecting pairs, a_id < b_id.  See module
    docstring for the blocked shape."""
    sh = level - z
    cov = segs.select(
        F.col(id_col).alias("_id"), "ax", "ay", "bx", "by",
        F.explode(F.sequence(
            F.expr(f"least(ax, bx) >> {sh}"),
            F.expr(f"greatest(ax, bx) >> {sh}"))).alias("tx"),
    ).select(
        "_id", "ax", "ay", "bx", "by", "tx",
        F.explode(F.sequence(
            F.expr(f"least(ay, by) >> {sh}"),
            F.expr(f"greatest(ay, by) >> {sh}"))).alias("ty"),
    )
    a = cov.select(F.col("_id").alias("a_id"),
                   *[F.col(c).alias(f"a_{c}") for c in
                     ("ax", "ay", "bx", "by")], "tx", "ty")
    b = cov.select(F.col("_id").alias("b_id"),
                   *[F.col(c).alias(f"b_{c}") for c in
                     ("ax", "ay", "bx", "by")], "tx", "ty")
    pred = seg_intersect_sql("s1", "s2")
    pairs = (
        a.alias("sa").join(b.alias("sb"),
                           (F.col("sa.tx") == F.col("sb.tx"))
                           & (F.col("sa.ty") == F.col("sb.ty"))
                           & (F.col("a_id") < F.col("b_id")))
        # bbox prefilter: cheap reject before the 4-orientation predicate
        .where(F.expr(
            "least(a_ax, a_bx) <= greatest(b_ax, b_bx) AND "
            "least(b_ax, b_bx) <= greatest(a_ax, a_bx) AND "
            "least(a_ay, a_by) <= greatest(b_ay, b_by) AND "
            "least(b_ay, b_by) <= greatest(a_ay, a_by)"))
        .select("a_id", "b_id", "a_ax", "a_ay", "a_bx", "a_by",
                "b_ax", "b_ay", "b_bx", "b_by")
        .distinct()
    )
    # rebind via structs so the shared predicate text's `s1.ax`-style
    # references resolve identically here and in the DuckDB twin
    refined = (
        pairs.selectExpr(
            "a_id", "b_id",
            "named_struct('ax', a_ax, 'ay', a_ay, 'bx', a_bx, 'by', a_by) AS s1",
            "named_struct('ax', b_ax, 'ay', b_ay, 'bx', b_bx, 'by', b_by) AS s2")
        .where(F.expr(pred))
        .select("a_id", "b_id")
    )
    return refined


def rasterize_segments(segs: DataFrame, level: int = 30, z: int = 10,
                       id_col: str = "seg_id") -> DataFrame:
    """Integer line rasterization (late r4): each segment becomes the
    z-grid pixels of its DDA walk — (id, step, px, py), step 0..extent
    along the MAJOR axis, minor coordinate = closed-form half-up
    rounded slope (no Bresenham error accumulator, so the walk is a
    native sequence-explode, not an iterative state machine).

    Pixel-set properties (tests/test_segments.py): endpoints exact,
    consecutive pixels 8-adjacent (connectivity), major coordinate
    strictly monotone, row count = major extent + 1, direction
    invariant (A->B == B->A after the internal normalization).

    Scale shape: one narrow projection + one explode — output rows =
    Σ per-segment major extents (bounded by segment length / 2^(level-z)
    pixels), zero Python, no shuffle at all."""
    sh = level - z
    # normalize: P = major-ascending endpoint pair in GRID coords
    d = segs.selectExpr(
        f"{id_col} AS _id",
        f"ax >> {sh} AS gax", f"ay >> {sh} AS gay",
        f"bx >> {sh} AS gbx", f"by >> {sh} AS gby",
    ).selectExpr(
        "_id",
        "abs(gbx - gax) >= abs(gby - gay) AS xmajor",
        # endpoints ordered by the major axis, ascending
        "IF(abs(gbx - gax) >= abs(gby - gay), "
        "  IF(gax <= gbx, gax, gbx), IF(gay <= gby, gay, gby)) AS m0",
        "IF(abs(gbx - gax) >= abs(gby - gay), "
        "  IF(gax <= gbx, gay, gby), IF(gay <= gby, gax, gbx)) AS n0",
        "IF(abs(gbx - gax) >= abs(gby - gay), "
        "  IF(gax <= gbx, gbx, gax), IF(gay <= gby, gby, gay)) AS m1",
        "IF(abs(gbx - gax) >= abs(gby - gay), "
        "  IF(gax <= gbx, gby, gay), IF(gay <= gby, gbx, gax)) AS n1",
    ).selectExpr(
        "_id", "xmajor", "m0", "n0",
        "m1 - m0 AS dm",                       # >= 0 by normalization
        "abs(n1 - n0) AS dn",                  # 0 <= dn <= dm
        "CAST(sign(n1 - n0) AS BIGINT) AS sn",
    )
    walk = d.selectExpr(
        "_id", "xmajor", "m0", "n0", "dm", "dn", "sn",
        "explode(sequence(0L, dm)) AS step",
    ).selectExpr(
        "_id AS " + id_col, "step",
        # half-up rounding of step*dn/dm, all operands non-negative;
        # dm = 0 (single-pixel segment) -> minor offset 0
        "IF(dm = 0, n0, n0 + sn * ((2 * step * dn + dm) DIV (2 * dm))) "
        "AS _minor",
        "m0 + step AS _major", "xmajor",
    ).selectExpr(
        id_col, "step",
        "IF(xmajor, _major, _minor) AS px",
        "IF(xmajor, _minor, _major) AS py",
    )
    return walk
