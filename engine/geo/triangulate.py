"""Polygon triangulation by deterministic ear clipping, exact integer
domain (r4 cont.) — the decomposition step under area-weighted point
sampling, polygon rasterd rendering, and mesh export.

Every input ring is FLOOR-quantized to the q6 grid (the
geo_area_centroid surface), so the triangulation is a pure function of
the vertex list: all orientation/containment predicates are exact int64
cross products (coords ≤ 3.6e8 ⇒ products ≤ 1.3e17, in-range), the ear
scan order is the fixed lowest-position-first rule, and the output is
bit-identical under any partitioning, retry, or host.

Correctness surface (three independent layers):
* engine asserts: one triangle per clipped vertex (so n_tris = n−2 is
  structural), every triangle's signed area ≥ 0 with 0 permitted ONLY
  for the documented collinear-vertex fallback, loud RuntimeError when
  no ear exists (non-simple input) instead of silent garbage;
* driver twin: per-ring (n_tris, Σ|tri area2|) recomputed from the raw
  vertex list by independent SQL (consecutive-dup count + shoelace) —
  for positive triangles inside a simple polygon, Σ areas = ring area
  iff the cover is measure-exact, so overlaps/gaps red the key;
* pytest: the directed-edge-cancellation theorem (the C3i contour
  machinery's identity) — a set of n−2 CCW triangles is a triangulation
  of the ring IFF internal directed edges cancel pairwise and the
  residue is exactly the boundary cycle.

Scale shape: polygon layers are O(polygons) metadata (SURVEY A5) —
rings ride one Arrow batch per partition through a pandas UDF
(ear clipping is inherently sequential per ring; cross-ring parallelism
is the distribution axis), triangles explode natively afterwards.  A
10^12-row point table is never touched; at 10^6 rings the cost is one
zero-shuffle map stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StructField,
                               StructType)

TRI_FIELDS = ["ax", "ay", "bx", "by", "cx", "cy", "area2"]
_TRI_STRUCT = ArrayType(StructType(
    [StructField(f, LongType()) for f in TRI_FIELDS]))


def _dedup_open_ring(xs, ys):
    """Drop consecutive duplicates, then trailing vertices equal to the
    first (closed-ring input tolerated); returns open-ring int lists."""
    pts = []
    for x, y in zip(xs, ys):
        if not pts or pts[-1] != (int(x), int(y)):
            pts.append((int(x), int(y)))
    while len(pts) > 1 and pts[-1] == pts[0]:
        pts.pop()
    return pts


def _shoelace2(pts) -> int:
    n = len(pts)
    return sum(pts[i][0] * pts[(i + 1) % n][1]
               - pts[(i + 1) % n][0] * pts[i][1] for i in range(n))


def _cross(o, a, b) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (b[0] - o[0]) * (a[1] - o[1])


def earclip_py(pts) -> list:
    """Sequential ear clipping of an open CCW simple ring (int coords,
    no consecutive duplicates) -> list of (a, b, c) coordinate triples,
    each CCW with signed area2 ≥ 0 (0 only for collinear fallbacks).
    Raises RuntimeError when no ear exists (non-simple input)."""
    if len(pts) < 3:
        raise RuntimeError(f"earclip: ring with {len(pts)} vertices")
    if _shoelace2(pts) < 0:
        pts = pts[::-1]
    idx = list(range(len(pts)))
    tris = []
    while len(idx) > 3:
        m = len(idx)
        xs = np.array([pts[i][0] for i in idx], dtype=np.int64)
        ys = np.array([pts[i][1] for i in idx], dtype=np.int64)
        clipped = False
        for pos in range(m):
            i, j, k = idx[pos - 1], idx[pos], idx[(pos + 1) % m]
            a, b, c = pts[i], pts[j], pts[k]
            if _cross(a, b, c) <= 0:
                continue
            # ear test: no OTHER remaining vertex inside-or-on the
            # candidate triangle (inclusive barycentric, exact int64)
            s1 = (b[0] - a[0]) * (ys - a[1]) - (b[1] - a[1]) * (xs - a[0])
            s2 = (c[0] - b[0]) * (ys - b[1]) - (c[1] - b[1]) * (xs - b[0])
            s3 = (a[0] - c[0]) * (ys - c[1]) - (a[1] - c[1]) * (xs - c[0])
            inside = (s1 >= 0) & (s2 >= 0) & (s3 >= 0)
            inside[pos] = inside[pos - 1] = inside[(pos + 1) % m] = False
            if bool(inside.any()):
                continue
            tris.append((a, b, c))
            del idx[pos]
            clipped = True
            break
        if clipped:
            continue
        # collinear fallback: clip a zero-area vertex lying ON the
        # segment between its neighbours (safe: the boundary is
        # unchanged); emits a zero-area triangle so the one-triangle-
        # per-clip identity (n_tris = n-2) stays structural.
        for pos in range(m):
            i, j, k = idx[pos - 1], idx[pos], idx[(pos + 1) % m]
            a, b, c = pts[i], pts[j], pts[k]
            if _cross(a, b, c) != 0:
                continue
            if ((b[0] - a[0]) * (c[0] - b[0])
                    + (b[1] - a[1]) * (c[1] - b[1])) >= 0:
                tris.append((a, b, c))
                del idx[pos]
                clipped = True
                break
        if not clipped:
            raise RuntimeError(
                "earclip: no ear found — input ring is not simple")
    a, b, c = (pts[idx[0]], pts[idx[1]], pts[idx[2]])
    if _cross(a, b, c) < 0:
        raise RuntimeError("earclip: final triangle flipped — not simple")
    tris.append((a, b, c))
    return tris


def triangulate_rings(rings: DataFrame, q_scale: int = 1_000_000,
                      lon: str = "verts") -> DataFrame:
    """Ear-clip every ring row -> one row per triangle
    (poly_id, ring_id, tri_idx, ax, ay, bx, by, cx, cy, area2), coords
    on the FLOOR-q_scale integer grid, triangles CCW, tri_idx the clip
    order (deterministic).  Input = the rings_df surface
    (poly_id, ring_id, kind, verts:array<struct<lon,lat>>); callers
    filter to kind='outer' (holes need a hole-bridging step this
    operator deliberately does not fake)."""
    q = float(q_scale)
    quant = (f"transform({lon}, v -> struct("
             f"CAST(floor(v.lon * {q!r}) AS BIGINT) AS x, "
             f"CAST(floor(v.lat * {q!r}) AS BIGINT) AS y))")
    base = rings.selectExpr(
        "poly_id", "ring_id",
        f"transform({quant}, p -> p.x) AS xs",
        f"transform({quant}, p -> p.y) AS ys")

    @F.pandas_udf(_TRI_STRUCT)
    def tri_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = []
        for x_arr, y_arr in zip(xs, ys):
            pts = _dedup_open_ring(x_arr, y_arr)
            tris = earclip_py(pts)
            row = []
            for a, b, c in tris:
                area2 = _cross(a, b, c)
                assert area2 >= 0, "earclip emitted a flipped triangle"
                row.append({"ax": a[0], "ay": a[1], "bx": b[0],
                            "by": b[1], "cx": c[0], "cy": c[1],
                            "area2": int(area2)})
            out.append(row)
        return pd.Series(out)

    tri = base.select("poly_id", "ring_id",
                      F.posexplode(tri_udf("xs", "ys"))
                      .alias("tri_idx", "t"))
    return tri.select(
        "poly_id", "ring_id", F.col("tri_idx").cast("int").alias("tri_idx"),
        *[F.col(f"t.{f}").alias(f) for f in TRI_FIELDS])


def sample_polygons(rings: DataFrame, k: int = 8,
                    q_scale: int = 1_000_000, bary_q: int = 1024,
                    seed: int = 1) -> DataFrame:
    """Deterministic area-weighted point sampling inside polygons
    (r4 cont.) — the training-data use of the triangulation: k points
    per outer ring, distributed proportionally to triangle area by the
    STRATIFIED midpoint rule, positions exact rationals.

    Sample j of a ring targets t_j = ((2j+1)·total_area2) DIV (2k) and
    lands in the triangle whose prefix-area interval contains t_j —
    so each triangle receives |count − k·A_i/total| < 1 samples (the
    midpoint-stratification theorem, pytest-checked).  Inside the
    triangle, barycentric weights come from xxhash64(ring, j, seed)
    folded into the u+v ≤ Q simplex; the emitted point is the EXACT
    rational (px_num/Q, py_num/Q) as integer numerators — no floor, so
    "sample lies inside its triangle, hence inside the polygon" is a
    theorem checkable with exact scaled-integer PIP, not an
    approximation.  Pure function of (rings, k, seed): bit-identical
    under any partitioning.

    Plan: triangulate (one Arrow batch per partition), one window for
    prefix areas, one explode for sample slots, one WITHIN-RING range
    join (rings are metadata-small; the join key is ring_id so the
    non-equi residual never crosses rings), native hash barycentrics —
    zero Python after triangulation.  At 10^6 rings everything stays
    skinny; the big point table is never touched."""
    tri = triangulate_rings(rings, q_scale=q_scale)
    from pyspark.sql import Window
    wring = Window.partitionBy("ring_id").orderBy("tri_idx")
    pref = (tri.withColumn(
        "cum", F.sum("area2").over(
            wring.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("prev", F.col("cum") - F.col("area2")))
    tot = tri.groupBy("poly_id", "ring_id").agg(
        F.sum("area2").alias("total"))
    slots = (tot.filter(F.col("total") > 0)
             .select("poly_id", "ring_id", "total",
                     F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
                     .alias("j"))
             .withColumn("t", F.expr(
                 f"(2 * j + 1) * total DIV {2 * k}").cast("long")))
    hit = slots.join(pref.drop("poly_id"), "ring_id") \
        .filter((F.col("prev") <= F.col("t")) & (F.col("t") < F.col("cum")))
    q = F.lit(bary_q)
    h1 = F.pmod(F.xxhash64("ring_id", "j", F.lit(seed)), q + 1)
    h2 = F.pmod(F.xxhash64("ring_id", "j", F.lit(seed + 1)), q + 1)
    hit = hit.withColumn("u0", h1).withColumn("v0", h2)
    fold = F.col("u0") + F.col("v0") > q
    u = F.when(fold, q - F.col("u0")).otherwise(F.col("u0"))
    v = F.when(fold, q - F.col("v0")).otherwise(F.col("v0"))
    hit = hit.withColumn("u", u).withColumn("v", v)
    wmid = q - F.col("u") - F.col("v")
    return hit.select(
        "poly_id", "ring_id", F.col("j").cast("int").alias("j"),
        "tri_idx",
        (F.col("ax") * wmid + F.col("bx") * F.col("u")
         + F.col("cx") * F.col("v")).alias("px_num"),
        (F.col("ay") * wmid + F.col("by") * F.col("u")
         + F.col("cy") * F.col("v")).alias("py_num"),
        q.cast("long").alias("q"))


def point_on_surface(rings: DataFrame,
                     q_scale: int = 1_000_000) -> DataFrame:
    """Guaranteed-interior representative point per outer ring (B11,
    r5 post-window) — the ST_PointOnSurface contract the centroid
    cannot give (a concave or holed polygon's centroid may fall
    outside): the centroid of the LARGEST ear-clip triangle (ties to
    the lowest tri_idx), carried as the EXACT rational
    (pos_x3, pos_y3, /3) on the floor-q6 grid — never divided, and
    strictly interior whenever the ring has positive area (the
    centroid of a positive-area triangle of the decomposition lies in
    the triangle's open interior, which the ear cover keeps inside
    the ring; the exact-Fraction PIP pytest proves it per fixture
    ring).  -> (poly_id, ring_id, tri_idx, area2, pos_x3, pos_y3).

    Scale shape: triangulate_rings' one Arrow batch per partition +
    ONE map-side-combined min(struct) argmax per ring — the pick
    never sorts triangles."""
    tri = triangulate_rings(rings, q_scale=q_scale)
    return (tri.groupBy("poly_id", "ring_id")
            .agg(F.min(F.struct((-F.col("area2")).alias("neg"),
                                F.col("tri_idx").alias("ti"),
                                (F.col("ax") + F.col("bx")
                                 + F.col("cx")).alias("x3"),
                                (F.col("ay") + F.col("by")
                                 + F.col("cy")).alias("y3"))).alias("t"))
            .select("poly_id", "ring_id",
                    F.col("t.ti").cast("int").alias("tri_idx"),
                    (-F.col("t.neg")).cast("long").alias("area2"),
                    F.col("t.x3").cast("long").alias("pos_x3"),
                    F.col("t.y3").cast("long").alias("pos_y3")))
