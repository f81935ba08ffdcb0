"""Vector measures: signed shoelace area + centroid numerators per ring,
in exact integer domain (SURVEY.md §2.B companion; BASELINE.json:6
"joined to polygon layers" — the vector side of raster<->vector tiling
needs per-polygon area/centroid for tile-budgeting and label placement).

Exactness contract (the r3 float-tie rule): coordinates are quantized
with FLOOR(coord * 10^q) — one correctly-rounded IEEE-754 double
multiply then floor.  Both engines (JVM Spark, C++ DuckDB) perform the
identical exact operation and floor has no round-half tie class, so the
quantized integers are bit-identical everywhere.  All shoelace
arithmetic then runs in int64:

  area2_q6   = sum_i (x_i * y_{i+1} - x_{i+1} * y_i)          at q=6
  c{x,y}_num = sum_i ({x,y}_i + {x,y}_{i+1}) * cross_i        at q=3

Overflow bounds: |lon| <= 360 so |x6| <= 3.6e8, each q6 cross term
<= 2 * 3.6e8 * 1.8e8 = 1.3e17 and a ring of <= 60 vertices stays well
below 2^63; centroid terms use q3 (|x3| <= 3.6e5, term <= 9.4e13, so
<= ~4000 vertices are safe).  Signed output (no orientation
normalization) keeps the op a pure fold; consumers combine
outer - holes and divide cx_num / (3 * area2_q3) downstream.

Scale shape: one native projection over the ring table — transform /
zip_with / aggregate HOFs, zero Python, zero shuffle, embarrassingly
parallel over 10^12 rings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RING_SCHEMA = ("poly_id string, ring_id string, kind string, "
               "verts array<struct<lon: double, lat: double>>")


def rings_df(layer, spark: SparkSession) -> DataFrame:
    """All rings of a PolygonLayer (antimeridian-split parts; outer ring
    plus each hole as its own row).  The layer is O(polygons) metadata —
    at 10^12-image scale the polygon side stays small/broadcastable, so
    a driver-side build mirrors `PolygonLayer.to_df`."""
    rows = []
    for p in layer.polygons:
        for part_idx, (outer, holes) in enumerate(p.split_antimeridian()):
            rid = f"{p.poly_id}:{part_idx}"
            rows.append((p.poly_id, f"{rid}:outer", "outer",
                         [(float(x), float(y)) for x, y in outer]))
            for h_idx, h in enumerate(holes):
                rows.append((p.poly_id, f"{rid}:hole{h_idx}", "hole",
                             [(float(x), float(y)) for x, y in h]))
    return spark.createDataFrame(rows, schema=RING_SCHEMA)


def _quant(q_scale: str) -> str:
    return (f"transform(verts, v -> struct("
            f"CAST(floor(v.lon * {q_scale}) AS BIGINT) AS x, "
            f"CAST(floor(v.lat * {q_scale}) AS BIGINT) AS y))")


def _rot(pts: str) -> str:
    return f"concat(slice({pts}, 2, size({pts}) - 1), slice({pts}, 1, 1))"


def _cross_fold(pts: str, weight: str | None = None) -> str:
    """aggregate(zip_with(pts, rot(pts), cross)) — optionally weighted by
    (a.x + b.x) / (a.y + b.y) for the centroid numerators."""
    cross = "(a.x * b.y - b.x * a.y)"
    term = cross if weight is None else f"({weight}) * {cross}"
    return (f"aggregate(zip_with({pts}, {_rot(pts)}, "
            f"(a, b) -> {term}), 0L, (acc, t) -> acc + t)")


def area_centroid(rings: DataFrame) -> DataFrame:
    """Per-ring signed 2*area (q6) and centroid numerators / denominator
    (q3), all exact int64 — see module docstring for the math."""
    p6, p3 = _quant("1000000.0"), _quant("1000.0")
    return rings.select(
        "poly_id", "ring_id", "kind",
        F.expr("size(verts)").alias("n_vertices"),
        F.expr(_cross_fold(p6)).alias("area2_q6"),
        F.expr(_cross_fold(p3, "a.x + b.x")).alias("cx_num_q3"),
        F.expr(_cross_fold(p3, "a.y + b.y")).alias("cy_num_q3"),
        F.expr(_cross_fold(p3)).alias("area2_q3"),
    )
