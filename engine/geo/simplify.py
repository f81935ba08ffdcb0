"""Douglas-Peucker ring simplification in EXACT integer domain — the
vector-side companion to area/centroid (engine/geo/measure.py): OSM-class
engines ship geometry simplification for tile rendering budgets (fewer
vertices at lower zooms).

Exactness contract (the r3 float-tie rule): coordinates quantize with
FLOOR(coord * 10^6) into int64 once; every DP comparison is then the
exact integer predicate

    cross(a, b, p)^2  >  tol_q6^2 * |ab|^2

evaluated in arbitrary-precision Python ints (cross can reach ~5e17, so
its square exceeds int64 — Python ints make the comparison exact instead
of ULP-fragile).  Farthest-vertex ties break to the LOWEST index.  The
result is therefore bit-identical on any host, which is what lets the
driver key pin a golden oracle.

Ring semantics: rings arrive open (closing vertex dropped).  Anchors are
vertex 0 and the vertex farthest from vertex 0 (exact squared distance,
ties lowest index); DP runs on the two arcs between the anchors with the
ring closed back to vertex 0.  Rings with <= 3 vertices pass through.

Scale shape: geometry-local — one Arrow-batched projection, zero
shuffle, embarrassingly parallel over 10^12 rings.  Rings are small
(10s-1000s of vertices), so the per-ring Python-int DP inside the Arrow
batch is bounded work per row, not a hot loop over the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StructField, StructType,
)

Q = 1_000_000


def _dp_keep(xs: list[int], ys: list[int], tol_q6: int) -> list[int]:
    """Kept vertex indices (sorted) of one open ring, exact-int DP."""
    n = len(xs)
    if n <= 3:
        return list(range(n))
    # closed-ring coordinate access: index n aliases vertex 0
    gx = lambda i: xs[0] if i == n else xs[i]
    gy = lambda i: ys[0] if i == n else ys[i]
    # second anchor: farthest from vertex 0 (exact, ties lowest index)
    far, far_d2 = 1, None
    for k in range(1, n):
        d2 = (xs[k] - xs[0]) ** 2 + (ys[k] - ys[0]) ** 2
        if far_d2 is None or d2 > far_d2:
            far, far_d2 = k, d2
    keep = {0, far}
    tol2 = tol_q6 * tol_q6
    stack = [(0, far), (far, n)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay, bx, by = gx(i), gy(i), gx(j), gy(j)
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        best, best_m = -1, -1
        if len2 == 0:
            # degenerate arc (coincident anchors): farthest plain
            # distance, threshold tol^2
            thr = tol2
            for k in range(i + 1, j):
                m = (gx(k) - ax) ** 2 + (gy(k) - ay) ** 2
                if m > best_m:
                    best, best_m = k, m
        else:
            # perpendicular distance: cross^2 / len2 > tol2
            thr = tol2 * len2
            for k in range(i + 1, j):
                c = dx * (gy(k) - ay) - dy * (gx(k) - ax)
                m = c * c
                if m > best_m:
                    best, best_m = k, m
        if best >= 0 and best_m > thr:
            keep.add(best)
            stack.append((i, best))
            stack.append((best, j))
    return sorted(keep)


def simplify_summary_udf(tol_deg: float):
    """(xs_q6, ys_q6) -> struct(n_out, keep_idx, sx_q6, sy_q6): kept
    count, kept indices, and exact int64 sums of kept quantized coords
    (the golden-checkable fingerprint of the simplified geometry)."""
    tol_q6 = int(round(tol_deg * Q))
    schema = StructType([
        StructField("n_out", IntegerType()),
        StructField("keep_idx", ArrayType(IntegerType())),
        StructField("sx_q6", LongType()),
        StructField("sy_q6", LongType()),
    ])

    @F.pandas_udf(schema)
    def _simp(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        rows = []
        for x_arr, y_arr in zip(xs, ys):
            x = [int(v) for v in x_arr]
            y = [int(v) for v in y_arr]
            keep = _dp_keep(x, y, tol_q6)
            rows.append((len(keep), keep,
                         sum(x[i] for i in keep), sum(y[i] for i in keep)))
        return pd.DataFrame(rows, columns=["n_out", "keep_idx",
                                           "sx_q6", "sy_q6"])

    return _simp


def _dp_keep_open(xs: list[int], ys: list[int], tol_q6: int) -> list[int]:
    """Kept vertex indices (sorted) of one OPEN polyline, exact-int DP
    (C-ts, r5): anchors are the two endpoints — no ring closure, no
    farthest-from-0 second anchor — otherwise the identical exact
    integer predicate as _dp_keep (cross^2 > tol^2 * len^2 in
    arbitrary-precision ints, farthest ties to the LOWEST index)."""
    n = len(xs)
    if n <= 2:
        return list(range(n))
    keep = {0, n - 1}
    tol2 = tol_q6 * tol_q6
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        best, best_m = -1, -1
        if len2 == 0:
            thr = tol2
            for k in range(i + 1, j):
                m = (xs[k] - ax) ** 2 + (ys[k] - ay) ** 2
                if m > best_m:
                    best, best_m = k, m
        else:
            thr = tol2 * len2
            for k in range(i + 1, j):
                c = dx * (ys[k] - ay) - dy * (xs[k] - ax)
                m = c * c
                if m > best_m:
                    best, best_m = k, m
        if best >= 0 and best_m > thr:
            keep.add(best)
            stack.append((i, best))
            stack.append((best, j))
    return sorted(keep)


def simplify_tracks(df: DataFrame, tol_deg: float = 0.5,
                    key_col: str = "user_id", ts_col: str = "ts",
                    seq_col: str = "event_id", lat: str = "lat",
                    lon: str = "lon") -> DataFrame:
    """Per-key OPEN-polyline Douglas-Peucker over GPS tracks (C-ts,
    r5): the trajectory companion to simplify_rings, sharing the exact
    integer contract (FLOOR-q6 quantization once, arbitrary-precision
    cross^2 vs tol^2*len^2, lowest-index ties) so the output is
    bit-identical on any host.  Output per key: n_in, n_out and the
    exact int64 kept-coordinate sums (the golden-checkable
    fingerprint).

    Scale shape: the multipolygon-stitch idiom — a JVM-side SORTED
    collect_list (total order (ts, seq)) packs each track, then ONE
    Arrow-batched pass runs the per-track Python-int DP on thousands
    of tracks per batch (~bounded vertices per key by contract); one
    shuffle total, pixels-never-ride-a-shuffle equivalent for traces."""
    tol_q6 = int(round(tol_deg * Q))
    schema = StructType([
        StructField("n_out", IntegerType()),
        StructField("sx_q6", LongType()),
        StructField("sy_q6", LongType()),
    ])

    @F.pandas_udf(schema)
    def _simp(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        rows = []
        for x_arr, y_arr in zip(xs, ys):
            x = [int(v) for v in x_arr]
            y = [int(v) for v in y_arr]
            keep = _dp_keep_open(x, y, tol_q6)
            rows.append((len(keep),
                         sum(x[i] for i in keep),
                         sum(y[i] for i in keep)))
        return pd.DataFrame(rows, columns=["n_out", "sx_q6", "sy_q6"])

    packed = (df.select(
        F.col(key_col).alias("k"),
        F.struct(
            F.col(ts_col).alias("t"), F.col(seq_col).alias("s"),
            F.expr(f"CAST(floor({lon} * {Q}.0) AS BIGINT)").alias("x"),
            F.expr(f"CAST(floor({lat} * {Q}.0) AS BIGINT)").alias("y"))
        .alias("p"))
        .groupBy("k")
        .agg(F.sort_array(F.collect_list("p")).alias("arr")))
    out = (packed
           .withColumn("_xs", F.expr("transform(arr, a -> a.x)"))
           .withColumn("_ys", F.expr("transform(arr, a -> a.y)"))
           .withColumn("_r", _simp(F.col("_xs"), F.col("_ys"))))
    return out.select(
        F.col("k").alias(key_col),
        F.expr("size(arr)").alias("n_in"),
        F.col("_r.n_out").alias("n_out"),
        F.col("_r.sx_q6").alias("sx_q6"),
        F.col("_r.sy_q6").alias("sy_q6"))


def quant_cols(verts: str = "verts") -> tuple[Column, Column]:
    """FLOOR-quantized q6 coordinate arrays (same kernel as measure.py)."""
    xs = F.expr(f"transform({verts}, v -> CAST(floor(v.lon * {Q}.0) AS BIGINT))")
    ys = F.expr(f"transform({verts}, v -> CAST(floor(v.lat * {Q}.0) AS BIGINT))")
    return xs, ys


def simplify_rings(rings: DataFrame, tol_deg: float = 0.05,
                   verts: str = "verts") -> DataFrame:
    """Attach DP-simplification summary columns to a ring table
    (schema of engine/geo/measure.py::rings_df): n_vertices_in,
    n_vertices_out, exact kept-coordinate sums, and the simplified
    vertex array (original doubles sliced by kept index) for consumers."""
    xs, ys = quant_cols(verts)
    s = rings.withColumn("_s", simplify_summary_udf(tol_deg)(xs, ys))
    return (s.select(
        "poly_id", "ring_id", "kind",
        F.expr(f"size({verts})").alias("n_vertices_in"),
        F.col("_s.n_out").alias("n_vertices_out"),
        F.col("_s.sx_q6").alias("sx_q6"),
        F.col("_s.sy_q6").alias("sy_q6"),
        F.expr(f"transform(_s.keep_idx, i -> element_at({verts}, i + 1))")
        .alias("verts_simplified")))


def dense_zigzag_rings(n_rings: int = 8, base_pts_per_side: int = 60):
    """Deterministic dense test rings (driver-key input): square
    perimeter walks with integer-LCG zigzag noise and periodic large
    spikes, coordinates in exact multiples of 1/1024 degree — every
    value is an exact double and every derived quantity uses only
    correctly-rounded +,*,/ (no libm trig), so the rings (and any
    golden pinned from them) are bit-identical on every IEEE-754 host.
    Returns rows in engine/geo/measure.py::RING_SCHEMA shape."""
    rows = []
    for r in range(n_rings):
        m = base_pts_per_side + 10 * r
        cx_k = (-140 + 37 * r) * 1024          # center, 1/1024 units
        cy_k = (-50 + 13 * r) * 1024
        side_k = 20 * 1024                      # 20-degree square
        state = (r * 2654435761 + 12345) % (1 << 32)
        verts = []
        # perimeter: 4 sides, m points each, zigzag normal offsets
        for side in range(4):
            for i in range(m):
                state = (1103515245 * state + 12345) % (1 << 31)
                small = (state % 9) - 4                      # ±4/1024 deg
                spike = 512 if (side * m + i) % 23 == 0 else 0   # 0.5 deg
                off = small + spike
                t = (i * side_k) // m - side_k // 2
                if side == 0:
                    x, y = t, -side_k // 2 - off
                elif side == 1:
                    x, y = side_k // 2 + off, t
                elif side == 2:
                    x, y = -t, side_k // 2 + off
                else:
                    x, y = -side_k // 2 - off, -t
                verts.append(((cx_k + x) / 1024.0, (cy_k + y) / 1024.0))
        rows.append((f"Z{r:02d}", f"Z{r:02d}:outer", "outer", verts))
    return rows
