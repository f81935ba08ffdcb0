"""Encoded-polyline trajectory serialization (SURVEY.md §2.D22, r4 cont.).

Serializes each track key's time-ordered point sequence to the standard
Google encoded-polyline string — the interchange format map clients and
routing APIs consume (the trajectory sibling of C3g's vector tiles:
tracks become payloads, not rows).  Algorithm, per the published spec:

  per point: delta from the previous point (first point deltas from
  (0, 0)) in 1e-5-degree integer units, latitude first; each delta is
  zigzag-mapped (d >= 0 -> 2d, d < 0 -> -2d-1) then emitted as 5-bit
  little-endian chunks, every chunk but the last OR'd with 0x20, each
  +63 into printable ASCII.

EXACT-INTEGER CONTRACT: the API takes ALREADY-QUANTIZED integer e5
coordinates (`lat_e5`, `lon_e5`).  Quantizing floats (round(lat*1e5))
is deliberately the caller's problem: float rounding sits in the
cross-engine tie class (Spark HALF_UP vs DuckDB half-even at .5), while
integer inputs make the polyline a pure function of the input set —
bit-identical under any partitioning, retry, or engine.

Scale shape: ONE shuffle — the lag window partitions by track key and
the final per-key aggregation reuses that hash partitioning.  The
per-point chunk encoding is a native codegen expression (sequence +
transform + chr — no Python anywhere); the per-track concat is an
ordered fold over collect_list(struct), bounded by the track length
(device ping streams are naturally bounded; pass `max_points` to hard-
cap pathological tracks deterministically — lowest (ts, seq) kept —
the same opt-in bounding contract as encode_vector_tiles).

Deltas are bounded by one global wrap (|d| <= 36_000_000 -> zigzag
< 2^27 -> at most 6 chunks); the chunk-count CASE covers u < 2^30 and
the in-plan guard fails loudly beyond it rather than truncating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _zigzag(d):
    return F.when(d >= 0, 2 * d).otherwise(-2 * d - 1)


# Chunk-count thresholds: u < 32^k needs k chunks (k >= 1).
_THRESH = [32 ** k for k in range(1, 6)]  # 32 .. 2^25; else 6 chunks


def _nchunks(u):
    expr = F.lit(6)
    for k in range(len(_THRESH), 0, -1):
        expr = F.when(u < _THRESH[k - 1], F.lit(k)).otherwise(expr)
    return expr


def _enc_cols(df, u_col: str, out: str):
    """Attach the polyline chunk string for zigzag column `u_col` as
    `out`: 5-bit little-endian chunks, continuation bit 0x20 on all but
    the last, +63 into ASCII — one native codegen expression.  In-plan
    guard on the documented u < 2^30 domain (assert_true -> fails
    loudly, never truncates)."""
    n = _nchunks(F.col(u_col))
    guard = F.coalesce(
        F.assert_true(F.col(u_col) < F.lit(1 << 30),
                      F.lit("polyline: delta out of the e5 domain"))
        .cast("int"), F.lit(0))
    df = df.withColumn("__n", n + guard)
    return df.withColumn(out, F.expr(
        f"concat_ws('', transform(sequence(0, __n - 1), i -> "
        f"chr(((`{u_col}` >> (i * 5)) & 31) + "
        f"CASE WHEN i < __n - 1 THEN 95 ELSE 63 END)))")).drop("__n")


def encode_polyline(df: DataFrame, key_col: str = "user_id",
                    ts_col: str = "ts", seq_col: str = "event_id",
                    lat_e5: str = "lat_e5", lon_e5: str = "lon_e5",
                    max_points: int | None = None) -> DataFrame:
    """(key, ts, seq, lat_e5, lon_e5) -> (key, n_points, polyline).

    Ordering is total ((ts, seq) with seq a per-key unique tiebreak),
    so the output string is a pure function of the input set."""
    pts = df.select(
        F.col(key_col), F.col(ts_col).alias("__ts"),
        F.col(seq_col).alias("__seq"),
        F.col(lat_e5).cast("long").alias("__lat"),
        F.col(lon_e5).cast("long").alias("__lon"))

    w = Window.partitionBy(key_col).orderBy(F.asc("__ts"), F.asc("__seq"))
    if max_points is not None:
        pts = (pts.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") <= max_points).drop("__rn"))
    stepped = (
        pts
        .withColumn("__ulat", _zigzag(F.col("__lat")
                                      - F.lag("__lat", 1, 0).over(w)))
        .withColumn("__ulon", _zigzag(F.col("__lon")
                                      - F.lag("__lon", 1, 0).over(w))))
    stepped = _enc_cols(stepped, "__ulat", "__elat")
    stepped = _enc_cols(stepped, "__ulon", "__elon")
    per_point = stepped.select(
        key_col, "__ts", "__seq",
        F.concat("__elat", "__elon").alias("__pt"))

    return (per_point
            .groupBy(key_col)
            .agg(F.count("*").alias("n_points"),
                 F.array_sort(F.collect_list(
                     F.struct("__ts", "__seq", "__pt"))).alias("__l"))
            .select(key_col, F.col("n_points").cast("long"),
                    F.expr("concat_ws('', transform(__l, p -> p.__pt))")
                    .alias("polyline")))


def encode_polyline_py(points) -> str:
    """Pure-Python reference (the published algorithm verbatim) for the
    pytest oracle: points = iterable of (lat_e5, lon_e5) ints, already
    ordered."""
    out = []
    plat = plon = 0
    for lat, lon in points:
        for d in (lat - plat, lon - plon):
            u = (d << 1) if d >= 0 else ~(d << 1)
            while u >= 0x20:
                out.append(chr((0x20 | (u & 0x1F)) + 63))
                u >>= 5
            out.append(chr(u + 63))
        plat, plon = lat, lon
    return "".join(out)


def decode_polyline_py(s: str):
    """Reference decoder for roundtrip tests: polyline -> [(lat_e5,
    lon_e5)]."""
    pts, i, lat, lon = [], 0, 0, 0
    while i < len(s):
        for which in (0, 1):
            shift = u = 0
            while True:
                b = ord(s[i]) - 63
                i += 1
                u |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            d = ~(u >> 1) if (u & 1) else (u >> 1)
            if which == 0:
                lat += d
            else:
                lon += d
        pts.append((lat, lon))
    return pts
