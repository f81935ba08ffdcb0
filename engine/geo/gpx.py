"""A20 (r5 cont.) — GPX interchange: the GPS-track XML format every
handheld/phone exporter emits, as a Spark-native source.

`read_gpx` parses GPX 1.1 track files with NATIVE string expressions
only (regexp_extract_all + HOFs over the whole-file text — the
scan_wkt discipline: no Python row stage, no XML library), one file
per track, document order preserved (trkpt order is DATA in GPX —
the reader keeps it by construction, arrays index in file order).

`write_gpx_tracks` is the fixture/export writer (driver-side, bounded
input by contract — the _osm_fixture class); coordinates are written
as exact micro-degree decimal strings so text -> double -> micro-int
round-trips losslessly on any engine (decimal-to-double is correctly
rounded, and micro-degree integers are below 2^53).

Scale shape: parse parallelism = file count (one wholetext row per
track file; executors parse disjoint files, the shapefile reader's
distribution story); the per-track summary is array HOFs on the
parsed row — zero shuffle beyond the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_gpx_tracks(out_dir: str, tracks) -> list[str]:
    """tracks: iterable of (name, [(lat_udeg:int, lon_udeg:int), ...])
    in point order.  One GPX file per track; coordinates as exact
    6-decimal micro-degree strings."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, pts in tracks:
        parts = ['<?xml version="1.0" encoding="UTF-8"?>',
                 '<gpx version="1.1" creator="osm_spark">',
                 f"<trk><name>{name}</name><trkseg>"]
        for lat_u, lon_u in pts:
            parts.append(
                f'<trkpt lat="{lat_u / 1000000:.6f}" '
                f'lon="{lon_u / 1000000:.6f}"></trkpt>')
        parts.append("</trkseg></trk></gpx>")
        p = os.path.join(out_dir, f"{name}.gpx")
        with open(p, "w") as f:
            f.write("\n".join(parts))
        paths.append(p)
    return paths


def read_gpx(spark: SparkSession, glob: str) -> DataFrame:
    """-> (track, n_pts, lats array<double>, lons array<double>) in
    document order, parsed all-natively."""
    raw = spark.read.text(glob, wholetext=True)
    lats = ("transform(regexp_extract_all(value, "
            "'lat=\"([^\"]+)\"', 1), x -> CAST(x AS DOUBLE))")
    lons = ("transform(regexp_extract_all(value, "
            "'lon=\"([^\"]+)\"', 1), x -> CAST(x AS DOUBLE))")
    return raw.select(
        F.expr("regexp_extract(value, '<name>([^<]*)</name>', 1)")
        .alias("track"),
        F.expr(f"size({lats})").cast("int").alias("n_pts"),
        F.expr(lats).alias("lats"),
        F.expr(lons).alias("lons"))


def gpx_track_summary(parsed: DataFrame) -> DataFrame:
    """Per-track exact summary over the parsed arrays: endpoint
    micro-degree integers and the raw coordinate-space L1 path length
    in micro-degrees (pinned contract: NO antimeridian wrap — this is
    the interchange-losslessness check, not a geodesic measure; the
    traj family owns geodesy)."""
    lat_u = "transform(lats, x -> CAST(round(x * 1000000) AS BIGINT))"
    lon_u = "transform(lons, x -> CAST(round(x * 1000000) AS BIGINT))"
    l1 = (f"aggregate(sequence(2, greatest(n_pts, 2)), 0L, (a, i) -> "
          f"a + CASE WHEN i <= n_pts THEN "
          f"abs(element_at({lat_u}, i) - element_at({lat_u}, i - 1)) "
          f"+ abs(element_at({lon_u}, i) - element_at({lon_u}, i - 1)) "
          "ELSE 0L END)")
    return parsed.select(
        "track", "n_pts",
        F.expr(f"element_at({lat_u}, 1)").alias("first_lat_u"),
        F.expr(f"element_at({lon_u}, 1)").alias("first_lon_u"),
        F.expr(f"element_at({lat_u}, n_pts)").alias("last_lat_u"),
        F.expr(f"element_at({lon_u}, n_pts)").alias("last_lon_u"),
        F.expr(l1).cast("long").alias("l1_udeg"))
