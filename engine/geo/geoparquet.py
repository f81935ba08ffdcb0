"""GeoParquet (OGC, spec 1.1.0) interchange for the polygon layer (r5).

Completes the standard-interchange surface begun with GeoJSON
(`engine/geo/geojson.py`): GeoParquet is the format a lakehouse GIS
user actually stores layers in — Parquet files whose geometry column
is WKB binary and whose FILE metadata carries a `geo` JSON key
describing encoding, geometry types, global bbox, and CRS.

* `write_geoparquet(layer, path)` — PolygonLayer -> a single
  GeoParquet file: one row per poly_id (parts re-assembled into one
  MultiPolygon, matching the GeoJSON writer's feature grouping),
  geometry encoded as little-endian ISO WKB with RFC-7946-style
  orientation (outer CCW / holes CW, declared via the spec's
  `orientation: counterclockwise` field), antimeridian parts split to
  lon in [-180, 180].  Written with pyarrow on the driver — layers
  are O(polygons) dimension metadata next to the 10^12-row fact
  table; the READ path below is the one that must scale, and does
  (Parquet is splittable; the WKB decode is geometry-local).
  Deterministic: pure function of the layer (insertion order, exact
  float64 bytes), so write -> read -> write is byte-identical.

* `layer_from_geoparquet(path)` — driver-side read -> PolygonLayer
  (the config-style mirror of `layer_from_geojson`).

* `read_geoparquet(spark, path)` — the SPARK-NATIVE scan for
  pipelines where the layer arrives as data: Spark's own parquet
  source reads (poly_id, name, geometry binary) — predicate pushdown
  and column pruning intact — and ONE Arrow-batched `mapInPandas`
  stage decodes WKB to the same per-part schema `read_geojson`
  emits: (poly_id, name, part_idx, ring_xy, holes_xy), rings
  de-closed.  Zero shuffle; decode parallelism = scan parallelism.

WKB subset: geometry types 3 (Polygon) and 6 (MultiPolygon),
little-endian, 2-D.  Encode/decode are exact inverses on float64
coordinates (no quantization — interchange must not lose bits).
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from engine.geo.geojson import _oriented_closed
from engine.geo.layer import Polygon, PolygonLayer, _open_ring

GEO_META_KEY = b"geo"
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

PART_SCHEMA = ("poly_id string, name string, part_idx int, "
               "ring_xy array<array<double>>, "
               "holes_xy array<array<array<double>>>")


# ---------------------------------------------------------------- WKB

def _encode_ring_closed(ring: list[list[float]]) -> bytes:
    """One closed ring: uint32 count + float64 xy pairs."""
    arr = np.asarray(ring, dtype="<f8")
    return struct.pack("<I", len(ring)) + arr.tobytes()


def _encode_polygon_body(rings_closed: list[list[list[float]]]) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings_closed))]
    out += [_encode_ring_closed(r) for r in rings_closed]
    return b"".join(out)


def encode_wkb(parts: list[list[list[list[float]]]]) -> bytes:
    """[[outer_closed, hole_closed, ...], ...] -> WKB bytes.
    One part -> Polygon; several -> MultiPolygon (same rule as the
    GeoJSON writer, so the two interchange forms agree feature-wise)."""
    if len(parts) == 1:
        return _encode_polygon_body(parts[0])
    out = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(parts))]
    out += [_encode_polygon_body(p) for p in parts]
    return b"".join(out)


def _decode_polygon_body(buf: bytes, off: int) -> tuple[list, int]:
    bo, gtype, nrings = struct.unpack_from("<BII", buf, off)
    if bo != 1 or gtype != _WKB_POLYGON:
        raise ValueError(f"expected LE WKB Polygon at {off}, "
                         f"got byte_order={bo} type={gtype}")
    off += 9
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npts, offset=off)
        off += 16 * npts
        rings.append(pts.reshape(npts, 2).tolist())
    return rings, off


def decode_wkb(buf: bytes) -> list[list[list[list[float]]]]:
    """WKB Polygon/MultiPolygon -> [[outer_closed, hole_closed, ...], ...]."""
    bo, gtype = struct.unpack_from("<BI", buf, 0)
    if bo != 1:
        raise ValueError("only little-endian WKB is produced/accepted")
    if gtype == _WKB_POLYGON:
        rings, off = _decode_polygon_body(buf, 0)
        parts = [rings]
    elif gtype == _WKB_MULTIPOLYGON:
        (nparts,) = struct.unpack_from("<I", buf, 5)
        off = 9
        parts = []
        for _ in range(nparts):
            rings, off = _decode_polygon_body(buf, off)
            parts.append(rings)
    else:
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    if off != len(buf):
        raise ValueError(f"trailing bytes in WKB ({len(buf) - off})")
    return parts


# ------------------------------------------------------------- writer

def _layer_features(layer: PolygonLayer) -> list[tuple[str, str, list]]:
    """(poly_id, name, closed-ring parts) per feature — the SAME
    grouping/orientation/antimeridian treatment as layer_to_geojson."""
    by_id: dict[str, list[Polygon]] = {}
    for p in layer.polygons:
        by_id.setdefault(p.poly_id, []).append(p)
    feats = []
    for pid, members in by_id.items():
        parts = [[_oriented_closed(outer.tolist(), ccw=True)]
                 + [_oriented_closed(h.tolist(), ccw=False) for h in holes]
                 for p in members
                 for outer, holes in p.split_antimeridian()]
        feats.append((pid, members[0].name, parts))
    return feats


def geo_metadata(feats: list[tuple[str, str, list]]) -> dict:
    """The `geo` file-metadata JSON (GeoParquet 1.1.0)."""
    xs, ys, types = [], [], set()
    for _, _, parts in feats:
        types.add("Polygon" if len(parts) == 1 else "MultiPolygon")
        for rings in parts:
            for x, y in rings[0]:
                xs.append(x)
                ys.append(y)
    return {
        "version": "1.1.0",
        "primary_column": "geometry",
        "columns": {
            "geometry": {
                "encoding": "WKB",
                "geometry_types": sorted(types),
                "orientation": "counterclockwise",
                "bbox": [min(xs), min(ys), max(xs), max(ys)],
                # per spec: null CRS means OGC:CRS84 (lon/lat WGS84),
                # exactly the engine's coordinate contract
                "crs": None,
            }
        },
    }


def write_geoparquet(layer: PolygonLayer, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    feats = _layer_features(layer)
    table = pa.table({
        "poly_id": pa.array([f[0] for f in feats], pa.string()),
        "name": pa.array([f[1] for f in feats], pa.string()),
        "geometry": pa.array([encode_wkb(f[2]) for f in feats], pa.binary()),
    }).replace_schema_metadata({
        GEO_META_KEY: json.dumps(geo_metadata(feats),
                                 separators=(",", ":")).encode()})
    pq.write_table(table, path, compression="snappy")


# ------------------------------------------------------------- readers

def read_geo_metadata(path: str) -> dict:
    import pyarrow.parquet as pq
    meta = pq.read_schema(path).metadata or {}
    if GEO_META_KEY not in meta:
        raise ValueError(f"{path} has no 'geo' file metadata "
                         "(not a GeoParquet file)")
    return json.loads(meta[GEO_META_KEY])


def layer_from_geoparquet(path: str) -> PolygonLayer:
    import pyarrow.parquet as pq
    read_geo_metadata(path)  # raise early on non-GeoParquet input
    t = pq.read_table(path, columns=["poly_id", "name", "geometry"])
    polys: list[Polygon] = []
    for pid, name, wkb in zip(t.column("poly_id").to_pylist(),
                              t.column("name").to_pylist(),
                              t.column("geometry").to_pylist()):
        for rings in decode_wkb(wkb):
            polys.append(Polygon(
                poly_id=pid, name=name,
                ring=_open_ring(rings[0]),
                holes=[_open_ring(r) for r in rings[1:]]))
    return PolygonLayer(polys)


def read_geoparquet(spark, path: str):
    """Spark-native GeoParquet scan -> one row per polygon PART with
    the read_geojson schema (poly_id, name, part_idx, ring_xy,
    holes_xy), rings de-closed.  Parquet scan (pruned to the three
    columns) + one geometry-local Arrow decode stage — zero shuffle."""

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for pid, name, wkb in zip(pdf["poly_id"], pdf["name"],
                                      pdf["geometry"]):
                for idx, rings in enumerate(decode_wkb(bytes(wkb))):
                    rows.append((pid, name, idx,
                                 _open_ring(rings[0]),
                                 [_open_ring(r) for r in rings[1:]]))
            yield pd.DataFrame(rows, columns=[
                "poly_id", "name", "part_idx", "ring_xy", "holes_xy"])

    return (spark.read.parquet(path)
            .select("poly_id", "name", "geometry")
            .mapInPandas(decode, PART_SCHEMA))
