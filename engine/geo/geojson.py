"""GeoJSON (RFC 7946) interchange for the polygon layer (r5; VERDICT-r4
"What's missing" #4 / next-round #6).

The engine's polygon layer previously loaded only its own JSON-ish
layout (`engine/geo/layer.py::PolygonLayer.from_json`).  This module
closes the standard-interchange gap a GIS user hits first:

* `layer_from_geojson(path)` — driver-side FeatureCollection parser ->
  `PolygonLayer`.  Polygon and MultiPolygon geometries (holes
  included); rings are de-closed and orientation-agnostic on read (RFC
  7946 recommends outer-CCW/holes-CW but real-world files disagree —
  the engine's even-odd PIP and signed-shoelace measures never depend
  on orientation).  A MultiPolygon feature stays ONE poly_id with
  multiple Polygon records — `PolygonLayer.parts()` merges them, and
  the covering/refine machinery is multi-part-correct by construction
  (covering dedups (cell, poly_id) ORing `full`; even-odd over
  concatenated disjoint-part edges is exact).

* `layer_to_geojson(layer)` / `write_geojson(layer, path)` — emit a
  FeatureCollection with RFC 7946 ring orientation (outer CCW, holes
  CW by planar shoelace; rings closed), polygons sharing a poly_id
  re-assembled into one MultiPolygon feature.  Output is a pure
  function of the layer (insertion order, repr round-trip floats), so
  write -> read -> write is byte-identical (tested).

* `read_geojson(spark, path)` — the SPARK-NATIVE reader (one row per
  polygon part) for pipelines where the layer arrives as data, not
  config.  GeoJSON's `coordinates` nesting depth varies by geometry
  type, which breaks a single Spark schema — the reader declares
  `coordinates` as STRING (Spark's JSON source captures the raw JSON
  text for mis-typed fields) and re-parses per type with `from_json`,
  so the whole parse stays JVM-side: no Python UDF, no driver JSON
  pass.  Layers are dimension-sized next to a 10^12-row fact table,
  but the reader still scales to millions of features (multiLine JSON
  is one task per file; shard large layers into one FeatureCollection
  per file).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.geo.layer import Polygon, PolygonLayer, _open_ring

# FeatureCollection schema for the Spark reader: `coordinates` is
# declared STRING on purpose — see module docstring.
_FC_SCHEMA = ("type string, features array<struct<"
              "type string, "
              "properties struct<poly_id string, name string>, "
              "geometry struct<type string, coordinates string>>>")

_POLY_COORDS = "array<array<array<double>>>"
_MPOLY_COORDS = "array<array<array<array<double>>>>"


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """FeatureCollection -> one row per polygon PART:
    (poly_id, name, part_idx, ring_xy, holes_xy).

    `ring_xy` is the outer ring as [[lon, lat], ...] with the closing
    duplicate vertex removed; `holes_xy` the de-closed hole rings.
    Polygon features yield part_idx = 0; MultiPolygon features one row
    per member polygon.  Features missing properties.poly_id fall back
    to properties.name, then to a stable error — ids are load-bearing
    for the containment join."""
    fc = spark.read.schema(_FC_SCHEMA).option("multiLine", True).json(path)
    feats = (fc.select(F.posexplode("features").alias("fidx", "f"))
             .select(
                 F.coalesce("f.properties.poly_id", "f.properties.name",
                            F.concat(F.lit("feature_"), F.col("fidx")))
                 .alias("poly_id"),
                 F.coalesce("f.properties.name", "f.properties.poly_id")
                 .alias("name"),
                 F.col("f.geometry.type").alias("gtype"),
                 F.col("f.geometry.coordinates").alias("coords")))
    poly = (feats.filter(F.col("gtype") == "Polygon")
            .select("poly_id", "name", F.lit(0).alias("part_idx"),
                    F.from_json("coords", _POLY_COORDS).alias("rings")))
    mpoly = (feats.filter(F.col("gtype") == "MultiPolygon")
             .select("poly_id", "name",
                     F.posexplode(F.from_json("coords", _MPOLY_COORDS))
                     .alias("part_idx", "rings")))
    parts = poly.unionByName(mpoly)
    # de-close natively: drop the last vertex iff it equals the first
    unclose = ("CASE WHEN size({r}) > 1 AND element_at({r}, 1) = "
               "element_at({r}, -1) THEN slice({r}, 1, size({r}) - 1) "
               "ELSE {r} END")
    return parts.select(
        "poly_id", "name", "part_idx",
        F.expr(unclose.format(r="rings[0]")).alias("ring_xy"),
        F.expr("transform(slice(rings, 2, size(rings) - 1), "
               f"r -> {unclose.format(r='r')})").alias("holes_xy"))


def layer_from_geojson(path: str) -> PolygonLayer:
    """Driver-side FeatureCollection -> PolygonLayer (layers are
    O(polygons) metadata; the fact table is the big side)."""
    with open(path) as f:
        fc = json.load(f)
    if fc.get("type") != "FeatureCollection":
        raise ValueError(f"not a FeatureCollection: {fc.get('type')!r}")
    polys: list[Polygon] = []
    for i, feat in enumerate(fc.get("features", [])):
        props = feat.get("properties") or {}
        pid = props.get("poly_id") or props.get("name") or f"feature_{i}"
        name = props.get("name") or pid
        geom = feat.get("geometry") or {}
        gtype = geom.get("type")
        if gtype == "Polygon":
            parts = [geom["coordinates"]]
        elif gtype == "MultiPolygon":
            parts = geom["coordinates"]
        else:
            raise ValueError(
                f"unsupported geometry type {gtype!r} (feature {i}); "
                "the polygon layer accepts Polygon/MultiPolygon")
        for rings in parts:
            if not rings:
                continue
            polys.append(Polygon(
                poly_id=pid, name=name,
                ring=_open_ring([[float(x), float(y)] for x, y in rings[0]]),
                holes=[_open_ring([[float(x), float(y)] for x, y in r])
                       for r in rings[1:]]))
    return PolygonLayer(polys)


def _shoelace2(ring: list[list[float]]) -> float:
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _oriented_closed(ring: list[list[float]], ccw: bool) -> list[list[float]]:
    r = [[float(x), float(y)] for x, y in ring]
    if (_shoelace2(r) > 0) != ccw:
        r = r[::-1]
    return r + [r[0]]


def layer_to_geojson(layer: PolygonLayer) -> dict:
    """PolygonLayer -> FeatureCollection dict.  RFC 7946 compliant:
    outer rings CCW, holes CW, rings closed, and polygons straddling
    the antimeridian SPLIT into parts with lon in [-180, 180] (the
    engine's internal lon > 180 encoding never leaks into interchange
    files).  Polygon records sharing a poly_id — and antimeridian
    parts — become one MultiPolygon feature (first-seen order)."""
    by_id: dict[str, list[Polygon]] = {}
    for p in layer.polygons:
        by_id.setdefault(p.poly_id, []).append(p)
    features = []
    for pid, members in by_id.items():
        parts = [[_oriented_closed(outer.tolist(), ccw=True)]
                 + [_oriented_closed(h.tolist(), ccw=False) for h in holes]
                 for p in members
                 for outer, holes in p.split_antimeridian()]
        geom = ({"type": "Polygon", "coordinates": parts[0]}
                if len(parts) == 1 else
                {"type": "MultiPolygon", "coordinates": parts})
        features.append({
            "type": "Feature",
            "properties": {"poly_id": pid, "name": members[0].name},
            "geometry": geom,
        })
    return {"type": "FeatureCollection", "features": features}


def write_geojson(layer: PolygonLayer, path: str) -> None:
    """Serialize deterministically (pure function of the layer: repr
    round-trip floats, fixed separators, insertion order)."""
    with open(path, "w") as f:
        json.dump(layer_to_geojson(layer), f, separators=(",", ":"))


def write_geojsonl(layer: PolygonLayer, path: str) -> None:
    """Newline-delimited GeoJSON (A18, r5 post-window): one Feature
    per line — the streaming-friendly interchange big pipelines emit
    (tippecanoe/ogr2ogr's GeoJSONSeq): splittable by construction, so
    a cluster reads one FILE in parallel where a FeatureCollection
    needs multiLine JSON parsing.  Same features, same normalization
    (layer_to_geojson's writer)."""
    fc = layer_to_geojson(layer)
    with open(path, "w") as f:
        for feat in fc["features"]:
            f.write(json.dumps(feat, separators=(",", ":")) + "\n")


def read_geojsonl(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON feature source -> the read_geojson output shape (one row
    per polygon part).  The DEFAULT json reader path (one object per
    line — splittable, predicate-prunable) instead of the multiLine
    whole-file parse; geometry re-parse and de-closing are the same
    native expressions as read_geojson."""
    schema = ("type string, "
              "properties struct<poly_id string, name string>, "
              "geometry struct<type string, coordinates string>")
    feats = (spark.read.schema(schema).json(path)
             .withColumn("fidx", F.monotonically_increasing_id())
             .select(
                 F.coalesce("properties.poly_id", "properties.name",
                            F.concat(F.lit("feature_"), F.col("fidx")))
                 .alias("poly_id"),
                 F.coalesce("properties.name", "properties.poly_id")
                 .alias("name"),
                 F.col("geometry.type").alias("gtype"),
                 F.col("geometry.coordinates").alias("coords")))
    poly = (feats.filter(F.col("gtype") == "Polygon")
            .select("poly_id", "name", F.lit(0).alias("part_idx"),
                    F.from_json("coords", _POLY_COORDS).alias("rings")))
    mpoly = (feats.filter(F.col("gtype") == "MultiPolygon")
             .select("poly_id", "name",
                     F.posexplode(F.from_json("coords", _MPOLY_COORDS))
                     .alias("part_idx", "rings")))
    parts = poly.unionByName(mpoly)
    unclose = ("CASE WHEN size({r}) > 1 AND element_at({r}, 1) = "
               "element_at({r}, -1) THEN slice({r}, 1, size({r}) - 1) "
               "ELSE {r} END")
    return parts.select(
        "poly_id", "name", "part_idx",
        F.expr(unclose.format(r="rings[0]")).alias("ring_xy"),
        F.expr("transform(slice(rings, 2, size(rings) - 1), "
               f"r -> {unclose.format(r='r')})").alias("holes_xy"))
