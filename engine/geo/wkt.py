"""WKT (ISO 19125 / OGC Simple Features) interchange for the polygon
layer (r5) — the fourth interchange surface beside GeoJSON, GeoParquet
and OSM PBF.  The carrier is a TSV of (poly_id, name, wkt) lines: WKT
itself carries no feature properties, and ids are load-bearing for the
containment join, so the engine's WKT form is the classic
attributes-plus-geometry-column table every GIS export produces.

* `layer_to_wkt(layer)` / `write_wkt(layer, path)` — POLYGON /
  MULTIPOLYGON text with the same normalization as the GeoJSON writer
  (outer rings CCW, holes CW, rings closed, antimeridian parts split,
  shared poly_ids merged into one MULTIPOLYGON); coordinates are
  shortest-repr doubles, so write -> read -> write is byte-identical.

* `layer_from_wkt(path)` — driver-side parser -> PolygonLayer.

* `read_wkt(spark, path)` — the SPARK-NATIVE reader (one row per
  polygon part, the read_geojson output shape): a 3-column TSV scan,
  then the whole WKT parse as native string ops — regexp_extract
  strips the typed wrapper, three split() levels recover
  parts/rings/vertices, transform+CAST builds the double arrays.  No
  Python worker, no driver text pass; canonical OGC spacing
  ("X Y, X Y", rings ", (") is normalized on entry so exporter
  whitespace variants parse identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.geo.layer import Polygon, PolygonLayer, _open_ring


def _fmt_ring(ring_closed: list[list[float]]) -> str:
    return "(" + ", ".join(f"{x!r} {y!r}" for x, y in ring_closed) + ")"


def layer_to_wkt(layer: PolygonLayer) -> list[tuple[str, str, str]]:
    """PolygonLayer -> [(poly_id, name, wkt)] with the GeoJSON writer's
    normalization (engine/geo/geojson.py::layer_to_geojson): outer CCW,
    holes CW, rings closed, antimeridian split, poly_id-merged
    MULTIPOLYGON, first-seen order."""
    from engine.geo.geojson import _oriented_closed

    by_id: dict[str, list[Polygon]] = {}
    for p in layer.polygons:
        by_id.setdefault(p.poly_id, []).append(p)
    rows = []
    for pid, members in by_id.items():
        parts = [[_oriented_closed(outer.tolist(), ccw=True)]
                 + [_oriented_closed(h.tolist(), ccw=False)
                    for h in holes]
                 for p in members
                 for outer, holes in p.split_antimeridian()]
        if len(parts) == 1:
            wkt = ("POLYGON ("
                   + ", ".join(_fmt_ring(r) for r in parts[0]) + ")")
        else:
            wkt = ("MULTIPOLYGON ("
                   + ", ".join(
                       "(" + ", ".join(_fmt_ring(r) for r in part) + ")"
                       for part in parts) + ")")
        rows.append((pid, members[0].name, wkt))
    return rows


def write_wkt(layer: PolygonLayer, path: str) -> None:
    """Serialize deterministically: one TAB-separated
    poly_id, name, wkt line per feature, newline-terminated."""
    with open(path, "w") as f:
        for pid, name, wkt in layer_to_wkt(layer):
            f.write(f"{pid}\t{name}\t{wkt}\n")


def _parse_rings(text: str) -> list[list[list[float]]]:
    """'x y, x y, ...), (x y, ...' ring-list body -> de-closed rings."""
    rings = []
    for ring_txt in text.split("), ("):
        ring = [[float(a) for a in pair.split(" ")]
                for pair in ring_txt.split(", ")]
        rings.append(ring)
    return rings


def layer_from_wkt(path: str) -> PolygonLayer:
    """Driver-side TSV-of-WKT -> PolygonLayer (the layer_from_geojson
    twin; layers are O(polygons) metadata)."""
    polys: list[Polygon] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            pid, name, wkt = line.split("\t")
            if wkt.startswith("MULTIPOLYGON ((("):
                body = wkt[len("MULTIPOLYGON ((("):-3]
                parts = [_parse_rings(p) for p in body.split(")), ((")]
            elif wkt.startswith("POLYGON (("):
                parts = [_parse_rings(wkt[len("POLYGON (("):-2])]
            else:
                raise ValueError(f"unsupported WKT: {wkt[:40]!r}")
            for rings in parts:
                polys.append(Polygon(
                    poly_id=pid, name=name,
                    ring=_open_ring(rings[0]),
                    holes=[_open_ring(r) for r in rings[1:]]))
    return PolygonLayer(polys)


def read_wkt(spark: SparkSession, path: str) -> DataFrame:
    """TSV of (poly_id, name, wkt) -> one row per polygon PART:
    (poly_id, name, part_idx, ring_xy, holes_xy) — the read_geojson
    output shape, so every downstream consumer (coverings, summaries)
    is format-agnostic."""
    raw = (spark.read
           .schema("poly_id string, name string, wkt string")
           .option("sep", "\t").csv(path))
    # normalize exporter whitespace variants to canonical OGC spacing
    norm = (raw.withColumn(
        "wkt",
        F.regexp_replace(F.regexp_replace(F.regexp_replace(
            F.col("wkt"), r"\s*,\s*", ", "), r"\(\s+", "("), r"\s+\)", ")")))
    poly = (norm.filter(F.col("wkt").startswith("POLYGON"))
            .select("poly_id", "name", F.lit(0).alias("part_idx"),
                    F.regexp_extract("wkt", r"^POLYGON \(\((.*)\)\)$", 1)
                    .alias("body")))
    mpoly = (norm.filter(F.col("wkt").startswith("MULTIPOLYGON"))
             .select("poly_id", "name",
                     F.posexplode(F.split(F.regexp_extract(
                         "wkt", r"^MULTIPOLYGON \(\(\((.*)\)\)\)$", 1),
                         r"\)\), \(\(")).alias("part_idx", "body")))
    parts = poly.unionByName(mpoly)
    ring = ("transform(split({r}, ', '), "
            "p -> transform(split(p, ' '), a -> CAST(a AS DOUBLE)))")
    rings = f"transform(split(body, '\\\\), \\\\('), r -> {ring.format(r='r')})"
    parts = parts.withColumn("rings", F.expr(rings))
    # de-close natively: drop the last vertex iff it equals the first
    unclose = ("CASE WHEN size({r}) > 1 AND element_at({r}, 1) = "
               "element_at({r}, -1) THEN slice({r}, 1, size({r}) - 1) "
               "ELSE {r} END")
    return parts.select(
        "poly_id", "name", "part_idx",
        F.expr(unclose.format(r="rings[0]")).alias("ring_xy"),
        F.expr("transform(slice(rings, 2, size(rings) - 1), "
               f"r -> {unclose.format(r='r')})").alias("holes_xy"))
