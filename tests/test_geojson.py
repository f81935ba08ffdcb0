"""GeoJSON interchange (r5; engine/geo/geojson.py): RFC 7946
round-trip, MultiPolygon/hole/antimeridian handling, Spark-native
reader parity with the driver-side parser, and containment-join parity
between a GeoJSON-loaded layer and the native loader.
"""
from __future__ import annotations

import json
import math

import pytest

from engine.geo.geojson import (
    layer_from_geojson, layer_to_geojson, read_geojson, write_geojson,
    _shoelace2,
)
from engine.geo.layer import Polygon, PolygonLayer

FIXTURE = "/root/repo/oracle/layer12plus.geojson"


def _mixed_layer() -> PolygonLayer:
    lay = PolygonLayer.from_json()
    polys = list(lay.polygons)
    polys.append(Polygon(poly_id="M00", name="multi-west",
                         ring=[[150.0, 10.0], [160.0, 10.0],
                               [160.0, 20.0], [150.0, 20.0]]))
    polys.append(Polygon(poly_id="M00", name="multi-west",
                         ring=[[165.0, 12.0], [175.0, 12.0],
                               [175.0, 22.0], [165.0, 22.0]],
                         holes=[[[168.0, 14.0], [172.0, 14.0],
                                 [172.0, 18.0], [168.0, 18.0]]]))
    return PolygonLayer(polys)


def test_fixture_is_current():
    """The committed fixture is exactly what the writer emits for
    layer12 + the M00 MultiPolygon — regenerating cannot drift."""
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".geojson") as tmp:
        write_geojson(_mixed_layer(), tmp.name)
        assert open(tmp.name, "rb").read() == open(FIXTURE, "rb").read()


def test_roundtrip_byte_identical(tmp_path):
    p1, p2 = str(tmp_path / "a.geojson"), str(tmp_path / "b.geojson")
    write_geojson(_mixed_layer(), p1)
    write_geojson(layer_from_geojson(p1), p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_rfc7946_compliance():
    fc = json.load(open(FIXTURE))
    assert fc["type"] == "FeatureCollection"
    for f in fc["features"]:
        g = f["geometry"]
        parts = (g["coordinates"] if g["type"] == "MultiPolygon"
                 else [g["coordinates"]])
        assert g["type"] in ("Polygon", "MultiPolygon")
        for rings in parts:
            for i, ring in enumerate(rings):
                assert ring[0] == ring[-1], "rings must be closed"
                assert all(-180.0 <= x <= 180.0 for x, _ in ring), \
                    "antimeridian polygons must be split on write"
                sign = _shoelace2(ring[:-1])
                assert (sign > 0) == (i == 0), \
                    "outer CCW, holes CW (RFC 7946)"


def test_antimeridian_polygon_splits_to_multipolygon():
    fc = json.load(open(FIXTURE))
    p10 = [f for f in fc["features"]
           if f["properties"]["poly_id"] == "P10"][0]
    assert p10["geometry"]["type"] == "MultiPolygon"
    assert len(p10["geometry"]["coordinates"]) == 2


def test_covering_and_parts_parity():
    """A GeoJSON-loaded layer joins identically to the native loader:
    same covering rows, same merged parts per poly_id."""
    orig = _mixed_layer()
    back = layer_from_geojson(FIXTURE)
    assert back.covering(8) == orig.covering(8)
    po, pb = orig.parts(), back.parts()
    assert set(po) == set(pb)
    assert len(pb["M00"]) == 2  # MultiPolygon merged under one poly_id
    for pid in po:
        assert len(po[pid]) == len(pb[pid])
        for (oa, oh), (ba, bh) in zip(po[pid], pb[pid]):
            assert oa.shape == ba.shape and len(oh) == len(bh)
            # vertex SETS equal (orientation normalization may reverse
            # and rotate ring order; geometry is identical)
            assert ({tuple(v) for v in oa.tolist()}
                    == {tuple(v) for v in ba.tolist()})


def test_spark_reader_matches_driver_parser(spark):
    rows = {(r.poly_id, r.part_idx): r
            for r in read_geojson(spark, FIXTURE).collect()}
    fc = json.load(open(FIXTURE))
    n_parts = 0
    for f in fc["features"]:
        g = f["geometry"]
        parts = (g["coordinates"] if g["type"] == "MultiPolygon"
                 else [g["coordinates"]])
        pid = f["properties"]["poly_id"]
        for idx, rings in enumerate(parts):
            n_parts += 1
            r = rows[(pid, idx)]
            assert r.name == f["properties"]["name"]
            assert [list(v) for v in r.ring_xy] == rings[0][:-1]
            assert len(r.holes_xy) == len(rings) - 1
            for hole, ring in zip(r.holes_xy, rings[1:]):
                assert [list(v) for v in hole] == ring[:-1]
    assert len(rows) == n_parts == 15  # 11 polys + 2 (P10) + 2 (M00)


def test_reader_rejects_nothing_silently(tmp_path, spark):
    """Point/LineString geometries raise in the driver parser (the
    polygon layer contract) rather than vanishing."""
    bad = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"poly_id": "x"},
         "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}}]}
    p = str(tmp_path / "bad.geojson")
    json.dump(bad, open(p, "w"))
    with pytest.raises(ValueError, match="unsupported geometry"):
        layer_from_geojson(p)


def test_unclosed_rings_accepted(tmp_path):
    """Real-world files sometimes omit the closing vertex; reads fine."""
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"poly_id": "u"},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0]]]}}]}
    p = str(tmp_path / "u.geojson")
    json.dump(fc, open(p, "w"))
    lay = layer_from_geojson(p)
    assert len(lay.polygons[0].ring) == 3


def test_spatial_join_via_geojson_layer(spark, sf_dir):
    """End-to-end: the containment join over a GeoJSON-loaded layer is
    row-identical to the native-loader join."""
    from engine.geo.bbox import bbox_filter
    from engine.geo.cells import cell_parent_col, with_cell
    from engine.geo.join import candidates_join
    from engine.geo.pip import refine_native
    from pyspark.sql import functions as F

    imgs = with_cell(spark.read.parquet(f"{sf_dir}/events.parquet")
                     .select(F.col("event_id").alias("image_id"),
                             (F.col("value") % 170 - 85).alias("lat"),
                             (F.col("value") * 7 % 360 - 180).alias("lon")))
    probe = imgs.withColumn("cell_p", cell_parent_col("cell", 8))

    def join_rows(layer):
        build = layer.build_df(spark, 8, with_edges=True)
        cands = candidates_join(probe, build, mode="broadcast",
                                build_rows=build.count())
        return {(r.image_id, r.poly_id)
                for r in refine_native(cands)
                .select("image_id", "poly_id").collect()}

    assert join_rows(_mixed_layer()) == join_rows(
        layer_from_geojson(FIXTURE))


# ------------------------------------------------ NDJSON (GeoJSONSeq)

def test_geojsonl_roundtrip_matches_fc_reader(spark, tmp_path):
    from engine.geo.geojson import (layer_from_geojson, read_geojson,
                                    read_geojsonl, write_geojsonl)
    src = "/root/repo/oracle/layer12plus.geojson"
    p = str(tmp_path / "l.geojsonl")
    write_geojsonl(layer_from_geojson(src), p)
    # one feature per line, no FeatureCollection wrapper
    lines = open(p).read().strip().split("\n")
    assert all(l.startswith('{"type":"Feature"') for l in lines)
    key = lambda df: sorted(
        (r.poly_id, r.part_idx, len(r.ring_xy), len(r.holes_xy),
         tuple(sorted(map(tuple, r.ring_xy))))
        for r in df.collect())
    assert key(read_geojsonl(spark, p)) == key(read_geojson(spark, src))


def test_geojsonl_is_line_splittable(spark, tmp_path):
    # the reader must tolerate the file arriving as multiple splits:
    # simulate by writing the same lines into two files in a directory
    from engine.geo.geojson import (layer_from_geojson, read_geojsonl,
                                    write_geojsonl)
    src = "/root/repo/oracle/layer12plus.geojson"
    whole = str(tmp_path / "w.geojsonl")
    write_geojsonl(layer_from_geojson(src), whole)
    lines = open(whole).read().strip().split("\n")
    d = tmp_path / "parts"
    d.mkdir()
    (d / "a.geojsonl").write_text("\n".join(lines[:6]) + "\n")
    (d / "b.geojsonl").write_text("\n".join(lines[6:]) + "\n")
    a = read_geojsonl(spark, whole).count()
    b = read_geojsonl(spark, str(d)).count()
    assert a == b > 0
