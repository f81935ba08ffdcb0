"""r5 — WKT interchange (engine/geo/wkt.py): byte-identical
write -> driver-parse -> write, Spark-native reader parity with the
GeoJSON reader on the same layer (exact vertex arrays), whitespace
normalization, and covering parity with the native layer loader."""

from __future__ import annotations

import os
import tempfile

from engine.geo.geojson import layer_from_geojson, read_geojson
from engine.geo.wkt import layer_from_wkt, read_wkt, write_wkt

FIXTURE = "/root/repo/oracle/layer12plus.geojson"


def _wkt_path(tmpdir):
    path = os.path.join(tmpdir, "layer.wkt.tsv")
    write_wkt(layer_from_geojson(FIXTURE), path)
    return path


def test_write_parse_write_byte_identical():
    with tempfile.TemporaryDirectory() as d:
        p1 = _wkt_path(d)
        layer = layer_from_wkt(p1)
        p2 = os.path.join(d, "again.wkt.tsv")
        write_wkt(layer, p2)
        assert open(p1, "rb").read() == open(p2, "rb").read()
        assert len(open(p1).read()) > 1000


def test_driver_parse_matches_geojson_layer():
    with tempfile.TemporaryDirectory() as d:
        got = layer_from_wkt(_wkt_path(d))
    want = layer_from_geojson(FIXTURE)
    gk = {(p.poly_id, i) for i, p in enumerate(got.polygons)}
    wk = {(p.poly_id, i) for i, p in enumerate(want.polygons)}
    assert len(got.polygons) == len(want.polygons)
    assert gk == wk
    for g, w in zip(got.polygons, want.polygons):
        # the WKT writer re-orients rings; vertex SETS are preserved
        # and the engine is orientation-agnostic by contract
        assert {tuple(v) for v in g.ring} == \
               {tuple(v) for v in w.ring}, g.poly_id
        assert len(g.holes) == len(w.holes)


def test_spark_reader_matches_geojson_reader(spark):
    with tempfile.TemporaryDirectory() as d:
        wdf = read_wkt(spark, _wkt_path(d)).collect()
    gdf = read_geojson(spark, FIXTURE).collect()
    gmap = {(r.poly_id, r.part_idx): r for r in gdf}
    assert len(wdf) == len(gdf)
    for r in wdf:
        g = gmap[(r.poly_id, r.part_idx)]
        assert r.name == g.name
        # both writers normalize orientation from the same layer ->
        # the de-closed vertex arrays must be EXACTLY equal
        assert r.ring_xy == g.ring_xy, r.poly_id
        assert r.holes_xy == g.holes_xy, r.poly_id


def test_whitespace_variants_normalize(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "messy.tsv")
        with open(path, "w") as f:
            f.write("A\ta name\tPOLYGON ((0.0 0.0,4.0 0.0 ,4.0 4.0,  "
                    "0.0 4.0, 0.0 0.0))\n")
        rows = read_wkt(spark, path).collect()
    assert len(rows) == 1
    assert rows[0].ring_xy == [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0],
                               [0.0, 4.0]]
    assert rows[0].holes_xy == []


def test_covering_parity_with_native_loader(spark):
    """The interchange contract that matters downstream: the WKT
    round-trip of the full 12-polygon layer produces the exact same
    level-8 covering as the native loader."""
    from engine.geo.layer import PolygonLayer
    native = PolygonLayer.from_json()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "native.tsv")
        write_wkt(native, path)
        back = layer_from_wkt(path)
    want = {(c, pid, f) for c, pid, f in native.covering(8)}
    got = {(c, pid, f) for c, pid, f in back.covering(8)}
    assert got == want
