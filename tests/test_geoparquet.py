"""GeoParquet interchange (r5; engine/geo/geoparquet.py): WKB codec
exactness, `geo` file-metadata compliance, byte-identical round trip,
cross-format parity with the GeoJSON fixture, and Spark-native reader
parity with the driver-side parser.
"""
from __future__ import annotations

import json
import struct

import pytest

from engine.geo.geojson import layer_from_geojson, layer_to_geojson
from engine.geo.geoparquet import (
    decode_wkb, encode_wkb, layer_from_geoparquet, read_geo_metadata,
    read_geoparquet, write_geoparquet,
)

FIXTURE = "/root/repo/oracle/layer12plus.geojson"


def _fixture_layer():
    return layer_from_geojson(FIXTURE)


def _gp(tmp_path) -> str:
    path = str(tmp_path / "layer.parquet")
    write_geoparquet(_fixture_layer(), path)
    return path


# ------------------------------------------------------------- codec

SQUARE = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
HOLE = [[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]]
TRI = [[10.0, 10.0], [12.0, 10.0], [11.0, 12.0], [10.0, 10.0]]


def test_wkb_roundtrip_exact():
    for parts in ([[SQUARE]], [[SQUARE, HOLE]], [[SQUARE, HOLE], [TRI]]):
        assert decode_wkb(encode_wkb(parts)) == parts


def test_wkb_float_bits_survive():
    """Interchange must not lose bits: adversarial float64 values
    (subnormal-adjacent, negative zero is excluded by contract — rings
    carry coordinates, not payloads) round-trip bit-exact."""
    import math
    vals = [math.pi, -179.99999999999997, 1e-300, 2.0 ** -52, 123.456]
    ring = [[v, -v] for v in vals] + [[vals[0], -vals[0]]]
    (out,) = decode_wkb(encode_wkb([[ring]]))
    assert [struct.pack("<d", x) for xy in out[0] for x in xy] == \
           [struct.pack("<d", x) for xy in ring for x in xy]


def test_wkb_layout_is_iso():
    """Wire layout is standard ISO WKB little-endian — a third-party
    reader sees (byte_order=1, type=3, n_rings, n_points, xy...)."""
    buf = encode_wkb([[TRI]])
    bo, gtype, nrings, npts = struct.unpack_from("<BIII", buf, 0)
    assert (bo, gtype, nrings, npts) == (1, 3, 1, 4)
    assert struct.unpack_from("<2d", buf, 13) == (10.0, 10.0)
    mbuf = encode_wkb([[TRI], [SQUARE]])
    bo, gtype, nparts = struct.unpack_from("<BII", mbuf, 0)
    assert (bo, gtype, nparts) == (1, 6, 2)


def test_wkb_rejects_big_endian_and_trailing():
    buf = encode_wkb([[TRI]])
    with pytest.raises(ValueError):
        decode_wkb(b"\x00" + buf[1:])
    with pytest.raises(ValueError):
        decode_wkb(buf + b"\x00")
    with pytest.raises(ValueError):
        decode_wkb(struct.pack("<BI", 1, 2))  # LineString unsupported


# ---------------------------------------------------- file + metadata

def test_roundtrip_byte_identical(tmp_path):
    p1 = _gp(tmp_path)
    p2 = str(tmp_path / "again.parquet")
    write_geoparquet(layer_from_geoparquet(p1), p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_geo_metadata_spec(tmp_path):
    md = read_geo_metadata(_gp(tmp_path))
    assert md["version"] == "1.1.0"
    assert md["primary_column"] == "geometry"
    col = md["columns"]["geometry"]
    assert col["encoding"] == "WKB"
    assert set(col["geometry_types"]) <= {"Polygon", "MultiPolygon"}
    assert col["orientation"] == "counterclockwise"
    assert col["crs"] is None  # spec: null == OGC:CRS84 (lon/lat WGS84)
    x0, y0, x1, y1 = col["bbox"]
    assert -180.0 <= x0 <= x1 <= 180.0 and -90.0 <= y0 <= y1 <= 90.0


def test_plain_parquet_rejected(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    p = str(tmp_path / "plain.parquet")
    pq.write_table(pa.table({"a": [1]}), p)
    with pytest.raises(ValueError, match="geo"):
        layer_from_geoparquet(p)


def test_duckdb_sees_geo_metadata(tmp_path):
    """The `geo` key is FILE metadata, not a private schema hint — an
    independent engine (DuckDB parquet_kv_metadata) reads it back."""
    import duckdb
    p = _gp(tmp_path)
    rows = duckdb.sql(
        f"SELECT key, value FROM parquet_kv_metadata('{p}')").fetchall()
    kv = {bytes(k).decode(): bytes(v) for k, v in rows}
    assert json.loads(kv["geo"]) == read_geo_metadata(p)


# ------------------------------------------------- cross-format parity

def test_geojson_cross_format_parity(tmp_path):
    """GeoJSON -> layer -> GeoParquet -> layer emits the identical
    FeatureCollection: the two interchange forms agree feature-for-
    feature (grouping, part order, ring orientation, exact floats)."""
    lay2 = layer_from_geoparquet(_gp(tmp_path))
    a = json.dumps(layer_to_geojson(_fixture_layer()), sort_keys=True)
    b = json.dumps(layer_to_geojson(lay2), sort_keys=True)
    assert a == b


def test_covering_parity(tmp_path):
    """The containment-join build side is identical whichever
    interchange format loaded the layer."""
    lay_a, lay_b = _fixture_layer(), layer_from_geoparquet(_gp(tmp_path))
    assert sorted(lay_a.covering(7)) == sorted(lay_b.covering(7))


# ------------------------------------------------------- Spark reader

def test_spark_reader_matches_driver_parser(spark, tmp_path):
    p = _gp(tmp_path)
    rows = sorted(
        read_geoparquet(spark, p).collect(),
        key=lambda r: (r.poly_id, r.part_idx))
    fc = json.load(open(FIXTURE))
    exp = []
    for f in fc["features"]:
        g, pid = f["geometry"], f["properties"]["poly_id"]
        parts = ([g["coordinates"]] if g["type"] == "Polygon"
                 else g["coordinates"])
        for i, rings in enumerate(parts):
            unclose = [r[:-1] if r[0] == r[-1] else r for r in rings]
            exp.append((pid, i, unclose[0], unclose[1:]))
    exp.sort(key=lambda t: (t[0], t[1]))
    assert len(rows) == len(exp)
    for r, (pid, idx, ring, holes) in zip(rows, exp):
        assert (r.poly_id, r.part_idx) == (pid, idx)
        assert [list(v) for v in r.ring_xy] == ring
        assert [[list(v) for v in h] for h in r.holes_xy] == holes


def test_spark_reader_prunes_to_three_columns(spark, tmp_path):
    """The parquet scan under the decode stage reads exactly
    (poly_id, name, geometry) — extra columns never reach Arrow."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    p = _gp(tmp_path)
    t = pq.read_table(p)
    t = t.append_column("junk", pa.array([b"x" * 1024] * t.num_rows))
    t = t.replace_schema_metadata(pq.read_schema(p).metadata)
    p2 = str(tmp_path / "wide.parquet")
    pq.write_table(t, p2, compression="snappy")
    df = read_geoparquet(spark, p2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "junk" not in plan.split("ReadSchema")[-1]
    assert df.count() == 15
