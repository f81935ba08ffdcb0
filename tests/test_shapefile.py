"""A-family — ESRI Shapefile interchange (engine/geo/shapefile.py):
cross-format parity with the GeoJSON reader, wire-format
well-formedness against the published spec constants, the multi-outer
record convention, and orientation re-normalization."""

from __future__ import annotations

import struct

import pytest

from engine.geo.geojson import layer_from_geojson, read_geojson
from engine.geo.shapefile import (_parse_record, _shoelace2, _shx_index,
                                  read_shapefile, write_shapefile)

FIXTURE = "/root/repo/oracle/layer12plus.geojson"


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    b = str(tmp_path_factory.mktemp("shp") / "layer")
    write_shapefile(layer_from_geojson(FIXTURE), b)
    return b


def _summary(df):
    return sorted(
        (r.poly_id, r.name, r.part_idx, len(r.ring_xy),
         len(r.holes_xy),
         tuple(sorted(map(tuple, r.ring_xy))))
        for r in df.collect())


def test_shapefile_matches_geojson_reader(spark, base):
    got = _summary(read_shapefile(spark, base))
    want = _summary(read_geojson(spark, FIXTURE))
    # vertex SETS per ring are format-independent; starting point and
    # direction are normalized away by the sort
    assert got == want and len(got) >= 13


def test_shapefile_header_constants(base):
    with open(base + ".shp", "rb") as f:
        head = f.read(100)
    assert struct.unpack_from(">i", head, 0)[0] == 9994
    assert struct.unpack_from("<i", head, 28)[0] == 1000
    assert struct.unpack_from("<i", head, 32)[0] == 5
    # declared file length (16-bit words) matches the actual size
    import os
    assert struct.unpack_from(">i", head, 24)[0] * 2 \
        == os.path.getsize(base + ".shp")


def test_shx_index_covers_every_record(base):
    import os
    idx = _shx_index(base + ".shx")
    assert idx[0][1] == 100  # first record right after the header
    end = idx[-1][1] + idx[-1][2]
    assert end == os.path.getsize(base + ".shp")
    # records tile the file with 8-byte headers, no gaps
    for (r1, o1, l1), (r2, o2, _) in zip(idx, idx[1:]):
        assert r2 == r1 + 1 and o2 == o1 + l1


def test_reader_normalizes_orientation(spark, base):
    for r in read_shapefile(spark, base).collect():
        assert _shoelace2(r.ring_xy) > 0          # engine outer: CCW
        for h in r.holes_xy:
            assert _shoelace2(h) < 0              # engine holes: CW


def test_multi_outer_record_convention():
    # hand-pack one record holding TWO outers (CW) where the first
    # carries one hole (CCW): the ESRI emission order a CW ring opens
    # a part, following CCW rings are its holes.
    sq = lambda x0, y0, s: [[x0, y0], [x0, y0 + s], [x0 + s, y0 + s],
                            [x0 + s, y0], [x0, y0]]       # CW closed
    hole = [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0],
            [1.0, 1.0]]                                   # CCW closed
    rings = [sq(0, 0, 4), hole, sq(10, 10, 3)]
    pts = [p for r in rings for p in r]
    starts, acc = [], 0
    for r in rings:
        starts.append(acc)
        acc += len(r)
    content = struct.pack("<i4d2i", 5, 0.0, 0.0, 13.0, 13.0,
                          len(rings), acc)
    content += struct.pack(f"<{len(rings)}i", *starts)
    content += struct.pack(f"<{2 * acc}d", *[c for p in pts for c in p])
    buf = struct.pack(">2i", 1, len(content) // 2) + content
    parts = _parse_record(buf)
    assert len(parts) == 2
    assert len(parts[0][1]) == 1 and len(parts[1][1]) == 0
    assert len(parts[0][0]) == 4 and len(parts[1][0]) == 4


def test_mismatched_sidecar_raises(spark, base, tmp_path):
    import shutil
    b2 = str(tmp_path / "bad")
    for ext in (".shp", ".shx", ".dbf"):
        shutil.copy(base + ext, b2 + ext)
    # truncate the .shx to half its records
    import os
    size = os.path.getsize(b2 + ".shx")
    n = (size - 100) // 8
    with open(b2 + ".shx", "r+b") as f:
        f.truncate(100 + 8 * (n // 2))
    with pytest.raises(ValueError, match="records"):
        read_shapefile(spark, b2)
