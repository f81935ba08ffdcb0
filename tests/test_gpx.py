"""A20 — GPX interchange (engine/geo/gpx.py): exact micro-degree
round-trip through XML text, document-order preservation, native
parse vs the written data, and degenerate tracks."""
from __future__ import annotations

from engine.geo.gpx import gpx_track_summary, read_gpx, write_gpx_tracks


def test_gpx_roundtrip_exact_and_order(spark, tmp_path):
    tracks = [
        ("alpha", [(-84999999, -179999999), (85000000, 179999999),
                   (0, 0), (123456, -654321)]),
        ("solo", [(42000000, -71000000)]),
    ]
    write_gpx_tracks(str(tmp_path), tracks)
    parsed = read_gpx(spark, f"{tmp_path}/*.gpx")
    rows = {r.track: r for r in parsed.collect()}
    # document order preserved, values exact after text round-trip
    a = rows["alpha"]
    assert a.n_pts == 4
    assert [round(v * 1e6) for v in a.lats] == [
        -84999999, 85000000, 0, 123456]
    assert [round(v * 1e6) for v in a.lons] == [
        -179999999, 179999999, 0, -654321]
    s = {r.track: r for r in gpx_track_summary(parsed).collect()}
    al = s["alpha"]
    assert (al.first_lat_u, al.first_lon_u) == (-84999999, -179999999)
    assert (al.last_lat_u, al.last_lon_u) == (123456, -654321)
    want_l1 = (abs(85000000 - -84999999) + abs(179999999 - -179999999)
               + abs(0 - 85000000) + abs(0 - 179999999)
               + abs(123456 - 0) + abs(-654321 - 0))
    assert al.l1_udeg == want_l1
    so = s["solo"]
    assert (so.n_pts, so.l1_udeg) == (1, 0)
    assert (so.first_lat_u, so.last_lat_u) == (42000000, 42000000)


def test_gpx_parse_is_distributed_per_file(spark, tmp_path):
    # many files -> many input splits; every track parses independently
    tracks = [(f"t{i}", [(i * 1000, -i * 1000), (i * 1000 + 7, 0)])
              for i in range(20)]
    write_gpx_tracks(str(tmp_path), tracks)
    parsed = read_gpx(spark, f"{tmp_path}/*.gpx")
    assert parsed.count() == 20
    got = {r.track: r.n_pts for r in parsed.collect()}
    assert got == {f"t{i}": 2 for i in range(20)}
