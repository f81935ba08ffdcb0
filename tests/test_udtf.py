"""K7 — Python UDTF surface (bbox -> covering tiles lateral expansion)."""

from pyspark.sql import functions as F

from engine.udtf_ops import BboxTiles, register_udtfs
from oracle.geo import lonlat_to_xy


def _ref_tiles(minlon, minlat, maxlon, maxlat, z):
    x0, y1 = lonlat_to_xy(minlon, minlat, level=z)
    x1, y0 = lonlat_to_xy(maxlon, maxlat, level=z)
    return {(x, y) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)}


def test_eval_matches_reference_and_orientation():
    got = set(BboxTiles.func().eval(-10.0, -10.0, 25.0, 15.0, 4))
    assert got == _ref_tiles(-10.0, -10.0, 25.0, 15.0, 4)
    # northern lat -> smaller tile_y (mercator y inverts); the box spans
    # the equator so both halves appear
    ys = {y for _, y in got}
    assert len(ys) >= 2 and min(ys) < 8 <= max(ys)


def test_lateral_sql_expansion(spark):
    register_udtfs(spark)
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.createDataFrame(
        [("A", -10.0, -10.0, 25.0, 15.0), ("B", 100.0, 40.0, 150.0, 70.0)],
        "box_id string, minlon double, minlat double, maxlon double, "
        "maxlat double").createOrReplaceTempView("tv_boxes")
    rows = spark.sql(
        "SELECT b.box_id, t.tile_x, t.tile_y FROM tv_boxes b, "
        "LATERAL bbox_tiles(b.minlon, b.minlat, b.maxlon, b.maxlat, 4) t"
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.box_id, set()).add((r.tile_x, r.tile_y))
    assert got["A"] == _ref_tiles(-10.0, -10.0, 25.0, 15.0, 4)
    assert got["B"] == _ref_tiles(100.0, 40.0, 150.0, 70.0, 4)


def test_single_tile_box():
    # a degenerate box inside one tile yields exactly that tile
    got = list(BboxTiles.func().eval(1.0, 1.0, 1.5, 1.5, 4))
    assert len(got) == 1
    assert got[0] == lonlat_to_xy(1.0, 1.5, level=4)
