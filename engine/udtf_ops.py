"""K7 — Python UDTF surface (the table-function half of the extension
mechanism, beside the K1–K6 scalar/grouped/cogrouped Arrow UDFs).

`BboxTiles` expands a bbox row into its covering slippy tiles at zoom z
— the lateral-join generator a tile server uses to turn a viewport into
fetchable tile keys.  Registered for SQL (`LATERAL bbox_tiles(...)`)
and usable from the DataFrame API via `lateralJoin`/`sql`.

Hot-path note (BASELINE.json:15 "no per-row Python"): a UDTF evaluates
per input ROW by contract — it belongs on the SMALL side of a lateral
join (viewports, query boxes: thousands of rows yielding bounded tile
fan-out), never on the fact table; the fact-table side of any
subsequent tile join stays native.  The session enables Arrow transfer
for UDTFs (spark.sql.execution.pythonUDTF.arrow.enabled) so batches
cross the boundary columnar.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from oracle.geo import lonlat_to_xy


@udtf(returnType="tile_x: bigint, tile_y: bigint")
class BboxTiles:
    """(minlon, minlat, maxlon, maxlat, z) -> one row per covering tile.

    Tile range = floor-grid coords of the corner points (the same
    mercator quantization as the cell index; note y INVERTS: maxlat is
    the smaller yi).  Inclusive of the tile containing each corner —
    identical floor arithmetic to the cell/tile kernels, so the DuckDB
    twin reproduces the expansion from the shared trig formula +
    generate_series."""

    def eval(self, minlon: float, minlat: float, maxlon: float,
             maxlat: float, z: int):
        x0, y1 = lonlat_to_xy(minlon, minlat, level=z)   # y inverts
        x1, y0 = lonlat_to_xy(maxlon, maxlat, level=z)
        for x in range(x0, x1 + 1):
            for y in range(y0, y1 + 1):
                yield (x, y)


def register_udtfs(spark) -> None:
    spark.udtf.register("bbox_tiles", BboxTiles)
