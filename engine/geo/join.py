"""D1/D2/D7 — the spatial containment join (SURVEY.md §2.D).

BASELINE.json:6,14 — geotagged rows are "joined to polygon layers with a
broadcast-or-partitioned hash join on cell prefix followed by an exact
Shapely/GEOS PIP refinement".

Plan shape (scale rationale, SURVEY.md §4):
  probe:  images -> native `shiftright` cell prefix (no UDF, codegen)
  build:  polygon covering exploded to (cell_p, poly_id, full) rows
  join:   BROADCAST when the covering is small (almost always — it is
          bounded by the planner's cell budget), else SHUFFLE_HASH with
          both sides repartitioned on cell_p; explicit hot-cell salting
          is layered on by engine/geo/skew.py.
  refine: exact PIP via mapInPandas; `full` covering cells bypass it.

The bytes column (image payload) must be pruned *before* this join —
callers select narrow columns; tests/test_plans.py asserts the scan's
ReadSchema excludes `bytes` for count-style pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import cell_parent_col, with_cell
from .layer import PolygonLayer
from .pip import refine, refine_arrow, refine_native, refine_scalar
from .skew import salted_equijoin

BROADCAST_MAX_BUILD_ROWS = 2_000_000  # ~2M (cell_p, poly_id) rows ≈ 50 MB


def candidates_join(
    probe: DataFrame,
    build: DataFrame,
    key: str = "cell_p",
    mode: str = "auto",
    hot_keys: list[int] | None = None,
    salt: int = 8,
    probe_salt_col: str = "image_id",
    build_rows: int | None = None,
) -> DataFrame:
    """Coarse equi-join on the cell prefix; broadcast / shuffle / salted."""
    if mode == "auto":
        n = build_rows if build_rows is not None else build.count()
        mode = "broadcast" if n <= BROADCAST_MAX_BUILD_ROWS else "shuffle"
    if hot_keys:
        # salted path (D4): only meaningful for the shuffle join — under a
        # broadcast there is no shuffle to skew, but we keep it exercisable.
        return salted_equijoin(probe, build, key=key, hot_keys=hot_keys,
                               salt=salt, probe_id_col=probe_salt_col,
                               broadcast_build=(mode == "broadcast"))
    if mode == "broadcast":
        return probe.join(F.broadcast(build), key, "inner")
    return (
        probe.repartition(key)
        .join(build.hint("SHUFFLE_HASH"), key, "inner")
    )


def spatial_join(
    images: DataFrame,
    layer: PolygonLayer,
    level: int,
    mode: str = "auto",
    hot_keys: list[int] | None = None,
    salt: int = 8,
    lat_col: str = "lat",
    lon_col: str = "lon",
    probe_salt_col: str = "image_id",
    refine_mode: str = "native",
) -> DataFrame:
    """images x layer containment join -> image rows + poly_id.

    `images` needs lat/lon; a `cell` column is reused if present, else
    encoded (native codegen expression).

    `refine_mode`: "native" (default since r2) expresses the exact PIP
    as an even-odd higher-order-function column over per-cell edge
    arrays — ZERO Python stages; "pandas" ships candidates through one
    Arrow batch to a vectorized numpy ray cast.  Both produce
    bit-identical verdicts (same IEEE arithmetic; asserted by
    tests/test_pip_native.py).  The default is measured, and
    scale-dependent: an early 64M-row local[8] run had the HOF form ~2x
    slower (HOFs are interpreted and disable codegen for their fused
    stage), but at 512M rows on the r2 protocol the native form is
    2.2-2.5x FASTER at both local[2] and local[8] (6.9M / 23.8M rows/s
    vs 3.1M / 9.4M) — eliminating the per-slot Python worker removes
    the second hardware thread each task occupies, which dominates once
    the scan is long enough to amortize compile cost.  It also scales
    at 0.867 N->4N (>= 0.8 target) where the pandas form is host-bound
    at ~0.75 (BASELINE.md).  Re-measure before changing this default.
    """
    df = images if "cell" in images.columns else with_cell(images, lat_col, lon_col)
    probe = df.withColumn("cell_p", cell_parent_col("cell", level))
    build = layer.build_df(df.sparkSession, level,
                           with_edges=(refine_mode == "native"))
    build_rows = build.count()  # driver-built covering: count is free-ish
    cands = candidates_join(
        probe, build, mode=mode, hot_keys=hot_keys, salt=salt,
        probe_salt_col=probe_salt_col, build_rows=build_rows,
    )
    if refine_mode == "native":
        return refine_native(cands, lon_col=lon_col, lat_col=lat_col)
    if refine_mode == "scalar":
        return refine_scalar(cands, layer.parts(), lon_col=lon_col,
                             lat_col=lat_col)
    if refine_mode == "arrow":
        return refine_arrow(cands, layer.parts(), lon_col=lon_col,
                            lat_col=lat_col)
    return refine(cands, layer.parts(), lon_col=lon_col, lat_col=lat_col)


def bbox_range_join(points: DataFrame, rects: DataFrame,
                    lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """D7 — non-equi bbox-overlap theta join (BNLJ).

    `rects` columns: minlon/minlat/maxlon/maxlat (+ id cols).  In the
    engine's hot path this is always *bounded* by a cell-prefix equi
    pre-join (candidates_join); the raw form exists for the operator
    inventory and for tiny dimension tables.
    """
    cond = (
        (points[lon_col] >= rects["minlon"]) & (points[lon_col] < rects["maxlon"])
        & (points[lat_col] >= rects["minlat"]) & (points[lat_col] < rects["maxlat"])
    )
    return points.join(F.broadcast(rects), cond, "inner")
