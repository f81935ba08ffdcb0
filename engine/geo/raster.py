"""Raster <-> vector bridge (north_star: "raster<->vector tiling assigns
each decoded image to slippy-map/H3 tiles"): per-tile occupancy rasters.

Vector points -> tile + in-tile pixel assignment stays NATIVE (bit
arithmetic on the level-30 mercator grid ints — codegen, no Python).
Two emission paths:

- `rasterize_tiles` (stats): the raster's order-free scalar signature
  (n_points / nnz / max / index-weighted sums) computed ENTIRELY with
  native aggregation — zero Python. This is the at-scale shape: one
  map-side-combined shuffle on (tile, pixel), one tiny regroup to tile.
  (A first cut built each tile's grid in a per-group applyInPandas and
  spent ~1.7 ms of Python overhead per group — 7 of 9 seconds at a mere
  4096 tiles. Measured, removed: stats never needed the array.)
- `rasterize_tile_grids` (arrays): when the caller needs the actual
  grid (e.g. rendering PNG tiles), pixels are collected per tile and
  ONE Arrow-batched pandas UDF builds all grids in a batch — thousands
  of tiles per Python call instead of one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from engine.ckpt import materialize
from engine.geo.cells import LEVEL, merc_xy_sql


def with_tile_pixel(df: DataFrame, z: int, grid_bits: int = 4,
                    lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Native tile + in-tile pixel columns: tile = top z bits of the
    level-30 grid ints, pixel = the next `grid_bits` bits."""
    assert z + grid_bits <= LEVEL
    xi, yi = merc_xy_sql(lon, lat)
    shift_t = LEVEL - z
    shift_p = LEVEL - z - grid_bits
    mask = (1 << grid_bits) - 1
    return (
        df.withColumn("_xi", F.expr(xi)).withColumn("_yi", F.expr(yi))
        .withColumn("tile_x", F.expr(f"_xi >> {shift_t}"))
        .withColumn("tile_y", F.expr(f"_yi >> {shift_t}"))
        .withColumn("px", F.expr(f"(_xi >> {shift_p}) & {mask}").cast("int"))
        .withColumn("py", F.expr(f"(_yi >> {shift_p}) & {mask}").cast("int"))
        .drop("_xi", "_yi")
    )


def _pixel_counts(df: DataFrame, z: int, grid_bits: int,
                  lat: str, lon: str) -> DataFrame:
    """(tile_x, tile_y, pix, w): map-side-combined counts per in-tile
    pixel — a hot tile ships at most grid^2 rows through the shuffle
    regardless of its point count (the same skew bound salting gives
    the containment join)."""
    grid = 1 << grid_bits
    return (
        with_tile_pixel(df, z, grid_bits, lat, lon)
        .withColumn("pix", (F.col("py") * grid + F.col("px")).cast("long"))
        .groupBy("tile_x", "tile_y", "pix")
        .agg(F.count("*").alias("w"))
    )


def rasterize_tiles(df: DataFrame, z: int = 6, grid_bits: int = 4,
                    lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Per-tile occupancy-raster signature, fully native (see module
    docstring): n_points / nnz / max_count and the index-weighted sums
    wsum = Σ w·(pix+1), sqsum = Σ w² — order-free, so a SQL twin can
    hash-check them exactly."""
    return (
        _pixel_counts(df, z, grid_bits, lat, lon)
        .groupBy("tile_x", "tile_y")
        .agg(F.sum("w").alias("n_points"),
             F.count("*").cast("int").alias("nnz"),
             F.max("w").alias("max_count"),
             F.sum(F.col("w") * (F.col("pix") + 1)).alias("wsum"),
             F.sum(F.col("w") * F.col("w")).alias("sqsum"))
        .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                "n_points", "nnz", "max_count", "wsum", "sqsum")
    )


def tile_counts(df: DataFrame, z: int,
                lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Per-tile point counts at zoom z — the sparse count raster.  One
    map-side-combined hash agg on native int tile coords (the only
    shuffle that sees the full table; ≤ 4^z output rows)."""
    xi, yi = merc_xy_sql(lon, lat)
    sh = LEVEL - z
    return (
        df.withColumn("_xi", F.expr(xi)).withColumn("_yi", F.expr(yi))
        .select(F.expr(f"_xi >> {sh}").alias("tile_x"),
                F.expr(f"_yi >> {sh}").alias("tile_y"))
        .groupBy("tile_x", "tile_y").agg(F.count("*").alias("n"))
    )


def focal_sum(df: DataFrame, z: int = 6, radius: int = 1,
              lat: str = "lat", lon: str = "lon",
              checkpoint: bool = True) -> DataFrame:
    """Raster focal (neighborhood) aggregation — classic map-algebra
    "focal sum": for every occupied tile, the total point count over the
    (2r+1)² tile window centered on it.  Tile space is cyclic in x
    (slippy tiles wrap at the antimeridian: neighbor x is taken mod 2^z)
    and clipped in y (no wrap past the poles).

    Scale shape: the full table is touched ONCE (the `tile_counts` hash
    agg, map-side combined).  The sparse raster (≤ 4^z rows) is
    localCheckpoint'ed so it is not recomputed for its two uses, then
    each tile row explodes its (2r+1)² native offset structs and one
    skinny groupBy sums contributions per neighbor coordinate; the final
    inner join back to the occupied set (AQE will broadcast it) keeps
    the output domain = occupied tiles, so windows over empty tiles are
    never materialized.  Everything is integer bit/add arithmetic in
    whole-stage codegen — zero Python stages.

    Output: (tile_z:int, tile_x, tile_y, n, focal_n).
    """
    n_tiles = 1 << z
    base = tile_counts(df, z, lat, lon)
    if checkpoint:
        base = base.localCheckpoint(eager=False)
    offs = F.array(*[
        F.struct(F.lit(dx).cast("long").alias("dx"),
                 F.lit(dy).cast("long").alias("dy"))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)])
    contrib = (
        base.select("tile_x", "tile_y", "n", F.explode(offs).alias("o"))
        .select(F.pmod(F.col("tile_x") + F.col("o.dx"),
                       F.lit(n_tiles)).alias("tile_x"),
                (F.col("tile_y") + F.col("o.dy")).alias("tile_y"), "n")
    )
    sums = contrib.groupBy("tile_x", "tile_y") \
        .agg(F.sum("n").alias("focal_n"))
    return (
        base.join(sums, ["tile_x", "tile_y"], "inner")
        .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                "n", "focal_n")
    )


def kde_tiles(df: DataFrame, z: int = 6, radius: int = 2,
              lat: str = "lat", lon: str = "lon",
              checkpoint: bool = True) -> DataFrame:
    """Integer-kernel KDE heatmap (C3p): focal_sum's weighted
    sibling — every occupied tile's density is the kernel-weighted sum
    of point counts over the (2r+1)^2 window, with the separable
    TRIANGLE kernel w(dx,dy) = (r+1-|dx|)*(r+1-|dy|) (the discrete
    tent/Bartlett kernel: integer weights, so the whole heatmap stays
    in the exact BIGINT domain and the DuckDB twin — same offsets, same
    weights, generated per-level — is an exact oracle; a float Gaussian
    would land in the cross-libm tie class the r3 hardening banned).

    Scale shape is focal_sum's: ONE full-table map-side-combined hash
    agg, then the sparse raster (<= 4^z rows) explodes (2r+1)^2 weighted
    offset structs and one skinny groupBy sums w*n per neighbor; x wraps
    cyclically at the antimeridian, y is clipped.  Zero Python stages.

    Output: (tile_z:int, tile_x, tile_y, n, kde).
    """
    n_tiles = 1 << z
    base = tile_counts(df, z, lat, lon)
    if checkpoint:
        base = base.localCheckpoint(eager=False)
    offs = F.array(*[
        F.struct(F.lit(dx).cast("long").alias("dx"),
                 F.lit(dy).cast("long").alias("dy"),
                 F.lit((radius + 1 - abs(dx)) * (radius + 1 - abs(dy)))
                 .cast("long").alias("w"))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)])
    contrib = (
        base.select("tile_x", "tile_y", "n", F.explode(offs).alias("o"))
        .select(F.pmod(F.col("tile_x") + F.col("o.dx"),
                       F.lit(n_tiles)).alias("tile_x"),
                (F.col("tile_y") + F.col("o.dy")).alias("tile_y"),
                (F.col("n") * F.col("o.w")).alias("wn"))
    )
    sums = contrib.groupBy("tile_x", "tile_y") \
        .agg(F.sum("wn").alias("kde"))
    return (
        base.join(sums, ["tile_x", "tile_y"], "inner")
        .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                "n", "kde")
    )


def edge_tiles(df: DataFrame, z: int = 6, lat: str = "lat",
               lon: str = "lon", checkpoint: bool = True) -> DataFrame:
    """Raster edge/boundary extraction — the vectorize-a-raster
    primitive: an occupied tile is an EDGE tile iff at least one of its
    4-neighbors (von Neumann: x cyclic mod 2^z, y clipped at the poles
    — out-of-range neighbors count as unoccupied) is unoccupied.  The
    edge set is the boundary ring of the occupancy raster, the input to
    contour tracing / polygonization.

    Scale shape (same skeleton as focal_sum): the full table is touched
    once by the map-side-combined tile_counts agg; the sparse raster is
    checkpointed, each occupied tile sends 4 native offset
    contributions, one skinny regroup counts occupied neighbors per
    tile, and the inner join back to the occupied set bounds the output
    domain.  Integer end to end, zero Python.

    Output: (tile_z, tile_x, tile_y, n, occ_nbrs, is_edge:int)."""
    n_tiles = 1 << z
    base = tile_counts(df, z, lat, lon)
    if checkpoint:
        base = base.localCheckpoint(eager=False)
    offs = F.array(*[
        F.struct(F.lit(dx).cast("long").alias("dx"),
                 F.lit(dy).cast("long").alias("dy"))
        for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1))])
    contrib = (
        base.select("tile_x", "tile_y", F.explode(offs).alias("o"))
        .select(F.pmod(F.col("tile_x") + F.col("o.dx"),
                       F.lit(n_tiles)).alias("tile_x"),
                (F.col("tile_y") + F.col("o.dy")).alias("tile_y"))
    )
    nbrs = contrib.groupBy("tile_x", "tile_y") \
        .agg(F.count("*").alias("_occ"))
    # LEFT join: an isolated tile (zero occupied neighbors) receives no
    # contribution row at all — it is maximally edge, not absent
    return (
        base.join(nbrs, ["tile_x", "tile_y"], "left")
        .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                "n", F.coalesce(F.col("_occ"), F.lit(0)).alias("occ_nbrs"))
        .withColumn("is_edge", (F.col("occ_nbrs") < 4).cast("int"))
    )


def morph_tiles(df: DataFrame, z: int = 6, radius: int = 1,
                lat: str = "lat", lon: str = "lon",
                checkpoint: bool = True) -> DataFrame:
    """Raster morphology (late r4) — binary DILATION and EROSION of the
    occupancy raster in one pass, completing the map-algebra family
    (focal_sum, edge_tiles): the output domain is the DILATED set
    (every tile within Chebyshev distance <= radius of an occupied
    tile, x cyclic mod 2^z, y clipped at the poles — off-raster
    neighbors count as unoccupied), and a tile is ERODED iff it is
    occupied and its full (2r+1)^2 window is occupied (pole-adjacent
    tiles can never erode, by the unoccupied-outside convention).
    Opening/closing compose from these.

    Scale shape (the edge_tiles skeleton): full table touched once by
    the map-side-combined tile_counts agg; the sparse raster (<= 4^z
    rows, checkpointed) explodes (2r+1)^2 native offset structs; one
    skinny regroup counts occupied tiles per window; a LEFT join back
    to the occupied set classifies each emitted tile.  Integer codegen
    end to end, zero Python.

    Output: (tile_z, tile_x, tile_y, occupied:int, n, occ_window,
    is_eroded:int)."""
    n_tiles = 1 << z
    full = (2 * radius + 1) ** 2
    base = tile_counts(df, z, lat, lon)
    if checkpoint:
        base = base.localCheckpoint(eager=False)
    offs = F.array(*[
        F.struct(F.lit(dx).cast("long").alias("dx"),
                 F.lit(dy).cast("long").alias("dy"))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)])
    contrib = (
        base.select("tile_x", "tile_y", F.explode(offs).alias("o"))
        .select(F.pmod(F.col("tile_x") + F.col("o.dx"),
                       F.lit(n_tiles)).alias("tile_x"),
                (F.col("tile_y") + F.col("o.dy")).alias("tile_y"))
        .filter((F.col("tile_y") >= 0) & (F.col("tile_y") < n_tiles))
    )
    win = contrib.groupBy("tile_x", "tile_y") \
        .agg(F.count("*").alias("occ_window"))
    return (
        win.join(base, ["tile_x", "tile_y"], "left")
        .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                F.col("n").isNotNull().cast("int").alias("occupied"),
                F.coalesce(F.col("n"), F.lit(0)).alias("n"),
                "occ_window",
                (F.col("n").isNotNull()
                 & (F.col("occ_window") == full)).cast("int").alias("is_eroded"))
    )


def rasterize_tile_grids(df: DataFrame, z: int = 6, grid_bits: int = 4,
                         lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Materialized per-tile grids: (tile_z, tile_x, tile_y,
    grid array<long> of length grid^2, row-major).  Pixel counts are
    collected per tile natively, then one Arrow-batched scalar pandas
    UDF scatters them into dense grids — thousands of tiles per Python
    invocation, not one (the per-group applyInPandas overhead measured
    in the module docstring)."""
    grid = 1 << grid_bits
    cells = grid * grid

    @F.pandas_udf(ArrayType(LongType()))
    def scatter(pairs: pd.Series) -> pd.Series:
        out = []
        for lst in pairs:
            g = np.zeros(cells, np.int64)
            for item in lst:
                g[item["pix"]] = item["w"]
            out.append(g)
        return pd.Series(out)

    counted = _pixel_counts(df, z, grid_bits, lat, lon)
    return (
        counted.groupBy("tile_x", "tile_y")
        .agg(F.collect_list(F.struct("pix", "w")).alias("pw"))
        .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                scatter(F.col("pw")).alias("grid"))
    )


def integral_image(df: DataFrame, z: int = 6, grid_bits: int = 4,
                   lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Summed-area table (integral image, late r4) of each tile's
    occupancy raster: sat(px, py) = Σ w over in-tile pixels with
    px' <= px AND py' <= py — the vision primitive that answers any
    box-count query in O(1) by inclusion-exclusion (see
    tests/test_integral.py::test_box_query_identity).

    Scale shape: the full table is touched ONCE by the map-side-combined
    `_pixel_counts` agg (a hot tile ships ≤ grid² rows).  The SAT is
    inherently dense, so the sparse counts are densified to exactly
    grid² rows per OCCUPIED tile (sequence-explode, native) — the
    intermediate is bounded by 4^z·grid², independent of input rows —
    then two window cumsums (along px within each (tile, py) row, then
    along py within each (tile, px) column) complete the SAT.  The
    emitted rows are joined back to the occupied pixels so the OUTPUT
    stays sparse.  Integer codegen end to end, zero Python.

    Output: (tile_z, tile_x, tile_y, px, py, w, sat)."""
    from pyspark.sql import Window

    grid = 1 << grid_bits
    pix = (_pixel_counts(df, z, grid_bits, lat, lon)
           .select("tile_x", "tile_y",
                   F.pmod("pix", F.lit(grid)).cast("int").alias("px"),
                   (F.col("pix") / grid).cast("int").alias("py"),
                   "w"))
    dense = (pix.select("tile_x", "tile_y").distinct()
             .select("tile_x", "tile_y",
                     F.explode(F.sequence(F.lit(0), F.lit(grid - 1)))
                     .alias("py"))
             .select("tile_x", "tile_y", "py",
                     F.explode(F.sequence(F.lit(0), F.lit(grid - 1)))
                     .alias("px"))
             .join(pix, ["tile_x", "tile_y", "px", "py"], "left")
             .select("tile_x", "tile_y", "px", "py",
                     F.coalesce("w", F.lit(0)).alias("w")))
    row_w = Window.partitionBy("tile_x", "tile_y", "py").orderBy("px") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    col_w = Window.partitionBy("tile_x", "tile_y", "px").orderBy("py") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sat = (dense.withColumn("_row_cum", F.sum("w").over(row_w))
           .withColumn("sat", F.sum("_row_cum").over(col_w)))
    return (sat.join(pix.select("tile_x", "tile_y", "px", "py"),
                     ["tile_x", "tile_y", "px", "py"], "inner")
            .select(F.lit(z).cast("int").alias("tile_z"),
                    "tile_x", "tile_y", "px", "py", "w", "sat"))


def moran_scaled(pixels: DataFrame, x: str = "gx", y: str = "gy",
                 w: str = "w") -> DataFrame:
    """Global Moran's I spatial-autocorrelation components over a sparse
    integer raster, in the EXACT n-scaled integer domain (r4 cont.).

    Input: one row per occupied cell (x, y, w) with integer value w;
    adjacency is rook (4-neighborhood) BETWEEN OCCUPIED CELLS (the only
    globally computable convention on a sparse raster — absent cells are
    "no observation", not zero; documented contract).

    Moran's I = (n/W) · Σ_{i~j} (w_i − w̄)(w_j − w̄) / Σ_i (w_i − w̄)²
    with w̄ = S/n rational.  Multiplying each centered value by n gives
    c_i = n·w_i − S, an int64, and I = (n/W) · num/den with
    num = Σ_{i~j} c_i c_j (directed), den = Σ c_i² — both exact BIGINTs
    (the n² scale cancels in the ratio).  Emits one row
    (n, s_w, w_directed, num_scaled, den_scaled); I is a trivial
    driver-side division, kept out of the output to stay float-free.

    Exactness bound: |c_i| ≤ n·max_w, so num terms ≤ (n·max_w)²; exact
    while n·max_w < ~3·10⁹ (int64).  Beyond that, pre-aggregate to a
    coarser grid or switch the centered products to DOUBLE (documented,
    not silently done).

    Scale shape: the input table is assumed already cell-aggregated
    (one map-side-combined shuffle upstream, e.g. _pixel_counts).  The
    stats row is a tiny broadcast; the two neighbor equi-joins shuffle
    only skinny (x, y, c) rows hash-partitioned on cell coords — no
    all-pairs, no window over the globe.  At 10^12 points the cell
    table is bounded by the grid (4^level), not the row count."""
    st = pixels.agg(F.count("*").cast("long").alias("_n"),
                    F.sum(F.col(w).cast("long")).alias("_s"))
    cent = (pixels.crossJoin(F.broadcast(st))
            .select(F.col(x).alias("cx"), F.col(y).alias("cy"),
                    (F.col("_n") * F.col(w).cast("long") - F.col("_s"))
                    .alias("c"), "_n", "_s"))
    a = cent.select(F.col("cx"), F.col("cy"), F.col("c").alias("ca"))
    b = cent.select(F.col("cx").alias("bx"), F.col("cy").alias("by"),
                    F.col("c").alias("cb"))
    right = a.join(b, (a.cx + 1 == b.bx) & (a.cy == b.by))
    down = a.join(b, (a.cx == b.bx) & (a.cy + 1 == b.by))
    und = right.unionByName(down)
    num_half = und.agg(
        F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias("nh"),
        F.count("*").cast("long").alias("ne"))
    den = cent.agg(F.sum(F.col("c") * F.col("c")).alias("d"),
                   F.first("_n").alias("n"), F.first("_s").alias("s_w"))
    return (den.crossJoin(num_half)
            .select(F.col("n"), F.col("s_w"),
                    (F.lit(2) * F.col("ne")).alias("w_directed"),
                    (F.lit(2) * F.col("nh")).alias("num_scaled"),
                    F.col("d").alias("den_scaled")))


def geary_scaled(pixels: DataFrame, x: str = "gx", y: str = "gy",
                 w: str = "w") -> DataFrame:
    """Global Geary's C spatial-autocorrelation components over a sparse
    integer raster, exact-integer domain (r4 cont.) — the local-contrast
    complement of `moran_scaled` (same rook-between-occupied-cells
    adjacency convention; C reacts to squared neighbour DIFFERENCES
    where I reacts to centered products, so the two disagree exactly on
    high-frequency structure).

        C = (n-1) · Σ_{i~j} (w_i − w_j)² / (2W · Σ_i (w_i − w̄)²)

    Differences need no mean-centering, so the numerator Σ (w_i−w_j)²
    is a plain BIGINT; the denominator reuses moran's n-scaled identity
    Σ(w_i − w̄)² = den_scaled / n² with den_scaled = Σ(n·w_i − S)².
    Emits ONE row (n, s_w, w_directed, num_diff, den_scaled);
    C = (n−1)·n²·num_diff / (2·w_directed·den_scaled) is a trivial
    driver-side division, kept off the wire to stay float-free.

    Exactness bound: identical to moran_scaled (|n·w_i − S| ≤ n·max_w).

    Scale shape: same as moran — the input is already cell-aggregated,
    one tiny broadcast stats row, two skinny neighbor equi-joins hash-
    partitioned on cell coords; cell table bounded by the grid, never
    the point count."""
    st = pixels.agg(F.count("*").cast("long").alias("_n"),
                    F.sum(F.col(w).cast("long")).alias("_s"))
    cent = (pixels.crossJoin(F.broadcast(st))
            .select(F.col(x).alias("cx"), F.col(y).alias("cy"),
                    F.col(w).cast("long").alias("v"),
                    (F.col("_n") * F.col(w).cast("long") - F.col("_s"))
                    .alias("c"), "_n", "_s"))
    a = cent.select("cx", "cy", F.col("v").alias("va"))
    b = cent.select(F.col("cx").alias("bx"), F.col("cy").alias("by"),
                    F.col("v").alias("vb"))
    right = a.join(b, (a.cx + 1 == b.bx) & (a.cy == b.by))
    down = a.join(b, (a.cx == b.bx) & (a.cy + 1 == b.by))
    und = right.unionByName(down)
    num_half = und.agg(
        F.coalesce(F.sum((F.col("va") - F.col("vb"))
                         * (F.col("va") - F.col("vb"))), F.lit(0))
        .alias("nh"),
        F.count("*").cast("long").alias("ne"))
    den = cent.agg(F.sum(F.col("c") * F.col("c")).alias("d"),
                   F.first("_n").alias("n"), F.first("_s").alias("s_w"))
    return (den.crossJoin(num_half)
            .select(F.col("n"), F.col("s_w"),
                    (F.lit(2) * F.col("ne")).alias("w_directed"),
                    (F.lit(2) * F.col("nh")).alias("num_diff"),
                    F.col("d").alias("den_scaled")))


def gi_star_scaled(pixels: DataFrame, x: str = "gx", y: str = "gy",
                   w: str = "w") -> DataFrame:
    """C-family (r4 cont.) — Getis-Ord Gi* hot-spot components per
    occupied cell, in the moran_scaled exact-integer surface: with
    binary 8-neighborhood-plus-self weights over the OCCUPIED cells
    (the sparse-raster study set, matching moran_scaled's convention),

        Gi*_i = A_i / sqrt(B_i / (n-1)),
        A_i   = n * focal_i - k_i * s          (numerator, n-scaled)
        B_i   = (n*ss - s^2) * (n*k_i - k_i^2)

    -> (gx, gy, x, k, focal, a_num, b_den, hot) — all BIGINT, no
    floats on the wire (the tile_raster r2 lesson).  `hot` is the
    exact-integer z = +-2 classification: +1 / -1 when
    A^2*(n-1) > 4*B with the matching sign, else 0 — committed as
    z^2 = 4 so the comparison stays in int64 at every driver sf.

    Scale shape: one tiny broadcast stats row; the focal sum is an
    explode of the 9 neighbor offsets + ONE hash equi-join on cell
    coords (never a theta-join); everything downstream is per-cell
    arithmetic.  Cell table is bounded by the grid, not the rows."""
    st = pixels.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum(F.col(w).cast("long")).alias("_s"),
        F.sum(F.col(w).cast("long") * F.col(w).cast("long")).alias("_ss"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    # every cell volunteers its value to its 9 neighborhood centers
    give = (pixels.select(
        F.col(x).alias("_sx"), F.col(y).alias("_sy"),
        F.col(w).cast("long").alias("_wv"),
        F.explode(offs).alias("_o"))
        .select((F.col("_sx") + F.col("_o.dx")).alias("cx"),
                (F.col("_sy") + F.col("_o.dy")).alias("cy"), "_wv"))
    base = pixels.select(F.col(x).alias("cx"), F.col(y).alias("cy"),
                         F.col(w).cast("long").alias("_x"))
    foc = (base.join(give, ["cx", "cy"])
           .groupBy("cx", "cy")
           .agg(F.first("_x").alias("_x"),
                F.count("*").cast("long").alias("k"),
                F.sum("_wv").alias("focal")))
    out = (foc.crossJoin(F.broadcast(st))
           .select(
               F.col("cx").alias(x), F.col("cy").alias(y),
               F.col("_x").alias("x"), F.col("k"), F.col("focal"),
               (F.col("_n") * F.col("focal") - F.col("k") * F.col("_s"))
               .alias("a_num"),
               ((F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s"))
                * (F.col("_n") * F.col("k") - F.col("k") * F.col("k")))
               .alias("b_den"),
               F.col("_n").alias("_n")))
    zcmp = (out["a_num"] * out["a_num"] * (F.col("_n") - 1)
            > F.lit(4) * F.col("b_den"))
    return (out.withColumn(
        "hot",
        F.when(zcmp & (F.col("a_num") > 0), 1)
        .when(zcmp & (F.col("a_num") < 0), -1)
        .otherwise(0).cast("int"))
        .drop("_n"))


def flow_dir_d8(pixels: DataFrame, x: str = "gx", y: str = "gy",
                w: str = "w") -> DataFrame:
    """D8 steepest-descent flow direction per occupied cell, exact
    integer domain (r4 cont.) — the hydrology-class raster operator
    (ESRI flow-direction family) over the sparse-raster convention of
    moran/gi*/proximity (absent cells are "no observation": only
    occupied 8-neighbors compete; a cell with no positive drop gets
    dir = -1, the sink/flat marker).

    Direction codes 0..7 CCW from east (0=E, 1=NE, 2=N, 3=NW, 4=W,
    5=SW, 6=S, 7=SE).  D8 picks argmax drop/distance with distance 1
    (cardinal) or √2 (diagonal); for positive drops that ordering is
    EXACTLY the ordering of score = drop² · (2/d²) ∈ int64 — 2·drop²
    cardinal, drop² diagonal — so the argmax is float-free.  Ties break
    to the LOWEST direction code (documented, mirrorable).  Emits
    (gx, gy, dir, score).

    Scale shape: one 8-offset explode + ONE hash equi-join on cell
    coords (the gi_star focal shape), one map-side-combined argmax agg
    via the min-struct idiom.  Cell table bounded by the grid."""
    dirs = [(0, 1, 0), (1, 1, 1), (2, 0, 1), (3, -1, 1),
            (4, -1, 0), (5, -1, -1), (6, 0, -1), (7, 1, -1)]
    off = F.array(*[
        F.struct(F.lit(d).alias("d"), F.lit(dx).alias("dx"),
                 F.lit(dy).alias("dy"),
                 F.lit(2 if dx == 0 or dy == 0 else 1).alias("m"))
        for d, dx, dy in dirs])
    base = pixels.select(F.col(x).cast("long").alias("cx"),
                         F.col(y).cast("long").alias("cy"),
                         F.col(w).cast("long").alias("cw"))
    cand = (base.select("cx", "cy", "cw", F.explode(off).alias("o"))
            .select("cx", "cy", "cw", F.col("o.d").alias("d"),
                    (F.col("cx") + F.col("o.dx")).alias("nx"),
                    (F.col("cy") + F.col("o.dy")).alias("ny"),
                    F.col("o.m").alias("m")))
    nbr = base.select(F.col("cx").alias("nx"), F.col("cy").alias("ny"),
                      F.col("cw").alias("nw"))
    scored = (cand.join(nbr, ["nx", "ny"])
              .filter(F.col("cw") > F.col("nw"))
              .select("cx", "cy", F.col("d"),
                      ((F.col("cw") - F.col("nw"))
                       * (F.col("cw") - F.col("nw"))
                       * F.col("m")).alias("score")))
    best = (scored.groupBy("cx", "cy")
            .agg(F.min(F.struct((F.lit(0) - F.col("score")).alias("ns"),
                                F.col("d").alias("d"))).alias("b"))
            .select("cx", "cy", F.col("b.d").alias("dir"),
                    (F.lit(0) - F.col("b.ns")).alias("score")))
    return (base.join(best, ["cx", "cy"], "left")
            .select(F.col("cx").alias(x), F.col("cy").alias(y),
                    F.coalesce("dir", F.lit(-1)).cast("int").alias("dir"),
                    F.coalesce("score", F.lit(0)).alias("score")))


def flow_accumulation(pixels: DataFrame, x: str = "gx", y: str = "gy",
                      w: str = "w", max_rounds: int = 64,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """D8 flow accumulation per occupied cell (r4 cont.) — the classic
    companion of `flow_dir_d8`: acc(c) = number of cells (including c
    itself) whose D8 flow path passes through c.

    Termination is a THEOREM, not a hope: every D8 step goes strictly
    downhill in w, so the flow graph is acyclic and path length is
    bounded by the number of distinct descending w values — on count
    rasters that is max(w) hops.  The engine walks every origin's path
    simultaneously (frontier = (origin, at) pairs, one hash equi-join
    per hop, sinks drop out) and asserts the frontier empties within
    `max_rounds` (raises loudly otherwise); the DuckDB twin is the same
    walk as a genuinely recursive CTE — the acyclicity theorem is what
    licenses unbounded recursion there.

    Scale shape: per round one skinny equi-join on cell coords; total
    shuffled rows O(n · max path length).  On DEM-like inputs path
    length is the pour-path length; pre-break long paths by basin
    partitioning if a real DEM needs it (documented, not silently
    done)."""
    flow = flow_dir_d8(pixels, x, y, w)
    dirs = {0: (1, 0), 1: (1, 1), 2: (0, 1), 3: (-1, 1),
            4: (-1, 0), 5: (-1, -1), 6: (0, -1), 7: (1, -1)}
    dx = F.element_at(F.array(*[F.lit(dirs[d][0]) for d in range(8)]),
                      F.col("dir") + 1)
    dy = F.element_at(F.array(*[F.lit(dirs[d][1]) for d in range(8)]),
                      F.col("dir") + 1)
    edges = (flow.filter(F.col("dir") >= 0)
             .select(F.col(x).alias("fx"), F.col(y).alias("fy"),
                     (F.col(x) + dx).alias("tx"),
                     (F.col(y) + dy).alias("ty")))
    edges = materialize(edges, eager=False, checkpoint_dir=checkpoint_dir)
    frontier = pixels.select(F.col(x).alias("ox"), F.col(y).alias("oy"),
                             F.col(x).alias("ax"), F.col(y).alias("ay"))
    visits = frontier
    for _ in range(max_rounds):
        frontier = (frontier
                    .join(edges, (F.col("ax") == F.col("fx"))
                          & (F.col("ay") == F.col("fy")))
                    .select("ox", "oy", F.col("tx").alias("ax"),
                            F.col("ty").alias("ay")))
        frontier = materialize(frontier, eager=False,
                               checkpoint_dir=checkpoint_dir)
        if frontier.isEmpty():
            return (visits.groupBy(F.col("ax").alias(x),
                                   F.col("ay").alias(y))
                    .agg(F.count("*").cast("long").alias("acc")))
        visits = materialize(visits.unionByName(frontier), eager=False,
                             checkpoint_dir=checkpoint_dir)
    raise RuntimeError(
        f"flow_accumulation: path longer than max_rounds={max_rounds}")


def basin_labels(pixels: DataFrame, x: str = "gx", y: str = "gy",
                 w: str = "w", max_rounds: int = 20,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """Watershed basin delineation per occupied cell (r4 cont.) — the
    third member of the D8 terrain family: every cell is labeled with
    the SINK its steepest-descent flow path terminates at (basin =
    drainage area of one sink; sinks and flats label themselves).

    Correctness rests on the flow_accumulation acyclicity theorem
    (every D8 step strictly descends in w, so each cell's path reaches
    a unique sink in at most max(w) hops) — but where flowacc WALKS the
    paths hop by hop, basins only need the ENDPOINT, so the engine uses
    POINTER DOUBLING: parent(c) = the D8 next cell (self for sinks),
    then parent <- parent(parent) each round, halving every remaining
    path — ceil(log2(max path)) + 1 rounds instead of max-path rounds
    (max_rounds = 20 covers paths of 2^20 cells).  Convergence is
    CHECKED, not hoped: a round runs only while some parent is still a
    non-sink, and exhausting max_rounds raises loudly.

    Scale shape: per round ONE skinny hash equi-join on cell coords
    (the doubling) + one semi-join probe against the non-sink set, all
    on (x, y, px, py) int rows checkpointed between rounds; no window
    over the raster, no theta-join, cell table bounded by the grid.
    Output: (gx, gy, bx, by) — the cell and its basin's sink."""
    flow = flow_dir_d8(pixels, x, y, w)
    dirs = {0: (1, 0), 1: (1, 1), 2: (0, 1), 3: (-1, 1),
            4: (-1, 0), 5: (-1, -1), 6: (0, -1), 7: (1, -1)}
    dx = F.element_at(F.array(*[F.lit(dirs[d][0]) for d in range(8)]),
                      F.col("dir") + 1)
    dy = F.element_at(F.array(*[F.lit(dirs[d][1]) for d in range(8)]),
                      F.col("dir") + 1)
    par = (flow.select(
        F.col(x).cast("long").alias("ux"), F.col(y).cast("long").alias("uy"),
        F.when(F.col("dir") >= 0, F.col(x) + dx).otherwise(F.col(x))
        .cast("long").alias("px"),
        F.when(F.col("dir") >= 0, F.col(y) + dy).otherwise(F.col(y))
        .cast("long").alias("py")))
    par = materialize(par, eager=False, checkpoint_dir=checkpoint_dir)
    nonsink = (flow.filter(F.col("dir") >= 0)
               .select(F.col(x).cast("long").alias("sx"),
                       F.col(y).cast("long").alias("sy")))
    nonsink = materialize(nonsink, eager=False,
                          checkpoint_dir=checkpoint_dir)
    cur = par
    for _ in range(max_rounds):
        pending = cur.join(nonsink, (cur.px == nonsink.sx)
                           & (cur.py == nonsink.sy), "left_semi")
        if pending.isEmpty():
            return cur.select(F.col("ux").alias(x), F.col("uy").alias(y),
                              F.col("px").alias("bx"),
                              F.col("py").alias("by"))
        # double: parent <- cur(cur) — the hop view is CUR itself, so
        # every round halves the remaining path (2^k after round k).
        # Every parent is an occupied cell (flow edges only target
        # occupied neighbors; sinks self-loop), so the inner join
        # never drops rows.
        hop = cur.select(F.col("ux").alias("hx"), F.col("uy").alias("hy"),
                         F.col("px").alias("hpx"), F.col("py").alias("hpy"))
        cur = materialize(
            cur.join(hop, (cur.px == hop.hx) & (cur.py == hop.hy))
               .select("ux", "uy", F.col("hpx").alias("px"),
                       F.col("hpy").alias("py")),
            eager=False, checkpoint_dir=checkpoint_dir)
    raise RuntimeError(
        f"basin_labels: flow path longer than 2^{max_rounds} cells")


# Shared half-quadrant (45-degree sector) classification of the Horn
# gradient vector, counter-clockwise from east, half-open [k*45, (k+1)*45)
# boundaries; -1 = flat.  Pure integer comparisons, so the SAME text is
# used verbatim by the Spark expression and the DuckDB twin — identical
# semantics by construction (the ohlc/_OHLC_ORACLE_SQL sharing idiom).
OCTANT_CASE = (
    "CASE WHEN gx8 = 0 AND gy8 = 0 THEN -1 "
    "WHEN gx8 > 0 AND gy8 >= 0 AND gx8 > gy8 THEN 0 "
    "WHEN gx8 > 0 AND gy8 > 0 THEN 1 "
    "WHEN gx8 <= 0 AND gy8 > 0 AND -gx8 < gy8 THEN 2 "
    "WHEN gx8 < 0 AND gy8 > 0 THEN 3 "
    "WHEN gx8 < 0 AND gy8 <= 0 AND -gx8 > -gy8 THEN 4 "
    "WHEN gx8 < 0 AND gy8 < 0 THEN 5 "
    "WHEN gx8 >= 0 AND gy8 < 0 AND gx8 < -gy8 THEN 6 "
    "ELSE 7 END")


def horn_slope(pixels: DataFrame, x: str = "gx", y: str = "gy",
               w: str = "w") -> DataFrame:
    """Horn-method gradient per occupied cell of a sparse COUNT raster,
    exact integer domain (r4 cont.) — the slope/aspect member of the
    terrain family (flow_dir_d8 / flow_accumulation).

    Convention: on a COUNT raster an absent cell is a TRUE ZERO (no
    points landed there), unlike the moran/gi* "no observation" reading
    — so the full 3x3 Horn stencil applies with absent neighbors = 0,
    and only the OUTPUT domain is restricted to occupied cells.  The
    8x-scaled numerators (no division, stays BIGINT):

        gx8 = (ne + 2e + se) - (nw + 2w + sw)
        gy8 = (ne + 2n + nw) - (se + 2s + sw)

    slope2 = gx8^2 + gy8^2 (monotone in the true slope magnitude, so
    ordering/thresholding needs no sqrt), and the aspect octant is the
    45-degree half-quadrant of (gx8, gy8) via OCTANT_CASE (-1 = flat),
    counter-clockwise from east, ties committed to the CCW boundary.

    Scale shape: the gi_star volunteer idiom inverted — each occupied
    cell explodes its 8 (offset, x-coeff, y-coeff) structs toward the
    CENTERS it influences, contributions meet in ONE map-side-combined
    hash agg on cell coords, and a LEFT join back to the occupied set
    bounds the output (isolated cells keep gx8 = gy8 = 0, flat).
    Integer codegen end to end, zero Python; cell table bounded by the
    grid, never the point count."""
    coeffs = []
    for rx in (-1, 0, 1):
        for ry in (-1, 0, 1):
            if rx == 0 and ry == 0:
                continue
            kx = rx * (2 if ry == 0 else 1)
            ky = ry * (2 if rx == 0 else 1)
            coeffs.append((rx, ry, kx, ky))
    offs = F.array(*[
        F.struct(F.lit(rx).alias("rx"), F.lit(ry).alias("ry"),
                 F.lit(kx).cast("long").alias("kx"),
                 F.lit(ky).cast("long").alias("ky"))
        for rx, ry, kx, ky in coeffs])
    base = pixels.select(F.col(x).cast("long").alias("cx"),
                         F.col(y).cast("long").alias("cy"),
                         F.col(w).cast("long").alias("cw"))
    give = (base.select("cx", "cy", "cw", F.explode(offs).alias("o"))
            .select((F.col("cx") - F.col("o.rx")).alias("tx"),
                    (F.col("cy") - F.col("o.ry")).alias("ty"),
                    (F.col("o.kx") * F.col("cw")).alias("gxc"),
                    (F.col("o.ky") * F.col("cw")).alias("gyc")))
    grad = (give.groupBy("tx", "ty")
            .agg(F.sum("gxc").alias("gx8"), F.sum("gyc").alias("gy8")))
    return (base.join(grad, (base.cx == grad.tx) & (base.cy == grad.ty),
                      "left")
            .select(F.col("cx").alias(x), F.col("cy").alias(y),
                    F.col("cw").alias("w"),
                    F.coalesce("gx8", F.lit(0)).alias("gx8"),
                    F.coalesce("gy8", F.lit(0)).alias("gy8"))
            .withColumn("slope2", F.col("gx8") * F.col("gx8")
                        + F.col("gy8") * F.col("gy8"))
            .withColumn("octant", F.expr(OCTANT_CASE).cast("int")))


# Hillshade from the 8x-scaled Horn gradient (Burrough & McDonnell's
# formula, the ESRI/GDAL default illumination: altitude 45 deg ->
# zenith 45 deg; azimuth 315 deg -> math-convention 135 deg).  The
# aspect enters only through cos(azimuth - aspect), which is even and
# 2pi-periodic, so no branchy [0, 2pi) normalization is needed; flat
# cells hit atan2(0, -0) = pi in BOTH engines (C99), multiplied away by
# sin(slope) = 0.  SAME text verbatim on Spark and DuckDB (the
# OCTANT_CASE sharing idiom); ROUND(.., 4) absorbs last-ulp libm drift
# (~1e-13 relative) between the two engines' sin/cos/atan.
HILLSHADE_EXPR = (
    "ROUND(255.0 * GREATEST("
    "COS(RADIANS(45.0)) * COS(ATAN(SQRT("
    "(gx8 / 8.0) * (gx8 / 8.0) + (gy8 / 8.0) * (gy8 / 8.0)))) "
    "+ SIN(RADIANS(45.0)) * SIN(ATAN(SQRT("
    "(gx8 / 8.0) * (gx8 / 8.0) + (gy8 / 8.0) * (gy8 / 8.0)))) "
    "* COS(RADIANS(135.0) - ATAN2(gy8 / 8.0, -(gx8 / 8.0))), "
    "0.0), 4)")


def hillshade(pixels: DataFrame, x: str = "gx", y: str = "gy",
              w: str = "w") -> DataFrame:
    """Analytical hillshade per occupied cell of a sparse COUNT raster
    (r5) — the rendering companion to `horn_slope`, treating counts as
    elevation exactly as the rest of the terrain family does: the
    exact-integer Horn gradient (gx8, gy8) feeds the standard
    cartographic illumination model (sun azimuth 315 deg, altitude
    45 deg), clamped at the shadow line and scaled to [0, 255].

    Output: (x, y, w, gx8, gy8, hillshade) where hillshade is DOUBLE
    rounded to 4 decimals via HILLSHADE_EXPR — the only non-integer
    column, by necessity transcendental; everything upstream of the
    final expression is the exact-integer horn_slope plan (volunteer
    explode + ONE map-side-combined agg + LEFT join back), so the plan
    adds zero shuffles and zero Python over the slope operator."""
    return (horn_slope(pixels, x=x, y=y, w=w)
            .withColumn("hillshade", F.expr(HILLSHADE_EXPR))
            .drop("slope2", "octant"))


def tpi_index(pixels: DataFrame, x: str = "gx", y: str = "gy",
              w: str = "w") -> DataFrame:
    """Topographic Position Index (Weiss) per occupied cell of a sparse
    COUNT raster, exact integer domain (r4 cont.): the cell's value
    minus the MEAN of its 8 neighbors, carried 8x-scaled so no division
    ever happens — tpi8 = 8*w - sum(8-neighborhood), with horn_slope's
    convention that absent cells on a count raster are TRUE ZEROS (so
    the denominator is always exactly 8 and the scaled form is exact).
    cls = sign(tpi8): +1 locally high (ridge/peak), -1 locally low
    (valley/pit), 0 neutral — the landform-classification input.

    Scale shape: identical to horn_slope — one 8-offset volunteer
    explode, ONE map-side-combined hash agg on cell coords, LEFT join
    back to the occupied set (isolated cells: nbr_sum 0, tpi8 = 8w).
    Integer codegen end to end, zero Python, cell table bounded by the
    grid.  Output: (gx, gy, w, nbr_sum, tpi8, cls)."""
    offs = F.array(*[
        F.struct(F.lit(rx).alias("rx"), F.lit(ry).alias("ry"))
        for rx in (-1, 0, 1) for ry in (-1, 0, 1)
        if not (rx == 0 and ry == 0)])
    base = pixels.select(F.col(x).cast("long").alias("cx"),
                         F.col(y).cast("long").alias("cy"),
                         F.col(w).cast("long").alias("cw"))
    give = (base.select("cx", "cy", "cw", F.explode(offs).alias("o"))
            .select((F.col("cx") - F.col("o.rx")).alias("tx"),
                    (F.col("cy") - F.col("o.ry")).alias("ty"), "cw"))
    nbr = give.groupBy("tx", "ty").agg(F.sum("cw").alias("nbr_sum"))
    return (base.join(nbr, (base.cx == nbr.tx) & (base.cy == nbr.ty),
                      "left")
            .select(F.col("cx").alias(x), F.col("cy").alias(y),
                    F.col("cw").alias("w"),
                    F.coalesce("nbr_sum", F.lit(0)).alias("nbr_sum"))
            .withColumn("tpi8", F.lit(8) * F.col("w") - F.col("nbr_sum"))
            .withColumn("cls", F.signum("tpi8").cast("int")))


def line_of_sight(pixels: DataFrame, x: str = "gx", y: str = "gy",
                  w: str = "w", scale: int = 1 << 20) -> DataFrame:
    """Per-row line-of-sight visibility over a sparse COUNT raster
    (C-ls, r5): an observer sits west of each grid row at x = -1 at
    height 0, a cell's height is its count ``w`` (absent cells are
    TRUE ZEROS on a count raster — horn_slope's convention — so they
    never occlude), and a cell is VISIBLE iff its elevation angle
    w / (gx + 1) STRICTLY exceeds every earlier occupied cell's angle
    in the row (grazing rays are blocked).  This is the 1-D ray
    decomposition every classical R2/R3 viewshed reduces to — the
    grid rows are the rays.

    Exactness: angles are carried as floor(w * scale / (gx + 1))
    BIGINTs.  For grid width n and scale >= n^2, two DISTINCT
    rational angles differ by at least 1/((x_i+1)(x_j+1)) >= 1/scale,
    so floor-scaling preserves the exact order and equality — the
    integer comparison IS the Fraction comparison (theorem exercised
    in tests/test_los.py; the DuckDB twin never computes the scaled
    angle's visibility, it cross-multiplies a NOT-EXISTS instead).

    Scale shape: ONE window shuffle partitioned by row — rays are
    independent, so executors sweep disjoint rays; a running max over
    the ordered preceding frame decides visibility.  Integer codegen
    end to end, zero Python; the frame is grid-bounded, never the
    point count."""
    from pyspark.sql import Window

    assert scale >= 1
    base = pixels.select(F.col(x).cast("long").alias("gx"),
                         F.col(y).cast("long").alias("gy"),
                         F.col(w).cast("long").alias("w"))
    win = (Window.partitionBy("gy").orderBy("gx")
           .rowsBetween(Window.unboundedPreceding, -1))
    return (base
            .withColumn("ang", F.expr(f"(w * {scale}L) DIV (gx + 1)"))
            .withColumn("vis", (F.col("ang") >
                                F.coalesce(F.max("ang").over(win),
                                           F.lit(-1))).cast("int")))


def raster_proximity(pixels: DataFrame, x: str = "gx", y: str = "gy",
                     radius: int = 4) -> DataFrame:
    """C-family (r4 cont.) — bounded-radius proximity: for every
    occupied cell, the L1 distance to the nearest OTHER occupied cell
    within Chebyshev radius `radius` (the GIS "near" analysis /
    nearest-neighbor-distance distribution over the sparse raster).
    Cells with no neighbor inside the bound report the sentinel
    2*radius + 1 ("beyond") — the bounded-search honesty rule: absent
    is reported, never fabricated.  -> (gx, gy, nn_l1).

    Scale shape: the cell-ring idiom — each occupied cell volunteers
    itself to its (2R+1)^2 - 1 neighbor positions (a literal offset
    array, native explode), candidates meet in ONE hash equi-join on
    the position, min-agg per target; the base left-joins back so
    isolated cells keep their sentinel.  Never a theta-join; fan-out
    is the fixed (2R+1)^2 constant, not data-dependent."""
    R = int(radius)
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(abs(dx) + abs(dy)).alias("d"))
        for dx in range(-R, R + 1) for dy in range(-R, R + 1)
        if not (dx == 0 and dy == 0)])
    base = pixels.select(F.col(x).alias("cx"), F.col(y).alias("cy"))
    give = (base.select("cx", "cy", F.explode(offs).alias("_o"))
            .select((F.col("cx") + F.col("_o.dx")).alias("tx"),
                    (F.col("cy") + F.col("_o.dy")).alias("ty"),
                    F.col("_o.d").alias("d")))
    near = (base.join(give, (base.cx == give.tx) & (base.cy == give.ty))
            .groupBy("cx", "cy")
            .agg(F.min("d").cast("long").alias("_nn")))
    return (base.join(near, ["cx", "cy"], "left")
            .select(F.col("cx").alias(x), F.col("cy").alias(y),
                    F.coalesce("_nn", F.lit(2 * R + 1)).cast("long")
                    .alias("nn_l1")))


def zt_curvature(pixels: DataFrame, x: str = "gx", y: str = "gy",
                 w: str = "w") -> DataFrame:
    """Zevenbergen-Thorne curvature per occupied cell of a sparse
    COUNT raster, exact integer domain (r5, post-window) — the
    second-derivative member of the terrain family (horn_slope /
    hillshade / tpi / flow).  Counts are elevation, absent cells are
    TRUE ZEROS (horn_slope's convention), cell size L = 1.

    The five Z-T partials are carried SCALED so everything stays
    BIGINT (z2=N, z4=W, z6=E, z8=S, corners z1=NW z3=NE z7=SW z9=SE):

        d2 = zW + zE - 2*z5   (= 2D = z_xx)
        e2 = zN + zS - 2*z5   (= 2E = z_yy)
        f4 = -zNW + zNE + zSW - zSE   (= 4F = 2*z_xy... scaled z_xy)
        g2 = zE - zW          (= 2G = 2*z_x... scaled -z_x sign per Z-T)
        h2 = zN - zS          (= 2H)

    laplace2 = d2 + e2 equals the exact Laplacian z_xx + z_yy.  The
    plan and profile curvatures are exact RATIONALS in these integers:

        plan    =  (2*d2*h2^2 + 2*e2*g2^2 - f4*g2*h2) / (2*(g2^2+h2^2))
        profile = -(2*d2*g2^2 + 2*e2*h2^2 + f4*g2*h2) / (2*(g2^2+h2^2))

    so the operator emits the numerators and the shared denominator
    as exact BIGINTs (plan_num, prof_num, curv_den) and NEVER divides
    — flat cells (g2 = h2 = 0) get 0/0/0, division-by-zero cannot
    happen downstream without the caller choosing a convention.
    Overflow contract: |plan_num| <= 80*W^3 for per-cell counts
    <= W, exact through W ~ 4.8e5; beyond that pre-scale the raster.

    Scale shape: identical to horn_slope — each occupied cell explodes
    its 8 (offset, 5-coefficient) structs toward the centers it
    influences, ONE map-side-combined hash agg on cell coords, LEFT
    join back to the occupied set adds the center's own -2w terms.
    Integer codegen end to end, zero Python, cell table bounded by
    the grid."""
    coeffs = []
    for rx in (-1, 0, 1):
        for ry in (-1, 0, 1):
            if rx == 0 and ry == 0:
                continue
            cd2 = 1 if ry == 0 else 0            # W, E
            ce2 = 1 if rx == 0 else 0            # N, S
            cf4 = rx * ry                        # NE,SW +1; NW,SE -1
            cg2 = rx if ry == 0 else 0           # E +1, W -1
            ch2 = ry if rx == 0 else 0           # N +1, S -1
            coeffs.append((rx, ry, cd2, ce2, cf4, cg2, ch2))
    offs = F.array(*[
        F.struct(F.lit(rx).alias("rx"), F.lit(ry).alias("ry"),
                 F.lit(cd2).cast("long").alias("cd2"),
                 F.lit(ce2).cast("long").alias("ce2"),
                 F.lit(cf4).cast("long").alias("cf4"),
                 F.lit(cg2).cast("long").alias("cg2"),
                 F.lit(ch2).cast("long").alias("ch2"))
        for rx, ry, cd2, ce2, cf4, cg2, ch2 in coeffs])
    base = pixels.select(F.col(x).cast("long").alias("cx"),
                         F.col(y).cast("long").alias("cy"),
                         F.col(w).cast("long").alias("cw"))
    give = (base.select("cx", "cy", "cw", F.explode(offs).alias("o"))
            .select((F.col("cx") - F.col("o.rx")).alias("tx"),
                    (F.col("cy") - F.col("o.ry")).alias("ty"),
                    (F.col("o.cd2") * F.col("cw")).alias("vd2"),
                    (F.col("o.ce2") * F.col("cw")).alias("ve2"),
                    (F.col("o.cf4") * F.col("cw")).alias("vf4"),
                    (F.col("o.cg2") * F.col("cw")).alias("vg2"),
                    (F.col("o.ch2") * F.col("cw")).alias("vh2")))
    part = (give.groupBy("tx", "ty")
            .agg(F.sum("vd2").alias("sd2"), F.sum("ve2").alias("se2"),
                 F.sum("vf4").alias("sf4"), F.sum("vg2").alias("sg2"),
                 F.sum("vh2").alias("sh2")))
    j = (base.join(part, (base.cx == part.tx) & (base.cy == part.ty),
                   "left")
         .select(F.col("cx").alias(x), F.col("cy").alias(y),
                 F.col("cw").alias("w"),
                 (F.coalesce("sd2", F.lit(0))
                  - F.lit(2) * F.col("cw")).alias("d2"),
                 (F.coalesce("se2", F.lit(0))
                  - F.lit(2) * F.col("cw")).alias("e2"),
                 F.coalesce("sf4", F.lit(0)).alias("f4"),
                 F.coalesce("sg2", F.lit(0)).alias("g2"),
                 F.coalesce("sh2", F.lit(0)).alias("h2")))
    return (j.withColumn("laplace2", F.col("d2") + F.col("e2"))
            .withColumn(
                "plan_num",
                F.lit(2) * F.col("d2") * F.col("h2") * F.col("h2")
                + F.lit(2) * F.col("e2") * F.col("g2") * F.col("g2")
                - F.col("f4") * F.col("g2") * F.col("h2"))
            .withColumn(
                "prof_num",
                -(F.lit(2) * F.col("d2") * F.col("g2") * F.col("g2")
                  + F.lit(2) * F.col("e2") * F.col("h2") * F.col("h2")
                  + F.col("f4") * F.col("g2") * F.col("h2")))
            .withColumn(
                "curv_den",
                F.lit(2) * (F.col("g2") * F.col("g2")
                            + F.col("h2") * F.col("h2"))))


def tri_index(pixels: DataFrame, x: str = "gx", y: str = "gy",
              w: str = "w") -> DataFrame:
    """Riley Terrain Ruggedness Index per occupied cell of a sparse
    COUNT raster, exact integer domain (r5, post-window): the sum of
    |z5 - z_n| over the 8-neighborhood (Riley et al. 1999 report the
    square root of squared differences; the L1 and L2^2 forms carried
    here are the exact-integer signatures both variants derive from:
    tri = sum |dz|, tri2 = sum dz^2).  Absent neighbors are TRUE
    ZEROS (horn_slope's convention), so an isolated cell reports
    tri = 8w — maximal local relief, the honest reading on a count
    raster.  -> (gx, gy, w, tri, tri2).

    Scale shape: |center - neighbor| is NONLINEAR, so the tpi
    agg-then-join trick is unavailable; instead each occupied cell
    volunteers its value to its 8 neighbor positions (native explode),
    contributions meet the center row in ONE hash equi-join on cell
    coords, and per-cell sums fold in the same exchange's hash agg
    (AQE coalesces the co-partitioned join+agg pair); absent-neighbor
    terms enter in closed form as (8 - n_present) * w.  Integer
    codegen end to end, zero Python, grid-bounded."""
    offs = F.array(*[
        F.struct(F.lit(rx).alias("rx"), F.lit(ry).alias("ry"))
        for rx in (-1, 0, 1) for ry in (-1, 0, 1)
        if not (rx == 0 and ry == 0)])
    base = pixels.select(F.col(x).cast("long").alias("cx"),
                         F.col(y).cast("long").alias("cy"),
                         F.col(w).cast("long").alias("cw"))
    give = (base.select("cx", "cy", "cw", F.explode(offs).alias("o"))
            .select((F.col("cx") - F.col("o.rx")).alias("tx"),
                    (F.col("cy") - F.col("o.ry")).alias("ty"),
                    F.col("cw").alias("nw")))
    met = (base.join(give, (base.cx == give.tx) & (base.cy == give.ty))
           .groupBy("cx", "cy")
           .agg(F.count("*").alias("_n"),
                F.sum(F.abs(F.col("cw") - F.col("nw"))).alias("_sa"),
                F.sum((F.col("cw") - F.col("nw"))
                      * (F.col("cw") - F.col("nw"))).alias("_sq")))
    return (base.join(met, ["cx", "cy"], "left")
            .select(
                F.col("cx").alias(x), F.col("cy").alias(y),
                F.col("cw").alias("w"),
                (F.coalesce("_sa", F.lit(0))
                 + (F.lit(8) - F.coalesce("_n", F.lit(0)))
                 * F.col("cw")).cast("long").alias("tri"),
                (F.coalesce("_sq", F.lit(0))
                 + (F.lit(8) - F.coalesce("_n", F.lit(0)))
                 * F.col("cw") * F.col("cw")).cast("long").alias("tri2")))


def variogram(pixels: DataFrame, width: int, height: int,
              lags: list[tuple[int, int]] | None = None,
              x: str = "gx", y: str = "gy", w: str = "w") -> DataFrame:
    """Empirical semivariogram per lag vector over a sparse COUNT
    raster on a width x height grid, exact integer domain (r5,
    post-window) — the geostatistics member of the terrain family
    (Matheron's 2*gamma(h) = mean (z(s) - z(s+h))^2; absent cells are
    TRUE ZEROS, horn_slope's convention, so the pair population is the
    FULL in-bounds grid, not just occupied cells).

    Per canonical lag (dx, dy) the operator emits exact BIGINTs:

        n_pairs    = (width - |dx|) * (height - |dy|)   [closed form]
        n_both     = pairs with BOTH endpoints occupied
        gamma2_num = sum over all in-bounds pairs of (z1 - z2)^2

    so gamma(h) = gamma2_num / (2 * n_pairs) is an exact rational the
    caller divides at the precision it wants.  The full-grid pair sum
    NEVER materializes the dense grid: it decomposes as

        gamma2_num = S_a + S_b - 2 * S_12
        S_a  = sum z(s)^2 over occupied s with s+h in bounds
        S_b  = sum z(t)^2 over occupied t with t-h in bounds
        S_12 = sum z1 * z2 over both-occupied pairs

    (zero cells vanish from every term — the identity the DuckDB twin
    proves by literally summing the DENSE grid's pairs).

    Scale shape: S_a / S_b are ONE pass over occupied cells (explode
    the constant lag list, closed-form bounds filter, map-side-combined
    agg on the lag); S_12 is ONE hash equi-join of the lag-shifted
    occupied set against the occupied set — never a theta-join; all
    frames are bounded by occupied_cells * n_lags.  Integer codegen
    end to end, zero Python."""
    if lags is None:
        # canonical half-plane, Chebyshev radius <= 3: dy > 0, or
        # dy = 0 and dx > 0 — every unordered pair counted once.
        lags = [(dx, dy) for dy in range(0, 4) for dx in range(-3, 4)
                if (dy > 0) or (dy == 0 and dx > 0)]
    offs = F.array(*[
        F.struct(F.lit(dx).cast("long").alias("dx"),
                 F.lit(dy).cast("long").alias("dy"))
        for dx, dy in lags])
    W, H = int(width), int(height)
    base = pixels.select(F.col(x).cast("long").alias("cx"),
                         F.col(y).cast("long").alias("cy"),
                         F.col(w).cast("long").alias("cw"))
    ex = (base.select("cx", "cy", "cw", F.explode(offs).alias("o"))
          .select("cx", "cy", "cw",
                  F.col("o.dx").alias("dx"), F.col("o.dy").alias("dy")))
    in_fwd = ((F.col("cx") + F.col("dx") >= 0)
              & (F.col("cx") + F.col("dx") < W)
              & (F.col("cy") + F.col("dy") >= 0)
              & (F.col("cy") + F.col("dy") < H))
    in_bwd = ((F.col("cx") - F.col("dx") >= 0)
              & (F.col("cx") - F.col("dx") < W)
              & (F.col("cy") - F.col("dy") >= 0)
              & (F.col("cy") - F.col("dy") < H))
    sides = (ex.groupBy("dx", "dy").agg(
        F.sum(F.when(in_fwd, F.col("cw") * F.col("cw"))
              .otherwise(F.lit(0))).alias("s_a"),
        F.sum(F.when(in_bwd, F.col("cw") * F.col("cw"))
              .otherwise(F.lit(0))).alias("s_b")))
    shifted = ex.select((F.col("cx") + F.col("dx")).alias("tx"),
                        (F.col("cy") + F.col("dy")).alias("ty"),
                        "dx", "dy", F.col("cw").alias("w1"))
    tgt = base.select(F.col("cx").alias("tx"), F.col("cy").alias("ty"),
                      F.col("cw").alias("w2"))
    both = (shifted.join(tgt, ["tx", "ty"])
            .groupBy("dx", "dy")
            .agg(F.count("*").alias("n_both"),
                 F.sum(F.col("w1") * F.col("w2")).alias("s_12")))
    return (sides.join(both, ["dx", "dy"], "left")
            .select(
                "dx", "dy",
                ((F.lit(W) - F.abs("dx"))
                 * (F.lit(H) - F.abs("dy"))).cast("long").alias("n_pairs"),
                F.coalesce("n_both", F.lit(0)).cast("long").alias("n_both"),
                (F.col("s_a") + F.col("s_b")
                 - F.lit(2) * F.coalesce("s_12", F.lit(0)))
                .cast("long").alias("gamma2_num")))


def raster_algebra(a: DataFrame, b: DataFrame, x: str = "gx",
                   y: str = "gy", w: str = "w") -> DataFrame:
    """Local (cell-by-cell) two-raster map algebra (r5, post-window):
    the LOCAL member of the raster-op taxonomy beside focal
    (tile_focal/morph), zonal (zonal_stats) and global (moran/geary)
    — aligns two sparse COUNT rasters on cell coords with absent
    cells as TRUE ZEROS and emits the exact-BIGINT pointwise
    combinations:

        (gx, gy, wa, wb, w_sum, w_diff, w_prod, w_min, w_max,
         in_a, in_b)

    over the UNION of occupied cells (w_prod is 0 wherever either
    side is absent — the true-zero convention makes that exact, not
    a convention).  in_a/in_b are 0/1 BIGINT presence flags so
    callers recover intersection/difference semantics by filter.

    Scale shape: ONE full-outer hash equi-join on cell coords — the
    frames stay occupied-cells-sized, never dense; integer codegen,
    zero Python."""
    aa = a.select(F.col(x).cast("long").alias("ax"),
                  F.col(y).cast("long").alias("ay"),
                  F.col(w).cast("long").alias("wa"))
    bb = b.select(F.col(x).cast("long").alias("bx"),
                  F.col(y).cast("long").alias("by"),
                  F.col(w).cast("long").alias("wb"))
    j = aa.join(bb, (aa.ax == bb.bx) & (aa.ay == bb.by), "full_outer")
    wa = F.coalesce("wa", F.lit(0))
    wb = F.coalesce("wb", F.lit(0))
    return j.select(
        F.coalesce("ax", "bx").alias(x), F.coalesce("ay", "by").alias(y),
        wa.alias("wa"), wb.alias("wb"),
        (wa + wb).alias("w_sum"), (wa - wb).alias("w_diff"),
        (wa * wb).alias("w_prod"),
        F.least(wa, wb).alias("w_min"), F.greatest(wa, wb).alias("w_max"),
        F.col("ax").isNotNull().cast("long").alias("in_a"),
        F.col("bx").isNotNull().cast("long").alias("in_b"))


def sample_bilinear(pixels: DataFrame, queries: DataFrame, scale: int,
                    x: str = "gx", y: str = "gy", w: str = "w",
                    qid: str = "qid", qx: str = "qx_q",
                    qy: str = "qy_q") -> DataFrame:
    """Exact-rational bilinear sampling of a sparse COUNT raster at
    sub-cell query points (r5, post-window) — the raster->vector
    interface: queries carry QUANTIZED coordinates (qx_q, qy_q) =
    floor(position * scale), so the fractional offsets fx = qx_q mod
    scale, fy = qy_q mod scale are exact integers and the classical
    bilinear value

        z = [ z00 (s-fx)(s-fy) + z10 fx (s-fy)
            + z01 (s-fx) fy    + z11 fx fy ] / s^2,   s = scale

    is emitted as the exact BIGINT pair (val_num, val_den = s^2) —
    never divided, absent corners TRUE ZEROS (horn_slope's
    convention).  n_corners counts occupied corners so callers can
    distinguish an exact 0 from sampling a hole.

    Scale shape: each query explodes to its 4 (corner, weight) rows
    (native explode, weights computed in-plan), contributions meet
    the raster in ONE hash equi-join on cell coords, and per-query
    sums fold in a map-side-combined agg; a LEFT join from the query
    set preserves queries over empty neighborhoods.  Integer codegen,
    zero Python; overflow contract |val_num| <= 4 s^2 W for cell
    counts <= W (exact through s^2 W ~ 2.3e18/4)."""
    s = int(scale)
    if s <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    base = queries.select(
        F.col(qid).alias("_qid"),
        F.col(qx).cast("long").alias("_qx"),
        F.col(qy).cast("long").alias("_qy"))
    corners = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
        for i in (0, 1) for j in (0, 1)])
    ex = (base
          .withColumn("_cx", F.expr(f"_qx DIV {s}L"))
          .withColumn("_cy", F.expr(f"_qy DIV {s}L"))
          .withColumn("_fx", F.col("_qx") - F.col("_cx") * s)
          .withColumn("_fy", F.col("_qy") - F.col("_cy") * s)
          .select("_qid", "_cx", "_cy", "_fx", "_fy",
                  F.explode(corners).alias("c"))
          .select(
              "_qid",
              (F.col("_cx") + F.col("c.i")).alias("_px"),
              (F.col("_cy") + F.col("c.j")).alias("_py"),
              (F.when(F.col("c.i") == 0, F.lit(s) - F.col("_fx"))
               .otherwise(F.col("_fx"))
               * F.when(F.col("c.j") == 0, F.lit(s) - F.col("_fy"))
               .otherwise(F.col("_fy"))).alias("_wt")))
    pix = pixels.select(F.col(x).cast("long").alias("_px"),
                        F.col(y).cast("long").alias("_py"),
                        F.col(w).cast("long").alias("_z"))
    hit = (ex.join(pix, ["_px", "_py"])
           .groupBy(F.col("_qid").alias("_hqid"))
           .agg(F.sum(F.col("_wt") * F.col("_z")).alias("_num"),
                F.count("*").alias("_nc")))
    return (base.join(hit, F.col("_qid") == F.col("_hqid"), "left")
            .select(F.col("_qid").alias(qid),
                    F.col("_qx").alias(qx), F.col("_qy").alias(qy),
                    F.coalesce("_num", F.lit(0)).cast("long")
                    .alias("val_num"),
                    F.lit(s * s).cast("long").alias("val_den"),
                    F.coalesce("_nc", F.lit(0)).cast("long")
                    .alias("n_corners")))


def cost_distance(pixels: DataFrame, x: str = "gx", y: str = "gy",
                  w: str = "w", grid: int = 128,
                  source_pred: str = "gx < 4", max_hops: int = 8,
                  ortho_num: int = 5, diag_num: int = 7,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """Cost-distance surface over a sparse friction raster (C-cd, r5,
    post-window): minimal accumulated traversal cost from ANY source
    cell to each reachable cell, moving through the 8-neighborhood of
    OCCUPIED cells only (absent cells on a sparse raster are
    impassable barriers — the friction-surface-with-barriers contract,
    the dual of horn_slope's true-zero convention which applies to
    VALUES, not passability).  -> (gx, gy, cost).

    Step cost is the classical midpoint rule kept exact-integer: a
    move u -> v costs (w_u + w_v) * fac with fac = `ortho_num` for
    orthogonal and `diag_num` for diagonal steps (5/7 quantizes the
    1/sqrt(2) anisotropy at <1% error; both the 2x scale and the
    quantization are part of the operator contract, so the result is
    a pure integer function of the input set).  Paths are bounded to
    `max_hops` steps — the graph family's hop-bounded Bellman-Ford
    contract (engine/graph.py::sssp_int, which this operator composes
    rather than reimplements): set max_hops >= |occupied|-1 for the
    true fixpoint.

    Scale shape: the adjacency is ONE 8-offset volunteer explode +
    ONE hash equi-join against the occupied set (never a theta-join);
    node ids pack as gx*grid+gy (caller asserts coords < grid); then
    sssp_int's per-round skinny (node, dist) relaxation over the
    once-checkpointed edge frame.  Integer codegen end to end, zero
    Python."""
    from engine.graph import sssp_int

    base = (pixels.select(F.col(x).cast("long").alias("gx"),
                          F.col(y).cast("long").alias("gy"),
                          F.col(w).cast("long").alias("w")))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(ortho_num if dx == 0 or dy == 0 else diag_num)
                 .cast("long").alias("fac"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)])
    give = (base.select("gx", "gy", "w", F.explode(offs).alias("o"))
            .select((F.col("gx") * grid + F.col("gy")).alias("u"),
                    (F.col("gx") + F.col("o.dx")).alias("tx"),
                    (F.col("gy") + F.col("o.dy")).alias("ty"),
                    F.col("w").alias("wu"), F.col("o.fac").alias("fac")))
    nbr = base.select((F.col("gx") * grid + F.col("gy")).alias("v"),
                      F.col("gx").alias("tx"), F.col("gy").alias("ty"),
                      F.col("w").alias("wv"))
    edges = (give.join(nbr, ["tx", "ty"])
             .select("u", "v",
                     ((F.col("wu") + F.col("wv")) * F.col("fac"))
                     .alias("w")))
    srcs = (base.filter(F.expr(source_pred))
            .select((F.col("gx") * grid + F.col("gy")).alias("node")))
    d = sssp_int(edges, srcs, src="u", dst="v", max_hops=max_hops,
                 checkpoint_dir=checkpoint_dir)
    return d.select(F.expr(f"node DIV {grid}L").alias("gx"),
                    (F.col("node") % grid).alias("gy"),
                    F.col("dist").alias("cost"))


def focal_median(df: DataFrame, z: int = 6,
                 lat: str = "lat", lon: str = "lon",
                 checkpoint: bool = True) -> DataFrame:
    """Focal MEDIAN over the per-tile count raster (C-fm, r5,
    post-window) — the rank-statistic member of the map-algebra family
    (focal_sum, morph_tiles): for every occupied tile, the exact
    median of the 9 values in its 3x3 window, where absent in-range
    neighbors and beyond-the-pole neighbors are TRUE ZEROS (the count-
    raster convention) and x is cyclic mod 2^z.  The classic
    salt-and-pepper denoise: a lone hot tile's median stays 0 while a
    dense region's median tracks its plateau.

    Exactness without materializing zeros: the window multiset is 9
    values of which 9 - n_present are zeros, so the median (5th
    smallest) is 0 when n_present <= 4, else the (5 - (9 -
    n_present))-th smallest PRESENT value — a closed-form index into
    the sorted present list.  Counts are integers; no interpolation
    ever happens.

    Scale shape (the focal_sum skeleton): full table touched once by
    the map-side-combined tile_counts agg; the sparse raster (<= 4^z
    rows, checkpointed) explodes 9 native offset structs; one skinny
    regroup collects each window's PRESENT values (<= 9 longs — the
    collect_list is window-bounded, not data-bounded); the sorted-
    index arithmetic is native; one inner join back keeps the output
    domain = occupied tiles.  Zero Python.

    Output: (tile_z, tile_x, tile_y, n, n_present, median_n)."""
    n_tiles = 1 << z
    base = tile_counts(df, z, lat, lon)
    if checkpoint:
        base = base.localCheckpoint(eager=False)
    offs = F.array(*[
        F.struct(F.lit(dx).cast("long").alias("dx"),
                 F.lit(dy).cast("long").alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    contrib = (
        base.select("tile_x", "tile_y", "n", F.explode(offs).alias("o"))
        .select(F.pmod(F.col("tile_x") + F.col("o.dx"),
                       F.lit(n_tiles)).alias("tile_x"),
                (F.col("tile_y") + F.col("o.dy")).alias("tile_y"), "n")
        .filter((F.col("tile_y") >= 0) & (F.col("tile_y") < n_tiles))
    )
    med = (contrib.groupBy("tile_x", "tile_y")
           .agg(F.sort_array(F.collect_list("n")).alias("vals"))
           .select("tile_x", "tile_y",
                   F.size("vals").cast("int").alias("n_present"),
                   F.when(F.size("vals") <= 4, F.lit(0).cast("long"))
                   .otherwise(F.element_at("vals", F.size("vals") - 4))
                   .alias("median_n")))
    return (
        base.join(med, ["tile_x", "tile_y"], "inner")
        .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                "n", "n_present", "median_n")
    )


def mode_pyramid(cells: DataFrame, levels: int,
                 x: str = "gx", y: str = "gy",
                 v: str = "w") -> DataFrame:
    """Categorical raster pyramid (C-mp, r5, post-window): repeated
    2x2 modal downsampling of a sparse CLASS raster -> one row per
    occupied cell per level, (level, gx, gy, mode_v, mode_n,
    n_children), level 0 = the input (mode_v = its own value, mode_n
    = n_children = 1), level L+1 = per 2x2 block of level L the modal
    child value with the deterministic (max count, min value)
    tie-break.

    The doctrinal point vs tile_pyramid: SUM is associative, so the
    count pyramid rolls every ancestor up in ONE explode-ancestors
    agg; MODE IS NOT (the mode of modes is not the mode), so a
    categorical pyramid must halve LEVEL BY LEVEL — `levels`
    sequential map-side-combined aggs over geometrically-shrinking
    frames (total work <= 4/3 the base, the geometric-series bound).
    Each level is two skinny aggs: (block, value) counts, then the
    min(struct(-cnt, value)) argmax fold — the zonal_majority idiom on
    grid keys.  Integer codegen, zero Python."""
    base = (cells.select(F.col(x).cast("long").alias("gx"),
                         F.col(y).cast("long").alias("gy"),
                         F.col(v).cast("long").alias("v"))
            .withColumn("level", F.lit(0).cast("int"))
            .withColumn("mode_n", F.lit(1).cast("long"))
            .withColumn("n_children", F.lit(1).cast("long")))
    out = base.select("level", "gx", "gy",
                      F.col("v").alias("mode_v"), "mode_n",
                      "n_children")
    cur = base.select("gx", "gy", "v")
    for lvl in range(1, levels + 1):
        per = (cur.groupBy(F.expr("gx DIV 2").alias("gx"),
                           F.expr("gy DIV 2").alias("gy"), "v")
               .agg(F.count("*").alias("cnt")))
        nxt = (per.groupBy("gx", "gy")
               .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                                   F.col("v").alias("v"))).alias("top"),
                    F.sum("cnt").cast("long").alias("n_children"))
               .select("gx", "gy", F.col("top.v").alias("v"),
                       (-F.col("top.neg")).cast("long").alias("mode_n"),
                       "n_children"))
        out = out.unionByName(
            nxt.select(F.lit(lvl).cast("int").alias("level"),
                       "gx", "gy", F.col("v").alias("mode_v"),
                       "mode_n", "n_children"))
        cur = nxt.select("gx", "gy", "v")
    return out


def adaptive_threshold(df: DataFrame, z: int = 6, grid_bits: int = 4,
                       radius: int = 2,
                       lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Adaptive (local-mean) thresholding over each tile's occupancy
    grid (C-at, r5, post-window) — the LOCAL companion to img_otsu's
    global threshold: an occupied pixel is foreground iff its value
    strictly exceeds the mean of its (2r+1)^2 box window (clipped at
    tile borders, absent in-tile pixels TRUE ZEROS).  The comparison
    is exact — v * n_box > box_sum, never divided; n_box is the
    closed-form clipped window size.  -> (tile_z, tile_x, tile_y, px,
    py, w, box_sum, n_box, above:int).

    Scale shape: the integral_image skeleton — ONE map-side-combined
    pixel agg, densify to grid^2 rows per OCCUPIED tile (bounded by
    4^z * grid^2, independent of input rows), then the box sum as a
    SEPARABLE filter: two RANGE-window passes (along px within rows,
    along py within columns of the row sums) — O(1) per pixel, no
    4-corner SAT join; inner join back keeps the output sparse.
    Integer codegen end to end, zero Python."""
    from pyspark.sql import Window

    grid = 1 << grid_bits
    pix = (_pixel_counts(df, z, grid_bits, lat, lon)
           .select("tile_x", "tile_y",
                   F.pmod("pix", F.lit(grid)).cast("int").alias("px"),
                   (F.col("pix") / grid).cast("int").alias("py"),
                   "w"))
    dense = (pix.select("tile_x", "tile_y").distinct()
             .select("tile_x", "tile_y",
                     F.explode(F.sequence(F.lit(0), F.lit(grid - 1)))
                     .alias("py"))
             .select("tile_x", "tile_y", "py",
                     F.explode(F.sequence(F.lit(0), F.lit(grid - 1)))
                     .alias("px"))
             .join(pix, ["tile_x", "tile_y", "px", "py"], "left")
             .select("tile_x", "tile_y", "px", "py",
                     F.coalesce("w", F.lit(0)).alias("w")))
    row_w = (Window.partitionBy("tile_x", "tile_y", "py")
             .orderBy("px").rangeBetween(-radius, radius))
    col_w = (Window.partitionBy("tile_x", "tile_y", "px")
             .orderBy("py").rangeBetween(-radius, radius))
    g1 = F.lit(grid - 1)
    nx = (F.least(F.col("px") + radius, g1)
          - F.greatest(F.col("px") - radius, F.lit(0)) + 1)
    ny = (F.least(F.col("py") + radius, g1)
          - F.greatest(F.col("py") - radius, F.lit(0)) + 1)
    boxed = (dense.withColumn("_rs", F.sum("w").over(row_w))
             .withColumn("box_sum", F.sum("_rs").over(col_w))
             .withColumn("n_box", (nx * ny).cast("long")))
    return (boxed.join(pix.select("tile_x", "tile_y", "px", "py"),
                       ["tile_x", "tile_y", "px", "py"], "inner")
            .select(F.lit(z).cast("int").alias("tile_z"),
                    "tile_x", "tile_y", "px", "py", "w",
                    F.col("box_sum").cast("long").alias("box_sum"),
                    "n_box",
                    (F.col("w") * F.col("n_box")
                     > F.col("box_sum")).cast("int").alias("above")))


def viewshed(pixels: DataFrame, x: str = "gx", y: str = "gy",
             w: str = "w", grid: int = 128) -> DataFrame:
    """2-D radial viewshed over a sparse COUNT raster (C-vs, r5,
    post-window) — the full generalization of line_of_sight's 1-D
    rays: an observer at height 0 sits diagonally outside the grid at
    (-1, -1); a cell's height is its count w (absent cells TRUE
    ZEROS, never occluding); a cell is VISIBLE iff w > 0 and its
    elevation angle w / sqrt(d2), d2 = (gx+1)^2 + (gy+1)^2, STRICTLY
    exceeds every nearer occupied cell's angle on the SAME RAY
    (grazing rays are blocked — the los convention).

    Ray identity is exact: cells share a ray iff their direction
    vectors from the observer are parallel, canonicalized by dividing
    (gx+1, gy+1) by their gcd — computed NATIVELY as a bounded
    sequence-filter HOF (coords are grid-bounded by contract, so the
    divisor scan is <= grid+1 elements, in-plan, zero Python).

    Exactness of the angle order: comparing w_a/sqrt(d2_a) vs
    w_b/sqrt(d2_b) over non-negative heights squares to the exact
    integer comparison w_a^2 * d2_b vs w_b^2 * d2_a; the engine
    carries ang = floor(w^2 * SCALE / d2) with SCALE = (2*grid^2)^2
    >= max(d2)^2, and two DISTINCT rationals w^2/d2 differ by at
    least 1/SCALE — so the floor-scaled BIGINT comparison IS the
    rational comparison (the raster_los theorem, 2-D denominators).
    The DuckDB twin never scales: it cross-multiplies a NOT-EXISTS.

    Scale shape: ONE window shuffle partitioned by the ray class —
    rays are independent, executors sweep disjoint rays; the running
    max over the d2-ordered preceding frame decides visibility.
    Integer codegen end to end."""
    assert grid >= 1
    scale = (2 * grid * grid) ** 2
    from pyspark.sql import Window

    base = pixels.select(F.col(x).cast("long").alias("gx"),
                         F.col(y).cast("long").alias("gy"),
                         F.col(w).cast("long").alias("w"))
    vx, vy = "(gx + 1)", "(gy + 1)"
    g = (f"array_max(filter(sequence(1, least({vx}, {vy})), "
         f"d -> {vx} % d = 0 AND {vy} % d = 0))")
    d2 = f"({vx} * {vx} + {vy} * {vy})"
    t = (base
         .withColumn("_g", F.expr(g))
         .withColumn("rdx", F.expr(f"{vx} DIV _g"))
         .withColumn("rdy", F.expr(f"{vy} DIV _g"))
         .withColumn("d2", F.expr(d2))
         .withColumn("ang", F.expr(f"(w * w * {scale}L) DIV {d2}")))
    win = (Window.partitionBy("rdx", "rdy").orderBy("d2")
           .rowsBetween(Window.unboundedPreceding, -1))
    return (t.withColumn(
        "vis", ((F.col("w") > 0)
                & (F.col("ang") > F.coalesce(F.max("ang").over(win),
                                             F.lit(-1)))).cast("int"))
        .select("gx", "gy", "w", "rdx", "rdy", "d2", "vis"))


def strahler_orders(pixels: DataFrame, x: str = "gx", y: str = "gy",
                    w: str = "w", max_rounds: int = 24,
                    checkpoint_dir: str | None = None) -> DataFrame:
    """C3t (r5 cont.) — Strahler stream order over the D8 flow forest:
    the hydrology family's final member (flowdir → flowacc → basins →
    STRAHLER), the stream-classification number printed on every river
    map.  ord(leaf) = 1; an internal cell's order is its children's
    max m, bumped to m+1 iff >= 2 children attain m.

    Order resolution is HOP-BOUNDED like sssp_int: exactly
    `max_rounds` synchronous rounds, each finalizing every cell whose
    children are all final; cells whose dependency depth exceeds the
    bound emit 0 (an explicit unresolved marker, never a wrong
    order) — the fixed round count is what makes the DuckDB twin an
    exact unrolled-CTE oracle and keeps the engine's job count
    deterministic (no convergence probes).

    Per round: ONE hash equi-join routing child orders to parents +
    TWO map-side-combined aggs — (parent, child_ord) counts, then the
    max-struct fold that yields (max child order, #children at it) in
    one pass (the mode_pyramid argmax idiom; no second join against a
    per-parent max).  The cell frame is bounded by the grid, not the
    row count; round state is materialized (localCheckpoint or
    reliable under `checkpoint_dir`)."""
    fd = flow_dir_d8(pixels, x=x, y=y, w=w)
    dxs = [1, 1, 0, -1, -1, -1, 0, 1]
    dys = [0, 1, 1, 1, 0, -1, -1, -1]
    dx_arr = F.array(*[F.lit(v) for v in dxs])
    dy_arr = F.array(*[F.lit(v) for v in dys])
    cells = fd.select(F.col("gx").alias("cx"), F.col("gy").alias("cy"),
                      "dir")
    edges = (cells.filter(F.col("dir") >= 0)
             .select(F.col("cx").alias("ux"), F.col("cy").alias("uy"),
                     (F.col("cx")
                      + F.element_at(dx_arr, F.col("dir") + 1))
                     .alias("px"),
                     (F.col("cy")
                      + F.element_at(dy_arr, F.col("dir") + 1))
                     .alias("py")))
    edges = materialize(edges, eager=True, checkpoint_dir=checkpoint_dir)
    st = materialize(
        cells.select("cx", "cy", F.lit(0).cast("int").alias("ord")),
        eager=True, checkpoint_dir=checkpoint_dir)
    for _ in range(max_rounds):
        ch = (edges.join(st.select(F.col("cx").alias("ux"),
                                   F.col("cy").alias("uy"),
                                   F.col("ord").alias("c_ord")),
                         ["ux", "uy"])
              .groupBy("px", "py", "c_ord")
              .agg(F.count("*").cast("long").alias("n")))
        par = (ch.groupBy("px", "py")
               .agg(F.sum("n").alias("n_children"),
                    F.sum(F.when(F.col("c_ord") > 0, F.col("n"))
                          .otherwise(0)).alias("n_final"),
                    F.max(F.struct(F.col("c_ord").alias("o"),
                                   F.col("n").alias("cnt"))).alias("m")))
        st = materialize(
            st.join(par.select(F.col("px").alias("cx"),
                               F.col("py").alias("cy"),
                               "n_children", "n_final", "m"),
                    ["cx", "cy"], "left")
              .select(
                  "cx", "cy",
                  F.when(F.col("ord") > 0, F.col("ord"))
                  .when(F.col("n_children").isNull(), F.lit(1))
                  .when((F.col("n_final") == F.col("n_children"))
                        & (F.col("m.o") > 0),
                        F.col("m.o")
                        + F.when(F.col("m.cnt") >= 2, 1).otherwise(0))
                  .otherwise(F.lit(0)).cast("int").alias("ord")),
            eager=True, checkpoint_dir=checkpoint_dir)
    return st.select(F.col("cx").alias("gx"), F.col("cy").alias("gy"),
                     F.col("ord").alias("strahler"))


def strahler_py(cells, dirs, max_rounds: int = 24) -> dict:
    """Sequential reference: same synchronous rounds over a dict."""
    dxs = [1, 1, 0, -1, -1, -1, 0, 1]
    dys = [0, 1, 1, 1, 0, -1, -1, -1]
    parent = {}
    for (cx, cy), d in dirs.items():
        if d >= 0:
            parent[(cx, cy)] = (cx + dxs[d], cy + dys[d])
    children: dict = {c: [] for c in cells}
    for u, p in parent.items():
        children[p].append(u)
    ords = {c: 0 for c in cells}
    for _ in range(max_rounds):
        nxt = dict(ords)
        for c in cells:
            if ords[c] > 0:
                continue
            ch = children[c]
            if not ch:
                nxt[c] = 1
            elif all(ords[u] > 0 for u in ch):
                m = max(ords[u] for u in ch)
                nxt[c] = m + (1 if sum(ords[u] == m for u in ch) >= 2
                              else 0)
        ords = nxt
    return ords
