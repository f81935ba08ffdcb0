"""Hierarchical S2-style cell index: vectorized Morton cells on the
Web-Mercator grid (SURVEY.md §2 C1/C2/C4; spec FIXTURES.md §3).

BASELINE.json:6 — rows are "encoded to H3/S2 cells via vectorized
pandas/Arrow UDFs (batched cell encode, no per-row Python)".  The encode
is a scalar pandas UDF over whole Arrow batches (numpy bit ops); parent /
prefix extraction is a *native* column expression (shiftright) so it stays
inside whole-stage codegen and never crosses the Python boundary.

Scale note: the cell id is a single int64 — prefix joins, range pruning
and partitioning all work on a primitive column, which is the cheapest
possible shuffle key at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from oracle.geo import LEVEL, MAX_LAT

_U = np.uint64  # numpy promotes uint64 op python-int to float64; pin dtype


# ------------------------------------------------------------ numpy kernel

def merc_xy_np(lon: np.ndarray, lat: np.ndarray, level: int = LEVEL):
    """Vectorized FIXTURES.md §3 grid coords. Returns (xi, yi) int64 arrays."""
    n = float(1 << level)
    lat = np.clip(lat, -MAX_LAT, MAX_LAT)
    mx = (lon + 180.0) / 360.0
    my = (1.0 - np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) / np.pi) / 2.0
    xi = np.floor(mx * n).astype(np.int64)
    yi = np.floor(my * n).astype(np.int64)
    hi = np.int64((1 << level) - 1)
    return np.clip(xi, 0, hi), np.clip(yi, 0, hi)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread 32-bit values so bits land in even positions (uint64)."""
    v = v.astype(_U)
    v = (v | (v << _U(16))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v << _U(8))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _U(2))) & _U(0x3333333333333333)
    v = (v | (v << _U(1))) & _U(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather even-position bits back together."""
    v = v.astype(_U) & _U(0x5555555555555555)
    v = (v | (v >> _U(1))) & _U(0x3333333333333333)
    v = (v | (v >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> _U(4))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v >> _U(8))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v >> _U(16))) & _U(0x00000000FFFFFFFF)
    return v


def morton_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave (x even bits, y odd bits) -> int64 Morton ids."""
    return (_part1by1(x) | (_part1by1(y) << _U(1))).astype(np.int64)


def demorton_np(cell: np.ndarray):
    """Morton ids -> (x, y) int64 arrays."""
    c = cell.astype(_U)
    return (
        _compact1by1(c).astype(np.int64),
        _compact1by1(c >> _U(1)).astype(np.int64),
    )


def cell_encode_np(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    xi, yi = merc_xy_np(lon, lat, LEVEL)
    return morton_np(xi, yi)


# --------------------------------------------------------- spark operators

_SPREAD_MASKS = ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                 (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                 (1, 0x5555555555555555))


def part1by1_sql(e: str) -> str:
    """SQL-text twin of _part1by1: spread a 32-bit value to even bits.
    Pure integer ops — stays inside whole-stage codegen."""
    for s, m in _SPREAD_MASKS:
        e = f"((({e}) | (({e}) << {s})) & {m}L)"
    return e


def compact1by1_sql(e: str) -> str:
    """SQL-text twin of _compact1by1: gather even bits back together."""
    e = f"(({e}) & {0x5555555555555555}L)"
    for s, m in ((1, 0x3333333333333333), (2, 0x0F0F0F0F0F0F0F0F),
                 (4, 0x00FF00FF00FF00FF), (8, 0x0000FFFF0000FFFF),
                 (16, 0x00000000FFFFFFFF)):
        e = f"((({e}) | (({e}) >> {s})) & {m}L)"
    return e


def merc_xy_sql(lon_col: str, lat_col: str, level: int = LEVEL) -> tuple[str, str]:
    """Native grid-coordinate expressions (FIXTURES.md §3). Operand order
    matches merc_xy_np exactly; verified bit-identical to the numpy/
    DuckDB forms on the driver corpus (0 mismatches / 1500 pts)."""
    n = float(1 << level)
    hi = float((1 << level) - 1)
    lat_c = f"least(greatest({lat_col}, {-MAX_LAT!r}D), {MAX_LAT!r}D)"
    xi = (f"greatest(least(CAST(floor((({lon_col} + 180.0D)/360.0D) * {n!r}D) "
          f"AS BIGINT), CAST({hi!r}D AS BIGINT)), 0L)")
    yi = (f"greatest(least(CAST(floor(((1.0D - ln(tan(pi()/4.0D + "
          f"radians({lat_c})/2.0D))/pi())/2.0D) * {n!r}D) AS BIGINT), "
          f"CAST({hi!r}D AS BIGINT)), 0L)")
    return xi, yi


def cell_encode_col(lon_col: str = "lon", lat_col: str = "lat") -> Column:
    """C1, native form — the whole encode (mercator + Morton interleave)
    as one JVM column expression: no Python worker in the hot path, and
    the Morton cascade is the same magic-mask sequence as the numpy
    kernel, so values are identical (floor-boundary agreement between
    JVM and C libm verified empirically; the numpy UDF form remains the
    reference kernel for tests).

    NOTE for callers composing manually: the bit cascade references its
    input 32x — feed it a *column*, never an inline ln/tan expression,
    or the expression tree (and the generated Java) blows up ~64x.
    `with_cell` binds xi/yi as intermediate columns for exactly this
    reason."""
    xi, yi = merc_xy_sql(lon_col, lat_col)
    return F.expr(f"({part1by1_sql(xi)} | ({part1by1_sql(yi)} << 1))")


@F.pandas_udf(LongType())
def cell_encode_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
    """C1 — batched Arrow/numpy encode (reference kernel; same values as
    cell_encode_col)."""
    return pd.Series(cell_encode_np(lon.to_numpy(np.float64), lat.to_numpy(np.float64)))


def with_cell(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
              out: str = "cell", native: bool = True) -> DataFrame:
    """Attach the level-30 cell id column (native codegen by default;
    `native=False` selects the Arrow-batched numpy kernel)."""
    if native:
        xi, yi = merc_xy_sql(lon_col, lat_col)
        return (
            df.withColumn("_cx", F.expr(xi)).withColumn("_cy", F.expr(yi))
            .withColumn(out, F.expr(
                f"({part1by1_sql('_cx')} | ({part1by1_sql('_cy')} << 1))"))
            .drop("_cx", "_cy")
        )
    return df.withColumn(out, cell_encode_udf(F.col(lat_col), F.col(lon_col)))


def cell_parent_col(cell: Column | str, level: int) -> Column:
    """C2 — native prefix extraction; no UDF, stays in codegen."""
    c = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftright(c, 2 * (LEVEL - level))


def with_cell_prefix(df: DataFrame, level: int, cell_col: str = "cell",
                     out: str | None = None) -> DataFrame:
    return df.withColumn(out or f"cell_p{level}", cell_parent_col(cell_col, level))


def ring_cells_np(x: int, y: int, z: int, k: int) -> np.ndarray:
    """Vectorized ring k (exact Chebyshev distance) around (x, y) at level z."""
    n = 1 << z
    if k == 0:
        if 0 <= y < n:
            return morton_np(np.array([x], np.int64), np.array([y], np.int64))
        return np.empty(0, np.int64)
    d = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    mask = np.maximum(np.abs(dx), np.abs(dy)) == k
    nx = (x + dx[mask]) % n
    ny = y + dy[mask]
    keep = (ny >= 0) & (ny < n)
    return np.unique(morton_np(nx[keep], ny[keep]))


def disk_cells_np(x: int, y: int, z: int, k: int) -> np.ndarray:
    """Union of rings 0..k (kNN candidate block)."""
    n = 1 << z
    d = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    nx = (x + dx.ravel()) % n
    ny = y + dy.ravel()
    keep = (ny >= 0) & (ny < n)
    return np.unique(morton_np(nx[keep], ny[keep]))


def make_disk_udf(level: int, k: int):
    """C4 — pandas UDF: level-`level` cell id -> array of disk-k neighbor
    cell ids (explode downstream to build kNN candidates)."""

    @F.pandas_udf(ArrayType(LongType()))
    def disk_udf(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy(np.int64)
        x, y = demorton_np(c)
        return pd.Series(
            [disk_cells_np(int(xv), int(yv), level, k) for xv, yv in zip(x, y)]
        )

    return disk_udf


def dilate_cells(df: DataFrame, level: int, k: int,
                 cell_col: str = "cell",
                 group_cols: tuple[str, ...] = ("poly_id",)) -> DataFrame:
    """Morphological buffering of a cell covering at a fixed level
    (C-bf): every cell within Chebyshev grid distance <= ``k`` of a
    covering cell joins the covering — the covering-domain analog of
    vector ST_Buffer, sharing ring semantics with ``ring_cells_np``
    (x wraps across the antimeridian, out-of-range y rows drop at the
    poles).  Output is the distinct dilated (group_cols..., cell)
    frame at the same level; feed it to ``compact_cells`` for the
    minimal mixed-level buffered covering.

    Scale shape: deinterleave and re-interleave are the native Morton
    bit cascades (whole-stage codegen, no Python worker), the
    (2k+1)^2 fan-out is an explode of a constant literal sequence,
    and the only shuffle is the terminal distinct on the skinny
    (group, cell) frame.  Coverings are layer metadata — this never
    touches the fact table.
    """
    assert k >= 0 and 0 < level <= LEVEL
    n = 1 << level
    gcols = [F.col(c) for c in group_cols]
    d = F.sequence(F.lit(-k), F.lit(k))
    return (
        df.select(*group_cols, F.col(cell_col).alias("_c"))
        .withColumn("_x", F.expr(compact1by1_sql("_c")))
        .withColumn("_y", F.expr(compact1by1_sql("(_c >> 1)")))
        .withColumn("_dx", F.explode(d))
        .withColumn("_dy", F.explode(d))
        .withColumn("_nx", F.pmod(F.col("_x") + F.col("_dx"), F.lit(n)))
        .withColumn("_ny", F.col("_y") + F.col("_dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .select(*gcols, F.expr(
            f"({part1by1_sql('_nx')} | ({part1by1_sql('_ny')} << 1))"
        ).alias("cell"))
        .distinct()
    )


def erode_cells(df: DataFrame, level: int, k: int,
                cell_col: str = "cell",
                group_cols: tuple[str, ...] = ("poly_id",)) -> DataFrame:
    """Morphological erosion of a cell covering at a fixed level
    (C-er): a cell survives iff its ENTIRE Chebyshev disk of radius
    ``k`` lies inside the group's covering — the dual of
    ``dilate_cells``, with the same edge semantics read as a closed
    boundary: x wraps across the antimeridian, while a disk that
    pokes past the y range has a missing neighbor and erodes (the
    pole rows are treated as outside, exactly as dilation drops them).

    Scale shape: the inverted volunteer idiom — every covering cell
    explodes its (2k+1)^2 support offsets toward the CENTERS it
    backs, support meets in ONE map-side-combined count agg, and an
    inner join back to the covering keeps cells whose support is
    complete ((2k+1)^2 voters).  Native Morton cascades end to end,
    no Python, skinny (group, cell) frames only.
    """
    assert k >= 0 and 0 < level <= LEVEL
    n = 1 << level
    full = (2 * k + 1) ** 2
    gcols = [F.col(c) for c in group_cols]
    d = F.sequence(F.lit(-k), F.lit(k))
    base = (df.select(*group_cols, F.col(cell_col).alias("cell"))
            .distinct())
    votes = (base
             .withColumn("_x", F.expr(compact1by1_sql("cell")))
             .withColumn("_y", F.expr(compact1by1_sql("(cell >> 1)")))
             .withColumn("_dx", F.explode(d))
             .withColumn("_dy", F.explode(d))
             # the cell at (_x, _y) SUPPORTS the center displaced by
             # (-dx, -dy); centers whose disk leaves the y range can
             # never reach full support, so no clamping is needed
             .withColumn("_nx", F.pmod(F.col("_x") + F.col("_dx"),
                                       F.lit(n)))
             .withColumn("_ny", F.col("_y") + F.col("_dy"))
             .filter((F.col("_ny") >= 0) & (F.col("_ny") < n))
             .select(*gcols, F.expr(
                 f"({part1by1_sql('_nx')} | ({part1by1_sql('_ny')} << 1))"
             ).alias("cell"))
             .groupBy(*group_cols, "cell")
             .agg(F.count(F.lit(1)).alias("_sup")))
    return (base.join(votes.filter(F.col("_sup") == full),
                      [*group_cols, "cell"], "inner")
            .select(*gcols, "cell"))


def compact_cells(df: DataFrame, level: int, min_level: int,
                  cell_col: str = "cell",
                  group_cols: tuple[str, ...] = ("poly_id",)) -> DataFrame:
    """S2-style covering compaction (``S2CellUnion::Normalize`` semantics):
    wherever all four children of a parent cell are present in a group's
    covering, replace them by the parent, repeated down to ``min_level``.
    Input rows are distinct level-``level`` cells per group; output is the
    mixed-level minimal covering ``(group_cols..., level:int, cell:long)``
    covering exactly the same leaf area (oracle/geo.py
    ``compact_cells_py`` is the sequential twin).

    Scale shape: one window shuffle per level step, all on the skinny
    (group, cell) frame — no distinct/anti-join passes.  A complete quad
    is detected with a count window over (group, parent) and the parent
    row is emitted by keeping exactly the child with ``cell & 3 == 0``
    (children of one parent are parent*4 + {0,1,2,3}), so promotion
    needs no dedup shuffle.  The loop is driver-side but bounded by
    ``level - min_level`` (a constant); every iteration's frame shrinks.
    Coverings are layer metadata (polygons × cells, millions of rows at
    most) — this never touches the 10^12-row fact table.
    """
    from pyspark.sql import Window

    assert 0 <= min_level < level <= LEVEL
    gcols = [F.col(c) for c in group_cols]
    cur = df.select(*group_cols, F.col(cell_col).alias("cell"))
    finalized = []
    for lv in range(level, min_level, -1):
        w = Window.partitionBy(*group_cols, F.shiftright("cell", 2))
        cur = cur.withColumn("_qn", F.count(F.lit(1)).over(w))
        finalized.append(
            cur.filter(F.col("_qn") < 4)
            .select(*gcols, F.lit(lv).alias("level"), "cell"))
        cur = (cur.filter((F.col("_qn") == 4) & (F.col("cell").bitwiseAND(3) == 0))
               .select(*gcols, F.shiftright("cell", 2).alias("cell")))
    out = finalized[0]
    for f in finalized[1:]:
        out = out.unionByName(f)
    return out.unionByName(
        cur.select(*gcols, F.lit(min_level).alias("level"), "cell"))
