"""Hilbert-curve cell encoding (late r4) — the locality-preserving
alternative to the Morton index in engine/geo/cells.py: consecutive
Hilbert ids are always 4-neighbours in the grid (continuity), so
range scans over a Hilbert-sorted layout touch strictly fewer file
boundaries than Morton's quadrant jumps.  Intended use at scale:
`ORDER BY hilbert` (or repartitionByRange on it) before writing a
spatial layout, exactly where cells.py's Morton id is used today.

Exactness: the encode is the classical per-bit state machine
(reflect+swap), computed bottom-bits-masked so every step's state is
< 2^i — all int64, no floats, bit-identical everywhere.  The
`(3*rx) XOR ry` digit is written as arithmetic `3*rx + ry - 2*rx*ry`
(equal on {0,1}^2) so the Spark fold, the numpy kernel, and the DuckDB
twin share no operator with divergent semantics.

Spark form is a single `aggregate(sequence(level-1, 0, -1), ...)`
higher-order fold — a runtime loop, NOT an unrolled expression tree,
so the codegen'd method stays small (contrast cells.py's NOTE about
the 32x Morton cascade blowup) and the whole encode is one
whole-stage-codegen JVM expression: no Python worker, no shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hilbert_np(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Reference kernel: (x, y) int arrays (< 2^level) -> Hilbert d."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    for i in range(level - 1, -1, -1):
        m = (1 << i) - 1
        rx = (x >> i) & 1
        ry = (y >> i) & 1
        d += (1 << (2 * i)) * (3 * rx + ry - 2 * rx * ry)
        xm = x & m
        ym = y & m
        # ry==0 -> reflect (if rx) then swap; ry==1 -> keep low bits
        x, y = np.where(ry == 0, np.where(rx == 1, m - ym, ym), xm), \
               np.where(ry == 0, np.where(rx == 1, m - xm, xm), ym)
    return d


def hilbert_d2xy_np(d: np.ndarray, level: int):
    """Inverse kernel (tests): Hilbert d -> (x, y)."""
    t = d.astype(np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    for i in range(level):
        s = 1 << i
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        xr = np.where(ry == 0, np.where(rx == 1, s - 1 - y, y), x)
        yr = np.where(ry == 0, np.where(rx == 1, s - 1 - x, x), y)
        x = xr + s * rx
        y = yr + s * ry
        t //= 4
    return x, y


def hilbert_sql(x: str, y: str, level: int) -> str:
    """The encode as ONE native SQL expression: a higher-order
    `aggregate` fold over bit positions level-1 .. 0 with state
    struct(x, y, d).  Feed it column NAMES (or cheap expressions); the
    lambda references its inputs a bounded number of times, so unlike
    the Morton cascade there is no expression blowup."""
    acc0 = (f"named_struct('x', CAST({x} AS BIGINT), "
            f"'y', CAST({y} AS BIGINT), 'd', 0L)")
    m = "(shiftleft(1L, i) - 1L)"
    rx = "(shiftright(acc.x, i) & 1L)"
    ry = "(shiftright(acc.y, i) & 1L)"
    xm = f"(acc.x & {m})"
    ym = f"(acc.y & {m})"
    digit = f"(3L * {rx} + {ry} - 2L * {rx} * {ry})"
    new_x = f"IF({ry} = 0L, IF({rx} = 1L, {m} - {ym}, {ym}), {xm})"
    new_y = f"IF({ry} = 0L, IF({rx} = 1L, {m} - {xm}, {xm}), {ym})"
    new_d = f"acc.d + shiftleft(1L, 2 * i) * {digit}"
    return (f"aggregate(sequence({level - 1}, 0, -1), {acc0}, "
            f"(acc, i) -> named_struct('x', {new_x}, 'y', {new_y}, "
            f"'d', {new_d})).d")


def hilbert_col(x: str, y: str, level: int) -> Column:
    return F.expr(hilbert_sql(x, y, level))


def with_hilbert(df: DataFrame, x: str = "xi", y: str = "yi",
                 level: int = 16, out: str = "hilbert") -> DataFrame:
    return df.withColumn(out, hilbert_col(x, y, level))


def hilbert_duck_sql(src: str, level: int, keep: str = "xi, yi") -> str:
    """DuckDB twin: the SAME state machine UNROLLED into one chained-CTE
    step per bit (DuckDB lacks Spark's aggregate HOF; unrolling `level`
    steps of 4 arithmetic columns is cheap).  `src` must expose columns
    x, y (plus passthrough `keep`); the final relation `h{level - 1}`
    exposes (keep..., x, y, d) with d the Hilbert id."""
    steps = [f"h_seed AS (SELECT {keep}, x, y, CAST(0 AS BIGINT) AS d "
             f"FROM {src})"]
    prev = "h_seed"
    for step, i in enumerate(range(level - 1, -1, -1)):
        m = (1 << i) - 1
        rx = f"((x >> {i}) & 1)"
        ry = f"((y >> {i}) & 1)"
        digit = f"(3 * {rx} + {ry} - 2 * {rx} * {ry})"
        new_x = (f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                 f"THEN {m} - (y & {m}) ELSE (y & {m}) END) "
                 f"ELSE (x & {m}) END")
        new_y = (f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                 f"THEN {m} - (x & {m}) ELSE (x & {m}) END) "
                 f"ELSE (y & {m}) END")
        steps.append(
            f"h{step} AS (SELECT {keep}, {new_x} AS x, {new_y} AS y, "
            f"d + CAST({1 << (2 * i)} AS BIGINT) * {digit} AS d "
            f"FROM {prev})")
        prev = f"h{step}"
    return ", ".join(steps)
