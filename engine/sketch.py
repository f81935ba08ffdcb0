"""Count-min sketch in the exact integer domain (r4 cont.) — the
mergeable frequency sketch beside the built-in HLL (agg_approx_cd) and
the exact heavy-hitter top-K (engine/geo/skew.py).

The sketch is DETERMINISTIC: row i of the depth-d matrix uses the
universal hash h_i(x) = ((a_i * x + b_i) mod p) mod w with p = 2^31-1
and FIXED odd multipliers — pure int64 arithmetic (a_i < 2^31,
x hashed through one splitmix-style fold first so raw ids spread), so
the whole matrix and every estimate is a pure function of the input
multiset and identical on any engine — which is what makes a driver
hash-oracle possible for an *approximate* structure: the
approximation is in the GUARANTEE (est >= truth, off by at most
eps * N with probability 1 - delta), not in any run-to-run wobble.

Scale shape: the matrix build is ONE map-side-combined groupBy over
d * n rows (the per-row explode is a literal array of d struct
expressions, no Python); the matrix itself is d*w rows — broadcast-
sized by construction — so estimates join against it broadcast.
Sketches of disjoint partitions merge by cell-wise addition (the
groupBy IS the merge), the property that makes CMS the streaming /
pre-aggregation structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 2147483647  # 2^31 - 1
# fixed (a, b) rows — odd multipliers, arbitrary but committed
ROWS = ((1103515245, 12345), (69069, 362437), (1664525, 1013904223))
FOLD = 2654435761  # integer spread of raw ids before the affine rows


def _cell(x, a, b, width):
    folded = (x * FOLD) % P
    return ((folded * a + b) % P) % width


def cms_build(df: DataFrame, key_col: str, width: int = 1024) -> DataFrame:
    """-> (row, cell, n): the depth-3 count-min matrix of key_col's
    frequency multiset.  One exchange (map-side combined)."""
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 _cell(F.col(key_col), a, b, width).cast("long")
                 .alias("cell"))
        for i, (a, b) in enumerate(ROWS)])
    return (df.select(F.explode(cells).alias("_c"))
            .groupBy(F.col("_c.row").alias("row"),
                     F.col("_c.cell").alias("cell"))
            .agg(F.count("*").cast("long").alias("n")))


def cms_estimate(cms: DataFrame, probes: DataFrame, key_col: str,
                 width: int = 1024) -> DataFrame:
    """probes (key_col) x cms -> (key, cms_est): min over the d rows.
    The matrix side is d*w rows — broadcast it."""
    pc = probes.select(
        F.col(key_col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     _cell(F.col(key_col), a, b, width).cast("long")
                     .alias("cell"))
            for i, (a, b) in enumerate(ROWS)])).alias("_c"))
    j = (pc.select(key_col, F.col("_c.row").alias("row"),
                   F.col("_c.cell").alias("cell"))
         .join(F.broadcast(cms), ["row", "cell"], "left")
         .withColumn("n", F.coalesce("n", F.lit(0))))
    return (j.groupBy(key_col)
            .agg(F.min("n").cast("long").alias("cms_est")))
