"""STR (Sort-Tile-Recursive) bulk R-tree packing (late r4) — the
bulk-load layout step of a distributed spatial index: boxes are packed
into pages of <= page_size entries by the classical STR sweep (sort by
x-center -> cut into vertical slabs -> sort each slab by y-center ->
cut into pages), producing near-square page MBRs with low overlap.
At 100 TB this IS how you build the spatial index: the page MBRs are
the index (a broadcastable directory), the page ids are the file/bucket
layout keys.

Exactness: centers are kept DOUBLED (xmin+xmax — no halving, no
floats); all cuts are integer division of EXACT 0-based global ranks
with the row id as total-order tie-break, so the packing is a pure
function of the input set — bit-identical under any partitioning.

Scale shape — the interesting part is the exact DISTRIBUTED rank:
`global_rank` range-repartitions by the sort key, ranks WITHIN each
partition (an ordinary partitioned window, no single-reducer global
window), counts rows per partition (one tiny row each), prefix-sums
those counts driver-free in a bounded window, and broadcast-joins the
offsets back.  Two narrow shuffles, no collect of data rows, no
1-partition bottleneck.  The second (in-slab) rank partitions by slab
— at extreme scale a single slab is still ~n/sqrt(P) rows; if that
ever exceeds one reducer's comfort, the same global_rank trick nests
(documented, not needed at bench scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols, out: str = "_rank",
                n_parts: int | None = None) -> DataFrame:
    """EXACT 0-based global rank by `order_cols` (must be a total
    order, e.g. tie-broken by a unique id) without a single-partition
    window.  Adds column `out`; correctness is independent of the
    sampled range boundaries (rank is a function of the total order)."""
    cols = list(order_cols)
    parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    d = (df.repartitionByRange(parts, *cols)
         .withColumn("_pid", F.spark_partition_id()))
    w = Window.partitionBy("_pid").orderBy(*cols)
    d = d.withColumn("_r", F.row_number().over(w))
    counts = d.groupBy("_pid").agg(F.count("*").alias("_c"))
    cw = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (counts
            .withColumn("_off", F.coalesce(F.sum("_c").over(cw), F.lit(0)))
            .drop("_c"))
    return (d.join(F.broadcast(offs), "_pid")
            .withColumn(out, (F.col("_off") + F.col("_r") - 1).cast("long"))
            .drop("_pid", "_r", "_off"))


def str_pack(boxes: DataFrame, page_size: int = 16,
             n_slabs: int | None = None, id_col: str = "id") -> DataFrame:
    """boxes (id, xmin, ymin, xmax, ymax ints) -> one row per box:
    (id, page_id, slab, page_xmin/ymin/xmax/ymax, page_count).

    n_slabs defaults to the classical ceil(sqrt(ceil(n/page_size)))
    (computed from one count() scalar — a single tiny job)."""
    n = boxes.count()
    if n == 0:
        raise ValueError("str_pack: empty input")
    n_pages = -(-n // page_size)
    s = n_slabs or (math.isqrt(n_pages - 1) + 1 if n_pages > 1 else 1)
    slab_rows = -(-n // s)
    pages_per_slab = -(-slab_rows // page_size)

    d = boxes.withColumn("_cx2", F.col("xmin") + F.col("xmax")) \
             .withColumn("_cy2", F.col("ymin") + F.col("ymax"))
    d = global_rank(d, ["_cx2", id_col])
    d = d.withColumn("slab", F.expr(f"_rank DIV {slab_rows}").cast("long"))
    w2 = Window.partitionBy("slab").orderBy("_cy2", id_col)
    d = (d.withColumn("_r2", F.row_number().over(w2) - 1)
         .withColumn("page_id",
                     (F.col("slab") * pages_per_slab
                      + F.expr(f"_r2 DIV {page_size}")).cast("long"))
         .drop("_cx2", "_cy2", "_rank", "_r2"))
    mbr = d.groupBy("page_id").agg(
        F.min("xmin").alias("page_xmin"), F.min("ymin").alias("page_ymin"),
        F.max("xmax").alias("page_xmax"), F.max("ymax").alias("page_ymax"),
        F.count("*").alias("page_count"))
    return d.join(F.broadcast(mbr), "page_id").select(
        id_col, "page_id", "slab", "xmin", "ymin", "xmax", "ymax",
        "page_xmin", "page_ymin", "page_xmax", "page_ymax", "page_count")
