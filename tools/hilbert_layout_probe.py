"""Hilbert vs Morton layout evidence (late r4).

Two measurements, both about what a 100 TB object store actually pays:

1. RANGE-FRAGMENTATION (exact, no IO): a bbox query against a
   curve-ordered layout fetches the curve-index ranges covering the
   box; each maximal contiguous range is one sequential read / one
   listing prefix.  For random z-grid bboxes we count maximal runs of
   in-box cells along each curve — fewer runs = fewer seeks/requests.

2. FILE PRUNING (real layouts): N synthetic points written three ways
   (hash-shuffled baseline, Morton range-sorted, Hilbert range-sorted,
   same file count); per-file parquet footer min/max of (xi, yi) —
   exactly the stats any engine prunes scans with — are checked
   against a ~1%-of-space bbox; we report how many files a pruning
   reader must touch per layout.

Usage: python tools/hilbert_layout_probe.py [--n 5000000] [--files 256]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def range_fragmentation(level: int = 7, n_boxes: int = 200,
                        seed: int = 1) -> dict:
    from engine.geo.cells import morton_np
    from engine.geo.hilbert import hilbert_np

    n = 1 << level
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    hil = hilbert_np(xs, ys, level)
    mor = morton_np(xs.astype(np.uint64), ys.astype(np.uint64))
    r = np.random.default_rng(seed)
    runs_h, runs_m, wins, ties = [], [], 0, 0
    for _ in range(n_boxes):
        w = int(r.integers(2, n // 2))
        h = int(r.integers(2, n // 2))
        x0 = int(r.integers(0, n - w))
        y0 = int(r.integers(0, n - h))
        inbox = ((xs >= x0) & (xs < x0 + w) & (ys >= y0) & (ys < y0 + h))

        def runs(order):
            d = np.sort(order[inbox])
            return int(1 + (np.diff(d) > 1).sum())

        rh, rm = runs(hil), runs(mor)
        runs_h.append(rh)
        runs_m.append(rm)
        wins += rh < rm
        ties += rh == rm
    return {
        "grid": f"{n}x{n}", "n_boxes": n_boxes,
        "mean_runs_hilbert": round(float(np.mean(runs_h)), 1),
        "mean_runs_morton": round(float(np.mean(runs_m)), 1),
        "hilbert_fewer_pct": round(100.0 * wins / n_boxes, 1),
        "tie_pct": round(100.0 * ties / n_boxes, 1),
    }


def file_pruning(n: int, files: int) -> dict:
    import pyarrow.parquet as pq

    from engine.geo.hilbert import hilbert_sql
    from engine.session import get_spark

    spark = get_spark("hilbert_probe", master="local[32]",
                      shuffle_partitions=max(files, 32),
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    level = 16
    pts = (spark.range(n)
           .selectExpr(
               f"CAST((id * 2654435761) % {1 << level} AS BIGINT) AS xi",
               f"CAST((id * 40503 + 7) % {1 << level} AS BIGINT) AS yi"))
    pts = pts.withColumn("hilbert", F.expr(hilbert_sql("xi", "yi", level)))
    from engine.geo.cells import part1by1_sql
    pts = pts.withColumn("morton", F.expr(
        f"({part1by1_sql('xi')}) | (({part1by1_sql('yi')}) << 1)"))

    base = tempfile.mkdtemp(prefix="hilprobe_")
    layouts = {}
    pts.repartition(files).write.mode("overwrite") \
        .parquet(f"{base}/shuffled")
    pts.repartitionByRange(files, "morton").sortWithinPartitions("morton") \
        .write.mode("overwrite").parquet(f"{base}/morton")
    pts.repartitionByRange(files, "hilbert") \
        .sortWithinPartitions("hilbert") \
        .write.mode("overwrite").parquet(f"{base}/hilbert")

    # ~1% of space: a 0.1 x 0.1 fraction bbox in the middle
    m = 1 << level
    x0, x1 = int(0.45 * m), int(0.55 * m)
    y0, y1 = int(0.45 * m), int(0.55 * m)
    out = {}
    for name in ("shuffled", "morton", "hilbert"):
        total, touched = 0, 0
        for f in glob.glob(f"{base}/{name}/*.parquet"):
            total += 1
            md = pq.ParquetFile(f).metadata
            sch = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            overlap = False
            for rg in range(md.num_row_groups):
                sx = md.row_group(rg).column(sch["xi"]).statistics
                sy = md.row_group(rg).column(sch["yi"]).statistics
                if (sx.min <= x1 - 1 and sx.max >= x0
                        and sy.min <= y1 - 1 and sy.max >= y0):
                    overlap = True
                    break
            touched += overlap
        out[name] = {"files": total, "touched": touched}
    # ground truth rows in the box (sanity that the bbox is ~1%)
    nbox = pts.where(f"xi >= {x0} AND xi < {x1} AND yi >= {y0} "
                     f"AND yi < {y1}").count()
    out["bbox_rows"] = nbox
    out["bbox_frac"] = round(nbox / n, 4)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--files", type=int, default=256)
    ap.add_argument("--skip-io", action="store_true")
    args = ap.parse_args()
    res = {"range_fragmentation": range_fragmentation()}
    if not args.skip_io:
        res["file_pruning"] = file_pruning(args.n, args.files)
        res["n"] = args.n
    print(json.dumps(res))


if __name__ == "__main__":
    main()
