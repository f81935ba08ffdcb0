"""Local replica of the driver's correctness gate: run every
`queries()[key]` on Spark and its `oracle_sql()[key]` on DuckDB at the
given sf dir; compare row count, column-name set, and an
order-insensitive canonicalized value multiset.

Usage: python tools/check_contract.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


def canon(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    if isinstance(v, (np.floating,)):
        return canon(float(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bool):
        return repr(v)
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from engine.session import get_spark
    spark = get_spark("contract-check", master="local[16]",
                      shuffle_partitions=32,
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {key}: spark error {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            failures.append(key)
            continue
        if key not in oracles:
            print(f"rows-only {key}: {len(rows)} rows in {time.time()-t0:.1f}s")
            if len(rows) == 0:
                print(f"  WARNING {key}: zero rows (weak check)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[key])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {key}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            failures.append(key)
            continue
        ok = True
        if sorted(cols) != sorted(dcols):
            print(f"FAIL {key}: columns spark={sorted(cols)} duck={sorted(dcols)}")
            ok = False
        elif len(rows) != len(drows):
            print(f"FAIL {key}: rowcount spark={len(rows)} duck={len(drows)}")
            ok = False
        else:
            a = rowset(cols, rows)
            b = rowset(dcols, drows)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                print(f"FAIL {key}: values differ ({len(diffs)} of {len(a)} rows); "
                      f"first: spark={diffs[0][0][:160]} duck={diffs[0][1][:160]}")
                ok = False
        if ok:
            print(f"PASS {key}: {len(rows)} rows in {time.time()-t0:.1f}s")
            n_pass += 1
        else:
            n_fail += 1
            failures.append(key)

    print(f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail ==")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
