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


# --- r4 type-parity audit (VERDICT r3 "What's wrong" #3) -------------
# The r2/r3 driver-vs-local reds (pipeline_resume, pack_sequences) were
# caused by DuckDB HUGEINT outputs: `.fetchall()` converts int128 to
# Python int (masking the divergence locally) while arrow/pandas fetch
# paths surface decimal128/float64 that hash differently from Spark's
# int64.  The gate now REJECTS any oracle output column whose DuckDB
# type is not in the portable whitelist, and any column whose type
# CLASS (int/float/str/bool/ts/list) differs between the two engines —
# so this failure class is caught locally before the driver sees it.

_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts", "DATE": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "BLOB": "binary",
}


def _spark_class(dt: str):
    dt = dt.lower()
    if dt.startswith(("array", "map", "struct")):
        return "list"
    return {
        "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
        "float": "float", "double": "float",
        "string": "str", "boolean": "bool",
        "timestamp": "ts", "date": "ts", "timestamp_ntz": "ts",
        "binary": "binary",
    }.get(dt, dt)


def type_audit(key, spark_dtypes, duck_types):
    """Return a list of human-readable type-parity violations.
    `duck_types` is [(col, duckdb_type_string), ...] from DESCRIBE."""
    bad = []
    sp = {c: _spark_class(t) for c, t in spark_dtypes}
    for name, tname in duck_types:
        tname = str(tname).upper()
        if tname.endswith("[]") or tname.startswith(("LIST", "STRUCT", "MAP")):
            dclass = "list"
        elif tname in _DUCK_CLASS:
            dclass = _DUCK_CLASS[tname]
        else:
            # HUGEINT, DECIMAL, UBIGINT, UHUGEINT, INTERVAL, ...: these
            # surface as decimal128/object through arrow-based fetch
            # paths and hash differently from Spark's native types.
            bad.append(f"{name}: non-portable duckdb type {tname} "
                       "— CAST it in the oracle SQL")
            continue
        if name in sp and sp[name] != dclass:
            bad.append(f"{name}: type-class mismatch spark={sp[name]} "
                       f"duck={dclass} ({tname})")
    return bad


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
            duck_types = [(r[0], r[1]) for r in
                          con.execute("DESCRIBE " + oracles[key]).fetchall()]
            res = con.execute(oracles[key])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {key}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            failures.append(key)
            continue
        ok = True
        viol = type_audit(key, df.dtypes, duck_types)
        if viol:
            print(f"FAIL {key}: type-parity violations: {'; '.join(viol)}")
            n_fail += 1
            failures.append(key)
            continue
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
