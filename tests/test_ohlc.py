"""OHLC bars (engine/relops.py::ohlc_bars) vs a brute sequential
oracle, including timestamp ties broken by the sequence column and
negative values.  DuckDB value-hash parity for the ts_ohlc driver key
runs in test_entry_contract's sweep."""

from __future__ import annotations

from collections import defaultdict

from engine.relops import ohlc_bars

# (key, us, seq, v) — bucket width 100 us; ties on us inside buckets
FIX = [
    ("a", 10, 0, 5), ("a", 10, 1, 9),     # tie on us -> seq decides
    ("a", 50, 2, -3), ("a", 150, 3, 7),   # second bucket, single row
    ("a", 250, 5, 2), ("a", 250, 4, 8),   # tie, lower seq=4 opens
    ("b", 0, 6, 1), ("b", 99, 7, 4),      # exact bucket edges
    ("b", 100, 8, -10),
]


def _brute(rows, bucket_us):
    by = defaultdict(list)
    for k, us, seq, v in rows:
        by[(k, us // bucket_us)].append((us, seq, v))
    out = {}
    for kb, items in by.items():
        items.sort()
        vs = [v for _, _, v in items]
        out[kb] = (items[0][2], max(vs), min(vs), items[-1][2],
                   len(items), sum(vs))
    return out


def _run(spark, rows, bucket_us):
    df = spark.createDataFrame(rows, "key string, us long, seq long, v long")
    got = ohlc_bars(df, "key", "us", "seq", "v", bucket_us).collect()
    return {(r["key"], r["bucket"]):
            (r["open_c"], r["high_c"], r["low_c"], r["close_c"],
             r["n"], r["volume_c"]) for r in got}


def test_ohlc_matches_brute(spark):
    assert _run(spark, FIX, 100) == _brute(FIX, 100)


def test_ohlc_randomized_brute(spark, rng):
    rows = [(f"k{int(rng.integers(0, 3))}", int(rng.integers(0, 1000)),
             i, int(rng.integers(-50, 50))) for i in range(400)]
    assert _run(spark, rows, 77) == _brute(rows, 77)


def test_ohlc_single_row_bar(spark):
    got = _run(spark, [("x", 500, 0, 42)], 100)
    assert got == {("x", 5): (42, 42, 42, 42, 1, 42)}


def test_ohlc_partitioning_independent(spark):
    rows = [(f"k{i % 4}", (i * 37) % 900, i, (i * 13) % 21 - 10)
            for i in range(300)]
    df = spark.createDataFrame(rows, "key string, us long, seq long, v long")
    a = sorted(map(tuple, ohlc_bars(df, "key", "us", "seq", "v", 100).collect()))
    b = sorted(map(tuple, ohlc_bars(df.repartition(17), "key", "us", "seq",
                                    "v", 100).collect()))
    assert a == b
