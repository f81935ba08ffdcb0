"""OHLC partial-merge law (engine/relops.py::ohlc_partials/ohlc_merge):
merging partials of ANY disjoint split of the input equals ohlc_bars of
the whole — the theorem the stream_ohlc driver key rests on (its oracle
is the batch ts_ohlc twin verbatim).  DuckDB value-hash parity for the
driver key itself runs in test_entry_contract's sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.relops import ohlc_bars, ohlc_merge, ohlc_partials

COLS = ("key", "us", "seq", "v")
BUCKET_US = 100

ROWS = [
    # key A, bucket 0: open at us=1 (seq ties broken by seq), close us=99
    ("A", 1, 2, 50), ("A", 1, 1, 70), ("A", 40, 3, 10), ("A", 99, 4, 60),
    # key A, bucket 1: single row
    ("A", 150, 5, 30),
    # key B, bucket 0: equal-us ties at both ends, split across chunks
    ("B", 5, 10, 90), ("B", 5, 11, 20), ("B", 80, 12, 40), ("B", 80, 13, 55),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, us long, seq long, v long")


def _bars(df):
    return ohlc_bars(df, "key", "us", "seq", "v", BUCKET_US)


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_merge_law_three_way_split(spark):
    whole = _canon(_bars(_df(spark, ROWS)))
    chunks = [ROWS[0:3], ROWS[3:6], ROWS[6:]]
    parts = None
    for ch in chunks:
        p = ohlc_partials(_df(spark, ch), "key", "us", "seq", "v", BUCKET_US)
        parts = p if parts is None else parts.unionByName(p)
    merged = _canon(ohlc_merge(parts))
    assert merged == whole


def test_merge_law_tie_split_across_chunks(spark):
    # the two equal-us open candidates of key B land in DIFFERENT
    # partials: the merge must still pick seq=10 (the total order)
    whole = _canon(_bars(_df(spark, ROWS)))
    left = [r for i, r in enumerate(ROWS) if i % 2 == 0]
    right = [r for i, r in enumerate(ROWS) if i % 2 == 1]
    parts = ohlc_partials(_df(spark, left), "key", "us", "seq", "v",
                          BUCKET_US).unionByName(
        ohlc_partials(_df(spark, right), "key", "us", "seq", "v",
                      BUCKET_US))
    assert _canon(ohlc_merge(parts)) == whole


def test_single_partial_is_identity(spark):
    df = _df(spark, ROWS)
    parts = ohlc_partials(df, "key", "us", "seq", "v", BUCKET_US)
    assert _canon(ohlc_merge(parts)) == _canon(_bars(df))
    assert ohlc_merge(parts).columns == _bars(df).columns


def test_merge_idempotent_on_remerge(spark):
    # merging a merge of partials with more partials still agrees:
    # fold chunk 1+2, then bring chunk 3 in via its own partials
    df12 = _df(spark, ROWS[:6])
    df3 = _df(spark, ROWS[6:])
    p12 = ohlc_partials(df12, "key", "us", "seq", "v", BUCKET_US)
    p3 = ohlc_partials(df3, "key", "us", "seq", "v", BUCKET_US)
    merged = _canon(ohlc_merge(p12.unionByName(p3)))
    assert merged == _canon(_bars(_df(spark, ROWS)))


def test_partials_bounded_rows(spark):
    # one row per (key, bucket) touched — never raw events
    p = ohlc_partials(_df(spark, ROWS), "key", "us", "seq", "v", BUCKET_US)
    n_groups = _df(spark, ROWS).select(
        "key", F.expr(f"us DIV {BUCKET_US}")).distinct().count()
    assert p.count() == n_groups < len(ROWS)
