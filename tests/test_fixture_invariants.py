"""Pins the testdata properties the oracle-parity arguments rest on.

1. Every money/value column is a 2-decimal double.  Then a SINGLE-factor
   `round(x*100)` is tie-free — x*100 sits within ~1e-9 of an integer,
   never near a .5 boundary — so the integer-cents oracles used
   throughout `__spark_entry__` are exact and engine/libm-independent.
   (Products of two rounded doubles have genuine .5 ties and stay in the
   pure integer domain instead: q_project, q_pipeline_resume.)
2. documents.text has no degenerate rows (empty / all-space / <4 bytes):
   the minhash/simhash SQL twins emit no shingles for <4-byte texts
   (the numpy kernel zero-pads), and chars_per_pretoken would hit the
   nullif(x, 0) guard.  If the fixture ever changes, this fails before a
   driver hash does.
"""

from __future__ import annotations

import duckdb
import pytest

MONEY_COLS = [
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_quantity"),
    ("orders", "o_totalprice"),
    ("events", "value"),
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("table,col", MONEY_COLS)
def test_money_columns_are_two_decimal(duck, sf, table, col):
    ok = duck.execute(
        f"SELECT bool_and(abs({col} * 100 - round({col} * 100)) < 1e-6) "
        f"FROM read_parquet('{sf}/{table}.parquet') WHERE {col} IS NOT NULL"
    ).fetchone()[0]
    assert ok, f"{table}.{col} at {sf} is not 2-decimal: round(x*100) ties possible"


@pytest.mark.parametrize("sf", SF_DIRS)
def test_documents_have_no_degenerate_texts(duck, sf):
    n_bad = duck.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf}/documents.parquet') "
        "WHERE text IS NULL OR length(text) < 4 OR trim(text) = ''"
    ).fetchone()[0]
    assert n_bad == 0, f"{n_bad} degenerate documents at {sf}"


@pytest.mark.parametrize("sf", SF_DIRS)
def test_dedup_corpora_stay_under_max_bucket(duck, sf, spark):
    """r4 ADVICE: the minhash/simhash/phash driver keys run the banded
    path with the default max_bucket=4096 degenerate-bucket guard while
    their oracles are exact all-pairs SQL — so if any (band, bucket)
    ever exceeded the guard at a driver sf, the engine would (by
    documented design) drop cross-cluster member pairs and the key would
    red even though the engine behaves as specified.  Pin the fixture
    fact that makes this impossible: every dedup corpus at the driver
    sfs is SMALLER than max_bucket, so no bucket can ever reach it (a
    bucket holds at most the whole corpus), and the structural audit
    finds zero oversized minhash buckets."""
    from engine.text.dedup import oversized_bucket_stats
    import __spark_entry__ as entry_mod

    max_bucket = 4096
    n_docs = duck.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert n_docs + 20 < max_bucket, (
        f"dup-injected documents corpus at {sf} ({n_docs + 20}) reaches "
        "max_bucket: the driver dedup keys could shed pairs by design")
    # phash corpus: 400 generated images + 40 injected dups, sf-free
    assert 400 + 40 < max_bucket
    # structural check with the driver key's exact parameters
    docs = entry_mod._docs_with_dups(spark, sf)
    assert oversized_bucket_stats(docs, max_bucket=max_bucket).count() == 0


@pytest.mark.parametrize("sf", SF_DIRS + ["/root/testdata/sf0.1"])
def test_dwithin_radii_have_boundary_margin(duck, sf):
    """3. join_dwithin's float haversine filter is cross-libm stable at
    the committed sfs: no point sits within 100 m of any query-circle
    boundary (libm trig differs across engines by ~1e-9 m here), and no
    in-radius distance sits within 1e-4 of a dist_m=round(d,1) rounding
    boundary.  Fails before a driver hash would if the fixture or the
    DWITHIN_QUERIES constants change."""
    import numpy as np

    import __spark_entry__ as entry

    ck = duck.execute(
        f"SELECT c_custkey FROM read_parquet('{sf}/customer.parquet')"
    ).fetchnumpy()["c_custkey"].astype(np.int64)
    lon = ((ck * 2654435761) % 360000000) / 1e6 - 180.0
    lat = ((ck * 40503 + 7) % 170000000) / 1e6 - 85.0
    p = np.pi / 180.0
    for qid, qla, qlo, rad in entry.DWITHIN_QUERIES:
        d = 2 * 6371000.0 * np.arcsin(np.minimum(1.0, np.sqrt(
            np.sin((qla - lat) * p / 2) ** 2
            + np.cos(lat * p) * np.cos(qla * p)
            * np.sin((qlo - lon) * p / 2) ** 2)))
        assert np.abs(d - rad).min() > 100.0, f"qid {qid} radius margin"
        inside = d[d <= rad]
        if inside.size:
            frac = np.abs((inside * 10) % 1 - 0.5).min()
            assert frac > 1e-4, f"qid {qid} rounding margin"
