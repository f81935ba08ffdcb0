"""D22 — encoded-polyline trajectories: published vector, pure-Python
reference parity, decode roundtrip, partitioning invariance, cap and
domain-guard behavior."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from engine.geo.polyline import (decode_polyline_py, encode_polyline,
                                 encode_polyline_py)

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, "
              "lat_e5 long, lon_e5 long")
    return df.repartition(parts) if parts else df


def test_google_doc_vector(spark):
    """The worked example from the published algorithm description."""
    pts = [(3850000, -12020000), (4070000, -12095000),
           (4325200, -12645300)]
    assert encode_polyline_py(pts) == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    rows = [("a", T0 + dt.timedelta(seconds=i), i, la, lo)
            for i, (la, lo) in enumerate(pts)]
    out = encode_polyline(_df(spark, rows)).collect()
    assert out[0].polyline == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    assert out[0].n_points == 3


def test_matches_python_reference_random_tracks(spark):
    rng = random.Random(7)
    rows, expected = [], {}
    for u in range(12):
        key = f"u{u}"
        n = rng.randrange(1, 40)
        pts = [(rng.randrange(-8_500_000, 8_500_000),
                rng.randrange(-18_000_000, 18_000_000)) for _ in range(n)]
        expected[key] = encode_polyline_py(pts)
        rows += [(key, T0 + dt.timedelta(seconds=i), i, la, lo)
                 for i, (la, lo) in enumerate(pts)]
    for parts in (1, 13):
        got = {r.user_id: r.polyline
               for r in encode_polyline(_df(spark, rows, parts)).collect()}
        assert got == expected


def test_decode_roundtrip(spark):
    rng = random.Random(11)
    pts = [(rng.randrange(-8_500_000, 8_500_000),
            rng.randrange(-18_000_000, 18_000_000)) for _ in range(200)]
    rows = [("a", T0 + dt.timedelta(seconds=i), i, la, lo)
            for i, (la, lo) in enumerate(pts)]
    s = encode_polyline(_df(spark, rows)).collect()[0].polyline
    assert decode_polyline_py(s) == pts


def test_order_is_total_ties_break_on_seq(spark):
    """Same ts for every point: seq must decide, on any partitioning."""
    pts = [(i * 1000, -i * 2000) for i in range(10)]
    rows = [("a", T0, i, la, lo) for i, (la, lo) in enumerate(pts)]
    ref = encode_polyline_py(pts)
    for parts in (1, 7):
        assert encode_polyline(
            _df(spark, rows, parts)).collect()[0].polyline == ref


def test_max_points_cap_keeps_lowest(spark):
    pts = [(i * 100, i * 100) for i in range(20)]
    rows = [("a", T0 + dt.timedelta(seconds=i), i, la, lo)
            for i, (la, lo) in enumerate(pts)]
    out = encode_polyline(_df(spark, rows), max_points=5).collect()[0]
    assert out.n_points == 5
    assert out.polyline == encode_polyline_py(pts[:5])


def test_domain_guard_fires(spark):
    rows = [("a", T0, 0, 1 << 40, 0)]
    with pytest.raises(Exception, match="polyline|ASSERT|assert"):
        encode_polyline(_df(spark, rows)).collect()


def test_single_exchange_plan(spark):
    """The lag window's hash partitioning must be reused by the final
    per-key aggregation: exactly one Exchange above the scan."""
    import io
    from contextlib import redirect_stdout

    rows = [("a", T0, 0, 0, 0), ("b", T0, 1, 5, 5)]
    df = encode_polyline(_df(spark, rows))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1, plan
