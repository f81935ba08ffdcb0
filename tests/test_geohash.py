"""Geohash index (engine/geo/geohash.py): kernel vs published vectors,
native-column/kernel agreement, hierarchy + bbox properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.geo.geohash import (
    geohash_bbox, geohash_col, geohash_int_np, geohash_np,
    geohash_prefix_col, with_geohash,
)


def test_known_vectors():
    # canonical examples from the original geohash documentation
    got = geohash_np(np.array([10.40744, -5.6]), np.array([57.64911, 42.6]),
                     precision=8)
    assert got[0] == "u4pruydq"
    assert got[1].startswith("ezs42")


def test_bbox_roundtrip_and_prefix_nesting():
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 50)
    lat = rng.uniform(-90, 90, 50)
    for p in (4, 8):
        for x, y, gh in zip(lon, lat, geohash_np(lon, lat, p)):
            lo0, la0, lo1, la1 = geohash_bbox(gh)
            assert lo0 <= x < lo1 and la0 <= y < la1
            # parent cell (string prefix) contains the child bbox
            plo0, pla0, plo1, pla1 = geohash_bbox(gh[:2])
            assert plo0 <= lo0 and lo1 <= plo1
            assert pla0 <= la0 and la1 <= pla1


def test_precision_validation():
    with pytest.raises(ValueError):
        geohash_int_np(np.zeros(1), np.zeros(1), precision=7)
    with pytest.raises(ValueError):
        geohash_int_np(np.zeros(1), np.zeros(1), precision=14)


def test_native_column_matches_kernel(spark):
    rng = np.random.default_rng(11)
    rows = [(i, float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90)))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    got = {r.id: (r.gh, r.gh4) for r in
           with_geohash(df, 8).withColumn(
               "gh4", geohash_prefix_col("gh", 4)).collect()}
    lon = np.array([r[1] for r in rows])
    lat = np.array([r[2] for r in rows])
    exp = geohash_np(lon, lat, 8)
    for (i, _, _), e in zip(rows, exp):
        assert got[i] == (e, e[:4])


def test_geohash_is_native_zero_python(spark):
    from tests.test_plans import plan_of
    df = spark.range(10).select(
        (F.col("id") * 1.0).alias("lon"), (F.col("id") * 0.5).alias("lat"))
    plan = plan_of(df.select(geohash_col()), "simple")
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange" not in plan
