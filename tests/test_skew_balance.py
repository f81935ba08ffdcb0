"""D4/E6 quantitative skew evidence (BASELINE.json:6 "explicit salting
for hot-cell skew"): with ~10% of all rows landing in ONE cell, an
unsalted shuffle join concentrates that key's candidates on a single
reducer; salting spreads them across S buckets. This test measures the
actual per-(key,salt) group sizes — the quantity that bounds reducer
skew — not just row correctness (tests/test_join.py covers that)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.geo.cells import cell_parent_col, with_cell
from engine.geo.skew import heavy_hitters, salted_equijoin
from engine.synth import gen_points

LEVEL = 8
N = 40_000
SALT = 8


@pytest.fixture(scope="module")
def probe(spark):
    df = with_cell(gen_points(spark, N, seed=42)) \
        .withColumn("cell_p", cell_parent_col("cell", LEVEL)).cache()
    df.count()
    yield df
    df.unpersist()


def test_hot_cell_is_detected(spark, probe):
    hot = heavy_hitters(probe, "cell_p", top=1)
    assert len(hot) == 1
    n_hot = probe.filter(F.col("cell_p") == hot[0]).count()
    assert n_hot > 0.08 * N  # the synthetic 10% hot cell


def test_salting_splits_the_hot_key(spark, probe):
    hot = heavy_hitters(probe, "cell_p", top=1)
    build = spark.createDataFrame(
        [(int(hot[0]), "P_HOT", False)], "cell_p long, poly_id string, full boolean")

    unsalted = salted_equijoin(probe, build, key="cell_p", hot_keys=[],
                               probe_id_col="image_id")
    salted = salted_equijoin(probe, build, key="cell_p", hot_keys=hot,
                             salt=SALT, probe_id_col="image_id")
    assert salted.count() == unsalted.count()  # no duplicate/lost pairs

    # the shuffle key is (cell_p) vs (cell_p, _salt): compare the largest
    # key-group a reducer can receive
    max_unsalted = (unsalted.groupBy("cell_p").count()
                    .agg(F.max("count")).collect()[0][0])
    per_bucket = (salted.groupBy("cell_p", F.pmod(
        F.xxhash64("image_id"), F.lit(SALT)).alias("b")).count()
        .agg(F.max("count")).collect()[0][0])
    # S=8 buckets: the hot key's largest bucket must shrink ~8x
    # (allow 2x slack for hash imbalance on a finite sample)
    assert per_bucket <= max_unsalted / (SALT / 2), (
        f"hot key not split: max bucket {per_bucket} vs unsalted {max_unsalted}")


def test_salted_plan_shuffles_on_key_and_salt(spark, probe):
    from tests.test_plans import plan_of
    hot = heavy_hitters(probe, "cell_p", top=1)
    build = spark.createDataFrame(
        [(int(hot[0]), "P_HOT", False)], "cell_p long, poly_id string, full boolean")
    salted = salted_equijoin(probe, build, key="cell_p", hot_keys=hot,
                             salt=SALT, probe_id_col="image_id")
    plan = plan_of(salted, "simple")
    assert "_salt" in plan  # the shuffle/join key includes the salt column
