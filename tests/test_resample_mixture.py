"""Mixture reweighting (engine/ml/split.py::resample_mixture):
stochastic-rounding convergence, epoch semantics, determinism, and
zero-weight drop."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ml.split import resample_mixture


def _corpus(spark, n=20_000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4)).alias("source"))


def test_realized_sizes_converge(spark):
    w = {"s0": 2.5, "s1": 0.3, "s2": 0.0}
    out = resample_mixture(_corpus(spark), w, seed=7)
    sizes = {r.source: r.n for r in
             out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    per = 5000
    assert abs(sizes["s0"] - 2.5 * per) < 0.05 * per
    assert abs(sizes["s1"] - 0.3 * per) < 0.05 * per
    assert "s2" not in sizes          # weight 0 drops the stratum
    assert sizes["s3"] == per         # default weight 1.0 exact


def test_epoch_indices_and_copy_counts(spark):
    out = resample_mixture(_corpus(spark, 1000), {"s0": 3.0}, seed=7)
    s0 = out.filter("source = 's0'")
    # integer weight: every s0 doc exactly 3 copies, epochs 0,1,2
    per_doc = s0.groupBy("doc_id").agg(
        F.count("*").alias("c"),
        F.array_sort(F.collect_list("epoch")).alias("es")).collect()
    assert all(r.c == 3 and list(r.es) == [0, 1, 2] for r in per_doc)
    # non-listed strata: single copy, epoch 0
    rest = out.filter("source <> 's0'")
    assert rest.filter("epoch <> 0 OR n_copies <> 1").count() == 0


def test_deterministic_across_runs_and_repartition(spark):
    w = {"s1": 1.7}
    a = resample_mixture(_corpus(spark, 2000), w, seed=9)
    b = resample_mixture(_corpus(spark, 2000).repartition(13), w, seed=9)
    ka = sorted((r.doc_id, r.epoch) for r in a.collect())
    assert ka == sorted((r.doc_id, r.epoch) for r in b.collect())
