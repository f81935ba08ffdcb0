"""Contrastive hard-negative mining (training-data op): for every
anchor document, the k most-similar OTHER documents in the same stratum
— here "similar" = closest by an integer feature (document length), the
deterministic stand-in for embedding distance that keeps the op exact
in every engine.  Contrastive objectives (CLIP-style) want negatives
that are hard (same language, near-identical length/style) rather than
random; this is the mining step that produces them.

Completeness is a THEOREM, not a heuristic: candidates come from a
banded block join with block = size div W and probe blocks {b-1, b, b+1}
— two sizes within W of each other have floor-quotients differing by at
most 1, so every pair with |diff| <= W is in some probed block pair.
Each (anchor, negative) pair is found exactly once (the negative's own
block is unique).

Scale shape: one shuffle equi-join on (stratum, block) — the anchor side
explodes 3 probe rows, the negative side keys on its own block — then a
per-anchor window (row_number over diff, id).  Candidate volume is
sum over buckets of 3·|bucket|²: W is the knob that bounds bucket
population (narrow W → smaller buckets → fewer candidates but a tighter
similarity cutoff), the same trade every blocking scheme (LSH bands,
sort-neighbourhood) makes.  All-native integer columns; zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hard_negatives(df: DataFrame, id_col: str = "doc_id",
                   stratum_col: str = "lang", size_col: str = "n_chars",
                   max_diff: int = 16, k: int = 2) -> DataFrame:
    """-> (anchor_id, neg_id, diff, rnk): per anchor, the k same-stratum
    negatives with the smallest |size difference| <= max_diff (ties by
    neg_id); provably ALL qualifying pairs are considered (see module
    docstring)."""
    from pyspark.sql import Window

    w = max_diff  # block width = cutoff makes the +/-1 probe complete
    base = df.select(
        F.col(id_col).alias("_id"), F.col(stratum_col).alias("_s"),
        F.col(size_col).cast("long").alias("_n"),
        F.expr(f"CAST({size_col} AS BIGINT) div {w}").alias("_b"))
    anchors = base.select(
        F.col("_id").alias("anchor_id"), "_s",
        F.col("_n").alias("_an"),
        F.explode(F.expr("array(_b - 1, _b, _b + 1)")).alias("_b"))
    negs = base.select(F.col("_id").alias("neg_id"), "_s", "_b",
                       F.col("_n").alias("_nn"))
    cands = (anchors.join(negs, ["_s", "_b"])
             .filter((F.col("anchor_id") != F.col("neg_id"))
                     & (F.abs(F.col("_an") - F.col("_nn")) <= max_diff))
             .select("anchor_id", "neg_id",
                     F.abs(F.col("_an") - F.col("_nn")).alias("diff")))
    win = Window.partitionBy("anchor_id").orderBy(F.asc("diff"),
                                                  F.asc("neg_id"))
    return (cands.withColumn("rnk", F.row_number().over(win))
            .filter(F.col("rnk") <= k))
