"""Exact model-evaluation metrics over score tables (r4 cont.).

`auc_components` computes the ROC-AUC of a binary-labelled integer
score column in the EXACT BIGINT domain via the rank-sum
(Mann-Whitney U) identity with the standard average-rank tie
correction:

    AUC = (sum over positives of avg_rank  -  n_pos*(n_pos+1)/2)
          / (n_pos * n_neg)

Average ranks of a tie group are half-integers, so everything is
carried at 2x scale: for a score group of size g with g_pos positives
sitting after `cum_before` lower-scored rows, the group's positives
contribute g_pos * (2*cum_before + g + 1) to `rank2_pos`
(= twice the rank sum).  The emitted tuple

    (n_pos, n_neg, auc_num2 = rank2_pos - n_pos*(n_pos+1))

satisfies AUC = auc_num2 / (2 * n_pos * n_neg) exactly; the division
is a trivial driver-side step, so the wire format is float-free and
host/partitioning independent (the moran_i / geary_c convention).
Equivalently auc_num2 = 2*wins + ties over all pos x neg pairs — the
pytest brute oracle checks exactly that identity.

Exactness bound (documented like moran_scaled's): rank2_pos <= 2*n^2,
so n up to ~2.1e9 rows stays inside int64 — far beyond any single
evaluation table; the big input is reduced by the FIRST aggregation.

Scale shape: ONE map-side-combined groupBy(score) over the base table
(the only big-side shuffle, combiner-friendly because score domains
are bounded); the rank window then runs over the AGGREGATED
distinct-score relation (|score domain| rows, not |table| rows), and a
final single-row agg.  Never a global sort of the raw rows, never a
pos x neg pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_components(df: DataFrame, label: str = "y",
                   score: str = "score") -> DataFrame:
    """df with integer columns `label` (0/1) and `score` ->
    one row (n_pos, n_neg, auc_num2), all BIGINT-exact.

    AUC = auc_num2 / (2 * n_pos * n_neg); ties get the standard 0.5
    credit.  Degenerate inputs (no positives or no negatives) emit
    auc_num2 = 0 with the zero count visible to the caller.
    """
    per = df.groupBy(score).agg(
        F.count("*").cast("long").alias("g"),
        F.sum(label).cast("long").alias("g_pos"))
    w = (Window.orderBy(score)
         .rowsBetween(Window.unboundedPreceding, -1))
    per = per.withColumn(
        "cum_before", F.coalesce(F.sum("g").over(w), F.lit(0)).cast("long"))
    tot = per.agg(
        F.sum("g_pos").cast("long").alias("n_pos"),
        (F.sum("g") - F.sum("g_pos")).cast("long").alias("n_neg"),
        F.sum(F.col("g_pos") * (2 * F.col("cum_before") + F.col("g") + 1))
         .cast("long").alias("rank2_pos"))
    return tot.select(
        "n_pos", "n_neg",
        (F.col("rank2_pos") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("long").alias("auc_num2"))
