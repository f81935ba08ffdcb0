"""M42 (r5 cont.) — exact decision-stump training.

The simplest supervised learner with a fully deterministic, integer-
exact training trajectory: over labeled integer features (x, y∈{0,1})
find the threshold t* and polarity that minimize training
misclassifications, ties to (lowest errors, lowest t, 'gt' before
'le').  Candidate thresholds are the distinct observed x values —
a complete set: every achievable split, including the all-1/all-0
classifiers (reached at t = max x), occurs at an observed value.

Errors in closed form from prefix sums over the aggregated
distinct-value relation (cum0/cum1 = label counts at x <= t; N0/N1 =
totals):

    predict 1 iff x > t  ('gt'):  errors = (N0 - cum0) + cum1
    predict 1 iff x <= t ('le'):  errors = cum0 + (N1 - cum1)

Scale shape: ONE map-side-combined groupBy(x) agg collapses the row
frame to the distinct-value relation; the cumulative window rides
THAT domain-bounded frame (the eval_auc doctrine — never a raw-row
global sort); the argmin is one min(struct) fold.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stump_train(df: DataFrame, x_col: str = "x",
                y_col: str = "y") -> DataFrame:
    """-> one row (threshold, polarity, n_errors, n) — the exact-argmin
    decision stump under the pinned tie order (errors, t, 'gt'<'le'
    via polarity code 0/1)."""
    per_x = (df.select(F.col(x_col).cast("long").alias("x"),
                       F.col(y_col).cast("int").alias("y"))
             .groupBy("x")
             .agg(F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
                  .alias("c0"),
                  F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
                  .alias("c1")))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    cum = (per_x.select(
        "x",
        F.sum("c0").over(w).alias("cum0"),
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c0").over(Window.partitionBy()).alias("n0"),
        F.sum("c1").over(Window.partitionBy()).alias("n1")))
    errs = cum.select(
        "x",
        ((F.col("n0") - F.col("cum0")) + F.col("cum1")).alias("e_gt"),
        (F.col("cum0") + (F.col("n1") - F.col("cum1"))).alias("e_le"),
        (F.col("n0") + F.col("n1")).alias("n"))
    cand = (errs.select(F.struct(F.col("e_gt").alias("e"),
                                 F.col("x").alias("t"),
                                 F.lit(0).alias("p")).alias("c"), "n")
            .union(errs.select(F.struct(F.col("e_le").alias("e"),
                                        F.col("x").alias("t"),
                                        F.lit(1).alias("p")).alias("c"),
                               "n")))
    best = cand.groupBy().agg(F.min("c").alias("c"),
                              F.max("n").alias("n"))
    return best.select(
        F.col("c.t").cast("long").alias("threshold"),
        F.when(F.col("c.p") == 0, "gt").otherwise("le").alias("polarity"),
        F.col("c.e").cast("long").alias("n_errors"),
        F.col("n").cast("long").alias("n"))


def stump_py(rows) -> tuple:
    """Sequential brute-force reference: try every (t, polarity)
    explicitly — O(D·N), independent of the prefix-sum closed form."""
    xs = sorted({x for x, _ in rows})
    best = None
    for t in xs:
        for p, code in (("gt", 0), ("le", 1)):
            e = 0
            for x, y in rows:
                pred = int(x > t) if p == "gt" else int(x <= t)
                e += int(pred != y)
            k = (e, t, code)
            if best is None or k < best[0]:
                best = (k, (t, p, e, len(rows)))
    return best[1]
