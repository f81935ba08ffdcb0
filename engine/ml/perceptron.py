"""Deterministic integer batch perceptron (SURVEY.md §2.M38, r5
post-window) — a first-class linear-classifier TRAINER beside the
k-means trainer, under the same quantization doctrine: float SGD is
update-order-dependent and untwinnable; the FULL-BATCH perceptron with
floored rational learning rate is a pure integer function of the
input set.

Per round, with integer weights (w0, w1, w2) and features (x1, x2):

    score_i = w0 + w1*x1_i + w2*x2_i          (exact int64)
    pred_i  = [score_i > 0]
    err_i   = y_i - pred_i                    (in {-1, 0, 1})
    g       = Sigma err_i * (1, x1_i, x2_i)   (ONE map-side agg)
    w      += trunc(lr_num * g / lr_den)      (TRUNCATING division,
                                              the Spark DIV / DuckDB
                                              // integer semantics)

Exactly `rounds` rounds from w = 0 (the pagerank fixed-round
contract).  Every step is int64 arithmetic, so a DuckDB twin that
unrolls the identical rounds as chained CTEs is hash-exact.

Scale shape: per round ONE map-side-combined aggregation over the
points frame producing THREE integers; the weight triple is driver
state bounded by contract (the kmeans k-row class).  The final pass
scores every row with the learned weights in-plan.  Zero Python
workers.

Overflow: |score| <= |w| * max|x| and |g| <= n * max|x| — callers
keep features and n within int64 headroom (the cusum front door).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.ckpt import materialize


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark DIV / DuckDB //
    semantics; Python's // floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def perceptron_train(points: DataFrame, rounds: int = 4,
                     lr_num: int = 1, lr_den: int = 4,
                     x1: str = "x1", x2: str = "x2", y: str = "y",
                     checkpoint_dir: str | None = None) -> DataFrame:
    """-> (id, x1, x2, y, score, pred) under the final weights.
    `points` carries a unique integer id, integer features, y in
    {0, 1}."""
    pts = points.select(F.col("id").cast("long").alias("id"),
                        F.col(x1).cast("long").alias("x1"),
                        F.col(x2).cast("long").alias("x2"),
                        F.col(y).cast("long").alias("y"))
    pts = materialize(pts, eager=True, checkpoint_dir=checkpoint_dir)

    w0 = w1 = w2 = 0
    for _ in range(rounds):
        score = (F.lit(w0) + F.lit(w1) * F.col("x1")
                 + F.lit(w2) * F.col("x2"))
        err = F.col("y") - (score > 0).cast("long")
        g = (pts.agg(F.sum(err).alias("g0"),
                     F.sum(err * F.col("x1")).alias("g1"),
                     F.sum(err * F.col("x2")).alias("g2"))
             .collect()[0])
        w0 += _tdiv(lr_num * int(g.g0 or 0), lr_den)
        w1 += _tdiv(lr_num * int(g.g1 or 0), lr_den)
        w2 += _tdiv(lr_num * int(g.g2 or 0), lr_den)

    score = (F.lit(w0) + F.lit(w1) * F.col("x1")
             + F.lit(w2) * F.col("x2"))
    return pts.select("id", "x1", "x2", "y",
                      score.cast("long").alias("score"),
                      (score > 0).cast("int").alias("pred"))


def perceptron_py(rows, rounds: int = 4, lr_num: int = 1,
                  lr_den: int = 4):
    """Sequential reference of the identical full-batch recurrence.
    rows: [(id, x1, x2, y)] -> {id: (score, pred)} + final weights."""
    w0 = w1 = w2 = 0
    for _ in range(rounds):
        g0 = g1 = g2 = 0
        for _id, a, b, yy in rows:
            pred = 1 if (w0 + w1 * a + w2 * b) > 0 else 0
            e = yy - pred
            g0 += e
            g1 += e * a
            g2 += e * b
        w0 += _tdiv(lr_num * g0, lr_den)
        w1 += _tdiv(lr_num * g1, lr_den)
        w2 += _tdiv(lr_num * g2, lr_den)
    out = {}
    for _id, a, b, yy in rows:
        s = w0 + w1 * a + w2 * b
        out[_id] = (s, 1 if s > 0 else 0)
    return out, (w0, w1, w2)
