"""Per-label embedding centroids in exact integer domain (task-brief
"similarity search" companion: class centroids are the IVF coarse
quantizer's training target and the standard dataset-curation statistic
at 100 TB — per-cluster mean vectors for balance/drift checks).

Exactness contract (the r3 float-tie rule): float32 sums are summation-
order-sensitive, so the centroid is computed over FLOOR(val * 10^6)
int64 units — float32 -> double widening is exact, the double multiply
is correctly rounded (bit-identical across engines), and floor has no
tie class.  Integer sums are order-free and exact below 2^63, so the
result hashes identically regardless of partitioning/AQE.  Consumers
divide sum_q6 / (n * 10^6) for the float centroid.

Scale shape: posexplode(embedding) -> partial hash aggregation per
partition groups by (label, pos) BEFORE the exchange, so shuffle volume
is O(partitions * labels * dim) — independent of row count.  Zero
Python; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_centroids(emb: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """(label, pos, n, sum_q6) — exact integer centroid sums per label
    and embedding dimension."""
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    return ex.groupBy("label", "pos").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("val").cast("double") * F.lit(float(scale)))
              .cast("long")).alias("sum_q6"),
    )
