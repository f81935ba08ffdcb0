"""Deterministic train/val/test split assignment (task-brief "large-scale
training-data pipeline" op: every curation pipeline ends by splitting the
corpus, and at 100 TB the split must be a pure function of the row key —
stable under re-partitioning, resume from checkpoint, and incremental
appends, with no sampling state to coordinate across executors).

The bucket is ``splitmix64(uint64(id) + mix64(seed)) % buckets`` — the
same public-domain avalanche kernel the dedup/simhash path already uses
(engine/text/dedup.py:_mix64), vectorized over whole Arrow batches in a
scalar pandas UDF (no per-row Python; numpy uint64 arithmetic wraps mod
2^64 natively, which Spark SQL cannot express under ANSI mode — that is
the one reason this is a UDF and not a column expression).  The DuckDB
twin recomputes the identical kernel via the verified HUGEINT
split-multiply SQL (`__spark_entry__.py:_mix64_sql`).

Scale shape: zero shuffle — one Arrow-batched projection stage; split
fractions converge by the avalanche property (each bucket is a 1/buckets
slice of a uniform hash).  Per-split counts are one partial-combined
hash aggregation when requested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from engine.text.dedup import _mix64

_U = np.uint64


def seed_offset(seed: int) -> int:
    """mix64(seed) as an int literal — inlined on BOTH engine and oracle
    sides so the seed enters the avalanche exactly once."""
    return int(_mix64(np.array([seed], dtype=_U))[0])


def bucket_udf(seed: int, buckets: int = 10_000):
    """Scalar pandas UDF: int64 id -> split bucket in [0, buckets)."""
    off = _U(seed_offset(seed))
    nb = _U(buckets)

    @F.pandas_udf(LongType())
    def _bucket(ids: pd.Series) -> pd.Series:
        v = ids.to_numpy(np.int64).astype(_U)
        return pd.Series((_mix64(v + off) % nb).astype(np.int64))

    return _bucket


def split_col(bucket: Column, weights: tuple[float, ...] = (0.8, 0.1, 0.1),
              names: tuple[str, ...] = ("train", "val", "test"),
              buckets: int = 10_000) -> Column:
    """Native CASE mapping bucket -> split name by cumulative weight."""
    assert len(weights) == len(names) and abs(sum(weights) - 1.0) < 1e-9
    cum, expr = 0.0, None
    for wgt, nm in zip(weights[:-1], names[:-1]):
        cum += wgt
        cond = bucket < int(round(cum * buckets))
        expr = F.when(cond, nm) if expr is None else expr.when(cond, nm)
    return (expr.otherwise(names[-1])).alias("split")


def assign_splits(df: DataFrame, id_col: str = "doc_id", seed: int = 42,
                  weights: tuple[float, ...] = (0.8, 0.1, 0.1),
                  names: tuple[str, ...] = ("train", "val", "test"),
                  buckets: int = 10_000) -> DataFrame:
    """Attach (bucket:long, split:string) — deterministic per-key split
    assignment, a pure function of (id, seed)."""
    b = bucket_udf(seed, buckets)(F.col(id_col)).alias("bucket")
    return df.withColumn("bucket", b).withColumn(
        "split", split_col(F.col("bucket"), weights, names, buckets))
