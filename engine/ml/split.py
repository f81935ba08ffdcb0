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


def assign_splits_grouped(df: DataFrame, group_cols: list[str] | None = None,
                          id_col: str = "doc_id", seed: int = 42,
                          weights: tuple[float, ...] = (0.8, 0.1, 0.1),
                          names: tuple[str, ...] = ("train", "val", "test"),
                          buckets: int = 10_000) -> DataFrame:
    """LEAKAGE-SAFE split: every member of a duplicate group lands in
    the same split — the bucket hashes the GROUP's representative
    (min id over the group), not the row id.  Splitting duplicates
    independently leaks train text into eval; this is the standard
    guard (dedup-aware splitting) every corpus pipeline needs.

    The group key defaults to the exact content digest
    sha2(text, 256) — collision-free in practice, and the shuffle/sort
    key is a fixed 64-char digest instead of an unbounded document.
    Pass `group_cols` to group by other columns (e.g. a precomputed
    MinHash cluster_id from dedup_clusters for NEAR-dup-safe splits —
    the composition is the same one-window form).

    Scale shape: ONE hash-partition window shuffle (min over the group;
    no join back), then the same zero-shuffle Arrow bucket kernel +
    native CASE as assign_splits.  Deterministic under repartition,
    resume, and appends as long as group membership is stable."""
    from pyspark.sql import Window

    key = [F.col(c) for c in group_cols] if group_cols \
        else [F.sha2(F.col("text"), 256)]
    rep = F.min(id_col).over(Window.partitionBy(*key)).alias("rep_id")
    out = df.select(*df.columns, rep)
    b = bucket_udf(seed, buckets)(F.col("rep_id")).alias("bucket")
    return out.withColumn("bucket", b).withColumn(
        "split", split_col(F.col("bucket"), weights, names, buckets))


def sample_stratified(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      seed: int = 43, default_rate: float = 1.0,
                      denom: int = 1_000_000) -> DataFrame:
    """Deterministic stratified (per-stratum Bernoulli) sampling — the
    corpus-rebalancing op (downsample the dominant language/source):
    keep a row iff  mix64(id + mix64(seed)) % denom < round(rate·denom)
    for its stratum's rate.

    Zero shuffle: one Arrow-batched hash projection + a native CASE
    threshold filter.  A pure function of (id, seed): the sample is
    reproducible across reruns, stable under repartition/appends, and
    per-stratum sample sizes converge to rate·|stratum| by the
    avalanche property.  The kept uniform `u` column lets callers (and
    the DuckDB twin) audit the kernel exactly — all-integer, no float
    threshold ties (rates are rounded to integer thresholds once).

    The UDF is marked nondeterministic ONLY to stop Catalyst from
    substituting the `u` alias into the pushed-down filter and running
    the Arrow kernel twice (once below the filter, once for the output
    column); the kernel itself is a pure function of (id, seed)."""
    u = bucket_udf(seed, denom).asNondeterministic()(F.col(id_col)).alias("u")
    thr = None
    for s, r in sorted(rates.items()):
        t = int(round(r * denom))
        cond = F.col(stratum_col) == s
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (thr.otherwise(int(round(default_rate * denom))) if thr is not None
           else F.lit(int(round(default_rate * denom))))
    return df.withColumn("u", u).filter(F.col("u") < thr)


def assign_splits(df: DataFrame, id_col: str = "doc_id", seed: int = 42,
                  weights: tuple[float, ...] = (0.8, 0.1, 0.1),
                  names: tuple[str, ...] = ("train", "val", "test"),
                  buckets: int = 10_000) -> DataFrame:
    """Attach (bucket:long, split:string) — deterministic per-key split
    assignment, a pure function of (id, seed)."""
    b = bucket_udf(seed, buckets)(F.col(id_col)).alias("bucket")
    return df.withColumn("bucket", b).withColumn(
        "split", split_col(F.col("bucket"), weights, names, buckets))


def resample_mixture(df: DataFrame, weights: dict[str, float],
                     stratum_col: str = "source", id_col: str = "doc_id",
                     seed: int = 44, default_weight: float = 1.0,
                     denom: int = 1_000_000) -> DataFrame:
    """Deterministic mixture reweighting — the data-MIXING step that
    sets per-source epoch counts for a training run (wiki x2.5,
    crawl x0.3, ...), unifying up- and down-sampling: each row of
    stratum s is emitted floor(w_s) or ceil(w_s) times, taking the
    ceiling iff  mix64(id + mix64(seed)) % denom < frac(w_s)·denom,
    so realized per-stratum sizes converge to w_s·|stratum| with zero
    coordination (stochastic rounding on a pure row-key hash).  Copies
    carry an `epoch` index (0..n_copies-1) so downstream shard writers
    can spread repeats across epochs; w_s = 0 drops the stratum.

    Scale shape: zero shuffle — the same Arrow bucket kernel as
    assign_splits, a native CASE pair, and an explode whose fan-out is
    bounded by ceil(max weight).  A pure function of (id, seed):
    stable under repartition, resume, and appends.  All-integer
    thresholds — no float-tie class."""
    import math

    u = bucket_udf(seed, denom).asNondeterministic()(F.col(id_col)).alias("u")

    def case_over(value_of, default):
        e = None
        for s, w in sorted(weights.items()):
            cond = F.col(stratum_col) == s
            e = F.when(cond, value_of(w)) if e is None \
                else e.when(cond, value_of(w))
        return e.otherwise(default) if e is not None else F.lit(default)

    base = case_over(lambda w: int(math.floor(w)),
                     int(math.floor(default_weight)))
    frac = case_over(lambda w: int(round((w - math.floor(w)) * denom)),
                     int(round((default_weight - math.floor(default_weight))
                               * denom)))
    return (df.withColumn("u", u)
            .withColumn("n_copies",
                        (base + F.when(F.col("u") < frac, 1).otherwise(0))
                        .cast("long"))
            .filter(F.col("n_copies") > 0)
            .withColumn("epoch", F.explode(F.expr("sequence(0, n_copies - 1)"))))
