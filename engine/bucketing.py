"""Bucketed co-located joins (SURVEY.md §4 "Partitioning & shuffle").

At 100 TB the dominant shuffle is the big-big equi-join (e.g. images x
per-image features on image_id, or re-joining the narrow join result
back to the payload table). Writing both sides bucketed by the join key
with the same bucket count lets Spark plan a SortMergeJoin with ZERO
Exchange on either side — the shuffle happens once at write time and is
amortized over every subsequent join.

Requires `spark.sql.sources.bucketing.enabled` (default true) and the
session catalog (`saveAsTable`); `tests/test_plans.py` asserts the
no-Exchange property on the resulting plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort: bool = True, path: str | None = None) -> None:
    """Persist `df` bucketed (and optionally sorted) by `key`."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner picks
    a shuffle-free SortMergeJoin when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
