"""D8 — as-of join (SURVEY.md §2.D8) and small relational helpers.

As-of = nearest-earlier right row per key: cogrouped `applyInPandas`
running `pd.merge_asof` inside each key group (SNIPPETS.md [1] pattern).
The cogroup shuffles both sides by key once; within a group pandas does a
sorted backward-inclusive merge — semantics identical to DuckDB/QuestDB
`ASOF JOIN` (verified against DuckDB in the driver contract).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(left: DataFrame, right: DataFrame, *, on: str, by: str,
              suffix: str = "_r") -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on within the same `by` key (inclusive).

    Output schema: all left columns + right's non-key columns (nullable,
    suffixed on collision).
    """
    # Re-alias every column on both sides to mint fresh expression ids:
    # when left and right derive from the SAME scan (self-as-of), Spark's
    # cogroup attribute dedup otherwise prunes the right side down to the
    # grouping key (observed on 4.1: right batches arrive with only `by`).
    left = left.select(*[F.col(c).alias(c) for c in left.columns])
    right = right.select(*[F.col(c).alias(c) for c in right.columns])
    lcols = left.columns
    rvalue_cols = [c for c in right.columns if c not in (on, by)]
    rename = {c: (c + suffix if c in lcols else c) for c in rvalue_cols}
    r_on = on + suffix if on in lcols else on

    fields = list(left.schema.fields)
    fields.append(StructField(r_on, right.schema[on].dataType, True))
    for c in rvalue_cols:
        f = right.schema[c]
        fields.append(StructField(rename[c], f.dataType, True))
    out_schema = StructType(fields)

    def _merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = [f.name for f in out_schema.fields]
        if ldf.empty:
            return pd.DataFrame(columns=out_cols)
        ldf = ldf.sort_values(on, kind="mergesort")
        if rdf.empty:
            merged = ldf.copy()
            merged[r_on] = pd.NaT if "time" in str(ldf[on].dtype) else None
            for c in rvalue_cols:
                merged[rename[c]] = None
        else:
            rdf = rdf.sort_values(on, kind="mergesort")
            merged = pd.merge_asof(
                ldf, rdf.rename(columns={**rename, on: r_on}),
                left_on=on, right_on=r_on, by=by,
                direction="backward", allow_exact_matches=True,
            )
        return merged[out_cols]

    def _wrap(_key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        return _merge(ldf, rdf)

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(_wrap, schema=out_schema)
    )


def merge_upsert(base: DataFrame, delta: DataFrame,
                 keys: list[str]) -> DataFrame:
    """Snapshot merge (MERGE INTO upsert semantics for the bounded-diff
    ETL, north_star "bounded spatial diffing/ETL"): rows of `base` whose
    key does NOT appear in `delta`, plus every `delta` row.  One
    left-anti hash join + union — the anti join shuffles on the merge
    key exactly once and the delta side (the diff) is typically small
    enough for Catalyst/AQE to broadcast it."""
    from pyspark.sql import functions as F  # noqa: F401 (parity w/ module style)
    return delta.unionByName(base.join(delta.select(keys), keys, "left_anti"))


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_s: int = 1800,
               order_tiebreak: str = "event_id") -> DataFrame:
    """BATCH sessionization — assemble per-user event sequences into
    gap-delimited sessions (the batch complement of the streaming
    session window, J4): a new session starts whenever the gap to the
    previous event of the same user exceeds `gap_s`.

    Classic lag+cumsum form, all-native: session boundary = integer
    microsecond-gap comparison, session_seq = running sum of boundary
    flags, then the per-session rollup.  The window and the rollup key
    on the SAME (user) partitioning, so Catalyst plans ONE exchange for
    the whole job (window sort + partial-combined agg reuse it); skew is
    bounded by the busiest user.

    Output: (user_id, session_seq, n_events, start_us, end_us,
    duration_us) — integer epoch-microseconds end to end (exact in
    every engine; no float time math)."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col),
                                             F.asc(order_tiebreak))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1) \
        .otherwise(0)
    seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (events
            .withColumn("_us", us)
            .withColumn("session_seq", seq)
            .groupBy(user_col, "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min("_us").alias("start_us"),
                 F.max("_us").alias("end_us"))
            .withColumn("duration_us", F.col("end_us") - F.col("start_us")))
