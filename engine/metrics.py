"""A6/L2/L3 — per-partition lineage + metrics tables (SURVEY.md §2.L).

BASELINE.json:6,14 — "resumable from Iceberg snapshot checkpoints with
per-partition lineage + metrics tables".

Design (scale rationale, SURVEY.md §1.3):
- *metrics* rows (one per stage run) use `df.observe(...)` so row counts
  ride the action itself — zero extra passes over the data;
- *lineage* rows (one per output data file = write partition) come from a
  column-less count over the just-committed files grouped by
  `input_file_name()` — Parquet answers it from row-group metadata;
- both land in ordinary append-only icelite tables, so they are
  queryable DataFrames and snapshot-versioned like everything else.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from engine.icelite import IceliteTable

METRICS_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("stage", StringType(), False),
    StructField("sid", LongType(), True),
    StructField("ts", DoubleType(), False),
    StructField("rows_out", LongType(), True),
    StructField("wall_ms", DoubleType(), False),
    StructField("extra", StringType(), True),  # JSON
])

LINEAGE_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("stage", StringType(), False),
    StructField("sid", LongType(), False),
    StructField("file", StringType(), False),
    StructField("rows", LongType(), False),
])


@dataclass
class StageMetrics:
    run_id: str
    stage: str
    sid: int | None
    rows_out: int | None
    wall_ms: float
    extra: dict


class MetricsSink:
    def __init__(self, root: str):
        self.metrics = IceliteTable(f"{root}/_metrics")
        self.lineage = IceliteTable(f"{root}/_lineage")

    def observed(self, df: DataFrame, name: str = "rows") -> tuple[DataFrame, Observation]:
        """Attach a zero-cost row-count observation to a stage output."""
        obs = Observation(name)
        return df.observe(obs, F.count(F.lit(1)).alias("rows_out")), obs

    def emit_stage(self, spark: SparkSession, m: StageMetrics) -> None:
        row = [(m.run_id, m.stage, m.sid, time.time(), m.rows_out,
                m.wall_ms, json.dumps(m.extra, sort_keys=True))]
        self.metrics.commit_append(
            spark.createDataFrame(row, METRICS_SCHEMA), stage=m.stage
        )

    def emit_lineage(self, spark: SparkSession, run_id: str, stage: str,
                     table, sid: int) -> None:
        """Per-partition (= per committed file) row counts for a commit.
        Reads through SnapshotTable.scan_added (protocol surface, not
        icelite's file list — works against any backend; r4 seam)."""
        added = table.scan_added(spark, sid)
        if added.isEmpty():
            return
        per_file = (
            added
            .groupBy(F.input_file_name().alias("file"))
            .count()
            .select(
                F.lit(run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.lit(sid).cast("long").alias("sid"),
                "file",
                F.col("count").alias("rows"),
            )
        )
        self.lineage.commit_append(per_file, stage=stage)

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        return self.metrics.scan(spark)

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        return self.lineage.scan(spark)
