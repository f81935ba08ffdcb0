"""J1-J7 — Structured Streaming surface over the bounded `events` table
(SURVEY.md §2.J; FIXTURES.md §6).

Every aggregation here is written as a *transformation function* applied
to either a batch DataFrame or a `readStream` DataFrame — the same code
path, so the batch run IS the oracle for the streaming end-state
(SURVEY.md §2.J "batch-mode end-state ... is the DuckDB-checked oracle").

Streams execute with `trigger(availableNow=True)` and land in icelite via
`foreachBatch` — at scale this is the exact shape of an incremental
ingest job (micro-batch -> snapshot commit per batch, resumable from the
stream checkpoint AND the table snapshot).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

from engine.icelite import IceliteTable

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType(), True),
    StructField("ts", TimestampType(), True),
    StructField("user_id", LongType(), True),
    StructField("event_type", StringType(), True),
    StructField("value", DoubleType(), True),
    StructField("props", StringType(), True),
])


# ----------------------------------------------------------- replay source

def write_event_chunks(events_pdf: pd.DataFrame, out_dir: str,
                       n_chunks: int = 10, shuffle_frac: float = 0.05,
                       seed: int = 7) -> list[str]:
    """Split events into ordered chunk files with ~shuffle_frac rows moved
    across chunk boundaries (late data for watermark tests, FIXTURES §6)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pdf = events_pdf.sort_values("event_id").reset_index(drop=True)
    n = len(pdf)
    rng = np.random.default_rng(seed)
    chunk_of = np.minimum(np.arange(n) * n_chunks // max(n, 1), n_chunks - 1)
    movers = rng.random(n) < shuffle_frac
    chunk_of = np.where(
        movers, np.maximum(chunk_of - rng.integers(1, 3, n), 0), chunk_of
    )
    paths = []
    for c in range(n_chunks):
        part = pdf[chunk_of == c]
        p = os.path.join(out_dir, f"chunk-{c:03d}.parquet")
        # Spark cannot read TIMESTAMP(NANOS) parquet — coerce to micros
        part.to_parquet(p, index=False, coerce_timestamps="us",
                        allow_truncated_timestamps=True)
        paths.append(p)
    return paths


def write_event_chunks_df(events: DataFrame, out_dir: str,
                          n_chunks: int = 5, shuffle_frac: float = 0.05,
                          seed: int = 7) -> list[str]:
    """Spark-side replay-chunk writer: NO driver materialization (the
    pandas form above is for small unit-test fixtures only — collecting
    the full events table to the driver is exactly the OOM the design
    rules forbid, ADVICE r1).

    Chunk assignment is a pure column expression: event_id range-sliced
    into n_chunks, with a deterministic ~shuffle_frac of rows pulled 1-2
    chunks EARLIER via xxhash64(event_id) (late data relative to their
    timestamps, for watermark behavior).  Chunks are written in order so
    the file-stream source's modification-time ordering replays them as
    written.  One filtered write per chunk keeps file/mtime ordering
    explicit; n_chunks is O(1), so the extra scans are bounded (a single
    `partitionBy` pass is the one-shot alternative when ordering doesn't
    matter)."""
    import os

    lo, hi = events.agg(F.min("event_id"), F.max("event_id")).first()
    span = max(int(hi) - int(lo) + 1, 1)
    base = F.least(
        F.floor((F.col("event_id") - F.lit(int(lo))) * n_chunks / span),
        F.lit(n_chunks - 1))
    h = F.abs(F.xxhash64("event_id", F.lit(seed)))
    mover = (h % 1000) < int(shuffle_frac * 1000)
    chunk = F.when(mover, F.greatest(base - 1 - (h % 2), F.lit(0))) \
        .otherwise(base).cast("int")
    tagged = events.withColumn("_chunk", chunk)
    paths = []
    for c in range(n_chunks):
        p = os.path.join(out_dir, f"chunk-{c:03d}")
        (tagged.filter(F.col("_chunk") == c).drop("_chunk")
         .coalesce(1).write.mode("overwrite").parquet(p))
        paths.append(p)
    return paths


def read_event_stream(spark: SparkSession, dir_path: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


# ------------------------------------------------- window transformations

def tumbling_agg(events: DataFrame, width: str = "1 hour",
                 watermark: str | None = None) -> DataFrame:
    """J1/J2 — tumbling window counts + value sums per event_type."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "event_type", "n", "sum_value",
        )
    )


def sliding_agg(events: DataFrame, width: str = "1 hour",
                slide: str = "15 minutes",
                watermark: str | None = None) -> DataFrame:
    """J3 — sliding window event counts."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp(F.col("win.start")).alias("win_start"), "n")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes",
                watermark: str | None = None) -> DataFrame:
    """J4 — session windows per user (gap-based)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            F.unix_timestamp(F.col("win.end")).alias("win_end"),
            "user_id", "n",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """J5 — streaming dedup by event_id."""
    return events.withWatermark("ts", watermark) \
        .dropDuplicatesWithinWatermark(["event_id"])


# --------------------------------------------------- stateful per-key (J6)

RUNNING_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("running_count", LongType(), False),
    StructField("running_sum", DoubleType(), False),
])

STATE_SCHEMA = StructType([
    StructField("cnt", LongType(), False),
    StructField("total", DoubleType(), False),
])


def running_per_user(events: DataFrame) -> DataFrame:
    """J6 — custom stateful operator: per-user running count/sum across
    micro-batches via applyInPandasWithState."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((cnt, total))
        yield pd.DataFrame({
            "user_id": [key[0]], "running_count": [cnt], "running_sum": [total],
        })

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update, RUNNING_SCHEMA, STATE_SCHEMA,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------------------ sinks (J7)

def run_stream_to_icelite(sdf: DataFrame, table_root: str, checkpoint: str,
                          mode: str = "update") -> IceliteTable:
    """foreachBatch -> icelite append commit per micro-batch, then await
    completion (availableNow bounds the run)."""
    table = IceliteTable(table_root)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.commit_append(batch_df, stage=f"batch-{batch_id}")

    q = (
        sdf.writeStream.outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(_sink)
        .start()
    )
    q.awaitTermination()
    return table


def enriched_agg(events: DataFrame, dim: DataFrame,
                 key: str = "user_id") -> DataFrame:
    """J8 — stream-static enrichment join: per-micro-batch the streaming
    side hash-joins the static dimension (broadcast by Catalyst when
    small) and aggregates per segment.  Works identically on a batch
    frame, so the batch run is the end-state oracle."""
    return (
        events.join(dim, key)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )


def stream_stream_join(clicks: DataFrame, views: DataFrame,
                       watermark: str = "3650 days",
                       lag_minutes: int = 120) -> DataFrame:
    """J9 — watermarked stream-stream inner join: each click joins the
    views of the same user within the preceding `lag_minutes` (the
    classic ad-attribution shape).  Both sides carry watermarks and the
    join has an event-time range bound, so Spark's state store evicts
    rows once the watermark passes click_ts - lag (bounded state at
    scale).  The correctness keys run with an effectively-infinite
    watermark delay: the replayed chunks span the whole fixture window,
    and a production-size delay would evict early views before a late
    click arrives — dropping matches the batch oracle keeps.  In
    production the delay is the real out-of-orderness bound (minutes),
    which makes state O(rate * lag), not O(history).
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"))
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"), F.col("ts").alias("view_ts"))
    cond = (
        (F.col("user_id") == F.col("view_user"))
        & (F.col("view_ts") >= F.col("click_ts")
           - F.expr(f"INTERVAL {int(lag_minutes)} MINUTES"))
        & (F.col("view_ts") <= F.col("click_ts"))
    )
    return c.join(v, cond, "inner").select("click_id", "view_id", "user_id")


# -------------------------------------------- streaming tile maintenance

def maintain_tiles_stream(points_stream: DataFrame, points_root: str,
                          tiles_root: str, checkpoint: str, z: int = 6,
                          id_col: str = "id", lat: str = "lat",
                          lon: str = "lon") -> "IceliteTable":
    """J10 — STREAMING incremental tile maintenance: the bounded-diff
    rule as a live ingest job.  Each micro-batch of newly-arrived
    geotagged rows (1) appends to the icelite POINTS table, (2) patches
    ONLY the tiles the batch touches via
    engine.geo.vectile.incremental_tiles, and (3) commits the updated
    TILE table as a REPLACE snapshot (merge_upsert on (tile_x, tile_y);
    action='drop' tiles are deleted).  Both tables are snapshot-
    versioned, so every micro-batch leaves a time-travelable tile state
    and the stream checkpoint + table snapshots make the job resumable
    end to end (the run_stream_to_icelite shape).

    Convergence contract (pytest-asserted for multiple chunkings): the
    final tile table equals the one-shot full re-tile of all points,
    payload-byte-identical, REGARDLESS of micro-batch boundaries —
    because each patch re-encodes affected tiles from the full
    points-so-far state, and payload bytes are a pure function of a
    tile's feature set.  Per-batch cost is O(batch + rows in affected
    tiles), the incremental_tiles bound."""
    from engine.geo.vectile import incremental_tiles
    from engine.relops import merge_upsert

    points = IceliteTable(points_root)
    tiles = IceliteTable(tiles_root)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, lat, lon).localCheckpoint(eager=True)
        points.commit_append(batch, stage=f"pts-{batch_id}")
        current = points.scan(spark)
        patch = incremental_tiles(current, batch, z, id_col=id_col,
                                  lat=lat, lon=lon).localCheckpoint(eager=True)
        recode = patch.filter("action = 'recode'").select(
            "tile_z", "tile_x", "tile_y", "n_features", "n_bytes", "payload")
        if tiles.exists():
            base = tiles.scan(spark)
            merged = (merge_upsert(base, recode, ["tile_x", "tile_y"])
                      .join(patch.filter("action = 'drop'")
                            .select("tile_x", "tile_y"),
                            ["tile_x", "tile_y"], "left_anti"))
        else:
            merged = recode
        tiles.commit_replace(merged, stage=f"tiles-{batch_id}")

    q = (points_stream.writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .foreachBatch(_sink)
         .start())
    q.awaitTermination()
    return tiles


POINTS_SCHEMA = StructType([
    StructField("id", LongType(), True),
    StructField("lon", DoubleType(), True),
    StructField("lat", DoubleType(), True),
])


def write_point_chunks(points: DataFrame, out_dir: str,
                       n_chunks: int = 4) -> list[str]:
    """Replay-chunk writer for geotagged points (the write_event_chunks_df
    shape): chunk = id % n_chunks — deterministic, Spark-side, one
    coalesced file per chunk so maxFilesPerTrigger=1 replays exactly
    n_chunks micro-batches."""
    import os

    paths = []
    for c in range(n_chunks):
        p = os.path.join(out_dir, f"chunk-{c:03d}")
        (points.filter(F.col("id") % n_chunks == c)
         .coalesce(1).write.mode("overwrite").parquet(p))
        paths.append(p)
    return paths


def read_point_stream(spark: SparkSession, dir_path: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    return (spark.readStream.schema(POINTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(dir_path))


FUNNEL_OUT_SCHEMA = "user_id bigint, stage int"
FUNNEL_STATE_SCHEMA = "stage int"


def funnel_stage_stream(events: DataFrame, steps: tuple[str, ...] = (
        "view", "click", "purchase")) -> DataFrame:
    """J11 — streaming funnel stage machine (the stateful complement of
    the batch relops.funnel): per user, the greedy earliest-match stage
    advanced across micro-batches via applyInPandasWithState.

    Exactness contract: with an IN-ORDER replay (chunks written with
    shuffle_frac=0 and per-user ts monotone in the tie-break id, as the
    events fixture is), arrival order equals the (ts, seq) total order,
    so greedy-over-arrival == the batch funnel — which is what lets the
    driver twin stay the subsequence-regex oracle.  State is ONE int
    per user (the stage — monotone, so cross-batch composition is just
    continuation); late-data replays would need the per-step watermark
    history and are out of contract (documented, not silently wrong:
    the batch operator is the late-data-safe form).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    step_ix = {s: i for i, s in enumerate(steps)}

    def _update(key, pdfs, state):
        stage = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for t in pdf["event_type"]:
                if stage < len(steps) and step_ix.get(t) == stage:
                    stage += 1
        state.update((stage,))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                _update, FUNNEL_OUT_SCHEMA, FUNNEL_STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
