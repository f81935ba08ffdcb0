"""J1-J7 — Structured Streaming vs batch end-state (SURVEY.md §2.J)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine import streaming as st
from engine.icelite import IceliteTable


@pytest.fixture(scope="module")
def events_pdf(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()


@pytest.fixture(scope="module")
def chunks_dir(events_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("event_chunks")
    st.write_event_chunks(events_pdf, str(d))
    return str(d)


def _stream_end_state(spark, chunks_dir, transform, tmp_path, name,
                      mode="update", dedup_keys=None):
    sdf = st.read_event_stream(spark, chunks_dir)
    out = transform(sdf)
    table = st.run_stream_to_icelite(
        out, str(tmp_path / f"{name}_tbl"), str(tmp_path / f"{name}_ckpt"),
        mode=mode,
    )
    df = table.scan(spark)
    if dedup_keys:
        # update-mode emits a row per batch per key; the end state is the
        # last emission per key (max over monotone aggregates)
        aggs = [F.max(c).alias(c) for c in df.columns if c not in dedup_keys]
        df = df.groupBy(*dedup_keys).agg(*aggs)
    return df


def test_chunks_cover_all_events(spark, chunks_dir, events_pdf):
    got = spark.read.parquet(chunks_dir).count()
    assert got == len(events_pdf)


def test_tumbling_stream_equals_batch(spark, chunks_dir, sf_dir, tmp_path):
    batch = st.tumbling_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))
    want = {(r.win_start, r.event_type): (r.n, round(r.sum_value, 6))
            for r in batch.collect()}
    got_df = _stream_end_state(
        spark, chunks_dir,
        lambda s: st.tumbling_agg(s, watermark="3650 days"),
        tmp_path, "tumble", dedup_keys=["win_start", "event_type"],
    )
    got = {(r.win_start, r.event_type): (r.n, round(r.sum_value, 6))
           for r in got_df.collect()}
    assert got == want


def test_sliding_stream_equals_batch(spark, chunks_dir, sf_dir, tmp_path):
    batch = st.sliding_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))
    want = {r.win_start: r.n for r in batch.collect()}
    got_df = _stream_end_state(
        spark, chunks_dir,
        lambda s: st.sliding_agg(s, watermark="3650 days"),
        tmp_path, "slide", dedup_keys=["win_start"],
    )
    got = {r.win_start: r.n for r in got_df.collect()}
    assert got == want


def test_tight_watermark_drops_late_rows(spark, chunks_dir, sf_dir, tmp_path):
    batch_total = st.tumbling_agg(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).agg(F.sum("n")).collect()[0][0]
    got_df = _stream_end_state(
        spark, chunks_dir,
        lambda s: st.tumbling_agg(s, watermark="1 minute"),
        tmp_path, "tight", dedup_keys=["win_start", "event_type"],
    )
    got_total = got_df.agg(F.sum("n")).collect()[0][0]
    assert got_total < batch_total  # late rows were genuinely dropped


def test_session_agg_batch_shape(spark, sf_dir):
    out = st.session_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.win_end > r.win_start and r.n >= 1 for r in rows)


def test_streaming_dedup(spark, events_pdf, tmp_path):
    import pandas as pd

    dup = pd.concat([events_pdf, events_pdf.head(100)], ignore_index=True)
    d = tmp_path / "dup_chunks"
    st.write_event_chunks(dup, str(d), n_chunks=4, shuffle_frac=0.0)
    sdf = st.read_event_stream(spark, str(d))
    table = st.run_stream_to_icelite(
        st.dedup_within_watermark(sdf, "3650 days"),
        str(tmp_path / "dedup_tbl"), str(tmp_path / "dedup_ckpt"),
        mode="append",
    )
    got = table.scan(spark)
    assert got.count() == len(events_pdf)
    assert got.select("event_id").distinct().count() == len(events_pdf)


def test_stateful_running_per_user(spark, chunks_dir, sf_dir, tmp_path):
    sdf = st.read_event_stream(spark, chunks_dir)
    table = st.run_stream_to_icelite(
        st.running_per_user(sdf),
        str(tmp_path / "state_tbl"), str(tmp_path / "state_ckpt"),
        mode="update",
    )
    final = (
        table.scan(spark).groupBy("user_id")
        .agg(F.max("running_count").alias("cnt"),
             F.max("running_sum").alias("total"))
    )
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"),
             F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total"))
    )
    g = {r.user_id: (r.cnt, round(r.total, 6)) for r in final.collect()}
    w = {r.user_id: (r.cnt, round(r.total, 6)) for r in want.collect()}
    assert g == w


def test_stream_checkpoint_restart_processes_only_new_files(
        spark, events_pdf, sf_dir, tmp_path):
    """Kill-and-resume for the STREAM itself: a second availableNow run
    with the SAME checkpoint skips already-committed files and processes
    only the newly arrived ones; the icelite end state equals the batch
    aggregate over ALL events."""
    import os
    chunks = str(tmp_path / "chunks")
    os.makedirs(chunks)
    half = len(events_pdf) // 2
    st.write_event_chunks(events_pdf.iloc[:half], chunks, n_chunks=2)
    tbl_root, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")

    def run():
        sdf = st.read_event_stream(spark, chunks)
        return st.run_stream_to_icelite(
            st.tumbling_agg(sdf, watermark="3650 days"), tbl_root, ckpt,
            mode="update")

    t1 = run()
    sids_after_first = t1.current_snapshot_id()
    # late arrival: remaining events land as a new chunk file
    st.write_event_chunks(
        events_pdf.iloc[half:].reset_index(drop=True), chunks + "/late",
        n_chunks=1)
    # file source watches the top dir only if files appear there: move it
    os.replace(chunks + "/late/chunk-000.parquet", chunks + "/chunk-090.parquet")
    os.rmdir(chunks + "/late")
    t2 = run()
    assert t2.current_snapshot_id() > sids_after_first  # resumed, new batches
    df = t2.scan(spark)
    end = df.groupBy("win_start", "event_type").agg(
        F.max("n").alias("n"), F.round(F.max("sum_value"), 2).alias("sv"))
    batch = st.tumbling_agg(
        spark.read.parquet(f"{sf_dir}/events.parquet")).select(
        "win_start", "event_type", "n", F.round("sum_value", 2).alias("sv"))
    got = sorted(tuple(r) for r in end.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


# --------------------------------------- J17: streaming SCD2 (r5 cont.)

def test_stream_scd2_equals_batch_end_to_end(spark):
    import __spark_entry__ as m
    from engine.relops import scd2_build
    got = sorted(map(tuple, m.queries()["stream_scd2"](
        spark, "/root/testdata/sf0.001").collect()))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = sorted(map(tuple, scd2_build(
        ev, "user_id", "ts", "event_type", "event_id").collect()))
    assert got == want


def test_stream_scd2_boundary_spanning_run_collapses(spark, tmp_path):
    """A run of one attribute value split across two micro-batches must
    collapse to ONE version row — the case a per-batch-only SCD2
    builder gets wrong (it would emit two rows for the run)."""
    import os

    import pandas as pd

    from engine.icelite import IceliteTable
    from engine.relops import scd2_build

    base = pd.Timestamp("2026-01-01")
    rows = []
    # key u1: 'a','a' in batch 0 | 'a','b' in batch 1 -> runs a(v1), b(v2)
    for i, (t, et) in enumerate([(0, "a"), (1, "a"), (2, "a"), (3, "b")]):
        rows.append({"event_id": i, "user_id": 1, "event_type": et,
                     "ts": base + pd.Timedelta(minutes=t), "value": 1.0,
                     "props": "{}"})
    pdf = pd.DataFrame(rows)
    d = tmp_path / "chunks"
    os.makedirs(d)
    pdf.iloc[:2].to_parquet(d / "chunk-000.parquet", index=False,
                            coerce_timestamps="us")
    pdf.iloc[2:].to_parquet(d / "chunk-001.parquet", index=False,
                            coerce_timestamps="us")

    sdf = st.read_event_stream(spark, str(d))
    feed = IceliteTable(str(tmp_path / "feed"))
    dim = IceliteTable(str(tmp_path / "dim"))

    def _sink(batch_df, batch_id):
        rws = batch_df.select("user_id", "ts", "event_type", "event_id")
        if rws.isEmpty():
            return
        feed.commit_append(rws, stage=f"b{batch_id}")
        keys = rws.select("user_id").distinct()
        hist = feed.scan(spark).join(F.broadcast(keys), "user_id", "semi")
        rec = scd2_build(hist, "user_id", "ts", "event_type", "event_id")
        if dim.exists() and dim.current_snapshot_id() is not None:
            rec = (dim.scan(spark)
                   .join(F.broadcast(keys), "user_id", "anti")
                   .unionByName(rec))
        dim.commit_replace(rec, stage=f"d{batch_id}")

    q = (sdf.writeStream.foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    out = sorted((r.event_type, r.version, r.is_current)
                 for r in dim.scan(spark).collect())
    # ONE row for the spanning 'a' run, one current 'b' row
    assert out == [("a", 1, 0), ("b", 2, 1)]
    # and at least two dim snapshots were committed (it really streamed)
    assert len(dim.snapshots()) >= 2
