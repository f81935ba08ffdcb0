"""Streaming incremental tile maintenance (J10): the final tile table
must equal the one-shot full re-tile of all points — payload-byte
identical — REGARDLESS of micro-batch boundaries, every batch leaves a
time-travelable snapshot, and the first snapshot equals the re-tile of
the first chunk alone."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

import engine.streaming as st
from engine.geo.vectile import encode_vector_tiles


@pytest.fixture(scope="module")
def pts(spark):
    return spark.range(150).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 360000000 / 1000000.0 - 180.0).alias("lon"),
        ((F.col("id") * 40503 + 7) % 170000000 / 1000000.0 - 85.0).alias("lat"),
    ).localCheckpoint(eager=True)


def _run(spark, pts, n_chunks):
    root = tempfile.mkdtemp(prefix=f"st-tiles-{n_chunks}-")
    st.write_point_chunks(pts, f"{root}/chunks", n_chunks=n_chunks)
    stream = st.read_point_stream(spark, f"{root}/chunks/chunk-*")
    return st.maintain_tiles_stream(stream, f"{root}/pts", f"{root}/tiles",
                                    f"{root}/ckpt", z=6)


def _tile_map(df):
    return {(r.tile_x, r.tile_y): (r.n_features, bytes(r.payload))
            for r in df.collect()}


def test_converges_to_full_retile_any_chunking(spark, pts):
    want = _tile_map(encode_vector_tiles(pts, z=6))
    for n_chunks in (1, 4, 7):
        tiles = _run(spark, pts, n_chunks)
        got = _tile_map(tiles.scan(spark))
        assert got == want, f"divergence at n_chunks={n_chunks}"
        # one REPLACE snapshot per non-empty micro-batch
        assert len(tiles.snapshots()) == n_chunks


def test_first_snapshot_is_first_chunk_retile(spark, pts):
    tiles = _run(spark, pts, 4)
    first_sid = tiles.snapshots()[0]["sid"]
    got = _tile_map(tiles.scan(spark, first_sid))
    want = _tile_map(encode_vector_tiles(pts.filter("id % 4 = 0"), z=6))
    assert got == want


def test_stop_and_resume_from_checkpoint(spark, pts):
    """Resumability: ingest the first half, stop, land more chunks, then
    re-run with the SAME checkpoint and tables — the resumed job must
    process only the new files (snapshot count 2 -> 4) and converge to
    the identical full re-tile."""
    root = tempfile.mkdtemp(prefix="st-tiles-resume-")
    first = pts.filter("id % 2 = 0")
    second = pts.filter("id % 2 = 1")
    # chunk files land under the same glob, two at a time (explicit
    # non-empty splits — write_point_chunks keys on id % n, and `first`
    # holds only even ids)
    for c, frac in enumerate([first.filter("id % 4 = 0"),
                              first.filter("id % 4 = 2")]):
        frac.coalesce(1).write.mode("overwrite").parquet(
            f"{root}/chunks/chunk-{c:03d}")
    args = (f"{root}/pts", f"{root}/tiles", f"{root}/ckpt")
    tiles = st.maintain_tiles_stream(
        st.read_point_stream(spark, f"{root}/chunks/chunk-*"), *args, z=6)
    assert len(tiles.snapshots()) == 2
    mid = _tile_map(tiles.scan(spark))
    assert mid == _tile_map(encode_vector_tiles(first, z=6))
    # late chunks arrive (distinct subdir names so nothing is clobbered)
    for c, frac in enumerate([second.filter("id % 4 = 1"),
                              second.filter("id % 4 = 3")]):
        frac.coalesce(1).write.mode("overwrite").parquet(
            f"{root}/chunks/chunk-1{c:02d}")
    tiles = st.maintain_tiles_stream(
        st.read_point_stream(spark, f"{root}/chunks/chunk-*"), *args, z=6)
    assert len(tiles.snapshots()) == 4  # resumed: only the 2 new batches
    assert _tile_map(tiles.scan(spark)) == _tile_map(
        encode_vector_tiles(pts, z=6))
