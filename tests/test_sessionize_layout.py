"""sessionize (F6) and the tile-partitioned physical layout (A8)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.relops import sessionize


# ---------------------------------------------------------------- sessions

def _events(spark):
    # user 1: three events, gap breaks after the second (45 min)
    # user 2: one lonely event; user 3: two events 1 s apart
    rows = [
        (0, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:10:00", 1),
        (2, "2024-01-01 00:55:00", 1),   # 45 min gap -> new session
        (3, "2024-01-01 09:00:00", 2),
        (4, "2024-01-02 12:00:00", 3),
        (5, "2024-01-02 12:00:01", 3),
    ]
    return spark.createDataFrame(rows, "event_id long, ts string, user_id long") \
        .withColumn("ts", F.col("ts").cast("timestamp"))


def test_sessionize_gap_semantics(spark):
    got = {(r.user_id, r.session_seq): (r.n_events, r.duration_us)
           for r in sessionize(_events(spark), gap_s=1800).collect()}
    assert got == {
        (1, 1): (2, 600_000_000),   # 10 min session
        (1, 2): (1, 0),
        (2, 1): (1, 0),
        (3, 1): (2, 1_000_000),
    }


def test_sessionize_matches_pandas_reference(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {(r.user_id, r.session_seq): (r.n_events, r.start_us, r.end_us)
           for r in sessionize(ev, gap_s=1800).collect()}
    pdf = ev.select("user_id", "event_id", "ts").toPandas()
    pdf["us"] = pdf["ts"].astype("int64")  # ns -> but compare deltas in us
    pdf["us"] = pdf["us"] // 1000
    exp = {}
    for uid, g in pdf.sort_values(["user_id", "us", "event_id"]).groupby("user_id"):
        seq, last = 0, None
        sess = []
        for us in g["us"]:
            if last is None or us - last > 1800 * 1_000_000:
                seq += 1
                sess.append([us, us, 0])
            sess[-1][1] = us
            sess[-1][2] += 1
            last = us
        for i, (s, e, n) in enumerate(sess, 1):
            exp[(uid, i)] = (n, s, e)
    assert got == exp


def test_sessionize_single_exchange(spark, sf_dir):
    from tests.test_plans import plan_of
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = plan_of(sessionize(ev), "simple")
    # window + rollup share the user partitioning: ONE shuffle total
    assert plan.count("Exchange hashpartitioning") == 1


# ------------------------------------------------------------- tile layout

@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    from engine.geo.cells import with_cell
    from engine.geo.tiles import write_tile_partitioned
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "id": np.arange(4000, dtype=np.int64),
        "lon": rng.uniform(-179, 179, 4000),
        "lat": rng.uniform(-80, 80, 4000),
    })
    path = str(tmp_path_factory.mktemp("layout") / "pts")
    write_tile_partitioned(with_cell(spark.createDataFrame(pdf)), path, z=3)
    return path, pdf


def test_layout_roundtrip_complete_and_assigned(spark, layout):
    from oracle.geo import lonlat_to_xy
    path, pdf = layout
    back = spark.read.parquet(path).select("id", "tile_x", "tile_y").collect()
    assert len(back) == len(pdf)
    exp = {int(i): lonlat_to_xy(lo, la, level=3)
           for i, lo, la in zip(pdf["id"], pdf["lon"], pdf["lat"])}
    for r in back:
        assert exp[r.id] == (r.tile_x, r.tile_y)


def test_layout_read_is_partition_pruned(spark, layout):
    from tests.test_plans import plan_of
    from engine.geo.tiles import read_tiles
    path, pdf = layout
    df = read_tiles(spark, path, [(2, 3), (4, 4)])
    plan = plan_of(df, "formatted")
    # the tile predicate resolves to PartitionFilters (directory
    # pruning), NOT a post-scan data filter
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "tile_x" in seg and "tile_y" in seg
    # and values match a direct filter of the full table
    full = spark.read.parquet(path)
    direct = full.filter(((F.col("tile_x") == 2) & (F.col("tile_y") == 3))
                         | ((F.col("tile_x") == 4) & (F.col("tile_y") == 4)))
    assert sorted(r.id for r in df.collect()) == \
        sorted(r.id for r in direct.collect())


def test_layout_files_are_cell_sorted(spark, layout):
    import glob
    import pyarrow.parquet as pq
    path, _ = layout
    files = glob.glob(f"{path}/tile_x=*/tile_y=*/*.parquet")
    assert files
    for f in files[:8]:
        cells = pq.read_table(f, columns=["cell"])["cell"].to_pylist()
        assert cells == sorted(cells)
