"""J11 — streaming funnel stage machine: cross-batch continuation
equals the batch greedy funnel under in-order replay."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from engine import streaming as st
from engine.relops import funnel

T0 = dt.datetime(2024, 1, 1)
STEPS = ("view", "click", "purchase")


def test_stream_stages_match_batch_funnel(spark):
    rows = []
    seq = 0
    import random
    rng = random.Random(13)
    for u in range(20):
        for _ in range(rng.randrange(1, 12)):
            rows.append((seq, T0 + dt.timedelta(seconds=seq), u,
                         rng.choice(STEPS + ("error",)), 1.0))
            seq += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")

    root = tempfile.mkdtemp(prefix="sf-test-")
    st.write_event_chunks_df(ev, f"{root}/chunks", n_chunks=3,
                             shuffle_frac=0.0)
    sdf = st.read_event_stream(spark, f"{root}/chunks/chunk-*")
    out = st.funnel_stage_stream(sdf, STEPS)
    table = st.run_stream_to_icelite(out, f"{root}/tbl", f"{root}/ckpt",
                                     mode="update")
    stages = {r.user_id: r.stage
              for r in (table.scan(spark).groupBy("user_id")
                        .agg(F.max("stage").alias("stage")).collect())}

    batch = {r.step_idx: r.n_users
             for r in funnel(ev, list(STEPS)).collect()}
    for i in range(1, len(STEPS) + 1):
        got = sum(1 for v in stages.values() if v >= i)
        assert got == batch[i], (i, got, batch)
