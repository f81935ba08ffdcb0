"""Reliable-checkpoint mode for iterative operators (r5; VERDICT-r4 #5).

`engine/ckpt.py::materialize` defaults to localCheckpoint (executor-
pinned — an executor loss mid-iteration kills the job) and switches to
SparkContext.setCheckpointDir-backed reliable checkpointing when the
operator is called with `checkpoint_dir=...`.  These tests prove the
reliable path (a) actually writes round state to the directory and
(b) is result-identical to the default path on the operators that
thread the option (connected components, pagerank, kcore, sssp, kNN
retries, flow accumulation, basin labels).

setCheckpointDir is process-global, so all tests share ONE pinned dir
(module fixture) — mirroring the documented one-dir-per-application
contract (`materialize` raises on a second, different dir).
"""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import engine.ckpt as ckpt
from engine.ckpt import materialize
from engine.graph import kcore, pagerank_int, sssp_int
from engine.text.dedup import connected_components

_DIR = "/tmp/engine_test_reliable_ckpt"


@pytest.fixture(scope="module")
def ckpt_dir(spark):
    # process-global pin: reuse whatever an earlier module pinned if any
    if ckpt._ckpt_dir_set:
        yield ckpt._ckpt_dir_set[0]
        return
    yield _DIR


def _ckpt_files(d):
    return glob.glob(os.path.join(d, "**", "part-*"), recursive=True)


def test_materialize_reliable_writes_round_state(spark, ckpt_dir):
    before = len(_ckpt_files(ckpt_dir)) if os.path.isdir(ckpt_dir) else 0
    df = materialize(spark.range(100).withColumn("v", F.col("id") * 2),
                     eager=True, checkpoint_dir=ckpt_dir)
    assert df.count() == 100
    # reliable mode persisted blocks under the pinned dir
    assert len(_ckpt_files(ckpt_dir)) > before
    # and the process-global pin is recorded
    assert ckpt._ckpt_dir_set == [ckpt_dir]


def test_materialize_rejects_second_dir(spark, ckpt_dir):
    materialize(spark.range(1), checkpoint_dir=ckpt_dir)
    with pytest.raises(ValueError, match="already pinned"):
        materialize(spark.range(1), checkpoint_dir=ckpt_dir + "-other")


def test_connected_components_reliable_matches_default(spark, ckpt_dir):
    # two path components + a singleton edge: exercises >1 round
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)],
        "id_a long, id_b long")
    base = {(r.id, r.cluster_id)
            for r in connected_components(pairs).collect()}
    rel = {(r.id, r.cluster_id)
           for r in connected_components(
               pairs, checkpoint_dir=ckpt_dir).collect()}
    assert rel == base
    assert rel == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}


def test_graph_ops_reliable_match_default(spark, ckpt_dir):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)],
        "src long, dst long")
    pr_a = {(r.node, r.rank) for r in pagerank_int(edges, iters=3).collect()}
    pr_b = {(r.node, r.rank)
            for r in pagerank_int(edges, iters=3,
                                  checkpoint_dir=ckpt_dir).collect()}
    assert pr_a == pr_b

    kc_a = {(r.node, r.core_deg) for r in kcore(edges, k=2).collect()}
    kc_b = {(r.node, r.core_deg)
            for r in kcore(edges, k=2, checkpoint_dir=ckpt_dir).collect()}
    assert kc_a == kc_b

    wedges = edges.withColumn("w", F.lit(1).cast("long"))
    src = spark.createDataFrame([(1,)], "node long")
    ss_a = {(r.node, r.dist)
            for r in sssp_int(wedges, src, max_hops=6).collect()}
    ss_b = {(r.node, r.dist)
            for r in sssp_int(wedges, src, max_hops=6,
                              checkpoint_dir=ckpt_dir).collect()}
    assert ss_a == ss_b


def test_knn_and_raster_reliable_match_default(spark, ckpt_dir):
    import numpy as np
    from engine.geo.knn import knn_join
    from engine.geo.raster import basin_labels, flow_accumulation

    rng = np.random.default_rng(3)
    pts = spark.createDataFrame(
        [(f"p{i}", float(la), float(lo)) for i, (la, lo) in enumerate(
            zip(rng.uniform(-60, 60, 300), rng.uniform(-179, 179, 300)))],
        "image_id string, lat double, lon double")
    qs = spark.createDataFrame(
        [(0, 10.0, 20.0), (1, -30.0, 150.0)], "qid long, lat double, lon double")
    a = {(r.qid, r.image_id, r.rn)
         for r in knn_join(qs, pts, k=5, level=6).collect()}
    b = {(r.qid, r.image_id, r.rn)
         for r in knn_join(qs, pts, k=5, level=6,
                           checkpoint_dir=ckpt_dir).collect()}
    assert a == b and len(a) == 10

    # tiny DEM-ish weighted grid: a 1-D descending ramp + a side sink
    pix = spark.createDataFrame(
        [(0, 0, 5), (1, 0, 4), (2, 0, 3), (3, 0, 2), (4, 0, 1), (2, 1, 9)],
        "gx long, gy long, w long")
    fa = {(r.gx, r.gy, r.acc) for r in flow_accumulation(pix).collect()}
    fb = {(r.gx, r.gy, r.acc)
          for r in flow_accumulation(pix, checkpoint_dir=ckpt_dir).collect()}
    assert fa == fb
    ba = {(r.gx, r.gy, r.bx, r.by) for r in basin_labels(pix).collect()}
    bb = {(r.gx, r.gy, r.bx, r.by)
          for r in basin_labels(pix, checkpoint_dir=ckpt_dir).collect()}
    assert ba == bb
