"""H8 — incremental materialized-view maintenance (engine/mv.py):
view == full recompute after every commit, idempotence, cursor resume.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from engine.icelite import IceliteTable
from engine.mv import _cursor, mv_refresh

MEASURES = {
    "n": ("count", None),
    "sum_v": ("sum", "v"),
    "min_v": ("min", "v"),
    "max_v": ("max", "v"),
}


def _chunk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k_raw", "id % 3 AS k", "id * 7 % 101 AS v")


def _full(df):
    return {(r["k"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
            for r in df.groupBy("k").agg(
                F.count("*").cast("long").alias("n"),
                F.sum("v").cast("long").alias("sum_v"),
                F.min("v").cast("long").alias("min_v"),
                F.max("v").cast("long").alias("max_v")).collect()}


def _view(spark, mv):
    return {(r["k"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
            for r in mv.scan(spark).collect()}


def test_mv_tracks_full_recompute(spark, tmp_path):
    fact = IceliteTable(str(tmp_path / "fact"))
    mv = IceliteTable(str(tmp_path / "view"))
    seen = None
    for lo, hi in ((0, 40), (40, 55), (55, 120)):
        ch = _chunk(spark, lo, hi)
        fact.commit_append(ch, stage=f"c{lo}")
        mv_refresh(spark, fact, mv, ["k"], MEASURES)
        seen = ch if seen is None else seen.unionByName(ch)
        assert _view(spark, mv) == _full(seen)
    # cursor rode along
    assert _cursor(mv) == fact.current_snapshot_id()


def test_mv_refresh_idempotent(spark, tmp_path):
    fact = IceliteTable(str(tmp_path / "fact"))
    mv = IceliteTable(str(tmp_path / "view"))
    fact.commit_append(_chunk(spark, 0, 30), stage="c0")
    mv_refresh(spark, fact, mv, ["k"], MEASURES)
    before = _view(spark, mv)
    # no new fact commits: refresh is a no-op fold (delta=None)
    mv_refresh(spark, fact, mv, ["k"], MEASURES)
    assert _view(spark, mv) == before
    assert _cursor(mv) == fact.current_snapshot_id()


def test_mv_resume_from_cursor(spark, tmp_path):
    """A refresh that missed intermediate commits folds them all in one
    delta read (kill-between-commits resume)."""
    fact = IceliteTable(str(tmp_path / "fact"))
    mv = IceliteTable(str(tmp_path / "view"))
    fact.commit_append(_chunk(spark, 0, 20), stage="c0")
    mv_refresh(spark, fact, mv, ["k"], MEASURES)
    # two commits land while the refresher is "down"
    fact.commit_append(_chunk(spark, 20, 50), stage="c1")
    fact.commit_append(_chunk(spark, 50, 90), stage="c2")
    mv_refresh(spark, fact, mv, ["k"], MEASURES)
    assert _view(spark, mv) == _full(_chunk(spark, 0, 90))
