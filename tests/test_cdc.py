"""A14 — icelite incremental-append (CDC) read."""

from __future__ import annotations

import tempfile

import pytest

from engine.icelite import IceliteTable


def _tbl(spark, batches):
    root = tempfile.mkdtemp(prefix="cdc-test-")
    t = IceliteTable(root)
    sids = []
    for rows in batches:
        df = spark.createDataFrame(rows, "k long, v string")
        sids.append(t.commit_append(df))
    return t, sids


def test_incremental_returns_only_later_commits_tagged(spark):
    t, sids = _tbl(spark, [[(1, "a"), (2, "b")], [(3, "c")],
                           [(4, "d"), (5, "e")]])
    rows = t.scan_incremental(spark, sids[0], sids[2]).collect()
    got = {(r.k, r.commit_seq, r.snapshot_id) for r in rows}
    assert got == {(3, 1, sids[1]), (4, 2, sids[2]), (5, 2, sids[2])}


def test_incremental_full_range_and_empty_range(spark):
    t, sids = _tbl(spark, [[(1, "a")], [(2, "b")]])
    # from == to -> empty with the tagged schema
    empty = t.scan_incremental(spark, sids[1], sids[1])
    assert empty.count() == 0
    assert {"commit_seq", "snapshot_id"} <= set(empty.columns)


def test_incremental_rejects_replace_in_range(spark):
    root = tempfile.mkdtemp(prefix="cdc-replace-")
    t = IceliteTable(root)
    s1 = t.commit_append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.commit_replace(spark.createDataFrame([(9, "z")], "k long, v string"))
    s3 = t.commit_append(spark.createDataFrame([(2, "b")], "k long, v string"))
    with pytest.raises(ValueError, match="append-only"):
        t.scan_incremental(spark, s1, s3)


def test_incremental_rejects_non_ancestor(spark):
    t, sids = _tbl(spark, [[(1, "a")], [(2, "b")]])
    with pytest.raises(ValueError, match="not an ancestor|not found"):
        t.scan_incremental(spark, sids[1], sids[0])


def test_incremental_respects_branches(spark):
    """A staged branch commit is reachable from the branch head, not
    from main's."""
    root = tempfile.mkdtemp(prefix="cdc-branch-")
    t = IceliteTable(root)
    s1 = t.commit_append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.create_branch("audit")
    s2 = t.commit_append(spark.createDataFrame([(2, "b")],
                                               "k long, v string"),
                         branch="audit")
    rows = t.scan_incremental(spark, s1, s2).collect()
    assert {(r.k, r.commit_seq) for r in rows} == {(2, 1)}
