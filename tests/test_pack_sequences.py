"""Sequence packing (engine/text/ops.py::pack_sequences): greedy
concat-then-chunk assignment verified against a pure-Python oracle,
straddle semantics, and shard determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.text.ops import pack_sequences


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, w long")


def test_pack_matches_python_oracle(spark):
    rows = [(i, "s" + str(i % 3), 50 + (i * 37) % 400) for i in range(200)]
    out = pack_sequences(
        _mk(spark, rows), weight_col="w", capacity=1000,
        group_cols=("source",)).collect()
    # python oracle: per group, order by id, exclusive prefix sum
    by_group: dict[str, int] = {}
    expect = {}
    for i, src, w in sorted(rows):
        off = by_group.get(src, 0)
        expect[i] = (off, off // 1000, off % 1000)
        by_group[src] = off + w
    for r in out:
        assert (r.pack_off, r.bin_id, r.bin_offset) == expect[r.doc_id]


def test_straddle_overflows_into_own_start_bin(spark):
    # 600+600: second doc starts at 600 -> bin 0 (overflowing it), third
    # at 1200 -> bin 1; a giant doc occupies the bin where it starts
    rows = [(1, "a", 600), (2, "a", 600), (3, "a", 5000), (4, "a", 100)]
    got = {r.doc_id: (r.bin_id, r.bin_offset)
           for r in pack_sequences(_mk(spark, rows), weight_col="w",
                                   capacity=1000,
                                   group_cols=("source",)).collect()}
    assert got == {1: (0, 0), 2: (0, 600), 3: (1, 200), 4: (6, 200)}


def test_sharded_packing_is_deterministic_and_partitioned(spark):
    rows = [(i, "a", 100) for i in range(100)]
    a = pack_sequences(_mk(spark, rows), weight_col="w", capacity=500,
                       group_cols=("source",), n_shards=4)
    b = pack_sequences(_mk(spark, rows), weight_col="w", capacity=500,
                       group_cols=("source",), n_shards=4)
    ra = sorted((r.doc_id, r.pack_shard, r.bin_id) for r in a.collect())
    assert ra == sorted((r.doc_id, r.pack_shard, r.bin_id) for r in b.collect())
    # every shard packs independently from offset 0
    first = (a.groupBy("pack_shard").agg(F.min("pack_off").alias("m"))
             .collect())
    assert all(r.m == 0 for r in first) and len(first) == 4
