"""E17 — exact presence bitmap (engine/sketch.py::presence_bitmap):
reference parity, the OR merge law, distinct-count exactness, and the
domain guard."""

from __future__ import annotations

import random

import pytest

from engine.sketch import presence_bitmap


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, v long")


def _i64(x):
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def _ref(rows):
    out = {}
    for g, v in rows:
        w, b = v // 64, v % 64
        out[(g, w)] = out.get((g, w), 0) | (1 << b)
    return {k: (_i64(m), bin(m).count("1")) for k, m in out.items()}


def test_bitmap_matches_reference_random(spark):
    rng = random.Random(3)
    rows = [(rng.choice("abc"), rng.randrange(1024)) for _ in range(500)]
    got = {(r.grp, r.word): (r.bits, r.pop)
           for r in presence_bitmap(_df(spark, rows), "grp", "v").collect()}
    assert got == _ref(rows)


def test_bitmap_popcount_is_exact_distinct(spark):
    rng = random.Random(9)
    rows = [("g", rng.randrange(300)) for _ in range(2000)]
    res = presence_bitmap(_df(spark, rows), "grp", "v").collect()
    assert sum(r.pop for r in res) == len({v for _, v in rows})


def test_bitmap_or_merge_law(spark):
    # bitmap(A ∪ B) == word-wise OR of bitmap(A), bitmap(B) — the
    # property that makes the sketch mergeable across partitions,
    # snapshots, and streams.
    rng = random.Random(17)
    a = [("g", rng.randrange(256)) for _ in range(150)]
    b = [("g", rng.randrange(256)) for _ in range(150)]
    bm = lambda rows: {r.word: r.bits for r in
                       presence_bitmap(_df(spark, rows), "grp",
                                       "v").collect()}
    ba, bb, bu = bm(a), bm(b), bm(a + b)
    words = set(ba) | set(bb)
    assert bu == {w: _i64(((ba.get(w, 0)) & ((1 << 64) - 1))
                          | ((bb.get(w, 0)) & ((1 << 64) - 1)))
                  for w in words}


def test_bitmap_bit63_round_trips(spark):
    # value 63 sets the sign bit: int64 two's complement on both
    # engines; pop still counts it as one bit.
    res = presence_bitmap(_df(spark, [("g", 63)]), "grp", "v").collect()
    assert len(res) == 1
    assert (res[0].word, res[0].bits, res[0].pop) == (0, -(1 << 63), 1)


def test_bitmap_domain_guard_raises(spark):
    with pytest.raises(Exception, match="out of domain"):
        presence_bitmap(_df(spark, [("g", 1024)]), "grp", "v",
                        domain=1024).collect()


def test_stream_bitmap_equals_batch(spark):
    # the streaming key's foreachBatch commits must OR-merge to the
    # one-shot batch bitmap (the merge law, end to end through icelite)
    import __spark_entry__ as m
    sf = "/root/testdata/sf0.001"
    got = {(r.grp, r.word): (r.bits, r.pop)
           for r in m.queries()["stream_bitmap"](spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet").selectExpr(
        "event_type", "user_id % 1024 AS v")
    want = {(r.grp, r.word): (r.bits, r.pop)
            for r in presence_bitmap(ev, "event_type", "v").collect()}
    assert got == want and len(got) > 0
