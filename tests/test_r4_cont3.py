"""r4 continuation batch 3: event-analytics operators — cohort
retention, Markov path transitions, SCD2 dimension build
(engine/relops.py).  Each is checked against a brute-force pure-Python
oracle on a small deterministic fixture, plus structural invariants.
(DuckDB value-hash parity runs in test_entry_contract's sweep.)
"""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

from engine.relops import cohort_retention, path_transitions, scd2_build

EPOCH = dt.datetime(1970, 1, 1)


def _events(spark, rows):
    """rows: (user_id, seconds_from_epoch, event_type, event_id)."""
    data = [(u, EPOCH + dt.timedelta(seconds=s), t, e)
            for (u, s, t, e) in rows]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long")


FIX = [
    # user 1: buckets 0, 0, 2 (bucket = s // 100)
    (1, 10, "a", 0), (1, 20, "a", 1), (1, 250, "b", 2),
    # user 2: buckets 1, 3
    (2, 150, "b", 3), (2, 350, "a", 4),
    # user 3: single event, bucket 0; tie on ts with event 0
    (3, 10, "c", 5),
    # user 4: consecutive duplicate types + a flip back
    (4, 5, "a", 6), (4, 6, "a", 7), (4, 7, "b", 8), (4, 8, "a", 9),
]


def test_cohort_retention_brute(spark):
    got = {(r["cohort_bucket"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(_events(spark, FIX),
                                     bucket_s=100).collect()}
    first = {}
    active = defaultdict(set)
    for (u, s, _t, _e) in FIX:
        b = s // 100
        first[u] = min(first.get(u, b), b)
        active[u].add(b)
    want: Counter = Counter()
    for u, bs in active.items():
        for b in bs:
            want[(first[u], b - first[u])] += 1
    assert got == dict(want)


def test_path_transitions_brute(spark):
    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in path_transitions(_events(spark, FIX)).collect()}
    byu = defaultdict(list)
    for (u, s, t, e) in sorted(FIX, key=lambda r: (r[1], r[3])):
        byu[u].append(t)
    want: Counter = Counter()
    for seq in byu.values():
        for a, b in zip(["^"] + seq[:-1], seq):
            want[(a, b)] += 1
    assert got == dict(want)
    # conservation: every event contributes exactly one transition
    assert sum(got.values()) == len(FIX)


def test_scd2_build_brute(spark):
    rows = scd2_build(_events(spark, FIX), "user_id", "ts",
                      "event_type", "event_id").collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["user_id"]].append(r)
    # brute: collapse consecutive duplicates per user
    byu = defaultdict(list)
    for (u, s, t, e) in sorted(FIX, key=lambda r: (r[1], r[3])):
        us = s * 1_000_000
        if not byu[u] or byu[u][-1][0] != t:
            byu[u].append((t, us))
    for u, runs in byu.items():
        got = sorted(by_key[u], key=lambda r: r["version"])
        assert [(r["event_type"], r["valid_from_us"]) for r in got] == runs
        # interval chaining + exactly one current row
        for a, b in zip(got[:-1], got[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
        assert [r["is_current"] for r in got] == [0] * (len(got) - 1) + [1]
        assert [r["version"] for r in got] == list(range(1, len(got) + 1))
    assert set(by_key) == set(byu)


# ---------------------------------------------------------- interval join

import random

from engine.relops import interval_join


def test_interval_join_matches_brute(spark):
    rng = random.Random(5)
    A = [(i, rng.randrange(0, 500), 0) for i in range(60)]
    A = [(i, s, s + rng.randrange(1, 80)) for (i, s, _) in A]
    B = [(i, rng.randrange(0, 500), 0) for i in range(70)]
    B = [(i, s, s + rng.randrange(1, 80)) for (i, s, _) in B]
    da = spark.createDataFrame(A, "a_id long, s long, e long")
    db = spark.createDataFrame(B, "b_id long, s long, e long")
    got = {(r["a_id"], r["b_id"]): r["overlap"]
           for r in interval_join(da, db, a_id="a_id", b_id="b_id",
                                  bucket=64).collect()}
    want = {(i, j): min(e1, e2) - max(s1, s2)
            for (i, s1, e1) in A for (j, s2, e2) in B
            if s1 < e2 and s2 < e1}
    assert got == want


def test_interval_join_span_exceeding_bucket(spark):
    """Intervals longer than the bucket still pair exactly once."""
    da = spark.createDataFrame([(1, 0, 1000)], "a_id long, s long, e long")
    db = spark.createDataFrame([(2, 500, 501), (3, 999, 2000),
                                (4, 1000, 1100)],
                               "b_id long, s long, e long")
    got = sorted((r["a_id"], r["b_id"], r["overlap"]) for r in
                 interval_join(da, db, a_id="a_id", b_id="b_id",
                               bucket=16).collect())
    assert got == [(1, 2, 1), (1, 3, 1)]   # [s,e) half-open: 4 touches only


# ------------------------------------------------------------ MAD outliers

from engine.relops import mad_outliers


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_mad_outliers_brute(spark):
    rng = random.Random(9)
    rows = []
    eid = 0
    for u in range(5):
        base = rng.randrange(100, 200)
        for _ in range(rng.randrange(3, 40)):
            v = base + rng.randrange(-10, 11)
            if rng.random() < 0.1:
                v += 1000          # planted outliers
            rows.append((u, eid, v))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, v long")
    got = {r["user_id"]: (r["n"], r["med"], r["mad"], r["n_anomalies"])
           for r in mad_outliers(df, "user_id", "v", "event_id").collect()}
    byu = {}
    for (u, e, v) in rows:
        byu.setdefault(u, []).append(v)
    for u, vs in byu.items():
        med = _lower_median(vs)
        mad = _lower_median([abs(v - med) for v in vs])
        n_anom = sum(1 for v in vs if abs(v - med) > 3 * mad)
        assert got[u] == (len(vs), med, mad, n_anom)
    assert set(got) == set(byu)
    # every statistic is an element of its input multiset (selection)
    for u, (n, med, mad, _a) in got.items():
        assert med in byu[u]
        assert mad in {abs(v - med) for v in byu[u]}
