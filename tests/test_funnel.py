"""F7 — ordered funnel vs a sequential greedy oracle."""

from __future__ import annotations

import datetime as dt
import random

from engine.relops import funnel

T0 = dt.datetime(2024, 1, 1)
STEPS = ["view", "click", "purchase"]


def _greedy_stage(evs, steps):
    """evs: [(ts, seq, type)] -> max step index reached (greedy)."""
    evs = sorted(evs)
    k = 0
    for _, _, t in evs:
        if k < len(steps) and t == steps[k]:
            k += 1
    return k


def _oracle(rows, steps):
    per = {}
    for u, ts, seq, t in rows:
        per.setdefault(u, []).append((ts, seq, t))
    counts = [0] * len(steps)
    for evs in per.values():
        for i in range(_greedy_stage(evs, steps)):
            counts[i] += 1
    return {i + 1: c for i, c in enumerate(counts)}


def _run(spark, rows, steps=STEPS, parts=None):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    if parts:
        df = df.repartition(parts)
    return {r.step_idx: r.n_users for r in funnel(df, steps).collect()}


def test_random_streams_match_greedy_oracle(spark):
    rng = random.Random(5)
    types = STEPS + ["signup", "error"]
    rows = []
    seq = 0
    for u in range(40):
        for _ in range(rng.randrange(0, 15)):
            rows.append((u, T0 + dt.timedelta(seconds=rng.randrange(1000)),
                         seq, rng.choice(types)))
            seq += 1
    for parts in (1, 11):
        assert _run(spark, rows, parts=parts) == _oracle(rows, STEPS)


def test_order_is_strict(spark):
    # click BEFORE view: step 2 not reached.
    rows = [(1, T0, 0, "click"), (1, T0 + dt.timedelta(seconds=1), 1, "view")]
    assert _run(spark, rows) == {1: 1, 2: 0, 3: 0}


def test_same_ts_breaks_on_seq(spark):
    # view and click share ts; click has the larger seq -> counts.
    rows = [(1, T0, 0, "view"), (1, T0, 1, "click")]
    assert _run(spark, rows) == {1: 1, 2: 1, 3: 0}
    # reversed seq -> click precedes view in the total order.
    rows2 = [(1, T0, 1, "view"), (1, T0, 0, "click")]
    assert _run(spark, rows2) == {1: 1, 2: 0, 3: 0}


def test_greedy_is_optimal_interleaving(spark):
    # view(0) click(1) view(2) purchase(3): greedy matches v0,c1,p3.
    rows = [(1, T0 + dt.timedelta(seconds=i), i, t)
            for i, t in enumerate(["view", "click", "view", "purchase"])]
    assert _run(spark, rows) == {1: 1, 2: 1, 3: 1}


def test_empty_and_no_completions(spark):
    rows = [(1, T0, 0, "signup")]
    assert _run(spark, rows) == {1: 0, 2: 0, 3: 0}


# ------------------------------------------- contiguous sequence match

def test_seq_match_matches_reference(spark):
    import random
    from engine.relops import seq_match
    rng = random.Random(7)
    types = ["view", "click", "purchase", "signup", "error"]
    rows = [(u, i, i, rng.choice(types))
            for u in range(12) for i in range(rng.randrange(0, 30))]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string")
    got = {r.user: (r.n_events, r.n_matches)
           for r in seq_match(df, ["view", "click", "purchase"],
                              ts_col="ts").collect()}
    ref = {}
    for u, _, _, t in rows:
        ref.setdefault(u, []).append(t[0])
    for u, cs in ref.items():
        s = "".join(cs)  # rows are already in (ts, seq) order
        n = 0
        i = 0
        while (j := s.find("vcp", i)) != -1:
            n += 1
            i = j + 3
        assert got[u] == (len(cs), n), u


def test_seq_match_contiguity_vs_funnel_subsequence(spark):
    # v x c x p is a funnel completion (subsequence) but NOT a
    # contiguous match — the distinguishing witness.
    from engine.relops import seq_match
    rows = [(1, i, i, t) for i, t in enumerate(
        ["view", "error", "click", "error", "purchase"])]
    rows += [(2, i, i, t) for i, t in enumerate(
        ["view", "click", "purchase", "view", "click", "purchase"])]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string")
    got = {r.user: r.n_matches
           for r in seq_match(df, ["view", "click", "purchase"],
                              ts_col="ts").collect()}
    assert got == {1: 0, 2: 2}
