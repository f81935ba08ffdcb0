"""F10 — LOCF gap filling vs a sequential reference."""

from __future__ import annotations

import pytest

from engine.relops import ts_fill_forward


def _run(spark, rows, parts=None, **kw):
    df = spark.createDataFrame(rows, "k string, b long, v long")
    if parts:
        df = df.repartition(parts)
    return {(r.k, r.b): (r.value, r.is_observed)
            for r in ts_fill_forward(df, "k", "b", "v", **kw).collect()}


def _ref(rows):
    per = {}
    for k, b, v in rows:
        per.setdefault(k, {}).setdefault(b, 0)
        per[k][b] += v
    out = {}
    for k, obs in per.items():
        last = None
        for b in range(min(obs), max(obs) + 1):
            if b in obs:
                last = obs[b]
                out[(k, b)] = (last, 1)
            else:
                out[(k, b)] = (last, 0)
    return out


def test_gaps_filled_and_flagged(spark):
    rows = [("a", 1, 10), ("a", 4, 40), ("a", 4, 2), ("a", 7, 70),
            ("b", 100, 5)]
    got = _run(spark, rows)
    exp = _ref(rows)
    assert got == exp
    assert got[("a", 2)] == (10, 0) and got[("a", 4)] == (42, 1)
    assert got[("b", 100)] == (5, 1)
    assert len(got) == 7 + 1


def test_partitioning_invariance(spark):
    rows = [("u%d" % (i % 5), (i * 37) % 50, i) for i in range(200)]
    assert _run(spark, rows, parts=1) == _run(spark, rows, parts=13) \
        == _ref(rows)


def test_span_guard_fires(spark):
    rows = [("a", 0, 1), ("a", 10_000_000, 2)]
    with pytest.raises(Exception, match="max_span|ASSERT|assert"):
        _run(spark, rows, max_span=1000)


# ---------------------------------------------- equal-width histogram

def test_agg_histogram_properties(spark):
    import __spark_entry__ as m
    rows = m.queries()["agg_histogram"](spark,
                                        "/root/testdata/sf0.001").collect()
    assert rows
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .selectExpr("event_type AS key",
                    "CAST(round(value * 100) AS LONG) AS v").collect()
    vals = {}
    for e in ev:
        vals.setdefault(e.key, []).append(e.v)
    for key, rs in by_key.items():
        lo, hi = min(vals[key]), max(vals[key])
        assert all(r.lo_cents == lo and r.hi_cents == hi for r in rs)
        assert all(0 <= r.bin <= 15 for r in rs)
        assert sum(r.n for r in rs) == len(vals[key])
        # brute reference bins
        ref = {}
        for v in vals[key]:
            b = (v - lo) * 16 // (hi - lo + 1)
            ref[b] = ref.get(b, 0) + 1
        assert {r.bin: r.n for r in rs} == ref


# ------------------------------------------------- rolling OLS

def test_win_ols_matches_brute_trailing_window(spark):
    import __spark_entry__ as m
    rows = m.queries()["win_ols"](spark,
                                  "/root/testdata/sf0.001").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    for key, rs in by_key.items():
        rs.sort(key=lambda r: r.x)  # us order == event_id order here
        for i, r in enumerate(rs):
            win = rs[max(0, i - 7):i + 1]
            assert r.n_w == len(win)
            assert r.sum_x == sum(w.x for w in win)
            assert r.sum_y == sum(w.y for w in win)
            assert r.sum_xy == sum(w.x * w.y for w in win)
            assert r.sum_x2 == sum(w.x * w.x for w in win)
        # the slope epilogue is well-defined once the window has
        # two distinct x: denominator n*Sx2 - Sx^2 > 0
        full = [r for r in rs if r.n_w == 8]
        assert all(r.n_w * r.sum_x2 - r.sum_x ** 2 > 0 for r in full)


# ------------------------------------------------- rolling median

def test_win_median_matches_brute_trailing_window(spark):
    import pandas as pd

    import __spark_entry__ as m
    got = {(r.key, r.x): (r.n_w, r.med_cents)
           for r in m.queries()["win_median"](
               spark, "/root/testdata/sf0.001").collect()}
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["y"] = (ev["value"] * 100).round().astype("int64")
    ev["us"] = ev["ts"].astype("int64")
    n_checked = 0
    for key, g in ev.groupby("event_type"):
        g = g.sort_values(["us", "event_id"]).reset_index(drop=True)
        ys = list(g["y"])
        for i, x in enumerate(g["event_id"]):
            win = sorted(ys[max(0, i - 7):i + 1])
            # lower median: 1-based rank ceil(n/2)
            want = win[(len(win) + 1) // 2 - 1]
            assert got[(key, x)] == (len(win), want)
            n_checked += 1
    assert n_checked == len(got) > 0


# ------------------------------------------------- Mann-Kendall trend

def test_ts_kendall_matches_brute_pairs(spark):
    import pandas as pd

    import __spark_entry__ as m
    got = {r.user_id: (r.n, r.n_pairs, r.s, r.n_tie_pairs)
           for r in m.queries()["ts_kendall"](
               spark, "/root/testdata/sf0.001").collect()}
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["v"] = (ev["value"] * 100).round().astype("int64")
    ev["us"] = ev["ts"].astype("int64")
    for uid, g in ev.groupby("user_id"):
        vs = list(g.sort_values(["us", "event_id"])["v"])
        n = len(vs)
        s = d = t = 0
        for i in range(n):
            for j in range(i + 1, n):
                if vs[j] > vs[i]:
                    s += 1
                elif vs[j] < vs[i]:
                    s -= 1
                    d += 1
                else:
                    t += 1
        assert got[uid] == (n, n * (n - 1) // 2, s, t)
    assert len(got) == ev["user_id"].nunique()


def test_mann_kendall_closed_forms(spark):
    """Strictly increasing series: s = n_pairs; constant series:
    s = 0, all pairs tie; singleton: zeros."""
    from engine.relops import mann_kendall_components
    rows = ([("inc", i, i, 10 * i) for i in range(6)]
            + [("const", i, i, 7) for i in range(5)]
            + [("single", 0, 0, 3)])
    df = spark.createDataFrame(rows, "k string, ts long, seq long, v long")
    got = {r.k: (r.n, r.n_pairs, r.s, r.n_tie_pairs)
           for r in mann_kendall_components(df, "k", "ts", "seq", "v")
           .collect()}
    assert got["inc"] == (6, 15, 15, 0)
    assert got["const"] == (5, 10, 0, 10)
    assert got["single"] == (1, 0, 0, 0)


# ------------------------------------------------- streaks (F19)

def test_win_streaks_matches_python_reference(spark):
    import pandas as pd

    import __spark_entry__ as m
    got = {r.user_id: (r.n_active_days, r.longest_streak, r.n_streaks)
           for r in m.queries()["win_streaks"](
               spark, "/root/testdata/sf0.001").collect()}
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000  # us epoch
    for uid, g in ev.groupby("user_id"):
        days = sorted(set(g["day"]))
        streaks = []
        for d in days:
            if streaks and d == streaks[-1][1] + 1:
                streaks[-1][1] = d
            else:
                streaks.append([d, d])
        lens = [b - a + 1 for a, b in streaks]
        assert got[uid] == (len(days), max(lens), len(lens))
    assert len(got) == ev["user_id"].nunique()


def test_win_streaks_islands_closed_forms(spark):
    from pyspark.sql import functions as F
    rows = [("u", d) for d in (1, 2, 3, 7, 9, 10)] + [("v", 5)]
    df = spark.createDataFrame(rows, "user_id string, day long")
    # run the same derivation inline
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("day")
    isl = df.distinct().withColumn(
        "island", F.col("day") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "island").agg(F.count("*").alias("n"))
    got = {r.user_id: sorted(rr.n for rr in runs.collect()
                             if rr.user_id == r.user_id)
           for r in runs.collect()}
    assert got["u"] == [1, 2, 3]     # runs 1-3, 7, 9-10
    assert got["v"] == [1]
