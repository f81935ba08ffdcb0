"""L9 — declarative expectations (engine/dq.py::expect): planted
violations of every rule kind, the pinned NULL-is-a-violation
semantics, and the all-green case."""
from __future__ import annotations


def test_expect_counts_planted_violations(spark):
    from engine.dq import expect
    rows = [
        (1, 1, 10, "x"),     # clean
        (2, 1, -5, "x"),     # v_pos violation
        (3, 1, None, "x"),   # NULL -> violation (pinned semantics)
        (4, 1, 10, "x"),     # clean
        (4, 1, 10, "x"),     # duplicate (k1,k2) with row above
        (9, 1, 10, "zz"),    # orphan fk + bad label
    ]
    df = spark.createDataFrame(rows, "k1 int, k2 int, v int, lab string")
    dim = spark.createDataFrame([(1,), (2,), (3,), (4,)], "k1 int")
    got = {r.rule: (r.n_checked, r.n_violations, r.passed)
           for r in expect(
               df, {"v_pos": "v > 0", "lab_domain": "lab IN ('x', 'y')"},
               unique_key=("k1", "k2"),
               fk=(("k1",), dim, ("k1",))).collect()}
    assert got["v_pos"] == (6, 2, 0)          # -5 and NULL both violate
    assert got["lab_domain"] == (6, 1, 0)
    assert got["unique:k1,k2"] == (6, 2, 0)   # both rows of the dup pair
    assert got["fk:k1"] == (6, 1, 0)


def test_expect_all_green_and_gate(spark):
    from pyspark.sql import functions as F

    from engine.dq import expect
    df = spark.createDataFrame([(i, i * 2) for i in range(1, 20)],
                               "k int, v int")
    rep = expect(df, {"v_even": "v % 2 = 0", "k_pos": "k > 0"},
                 unique_key=("k",))
    rows = rep.collect()
    assert all(r.passed == 1 and r.n_violations == 0 for r in rows)
    # the WAP audit gate consumes min(passed)
    assert rep.agg(F.min("passed")).first()[0] == 1


def test_streamed_dq_totals_equal_batch_and_flag_recompute(spark):
    """The merge law: summed per-batch reports equal the batch report
    over the whole feed — and `passed` must be RECOMPUTED from merged
    totals (a batch-level pass flag does not merge: one red batch
    reds the total even if later batches are clean)."""
    from engine.dq import expect
    import __spark_entry__ as m
    got = {r.rule: (r.n_checked, r.n_violations, r.passed)
           for r in m.queries()["stream_dq"](
               spark, "/root/testdata/sf0.001").collect()}
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rules = {"value_nonneg": "value >= 0.0",
             "value_domain": "value <= 1000.0",
             "type_domain": ("event_type IN ('view', 'click', 'cart', "
                             "'purchase', 'signup')"),
             "ts_present": "ts IS NOT NULL"}
    want = {r.rule: (r.n_checked, r.n_violations, r.passed)
            for r in expect(ev, rules).collect()}
    assert got == want
    # flag-recompute witness: a rule violated in exactly one batch
    # has passed=0 in the merged report even when other batches are
    # clean (construct directly)
    a = expect(spark.createDataFrame([(5,)], "v int"), {"p": "v > 0"})
    b = expect(spark.createDataFrame([(-5,)], "v int"), {"p": "v > 0"})
    merged = a.unionByName(b).groupBy("rule").sum("n_violations")
    assert merged.collect()[0][1] == 1   # merged counts say red
    assert a.collect()[0].passed == 1    # though batch A was green
