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
