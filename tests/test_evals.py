"""Exact ROC-AUC components (engine/ml/evals.py) vs the brute
pairwise definition: auc_num2 == 2*wins + ties over all pos x neg
score pairs (the rank-sum identity).  DuckDB value-hash parity for the
eval_auc driver key runs in test_entry_contract's sweep."""

from __future__ import annotations

import pytest

from engine.ml.evals import auc_components


def _brute_num2(pairs):
    """pairs: [(y, score)] -> (n_pos, n_neg, 2*wins + ties)."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    num2 = sum(2 if p > n else (1 if p == n else 0)
               for p in pos for n in neg)
    return len(pos), len(neg), num2


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "y long, score long")
    [row] = auc_components(df, label="y", score="score").collect()
    return row["n_pos"], row["n_neg"], row["auc_num2"]


CASES = [
    # perfectly separated -> AUC 1
    [(1, 10), (1, 9), (0, 2), (0, 1)],
    # perfectly inverted -> AUC 0
    [(0, 10), (0, 9), (1, 2), (1, 1)],
    # all scores tied -> AUC 0.5 exactly via the tie credit
    [(1, 5), (1, 5), (0, 5), (0, 5), (0, 5)],
    # mixed with partial ties
    [(1, 3), (0, 3), (1, 2), (0, 1), (1, 1), (0, 4), (1, 4), (0, 2)],
    # single positive / single negative
    [(1, 7), (0, 7)],
]


@pytest.mark.parametrize("pairs", CASES)
def test_auc_matches_brute_pairwise(spark, pairs):
    assert _run(spark, pairs) == _brute_num2(pairs)


def test_auc_randomized_brute(spark, rng):
    pairs = [(int(rng.integers(0, 2)), int(rng.integers(0, 12)))
             for _ in range(300)]
    n_pos, n_neg, num2 = _run(spark, pairs)
    assert (n_pos, n_neg, num2) == _brute_num2(pairs)
    # sanity: the implied AUC is a valid probability
    assert 0 <= num2 <= 2 * n_pos * n_neg


def test_auc_degenerate_single_class(spark):
    n_pos, n_neg, num2 = _run(spark, [(1, 3), (1, 5)])
    assert (n_pos, n_neg, num2) == (2, 0, 0)


def test_auc_partitioning_independent(spark):
    pairs = [(int(i % 3 == 0), int((i * 37) % 50)) for i in range(500)]
    df = spark.createDataFrame(pairs, "y long, score long")
    a = auc_components(df).collect()
    b = auc_components(df.repartition(13, "score")).collect()
    assert a == b


# --------------------------------------- calibration bins (M48)

def test_calibration_bins_reference_and_epilogue(spark):
    import pandas as pd

    import __spark_entry__ as m
    got = {r.bin: (r.n, r.n_pos, r.sum_score)
           for r in m.queries()["eval_calibration"](
               spark, "/root/testdata/sf0.001").collect()}
    cust = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    want = {}
    for c in cust["c_custkey"]:
        y = 1 if (c * 2654435761) % 100 < 40 else 0
        score = (c * 40503 + 11) % 1000 + (250 if y else 0)
        b = score * 10 // 1250
        n, p, s = want.get(b, (0, 0, 0))
        want[b] = (n + 1, p + y, s + score)
    assert got == want
    # reliability epilogue: observed rate rises with the bin (the
    # planted +250 positive shift makes high bins positive-heavy)
    rates = [got[b][1] / got[b][0] for b in sorted(got)]
    assert rates[-1] > rates[0]
    # ECE epilogue is a well-defined float in [0, 1]
    n_tot = sum(v[0] for v in got.values())
    ece = sum(v[0] * abs(v[1] / v[0] - v[2] / (v[0] * 1250))
              for v in got.values()) / n_tot
    assert 0 <= ece <= 1
