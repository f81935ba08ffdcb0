"""Hashing-trick features (engine/text/ops.py::feature_hash) vs a
brute pure-Python reference of the same contract, plus determinism and
cancellation properties.  DuckDB value-hash parity for the feat_hash
driver key runs in test_entry_contract's sweep."""

from __future__ import annotations

import re
from collections import defaultdict

from engine.text.ops import FP_MOD, feature_hash


def _ref(docs, n_buckets=1024):
    out = defaultdict(int)
    for doc_id, text in docs:
        for tok in re.findall(r"[A-Za-z0-9]+", text):
            h = 0
            for ch in tok:
                h = (h * 31 + ord(ch)) % FP_MOD
            sgn = 1 if (h // n_buckets) % 2 == 0 else -1
            out[(doc_id, h % n_buckets)] += sgn
    return {k: v for k, v in out.items() if v != 0}


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "cat cat cat"),            # repeated token stacks
    (3, ""),                       # empty doc -> no rows
    (4, "a b c 123 foo-bar_baz"),  # punctuation splits
    (5, "the cat sat on the mat"),  # duplicate of doc 1
]


def _run(spark, docs, n_buckets=1024):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {(r["doc_id"], r["bucket"]): r["val"]
            for r in feature_hash(df, n_buckets=n_buckets).collect()}


def test_feature_hash_matches_reference(spark):
    assert _run(spark, DOCS) == _ref(DOCS)


def test_feature_hash_duplicate_docs_identical(spark):
    got = _run(spark, DOCS)
    f1 = {b: v for (d, b), v in got.items() if d == 1}
    f5 = {b: v for (d, b), v in got.items() if d == 5}
    assert f1 == f5 and f1


def test_feature_hash_small_bucket_cancellation(spark):
    # with 2 buckets collisions are guaranteed; reference must still
    # agree exactly, including rows dropped by cancellation
    docs = [(1, "x y z w q r s t u v " * 3)]
    assert _run(spark, docs, n_buckets=2) == _ref(docs, n_buckets=2)


def test_feature_hash_repartition_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, feature_hash(df).collect()))
    b = sorted(map(tuple, feature_hash(df.repartition(7)).collect()))
    assert a == b
