"""M29 — bigram LM coverage vs a sequential reference."""

from __future__ import annotations

import re

from engine.text.ops import bigram_coverage


def _ref(docs, k):
    toks = {i: [t for t in re.split(r"[^a-z]+", (s or "").lower()) if t]
            for i, s in docs}
    bgs = {i: [f"{a} {b}" for a, b in zip(t, t[1:])]
           for i, t in toks.items()}
    cnt = {}
    for lst in bgs.values():
        for b in lst:
            cnt[b] = cnt.get(b, 0) + 1
    vocab = {b for b, _ in sorted(cnt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:k]}
    out = {}
    for i, lst in bgs.items():
        hits = sum(b in vocab for b in lst)
        out[i] = (len(lst), hits, len(lst) - hits)
    return out


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "a dog ran over the hill and the cat sat"),
    (4, "one"),
    (5, ""),
    (6, None),
    (7, "  Punct!! splits;; the   cat  "),
    (8, "the cat sat the cat sat the cat sat"),
]


def test_matches_reference_various_k(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for k in (1, 3, 100):
        got = {r.doc_id: (r.n_bigrams, r.n_hits, r.n_oov)
               for r in bigram_coverage(df, k=k).collect()}
        assert got == _ref(DOCS, k), k


def test_short_docs_emit_zero_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.n_bigrams for r in bigram_coverage(df, k=5).collect()}
    assert got[4] == 0 and got[5] == 0 and got[6] == 0
    assert len(got) == len(DOCS)


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, bigram_coverage(df.repartition(1), k=4).collect()))
    b = sorted(map(tuple, bigram_coverage(df.repartition(7), k=4).collect()))
    assert a == b
