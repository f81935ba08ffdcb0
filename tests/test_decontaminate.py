"""Eval-set decontamination (engine/text/ops.py::decontaminate):
hand-built corpus with known overlaps, broadcast/shuffle parity, and
short-doc gram semantics."""

from __future__ import annotations

from engine.text.ops import decontaminate


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


EVAL = [(1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs")]
TRAIN = [
    # exact copy of eval doc 1 -> every 5-gram hits (5 distinct grams)
    (10, "the quick brown fox jumps over the lazy dog"),
    # shares exactly one 5-gram window with eval doc 2
    (11, "please pack my box with five dozen apples today"),
    # clean
    (12, "completely unrelated sentence with no shared phrases at all"),
    # shorter than 5 words: whole text is the single gram; clean
    (13, "tiny doc here"),
]


def test_known_overlaps(spark):
    got = {r.doc_id: (r.n_hit_grams, r.contaminated)
           for r in decontaminate(_mk(spark, TRAIN), _mk(spark, EVAL),
                                  n=5).collect()}
    assert got[10] == (5, True)
    # "pack my box with five" and "my box with five dozen" both survive
    assert got[11] == (2, True)
    assert got[12] == (0, False) and got[13] == (0, False)
    assert len(got) == 4


def test_shuffle_join_path_matches_broadcast(spark):
    a = decontaminate(_mk(spark, TRAIN), _mk(spark, EVAL), n=5,
                      broadcast_eval=True)
    b = decontaminate(_mk(spark, TRAIN), _mk(spark, EVAL), n=5,
                      broadcast_eval=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_short_eval_doc_whole_text_gram(spark):
    # an eval doc shorter than n contributes its whole text as one gram,
    # so only an identical short train doc is contaminated by it
    out = {r.doc_id: r.contaminated
           for r in decontaminate(_mk(spark, [(20, "tiny doc"), (21, "tiny")]),
                                  _mk(spark, [(1, "tiny doc")]),
                                  n=5).collect()}
    assert out == {20: True, 21: False}
