"""Mini-BPE tokenizer: hand-computed merges, reconstruction invariant,
compression monotonicity, determinism under repartitioning, and full
distributed-vs-pure-Python parity on the documents table."""

from __future__ import annotations

from engine.text.bpe import (END, bpe_ranks, bpe_stats, bpe_tokenize_word,
                             bpe_train, doc_token_stats)


def test_train_hand_example():
    # corpus: "ab ab ab ac" -> ('a','b') count 3 is the unique top pair.
    # After merging 'ab', pairs are ('ab', END):3, ('a','c'):1,
    # ('c',END):1 -> second merge is ('ab', END).
    merges = bpe_train(["ab ab ab ac"], n_merges=2)
    assert merges == [("a", "b"), ("ab", END)]


def test_train_tie_breaks_lexicographically():
    # "xy" x2 and "xz" x2: pairs (x,y)=2, (y,END)=2, (x,z)=2, (z,END)=2
    # -> smallest pair lexicographically is ('x','y') (END sorts first
    # but no END-led pair exists; ('x','y') < ('x','z') < ('y',END)...)
    merges = bpe_train(["xy xy xz xz"], n_merges=1)
    assert merges == [("x", "y")]


def test_tokenize_reconstruction_invariant():
    corpus = ["the quick brown fox jumps over the lazy dog",
              "pack my box with five dozen liquor jugs the the the"]
    ranks = bpe_ranks(bpe_train(corpus, n_merges=50))
    for t in corpus + ["unseen wordszz the"]:
        for w in t.split():
            toks = bpe_tokenize_word(w, ranks)
            assert "".join(toks) == w + END, w


def test_more_merges_never_increase_token_count():
    corpus = ["low lower lowest slow slower slowest low low"] * 3
    text = "lower slowest lowly"
    prev = None
    for n in (0, 5, 10, 20, 40):
        ranks = bpe_ranks(bpe_train(corpus, n_merges=n))
        _, nt, _ = doc_token_stats(text, ranks)
        if prev is not None:
            assert nt <= prev, f"n_merges={n}"
        prev = nt


def test_distributed_matches_pure_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens, r.tok_hash)
           for r in bpe_stats(docs, n_merges=80, sample=64).collect()}

    pdf = docs.select("doc_id", "text").toPandas()
    sample = pdf.sort_values("doc_id").head(64)["text"].tolist()
    ranks = bpe_ranks(bpe_train(sample, n_merges=80))
    cache: dict = {}
    assert len(got) == len(pdf)
    for did, txt in zip(pdf["doc_id"], pdf["text"]):
        assert got[did] == doc_token_stats(txt or "", ranks, cache), did


def test_partitioning_independence(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, bpe_stats(docs, n_merges=40, sample=32).collect()))
    b = sorted(map(tuple, bpe_stats(docs.repartition(13), n_merges=40,
                                    sample=32).collect()))
    assert a == b


# ------------------------------------------------- distributed training

from engine.text.bpe import bpe_train_dist, bpe_train_full


def test_dist_training_matches_sequential(spark):
    texts = ["the cat sat on the mat", "the cat ate the rat",
             "low lower lowest low low", "newer newest new new wider"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe_train_dist(df, n_merges=25).collect()]
    want = [(i, a, b, c)
            for i, (a, b, c) in enumerate(bpe_train_full(texts, 25))]
    assert got == want


def test_dist_training_matches_sequential_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe_train_dist(docs, n_merges=15).collect()]
    texts = [r["text"] for r in docs.select("text").collect()]
    want = [(i, a, b, c)
            for i, (a, b, c) in enumerate(bpe_train_full(texts, 15))]
    assert got == want


def test_dist_training_partitioning_invariant(spark):
    """Same merges under a different partitioning (order-free aggs)."""
    texts = ["aa ab ba bb ab aa", "ba ba ab aa bb"] * 4
    df1 = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                "doc_id long, text string")
    df2 = df1.repartition(13)
    r1 = [tuple(r) for r in bpe_train_dist(df1, n_merges=8).collect()]
    r2 = [tuple(r) for r in bpe_train_dist(df2, n_merges=8).collect()]
    assert r1 == r2
