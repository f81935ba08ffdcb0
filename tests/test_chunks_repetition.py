"""chunk_docs + repetition_stats (late r4) — exact sequential-Python
oracles incl. edge cases the driver tables don't exercise (empty text,
single token, doc shorter than the n-gram, adversarial repetition)."""

from __future__ import annotations

from collections import Counter

import pytest

from engine.text.ops import chunk_docs, repetition_stats

EDGE_TEXTS = [
    "",                                  # empty -> 1 chunk, 1 token ('')
    "x",                                 # single char
    "one two",                           # shorter than any chunk
    "a " * 200 + "a",                    # adversarial: one token repeated
    "tok%d " % 7 * 50,                   # trailing space -> empty token
    " ".join(f"w{i}" for i in range(120)),   # all distinct
    "ab cd ab cd ab cd ef",              # repeated 2-grams
    "z" * 300,                           # one huge token, multiple chunks
]


def _mkdf(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _chunks_py(text, size, overlap):
    stride = size - overlap
    n = max(1, -(-(len(text) - overlap) // stride))
    return [(i, i * stride, text[i * stride:i * stride + size])
            for i in range(n)]


@pytest.mark.parametrize("size,overlap", [(96, 16), (10, 0), (8, 7)])
def test_chunk_docs_exact(spark, size, overlap):
    df = _mkdf(spark, EDGE_TEXTS)
    got = {}
    for r in chunk_docs(df, size=size, overlap=overlap).collect():
        got.setdefault(r.doc_id, []).append(r)
    for i, text in enumerate(EDGE_TEXTS):
        want = _chunks_py(text, size, overlap)
        rows = sorted(got[i], key=lambda r: r.chunk_id)
        assert [(r.chunk_id, r.chunk_start, r.chunk_text) for r in rows] == want
        # coverage identity: chunks reassemble the document exactly
        rebuilt = rows[0].chunk_text + "".join(
            r.chunk_text[overlap:] for r in rows[1:])
        assert rebuilt == text
        assert all(r.chunk_len == len(r.chunk_text) for r in rows)


def test_chunk_docs_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_docs(_mkdf(spark, ["x"]), size=8, overlap=8)


def _rep_py(text):
    toks = text.split(" ")
    out = {"n_tokens": len(toks),
           "n_distinct_tokens": len(set(toks)),
           "top_token_count": max(Counter(toks).values())}
    for n in (2, 3):
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        out[f"n_{n}grams"] = len(grams)
        out[f"n_distinct_{n}grams"] = len(set(grams))
    return out


def test_repetition_stats_exact(spark):
    df = _mkdf(spark, EDGE_TEXTS)
    got = {r.doc_id: r.asDict() for r in repetition_stats(df).collect()}
    for i, text in enumerate(EDGE_TEXTS):
        want = _rep_py(text)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)


def test_repetition_flags_degenerate_docs(spark):
    """The signal the op exists for: looping text scores near-zero
    distinct-gram ratios, natural text scores high."""
    loop = "buy now " * 500
    natural = " ".join(f"w{i * 7 % 997}" for i in range(1000))
    r = {x.doc_id: x for x in
         repetition_stats(_mkdf(spark, [loop, natural])).collect()}
    assert r[0].n_distinct_2grams <= 3
    assert r[1].n_distinct_2grams >= 990
    assert r[0].top_token_count >= 499


# ------------------------------------------------------------- PII scrub

import re

from engine.text.ops import PII_PATTERNS, pii_scrub


def test_pii_scrub_brute(spark):
    docs = [
        (0, "plain text no pii at all"),
        (1, "mail me at alice1@example.com or bob@test.org now"),
        (2, "ids 1234567 and 99999 and 123456789012"),
        (3, "mixed a9@b8.cc plus 7654321 tail"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["scrubbed"], r["n_email"], r["n_number"])
           for r in pii_scrub(df).collect()}
    (em, em_pat, em_rep), (nu, nu_pat, nu_rep) = PII_PATTERNS
    for did, text in docs:
        n_email = len(re.findall(em_pat, text))
        s1 = re.sub(em_pat, em_rep, text)
        n_number = len(re.findall(nu_pat, s1))
        scrubbed = re.sub(nu_pat, nu_rep, s1)
        assert got[did] == (scrubbed, n_email, n_number)
    # the 5-digit run survives; the email local-part digits never
    # count as numbers (scrub-order contract)
    assert "99999" in got[2][0] and got[2][2] == 2
    assert got[1] == ("mail me at <EMAIL> or <EMAIL> now", 2, 0)


# --------------------------------------------- sentence segmentation

def test_sentence_stats_matches_reference(spark):
    import re
    from engine.text.ops import sentence_stats
    docs = [
        (0, "Hello world. This is fine! Is it? Yes."),
        (1, "No terminator here"),
        (2, "Multi... dots!!  And   spaces?  end."),
        (3, ""),
        (4, "Trailing bang!"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_sentences, r.max_sentence_chars,
                      r.sum_sentence_chars, r.first_sentence)
           for r in sentence_stats(df).collect()}
    for did, text in docs:
        frags = [s.strip() for s in re.split(r"[.!?]+\s+", text)]
        frags = [re.sub(r"[.!?]+$", "", s) for s in frags if s != ""]
        lens = [len(s) for s in frags]
        assert got[did] == (len(frags), max(lens, default=0),
                            sum(lens), frags[0] if frags else ""), did


def test_sentence_stats_contract_is_abbreviation_blind(spark):
    # "Dr. Who" splits at the abbreviation period — the DOCUMENTED
    # heuristic contract, pinned so a future "smarter" segmenter is a
    # breaking change, not a drift.
    from engine.text.ops import sentence_stats
    df = spark.createDataFrame([(0, "Dr. Who met Mr. Smith.")],
                               "doc_id long, text string")
    r = sentence_stats(df).collect()[0]
    assert r.n_sentences == 3 and r.first_sentence == "Dr"


# --------------------------------------------- URL canonicalization

def test_url_canonical_rules(spark):
    from engine.text.url import canonicalize_urls
    cases = [
        # (url, canon, host, port, n_params)
        ("HTTP://WWW.Example.COM:80/a/b/?b=2&a=1#x",
         "http://example.com/a/b?a=1&b=2", "example.com", "", 2),
        ("https://Example.com:443/", "https://example.com", 
         "example.com", "", 0),
        ("https://example.com:8443/p?z=1",
         "https://example.com:8443/p?z=1", "example.com", "8443", 1),
        ("http://example.com", "http://example.com", "example.com",
         "", 0),
        ("https://www.www.site.org/q?a=2&a=1",
         "https://www.site.org/q?a=1&a=2", "www.site.org", "", 2),
        ("HTTPS://site.io:80/x", "https://site.io:80/x", "site.io",
         "80", 0),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)],
                               "doc_id long, url string")
    got = {r.doc_id: (r.canon_url, r.host, r.port, r.n_params)
           for r in canonicalize_urls(df).collect()}
    for i, (_, canon, host, port, np_) in enumerate(cases):
        assert got[i] == (canon, host, port, np_), (i, got[i])


def test_url_canonical_is_idempotent(spark):
    # canon(canon(u)) == canon(u) for the fixture family
    from pyspark.sql import functions as F
    from engine.text.url import canonicalize_urls
    import __spark_entry__ as m
    one = m.queries()["text_url_canonical"](spark,
                                            "/root/testdata/sf0.001")
    again = canonicalize_urls(
        one.select("doc_id", F.col("canon_url").alias("url")))
    j = (one.select("doc_id", F.col("canon_url").alias("c1"))
         .join(again.select("doc_id", F.col("canon_url").alias("c2")),
               "doc_id"))
    assert j.filter("c1 <> c2").count() == 0


# ------------------------------------------------- S-stemmer (M43)

def _s_stem_ref(w):
    if len(w) >= 4 and w.endswith("ies"):
        return w if w[-4:] in ("aies", "eies") else w[:-3] + "y"
    if len(w) >= 4 and w.endswith("es"):
        return w if w[-3:] in ("aes", "ees", "oes") else w[:-1]
    if len(w) >= 3 and w.endswith("s"):
        return w if w[-2:] in ("us", "ss") else w[:-1]
    return w


def test_stem_rule_witnesses(spark):
    from engine.text.ops import stem_stats
    words = ("cities applies ties goes shoes sees bus glass cats "
             "trees is es mass texas notaries")
    # reference per word
    refs = {w: _s_stem_ref(w) for w in words.split()}
    assert refs["cities"] == "city" and refs["applies"] == "apply"
    assert refs["ties"] == "ty"
    assert refs["goes"] == "goes"      # oes exception, NOT fall-through
    assert refs["shoes"] == "shoes"
    assert refs["sees"] == "sees"      # ees exception
    assert refs["trees"] == "trees"
    assert refs["bus"] == "bus" and refs["glass"] == "glass"
    assert refs["cats"] == "cat"
    assert refs["is"] == "is"          # len<3 guard on rule 3? len 2
    assert refs["es"] == "es"
    assert refs["texas"] == "texa"     # pinned: no proper-noun list
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    [r] = stem_stats(df).collect()
    toks = words.split()
    stems = [refs[w] for w in toks]
    assert r.n_tokens == len(toks)
    assert r.n_stemmed == sum(1 for w in toks if refs[w] != w)
    assert r.n_distinct_stems == len(set(stems))


def test_stem_stats_matches_python_reference_on_corpus(spark):
    import re

    import pandas as pd

    from engine.text.ops import stem_stats
    got = {r.doc_id: (r.n_tokens, r.n_stemmed, r.n_distinct_stems)
           for r in stem_stats(
               __import__("__spark_entry__")._t(
                   spark, "/root/testdata/sf0.001", "documents"))
           .collect()}
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    for _, row in docs.iterrows():
        toks = [t for t in re.split("[^a-z]+", row["text"].lower()) if t]
        stems = [_s_stem_ref(t) for t in toks]
        want = (len(toks), sum(1 for a, b in zip(toks, stems) if a != b),
                len(set(stems)))
        assert got[row["doc_id"]] == want
    assert len(got) == len(docs)


# ---------------------------------------------- collocations (M44)

def test_collocations_matches_python_reference(spark):
    import re
    from collections import Counter

    import pandas as pd

    from engine.text.ops import collocations
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = []
    for txt in docs["text"]:
        toks = [t for t in re.split("[^a-z]+", txt.lower()) if t]
        pairs += list(zip(toks, toks[1:]))
    pc = Counter(pairs)
    u1 = Counter(w1 for w1, _ in pairs)
    u2 = Counter(w2 for _, w2 in pairs)
    want_top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    want = {(w1, w2): (n, u1[w1], u2[w2], len(pairs))
            for (w1, w2), n in want_top}
    got = {(r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2, r.n_bigrams)
           for r in collocations(
               spark.createDataFrame(docs[["doc_id", "text"]]),
               top_k=50).collect()}
    assert got == want


def test_collocations_tiny_and_tie_order(spark):
    from engine.text.ops import collocations
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c x")], "doc_id long, text string")
    # bigrams: (a,b)x2, (b,a), (b,c)x2, (c,x) -> 6 total
    rows = collocations(df, top_k=3).collect()
    key = [(r.w1, r.w2) for r in rows]
    # count desc, then lexicographic: (a,b)2, (b,c)2, then (b,a)1
    assert sorted(key[:2]) == [("a", "b"), ("b", "c")]
    assert key[2] == ("b", "a")
    by = {(r.w1, r.w2): r for r in rows}
    assert by[("a", "b")].n_pair == 2
    assert by[("a", "b")].n_w1 == 2          # 'a' in w1 position twice
    assert by[("b", "c")].n_w2 == 2          # 'c' in w2 position twice
    assert all(r.n_bigrams == 6 for r in rows)


# ---------------------------------------------- readability (M46)

def test_readability_components_pinned_proxies(spark):
    from engine.text.ops import readability_components
    docs = [
        (1, "The cat sat. The dog ran! Was it fun?"),
        (2, "rhythm"),                     # zero vowel runs -> floor 1
        (3, "beautiful queueing"),         # multi-run words
        (4, ""),                           # empty doc -> all zeros
        (5, "no terminator here"),         # 1 sentence by the floor
    ]
    got = {r.doc_id: (r.n_words, r.n_sentences, r.n_syllables)
           for r in readability_components(
               spark.createDataFrame(docs, "doc_id long, text string"))
           .collect()}
    assert got[1] == (9, 3, 9)       # all monosyllabic by the proxy
    assert got[2] == (1, 1, 1)       # 'rhythm': floor(1)
    # beautiful: eau+i+u = 3 runs? b-eau-t-i-f-u-l -> 'eau','i','u' = 3;
    # queueing: 'ueuei' = one run -> 1
    assert got[3] == (2, 1, 4)
    assert got[4] == (0, 0, 0)
    assert got[5] == (3, 1, 7)       # no=1, terminator=4, here=2


def test_readability_matches_python_reference_on_corpus(spark):
    import re

    import pandas as pd

    from engine.text.ops import readability_components
    got = {r.doc_id: (r.n_words, r.n_sentences, r.n_syllables)
           for r in readability_components(
               __import__("__spark_entry__")._t(
                   spark, "/root/testdata/sf0.001", "documents"))
           .collect()}
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    for _, row in docs.iterrows():
        toks = [t for t in re.split("[^a-z]+", row["text"].lower()) if t]
        frags = [s.strip() for s in re.split(r"[.!?]+\s+", row["text"])
                 if s.strip()]
        n_sent = max(1, len(frags)) if toks else 0
        syl = sum(max(1, len(re.findall("[aeiou]+", t))) for t in toks)
        assert got[row["doc_id"]] == (len(toks), n_sent, syl)
    assert len(got) == len(docs)


# ---------------------------------------- shared n-gram pairs (M47)

def test_shared_ngrams_matches_python_reference(spark):
    import pandas as pd

    import __spark_entry__ as m
    got = {(r.doc_a, r.doc_b): r.n_shared
           for r in m.queries()["text_shared_ngrams"](
               spark, "/root/testdata/sf0.01").collect()}
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    by_doc = {}
    for _, row in docs.iterrows():
        w = row["text"].split(" ")
        n = max(len(w) - 4, 1)
        by_doc[row["doc_id"]] = {" ".join(w[i:i + 5])
                                 for i in range(n)}
    from collections import Counter
    df_ct = Counter(g for gs in by_doc.values() for g in gs)
    keep = {g for g, c in df_ct.items() if c <= 20}
    inv = {}
    for d, gs in by_doc.items():
        for g in gs & keep:
            inv.setdefault(g, []).append(d)
    pair_ct = Counter()
    for g, ds in inv.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_ct[(ds[i], ds[j])] += 1
    want = {p: c for p, c in pair_ct.items() if c >= 3}
    assert got == want
    assert len(got) > 0          # the corpus genuinely shares grams


def test_shared_ngrams_hot_gram_guard(spark):
    """A gram in >20 docs must contribute no pairs."""
    from pyspark.sql import functions as F

    import __spark_entry__ as m
    rows = [(i, "common five word boiler plate here") for i in range(25)]
    rows += [(100, "alpha beta gamma delta epsilon zeta eta"),
             (101, "alpha beta gamma delta epsilon zeta theta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import tempfile
    d = tempfile.mkdtemp(prefix="sng-")
    df.write.parquet(f"{d}/documents.parquet")
    for t in m.TABLES:
        if t != "documents":
            spark.createDataFrame([], "x int").write.mode(
                "ignore").parquet(f"{d}/{t}.parquet")
    got = {(r.doc_a, r.doc_b): r.n_shared
           for r in m.queries()["text_shared_ngrams"](spark, d)
           .collect()}
    # the 25-doc boilerplate gram is guarded out; docs 100/101 share
    # 'alpha beta gamma delta epsilon' + 'beta gamma delta epsilon
    # zeta' = 2 grams -> below the >=3 floor, so no pairs at all
    assert got == {}
